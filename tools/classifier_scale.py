"""Per-round cost flatness of the distributed-weights classifier path.

VERDICT r6 item 7 asked for evidence that the trainer survives past toy
``dim``: the driver re-root path moves O(dim) rows through the driver
every round, while the r7 distributed path (weights-as-DataFrame join
update + per-round localCheckpoint) keeps the update cluster-side. This
harness runs logreg_train_hashed at a large dim with n_iter in {2, 8}
and reports the marginal per-round cost — flat per-round cost (the
n_iter=8 marginal ≈ the n_iter=2 marginal) is the claim; a
super-linear-in-round trend would reproduce the broadcast-rebroadcast
degradation the r6 measurements ruled out for shuffle-joined chains.

Usage: PYTHONPATH=/root/repo python tools/classifier_scale.py [dim] [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hadoop_mapreduce_spark import get_spark
    from hadoop_mapreduce_spark.operators.curation import logreg_train_hashed
    from hadoop_mapreduce_spark.session import release_caches
    from hadoop_mapreduce_spark.sources.tables import load_table

    spark = get_spark("classifier-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf, "documents")
    labeled = docs.select(
        "doc_id", "text",
        (F.length("text") % 2 == 0).cast("double").alias("y"))

    def run(n_iter: int, distributed: bool) -> float:
        t0 = time.time()
        logreg_train_hashed(
            labeled, dim=dim, n_iter=n_iter,
            distributed_weights=distributed,
        ).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_caches()
        return round(dt, 3)

    # JIT/codegen warm pass at small n_iter, then the measured pair
    run(1, True)
    t2 = run(2, True)
    t8 = run(8, True)
    per_round = round((t8 - t2) / 6, 3)
    # driver-path contrast at the same dim (one run — the point is the
    # topology comparison, not a protocol-grade benchmark)
    t2_driver = run(2, False)
    t8_driver = run(8, False)
    print(json.dumps({
        "dim": dim, "sf": sf,
        "distributed": {"t_2iter": t2, "t_8iter": t8,
                        "marginal_per_round": per_round},
        "driver": {"t_2iter": t2_driver, "t_8iter": t8_driver,
                   "marginal_per_round": round((t8_driver - t2_driver) / 6, 3)},
    }))


if __name__ == "__main__":
    main()
