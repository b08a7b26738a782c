"""Skew-mitigation proof on real plans (VERDICT r5 item 5).

Synthesises a Zipf-keyed events table (a handful of users own most of
the traffic — the shape that breaks hash-partitioned joins/aggs), then
measures the SAME logical task three ways each:

  join:  events ⨝ users on user_id
    * sortmerge, AQE skew-join OFF  (the naive cluster plan)
    * sortmerge, AQE skew-join ON   (runtime split of oversized splits)
    * salted_join (operators/skew.py, explicit 16-way salt)
  agg:   groupBy(user_id) count+sum
    * plain groupBy, AQE OFF
    * plain groupBy, AQE ON (coalescing only — partial agg already
      bounds skew for algebraic aggs; recorded to show that)
    * salted_aggregate (operators/skew.py two-phase)

For every run it records wall seconds, the shuffle read/write volume,
and the max/median task-duration spread of the heaviest stage (the
number AQE's skew split exists to bound) from the AppStatusStore.

Usage: PYTHONPATH=/root/repo python tools/skew_bench.py [n_rows] [zipf_s]
Prints one JSON line; BASELINE.md records the table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_bench import _shuffle_metrics  # noqa: E402 (same tools/ dir)


def _task_spread(sc, after_stage: int) -> tuple[int, dict]:
    """Max vs median task duration over stages newer than the
    watermark — the skew evidence. Best-effort via AppStatusStore task
    details; {} if the store doesn't retain tasks."""
    try:
        jvm = sc._jvm
        store = sc._jsc.sc().statusStore()
        empty = jvm.java.util.Collections.emptyList()
        darr = sc._gateway.new_array(jvm.double, 0)
        stages = store.stageList(empty, False, False, darr, empty)
        hi = after_stage
        worst = None
        for i in range(stages.size()):
            s = stages.apply(i)
            sid = s.stageId()
            hi = max(hi, sid)
            if sid <= after_stage:
                continue
            q = sc._gateway.new_array(jvm.double, 3)
            q[0], q[1], q[2] = 0.0, 0.5, 1.0
            opt = store.taskSummary(sid, s.attemptId(), q)
            if not opt.isDefined():
                continue
            dist = opt.get().duration()
            med, mx = dist.apply(1), dist.apply(2)
            if worst is None or mx > worst[0]:
                worst = (mx, med)
        if worst is None:
            return hi, {}
        mx, med = worst
        return hi, {"max_task_ms": int(mx), "median_task_ms": int(med),
                    "task_spread": round(mx / med, 1) if med else None}
    except Exception:  # noqa: BLE001 — spread is best-effort
        return after_stage, {}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    zipf_s = float(sys.argv[2]) if len(sys.argv) > 2 else 1.2

    from pyspark.sql import functions as F

    from hadoop_mapreduce_spark import get_spark
    from hadoop_mapreduce_spark.operators.skew import (
        salted_aggregate,
        salted_join,
    )

    spark = get_spark("skew-bench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # Zipf keys via inverse-CDF over a small rank table: rank r gets
    # weight r^-s; a deterministic uniform hash maps each row to a rank.
    # With s=1.2 and 1000 users, rank 1 owns ~25% of all rows.
    n_users = 1000
    ranks = list(range(1, n_users + 1))
    weights = [r ** (-zipf_s) for r in ranks]
    total = sum(weights)
    cdf, acc = [], 0.0
    for w in weights:
        acc += w
        cdf.append(acc / total)
    import bisect

    def rank_of(u: float) -> int:
        return ranks[bisect.bisect_left(cdf, u)]

    # keys are generated distributed: uniform hash -> bucket in [0,B),
    # bucket -> Zipf rank via a broadcast lookup join (a 1000-arm CASE
    # would be analyzer-heavy; the tiny lookup table is the right shape)
    B = 1 << 14
    # bucket -> rank table (B rows, broadcast)
    bucket_rank = spark.createDataFrame(
        [(b, rank_of((b + 0.5) / B)) for b in range(B)], "bucket int, user_id int")
    events = (
        spark.range(n_rows)
        .select(F.col("id").alias("row_id"),
                F.pmod(F.xxhash64("id"), F.lit(B)).cast("int").alias("bucket"),
                (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)) / 10.0)
                .alias("value"))
        .join(F.broadcast(bucket_rank), "bucket")
        .drop("bucket")
    )
    users = spark.createDataFrame(
        [(r, f"user_{r}", r % 7) for r in ranks],
        "user_id int, name string, segment int")

    scratch = os.environ.get("SKEW_BENCH_SCRATCH", "/tmp/skew_bench_events")
    events.write.mode("overwrite").parquet(scratch)
    ev = spark.read.parquet(scratch)
    top = ev.groupBy("user_id").count().orderBy(F.desc("count")).limit(3).collect()
    skew_profile = {f"rank_{r.user_id}": r["count"] for r in top}

    def timed(label, build, conf: dict, results: dict):
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            wm, _ = _shuffle_metrics(sc, -1)
            build().write.format("noop").mode("overwrite").save()  # warm
            wm, _ = _shuffle_metrics(sc, wm)
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 3)
            _, shf = _shuffle_metrics(sc, wm)
            _, spread = _task_spread(sc, wm)
            results[label] = {"wall_sec": wall, **shf, **spread}
            print(f"  {label:32s} {wall:7.2f}s {shf} {spread}",
                  file=sys.stderr)
        finally:
            for k in conf:
                spark.conf.unset(k)

    AQE_OFF = {"spark.sql.adaptive.enabled": "false",
               "spark.sql.autoBroadcastJoinThreshold": "-1"}
    AQE_ON = {"spark.sql.adaptive.enabled": "true",
              "spark.sql.adaptive.skewJoin.enabled": "true",
              "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
              "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
              "spark.sql.autoBroadcastJoinThreshold": "-1"}

    res_join: dict = {}
    big_users = users  # small dim, but broadcast disabled to force the shuffle plan
    timed("join_sortmerge_aqe_off",
          lambda: ev.join(big_users, "user_id").select("row_id", "segment", "value"),
          AQE_OFF, res_join)
    timed("join_sortmerge_aqe_skew_on",
          lambda: ev.join(big_users, "user_id").select("row_id", "segment", "value"),
          AQE_ON, res_join)
    timed("join_salted_16",
          lambda: salted_join(ev, big_users, "user_id", "user_id",
                              n_salts=16).select("row_id", "segment", "value"),
          AQE_OFF, res_join)

    res_agg: dict = {}
    timed("agg_plain_aqe_off",
          lambda: ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"),
                                            F.sum("value").alias("tv")),
          AQE_OFF, res_agg)
    timed("agg_plain_aqe_on",
          lambda: ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"),
                                            F.sum("value").alias("tv")),
          AQE_ON, res_agg)
    timed("agg_salted_16",
          lambda: salted_aggregate(ev, ["user_id"],
                                   {"n": "count(*)", "tv": "sum(value)"}),
          AQE_OFF, res_agg)

    print(json.dumps({
        "n_rows": n_rows, "zipf_s": zipf_s, "n_users": n_users,
        "skew_profile_top3": skew_profile,
        "join": res_join, "agg": res_agg,
    }))


if __name__ == "__main__":
    main()
