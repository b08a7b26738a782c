"""Measure the hashed-shingle reuse crossover (VERDICT r4 item 7).

dedup_minhash_lsh computes token shingles twice: once for MinHash
signatures (whole corpus) and once for exact-Jaccard verification
(candidate docs only). The `hashed_shingles=` hooks let one persisted
shingle pass feed both stages. On the driver fixture this reuse is
SLOWER (caching ~2.5M shingle rows costs more than re-tokenising the
tiny candidate subset — note at operators/dedup.py::dedup_minhash_lsh),
but the balance flips when documents are long (shingling dominates) and
the candidate set is a large fraction of the corpus (re-tokenisation
approaches a second full pass). This harness synthesises exactly that
corpus and times both paths, so the crossover claim is data.

Synthetic corpus: n_docs documents of doc_len tokens drawn from a tiny
template pool with per-doc perturbations — near-duplicate rate is high,
so the LSH candidate set covers most of the corpus.

Usage: PYTHONPATH=/root/repo python tools/shingle_reuse_bench.py \
           [n_docs] [doc_len]
Prints one JSON line: {"reuse_sec": ..., "rescan_sec": ..., ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_long_docs(spark, n_docs: int, doc_len: int):
    """Near-duplicate-heavy long documents, fully deterministic: doc i
    uses template i % 8 with every (i // 8)-th token perturbed."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 8).alias("tmpl"),
        (F.col("id") / 8).cast("int").alias("variant"),
    )
    tok = (
        "concat('t', pmod(pos * 2654435761 + tmpl * 97, 5000), "
        "if(variant > 0 and pos % (variant + 7) = 0, concat('v', variant), ''))"
    )
    return base.select(
        "doc_id",
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {doc_len}), "
            f"pos -> {tok}))"
        ).alias("text"),
    )


def run_pipeline(docs, threshold: float, reuse: bool) -> int:
    """The dedup_minhash_lsh pipeline with/without the shared persisted
    hashed-shingle pass; returns the verified pair count."""
    from pyspark.sql import functions as F

    from hadoop_mapreduce_spark.operators.dedup import (
        exact_jaccard_for_pairs,
        hashed_shingle_rows,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    hs = None
    if reuse:
        hs = hashed_shingle_rows(docs).persist()
        hs.count()  # materialise once; both stages read the cache
    sigs = minhash_signatures(docs, num_hashes=32, hashed_shingles=hs)
    cands = lsh_candidate_pairs(sigs, bands=16, rows_per_band=2).persist()
    cands.count()
    verified = exact_jaccard_for_pairs(docs, cands, hashed_shingles=hs)
    n = verified.where(F.col("jaccard") >= threshold).count()
    cands.unpersist()
    if hs is not None:
        hs.unpersist()
    return n


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    doc_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1500

    from hadoop_mapreduce_spark import get_spark

    spark = get_spark("shingle-reuse-bench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = build_long_docs(spark, n_docs, doc_len).persist()
    docs.count()

    out = {"n_docs": n_docs, "doc_len": doc_len}
    # warm both paths once (codegen/JIT), then measure
    for label, reuse in (("rescan", False), ("reuse", True)):
        run_pipeline(docs, 0.8, reuse)
        t0 = time.time()
        pairs = run_pipeline(docs, 0.8, reuse)
        out[f"{label}_sec"] = round(time.time() - t0, 2)
        out[f"{label}_pairs"] = pairs
    assert out["reuse_pairs"] == out["rescan_pairs"], "paths must agree"
    out["reuse_speedup"] = round(out["rescan_sec"] / out["reuse_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
