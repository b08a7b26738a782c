"""Scale-stress smoke: measure how the heavy operators scale with data.

Synthesises a KxSF0.1 dataset (union of sf0.1 with shifted ids — same
distributions, K times the rows) in a scratch dir, then times the
shuffle/compute-heavy operators at 1x and Kx. Near-linear wall-clock
growth (and sub-quadratic for the pair-generating ops) is the evidence
that the partitioning strategy holds as data grows; a super-linear jump
flags an operator that would fall over at cluster scale.

Usage:  PYTHONPATH=/root/repo python tools/scale_smoke.py [K] [scratch_dir]
Prints one JSON line: {"k": K, "queries": {name: {"t1": s, "tk": s,
"ratio": tk/t1}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HEAVY = [
    "ngram_count",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q21_waiting_supplier",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "text_quality",
    "token_count",
    "tfidf_top_terms",
    "events_session",
    "doc_chunking",
    "seq_packing",
]

ID_COLS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
}


def build_scaled(spark, src: str, dst: str, k: int,
                 docs_dup_pct: int | None = None) -> None:
    """Union of k id-shifted copies of every table.

    ``docs_dup_pct`` (0..100, default None = legacy behaviour) controls
    the DOCUMENTS table's duplicate saturation. The legacy K× build
    copies text verbatim, so every document has K-1 identical twins and
    any exact pair join's OUTPUT is K² by construction — that measures
    output writing, not candidate efficiency. With docs_dup_pct=P, only
    a deterministic P% of each extra copy keeps its text verbatim
    (remaining a near-dup of the original); the rest are rewritten by
    splicing a copy-specific marker token between every pair of words,
    which makes every token 3-shingle contain the marker — the
    rewritten copy shares ZERO shingles with the original or with any
    other copy, i.e. it is a genuinely distinct document at any Jaccard
    threshold, while within-copy dup structure mirrors the source
    corpus. n_chars is recomputed so the metadata stays consistent.
    """
    from pyspark.sql import functions as F

    from hadoop_mapreduce_spark.sources.tables import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        df = load_table(spark, src, name)
        if name in ID_COLS and k > 1:
            idc = ID_COLS[name]
            # shift the primary id per copy so dedup/self-join ops see
            # distinct entities, not k-way duplicates of every row
            shift = 10_000_000
            parts = [df]
            for i in range(1, k):
                p = df.withColumn(idc, F.col(idc) + i * shift)
                if name == "documents" and docs_dup_pct is not None:
                    keep = (
                        F.pmod(F.col("doc_id") * 2654435761 + i, 100)
                        < docs_dup_pct)
                    rewritten = F.regexp_replace(
                        "text", " ", f" zqc{i} ")
                    p = p.withColumn(
                        "text",
                        F.when(keep, F.col("text")).otherwise(rewritten),
                    ).withColumn("n_chars", F.length("text"))
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df
        # Coalesce before the write (r8, guide §6 "small files hurt
        # twice"): the K-copy union inherits every copy's input splits
        # — documents at 32x wrote 1024 part files of ~27 KB, so every
        # ladder query scanning it paid ~1024 file opens + footer reads
        # per EXECUTION, a harness artifact charged to the plan. One
        # file per core keeps write/scan parallelism while producing
        # sanely sized files (lineitem at 32x: 32 x ~10 MB).
        out = out.coalesce(spark.sparkContext.defaultParallelism)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    scratch = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="scale_smoke_")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from hadoop_mapreduce_spark import get_spark
    from hadoop_mapreduce_spark.registry import QUERIES

    spark = get_spark("scale-smoke", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    build_scaled(spark, src, scratch, k)
    try:
        results = {}
        for name in HEAVY:
            fn = QUERIES[name]
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
            t0 = time.time()
            fn(spark, src).write.format("noop").mode("overwrite").save()
            t1 = time.time() - t0
            t0 = time.time()
            fn(spark, scratch).write.format("noop").mode("overwrite").save()
            tk = time.time() - t0
            results[name] = {
                "t1": round(t1, 3), "tk": round(tk, 3),
                "ratio": round(tk / t1, 2) if t1 > 0 else None,
            }
            print(f"  {name:24s} 1x={t1:6.2f}s {k}x={tk:6.2f}s ratio={tk / t1:5.2f}",
                  file=sys.stderr)
        print(json.dumps({"k": k, "src": src, "queries": results}))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
