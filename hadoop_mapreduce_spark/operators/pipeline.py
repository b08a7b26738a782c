"""End-to-end training-data curation pipeline — the compound operator a
100 TB LLM-data run actually executes, composed from the families this
engine ships: quality filter → exact dedup → near-dup removal → corpus
accounting.

Stage order is the scale order: the cheap scan-speed quality filter runs
first so every later (shuffling) stage sees fewer rows; exact dedup (one
hash shuffle) runs before near-dup (candidate joins) for the same
reason. Deterministic keep-rules throughout: min doc_id survives an
exact-dup group; the lower id of a near-dup pair survives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_mapreduce_spark.functions.text import normalize_text, tokenize
from hadoop_mapreduce_spark.operators.dedup import dedup_ngram_jaccard
from hadoop_mapreduce_spark.operators.textstats import text_quality
from hadoop_mapreduce_spark.sources.tables import load_table


def pipeline_curation(spark: SparkSession, sf_dir: str,
                      min_quality: float = 0.6,
                      jaccard_threshold: float = 0.8) -> DataFrame:
    """Per-source counts + token totals of the curated corpus.

    1. quality gate: composite score >= min_quality (2 of 3 signals);
    2. exact dedup: keep the min doc_id of each sha256(text) group;
    3. near-dup removal: among survivors, drop the greater id of every
       pair with shingle-Jaccard >= jaccard_threshold (exact Jaccard —
       at 100 TB you swap in the MinHash-LSH candidates, same keep-rule);
    4. accounting: docs + whitespace tokens per source.
    """
    docs = load_table(spark, sf_dir, "documents")

    q_ok = (
        text_quality(spark, sf_dir)
        .where(F.col("quality") >= min_quality)
        .select("doc_id")
    )
    d0 = docs.join(q_ok, "doc_id", "left_semi")

    keep_exact = (
        d0.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d1 = d0.join(keep_exact, "doc_id", "left_semi")

    # exact Jaccard pairs are computed corpus-wide (oracle-matched path),
    # then restricted to survivors; drop the greater id of each pair
    pairs = dedup_ngram_jaccard(spark, sf_dir, threshold=jaccard_threshold)
    ids1 = d1.select("doc_id")
    live_pairs = (
        pairs.join(ids1.withColumnRenamed("doc_id", "id1"), "id1", "left_semi")
        .join(ids1.withColumnRenamed("doc_id", "id2"), "id2", "left_semi")
    )
    dropped = live_pairs.select(F.col("id2").alias("doc_id")).distinct()
    d2 = d1.join(dropped, "doc_id", "left_anti")

    toks = F.size(tokenize(normalize_text(F.col("text"))))
    return (
        d2.select("source", toks.alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
        .orderBy("source")
    )
