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


def pipeline_pretrain(spark: SparkSession, sf_dir: str,
                      min_quality: float = 0.6,
                      ngram_n: int = 4, bench_mod: int = 20) -> DataFrame:
    """The full pretraining-assembly pipeline as ONE declarative plan:
    quality gate → exact dedup → benchmark decontamination → domain
    mixture sampling → train/val/test split accounting. A user of the
    engine runs this instead of wiring five jobs with intermediate
    materialisations — Catalyst sees the whole chain, so each stage's
    filter feeds the next without a pass over storage in between.

    Stage order is scale order (cheap scan-speed gates first, shuffling
    stages over ever-smaller survivor sets). Hash-independence matters
    in the tail: the MIXTURE keep-decision uses a salted key
    md5('mix:' || doc_id) while the SPLIT bucket uses md5(doc_id) — on
    the same unsalted bucket, "bucket < rate" (mixture) would nest
    inside "bucket < 10" (val split), silently exempting val/test from
    downsampling and starving train.

    Emits per-split doc/token accounting (3 rows) — the corpus ledger a
    training run records before the first batch.

    ONE token projection feeds every stage: the corpus is scanned and
    tokenised exactly once into a persisted (doc_id, source, tokens,
    sha256, char/punct counts) frame; the quality gate, the
    decontamination grams, and the final token ledger all read from it.
    The naive composition (call text_quality + re-tokenise for grams +
    re-tokenise for the ledger) scans and regex-tokenises the corpus
    three times — at 100 TB the tokenisation pass IS the dominant cost,
    so sharing it is the single biggest win in the pipeline.
    MEMORY_AND_DISK: the projection is ~tokens-sized, so on a real
    cluster it spills rather than evicts under memory pressure.
    """
    from pyspark import StorageLevel

    from hadoop_mapreduce_spark.functions.text import ngrams_from_tokens

    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    base = docs.select(
        "doc_id",
        "source",
        tokenize(normalize_text(F.col("text"))).alias("t"),
        F.sha2("text", 256).alias("h"),
        n_chars.alias("nc"),
        n_punct.alias("np"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # 1. quality gate (same composite score as text_quality, computed
    # from the shared token projection instead of a second corpus scan;
    # rounded like text_quality so the gate is bit-identical)
    n_tok = F.size("t")
    avg_wl = F.aggregate("t", F.lit(0), lambda a, x: a + F.length(x)) / n_tok
    score = (
        F.when(n_tok >= 5, 1.0).otherwise(0.0)
        + F.when((avg_wl >= 3) & (avg_wl <= 10), 1.0).otherwise(0.0)
        + F.when(F.col("np") / F.col("nc") < 0.2, 1.0).otherwise(0.0)
    ) / 3.0
    d0 = base.where(F.round(score, 4) >= min_quality)

    # 2. exact dedup: keep min doc_id per content hash
    keep_exact = (
        d0.groupBy("h").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    )
    d1 = d0.join(keep_exact, "doc_id", "left_semi")

    # 3. decontamination (same rule as decontaminate_ngram): benchmark
    # docs leave the corpus, and any train doc sharing an n-gram with
    # the benchmark set is dropped; benchmark grams are broadcast.
    # Grams assemble from the persisted token arrays — no re-tokenise,
    # and the explode sits above a cached column so the O(len²)
    # CollapseProject trap (ngram.py) cannot re-materialise per position.
    grams = base.select(
        "doc_id",
        F.explode(F.array_distinct(
            ngrams_from_tokens(F.col("t"), ngram_n))).alias("g"),
    )
    is_bench = F.col("doc_id") % bench_mod == 0
    bench_grams = grams.where(is_bench).select("g").distinct()
    hits = (
        grams.where(~is_bench)
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .select("doc_id").distinct()
    )
    d2 = (
        d1.where(F.col("doc_id") % bench_mod != 0)
        .join(hits, "doc_id", "left_anti")
    )

    # 4. domain mixture (salted hash — independent of the split bucket)
    idx = F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("int")
    rate = (
        F.when(idx < 5, F.lit(100)).when(idx < 10, F.lit(50))
        .when(idx < 15, F.lit(25)).otherwise(F.lit(10))
    )
    mix_bucket = (
        F.conv(F.substring(
            F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
            1, 15), 16, 10).cast("long") % 100
    )
    d3 = d2.where(mix_bucket < rate)

    # 5. split + ledger
    split_bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long") % 100
    )
    split = (
        F.when(split_bucket < 10, F.lit("val"))
        .when(split_bucket < 20, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return (
        d3.select(split.alias("split"), F.size("t").alias("n_tok"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
        .orderBy("split")
    )


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
