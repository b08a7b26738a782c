"""The flagship query: n-gram frequency count, globally sorted.

This is the reference's entire program (reference WordCount.java:64-164;
pipeline inventory SURVEY.md §2.A ops 1-12), re-expressed declaratively:

  reference op                         here
  ---------------------------------    ----------------------------------
  TextInputFormat scan (op-1)          spark.read.text / documents table
  normalise (op-2, WordCount.java:76)  lower(regexp_replace(...))  [DELETE semantics]
  tokenise (op-3)                      split + filter('' !=)
  n-gram assembly (op-4/5)             transform(sequence(...), slice+concat_ws)
  map to (k,1) + combiner (op-6/7)     groupBy().count() — Spark's hash
                                       aggregate always runs partial (map-
                                       side) + final, so the reference's
                                       hand-wired combiner (WordCount.java:150)
                                       is implicit
  range partitioner + sort (op-9/11)   orderBy(ngram) — sampling-based
                                       RangePartitioning: no 26-partition cap
                                       (WordCount.java:36-38) and no first-
                                       letter skew (WordCount.java:54-59)
  TextOutputFormat sink (op-12)        sources.tables.write_tsv

Scale notes (100 TB): the only shuffle is the final-aggregate exchange on
``ngram``; partial aggregation bounds map output by distinct-ngrams-per-
task, and the global sort is a second, sampling-planned range exchange.
With AQE on, post-aggregation partition sizing is handled at runtime.
For top-k consumers prefer ``ngram_topk`` (no global sort at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_mapreduce_spark.functions.text import (
    ngrams_from_tokens,
    normalize_text,
    tokenize,
)


def explode_ngrams(df: DataFrame, text_col: str, n: int, keep_cols: list[str] | None = None) -> DataFrame:
    """One output row per n-gram occurrence in ``text_col``.

    Per-document semantics: n-grams do not cross document boundaries.
    (For raw text files, a "document" is one line — see ``ngram_count_text``
    for the reference's cross-line mode.)

    Two-step projection on purpose: the token array is bound to a real
    column *below* the Generate, so tokenisation runs once per document.
    Nesting tokenize() inside the n-gram transform makes the lambda
    re-tokenise the document at every window position — O(len^2) per doc,
    measured 10x slower on the fixture.
    """
    keep = [F.col(c) for c in (keep_cols or [])]
    toks = df.select(*keep, tokenize(normalize_text(F.col(text_col))).alias("__t"))
    return toks.select(*keep, F.explode(ngrams_from_tokens(F.col("__t"), n)).alias("ngram"))


def ngram_count(df: DataFrame, text_col: str, n: int = 3, sort: bool = True) -> DataFrame:
    """n-gram frequency count over a text column → (ngram, cnt).

    ``sort=True`` reproduces the reference's globally-sorted output
    (report.md:139-145). At extreme scale a consumer that doesn't need
    total order should pass sort=False and skip the range exchange.
    """
    counts = explode_ngrams(df, text_col, n).groupBy("ngram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.orderBy("ngram") if sort else counts


def ngram_count_text(
    spark: SparkSession, path: str, n: int = 3, cross_line: bool = False, sort: bool = True
) -> DataFrame:
    """Reference CLI equivalent: count n-grams in a directory of text files.

    cross_line=False (default): n-grams are per-line — deterministic and
    oracle-checkable.
    cross_line=True: reference-faithful mode where n-grams span newlines
    within one file (the static token queue at reference WordCount.java:68-71;
    SURVEY.md §1.4). Implemented by concatenating each file's lines in
    order and running the same per-document pipeline; the reference's
    cross-*file* leakage (a bug — the queue is never cleared between
    splits) is deliberately not reproduced.
    """
    lines = spark.read.text(path)
    if not cross_line:
        return ngram_count(lines, "value", n, sort=sort)
    # Rebuild each file as one document: order lines by their position.
    # The sort key is (file_block_start, monotonic id): the block start
    # byte offset (from the _metadata hidden column) pins the order of
    # SPLITS within a file — bare monotonically_increasing_id only
    # orders rows within one split (it embeds the partition index, and
    # split->partition assignment order is scheduler convention, not
    # contract, once a file spans multiple splits). Within a split the
    # monotonic id is row-ordered, so the pair is a total file order.
    # At 100 TB-of-text scale you'd instead carry window boundaries with
    # mapPartitions; file-level collect_list is fine while individual text
    # files are modest (they are: the reference's unit is an e-book).
    docs = (
        lines.select(
            F.input_file_name().alias("file"),
            F.col("_metadata.file_block_start").alias("blk"),
            F.monotonically_increasing_id().alias("pos"),
            F.col("value"),
        )
        .groupBy("file")
        .agg(
            F.concat_ws(
                " ",
                F.array_sort(
                    F.collect_list(F.struct("blk", "pos", "value"))
                ).getField("value"),
            ).alias("text")
        )
    )
    return ngram_count(docs, "text", n, sort=sort)


def ngram_topk(df: DataFrame, text_col: str, n: int = 3, k: int = 100) -> DataFrame:
    """Top-k most frequent n-grams — the scale-friendly variant: partial
    agg → final agg → per-partition top-k → driver-side k-merge via
    ``limit`` (Spark's TakeOrderedAndProject), no full sort."""
    counts = ngram_count(df, text_col, n, sort=False)
    return counts.orderBy(F.desc("cnt"), F.asc("ngram")).limit(k)
