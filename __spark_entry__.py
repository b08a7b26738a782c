"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in hadoop_mapreduce_spark/ (see SURVEY.md §2 for
the operator inventory and registry.py for the query↔oracle pairing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query — the reference's only program (n-gram frequency
    count, globally sorted; reference WordCount.java:64-164) on the
    sf0.001 documents table."""
    from hadoop_mapreduce_spark.operators.ngram import ngram_count
    from hadoop_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return ngram_count(docs, "text", n=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hadoop_mapreduce_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; approximate/stateful ops are
    omitted (rows-only check per the contract)."""
    from hadoop_mapreduce_spark.registry import ORACLE

    return dict(ORACLE)
