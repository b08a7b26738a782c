"""hadoop_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query surface of
``pavidal/hadoop-mapreduce`` (reference at /root/reference; see SURVEY.md).
The reference computes one query family — n-gram frequency counts with
globally sorted output (reference WordCount.java:64-127) — which is the
flagship here (operators/ngram.py).  On top of that, this package provides
the relational, window, streaming, and LLM-data-pipeline operator surface
mandated by BASELINE.json, all expressed declaratively with the DataFrame
API so Catalyst/Tungsten/AQE pick the physical strategy.

Design principles (scale target: 100 TB on a 1000-executor cluster):
  * DataFrame/SQL first; RDDs never appear in the hot path.
  * Built-in JVM functions over Python UDFs; Arrow-batched pandas UDFs
    only where built-ins genuinely can't express the semantics.
  * Broadcast small dimensions, let AQE handle skew, keep filters and
    projections pushed down to the parquet scan.
"""

from hadoop_mapreduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
