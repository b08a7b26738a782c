"""Empty/degenerate-input robustness: every operator family must handle
zero rows, zero tokens, and single-element inputs without erroring."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

from hadoop_mapreduce_spark.operators.dedup import embedding_cosine_pairs
from hadoop_mapreduce_spark.operators.ngram import ngram_count
from hadoop_mapreduce_spark.operators.similarity import cosine_topk
from hadoop_mapreduce_spark.operators.skew import salted_aggregate

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()), StructField("text", StringType()),
])
VEC_SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(DoubleType())),
])


def test_ngram_empty_table(spark):
    empty = spark.createDataFrame([], DOC_SCHEMA)
    assert ngram_count(empty, "text", 3).count() == 0


def test_ngram_all_punctuation_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "!!! ... ???"), (2, ""), (3, "one two")], DOC_SCHEMA)
    # no doc has >= 3 tokens after normalisation -> no trigrams
    assert ngram_count(docs, "text", 3).count() == 0


def test_embedding_pairs_empty_table(spark):
    empty = spark.createDataFrame([], VEC_SCHEMA)
    assert embedding_cosine_pairs(empty, 0.5).count() == 0


def test_embedding_pairs_single_vector(spark):
    one = spark.createDataFrame([(1, [1.0, 0.0])], VEC_SCHEMA)
    assert embedding_cosine_pairs(one, 0.5).count() == 0


def test_cosine_topk_empty_queries(spark):
    vecs = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])], VEC_SCHEMA)
    empty = spark.createDataFrame([], VEC_SCHEMA)
    assert cosine_topk(vecs, empty, k=5).count() == 0


def test_salted_aggregate_empty(spark):
    schema = StructType([
        StructField("k", LongType()), StructField("v", DoubleType()),
    ])
    empty = spark.createDataFrame([], schema)
    assert salted_aggregate(empty, ["k"], {"n": "count(*)"}).count() == 0
