"""Structured Streaming smoke tests: file-source micro-batches through
watermarked windows / sessions / dedup / custom state, checked against
the batch twins where semantics allow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_mapreduce_spark.sources.tables import load_table
from hadoop_mapreduce_spark.streaming.windows import (
    read_event_stream,
    run_to_memory_sink,
    streaming_dedup,
    tumbling_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def event_json_dir(tmp_path_factory):
    from hadoop_mapreduce_spark import get_spark

    spark = get_spark("tests")
    path = str(tmp_path_factory.mktemp("events_json"))
    # split into a few files so the stream sees multiple micro-batches
    load_table(spark, SF_DIR, "events").repartition(3).write.mode("overwrite").json(path)
    return path


def test_tumbling_counts_match_batch(spark, event_json_dir):
    stream = read_event_stream(spark, event_json_dir, max_files_per_trigger=2)
    got = run_to_memory_sink(tumbling_counts(stream), "t_tumbling", spark)
    # final update-mode state == batch aggregation over the same data
    batch = (
        spark.read.json(event_json_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got_final = (
        got.groupBy("window_start", "event_type").agg(F.max("n").alias("n"))
    )
    assert got_final.count() == batch.count()
    total_stream = got_final.agg(F.sum("n")).collect()[0][0]
    total_batch = batch.agg(F.sum("n")).collect()[0][0]
    assert total_stream == total_batch


def test_streaming_dedup_drops_duplicate_ids(spark, event_json_dir):
    stream = read_event_stream(spark, event_json_dir, max_files_per_trigger=2)
    got = run_to_memory_sink(streaming_dedup(stream), "t_dedup", spark)
    n_events = spark.read.json(event_json_dir).count()
    assert got.count() == n_events  # fixture ids are unique
    assert got.select("event_id").distinct().count() == n_events
