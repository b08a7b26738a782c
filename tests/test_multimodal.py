"""Multimodal plumbing tests: binary columns through mapInPandas, stub
decode determinism, frame sampling shape."""

from __future__ import annotations

from hadoop_mapreduce_spark.operators.multimodal import (
    decode_batches,
    frame_sample,
    multimodal_decode,
    with_binary_payload,
)
from tests.conftest import SF_DIR


def test_binary_payload_schema(spark):
    docs = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    blob = with_binary_payload(docs)
    assert dict(blob.dtypes)["blob"] == "binary"
    row = blob.collect()[0]
    assert bytes(row.blob) == b"hello world"
    assert row.meta.mime == "fake/png"


def test_decode_stub_deterministic(spark):
    docs = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    out = decode_batches(with_binary_payload(docs)).collect()[0]
    assert out.n_bytes == 11
    assert out.header == b"hell".hex()
    assert out.width == 12 and out.height == 12 and out.n_frames == 12
    # running twice gives identical results
    out2 = decode_batches(with_binary_payload(docs)).collect()[0]
    assert out == out2


def test_multimodal_decode_full_table(spark):
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    decoded = multimodal_decode(spark, SF_DIR)
    assert decoded.count() == n_docs


def test_frame_sample_counts(spark):
    rows = frame_sample(spark, SF_DIR, every=7).collect()
    assert all(1 <= r.n_sampled <= 5 for r in rows)  # n_frames <= 30 -> at most ceil(30/7)
