"""Multimodal column plumbing (SURVEY.md §2.EXT: image/audio/video as
opaque binary columns + typed metadata).

The container has no image/audio codecs, so the DECODE step is a
deterministic fake behind `_decode_stub` (clearly marked; swap in
PIL/torchaudio/ffmpeg on a real cluster). Everything around it — the
binary column schema, Arrow-batched mapInPandas plumbing, batch shapes,
partition sizing — is real and tested.

Scale notes: binary payloads dominate row width, so
``spark.sql.files.maxPartitionBytes`` should be sized for ~1k rows per
task at 100 TB (e.g. 128 MB partitions / ~100 KB blobs); mapInPandas
streams Arrow batches so peak memory is one batch, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_mapreduce_spark.sources.tables import load_table

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, header string, width long, height long, n_frames long"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata, modelling an
    image/audio blob table. The fixture has no real media, so the blob is
    the utf-8 encoded text — the *plumbing* (binary type through scan,
    shuffle, UDF) is identical for real payloads."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("blob"),
        F.struct(
            F.lit("fake/png").alias("mime"),
            F.length("text").alias("orig_len"),
        ).alias("meta"),
    )


def _decode_stub(blob: bytes) -> tuple[int, int, int]:
    """STUB decode — deterministic fake standing in for a real media
    decoder (PIL.Image.open / av.open). Returns (width, height, n_frames)
    derived from the payload bytes so tests are reproducible. Replace
    with a real decoder where codecs exist."""
    n = len(blob)
    return (n % 640) + 1, (n % 480) + 1, (n % 30) + 1


def decode_batches(blobs: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow-batched iterator in, iterator out.

    This is the canonical multimodal pattern: per-batch vectorised
    metadata extraction with a Python library, never per-row UDF calls.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["blob"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["blob"].map(len),
                    "header": pdf["blob"].map(lambda b: b[:4].hex()),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "n_frames": dims.map(lambda d: d[2]),
                }
            )

    return blobs.mapInPandas(decode, DECODED_SCHEMA)


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: binary payload → decoded metadata, ordered.

    n_bytes/header are engine-checkable (octet_length / hex prefix in
    SQL); width/height/n_frames come from the stub decoder.
    """
    docs = load_table(spark, sf_dir, "documents")
    return decode_batches(with_binary_payload(docs)).orderBy("doc_id")


def frame_sample(spark: SparkSession, sf_dir: str, every: int = 7) -> DataFrame:
    """Frame sampling pattern: explode decoded frame indices, keep every
    k-th — the shape of video-frame extraction (decode is the stub)."""
    decoded = multimodal_decode(spark, sf_dir)
    return (
        decoded.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .where(F.col("frame_idx") % every == 0)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("doc_id")
    )


def _resize_stub(w: int, h: int, max_side: int = 256) -> tuple[int, int]:
    """STUB resize — pure integer math standing in for a real resampler
    (PIL Image.thumbnail). Aspect-preserving clamp of the longest side to
    max_side, floor semantics, never upscales."""
    longest = max(w, h)
    if longest <= max_side:
        return w, h
    return (w * max_side) // longest, (h * max_side) // longest


def multimodal_resize(spark: SparkSession, sf_dir: str, max_side: int = 256) -> DataFrame:
    """Resize pattern: decoded dims → target dims via a vectorised batch
    transform. Real pipelines emit the resized blob too; the stub keeps
    the shapes (mapInPandas in/out, one row per image) and the integer
    dim math real."""
    decoded = decode_batches(with_binary_payload(load_table(spark, sf_dir, "documents")))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                _resize_stub(w, h, max_side)
                for w, h in zip(pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "new_width": [d[0] for d in dims],
                "new_height": [d[1] for d in dims],
            })

    out_schema = "doc_id long, width long, height long, new_width long, new_height long"
    return decoded.mapInPandas(resize, out_schema).orderBy("doc_id")


def multimodal_features(spark: SparkSession, sf_dir: str, dim: int = 8) -> DataFrame:
    """Feature-extract pattern: blob → fixed-dim float vector (the shape
    of an image/audio embedding model run under mapInPandas). The stub
    features are deterministic in the byte length (f_i = ((n_bytes *
    (i+1)) % 1000) / 1000) so the l2 norm is SQL-checkable; a real model
    swap changes only the batch fn body, not the plumbing/schema."""
    import numpy as np

    blobs = with_binary_payload(load_table(spark, sf_dir, "documents"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["blob"].map(len).to_numpy()[:, None].astype(np.int64)
            mult = np.arange(1, dim + 1, dtype=np.int64)[None, :]
            feats = ((n * mult) % 1000) / 1000.0  # (batch, dim) — vectorised
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "features": list(feats),
                "feat_norm": np.sqrt((feats * feats).sum(axis=1)),
            })

    out = blobs.mapInPandas(extract, "doc_id long, features array<double>, feat_norm double")
    return out.select(
        "doc_id", F.size("features").cast("long").alias("dim"),
        F.round("feat_norm", 6).alias("feat_norm"),
    ).orderBy("doc_id")
