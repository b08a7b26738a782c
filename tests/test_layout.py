"""Z-order layout invariants: the Morton interleave is a bijection on
(x, y) pairs, and z-prefix file cuts bound BOTH dimensions' spans —
the property that makes footer-stats pruning work on two columns at
once (a 1-D sort bounds one span and leaves the other at full range)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_mapreduce_spark.operators.layout import (
    morton_interleave16,
    zorder_layout,
)
from tests.conftest import SF_DIR


def test_morton_interleave_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (255, 0), (0, 255), (3, 5)],
        "x: long, y: long",
    ).select("x", "y", morton_interleave16(F.col("x"), F.col("y")).alias("z"))
    got = {(r.x, r.y): r.z for r in df.collect()}
    # bit i of x -> position 2i; bit i of y -> position 2i+1
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(255, 0)] == 0b0101010101010101
    assert got[(0, 255)] == 0b1010101010101010
    # 3=0b011, 5=0b101 -> z = x0 + y0<<1 + x1<<2 + y2<<5 = 1+2+4+32 = 39
    assert got[(3, 5)] == 39


def test_zorder_layout_bounds_both_dims(spark):
    rows = zorder_layout(spark, SF_DIR).collect()
    assert len(rows) > 4  # the layout actually cuts multiple files
    total = sum(r.n_rows for r in rows)
    assert total == spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    # every file's span in each scaled dimension is a strict subset of
    # the 256-wide domain — i.e. the curve clusters BOTH columns
    avg_x = sum(r.max_x - r.min_x for r in rows) / len(rows)
    avg_y = sum(r.max_y - r.min_y for r in rows) / len(rows)
    assert avg_x < 200 and avg_y < 200
    # file ids are contiguous Morton ranges: disjoint and sorted
    ids = [r.file_id for r in rows]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
