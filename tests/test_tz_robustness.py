"""Driver-environment timestamp robustness.

The driver supplies its OWN SparkSession; two of its knobs can silently
re-label every wall-clock value the engine emits:

* ``spark.sql.session.timeZone`` — any TIMESTAMP_LTZ rendering
  (date_trunc, hour(), ts::date, ts::string) follows it;
* ``spark.sql.parquet.inferTimestampNTZ.enabled=false`` — the fixtures'
  naive ``timestamp[us]`` columns then arrive as LTZ instead of NTZ,
  turning every wall-clock expression timezone-DEPENDENT.

The observed failure (CORRECTNESS_r07: ``events_hierarchical_rollup``
rows+schema match, hash mismatch, driver env only) is exactly this
combination. The engine's defense is ``tables._normalize_ntz``: every
loaded timestamp column is rebased to TIMESTAMP_NTZ via instant-exact
integer arithmetic, so downstream plans are wall-clock pure under ANY
caller session. These tests simulate the hostile driver env and assert
canonical-output identity with the reference (NTZ/UTC) run.
"""

from __future__ import annotations

import math

import pytest

from hadoop_mapreduce_spark.registry import QUERIES
from hadoop_mapreduce_spark.session import release_caches
from hadoop_mapreduce_spark.sources.tables import invalidate_relation_cache

SF_DIR = "/root/testdata/sf0.001"

# Queries that RENDER wall-clock fields (bucket labels, dates, hours) —
# the surface a hostile session timezone re-labels. One per rendering
# family; the full-registry sweep lives in tools/tz_parity.py.
TZ_SENSITIVE = [
    "events_hierarchical_rollup",   # epoch hour/day integer buckets (r9)
    "events_gap_fill",              # hour spine, sequence + cast
    "events_daily_ohlc",            # date_trunc day -> string
    "events_session",               # raw ts rendering via min/max
    "dow_profile_stability",        # epoch-us day index
    "events_dow_hour_profile",      # portable epoch convention
    "recursive_monthly_spine",      # month spine over o_orderdate
    "active_user_ratios",           # rolling day windows
]


def _canon(df):
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.12g}"
        return str(v)

    rows = ["\x1f".join(cell(r[i]) for i in order) for r in df.collect()]
    rows.sort()
    return rows


@pytest.fixture(scope="module")
def hostile_env(spark):
    """Reference canon under the repo's own env, then flip the session
    into the hostile driver shape (LTZ parquet reads + IST half-hour
    offset) for the duration of the module."""
    yield spark
    # restore
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    invalidate_relation_cache()


@pytest.mark.parametrize("name", [q for q in TZ_SENSITIVE if q in QUERIES])
def test_query_invariant_under_hostile_session(hostile_env, name):
    spark = hostile_env
    fn = QUERIES[name]

    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    invalidate_relation_cache()  # drop relations pinned to other conf
    ref = _canon(fn(spark, SF_DIR))
    release_caches()

    # Hostile: naive parquet timestamps read as LTZ, and a half-hour
    # offset zone (shifts HOUR buckets too, which whole-hour zones mask).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    invalidate_relation_cache()
    try:
        got = _canon(fn(spark, SF_DIR))
    finally:
        release_caches()
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        invalidate_relation_cache()

    assert got == ref, (
        f"{name} output depends on the caller's session timezone/"
        f"timestamp-type conf (first diff: "
        f"{next((f'{a!r} vs {b!r}' for a, b in zip(ref, got) if a != b), 'row count')})"
    )


def test_normalize_ntz_exact_instant(hostile_env):
    """The LTZ->NTZ rebase is bit-exact vs DuckDB's epoch_us view."""
    import duckdb

    spark = hostile_env
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    invalidate_relation_cache()
    try:
        from hadoop_mapreduce_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        ev = load_table(spark, SF_DIR, "events")
        assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
        got = {
            r["event_id"]: r["us"]
            for r in ev.select(
                "event_id",
                F.expr(
                    "timestampdiff(MICROSECOND, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                ).alias("us"),
            ).limit(200).collect()
        }
        want = dict(
            duckdb.sql(
                f"SELECT event_id, epoch_us(ts) FROM "
                f"read_parquet('{SF_DIR}/events.parquet') "
                f"WHERE event_id IN ({','.join(map(str, got))})"
            ).fetchall()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        invalidate_relation_cache()
