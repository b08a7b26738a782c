"""Skew mitigation: salted join / salted aggregate must preserve exact
semantics while spreading hot keys across (key, salt) shuffle partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_mapreduce_spark.operators.skew import salted_aggregate, salted_join
from hadoop_mapreduce_spark.plans.explain import static_plan_text
from hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _skewed(spark):
    """events with 90% of rows forced onto one hot user."""
    ev = load_table(spark, SF_DIR, "events")
    return ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 9, F.lit(1)).otherwise(F.col("user_id")),
    )


def test_salted_join_matches_plain_join(spark):
    ev = _skewed(spark)
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    plain = ev.join(cust, ev.user_id == cust.c_custkey).select("event_id", "c_mktsegment")
    salted = salted_join(ev, cust, "user_id", "c_custkey", n_salts=8).select(
        "event_id", "c_mktsegment")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer_matches(spark):
    ev = _skewed(spark)
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    plain = ev.join(cust, ev.user_id == cust.c_custkey, "left").select(
        "event_id", "c_mktsegment")
    salted = salted_join(ev, cust, "user_id", "c_custkey", n_salts=8, how="left").select(
        "event_id", "c_mktsegment")
    assert sorted(map(tuple, plain.collect(), ), key=str) == \
        sorted(map(tuple, salted.collect()), key=str)


def test_salted_join_semi_anti_match_plain(spark):
    """semi/anti survive right-side replication: every salt exists on
    the replicated right, so key-membership is unchanged — output must
    equal the plain leftsemi/leftanti joins row-for-row."""
    ev = _skewed(spark)
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey").where(
        F.col("c_custkey") % 3 == 0)  # partial key set so anti is non-trivial
    for how in ("semi", "anti"):
        plain = ev.join(cust, ev.user_id == cust.c_custkey,
                        "left" + how).select("event_id")
        salted = salted_join(ev, cust, "user_id", "c_custkey",
                             n_salts=8, how=how).select("event_id")
        assert sorted(r.event_id for r in plain.collect()) == \
            sorted(r.event_id for r in salted.collect()), how


def test_salted_aggregate_matches_plain(spark):
    ev = _skewed(spark)
    plain = ev.groupBy("user_id", "event_type").agg(
        F.sum("value").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    salted = salted_aggregate(
        ev, ["user_id", "event_type"],
        {"total": "sum(value)", "n": "count(*)", "lo": "min(value)", "hi": "max(value)"},
        n_salts=8,
    )
    p = {(r.user_id, r.event_type): (round(r.total, 6), r.n, r.lo, r.hi) for r in plain.collect()}
    s = {(r.user_id, r.event_type): (round(r.total, 6), r.n, r.lo, r.hi) for r in salted.collect()}
    assert p == s


def test_salted_aggregate_shuffles_on_salt(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = salted_aggregate(ev, ["user_id"], {"n": "count(*)"}, n_salts=8)
    plan = static_plan_text(out)
    # the first exchange must partition on (user_id, __salt), not user_id
    assert "__salt" in plan


def test_salt_is_deterministic_across_runs(spark):
    ev = load_table(spark, SF_DIR, "events")
    a = salted_aggregate(ev, ["user_id"], {"n": "count(*)"}, n_salts=8).collect()
    b = salted_aggregate(ev, ["user_id"], {"n": "count(*)"}, n_salts=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_join_rejects_right_and_full_outer(spark):
    ev = load_table(spark, SF_DIR, "events").limit(10)
    for bad in ("right", "right_outer", "full", "full_outer", "outer"):
        try:
            salted_join(ev, ev, "user_id", "user_id", how=bad)
            assert False, f"how={bad} should have raised"
        except ValueError as e:
            assert "replicated" in str(e)


def test_salted_aggregate_events_equals_naive(spark):
    """The registered salted aggregation must be answer-identical to
    the naive groupBy at any n_salts — salting changes the exchange
    topology, never the result."""
    from pyspark.sql import functions as F

    from hadoop_mapreduce_spark.operators.skew import (
        salted_aggregate_events,
    )
    from hadoop_mapreduce_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    for n_salts in (1, 16, 64):
        got = {r.event_type: (r.n_events, r.total_value_e6,
                              r.min_value_e6, r.max_value_e6)
               for r in salted_aggregate_events(
                   spark, SF_DIR, n_salts=n_salts).collect()}
        naive = {
            r.event_type: (r.n, r.s, r.mn, r.mx)
            for r in load_table(spark, SF_DIR, "events")
            .select("event_type",
                    F.expr("CAST(round(value * 1e6) AS BIGINT)").alias("v"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                 F.min("v").alias("mn"), F.max("v").alias("mx"))
            .collect()
        }
        assert got == naive, n_salts


def test_join_skew_audit_load_factors(spark):
    """Per-axis invariants on real fixtures: load factors average to
    ~1e6 across occupied partitions weighted by rows, the event_type
    axis is maximally concentrated (5 keys can occupy at most 5
    partitions), and every max_key_rows <= its partition's n_rows."""
    from hadoop_mapreduce_spark.operators.skew import join_skew_audit

    rows = join_skew_audit(spark, SF_DIR).collect()
    by_axis = {}
    for r in rows:
        by_axis.setdefault(r.axis, []).append(r)
    assert set(by_axis) == {"event_type", "user_id"}
    et = by_axis["event_type"]
    assert len(et) <= 5  # 5 distinct event types
    for r in rows:
        assert r.max_key_rows <= r.n_rows
        assert r.n_keys >= 1
    for axis, rs in by_axis.items():
        tot = sum(r.n_rows for r in rs)
        # sum over partitions of rows*32/tot == 32 (up to floor loss)
        s = sum(r.load_e6 for r in rs)
        assert 32 * 1_000_000 - len(rs) <= s <= 32 * 1_000_000
    # the hot axis concentrates: its max load factor must exceed the
    # user_id axis's max (5 keys in 32 slots vs many keys)
    assert max(r.load_e6 for r in et) > max(
        r.load_e6 for r in by_axis["user_id"])


def test_join_cardinality_audit_matches_real_join(spark):
    """actual_rows must equal the count of the real join it estimates,
    and the uniform-key estimate for orders x lineitem (FK join) lands
    within 2x of actual on TPC-H-shaped data."""
    from hadoop_mapreduce_spark.operators.skew import (
        join_cardinality_audit,
    )
    from hadoop_mapreduce_spark.sources.tables import load_table

    rows = {r.join_name: r for r in
            join_cardinality_audit(spark, SF_DIR).collect()}
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    real = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
    r = rows["orders_lineitem"]
    assert r.actual_rows == real
    assert r.est_rows > 0
    assert 500_000 <= r.err_ratio_e6 <= 2_000_000
    co = rows["customer_orders"]
    assert co.rows_a == load_table(spark, SF_DIR, "customer").count()
