"""MERGE INTO emulation (operators/cdc.py): semantics unit tests on a
tiny controlled snapshot + the registered fixture queries' invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_mapreduce_spark.operators.cdc import (
    cdc_merge_orders,
    merge_apply,
    scd2_customer_history,
)
from tests.conftest import SF_DIR


def test_merge_apply_insert_update_delete(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "name", "val"],
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 22.0, "U"),   # update key 2
            (3, None, None, "D"),   # delete key 3
            (9, "i", 90.0, "I"),    # insert new key 9
        ],
        ["k", "name", "val", "op"],
    )
    got = {r.k: (r.name, r.val) for r in merge_apply(target, changes, "k").collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 22.0), 9: ("i", 90.0)}


def test_merge_apply_upsert_on_missing_update_key(spark):
    """An op='U' for a key absent from the target inserts (defensive
    upsert), never silently drops the change."""
    target = spark.createDataFrame([(1, 1.0)], ["k", "val"])
    changes = spark.createDataFrame([(7, 7.0, "U")], ["k", "val", "op"])
    got = {r.k: r.val for r in merge_apply(target, changes, "k").collect()}
    assert got == {1: 1.0, 7: 7.0}


def test_cdc_merge_orders_key_arithmetic(spark):
    """Next-snapshot invariants: all %10==1 keys gone, inserted keys
    present above the shift, updated keys keep their count."""
    out = cdc_merge_orders(spark, SF_DIR)
    rows = out.collect()
    assert rows
    # inserted rows carry the synthetic status 'N', and their keys sit
    # strictly above every key of the base snapshot (the shift is
    # max(o_orderkey), data-derived — see cdc_merge_orders docstring)
    from hadoop_mapreduce_spark.sources.tables import load_table

    base_max = (
        load_table(spark, SF_DIR, "orders")
        .agg(F.max("o_orderkey").alias("mx")).collect()[0].mx
    )
    by_status = {r.o_orderstatus: r for r in rows}
    assert "N" in by_status
    assert by_status["N"].min_key > base_max


def test_merge_apply_compacts_duplicate_changes_no_seq(spark):
    """Several change rows for one key must compact (last-change-wins by
    the deterministic (op, payload) ordering), never fan out through the
    full-outer join and multiply snapshot rows."""
    target = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)],
                                   ["k", "name", "val"])
    changes = spark.createDataFrame(
        [
            (2, "b1", 21.0, "U"),
            (2, "b9", 29.0, "U"),  # wins: ('U','b9',29.0) > ('U','b1',21.0)
            (2, "b5", 25.0, "U"),
        ],
        ["k", "name", "val", "op"],
    )
    out = merge_apply(target, changes, "k").collect()
    assert len(out) == 2  # no fan-out
    got = {r.k: (r.name, r.val) for r in out}
    assert got == {1: ("a", 10.0), 2: ("b9", 29.0)}


def test_merge_apply_compacts_by_seq_col(spark):
    """With a change-sequence column the HIGHEST seq wins regardless of
    payload ordering, and a key whose changes all carry NULL seq still
    compacts deterministically (payload fallback) instead of producing a
    ghost null row."""
    target = spark.createDataFrame([(1, "a", 10.0)], ["k", "name", "val"])
    changes = spark.createDataFrame(
        [
            # key 1: seq decides — payload order would pick "zzz"
            (1, "zzz", 99.0, "U", 5),
            (1, "mid", 50.0, "U", 7),
            # key 8: all NULL seq — deterministic payload fallback, and
            # the row must NOT be dropped by max_by null-skipping
            (8, "n1", 1.0, "I", None),
            (8, "n2", 2.0, "I", None),
        ],
        ["k", "name", "val", "op", "seq"],
    )
    out = merge_apply(target, changes, "k", seq_col="seq").collect()
    got = {r.k: (r.name, r.val) for r in out}
    assert got == {1: ("mid", 50.0), 8: ("n2", 2.0)}


def test_merge_apply_seq_prefers_non_null(spark):
    """A non-NULL seq beats a NULL seq for the same key (null struct
    fields sort lowest)."""
    target = spark.createDataFrame([(1, 0.0)], ["k", "val"])
    changes = spark.createDataFrame(
        [(1, 111.0, "U", None), (1, 7.0, "U", 1)],
        ["k", "val", "op", "seq"],
    )
    got = {r.k: r.val for r in merge_apply(target, changes, "k",
                                           seq_col="seq").collect()}
    assert got == {1: 7.0}


def test_scd2_intervals_are_contiguous(spark):
    """valid_to of version v equals valid_from of version v+1 for each
    business key, and versions are dense from 1 (valid_to may be non-NULL
    on the last KEPT version when the customer has more changes beyond
    the version<=3 cut)."""
    hist = scd2_customer_history(spark, SF_DIR).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r.custkey, []).append(r)
    assert by_key
    for rows in by_key.values():
        rows.sort(key=lambda r: r.version)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        for prev, nxt in zip(rows, rows[1:]):
            assert prev.valid_to == nxt.valid_from


def test_ivm_orders_agg_equals_full_recompute(spark):
    """The delta-maintained view must equal aggregating the actually-
    merged snapshot (merge_apply + groupBy) — the self-maintainability
    contract, checked against the operator's own merge machinery."""
    from pyspark.sql import functions as F

    from hadoop_mapreduce_spark.operators.cdc import (
        ivm_orders_agg, merge_apply)
    from hadoop_mapreduce_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    got = {r.o_orderstatus: (r.n_orders, r.total_cents)
           for r in ivm_orders_agg(spark, SF_DIR).collect()}

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"))
    k = F.col("o_orderkey")
    mx = orders.agg(F.max("o_orderkey").alias("__mx"))
    changes = (
        orders.where(k % 10 == 0)
        .withColumn("cents", F.col("cents") + 1000)
        .withColumn("op", F.lit("U"))
        .unionByName(orders.where(k % 10 == 1).withColumn("op", F.lit("D")))
        .unionByName(
            orders.where(k % 10 == 2)
            .crossJoin(F.broadcast(mx))
            .withColumn("o_orderkey", k + F.col("__mx"))
            .drop("__mx")
            .withColumn("o_orderstatus", F.lit("N"))
            .withColumn("op", F.lit("I")))
    )
    merged = merge_apply(orders, changes, "o_orderkey")
    want = {r.o_orderstatus: (r.n, r.c) for r in
            merged.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("cents").alias("c")).collect()}
    assert got == want
