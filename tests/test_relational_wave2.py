"""Second-wave relational operators: plan properties + semantic
invariants the oracle hash can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_mapreduce_spark.operators import relational, timeseries, udfs
from hadoop_mapreduce_spark.plans.explain import assert_no_cartesian, plan_text
from hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_q19_or_of_ands_stays_hash_join(spark):
    df = relational.q19_discounted_revenue(spark, SF_DIR)
    assert_no_cartesian(df)
    assert "BroadcastHashJoin" in plan_text(df)


def test_q4_exists_is_semi_join(spark):
    text = plan_text(relational.q4_order_priority(spark, SF_DIR))
    assert "LeftSemi" in text


def test_q22_anti_join_plan(spark):
    text = plan_text(relational.q22_global_sales_opportunity(spark, SF_DIR))
    assert "LeftAnti" in text


def test_pivot_schema_static(spark):
    df = relational.pivot_status_by_segment(spark, SF_DIR)
    assert df.columns == ["c_mktsegment", "n_f", "n_o", "n_p"]


def test_grouping_sets_cardinality(spark):
    rows = relational.grouping_sets_sales(spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem")
    n_pairs = li.select("l_returnflag", "l_linestatus").distinct().count()
    n_flags = li.select("l_returnflag").distinct().count()
    assert len(rows) == n_pairs + n_flags + 1
    # grand-total row: both keys null, gid has both bits set
    total = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(total) == 1 and total[0].gid == 3


def test_gap_fill_preserves_total_and_fills_zeros(spark):
    out = timeseries.events_gap_fill(spark, SF_DIR)
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == load_table(spark, SF_DIR, "events").count()
    assert out.where(F.col("n") == 0).count() > 0  # gaps actually filled


def test_zscore_group_mean_zero(spark):
    out = udfs.udf_apply_in_pandas_zscore(spark, SF_DIR)
    worst = (
        out.groupBy("user_id").agg(F.abs(F.avg("zscore")).alias("m"))
        .agg(F.max("m")).collect()[0][0]
    )
    assert worst < 1e-4


def test_full_outer_keeps_both_sides(spark):
    out = relational.join_full_outer(spark, SF_DIR).collect()
    # every row has both counts defined (coalesced), key is total
    assert all(r.nationkey is not None for r in out)
    assert all(r.n_cust >= 0 and r.n_supp >= 0 for r in out)
