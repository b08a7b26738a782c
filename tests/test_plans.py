"""Physical-plan assertions — the scale contract (SURVEY.md north star).

These tests pin the plan properties that matter at 100 TB: pushdown
reaching the parquet scan, column pruning, broadcast joins for dims,
no accidental cartesian products, partial aggregation present.
"""

from __future__ import annotations

from hadoop_mapreduce_spark.operators import relational
from hadoop_mapreduce_spark.operators.ngram import ngram_count
from hadoop_mapreduce_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    plan_text,
    static_plan_text,
    pushed_filters,
    scan_read_schema,
)
from hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_q6_filters_pushed_to_scan(spark):
    df = relational.q6_forecast_revenue(spark, SF_DIR)
    pf = pushed_filters(df)
    assert pf, "no PushedFilters line in plan"
    joined = " ".join(pf)
    assert "l_shipdate" in joined and "l_discount" in joined and "l_quantity" in joined


def test_ngram_scan_prunes_columns(spark):
    docs = load_table(spark, SF_DIR, "documents")
    df = ngram_count(docs, "text", 3)
    schemas = scan_read_schema(df)
    assert schemas and all("text:string" in s for s in schemas)
    # none of the unused columns should be read
    assert all("lang" not in s and "source" not in s for s in schemas)


def test_q5_uses_broadcast_joins(spark):
    df = relational.q5_local_supplier_volume(spark, SF_DIR)
    assert_broadcast_join(df, min_count=2)
    assert_no_cartesian(df)


def test_q1_partial_aggregation(spark):
    text = static_plan_text(relational.q1_pricing_summary(spark, SF_DIR))
    assert text.count("HashAggregate") >= 2, "partial+final agg expected"
    assert "codegen id" in text, "whole-stage codegen spans expected"


def test_topk_no_global_sort(spark):
    """limit-after-orderBy must compile to TakeOrderedAndProject, not a
    full range-partitioned sort."""
    text = plan_text(relational.sort_multi_key_limit(spark, SF_DIR))
    assert "TakeOrderedAndProject" in text


def test_range_theta_join_not_nested_loop(spark):
    """The equi-key keeps the range join a hash join (SortMerge or
    BroadcastHash), never a cartesian/BNLJ over the fact table."""
    text = plan_text(relational.join_range_theta(spark, SF_DIR))
    assert "CartesianProduct" not in text
    assert ("SortMergeJoin" in text) or ("BroadcastHashJoin" in text) or ("ShuffledHashJoin" in text)
