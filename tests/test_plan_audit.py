"""Fleet-wide plan audit: every registered query's physical plan obeys
the scale contract — no accidental cartesian products, no row-at-a-time
Python evaluation outside the one query that exists to demonstrate it.

Plans are built (analyzed + optimized), never executed, so this audits
all ~86 queries in seconds.
"""

from __future__ import annotations

import pytest

from hadoop_mapreduce_spark.plans.explain import static_plan_text
from hadoop_mapreduce_spark.registry import QUERIES
from tests.conftest import SF_DIR

# intentional cross joins / broadcast nested loops:
#   join_cross            — the cross-join operator itself
#   sim_search_topk/ann_ivf_topk/embedding LSH — broadcast NL scoring passes
#   q11/q15/q17           — scalar-aggregate crossJoin (1-row broadcast)
CARTESIAN_OK = {
    "join_cross",
    "sim_search_topk",
    "ann_ivf_topk",
    "q11_important_stock",
    "q15_top_supplier",
    "q22_global_sales_opportunity",
}

# queries that intentionally demonstrate row-at-a-time Python evaluation
# (the scalar-UDF and UDTF API surfaces; each has a JVM-side twin)
PYTHON_ROW_OK = {
    "udf_python_scalar",
    "udtf_tokens",
    # deliberate Python-path UDTF declaration (the analyze() API)
    "udtf_polymorphic_topn",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_obeys_scale_contract(spark, name):
    plan = static_plan_text(QUERIES[name](spark, SF_DIR))
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: unexpected cartesian product"
    if name not in PYTHON_ROW_OK:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF in the hot path"
        )
    # the tokenize-in-lambda trap (round 4, 12x on the decontamination
    # scan): a regexp tokenizer nested inside a higher-order lambda BODY
    # is re-evaluated at every array position — O(len^2) per document.
    # A regexp in a higher-order function's INPUT argument is fine (it
    # evaluates once); only the paren-matched lambda body is audited.
    for body in _lambda_bodies(plan):
        assert "regexp_replace(" not in body, (
            f"{name}: regexp tokenizer inside a higher-order lambda body "
            f"(O(len^2) re-evaluation per element — materialise the "
            f"token array in a projection below the explode instead)"
        )


def _lambda_bodies(plan: str):
    """Yield the paren-matched argument text of every lambdafunction(...)
    occurrence in a plan string (covers nested lambdas: an outer body
    containing an inlined tokenizer is yielded whole)."""
    marker = "lambdafunction("
    start = plan.find(marker)
    while start >= 0:
        i = start + len(marker)
        depth = 1
        while i < len(plan) and depth:
            if plan[i] == "(":
                depth += 1
            elif plan[i] == ")":
                depth -= 1
            i += 1
        yield plan[start + len(marker):i - 1]
        start = plan.find(marker, start + 1)


def test_lambda_tokenizer_rule_catches_the_trap(spark):
    """The audit rule must actually fire on the pre-fix formulation
    (tokenizer expression nested in the n-gram transform lambda) — guards
    the guard."""
    from pyspark.sql import functions as F

    from hadoop_mapreduce_spark.functions.text import (
        ngrams_from_tokens, normalize_text, tokenize,
    )
    from hadoop_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    bad = docs.select(
        F.explode(
            ngrams_from_tokens(tokenize(normalize_text(F.col("text"))), 4)
        ).alias("g")
    )
    plan = static_plan_text(bad)
    assert any("regexp_replace(" in b for b in _lambda_bodies(plan)), (
        "audit rule no longer detects the tokenize-in-lambda pattern — "
        "either Catalyst now hoists it (great: delete this test and the "
        "rule) or the plan text format changed (update _lambda_bodies)"
    )
