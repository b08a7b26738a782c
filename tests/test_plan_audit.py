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
PYTHON_ROW_OK = {"udf_python_scalar", "udtf_tokens"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_obeys_scale_contract(spark, name):
    plan = static_plan_text(QUERIES[name](spark, SF_DIR))
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: unexpected cartesian product"
    if name not in PYTHON_ROW_OK:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF in the hot path"
        )
