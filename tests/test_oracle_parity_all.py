"""Differential oracle parity for EVERY oracle-paired query, in-repo.

The driver runs this comparison at sf0.01 per round; this test enforces
the same contract at sf0.001 on every pytest run, so an operator can't
silently drift from its oracle between rounds. Queries registered
without SQL (approximate/stateful) are exercised rows-only: they must
execute and return a well-formed result.

Rows are compared IN EMITTED ORDER whenever the oracle carries an ORDER
BY — a regression in a query's sort would otherwise slip through a
multiset comparison. Oracles whose ORDER BY is not total (ties leave
the within-tie order engine-defined) are listed in _TIED_ORDER and fall
back to multiset comparison, as do the few oracles with no ORDER BY.
"""

from __future__ import annotations

import pytest

from hadoop_mapreduce_spark.registry import ORACLE, QUERIES
from tests.conftest import SF_DIR

pytestmark = pytest.mark.deep  # full differential tier — see conftest.py


# Oracles where the ORDER BY does not pin a total order (ties possible),
# so Spark and DuckDB may legitimately interleave tied rows differently.
# AUDITED (round 4): tools/order_audit.py extracts every oracle's
# top-level ORDER BY key and checks for duplicated key tuples in DuckDB
# at sf0.01. It found two non-total keys — math_functions and
# project_compute ordered by (l_orderkey, l_linenumber), which is NOT
# unique in the synthetic fixture — fixed by adding full-column
# tie-breakers to both the Spark query and the oracle rather than
# listing them here. All other ordered oracles have total keys; the 4
# oracles with no ORDER BY (q6/q14/q17/q19, single-row aggregates) use
# the multiset path below. Re-run the audit when adding oracles.
_TIED_ORDER: set[str] = set()


def _key(rows, cols):
    return [tuple(str(v) for _, v in sorted(zip(cols, r))) for r in rows]


def _assert_no_decimal(rows, side, name):
    """DECIMAL values are banned from registered outputs: differential
    harnesses canonicalise Decimal inconsistently (Decimal('1.50') and
    float 1.5 stringify differently), and the only two registry entries
    that ever emitted DECIMAL were exactly the two that flaked at the
    round-5 driver gate. Exact money math belongs in integer cents or
    a final bit-stable double, never in a collected Decimal."""
    from decimal import Decimal

    for r in rows[:50]:
        for v in r:
            assert not isinstance(v, Decimal), (
                f"{name}: {side} emits Decimal {v!r} — use BIGINT cents "
                "or a bit-stable double instead")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    got_rows = df.collect()
    sql = ORACLE.get(name)
    if sql is None:
        # rows-only contract: executes, yields columns, row count >= 0
        assert df.columns
        assert len(got_rows) >= 0
        return
    got_tuples = [tuple(r) for r in got_rows]
    got = _key(got_tuples, df.columns)
    cur = duck.execute(sql)
    want_rows = cur.fetchall()
    _assert_no_decimal(got_tuples, "spark", name)
    _assert_no_decimal(want_rows, "oracle", name)
    want = _key(want_rows, [d[0] for d in cur.description])
    assert sorted(df.columns) == sorted(d[0] for d in cur.description)
    ordered = "order by" in sql.lower() and name not in _TIED_ORDER
    if ordered:
        assert got == want
    else:
        assert sorted(got) == sorted(want)
