"""Invariants for the r8v wave (Bloom join prefilter / rich club).
Oracle parity is enforced by test_oracle_parity_all; these pin the
no-false-negative property and the exact closed-form densities."""

from __future__ import annotations

from collections import defaultdict

from hadoop_mapreduce_spark.operators.dedup import (
    _dup_edges,
    graph_rich_club,
)
from hadoop_mapreduce_spark.operators.relational import (
    bloom_join_prefilter_audit,
)
from hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_bloom_prefilter_superset_and_accounting(spark):
    rows = bloom_join_prefilter_audit(spark, SF_DIR).collect()
    cust = load_table(spark, SF_DIR, "customer").collect()
    orders = load_table(spark, SF_DIR, "orders").collect()
    keys = {c.c_custkey for c in cust if c.c_mktsegment == "BUILDING"}
    per = defaultdict(lambda: [0, 0])
    for o in orders:
        per[o.o_orderpriority][0] += 1
        if o.o_custkey in keys:
            per[o.o_orderpriority][1] += 1
    assert {r.o_orderpriority for r in rows} == set(per)
    for r in rows:
        n, t = per[r.o_orderpriority]
        assert r.n_probe_rows == n
        assert r.n_true_match == t
        # Bloom filters never miss: pass is a superset of truth
        assert r.n_pass_bloom >= r.n_true_match
        assert r.n_false_pos == r.n_pass_bloom - r.n_true_match
        assert 0 <= r.fp_rate_e6 <= 1_000_000
        assert r.scan_reduction_e6 == \
            (n - r.n_pass_bloom) * 1_000_000 // n
        # 2^14 bits over the fixture's key count keeps FPR well under
        # the theoretical few-percent envelope
        assert r.fp_rate_e6 < 100_000


def test_rich_club_exact_densities_and_nesting(spark):
    rows = {r.k: r for r in graph_rich_club(spark, SF_DIR).collect()}
    edges = [(r.id1, r.id2) for r in
             _dup_edges(spark, SF_DIR, 0.5).collect()]
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    for k in (1, 2, 4, 8):
        club = {v for v, d in deg.items() if d > k}
        ek = sum(1 for u, v in edges if u in club and v in club)
        r = rows[k]
        assert r.n_k == len(club)
        assert r.e_k == ek
        if len(club) >= 2:
            assert r.phi_e6 == \
                2 * ek * 1_000_000 // (len(club) * (len(club) - 1))
        else:
            assert r.phi_e6 is None
    # clubs are nested: n_k and e_k both non-increasing in k
    ks = sorted(rows)
    for a, b in zip(ks, ks[1:]):
        assert rows[b].n_k <= rows[a].n_k
        assert rows[b].e_k <= rows[a].e_k
