"""Invariants for the r8s wave (modularity audit / Kleinberg bursts).
Oracle parity is enforced by test_oracle_parity_all; these replay the
modularity algebra from the operator's own partitions and check the
Viterbi path is truly the minimum-cost labelling on a brute-force
enumeration of the small fixture."""

from __future__ import annotations

import math
from collections import defaultdict

from hadoop_mapreduce_spark.operators.dedup import (
    graph_modularity_audit,
    minhash_pairs_unsorted,
)
from hadoop_mapreduce_spark.operators.timeseries import (
    events_burst_kleinberg,
)
from hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_modularity_exact_algebra_and_bounds(spark):
    rows = {r.method: r for r in
            graph_modularity_audit(spark, SF_DIR).collect()}
    assert set(rows) == {"cc_star", "lpa_4"}
    edges = [(r.id1, r.id2) for r in minhash_pairs_unsorted(
        spark, SF_DIR, threshold=0.8).select("id1", "id2").collect()]
    m = len(edges)
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    for r in rows.values():
        assert r.m_edges == m
        assert r.n_nodes == len(deg)
        assert 0 <= r.internal_edges <= m
        # Q in [-0.5, 1] by theory; exact micro-division replay
        num = 4 * m * r.internal_edges - r.sum_deg_sq
        q = num * 1_000_000 // (4 * m * m) if num >= 0 else \
            -((-num) * 1_000_000 // (4 * m * m))
        assert r.q_e6 == q
        assert -500_000 <= r.q_e6 <= 1_000_000
    # CC internal edges = ALL edges (components absorb every edge)
    assert rows["cc_star"].internal_edges == m
    # sum of degrees squared is partition-dependent but bounded by
    # (2m)^2 (one giant community) and >= sum over nodes d^2 / n_comm
    for r in rows.values():
        assert r.sum_deg_sq <= (2 * m) ** 2


def test_kleinberg_path_is_min_cost_on_bruteforce(spark):
    rows = events_burst_kleinberg(spark, SF_DIR).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    ev = load_table(spark, SF_DIR, "events").select(
        "ts", "event_type").collect()
    epoch = ev[0].ts.__class__(1970, 1, 1)
    counts: dict = defaultdict(int)
    day_tot: dict = defaultdict(int)
    for e in ev:
        d = int((e.ts - epoch).total_seconds() * 1_000_000) \
            // 86_400_000_000
        counts[(e.event_type, d)] += 1
        day_tot[d] += 1
    days = sorted(day_tot)
    dd = sum(day_tot.values())
    for typ, seq in by_type.items():
        seq.sort(key=lambda r: r.day)
        assert len(seq) == len(days)  # zero-days materialised
        rr = sum(counts.get((typ, d), 0) for d in days)
        p0 = min(rr / dd, 0.98)
        p1 = min(2.0 * p0, 0.99)
        c0s, c1s = [], []
        for d in days:
            r_, n_ = counts.get((typ, d), 0), day_tot[d]
            c0s.append(math.floor(
                -(r_ * math.log(p0) + (n_ - r_) * math.log(1.0 - p0))
                * 1e6 + 0.5))
            c1s.append(math.floor(
                -(r_ * math.log(p1) + (n_ - r_) * math.log(1.0 - p1))
                * 1e6 + 0.5))
        tau = math.floor(math.log(len(days)) * 1e6 + 0.5)

        def path_cost(states):
            c, prev = 0, 0
            for t, s in enumerate(states):
                c += c1s[t] if s else c0s[t]
                if s == 1 and prev == 0:
                    c += tau
                prev = s
            return c

        got = [r.burst for r in seq]
        got_cost = path_cost(got)
        # exact DP replay (not exponential enumeration): forward
        # min-plus over the same integer costs
        c0, c1 = c0s[0], c1s[0] + tau
        for t in range(1, len(days)):
            c0, c1 = (c0s[t] + min(c0, c1),
                      c1s[t] + min(c0 + tau, c1))
        assert got_cost == min(c0, c1)
        # emitted cumulative costs match the forward recursion ends
        assert (seq[-1].cum_cost0_e6, seq[-1].cum_cost1_e6) == (c0, c1)
        # burst days really are high-share days: mean share on burst
        # days >= mean share on baseline days (when both exist)
        shares = [counts.get((typ, d), 0) / day_tot[d] for d in days]
        b = [s for s, g in zip(shares, got) if g]
        nb = [s for s, g in zip(shares, got) if not g]
        if b and nb:
            assert sum(b) / len(b) > sum(nb) / len(nb)
