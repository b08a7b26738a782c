"""Invariants for the r8p wave (removal-effect attribution / PSI
drift). Oracle parity is enforced by test_oracle_parity_all; these pin
the removal-monotonicity and share algebra, and replay PSI exactly in
Python (bins, smoothing, per-cell rounding)."""

from __future__ import annotations

import math
from collections import defaultdict

from hadoop_mapreduce_spark.operators.datamix import psi_source_drift
from hadoop_mapreduce_spark.operators.timeseries import (
    markov_attribution_removal,
)
from hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_attribution_removal_monotone_and_shares_normalise(spark):
    rows = markov_attribution_removal(spark, SF_DIR).collect()
    assert rows, "fixture has transient channels"
    base = {r.p_base_e6 for r in rows}
    assert len(base) == 1  # one base world
    p_base = base.pop()
    assert p_base > 0  # purchases exist in the fixture
    for r in rows:
        # removal can only destroy conversion paths
        assert 0 <= r.p_removed_e6 <= p_base
        assert r.removal_effect_e6 == \
            (p_base - r.p_removed_e6) * 1_000_000 // p_base
        assert 0 <= r.attribution_share_e6 <= 1_000_000
    te = sum(r.removal_effect_e6 for r in rows)
    if te > 0:
        for r in rows:
            assert r.attribution_share_e6 == \
                r.removal_effect_e6 * 1_000_000 // te
        # truncating shares sum to <= 1e6, within |channels| micro-units
        s = sum(r.attribution_share_e6 for r in rows)
        assert 1_000_000 - len(rows) < s <= 1_000_000
    # removing 'purchase' itself is not a scenario; channels are the
    # transient event types
    assert "purchase" not in {r.channel for r in rows}
    assert "START" not in {r.channel for r in rows}


def test_psi_exact_python_replay(spark):
    rows = {r.source: r for r in psi_source_drift(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "n_chars").collect()
    by_src = defaultdict(list)
    for d in docs:
        by_src[d.source].append(d.n_chars)
    allv = sorted(v for vs in by_src.values() for v in vs)
    n_all = len(allv)
    # decile edges: smallest value whose cumulative count reaches
    # ceil(j*N/10), computed on the counts-of-counts cumulative
    edges = []
    for j in range(1, 10):
        t = -(-j * n_all // 10)
        edges.append(allv[t - 1])

    def binof(x):
        return sum(1 for e in edges if x >= e)

    ref = defaultdict(int)
    for v in allv:
        ref[binof(v)] += 1
    for src, vs in by_src.items():
        sb = defaultdict(int)
        for v in vs:
            sb[binof(v)] += 1
        psi = 0
        for b in ref:
            ps = (sb.get(b, 0) + 1) / (len(vs) + 10)
            pr = (ref[b] + 1) / (n_all + 10)
            psi += math.floor((ps - pr) * math.log(ps / pr) * 1e6 + 0.5)
        r = rows[src]
        assert r.n_docs == len(vs)
        assert r.psi_e6 == psi
        want = ("MAJOR" if psi > 250_000
                else "MODERATE" if psi > 100_000 else "STABLE")
        assert r.drift_flag == want
    assert set(rows) == set(by_src)
