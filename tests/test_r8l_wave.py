"""Invariants for the r8l wave (Fellegi-Sunter linkage weights /
absorbing-chain funnel). Oracle parity is enforced by
test_oracle_parity_all; these pin the semantic claims, including an
exact pure-Python replay of the truncated value iteration."""

from __future__ import annotations

import math
from collections import Counter

from hadoop_mapreduce_spark.operators.relational import (
    fellegi_sunter_weights,
)
from hadoop_mapreduce_spark.operators.timeseries import (
    markov_absorption_steps,
)
from hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_fs_weights_consistent_and_name_field_informative(spark):
    rows = {r.field: r for r in
            fellegi_sunter_weights(spark, SF_DIR).collect()}
    assert set(rows) == {"bal_close", "name_suffix2", "bal_band"}
    n_m = {r.n_m for r in rows.values()}
    n_u = {r.n_u for r in rows.values()}
    assert len(n_m) == 1 and len(n_u) == 1  # same pair population
    cust = load_table(spark, SF_DIR, "customer").count()
    for r in rows.values():
        assert 0 <= r.agree_m <= r.n_m and 0 <= r.agree_u <= r.n_u
        assert 1 <= r.m_e6 <= 999_999 and 1 <= r.u_e6 <= 999_999
        assert r.m_e6 == min(999_999, max(
            1, (r.agree_m + 1) * 1_000_000 // (r.n_m + 2)))
        # weights re-derive from the micro-unit probabilities
        assert r.w_agree_e6 == math.floor(
            math.log(r.m_e6 / r.u_e6) * 1e6 + 0.5)
        assert r.w_disagree_e6 == math.floor(
            math.log((1_000_000 - r.m_e6) / (1_000_000 - r.u_e6))
            * 1e6 + 0.5)
    # the in-block pair population is bounded by all unordered pairs
    assert n_m.pop() + n_u.pop() <= cust * (cust - 1) // 2
    # evidence arithmetic: m > u  <=>  positive agreement weight (the
    # F-S sign contract; which fields carry evidence is data-dependent)
    for r in rows.values():
        assert (r.w_agree_e6 > 0) == (r.m_e6 > r.u_e6)
        if r.m_e6 != r.u_e6:
            # agree and disagree weights pull in opposite directions
            assert (r.w_agree_e6 > 0) != (r.w_disagree_e6 > 0)


def test_markov_absorption_exact_replay(spark):
    rows = {r.state: r for r in
            markov_absorption_steps(spark, SF_DIR).collect()}
    assert rows and "purchase" not in rows  # absorbing has no row
    # rebuild the transition counts with the same sessionisation
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type").collect()
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    trans: Counter = Counter()
    for sessions in by_user.values():
        sessions.sort(key=lambda e: (e.ts, e.event_id))
        prev_ts, sid = None, 0
        groups: dict[int, list] = {}
        for e in sessions:
            if prev_ts is not None and (
                    e.ts - prev_ts).total_seconds() > 1800:
                sid += 1
            groups.setdefault(sid, []).append(e.event_type)
            prev_ts = e.ts
        for g in groups.values():
            for a, b in zip(g, g[1:] + ["END"]):
                if a != "purchase":
                    trans[(a, b)] += 1
    states = sorted({a for a, _ in trans})
    n_out = {s: sum(c for (a, _), c in trans.items() if a == s)
             for s in states}
    v = {s: 0 for s in states}
    p = {s: 0 for s in states}
    for _ in range(12):
        nv, np_ = {}, {}
        for s in states:
            sv = sum(c * v[t] for (a, t), c in trans.items()
                     if a == s and t in v)
            sp = sum(c * (1_000_000 if t == "purchase" else p.get(t, 0))
                     for (a, t), c in trans.items() if a == s)
            nv[s] = 1_000_000 + sv // n_out[s]
            np_[s] = sp // n_out[s]
        v, p = nv, np_
    assert set(rows) == set(states)
    for s in states:
        r = rows[s]
        assert r.n_out == n_out[s]
        assert r.steps_to_absorb_e6 == v[s], s
        assert r.p_purchase_e6 == p[s], s
        assert r.steps_to_absorb_e6 >= 1_000_000  # at least one step
        assert 0 <= r.p_purchase_e6 <= 1_000_000
        assert r.n_to_purchase <= r.n_out
