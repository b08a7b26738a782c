"""Invariants for the r8r wave (CUPED adjustment / dedup token
savings). Oracle parity is enforced by test_oracle_parity_all; these
replay CUPED's moment algebra in exact Python and tie the savings
ledger to dedup_keep_best's own winners."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from hadoop_mapreduce_spark.operators.curation import ab_cuped_adjustment
from hadoop_mapreduce_spark.operators.dedup import (
    dedup_keep_best,
    dedup_token_savings,
)
from hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_cuped_exact_moment_replay(spark):
    rows = {r.arm: r for r in ab_cuped_adjustment(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events").select(
        "ts", "user_id", "value").collect()
    epoch = ev[0].ts.__class__(1970, 1, 1)
    days = [int((r.ts - epoch).total_seconds() * 1_000_000)
            // 86_400_000_000 for r in ev]
    d0 = min(days)
    xs, ys = defaultdict(int), defaultdict(int)
    for r, d in zip(ev, days):
        v = int(round(r.value * 1e6))  # round-half matches both engines
        if d < d0 + 15:
            xs[r.user_id] += v
        else:
            ys[r.user_id] += v
            xs.setdefault(r.user_id, 0)
    users = sorted(set(xs) | set(ys))
    x = {u: xs.get(u, 0) for u in users}
    y = {u: ys.get(u, 0) for u in users}
    n = len(users)
    sx, sy = sum(x.values()), sum(y.values())
    sxy = sum(x[u] * y[u] for u in users)
    sxx = sum(x[u] * x[u] for u in users)
    syy = sum(y[u] * y[u] for u in users)
    cov_n, var_xn, var_yn = n * sxy - sx * sy, n * sxx - sx * sx, \
        n * syy - sy * sy
    theta = 0.0 if var_xn == 0 else cov_n / var_xn
    rho2 = 0.0 if var_xn == 0 or var_yn == 0 else \
        (cov_n * cov_n) / (var_xn * var_yn)
    by_arm = defaultdict(list)
    for u in users:
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
        by_arm[arm].append(u)
    for arm, us in by_arm.items():
        r = rows[arm]
        assert r.n_users == len(us)
        my = sum(y[u] for u in us) / len(us)
        mx = sum(x[u] for u in us) / len(us)
        adj = my - theta * (mx - sx / n)
        assert r.mean_y_e6 == math.floor(my + 0.5)
        assert r.mean_y_cuped_e6 == math.floor(adj + 0.5)
        assert r.theta_e6 == math.floor(theta * 1e6 + 0.5)
        assert r.var_reduction_e6 == math.floor(rho2 * 1e6 + 0.5)
        assert 0 <= r.var_reduction_e6 <= 1_000_000
    # CUPED must not move the POOLED mean (user-weighted across arms):
    # sum_arms n_a * (adj_a - raw_a) = -theta * sum_arms n_a*(mx_a - mx)
    # = 0 by construction — check the e6-rounded versions stay within
    # rounding slack
    drift = sum(rows[a].n_users * (rows[a].mean_y_cuped_e6
                                   - rows[a].mean_y_e6)
                for a in rows)
    assert abs(drift) <= sum(r.n_users for r in rows.values())


def test_token_savings_ties_to_keep_best(spark):
    rows = {r.source: r for r in
            dedup_token_savings(spark, SF_DIR).collect()}
    kb = dedup_keep_best(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source").collect()
    src = {d.doc_id: d.source for d in docs}
    # keep_best reports multi-member clusters: dropped = members - 1
    n_dropped_total = sum(r.n_members - 1 for r in kb)
    assert sum(r.n_dropped for r in rows.values()) == n_dropped_total
    # totals account for every document exactly once
    assert sum(r.n_docs for r in rows.values()) == len(docs)
    per_src = defaultdict(int)
    for d in docs:
        per_src[d.source] += 1
    for s, r in rows.items():
        assert r.n_docs == per_src[s]
        assert 0 <= r.n_dropped < r.n_docs or r.n_docs == r.n_dropped == 0
        assert r.dropped_tokens <= r.total_tokens
        assert r.doc_savings_e6 == r.n_dropped * 1_000_000 // r.n_docs
        if r.total_tokens:
            assert r.token_savings_e6 == \
                r.dropped_tokens * 1_000_000 // r.total_tokens
    assert set(rows) == set(per_src)
    assert src  # silence unused warning paths on empty fixtures
