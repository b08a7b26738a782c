"""Invariants for the r8q wave (peeking audit / RLE run-length audit).
Oracle parity is enforced by test_oracle_parity_all; these replay the
cumulative experiment readout and the run counting exactly in Python."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from hadoop_mapreduce_spark.operators.curation import (
    experiment_peeking_audit,
)
from hadoop_mapreduce_spark.operators.layout import rle_run_length_audit
from hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_peeking_audit_exact_cumulative_replay(spark):
    rows = experiment_peeking_audit(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select(
        "ts", "user_id", "event_type").collect()
    entry, conv = {}, {}
    epoch = None
    for r in ev:
        if epoch is None:
            epoch = r.ts.__class__(1970, 1, 1)
        d = int((r.ts - epoch).total_seconds() * 1_000_000) \
            // 86_400_000_000
        entry[r.user_id] = min(entry.get(r.user_id, d), d)
        if r.event_type == "purchase":
            conv[r.user_id] = min(conv.get(r.user_id, d), d)
    arm = {u: int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
           for u in entry}
    days = sorted({int((r.ts - epoch).total_seconds() * 1_000_000)
                   // 86_400_000_000 for r in ev})
    assert len(rows) == len(days)
    cum_sig = 0
    for row, d in zip(rows, days):
        n = defaultdict(int)
        c = defaultdict(int)
        for u, ed in entry.items():
            if ed <= d:
                n[arm[u]] += 1
        for u, cd in conv.items():
            if cd <= d:
                c[arm[u]] += 1
        assert (row.n_a, row.n_b) == (n[0], n[1])
        assert (row.conv_a, row.conv_b) == (c[0], c[1])
        na, nb, ca, cb = n[0], n[1], c[0], c[1]
        if ca + cb > 0 and (na + nb) - (ca + cb) > 0 and na > 0 and nb > 0:
            num = (na + nb) * (ca * (nb - cb) - cb * (na - ca)) ** 2 \
                * 1_000_000
            den = na * nb * (ca + cb) * ((na + nb) - (ca + cb))
            chi2 = num // den
            assert row.chi2_e6 == chi2
            sig = 1 if chi2 > 3_841_458 else 0
        else:
            assert row.chi2_e6 is None
            sig = 0
        assert row.peek_sig == sig
        cum_sig += sig
        assert row.cum_sig_days == cum_sig
    # denominators only grow (cumulative readout)
    for a, b in zip(rows, rows[1:]):
        assert b.n_a >= a.n_a and b.n_b >= a.n_b
        assert b.conv_a >= a.conv_a and b.conv_b >= a.conv_b


def test_rle_runs_exact_and_order_sensitivity(spark):
    rows = {r.col_name: r for r in
            rle_run_length_audit(spark, SF_DIR).collect()}
    li = sorted(
        load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_suppkey", "l_partkey",
            "l_returnflag", "l_linestatus").collect(),
        key=lambda r: (r.l_orderkey, r.l_linenumber))
    for col in ("l_suppkey", "l_partkey", "l_returnflag", "l_linestatus"):
        vals = [getattr(r, col) for r in li]
        runs = 1 + sum(1 for a, b in zip(vals, vals[1:]) if a != b)
        r = rows[col]
        assert r.n_rows == len(vals)
        assert r.n_runs == runs
        assert r.n_distinct == len(set(vals))
        assert r.avg_run_len_e6 == len(vals) * 1_000_000 // runs
        assert r.sorted_runs_ratio_e6 == \
            r.n_distinct * 1_000_000 // runs
        # a sort can only merge runs, never split them
        assert r.n_distinct <= r.n_runs
    # the 3-value flag columns must show materially longer runs headroom
    # (sorted_runs_ratio far below 1e6) than the key-like columns
    assert rows["l_returnflag"].sorted_runs_ratio_e6 \
        < rows["l_suppkey"].sorted_runs_ratio_e6
