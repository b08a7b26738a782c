"""Invariants for the r8w wave (sketch IVM / time-decay attribution).
Oracle parity is enforced by test_oracle_parity_all; these pin the
register-monoid identity and replay the decay credit exactly."""

from __future__ import annotations

from collections import defaultdict

from hadoop_mapreduce_spark.operators.textstats import ivm_hll_registers
from hadoop_mapreduce_spark.operators.timeseries import (
    ATTR_DECAY_MAX_GAP,
    ATTR_DECAY_W_E6,
    attribution_time_decay,
)
from hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_ivm_merge_identity_holds_for_every_group(spark):
    rows = ivm_hll_registers(spark, SF_DIR).collect()
    assert rows, "events fixture has event types"
    for r in rows:
        # the monoid identity — witnessed in-data, not asserted
        assert r.merge_identity_holds == 1
        assert r.est_merged == r.est_full_recompute
        # merged distinct cannot exceed base+delta key counts and the
        # linear-counting regime keeps the estimate near the truth
        assert r.est_merged <= r.n_base_keys + r.n_delta_keys + 4
        assert r.est_base <= r.n_base_keys + 4
        assert r.est_delta <= r.n_delta_keys + 4
    # base and delta are both non-trivial under the day-25 split
    assert sum(r.n_delta_keys for r in rows) > 0
    assert sum(r.n_base_keys for r in rows) > 0


def test_time_decay_exact_replay(spark):
    rows = {r.channel: r for r in
            attribution_time_decay(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events").select(
        "ts", "user_id", "event_type").collect()
    epoch = ev[0].ts.__class__(1970, 1, 1)
    recs = [(r.user_id, r.event_type,
             int((r.ts - epoch).total_seconds() * 1_000_000)
             // 86_400_000_000) for r in ev]
    conv = {}
    for u, c, d in recs:
        if c == "purchase":
            conv[u] = min(conv.get(u, d), d)
    weighted = defaultdict(list)  # user -> [(channel, w)]
    for u, c, d in recs:
        if c != "purchase" and u in conv and d <= conv[u]:
            gap = min(conv[u] - d, ATTR_DECAY_MAX_GAP)
            weighted[u].append((c, ATTR_DECAY_W_E6[gap]))
    credit = defaultdict(int)
    ntouch = defaultdict(int)
    for u, ws in weighted.items():
        tw = sum(w for _, w in ws)
        for c, w in ws:
            credit[c] += w * 1_000_000 // tw
            ntouch[c] += 1
    total = sum(credit.values())
    assert set(rows) == set(credit)
    for c, r in rows.items():
        assert r.n_touches == ntouch[c]
        assert r.credit_e6 == credit[c]
        assert r.share_e6 == credit[c] * 1_000_000 // total
    # each conversion distributes ~1e6 micro-units (truncation slack
    # bounded by its touch count)
    n_convs_with_touch = len(weighted)
    assert 0 <= n_convs_with_touch * 1_000_000 - total \
        <= sum(len(v) for v in weighted.values())
