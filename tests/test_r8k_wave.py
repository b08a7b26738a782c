"""Invariants for the r8k wave (Wasserstein drift / shuffle-order runs
audit / zone-map skipping). Oracle parity is enforced by
test_oracle_parity_all; these pin the semantic claims the docstrings
make, including exact pure-Python re-derivations of both statistics."""

from __future__ import annotations

import hashlib
from collections import Counter

from hadoop_mapreduce_spark.operators.datamix import (
    shard_order_runs_audit,
    wasserstein_source_drift,
)
from hadoop_mapreduce_spark.operators.layout import zone_map_skipping_audit
from hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _w1_chars_e6(src_lengths, rest_lengths):
    """Exact integer re-derivation of the operator's statistic."""
    cs, cr = Counter(src_lengths), Counter(rest_lengths)
    ns, nr = len(src_lengths), len(rest_lengths)
    xs = sorted(set(cs) | set(cr))
    total, cum_s, cum_r = 0, 0, 0
    for x, nxt in zip(xs, xs[1:]):
        cum_s += cs.get(x, 0)
        cum_r += cr.get(x, 0)
        total += abs(cum_s * nr - cum_r * ns) * (nxt - x)
    return total * 1_000_000 // (ns * nr)


def test_wasserstein_matches_exact_rederivation(spark):
    rows = {r.source: r for r in
            wasserstein_source_drift(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "n_chars").collect()
    by_src: dict[str, list[int]] = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(d.n_chars)
    assert set(rows) == set(by_src)
    n_all = len(docs)
    for src, r in rows.items():
        assert r.n_src == len(by_src[src])
        assert r.n_rest == n_all - r.n_src
        rest = [c for s, ls in by_src.items() if s != src for c in ls]
        assert r.w1_chars_e6 == _w1_chars_e6(by_src[src], rest), src
        assert r.w1_chars_e6 >= 0


def test_shard_runs_audit_exact_expectation_and_coverage(spark):
    rows = shard_order_runs_audit(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source").collect()
    assert sum(r.n_docs for r in rows) == len(docs)
    # re-derive per-shard composition + the adjacency walk
    shards: dict[int, list] = {}
    for d in docs:
        h = int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:15], 16)
        shards.setdefault(h % 8, []).append(
            (hashlib.md5(str(d.doc_id).encode()).hexdigest(), d.doc_id,
             d.source))
    for r in rows:
        members = sorted(shards[r.shard])
        n = len(members)
        assert r.n_docs == n
        obs = sum(1 for a, b in zip(members, members[1:]) if a[2] == b[2])
        assert r.obs_same_adj == obs
        cnt = Counter(m[2] for m in members)
        pairs = sum(c * (c - 1) for c in cnt.values())
        assert r.exp_same_adj_e6 == pairs * 1_000_000 // n
        if pairs:
            assert r.ratio_obs_exp_e6 == obs * n * 1_000_000 // pairs
    # md5 order is independent of source: the pooled ratio should sit
    # near 1e6, not at the keyed-order extremes (0 or >> 1e6)
    tot_obs = sum(r.obs_same_adj for r in rows)
    tot_exp = sum(r.exp_same_adj_e6 for r in rows) / 1e6
    assert 0.2 < (tot_obs + 1) / (tot_exp + 1) < 5.0


def test_zone_map_layouts_tell_the_pruning_story(spark):
    rows = zone_map_skipping_audit(spark, SF_DIR).collect()
    assert len(rows) == 18  # 3 layouts x 6 probes
    by = {(r.layout, r.probe_id): r for r in rows}
    ev_rows = load_table(spark, SF_DIR, "events").count()
    for r in rows:
        assert 0 < r.n_files <= 64
        assert 0 <= r.files_skipped <= r.n_files
        assert 0 <= r.rows_skipped <= ev_rows
        assert r.skip_frac_e6 == r.files_skipped * 1_000_000 // r.n_files
        if r.files_skipped == r.n_files:  # can't skip every file a
            raise AssertionError("probe skipped all files — probe "
                                 "ranges must intersect the data")
    # the single-key layout prunes its own key and nothing else
    for p in (0, 1):  # x probes
        assert by[("sorted_x", p)].files_skipped > \
            by[("natural", p)].files_skipped
        assert by[("zorder", p)].files_skipped > 0
    for p in (2, 3):  # y probes
        assert by[("sorted_x", p)].files_skipped == 0
        assert by[("zorder", p)].files_skipped > 0
    # combined probes: the curve prunes at least as well as either
    # single-dimension layout does on its own axis
    for p in (4, 5):
        assert by[("zorder", p)].files_skipped >= \
            by[("sorted_x", p)].files_skipped
