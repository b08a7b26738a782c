"""Invariants for the r8t wave (isotonic PAV fit / JL distortion).
Oracle parity is enforced by test_oracle_parity_all; these check the
PAV output against a classical sequential pool-adjacent-violators run
and the JL audit against theory-level sanity bounds."""

from __future__ import annotations

from hadoop_mapreduce_spark.operators.curation import (
    isotonic_calibration_pav,
)
from hadoop_mapreduce_spark.operators.similarity import (
    JL_D,
    JL_K,
    JL_SIGNS,
    embedding_jl_distortion_audit,
)
from hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_pav_monotone_and_matches_sequential_pav(spark):
    rows = isotonic_calibration_pav(spark, SF_DIR).collect()
    assert rows == sorted(rows, key=lambda r: r.bin)
    # fitted rates are non-decreasing — the defining isotonic property
    iso = [r.iso_rate_e6 for r in rows]
    assert iso == sorted(iso)
    # classical sequential PAV on the same e6-rounded pooled means
    # (pool = weighted merge; compare at interval-mean granularity)
    blocks = [[r.bin, r.n_docs, r.n_pos] for r in rows]
    merged = []
    for b in blocks:
        merged.append(list(b))
        while len(merged) >= 2:
            (b1, n1, p1), (b2, n2, p2) = merged[-2], merged[-1]
            if p1 * 1_000_000 // n1 > p2 * 1_000_000 // n2:
                merged[-2:] = [[b1, n1 + n2, p1 + p2]]
            else:
                break
    got = {r.bin: r.iso_rate_e6 for r in rows}
    # expand pooled blocks in order over the row sequence: every
    # original bin inside a block gets the block's pooled mean
    i = 0
    for b0, n, p in merged:
        val = p * 1_000_000 // n
        remaining = n
        while remaining > 0:
            r = rows[i]
            assert got[r.bin] == val
            remaining -= r.n_docs
            i += 1
    assert i == len(rows)
    # corrections are consistent
    for r in rows:
        assert r.correction_e6 == abs(
            r.n_pos * 1_000_000 // r.n_docs - r.iso_rate_e6)


def test_jl_distortion_concentrates_near_one(spark):
    rows = embedding_jl_distortion_audit(spark, SF_DIR).collect()
    n_vec = load_table(spark, SF_DIR, "embeddings").count()
    total = sum(r.n_pairs for r in rows)
    # one pair per adjacent id (minus any zero-distance pairs)
    assert total <= n_vec - 1
    assert total >= (n_vec - 1) * 9 // 10
    # sign matrix is the documented shape and ±1-valued
    assert len(JL_SIGNS) == JL_K and all(
        len(r) == JL_D and set(r) <= {-1, 1} for r in JL_SIGNS)
    # E[ratio] = 1: the pair-weighted mean of bin means must sit near
    # 1e6 (k=16 => sd of the ratio ~ sqrt(2/k) ~ 0.35; the mean over
    # ~100+ pairs concentrates much tighter)
    mean = sum(r.n_pairs * r.mean_ratio_e6 for r in rows) / total
    assert 700_000 < mean < 1_300_000
    # the central bins must hold the bulk of the mass (JL concentration)
    central = sum(r.n_pairs for r in rows if 2 <= r.bin <= 4)
    extreme = sum(r.n_pairs for r in rows if r.bin in (0, 6))
    assert central > extreme
