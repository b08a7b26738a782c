"""Semantic invariants for text-analysis operators (operators/
textstats.py) that the oracle comparison can't express. Oracle parity
for the SQL-expressible ones runs in tests/test_oracle_parity_all.py."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_unigram_logprob_quality_bounds(spark):
    """Scores are negative log-probs (strictly < 0), the flag count is
    bounded by docs, and the adaptive cut flags a strict, non-empty
    subset (the threshold sits 0.05 below the mean, so it can't flag
    everything and the fixture's planted repetition flags something)."""
    from hadoop_mapreduce_spark.operators.textstats import (
        unigram_logprob_quality,
    )

    rows = unigram_logprob_quality(spark, SF_DIR).collect()
    assert len(rows) == 20
    n = sum(r.n_docs for r in rows)
    flagged = sum(r.n_low_quality for r in rows)
    assert all(r.avg_logprob < 0 for r in rows)
    assert all(0 <= r.n_low_quality <= r.n_docs for r in rows)
    assert 0 < flagged < n


def test_hll_union_within_5pct_of_exact(spark):
    """Sketch invariant: every per-source estimate and the unioned
    __all__ estimate land within 5% of the exact distinct count (HLL
    registers are order-independent, so this is deterministic)."""
    from pyspark.sql import functions as F

    from hadoop_mapreduce_spark.operators.textstats import (
        _tokens,
        hll_union_sources,
    )
    from hadoop_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    tok = docs.select("source", F.explode(_tokens("text")).alias("tk"))
    exact = {r.source: r.n for r in tok.groupBy("source")
             .agg(F.countDistinct("tk").alias("n")).collect()}
    exact["__all__"] = tok.select("tk").distinct().count()
    for r in hll_union_sources(spark, SF_DIR).collect():
        want = exact[r.source]
        assert abs(r.est_distinct - want) <= max(1, 0.05 * want), \
            (r.source, r.est_distinct, want)
