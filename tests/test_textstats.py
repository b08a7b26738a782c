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


def test_bigram_lm_quality_matches_python_model(spark, tmp_path):
    """Exact-model check on a crafted corpus: the per-doc score must
    equal the pure-Python interpolated bigram LM to 6 dp, and the
    repetitive doc must out-score the doc full of one-off transitions."""
    import math
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_mapreduce_spark.operators.textstats import bigram_lm_quality

    texts = [
        "the cat sat on the mat and the cat sat on the mat",
        "the cat sat on the mat and the cat sat on the rug",
        "quantum flux capacitor resonates beneath crimson obelisks nightly",
        "the dog sat on the mat while the cat sat on the dog",
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["crafted"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    toks = [t.split() for t in texts]
    uni: Counter = Counter(w for t in toks for w in t)
    n_uni = sum(uni.values())
    big: Counter = Counter((t[i], t[i + 1]) for t in toks
                           for i in range(len(t) - 1))
    ctx: Counter = Counter()
    for (w1, _), c in big.items():
        ctx[w1] += c

    def score(t):
        lps = [math.log(0.7 * big[(a, b)] / ctx[a] + 0.3 * uni[b] / n_uni)
               for a, b in zip(t, t[1:])]
        return sum(lps) / len(lps)

    want = {i + 1: round(score(t), 6) for i, t in enumerate(toks)}
    got = {r.doc_id: r.bigram_lp
           for r in bigram_lm_quality(spark, str(tmp_path)).collect()}
    assert got == want
    # doc 4 pairs common contexts with one-off continuations — under an
    # interpolated bigram LM that is the most surprising shape (note the
    # all-hapax doc 3 is NOT: a context seen once predicts its single
    # continuation with p = lam, so self-trained hapax runs score high)
    assert min(got, key=got.get) == 4
    # repetitive doc 1 scores above its one-edit sibling doc 2
    assert got[1] > got[2]
