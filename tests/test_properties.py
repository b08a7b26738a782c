"""Property-based tests (hypothesis) — SURVEY.md §5 item 3.

Invariants that must hold for arbitrary inputs, not just fixtures:
n-gram count conservation, tokenizer delete-semantics, dedup
idempotence, salted-aggregation equivalence.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hadoop_mapreduce_spark.operators.ngram import ngram_count
from hadoop_mapreduce_spark.operators.skew import salted_aggregate

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

lines = st.lists(
    st.text(alphabet=st.characters(codec="ascii"), min_size=0, max_size=80),
    min_size=1, max_size=8,
)


@given(docs=lines, n=st.integers(1, 4))
@settings(**_SETTINGS)
def test_ngram_count_conservation(spark, docs, n):
    """Sum of all n-gram counts == sum over docs of max(0, tokens - n + 1)
    (the reference's per-line arithmetic, report.md: 10 tokens -> 8 trigrams)."""
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], ["doc_id", "text"])
    got = ngram_count(df, "text", n=n, sort=False).agg(F.sum("cnt")).collect()[0][0] or 0
    # reference model with JAVA \s semantics ([ \t\n\x0b\f\r] only —
    # python's \s also matches \x1c-\x1f etc., which Java deletes)
    java_ws = " \t\n\x0b\f\r"
    want = 0
    for d in docs:
        cleaned = re.sub(rf"[^a-zA-Z0-9{java_ws}]+", "", d).lower()
        toks = [t for t in re.split(rf"[{java_ws}]+", cleaned) if t]
        want += max(0, len(toks) - n + 1)
    assert got == want


@given(docs=lines)
@settings(**_SETTINGS)
def test_ngram_keys_only_contain_normalized_chars(spark, docs):
    """Every emitted n-gram is lowercase [a-z0-9] words joined by single
    spaces — the delete-normalisation semantics (WordCount.java:76)."""
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], ["doc_id", "text"])
    keys = [r.ngram for r in ngram_count(df, "text", n=2, sort=False).collect()]
    assert all(re.fullmatch(r"[a-z0-9]+ [a-z0-9]+", k) for k in keys)


@given(docs=st.lists(st.sampled_from(["aa bb", "cc dd", "ee ff"]), min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_exact_dedup_idempotent_under_duplication(spark, docs):
    """Exact dedup of docs ∪ docs == exact dedup of docs (same survivor
    hashes), and every hash group keeps its minimum id."""
    base = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], ["doc_id", "text"])
    doubled = base.unionByName(base.withColumn("doc_id", F.col("doc_id") + 100))
    def survivors(df):
        return {
            r.content_hash: r.keep_id
            for r in df.select(F.sha2("text", 256).alias("content_hash"), "doc_id")
            .groupBy("content_hash").agg(F.min("doc_id").alias("keep_id")).collect()
        }
    assert survivors(base) == survivors(doubled)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=1, max_size=30,
    ),
    n_salts=st.integers(2, 8),
)
@settings(**_SETTINGS)
def test_salted_aggregate_equals_plain_for_any_data(spark, rows, n_salts):
    df = spark.createDataFrame([(k, v) for k, v in rows], ["k", "v"])
    plain = {
        (r.k): (r.n, round(r.total, 6), r.lo, r.hi)
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
            F.min("v").alias("lo"), F.max("v").alias("hi")).collect()
    }
    salted = {
        (r.k): (r.n, round(r.total, 6), r.lo, r.hi)
        for r in salted_aggregate(
            df, ["k"], {"n": "count(*)", "total": "sum(v)", "lo": "min(v)", "hi": "max(v)"},
            n_salts=n_salts).collect()
    }
    assert plain == salted
