"""Text scalar functions — column-in/column-out, all JVM-side built-ins.

These reproduce the reference's normalisation/tokenisation semantics
exactly (reference WordCount.java:76-79):

  * normalisation DELETES every char not in [a-zA-Z0-9\\s] (it does not
    replace with space: "don't" -> "dont", "end.Start" -> "endstart"),
    then lower-cases;
  * tokenisation is StringTokenizer-style whitespace splitting — runs of
    whitespace are one delimiter, leading/trailing whitespace produces no
    empty tokens.

Everything here stays inside whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the reference's normalisation regex, verbatim (WordCount.java:76)
_NORMALIZE_RE = r"[^a-zA-Z0-9\s]+"


def normalize_text(col: Column | str) -> Column:
    """lower(delete non-alphanumeric-non-space) — delete semantics, not
    replace-with-space (reference WordCount.java:76).

    INVARIANT (downstream dependency — ADVICE r8): tokens produced by
    ``tokenize(normalize_text(...))`` contain ONLY [a-z0-9] — no spaces,
    no control chars, never empty, never NULL. textstats.keyphrase_rake's
    shuffle-free phrase assembly encodes phrase boundaries with a \\x01
    sentinel and re-joins tokens with single spaces, and
    token_context_diversity's distinct-then-sum assumes non-null
    neighbours — both are sound ONLY under this charset. If this
    normalizer ever switches to replace-with-space or widens the kept
    charset, update those operators first
    (tests/test_textstats.py::test_tokenizer_invariants_for_rake pins
    this contract)."""
    return F.lower(F.regexp_replace(col, _NORMALIZE_RE, ""))


def tokenize(col: Column | str) -> Column:
    """Whitespace-split into an array of non-empty tokens.

    ``split`` on ``\\s+`` leaves a leading empty string when the input
    starts with whitespace (and one trailing when it ends with any other
    delimiter run collapsed), so filter empties to match StringTokenizer.
    (See normalize_text's INVARIANT note for the downstream operators
    that depend on the combined tokenizer contract.)
    """
    toks = F.split(col if isinstance(col, Column) else F.col(col), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


def ngrams_from_tokens(tokens: Column, n: int) -> Column:
    """Array of space-joined n-grams from a token array.

    Sliding window of ``n`` consecutive tokens, one n-gram per position,
    canonical form "w1 w2 ... wn" with single-space separators — matching
    the reference's peekList() + append form (WordCount.java:106-112).
    ``sequence(1, size-n+1)`` is empty when size < n (sequence would
    count *down* otherwise, so guard with a CASE).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n == 1:
        # unigram fast path — mirrors reference WordCount.java:81-84
        return tokens
    starts = F.when(
        F.size(tokens) >= F.lit(n),
        F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))


def shingles(col: Column | str, k: int = 3) -> Column:
    """Token k-shingles of normalised text — the unit set for Jaccard /
    MinHash near-duplicate detection.

    PERF WARNING: this composes tokenize() INSIDE the n-gram lambda, so
    Catalyst re-tokenises the document at every window position —
    O(len²) per doc (measured 10-12× slower at sf0.1). Convenient for
    one-off expressions on short strings only; every scan-path operator
    must materialise the token array in its own projection below the
    explode instead (operators/ngram.py::explode_ngrams,
    operators/dedup.py::shingle_rows are the patterns)."""
    return ngrams_from_tokens(tokenize(normalize_text(col)), k)
