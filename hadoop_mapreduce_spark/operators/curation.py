"""Training-data curation operators beyond dedup (SURVEY.md §2.EXT,
north-star "large-scale training-data pipeline" surface): document
chunking, PII/markup scrubbing, deterministic dataset splits, and
sequence packing.

Scale conventions:

  * chunking / scrubbing are pure per-row JVM expressions (no shuffle,
    no UDF) — they pipeline inside whole-stage codegen with the scan;
  * the dataset split is a deterministic md5-derived hash of the key
    (engine-portable, seed-stable) — at any scale it is one projection,
    and any executor can re-derive a row's split without coordination;
  * sequence packing shuffles once on the pack key; the first-fit loop
    runs per-partition via applyInPandas over bounded groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_mapreduce_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def doc_chunking(spark: SparkSession, sf_dir: str, chunk_tokens: int = 32,
                 overlap: int = 8) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the standard pre-training / RAG chunker, fully JVM-side.

    tokenize → sequence(1, n, stride) start positions → transform to
    slice(toks, start, chunk) → posexplode. No shuffle: chunk assembly
    is a per-row expression chain; the only exchange is the final
    deterministic orderBy (dropped in production — chunks stay with
    their parent document's partition).
    """
    from hadoop_mapreduce_spark.functions.text import normalize_text, tokenize

    stride = chunk_tokens - overlap
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokenize(normalize_text(F.col("text"))).alias("t")
    ).where(F.size("t") > 0)
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(size(t) - {overlap}, 1), {stride}),"
                f" s -> concat_ws(' ', slice(t, s, {chunk_tokens})))"
            )
        ).alias("chunk_idx", "chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk",
        F.size(F.split("chunk", " ")).cast("long").alias("chunk_len"),
    ).orderBy("doc_id", "chunk_idx")


def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / markup scrubbing pass: mask email-like and URL-like spans,
    collapse whitespace runs — a chain of regexp_replace expressions
    that fuses into one codegen stage with the scan (zero shuffle,
    zero UDF). Reports per-document replacement counts so the scrub is
    auditable."""
    docs = _t(spark, sf_dir, "documents")
    email = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
    url = r"https?://[^\s]+"
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), email, "<EMAIL>"), url, "<URL>"
    )
    clean = F.trim(F.regexp_replace(scrubbed, r"\s+", " "))
    n_email = F.size(F.regexp_extract_all("text", F.lit(email), 0)).cast("long")
    n_url = F.size(F.regexp_extract_all("text", F.lit(url), 0)).cast("long")
    return docs.select(
        "doc_id",
        F.length(clean).cast("long").alias("clean_len"),
        n_email.alias("n_emails_masked"),
        n_url.alias("n_urls_masked"),
        F.substring(clean, 1, 80).alias("clean_prefix"),
    ).orderBy("doc_id")


def dataset_split(spark: SparkSession, sf_dir: str,
                  val_pct: int = 10, test_pct: int = 10) -> DataFrame:
    """Deterministic train/val/test split: bucket = md5(doc_id) mod 100.

    Engine-portable and seed-stable — any process (Spark executor,
    downstream loader, the DuckDB oracle) re-derives a document's split
    from its key alone; adding data never reshuffles existing
    assignments. Returns per-split document and token counts.
    """
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    return (
        docs.select(split.alias("split"), toks.alias("n_tokens"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("split")
    )


_PACK_SCHEMA = (
    "source string, pack_id long, n_docs long, pack_tokens long"
)


def seq_packing(spark: SparkSession, sf_dir: str,
                max_tokens: int = 512, n_buckets: int = 8) -> DataFrame:
    """Greedy sequence packing: bin documents into <= max_tokens context
    windows, first-fit in deterministic doc_id order within each
    (source, hash-bucket) group.

    The pack key is source x pmod(xxhash64(doc_id), n_buckets), NOT
    source alone: one hot source would otherwise become a single
    unbounded pandas group (the first-fit scan is inherently sequential
    per group, so a group must fit a worker). Bucketing bounds every
    group to ~1/n_buckets of its source and adds parallelism; packing
    quality is unaffected because packs never span buckets. Pack ids are
    bucket-strided (local * n_buckets + bucket) so they stay unique per
    source without a renumbering shuffle. At 100 TB, raise n_buckets so
    source_size / n_buckets fits an Arrow group (~1e6 docs).

    Registered rows-only (first-fit is procedural, not SQL-expressible);
    tests/test_curation.py asserts the packing invariants instead:
    every pack <= max_tokens, every doc assigned exactly once, and
    deterministic output across runs.
    """
    import pandas as pd

    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        "source",
        "doc_id",
        F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.least(
            F.size(F.split(F.trim("text"), r"\s+")).cast("long"),
            F.lit(max_tokens),
        ).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bucket = int(pdf["bucket"].iloc[0])
        bins: list[tuple[int, int]] = []  # (remaining, n_docs)
        assign: list[int] = []
        for t in pdf["n_tokens"]:
            placed = None
            for i, (rem, nd) in enumerate(bins):
                if t <= rem:
                    placed = i
                    bins[i] = (rem - t, nd + 1)
                    break
            if placed is None:
                bins.append((max_tokens - int(t), 1))
                placed = len(bins) - 1
            assign.append(placed * n_buckets + bucket)
        pdf = pdf.assign(pack_id=assign)
        out = (
            pdf.groupby("pack_id", as_index=False)
            .agg(n_docs=("doc_id", "size"), pack_tokens=("n_tokens", "sum"))
        )
        out.insert(0, "source", pdf["source"].iloc[0])
        return out[["source", "pack_id", "n_docs", "pack_tokens"]]

    return (
        sized.groupBy("source", "bucket")
        .applyInPandas(pack, schema=_PACK_SCHEMA)
        .orderBy("source", "pack_id")
    )


def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite: one row per check with its
    violation count — the validation gate a training-data pipeline runs
    before accepting a batch.

    Each check is an independent aggregate/anti-join; Spark runs them as
    parallel stages and the union is row-count = number of checks, so
    the result is driver-safe at any scale. FK checks are left_anti
    joins on the natural keys (shuffle or broadcast per AQE's choice).
    """
    docs = _t(spark, sf_dir, "documents")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    events = _t(spark, sf_dir, "events")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )

    checks = [
        check("orders_custkey_fk",
              orders.join(customer, orders.o_custkey == customer.c_custkey,
                          "left_anti")),
        check("lineitem_orderkey_fk",
              lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey,
                            "left_anti")),
        check("lineitem_qty_positive", lineitem.where(F.col("l_quantity") <= 0)),
        check("lineitem_discount_range",
              lineitem.where((F.col("l_discount") < 0) | (F.col("l_discount") > 1))),
        check("documents_text_nonempty",
              docs.where(F.col("text").isNull() | (F.length(F.trim("text")) == 0))),
        check("events_ts_not_null", events.where(F.col("ts").isNull())),
        check("orders_totalprice_positive", orders.where(F.col("o_totalprice") <= 0)),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.withColumn(
        "passed", (F.col("n_violations") == 0).cast("long")
    ).orderBy("check_name")


def split_leakage_guard(spark: SparkSession, sf_dir: str,
                        threshold: float = 0.8) -> DataFrame:
    """Near-duplicate-aware train/val/test splitting with a leakage
    audit — the step naive pipelines get wrong: hashing doc_id sends
    near-identical documents to DIFFERENT splits, so the eval set
    contains soft copies of training rows and benchmark numbers
    inflate. The guard assigns splits by near-dup CLUSTER (connected
    components over verified Jaccard >= threshold edges, cluster key =
    component id), so an entire dup family lands in one split by
    construction.

    Output is one audit row: document/cluster counts plus the number of
    near-dup pairs that straddle two splits under (a) the naive
    per-document hash and (b) the cluster-keyed hash. The operator's
    contract is grouped_leak_pairs == 0 — asserted in tests; the
    non-zero naive count on the same corpus is the evidence the guard
    matters.

    Scale: edges and components reuse the dedup pipeline (banded LSH at
    scale, exact inverted-index here for oracle parity); the split
    decision is one md5 projection on the component id; the audit joins
    the pair list (candidates only, tiny) against the assignment twice.
    Shuffles: the CC rounds + one doc_id-keyed join — nothing new moves
    the corpus.

    Reference behavior: splitting by cluster is the published recipe in
    e.g. The Pile / RefinedWeb dedup methodology; the md5 bucket matches
    curation.dataset_split's portable convention (same hash both
    engines).
    """
    from hadoop_mapreduce_spark.operators.dedup import (
        connected_components_star,
        minhash_pairs_unsorted,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    # edges from the banded-LSH verified candidates, like
    # dedup_components_star: every candidate is verified with EXACT
    # shingle Jaccard before thresholding, so the edge set equals the
    # exact all-pairs set w.h.p. (P[miss | j=0.8] ~ 8e-8 per pair) and
    # the recursive-CTE oracle still hash-matches; generation is
    # O(colliding pairs), not the inverted index's O(postings^2).
    # ADVICE r5 flagged the probabilistic-equivalence risk (a banding
    # miss on a new fixture would flip component ids and fail the hash
    # spuriously). Decision: KEEP the LSH edge source for the
    # hash-checked entry — the equivalence is pinned by
    # tests/test_dedup.py::test_minhash_lsh_equals_exact_jaccard on the
    # same fixtures the driver compares on, so a fixture/banding change
    # that breaks it fails the suite first, with a readable diff,
    # before it can look like a spurious driver mismatch. (Switching
    # the registered query to exact all-pairs edges would make its cost
    # the O(postings²) shape this operator exists to avoid — the DuckDB
    # twin of which DNF'd at 8× and took 137 s at 4×.) The hot-bucket
    # cap (r6) cannot drop fixture edges either: the cap only engages
    # past 2048-member buckets, asserted adversarially in the same file.
    from hadoop_mapreduce_spark.session import scoped_persist
    pairs = scoped_persist(minhash_pairs_unsorted(spark, sf_dir, threshold=threshold).select(
        "id1", "id2"))
    pairs.count()  # materialize: referenced by CC rounds AND the audit
    # star CC, not label propagation: O(log n) rounds vs O(diameter) —
    # both produce min-reachable component ids (property-tested equal)
    comp = connected_components_star(docs, pairs, edges_canonical=True)  # (doc_id, comp)

    def bucket(col):
        return (
            F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
            .cast("long") % 10
        )

    # Persisted: the audit references the assignment THREE times (both
    # endpoints of every pair + the doc-level counts agg) and comp's
    # backing join would otherwise re-execute per reference — at scale
    # that is three passes over the corpus-sized assignment, for a
    # cache of one (doc_id, 2 splits, comp) row per doc.
    assigned = scoped_persist(comp.select(
        "doc_id",
        F.when(bucket(F.col("doc_id")) < 8, "train")
        .when(bucket(F.col("doc_id")) < 9, "val")
        .otherwise("test").alias("naive_split"),
        F.when(bucket(F.col("comp")) < 8, "train")
        .when(bucket(F.col("comp")) < 9, "val")
        .otherwise("test").alias("grouped_split"),
        "comp",
    ))
    a1 = assigned.select(F.col("doc_id").alias("id1"),
                         F.col("naive_split").alias("n1"),
                         F.col("grouped_split").alias("g1"))
    a2 = assigned.select(F.col("doc_id").alias("id2"),
                         F.col("naive_split").alias("n2"),
                         F.col("grouped_split").alias("g2"))
    audited = pairs.join(a1, "id1").join(a2, "id2")
    leaks = audited.agg(
        F.sum((F.col("n1") != F.col("n2")).cast("long"))
        .alias("naive_leak_pairs"),
        F.sum((F.col("g1") != F.col("g2")).cast("long"))
        .alias("grouped_leak_pairs"),
    )
    counts = assigned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("comp").alias("n_clusters"),
        F.sum((F.col("grouped_split") == "train").cast("long"))
        .alias("n_train_grouped"),
    )
    return counts.crossJoin(
        leaks.select(
            F.coalesce("naive_leak_pairs", F.lit(0)).alias("naive_leak_pairs"),
            F.coalesce("grouped_leak_pairs", F.lit(0))
            .alias("grouped_leak_pairs"),
        )
    )


def memorization_novelty(spark: SparkSession, sf_dir: str, n: int = 5,
                         val_pct: int = 10, test_pct: int = 10) -> DataFrame:
    """Memorization / leakage audit over the dataset_split assignment:
    for every VAL document, what fraction of its distinct token
    n-grams also appears somewhere in the TRAIN split? Low novelty
    means the eval set rehearses training text and its loss will read
    optimistically — the published eval-hygiene check (e.g. the GPT-3
    appendix-C overlap study), run as one relational plan.

    Split assignment reuses dataset_split's portable convention
    (bucket = md5(doc_id) mod 100) so the audit describes exactly the
    split the pipeline would ship. Documents shorter than n tokens
    have no grams and no row — they cannot memorize anything at this n.

    Scale shape: grams are distinct'd per doc BELOW the join (map-side
    partial agg on (doc, gram)); the train-side gram set collapses to
    DISTINCT grams (vocabulary-bounded, not corpus-bounded) and the
    val-side probe is a gram-keyed LEFT SEMI-shaped join counted per
    doc — one shuffle each side on the gram key, partial-agg'd; no
    broadcast assumption (train grams at 100 TB are NOT small, unlike
    decontaminate_ngram's benchmark set). Output is val-doc-sized.
    """
    from hadoop_mapreduce_spark.functions.text import (
        ngrams_from_tokens,
        normalize_text,
        tokenize,
    )

    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    toks = docs.select(
        "doc_id", split.alias("split"),
        tokenize(normalize_text(F.col("text"))).alias("__t"),
    )
    grams = toks.select(
        "doc_id", "split",
        F.explode(F.array_distinct(
            ngrams_from_tokens(F.col("__t"), n))).alias("g"),
    )
    train_grams = grams.where(F.col("split") == "train").select("g").distinct()
    val_grams = grams.where(F.col("split") == "val").select("doc_id", "g")
    seen = (
        val_grams.join(train_grams.withColumn("__hit", F.lit(1)), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_seen"),
        )
    )
    return (
        seen.select(
            "doc_id", F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_seen").cast("long").alias("n_seen"),
            # exact-int division → the double is bit-identical on both
            # engines; no rounding needed (unlike FP-sum-fed scores)
            (F.lit(1.0) - F.col("n_seen") / F.col("n_grams")).alias("novelty"),
        )
        .orderBy("doc_id")
    )


def padding_waste_audit(spark: SparkSession, sf_dir: str,
                        batch_size: int = 32) -> DataFrame:
    """Training-efficiency audit: padding waste of fixed-size batches
    under two batching orders — the portable md5 shuffle order
    (global_shuffle_order's convention) vs length-sorted order. Every
    batch pads to its longest member, so waste = sum over batches of
    (batch_max × batch_rows − batch_tokens); length-sorted batching is
    the standard fix and this audit quantifies the win on YOUR corpus
    (the gap funds the seq_packing operator upstream).

    Scale shape: one token-count projection at scan speed, then per
    strategy one global row_number ordering. The global window is the
    honest cost of defining "batch i" corpus-wide; at 100 TB you'd
    range-partition on the same key (Spark's sort does exactly this
    under the hood) — rows cross the wire once per strategy, and the
    final rollup moves one row per batch.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    base = docs.select(
        "doc_id", toks.alias("n"),
        F.md5(F.col("doc_id").cast("string")).alias("shuf"))

    def waste(order_cols, strategy):
        w = Window.orderBy(*order_cols)
        batched = base.withColumn(
            "b", F.floor((F.row_number().over(w) - 1) / batch_size)
            .cast("long"))
        per_batch = batched.groupBy("b").agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n").alias("tok"), F.max("n").alias("mx"))
        return per_batch.agg(
            F.lit(strategy).alias("strategy"),
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("tok").cast("long").alias("total_tokens"),
            F.sum(F.col("mx") * F.col("rows") - F.col("tok"))
            .cast("long").alias("padding_tokens"),
        )

    out = waste([F.asc("shuf"), F.asc("doc_id")], "shuffled").unionAll(
        waste([F.asc("n"), F.asc("doc_id")], "length_sorted"))
    return out.select(
        "strategy", "n_batches", "total_tokens", "padding_tokens",
        # exact-int division → bit-stable double on both engines
        (F.col("padding_tokens") /
         (F.col("padding_tokens") + F.col("total_tokens")))
        .alias("waste_frac"),
    ).orderBy("strategy")


def inbatch_collision_audit(spark: SparkSession, sf_dir: str,
                            batch_size: int = 32) -> DataFrame:
    """Contrastive-training hygiene: with batches formed in the
    portable md5 shuffle order, how many in-batch pairs share a source
    (false negatives for in-batch-negative losses)? Emits, per source,
    the number of same-source in-batch pairs (sum over batches of
    C(n,2)) and the total doc count — sources with heavy collision
    mass need stratified batch assignment.

    Scale shape: one global row_number (same honest cost as
    padding_waste_audit), one (batch, source) count with map-side
    partial agg, then a source rollup of batch-count rows.
    """
    docs = _t(spark, sf_dir, "documents")
    w = Window.orderBy(F.asc(F.md5(F.col("doc_id").cast("string"))),
                       F.asc("doc_id"))
    batched = docs.select(
        "doc_id", "source",
        F.floor((F.row_number().over(w) - 1) / batch_size)
        .cast("long").alias("b"))
    per = batched.groupBy("b", "source").agg(F.count(F.lit(1)).alias("c"))
    return (
        per.groupBy("source").agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.sum(F.col("c") * (F.col("c") - 1) / 2)
            .cast("long").alias("same_source_pairs"),
        )
        .orderBy("source")
    )


def context_window_stats(spark: SparkSession, sf_dir: str,
                         budgets: tuple[int, ...] = (128, 512, 2048)
                         ) -> DataFrame:
    """Capacity planning for context budgets: for each candidate
    window size, how many documents truncate and what fraction of the
    corpus's tokens survive? The table that decides between "train at
    2k" and "chunk first" — run before doc_chunking/seq_packing pick
    their parameters.

    Scale shape: ONE corpus scan computes per-doc token counts; the
    per-budget expansion explodes |budgets| rows per doc (a constant),
    and the rollup partial-aggs to |budgets| rows. All ratios are
    exact-int divisions (bit-stable doubles on both engines).
    """
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    per = docs.select(toks.alias("n")).select(
        "n", F.explode(F.array(*[F.lit(b) for b in budgets])).alias("budget"))
    return (
        per.groupBy("budget").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n") > F.col("budget")).cast("long"))
            .alias("n_truncated"),
            F.sum("n").alias("tokens_total"),
            F.sum(F.least("n", "budget")).alias("tokens_kept"),
        )
        .select(F.col("budget").cast("long").alias("budget"),
                "n_docs", "n_truncated",
                F.col("tokens_total").cast("long").alias("tokens_total"),
                F.col("tokens_kept").cast("long").alias("tokens_kept"),
                (F.col("tokens_kept") / F.col("tokens_total"))
                .alias("kept_frac"))
        .orderBy("budget")
    )
