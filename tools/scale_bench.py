"""Head-to-head Spark vs DuckDB at Kx the sf0.1 fixtures.

BASELINE.md's 2x target is measured at sf0.1, where Spark's ~0.5-0.7 s
per-query local-mode scheduling floor dominates a ~24 s total against a
~4 s in-memory DuckDB run. That floor is a fixed cost — the right
question for a 100 TB engine is how the ratio moves as data grows. This
harness synthesises a Kx dataset (scale_smoke's shifted-id union, same
distributions) and runs the SAME headline protocol as bench.py on BOTH
engines at that scale: warm pass per engine, per-query seconds, one
JSON line. As K rises the floor amortises and the ratio converges on
plan quality, which is the thing that transfers to a cluster.

Usage:  PYTHONPATH=/root/repo python tools/scale_bench.py [K] [scratch_dir]
                [--phase spark|duck|both] [--keep]

--phase/--keep let one long run be split across invocations (build once
with --keep, then time each engine separately against the kept scratch;
a scratch dir that already holds all tables is reused, not rebuilt).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from scale_smoke import build_scaled  # noqa: E402 (same tools/ dir)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE as _HEADLINE  # noqa: E402

# Ladder-only additions: the round-6 selection/decontamination family.
# They stay OUT of bench.py's driver headline (at sf0.1 their cost is
# pure scheduling floor against a sub-second DuckDB), but the ladder is
# exactly where their linear-shuffle designs separate from DuckDB's
# exact cross-joins / per-position windows as K grows.
HEADLINE = _HEADLINE + [
    "decontaminate_fuzzy",
    "decontaminate_semantic",
    "dedup_repeated_spans",
    "dedup_keep_best",
    "dsir_importance_sample",
    # round-6 second wave: token-heavy (bigram LM, entropy, BM25, JSD)
    # and embedding-heavy (hard negatives, dHash banding) shapes whose
    # single-shuffle / broadcast designs should track DuckDB linearly.
    "bigram_lm_quality",
    "token_entropy_quality",
    "bm25_search",
    "jsd_lang_divergence",
    "hard_negative_mining",
    "image_dhash_neardup",
    # round-6 third wave: incremental ingest dedup (the one whose cost
    # must track the INCREMENT, not the corpus — the ladder is the only
    # place that claim is measurable), weighted sampling (TakeOrdered
    # top-k — should be flat), TWAP + winsorize + equi-depth histogram
    # (single-exchange aggregation shapes).
    "dedup_incremental",
    "sample_weighted",
    "events_twap_daily",
    "events_winsorize_stats",
    "histogram_equidepth",
    # round-6 fourth/fifth/sixth waves: BPE pair counting (vocab-bounded
    # expansion — the claim is pair rows grow with VOCAB, not corpus),
    # inverted-index build (bounded per-term windows), memorization
    # novelty (two gram-keyed shuffles), the two mixture/calibration
    # rollups, and the batching audits (one global-order window each).
    "bpe_merge_step",
    "inverted_index_topk",
    "memorization_novelty",
    "mixture_temperature_weights",
    "quantile_normalize_quality",
    "padding_waste_audit",
    "inbatch_collision_audit",
    "ann_dim_truncation_audit",
    # exact Jaccard via prefix filtering: the ladder is where it must
    # separate from DuckDB's inverted-index O(postings^2) twin.
    "dedup_jaccard_prefix",
    # round-7 additions: KN LM + dup-n-gram coverage (token-heavy,
    # single-exchange chains), cluster-size rollup (CC consumer),
    # portable count-min sketch, per-dimension embedding audit, and the
    # video-modality box-walk (Arrow-batched mapInPandas pair).
    "kneser_ney_quality",
    "gopher_dup_ngrams",
    "dedup_cluster_size_histogram",
    "heavy_hitters_cms",
    "embedding_dim_stats",
    "video_meta",
    # round-7b additions: portable HLL (register tables are
    # 4096-rows-per-source regardless of K — the flat-cost claim),
    # winnowing (explode + per-doc frame window — linear), CCNet
    # terciles + vocab coverage (token-exchange + bounded windows),
    # and the centroid-drift audit (labels x dims rows after the first
    # exchange, flat in K).
    "hll_portable_union",
    "winnowing_fingerprint",
    "ccnet_perplexity_buckets",
    "vocab_coverage_curve",
    "embedding_centroid_drift",
    "char_trigram_langid",
    "minhash_accuracy_audit",
    "quantile_histogram_portable",
    "events_ewma_daily",
    "salted_aggregate_events",
    "winnowing_neardup_pairs",
    # round-7c additions: skip-gram pair expansion (pair rows = tokens
    # x window — the linear-expansion claim), stopword discovery
    # (two-level keyed rollup), RRF fusion + threshold sweep +
    # curriculum (source-keyed windows, never global), concentration
    # audit (metadata-sized after one scan — should be FLAT in K),
    # budget fill (one cumsum window), and the LTTB recursion (bounded
    # series after pre-aggregation; here raw — cost tracks series
    # length linearly inside Arrow groups).
    "skipgram_cooccurrence",
    "stopword_discovery",
    "rrf_quality_fusion",
    "quality_threshold_sweep",
    "source_concentration_audit",
    "token_budget_fill",
    "curriculum_interleave",
    "events_lttb_downsample",
    "source_novelty_attribution",
    # round-7d additions: distinct-n diversity (one tokenize scan +
    # gram-keyed exchange — linear), dataset card + badwords (scan-
    # speed projections, |sources| rollups — near-flat), chi-square
    # (one groupBy, metadata after — FLAT), dow/hour profile (one
    # groupBy to <=168 rows — FLAT), packing audit (Arrow groups,
    # linear in docs), label-conflict (CC consumer — tracks the
    # cluster count), band tuning (shared CW pair base + 20-row agg).
    "ngram_diversity_audit",
    "dataset_card",
    "badwords_filter",
    "lang_source_chisq",
    "events_dow_hour_profile",
    "packing_boundary_audit",
    "neardup_label_conflict",
    "lsh_band_tuning",
    # round-7e additions: preference pairs (two source windows —
    # linear), skew audit (metadata after one groupBy — FLAT), shard
    # plan (|sources|-row sequential step — FLAT), bootstrap CI
    # (32x explode with algebraic partials — linear, constant factor).
    "preference_pair_build",
    "join_skew_audit",
    "shard_layout_plan",
    "bootstrap_ci_quality",
    # round-7f additions: KS grid (metadata after one agg — FLAT),
    # session sweep (one lag window — linear), dedup sweep (pair-base
    # bound), itemsets (distinct exchange + bounded basket join).
    "ks_drift_quality",
    "session_gap_sweep",
    "dedup_threshold_sweep",
    "event_pair_itemsets",
    # round-7g additions: DAU/WAU/MAU (user-day relation + bounded
    # explode — tracks active users, not events), RFM (one orders
    # groupBy + per-customer windows).
    "active_user_ratios",
    "customer_rfm_segments",
    # round-7h additions: lateness (two windows per type — linear),
    # cardinality audit (histogram aggs — linear, small constants),
    # fightin words (one term exchange + vocab-bounded grid).
    "watermark_lateness_audit",
    "join_cardinality_audit",
    "fightin_words",
    # round-7i additions: CUSUM (bounded fold after one exchange),
    # KWIC (match-relation-sized), IVM (O(|changes|) deltas — the
    # flat-refresh claim is the ladder story).
    "events_cusum_changepoint",
    "kwic_concordance",
    "ivm_orders_agg",
    # round-7j additions: LTV (two keyed aggs + triangle window),
    # attribution (one union window), compression (scan-speed UDF —
    # the Arrow-batch throughput claim).
    "orders_cohort_ltv",
    "conversion_attribution",
    "compression_ratio_quality",
    # round-7k additions: streaks (distinct user-day relation + keyed
    # windows — tracks active user-days), sweep-line concurrency
    # (session agg + BOUNDED hour-bucket offsets — the two-level-scan
    # claim), ACF (bounded (type,day) table — FLAT), Holt (bounded
    # fold after one exchange — FLAT).
    "user_active_streaks",
    "session_concurrency",
    "events_acf",
    "events_holt_linear",
    # round-7l additions: PII + readability (scan-speed regex/token
    # projections + |sources| rollups — near-flat per-row cost, the
    # codegen-regex throughput claim), Benford (one groupBy to <=9
    # rows — FLAT), Pareto (part-keyed agg + dimension-sized window).
    "pii_redact_audit",
    "readability_scores",
    "benford_audit",
    "orders_abc_pareto",
    # round-7m additions: LPA (per-round cost tracks the DUP GRAPH, not
    # the corpus — same family as star-CC), SAX (bounded (type,day)
    # table, alphabet-bounded output — FLAT).
    "label_propagation_communities",
    "sax_motifs",
    # round-7n additions: chain audit (pair base + cluster rollups —
    # tracks the dup graph; its oracle carries the same exact-pair edge
    # build that DNFs at 4x, so expect a duck DNF row), Heaps curve
    # (two keyed exchanges, 16 rows out — linear scan cost, flat tail).
    "dedup_chain_audit",
    "vocab_growth_heaps",
    # round-7o: one explode + d-row broadcast + fold — linear, tiny
    # constants.
    "embedding_outlier_scores",
    # round-7p: one custkey exchange each — linear with tiny constants.
    "orders_interarrival_profile",
    "order_status_flow",
    # round-7q: one session exchange + 4 bounded scans — linear.
    "events_pattern_match",
    # round-7r: one tokenize scan + 1-row agg — near-flat.
    "quality_filter_agreement",
]


def _shuffle_metrics(sc, after_stage: int) -> tuple[int, dict]:
    """Sum shuffle write/read + spill bytes over stages with id >
    ``after_stage`` (AppStatusStore walk — the same numbers the UI
    shows). Returns (new_watermark, metrics). Best-effort: {} on any
    reflection hiccup so the bench never dies for a metric."""
    try:
        jvm = sc._jvm
        store = sc._jsc.sc().statusStore()
        empty = jvm.java.util.Collections.emptyList()
        darr = sc._gateway.new_array(jvm.double, 0)
        stages = store.stageList(empty, False, False, darr, empty)
        w = r = sp_mem = sp_disk = 0
        hi = after_stage
        for i in range(stages.size()):
            s = stages.apply(i)
            sid = s.stageId()
            hi = max(hi, sid)
            if sid <= after_stage:
                continue
            w += s.shuffleWriteBytes()
            r += s.shuffleReadBytes()
            sp_mem += s.memoryBytesSpilled()
            sp_disk += s.diskBytesSpilled()
        return hi, {"shuffle_write_mb": round(w / 1e6, 2),
                    "shuffle_read_mb": round(r / 1e6, 2),
                    "spill_mem_mb": round(sp_mem / 1e6, 2),
                    "spill_disk_mb": round(sp_disk / 1e6, 2)}
    except Exception:  # noqa: BLE001 — metrics are best-effort
        return after_stage, {}


def _duck_one(sql: str, scratch: str, q) -> None:
    """Child-process DuckDB runner (module level so it pickles under
    both fork and spawn start methods — ADVICE r5)."""
    import time as _t

    import duckdb as _d

    c = _d.connect()
    # spill to /tmp, not cwd: a capped/killed child otherwise leaves its
    # (observed: 41 GB) .tmp/ spill debris inside the repo
    c.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in ("region", "nation", "customer", "supplier",
              "part", "orders", "lineitem", "events",
              "documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{scratch}/{t}.parquet/*.parquet')")
    c.execute(sql).fetchall()  # warm
    t0 = _t.time()
    c.execute(sql).fetchall()
    q.put(round(_t.time() - t0, 3))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("k", type=int, nargs="?", default=4)
    ap.add_argument("scratch", nargs="?", default=None)
    ap.add_argument("--phase", choices=["spark", "duck", "both"], default="both")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--docs-dup-pct", type=int, default=None,
                    help="realistic-dup documents build: only this pct of "
                    "each extra copy keeps its text verbatim; the rest are "
                    "marker-rewritten into genuinely distinct docs (see "
                    "scale_smoke.build_scaled). Default: legacy verbatim "
                    "copies (dup-saturated, pair output = K^2).")
    ap.add_argument("--only", default=None,
                    help="comma-separated query subset to run instead of "
                    "the full ladder HEADLINE")
    ns = ap.parse_args()
    phase, keep, k = ns.phase, ns.keep, ns.k
    global HEADLINE
    if ns.only:
        HEADLINE = [q.strip() for q in ns.only.split(",") if q.strip()]
    scratch = ns.scratch or tempfile.mkdtemp(prefix="scale_bench_")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hadoop_mapreduce_spark import get_spark
    from hadoop_mapreduce_spark.registry import ORACLE, QUERIES
    from hadoop_mapreduce_spark.sources.tables import TABLE_NAMES

    have_all = all(
        os.path.isdir(os.path.join(scratch, f"{t}.parquet")) for t in TABLE_NAMES)
    try:
        sp: dict[str, float] = {}
        if phase in ("spark", "both") or not have_all:
            spark = get_spark("scale-bench", shuffle_partitions=32)
            spark.sparkContext.setLogLevel("ERROR")
            if not have_all:
                build_scaled(spark, src, scratch, k,
                             docs_dup_pct=ns.docs_dup_pct)
        heap = {}
        shuffle: dict[str, dict] = {}
        calib: dict[str, float] = {}
        if phase in ("spark", "both"):
            # Environment fingerprint (r8): this container's throughput
            # drifts by large factors between sessions (measured: a fixed
            # single-core canary swung 98-168 ms, and an identical 16x
            # subset swung 2-8x wall within one day), which makes raw
            # cross-artifact comparisons meaningless. Record two fixed-
            # work calibration numbers WITH every artifact so a reader
            # can normalise: one single-core Python loop, one 32-task
            # Spark aggregation of a deterministic in-memory range.
            import hashlib
            _t0 = time.time()
            _h = b"x" * 1000
            for _ in range(200000):
                _h = hashlib.md5(_h).digest()
            calib["py_md5_chain_s"] = round(time.time() - _t0, 3)
            try:
                # pmod keeps the running sum ~2e8 * 4096 << int64 — a raw
                # sum(xxhash64) overflows under ANSI arithmetic
                _rng = spark.range(0, 200_000_000, 1, 32).selectExpr(
                    "sum(pmod(xxhash64(id), 4096)) as s")
                _rng.collect()  # warm codegen
                _t0 = time.time()
                _rng.collect()
                calib["spark_range_hash_s"] = round(time.time() - _t0, 3)
            except Exception:  # noqa: BLE001 — calibration is best-effort
                pass

            # (merged with the calibration block above — ADVICE r8: two
            # consecutive identical phase guards read as accidental)
            from hadoop_mapreduce_spark.session import release_caches

            # Deterministic JVM cleanup between ladder measurements (r8,
            # VERDICT r7 item 2 root cause): localCheckpoint blocks and
            # dead broadcast state are only reclaimed after a JVM GC
            # triggers the ContextCleaner, and the default periodic GC
            # fires every 30 min — i.e. at most ONCE somewhere inside a
            # serialized 58-query ladder, landing a multi-second full-GC
            # pause inside whichever query is running (observed: the
            # r7 32x artifact's events_session 12.98 s / asof 13.92 s
            # rows, both ~1-2 s in this round's controlled re-runs at
            # identical heap debris). An explicit System.gc() after each
            # query's release_caches() makes the pause land BETWEEN
            # measured runs, uniformly, so per-query rows measure the
            # plan. (Measurement-harness hygiene only — no query path
            # or bench.py change.)
            def _jvm_gc():
                try:
                    spark._jvm.System.gc()
                except Exception:  # noqa: BLE001 — hygiene is best-effort
                    pass

            # Spark: warm once (codegen/JIT + first touch), then measure.
            for name in HEADLINE:
                QUERIES[name](spark, scratch).write.format("noop").mode("overwrite").save()
                release_caches()
            _jvm_gc()
            watermark, _ = _shuffle_metrics(spark.sparkContext, -1)
            for name in HEADLINE:
                t0 = time.time()
                QUERIES[name](spark, scratch).write.format("noop").mode("overwrite").save()
                sp[name] = round(time.time() - t0, 3)
                release_caches()
                _jvm_gc()
                # per-query shuffle/spill volume (VERDICT r5 item 9): the
                # evidence that no operator's shuffle grows super-linearly
                # with K — read alongside the heap envelope below
                watermark, m = _shuffle_metrics(spark.sparkContext, watermark)
                shuffle[name] = m
                print(f"  spark {name:24s} {sp[name]:7.2f}s  {m}",
                      file=sys.stderr)
            # Measured heap envelope of the single local JVM (driver + all
            # executor threads + broadcasts): peak used across the heap
            # memory pools vs -Xmx — the "does this scale still fit the
            # configured heap" number BASELINE.md's memory table records.
            # NOTE: heap_peak_gb SUMS per-pool peaks (eden + survivor +
            # old), and pools peak at different instants — it is an UPPER
            # BOUND on any simultaneous heap use and can legitimately
            # exceed heap_max_gb; zero spill + completion is the ground
            # truth that the scale fit.
            try:
                mgmt = spark._jvm.java.lang.management.ManagementFactory
                peak = used = maxm = 0
                for pool in mgmt.getMemoryPoolMXBeans():
                    if pool.getType().toString() == "Heap memory":
                        peak += pool.getPeakUsage().getUsed()
                        used += pool.getUsage().getUsed()
                mem = mgmt.getMemoryMXBean().getHeapMemoryUsage()
                maxm = mem.getMax()
                heap = {
                    "heap_peak_gb": round(peak / (1 << 30), 2),
                    "heap_used_end_gb": round(used / (1 << 30), 2),
                    "heap_max_gb": round(maxm / (1 << 30), 2),
                }
            except Exception:  # noqa: BLE001 — envelope is best-effort
                pass

        # DuckDB: same warm-measure protocol on the same scaled parquet.
        # Each query runs in a CHILD PROCESS with a hard cap: at 8x the
        # split-leakage guard's recursive CTE spilled ~80 GB of temp and
        # died with the whole phase's results lost — a DNF is recorded
        # as null instead of silently killing the run (and the DNF
        # itself is the scale evidence).
        du: dict[str, float] = {}
        du_timeout: list[str] = []
        du_crash: list[str] = []
        if phase in ("duck", "both"):
            import multiprocessing as mp
            import queue as _queue

            cap = int(os.environ.get("SCALE_BENCH_DUCK_CAP_S", "900"))
            # same task-level twin as bench.py: DuckDB's baseline for the
            # LSH embedding-dedup headline is its exact all-pairs query
            duck_twin = {"dedup_embedding_lsh": "dedup_embedding_cosine"}
            for name in HEADLINE:
                sql = ORACLE.get(duck_twin.get(name, name))
                if sql is None:
                    continue
                q = mp.Queue()
                proc = mp.Process(target=_duck_one, args=(sql, scratch, q))
                proc.start()
                proc.join(cap)
                if proc.is_alive():
                    proc.terminate()
                    proc.join()
                    du[name] = None
                    du_timeout.append(name)
                    # a cap-killed child leaves its spill behind
                    # (observed: 77 GB after one DNF filled the disk
                    # and killed the NEXT phase's Spark tasks) —
                    # reclaim it before the following query runs
                    shutil.rmtree("/tmp/duckdb_spill",
                                  ignore_errors=True)
                    print(f"  duck  {name:24s} DNF >{cap}s", file=sys.stderr)
                    continue
                # child exited: a non-zero exitcode is a CRASH (OOM-kill,
                # abort); exitcode 0 should have enqueued a result — use a
                # timed get, not the racy q.empty() (ADVICE r5)
                try:
                    du[name] = q.get(timeout=5)
                    print(f"  duck  {name:24s} {du[name]}s", file=sys.stderr)
                except _queue.Empty:
                    du[name] = None
                    du_crash.append(name)
                    shutil.rmtree("/tmp/duckdb_spill",
                                  ignore_errors=True)
                    print(f"  duck  {name:24s} CRASH "
                          f"(exit {proc.exitcode})", file=sys.stderr)

        # compare only queries BOTH engines ran (rows-only ops have no SQL)
        done = {q: v for q, v in du.items() if v is not None}
        sp_cmp = {q: s for q, s in sp.items() if q in done}
        sp_total = round(sum(sp_cmp.values()), 3)
        du_total = round(sum(done.values()), 3)
        print(json.dumps({
            "k": k,
            "src": src,
            "phase": phase,
            "spark": sp,
            "duckdb": du,
            "spark_total_comparable": sp_total,
            "duckdb_total": du_total,
            "spark_vs_duckdb": round(sp_total / du_total, 2)
            if (du_total and sp_cmp) else None,
            "duckdb_dnf": du_timeout,
            "duckdb_crash": du_crash,
            "spark_shuffle": shuffle,
            "env_calibration": calib,
            **heap,
        }))
    finally:
        if not keep:
            shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
