"""Session-timezone parity harness.

The driver supplies its OWN SparkSession, which may carry a non-UTC
``spark.sql.session.timeZone``. Every Spark expression that converts a
TIMESTAMP instant to wall-clock fields (date_trunc, hour, to_date,
timestamp->string cast, date_format, window().start rendering, ...)
re-labels its output under a non-UTC session — preserving row count and
schema while flipping the value hash, which is exactly the
``events_hierarchical_rollup`` failure signature from CORRECTNESS_r07.

This tool runs each registry query twice in the same JVM — once with the
session timezone pinned to UTC, once pinned to ``Asia/Kolkata`` (+05:30:
a half-hour offset shifts HOUR buckets as well as day buckets, which a
whole-hour zone like America/New_York would mask) — and diffs the
canonical (sorted rows, sorted columns) output. Any mismatch is a query
whose semantics depend on the caller's session timezone and must be
rewritten over integer epoch arithmetic (the repo convention:
``events_dow_hour_profile``).

Usage: python tools/tz_parity.py [--json OUT.json] [sf_dir] [query ...]
Exit 1 on any mismatch.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import canon  # noqa: E402

ALT_TZ = "Asia/Kolkata"


def run_once(spark, fn, sf_dir, tz):
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        df = fn(spark, sf_dir)
        rows = df.collect()
        return canon(rows, df.columns), None
    except Exception as e:  # pragma: no cover - diagnostic path
        return None, f"{type(e).__name__}: {e}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from hadoop_mapreduce_spark import get_spark
    from hadoop_mapreduce_spark.registry import QUERIES
    from hadoop_mapreduce_spark.session import release_caches

    spark = get_spark("tz-parity")
    report: dict[str, dict] = {}
    bad = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        utc, err_u = run_once(spark, fn, sf_dir, "UTC")
        release_caches()
        alt, err_a = run_once(spark, fn, sf_dir, ALT_TZ)
        release_caches()
        if err_u or err_a:
            report[name] = {"tz_match": False, "err": err_u or err_a}
            bad.append(name)
            print(f"ERR   {name}: {err_u or err_a}", flush=True)
            continue
        ok = utc == alt
        report[name] = {"tz_match": ok, "rows": len(utc), "err": None}
        if not ok:
            bad.append(name)
            diff = next(
                (f"utc={u!r} alt={a!r}" for u, a in zip(utc, alt) if u != a),
                f"len {len(utc)} vs {len(alt)}",
            )
            print(f"TZDIFF {name}: {diff[:300]}", flush=True)
        else:
            print(f"ok    {name}", flush=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    print(f"\n{len(bad)} tz-sensitive queries: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
