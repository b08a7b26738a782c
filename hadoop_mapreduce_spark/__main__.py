"""CLI — the engine's command-line surface.

The reference's only entry point is ``hadoop jar wc.jar WordCount
<input> <output> [n]`` (reference WordCount.java:129-164, report.md:29-33;
smoke scripts build.sh:8 / run.sh:4). ``ngram`` is its drop-in twin,
including the default-n-with-warning behaviour (WordCount.java:129-136)
and the tab-separated, globally-sorted output (WordCount.java:154-161).

Two more subcommands expose the extension surface:

  ngram  <input> <output> [n] [--cross-line] — the reference program
  query  <name> --sf-dir DIR [--out PATH]    — any registered query
  sql    "<statement>" --sf-dir DIR          — ANSI SQL over the tables
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m hadoop_mapreduce_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ng = sub.add_parser("ngram", help="n-gram count over text files (the reference program)")
    ng.add_argument("input")
    ng.add_argument("output")
    ng.add_argument("n", nargs="?", default="3")
    ng.add_argument("--cross-line", action="store_true",
                    help="reference-faithful mode: n-grams span line breaks within a file")

    q = sub.add_parser("query", help="run a registered query by name")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--out", default=None, help="parquet output dir (default: show)")

    s = sub.add_parser("sql", help="run ANSI SQL over the fixture tables")
    s.add_argument("statement")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    s.add_argument("--out", default=None)
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if spark is None:
        from hadoop_mapreduce_spark.session import get_spark

        spark = get_spark("hadoop-mapreduce-spark-cli")

    if args.cmd == "ngram":
        # reference behaviour: malformed/missing n → default 3 with a warning
        # (WordCount.java:129-136)
        try:
            n = int(args.n)
        except ValueError:
            print("Invalid n; defaulting to n=3", file=sys.stderr)
            n = 3
        from hadoop_mapreduce_spark.operators.ngram import ngram_count_text
        from hadoop_mapreduce_spark.sources.tables import write_tsv

        counts = ngram_count_text(spark, args.input, n=n, cross_line=args.cross_line)
        write_tsv(counts, args.output)
        return 0

    if args.cmd == "query":
        from hadoop_mapreduce_spark.registry import QUERIES

        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; known: {', '.join(sorted(QUERIES))}",
                  file=sys.stderr)
            return 2
        df = QUERIES[args.name](spark, args.sf_dir)
    else:  # sql
        from hadoop_mapreduce_spark.sources.tables import register_views

        register_views(spark, args.sf_dir)
        df = spark.sql(args.statement)

    if args.out:
        df.write.mode("overwrite").parquet(args.out)
    else:
        df.show(50, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
