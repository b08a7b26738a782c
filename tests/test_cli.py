"""CLI surface: the reference's entry-point contract (ngram <in> <out> [n],
default-n fallback, tab-separated sorted output — WordCount.java:129-164)
plus the query/sql subcommands, driven in-process with an injected session."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from hadoop_mapreduce_spark.__main__ import main
from hadoop_mapreduce_spark.sources.tables import register_views
from tests.conftest import SF_DIR


def _read_out(path):
    lines = []
    for f in sorted(glob.glob(f"{path}/part-*")):
        with open(f) as fh:
            lines.extend(ln.rstrip("\n") for ln in fh if ln.strip())
    return lines


def test_cli_ngram_matches_reference_golden(spark, tmp_path):
    """The clam-cram golden case (report.md:77-90), end to end through the
    CLI: sorted, tab-separated trigram counts."""
    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "f.txt").write_text("How can a clam cram in a clean cream can?\n")
    out = str(tmp_path / "out")
    assert main(["ngram", str(inp), out, "3"], spark=spark) == 0
    assert _read_out(out) == [
        "a clam cram\t1", "a clean cream\t1", "can a clam\t1", "clam cram in\t1",
        "clean cream can\t1", "cram in a\t1", "how can a\t1", "in a clean\t1",
    ]


def test_cli_ngram_bad_n_defaults_to_3(spark, tmp_path, capsys):
    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "f.txt").write_text("a b c d\n")
    out = str(tmp_path / "out")
    assert main(["ngram", str(inp), out, "not_a_number"], spark=spark) == 0
    assert "defaulting to n=3" in capsys.readouterr().err
    assert _read_out(out) == ["a b c\t1", "b c d\t1"]


def test_cli_query_writes_parquet(spark, tmp_path):
    out = str(tmp_path / "q1")
    assert main(["query", "q1_pricing_summary", "--sf-dir", SF_DIR, "--out", out],
                spark=spark) == 0
    assert spark.read.parquet(out).count() > 0


def test_cli_unknown_query_errors(spark):
    assert main(["query", "no_such_query", "--sf-dir", SF_DIR], spark=spark) == 2


def test_sql_entry_matches_dataframe_result(spark):
    """spark.sql over registered views computes the same result as the
    DataFrame-API query."""
    register_views(spark, SF_DIR)
    got = spark.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """).collect()
    want = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag", "l_linestatus").collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_cli_sql_subcommand_writes_parquet(spark, tmp_path):
    out = str(tmp_path / "sqlout")
    assert main(["sql", "SELECT count(*) AS n FROM orders", "--sf-dir", SF_DIR,
                 "--out", out], spark=spark) == 0
    assert spark.read.parquet(out).collect()[0].n == 1500
