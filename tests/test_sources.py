"""Source/sink surface (SURVEY.md §2.EXT sources/sinks row): csv/json
round-trips preserve the relational results, the tsv sink is
byte-compatible with the reference's TextOutputFormat, and bucketed
tables join shuffle-free (the 100 TB co-located-join strategy)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from hadoop_mapreduce_spark.sources.tables import (
    load_table,
    read_csv,
    read_json,
    write_bucketed,
    write_csv,
    write_json,
    write_tsv,
)
from tests.conftest import SF_DIR


def test_csv_round_trip_preserves_aggregate(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    path = str(tmp_path / "orders_csv")
    write_csv(orders, path)
    back = read_csv(spark, path)
    want = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    got = back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_json_round_trip_preserves_rows(spark, tmp_path):
    cust = load_table(spark, SF_DIR, "customer")
    path = str(tmp_path / "cust_json")
    write_json(cust, path)
    back = read_json(spark, path)
    assert back.count() == cust.count()
    assert set(back.columns) == set(cust.columns)
    assert back.agg(F.round(F.sum("c_acctbal"), 2)).collect() == \
        cust.agg(F.round(F.sum("c_acctbal"), 2)).collect()


def test_tsv_sink_reference_byte_format(spark, tmp_path):
    """Output must be `key\\tvalue` lines — the reference's
    TextOutputFormat (WordCount.java:158; golden format report.md:77-90)."""
    df = spark.createDataFrame([("a clam cram", 1), ("can a clam", 2)], ["ngram", "count"])
    path = str(tmp_path / "tsv_out")
    write_tsv(df, path)
    lines = set()
    for f in glob.glob(f"{path}/part-*"):
        with open(f) as fh:
            lines.update(ln.rstrip("\n") for ln in fh if ln.strip())
    assert lines == {"a clam cram\t1", "can a clam\t2"}


@pytest.fixture(scope="module")
def bucketed_pair(tmp_path_factory):
    from hadoop_mapreduce_spark import get_spark

    spark = get_spark("tests")
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 4,
                   sort_by=["o_orderkey"], path=str(base / "orders_b"))
    write_bucketed(li, "lineitem_b", ["l_orderkey"], 4,
                   sort_by=["l_orderkey"], path=str(base / "lineitem_b"))
    return "orders_b", "lineitem_b"


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    """Both sides bucketed on the join key with equal bucket counts →
    the join plan contains no Exchange (shuffle) at all."""
    o, l = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(o).join(spark.table(l),
                                F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # one Exchange for the final groupBy is fine; the *join* itself
        # must not shuffle either side: no Exchange below SortMergeJoin
        join_part = plan[plan.index("SortMergeJoin"):]
        assert "Exchange" not in join_part
        # correctness: same result as the plain parquet join
        want = (
            load_table(spark, SF_DIR, "orders")
            .join(load_table(spark, SF_DIR, "lineitem"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")


def test_orc_round_trip_preserves_aggregate(spark, tmp_path):
    from hadoop_mapreduce_spark.sources.tables import read_orc, write_orc

    li = load_table(spark, SF_DIR, "lineitem")
    before = (
        li.groupBy("l_returnflag").agg(F.round(F.sum("l_extendedprice"), 2).alias("s"))
    ).collect()
    path = str(tmp_path / "li_orc")
    write_orc(li, path)
    after = (
        read_orc(spark, path)
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"))
    ).collect()
    assert sorted(before) == sorted(after)


def test_orc_scan_pushes_filters(spark, tmp_path):
    from hadoop_mapreduce_spark.plans.explain import static_plan_text
    from hadoop_mapreduce_spark.sources.tables import read_orc, write_orc

    li = load_table(spark, SF_DIR, "lineitem")
    path = str(tmp_path / "li_orc_push")
    write_orc(li, path)
    df = read_orc(spark, path).where(F.col("l_quantity") > 30.0).select("l_orderkey")
    text = static_plan_text(df)
    assert "PushedFilters" in text and "l_quantity" in text


def test_binary_file_source_reads_blobs(spark, tmp_path):
    from hadoop_mapreduce_spark.sources.tables import read_binary_files

    (tmp_path / "a.bin").write_bytes(b"\x00\x01\x02payload-a")
    (tmp_path / "b.bin").write_bytes(b"payload-b")
    (tmp_path / "skip.txt").write_text("not a blob")
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert bytes(rows["a.bin"].content) == b"\x00\x01\x02payload-a"
    assert rows["b.bin"].length == len(b"payload-b")


def test_xml_round_trip_preserves_rows(spark, tmp_path):
    from hadoop_mapreduce_spark.sources.tables import read_xml, write_xml

    nation = load_table(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = str(tmp_path / "nation_xml")
    write_xml(nation, path, row_tag="nation")
    back = read_xml(spark, path, row_tag="nation").select(
        F.col("n_nationkey").cast("int"),
        "n_name",
        F.col("n_regionkey").cast("int"),
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )


def test_read_csv_strict_permissive_quarantines_bad_rows(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text("k,v\n1,10\n2,notanint\n3,30\n")
    from hadoop_mapreduce_spark.sources.tables import read_csv_strict

    df = read_csv_strict(spark, str(p), "k int, v int")
    rows = {r.k: r for r in df.collect()}
    assert rows[1].v == 10 and rows[1]._corrupt_record is None
    assert rows[2].v is None and "notanint" in rows[2]._corrupt_record
    # DROPMALFORMED silently drops the bad row
    dropped = read_csv_strict(spark, str(p), "k int, v int",
                              mode="DROPMALFORMED")
    assert sorted(r.k for r in dropped.collect()) == [1, 3]


def test_run_with_metrics_observes_during_single_pass(spark):
    from pyspark.sql import functions as F

    from hadoop_mapreduce_spark.sources.tables import (
        load_table,
        run_with_metrics,
    )
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    got = run_with_metrics(
        docs, "corpus_audit",
        {
            "n_rows": F.count(F.lit(1)),
            "null_texts": F.sum(F.col("text").isNull().cast("long")),
            "max_chars": F.max("n_chars"),
        },
    )
    assert got["n_rows"] == docs.count()
    assert got["null_texts"] == 0
    assert got["max_chars"] > 0


def test_python_datasource_distributed_and_pushdown(spark):
    """The custom Python data source plans multiple partitions
    (generation is distributed, not driver-side) and narrows its
    generation range under doc_id predicates (pushFilters)."""
    from pyspark.sql import functions as F

    from hadoop_mapreduce_spark.sources.pyds import (
        SyntheticDocsReader,
        register,
    )

    register(spark)
    df = spark.read.format("synthetic_docs") \
        .option("n_docs", 100).option("n_partitions", 4).load()
    assert df.count() == 100
    assert df.rdd.getNumPartitions() == 4
    # determinism: same recipe, same rows
    a = df.orderBy("doc_id").limit(5).collect()
    b = spark.read.format("synthetic_docs").option("n_docs", 100).load() \
        .orderBy("doc_id").limit(5).collect()
    assert a == b
    # pushdown narrows the generated range (unit-level: reader state)
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    r = SyntheticDocsReader({"n_docs": "100", "n_partitions": "4"})
    leftover = list(r.pushFilters([
        GreaterThanOrEqual(("doc_id",), 10), LessThan(("doc_id",), 30)]))
    assert leftover == []
    assert (r.lo, r.hi) == (10, 30)
    parts = r.partitions()
    assert sum(p.end - p.start for p in parts) == 20
    # filtered count through the engine agrees
    assert df.where("doc_id >= 10 and doc_id < 30").count() == 20
