"""Sources: parquet star-schema tables, plus text/csv/json readers.

The driver fixtures (TESTDATA.md) are one parquet file per table.  At
100 TB each of these would be a partitioned parquet/iceberg dataset; the
reader below is identical for both cases — ``spark.read.parquet`` handles
directory trees, partition pruning and predicate pushdown natively, so no
custom source machinery is warranted.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Column pruning / filter pushdown happen at
    the scan automatically because this returns the lazy DataFrame.

    The events fixture stores TIMESTAMP(NANOS) which Spark has no native
    type for: read nanos as long (legacy conf) and truncate to
    microseconds — the same conversion DuckDB applies, so both engines
    see identical instants. Session TZ is pinned to UTC so rendered
    timestamps are engine-independent.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        # Fixture stores TIMESTAMP(NANOS) → read as long; but synthetic
        # test tables may already carry a real timestamp column.
        if dict(raw.dtypes).get("ts") == "bigint":
            raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return raw
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All fixture tables as a dict of lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text source — the reference's only input format
    (reference WordCount.java:157, TextInputFormat). One row per line,
    column ``value: string``."""
    return spark.read.text(path)


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    opts = {"header": "true", "inferSchema": "true"}
    opts.update(options)
    return spark.read.options(**opts).csv(path)


def read_json(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).json(path)


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Tab-separated text sink — byte-compatible with the reference's
    TextOutputFormat ``key\\tvalue`` lines (reference WordCount.java:158;
    format evidence report.md:77-90)."""
    from pyspark.sql import functions as F

    cols = [F.col(c).cast("string") for c in df.columns]
    df.select(F.concat_ws("\t", *cols).alias("value")).write.mode(mode).text(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
