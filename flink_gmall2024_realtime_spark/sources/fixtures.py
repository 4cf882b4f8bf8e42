"""Fixture (file) sources: the driver's deterministic parquet tables.

Batch analogue of the reference's Kafka sources (``FlinkSourceUtil.java:24-56``)
for correctness checking: each parquet table is read with schema pushdown and
registered as a temp view so both the DataFrame API and ``spark.sql`` paths
work — the same way the reference registers Kafka topics as Flink SQL tables
(``SQLUtil.java:25-37``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = _normalize_events(df)
    return df


def _normalize_events(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to timestamp_ntz whatever the fixture's
    on-disk flavor.  The driver has shipped two formats across rounds:
    TIMESTAMP(NANOS), which Spark reads as bigint nanos under
    ``spark.sql.legacy.parquet.nanosAsLong`` and we rebuild here (ns -> µs
    instant -> reinterpret the UTC wall time as naive wall time: the
    to_utc_timestamp shifts by the fixed +08:00 session offset, the cast
    reads it back out — bit-identical to what DuckDB/pyarrow see in the
    file), and plain timestamp[us] with isAdjustedToUTC=false, which Spark
    already reads as timestamp_ntz and passes through untouched."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get("ts") == "bigint":
        # integer div — a double division would lose precision above 2^53 ns
        ntz = F.to_utc_timestamp(
            F.timestamp_micros(F.expr("ts div 1000")), "Asia/Shanghai"
        ).cast("timestamp_ntz")
        df = df.withColumn("ts", ntz)
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load all fixture tables as DataFrames (lazy — scans are deferred, so
    Catalyst still prunes columns/filters down to the parquet reader)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load and register every fixture table as a temp view for SQL use."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
