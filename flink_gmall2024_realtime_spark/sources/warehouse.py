"""Warehouse table layout: bucketed + partitioned writers for co-located joins.

At 100 TB the single biggest shuffle saving is bucketing both sides of a
recurring fact-fact join on the join key: Spark's bucketed scan exposes the
hash partitioning to Catalyst, so the sort-merge join runs with **no
Exchange** on either side (asserted in tests/test_bucketing.py). This is the
engine's answer to the reference's static `keyBy` pipelines — the
partitioning is persisted in the table layout instead of recomputed per job.

Serving tables additionally partition by ``cur_date`` (K4 Doris parity), so
date-range queries prune files before any IO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    buckets: int = 32,
    sort_col: str | None = None,
    partition_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted/partitioned) table in
    the session catalog. Joins/aggregations on ``bucket_col`` between tables
    bucketed with the same bucket count skip the shuffle entirely."""
    writer = df.write.mode(mode).bucketBy(buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
