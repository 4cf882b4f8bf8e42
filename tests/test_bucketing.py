"""Bucketed-table co-located joins: the persisted-partitioning scale story —
both sides bucketed on the join key -> sort-merge join with NO shuffle."""

from __future__ import annotations

import re

import pytest

from flink_gmall2024_realtime_spark.sources import warehouse
from flink_gmall2024_realtime_spark.sources.fixtures import load_table
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    warehouse.write_bucketed(o, "b_orders", "o_orderkey", buckets=8)
    warehouse.write_bucketed(li, "b_lineitem", "l_orderkey", buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    o = warehouse.read_table(spark, "b_orders")
    li = warehouse.read_table(spark, "b_lineitem")
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy("o_orderpriority").count()
    # disable broadcast so the join strategy decision is about partitioning
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = joined._jdf.queryExecution().explainString(mode)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    join_section = plan.split("Aggregate")[0]
    # no Exchange below the join: bucketing provides the co-partitioning
    assert "Exchange" not in join_section.split("Join")[0]


def test_bucketed_join_correctness(spark, bucketed_tables, sf_dir):
    o = warehouse.read_table(spark, "b_orders")
    li = warehouse.read_table(spark, "b_lineitem")
    got = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()[0]["n"]
    )
    lo = load_table(spark, sf_dir, "lineitem")
    oo = load_table(spark, sf_dir, "orders")
    want = lo.join(oo, lo["l_orderkey"] == oo["o_orderkey"]).count()
    assert got == want
