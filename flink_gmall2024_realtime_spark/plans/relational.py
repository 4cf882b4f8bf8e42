"""Relational core over the TPC-H-ish tables (joins, aggs, ranks, set ops).

Split from the original single-file ``plans/catalog.py`` (r9, VERDICT r7
#6) with ZERO entry changes: importing this module registers its section's
queries into the shared ``catalog.CATALOG`` registry; the full oracle run
proves behavior identity. Shared determinism rules live in ``catalog``'s
module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..functions import (  # noqa: F401
    date_to_ts,
    json_get,
    json_map,
    md5_long,
    md5_long_sql_duckdb,
    ts_to_date,
    ts_to_datetime,
    ts_to_partition,
)
from ..operators import (  # noqa: F401
    dedup,
    graph,
    multimodal,
    similarity,
    sketch,
    skew,
    state,
    text,
)
from ..operators.etl import cdc_project, etl_db_stream  # noqa: F401
from ..operators.joins import (  # noqa: F401
    config_router_join,
    interval_join,
    lateral_tokens,
    lookup_join,
)
from ..operators.windows import daily_distinct_count, tumble  # noqa: F401
from ..sources.fixtures import load_table  # noqa: F401
from .catalog import CATALOG, QuerySpec, _t, register  # noqa: F401


# =========================================================================
# Relational core over the TPC-H-ish tables (joins, aggs, ranks, set ops)
# =========================================================================


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    survey_ids=("A2",),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped grouped aggregate: the keyed incremental reduce (A2,
    DwsTrafficVcChArIsNewPageViewWindow.java:81-92) in batch form — partial
    aggregation, codegen'd expressions, shipdate predicate pushed to parquet."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_segment_revenue",
    oracle="""
SELECT c.c_mktsegment,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(DISTINCT o.o_orderkey) AS order_ct
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1
""",
    survey_ids=("J1",),
    bench=True,
)
def q3_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way inner equi-join + aggregate (J1, DwdTradeOrderDetail.java:
    99-100 shape). Lineitem pre-aggregates revenue per order on the SAME key
    the join needs, so (a) everything downstream of the first shuffle sees
    |orders| rows, not |lineitems|, and (b) the distinct-order count becomes
    a plain count — no Expand duplication of the fact rows for the mixed
    distinct/non-distinct aggregate (count_distinct planned a 2x row blowup;
    orders are unique per key, so count(*) of the pre-agged join is the same
    number). ~2x faster at sf0.1. Customer carries no hint — at gmall dim
    sizes AQE broadcasts it via autoBroadcastJoinThreshold, at TPC-H scale
    it is a fact table and must be free to shuffle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("orev")
    )
    return (
        rev.join(o, rev["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("orev"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("order_ct"),
        )
    )


@register(
    "q_left_join_orders",
    oracle="""
SELECT o.o_orderkey,
       coalesce(agg.li_ct, 0) AS li_ct,
       round(coalesce(agg.qty_sum, 0), 2) AS qty_sum
FROM orders o
LEFT JOIN (
  SELECT l_orderkey, count(*) AS li_ct, sum(l_quantity) AS qty_sum
  FROM lineitem GROUP BY 1
) agg ON o.o_orderkey = agg.l_orderkey
""",
    survey_ids=("J2",),
    bench=True,
)
def q_left_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-padding (J2, DwdTradeOrderDetail.java:
    101-102): orders without lineitems surface with zeroed measures —
    aggregate-then-join keeps the left join 1:1 (no row explosion)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("li_ct"), F.sum("l_quantity").alias("qty_sum")
    )
    return (
        o.join(agg, o["o_orderkey"] == agg["l_orderkey"], "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("li_ct"), F.lit(0)).alias("li_ct"),
            F.round(F.coalesce(F.col("qty_sum"), F.lit(0.0)), 2).alias("qty_sum"),
        )
    )


@register(
    "q_topk_brands",
    oracle="""
WITH r AS (
  SELECT p.p_brand, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
)
SELECT p_brand, revenue, rank FROM (
  SELECT p_brand, revenue,
         row_number() OVER (ORDER BY revenue DESC, p_brand) AS rank
  FROM r
) WHERE rank <= 10
""",
    survey_ids=("J1", "J4"),
    bench=True,
)
def q_topk_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by revenue: dim join + two-level aggregate + ranking window
    (the batch-oracle formulation SURVEY §2.6 names for the reference's
    state-based dedups). Rank is over the rounded measure with a brand
    tie-break — deterministic across engines.

    r15 (guide §3.1): dropped the hard ``F.broadcast(part)`` hint — part
    scales with SF, so the hint guarantees a broadcast-cap blowup at
    warehouse scale. Catalyst still picks BHJ from the fixture-size
    estimate (plan-identical here); AQE decides from runtime sizes at
    scale."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    r = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("p_brand"))
    return (
        r.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("p_brand", "revenue", "rank")
    )


@register(
    "q_semi_join",
    oracle="""
SELECT n.n_name, count(*) AS cust_ct
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
""",
    survey_ids=("J5",),
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (existence check — the 'does config contain key' half of
    the reference's broadcast router, SURVEY §2.4 note): customers with at
    least one order, counted per nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cust_ct"))
    )


@register(
    "q_anti_join",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_ct
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
GROUP BY 1
""",
    survey_ids=("J5",),
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: orders that have no lineitems, counted by priority (the
    complement branch of the router's existence check)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_ct"))
    )


@register(
    "q_dims_broadcast",
    oracle="""
SELECT r.r_name, n.n_name, count(*) AS cust_ct, round(sum(c.c_acctbal), 2) AS acctbal_sum
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""",
    survey_ids=("J4",),
)
def q_dims_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflaked dim enrichment (J4 chained): both dims broadcast, so the
    fact side is never shuffled for the joins — only the final aggregate
    exchanges (partial-agg'd) rows."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("cust_ct"),
            F.round(F.sum("c_acctbal"), 2).alias("acctbal_sum"),
        )
    )


