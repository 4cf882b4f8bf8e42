"""MERGE seam + SCD2 dimension history (operators/merge.py).

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
# MERGE seam + SCD2 dimension history (operators/merge.py)
# =========================================================================


@register(
    "q_merge_upsert",
    oracle="""
WITH chg AS (
  SELECT user_id * 13 AS k,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
         'Merged#' || (user_id * 13)::VARCHAR AS name,
         round(value, 2) AS bal
  FROM events
  WHERE user_id IS NOT NULL
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
)
SELECT coalesce(t.c_custkey, s.k) AS c_custkey,
       CASE WHEN s.k IS NOT NULL THEN s.name ELSE t.c_name END AS c_name,
       t.c_nationkey,
       CASE WHEN s.k IS NOT NULL THEN s.bal ELSE t.c_acctbal END AS c_acctbal,
       t.c_mktsegment
FROM customer t
FULL OUTER JOIN chg s ON t.c_custkey = s.k
WHERE NOT (s.k IS NOT NULL AND s.op = 'delete')
""",
    survey_ids=("K5", "K3", "W6"),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse MERGE seam (VERDICT r1 missing #5): fold a keyed
    changelog to latest state (K3 compaction), then MERGE it into the
    ``customer`` dimension — matched upserts overwrite name/acctbal, matched
    deletes drop the row, unmatched upserts insert, unmatched deletes no-op
    (``DimHBaseSinkFunction.java:33-59`` put/delete semantics as one batch plan).
    The changelog is derived from ``events``: key ``user_id*13`` spans both
    existing and brand-new custkeys, ``error`` events are deletes.  One
    window shuffle folds the log, one full-outer equi-join applies it —
    exactly the plan Delta/Iceberg ``MERGE INTO`` compiles to, with AQE free
    to broadcast the folded (tiny) changelog side."""
    from ..operators.merge import fold_changelog, merge_into

    cust = _t(spark, sf_dir, "customer")
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    chg = ev.select(
        (F.col("user_id") * 13).alias("c_custkey"),
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("upsert")
        .alias("op"),
        F.concat(F.lit("Merged#"), (F.col("user_id") * 13).cast("string")).alias(
            "c_name"
        ),
        F.round(F.col("value"), 2).alias("c_acctbal"),
        "ts",
        "event_id",
    )
    folded = fold_changelog(chg, ["c_custkey"], ["ts", "event_id"]).drop(
        "ts", "event_id"
    )
    return merge_into(
        cust,
        folded,
        keys=["c_custkey"],
        update_cols=["c_name", "c_acctbal"],
        op_col="op",
    )


@register(
    "dim_scd2_history",
    oracle="""
WITH chg AS (
  SELECT user_id, ts, event_id,
         CASE WHEN value >= 150 THEN 'gold'
              WHEN value >= 75 THEN 'silver'
              ELSE 'bronze' END AS tier
  FROM events
  WHERE user_id IS NOT NULL
),
v AS (
  SELECT user_id, ts, event_id, tier FROM (
    SELECT user_id, ts, event_id, tier,
           lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM chg
  ) WHERE prev IS NULL OR tier <> prev
)
SELECT user_id, tier, effective_from, effective_to,
       effective_to IS NULL AS is_current
FROM (
  SELECT user_id, tier, ts AS effective_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to
  FROM v
)
""",
    survey_ids=("K5", "S3"),
)
def dim_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history of a per-user "tier" attribute derived from the
    event stream: consecutive unchanged rows collapse, each surviving
    version gets ``[effective_from, effective_to)`` with NULL end = current.
    The reference's dim layer overwrites HBase cells in place
    (``DimHBaseSinkFunction.java:40-46``); this is the audit-trail
    materialization a warehouse keeps instead.  Both window passes share
    one hash shuffle + one sort on (user_id, ts, event_id)."""
    from ..operators.merge import scd2_history

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    chg = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("value") >= 150, "gold")
        .when(F.col("value") >= 75, "silver")
        .otherwise("bronze")
        .alias("tier"),
    )
    return scd2_history(chg, ["user_id"], "ts", ["tier"], tie_break="event_id")


@register(
    "dim_snapshot_asof",
    oracle="""
WITH chg AS (
  SELECT user_id, ts, event_id,
         CASE WHEN value >= 150 THEN 'gold'
              WHEN value >= 75 THEN 'silver'
              ELSE 'bronze' END AS tier
  FROM events
  WHERE user_id IS NOT NULL
),
v AS (
  SELECT user_id, ts, event_id, tier FROM (
    SELECT user_id, ts, event_id, tier,
           lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM chg
  ) WHERE prev IS NULL OR tier <> prev
),
h AS (
  SELECT user_id, tier, ts AS effective_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to
  FROM v
)
SELECT user_id, tier, effective_from, effective_to
FROM h
WHERE effective_from <= TIMESTAMP '2024-01-15 00:00:00'
  AND (effective_to IS NULL OR effective_to > TIMESTAMP '2024-01-15 00:00:00')
""",
    survey_ids=("K5", "J4"),
)
def dim_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension snapshot: the SCD2 version of each user's
    tier live at 2024-01-15T00:00 — how a training run pins dim state to
    its data's event time instead of leaking future values (the batch
    answer to the reference's processing-time lookup join J4, which can
    only ever see "now").  Pure filter over the history; no extra
    shuffle beyond ``scd2_history`` itself."""
    from ..operators.merge import scd2_history, snapshot_asof

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    chg = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("value") >= 150, "gold")
        .when(F.col("value") >= 75, "silver")
        .otherwise("bronze")
        .alias("tier"),
    )
    hist = scd2_history(chg, ["user_id"], "ts", ["tier"], tie_break="event_id")
    return snapshot_asof(hist, "2024-01-15 00:00:00")


@register(
    "q_incremental_agg",
    oracle="""
SELECT event_type, ts::DATE AS d,
       count(*)::BIGINT AS pv,
       sum(value::DECIMAL(18,2)) AS val_sum,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM events
GROUP BY 1, 2
""",
    survey_ids=("A2", "W6"),
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: the stored state (partial aggregates
    of the first ~80% of events by ``event_id % 10 < 8``) merged with a new
    slice's partial aggregates (the remaining ~20%) must equal a full
    recompute — which is exactly what the oracle computes over all rows.
    Counts merge as sums, sums as sums (DECIMAL, so merge order is exact),
    min/max re-reduce; what shuffles in the merge is O(groups) per slice,
    never the base data.  This is the Lambda-architecture backfill
    equivalence the streaming DWS accumulators rely on."""
    from ..operators.merge import merge_partial_aggs

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.to_date("ts").alias("d"),
        "ts",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "d").agg(
            F.count(F.lit(1)).alias("pv"),
            F.sum("v").alias("val_sum"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )

    stored = partial(ev.filter(F.col("event_id") % 10 < 8))
    fresh = partial(ev.filter(F.col("event_id") % 10 >= 8))
    return merge_partial_aggs(
        [stored, fresh],
        keys=["event_type", "d"],
        sum_cols=["pv", "val_sum"],
        min_cols=["first_ts"],
        max_cols=["last_ts"],
    )


