"""The query catalog: every implemented capability as (Spark plan, DuckDB oracle).

Each entry re-expresses one operator row of SURVEY.md §2 (reference file:line
cited per query) — or one of the beyond-reference training-data operators —
over the driver's fixture tables. The Spark side is the engine; the ``oracle``
is an independent ANSI-SQL formulation DuckDB runs on the same parquet for the
correctness gate (row count + schema + order-insensitive value hash).

Determinism rules (both sides, so hashes match):
- every computed float is ``round(x, n)`` with identical expression shape and
  summation order;
- hashes are md5-derived (``functions.md5_long``) — reproducible in SQL;
- rankings order by the *rounded* score with an id tie-break;
- timestamps stay naive wall-clock (timestamp_ntz == DuckDB TIMESTAMP).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import (
    date_to_ts,
    json_get,
    json_map,
    md5_long,
    md5_long_sql_duckdb,
    ts_to_date,
    ts_to_datetime,
    ts_to_partition,
)
from ..operators import dedup, graph, multimodal, similarity, sketch, skew, state, text
from ..operators.etl import cdc_project, etl_db_stream
from ..operators.joins import (
    config_router_join,
    interval_join,
    lateral_tokens,
    lookup_join,
)
from ..operators.windows import daily_distinct_count, tumble
from ..sources.fixtures import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ids: tuple[str, ...] = ()
    bench: bool = False


CATALOG: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    survey_ids: tuple[str, ...] = (),
    bench: bool = False,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = QuerySpec(name, fn, oracle, survey_ids, bench)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None}


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in CATALOG.items() if spec.bench}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# =========================================================================
# Gmall pipeline semantics over the events stream table
# =========================================================================


@register(
    "dwd_etl_project",
    oracle="""
SELECT event_id, user_id, event_type,
       json_extract_string(props, '$.k')::INT AS k_json,
       json_extract_string(props, '$.k')::INT AS k_map,
       CASE WHEN value > 100 THEN 'hi' ELSE 'lo' END AS val_band
FROM events
WHERE event_type IN ('view', 'click') AND user_id IS NOT NULL
""",
    survey_ids=("P2", "P3", "F1", "F7", "F8"),
)
def dwd_etl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge ETL + JSON projection (DwdBaseLog.java:216-239 filter pattern;
    fastjson access DimApp.java:186-189): predicate pushdown reaches the
    parquet scan, JSON parsed once via both get_json_object and a
    map<string,string> subscript (SQLUtil.java:30-31 payload shape)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("view", "click") & F.col("user_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            "event_type",
            json_get(F.col("props"), "k").cast("int").alias("k_json"),
            json_map(F.col("props"))["k"].cast("int").alias("k_map"),
            F.when(F.col("value") > 100, "hi").otherwise("lo").alias("val_band"),
        )
    )


@register(
    "dwd_cdc_route_project",
    oracle="""
SELECT o_orderkey AS id, o_totalprice AS total
FROM orders
WHERE o_orderkey % 4 <> 3
""",
    survey_ids=("P1", "P4", "S2"),
)
def dwd_cdc_route_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC envelope round-trip (P1 etl DimApp.java:181-201 + P4 map-subscript
    projection DwdInteractionCommentInfo.java:82-102): orders are wrapped into
    Maxwell-style JSON envelopes, pushed through the real edge parser+filter
    (bootstrap records dropped), and projected back out of the data map."""
    o = _t(spark, sf_dir, "orders")
    envelope = o.select(
        F.to_json(
            F.struct(
                F.lit("gmall").alias("database"),
                F.lit("order_info").alias("table"),
                F.element_at(
                    F.array(F.lit("insert"), F.lit("update"), F.lit("delete"), F.lit("bootstrap-start")),
                    (F.col("o_orderkey") % 4 + 1).cast("int"),
                ).alias("type"),
                F.create_map(
                    F.lit("id"), F.col("o_orderkey").cast("string"),
                    F.lit("total"), F.col("o_totalprice").cast("string"),
                ).alias("data"),
                F.lit(0).alias("ts"),
            )
        ).alias("value")
    )
    parsed = etl_db_stream(envelope)
    return cdc_project(parsed, ["id", "total"]).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("total").cast("double").alias("total"),
    )


@register(
    "dws_tumble_type_counts",
    oracle="""
WITH b AS (
  SELECT time_bucket(INTERVAL '10 seconds', ts) AS w, event_type,
         count(*) AS pv_ct, round(sum(value), 2) AS val_sum
  FROM events GROUP BY 1, 2
)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt,
       strftime(w + INTERVAL '10 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
       strftime(w, '%Y-%m-%d') AS cur_date,
       event_type, pv_ct, val_sum
FROM b
""",
    survey_ids=("A1", "A2", "W1"),
    bench=True,
)
def dws_tumble_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-second tumbling-window keyed counts — the flagship DWS shape
    (TUMBLE GROUP BY, DwsTrafficSourceKeywordPageViewWindow.java:61-72;
    window decorator stt/edt/cur_date :93-107). Partial (map-side)
    aggregation is automatic; the reference hand-builds it with reduce()."""
    ev = _t(spark, sf_dir, "events")
    return tumble(
        ev,
        "ts",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("pv_ct"),
            F.round(F.sum("value"), 2).alias("val_sum"),
        ],
    )


@register(
    "dws_tumble_global_hourly",
    oracle="""
WITH b AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS w,
         count(*) AS pv_ct, count(DISTINCT user_id) AS uv_ct,
         round(sum(value), 2) AS val_sum
  FROM events GROUP BY 1
)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt,
       strftime(w + INTERVAL '1 hour', '%Y-%m-%d %H:%M:%S') AS edt,
       strftime(w, '%Y-%m-%d') AS cur_date,
       pv_ct, uv_ct, val_sum
FROM b
""",
    survey_ids=("A3",),
)
def dws_tumble_global_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (non-keyed) window aggregate — the reference's parallelism-1
    windowAll (DwsTrafficHomeDetailPageViewWindow.java:71-95 etc.); Spark
    still computes distributed partials, strictly better at scale."""
    ev = _t(spark, sf_dir, "events")
    return tumble(
        ev,
        "ts",
        keys=[],
        aggs=[
            F.count(F.lit(1)).alias("pv_ct"),
            F.count_distinct(F.col("user_id")).alias("uv_ct"),
            F.round(F.sum("value"), 2).alias("val_sum"),
        ],
        window_size="1 hour",
    )


@register(
    "dws_daily_uv",
    oracle="""
SELECT ts::DATE AS cur_date,
       count(DISTINCT user_id) AS uv_ct,
       count(*) AS pv_ct
FROM events GROUP BY 1
""",
    survey_ids=("A4", "W3"),
    bench=True,
)
def dws_daily_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily UV — the keyed-ValueState daily dedup
    (DwsTrafficVcChArIsNewPageViewWindow.java:134-189) in its deterministic
    (key, date) formulation."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("cur_date")).agg(
        F.count_distinct(F.col("user_id")).alias("uv_ct"),
        F.count(F.lit(1)).alias("pv_ct"),
    )


@register(
    "dws_session_window_agg",
    oracle="""
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS session_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sid AS (
  SELECT user_id, ts,
         sum(session_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
  FROM s
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start_ts,
       strftime(max(ts) + INTERVAL 1800 SECOND, '%Y-%m-%d %H:%M:%S') AS session_end_ts,
       count(*) AS event_ct
FROM sid GROUP BY user_id, session_id
""",
    survey_ids=("W3", "A2"),
)
def dws_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-NATIVE session windows (r7): the same 30-min-gap sessions as
    ``dws_session_count``, expressed with the built-in
    ``F.session_window(ts, gap)`` aggregate instead of the window-function
    sessionize — one groupBy, merging windows handled by the engine
    (SURVEY §2.8 notes the reference uses no session windows; this entry
    pins the native operator's semantics to the declarative gap rule:
    window.start = first event ts, window.end = last event ts + gap).
    The oracle derives the identical sessions via the lag/gap rule.
    Adversarial hot_key ×10 (900k rows on one user): 1.96 s bounded —
    Spark's session merge is a sort-based per-partition pass, so even the
    native form survives the flood (BASELINE.md survival table)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("event_ct"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start_ts"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end_ts"),
            "event_ct",
        )
    )


@register(
    "dws_is_new_repair",
    oracle="""
SELECT DISTINCT user_id, ts::DATE AS cur_date,
       CASE WHEN ts::DATE = min(ts::DATE) OVER (PARTITION BY user_id)
            THEN 1 ELSE 0 END AS is_new
FROM events
""",
    survey_ids=("W2",),
)
def dws_is_new_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New/old-visitor repair (DwdBaseLog.java:154-198): is_new holds only on
    the key's first active date. Declarative batch form of the ValueState op;
    streaming/state.py holds the applyInPandasWithState twin."""
    ev = _t(spark, sf_dir, "events")
    repaired = state.first_seen_repair(ev, "user_id", F.to_date("ts"))
    return repaired.select("user_id", "cur_date", "is_new").distinct()


@register(
    "dws_session_count",
    oracle="""
WITH s AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS session_start
  FROM events
)
SELECT user_id, ts::DATE AS cur_date, sum(session_start)::BIGINT AS session_ct
FROM s GROUP BY 1, 2
""",
    survey_ids=("W3",),
    bench=True,
)
def dws_session_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (the reference marks session starts via
    last_page_id IS NULL, DwsTrafficVcChArIsNewPageViewWindow.java:171-174;
    30-min inactivity gap is the general form): sessions per user per day."""
    ev = _t(spark, sf_dir, "events")
    s = state.sessionize(ev, "user_id", "ts", gap_seconds=1800)
    return s.groupBy("user_id", F.to_date("ts").alias("cur_date")).agg(
        F.sum("session_start").alias("session_ct")
    )


@register(
    "dws_returning_users",
    oracle="""
WITH v AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
f AS (SELECT user_id, d, lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev FROM v)
SELECT d AS cur_date, count(*) AS uu_ct,
       sum(CASE WHEN prev IS NOT NULL AND date_diff('day', prev, d) > 7
                THEN 1 ELSE 0 END)::BIGINT AS back_ct
FROM f GROUP BY 1
""",
    survey_ids=("W4",),
)
def dws_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returning-user detection (DwsUserUserLoginWindow.java:95-135): daily
    unique users + users coming back after a >7-day absence."""
    ev = _t(spark, sf_dir, "events")
    flags = state.returning_user_flags(ev.select("user_id", F.to_date("ts").alias("d")), "user_id", "d")
    return flags.groupBy(F.col("d").alias("cur_date")).agg(
        F.count(F.lit(1)).alias("uu_ct"), F.sum("back").alias("back_ct")
    )


@register(
    "dws_purchase_uu",
    oracle="""
SELECT ts::DATE AS cur_date, count(DISTINCT user_id) AS cart_add_uu_ct
FROM events WHERE event_type = 'purchase' GROUP BY 1
""",
    survey_ids=("A4", "W3", "P3"),
)
def dws_purchase_uu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily unique purchasers — the cart-add-UU pipeline shape
    (DwsTradeCartAddUuWindow.java:65-115): per-app ETL filter + daily
    ValueState dedup as dropDuplicates(key, date) + count."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return daily_distinct_count(ev, F.to_date("ts"), "user_id", out="cart_add_uu_ct")


@register(
    "dwd_interval_join",
    oracle="""
SELECT p.user_id, p.event_id AS pay_id, c.event_id AS click_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL '15 minutes'
 AND c.ts <= p.ts + INTERVAL '15 seconds'
""",
    survey_ids=("J3",),
    bench=True,
)
def dwd_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (DwdTradeOrderPaySucDetail.java:101-125): purchases
    paired with same-user clicks in [-15 min, +15 s] — equality conjunct keeps
    it a hash join on user_id, range applied within key partitions."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("pay_id"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    joined = interval_join(p, c.withColumnRenamed("c_user", "user_id"), "user_id", "p_ts", "c_ts")
    return joined.select(p["user_id"], "pay_id", "click_id")


@register(
    "dwd_lookup_join_dict",
    oracle="""
SELECT e.event_id, e.event_type, d.dic_name
FROM events e LEFT JOIN (VALUES
  ('view', 'View Page'), ('click', 'Click'),
  ('purchase', 'Purchase'), ('signup', 'Sign Up')
) d(dic_code, dic_name) ON e.event_type = d.dic_code
""",
    survey_ids=("J4", "S5"),
)
def dwd_lookup_join_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup (dictionary) join — FOR SYSTEM_TIME AS OF proc_time against the
    base_dic table (DwdTradeOrderPaySucDetail.java:76-99, left variant).
    Stream-static broadcast join: the dict is re-read per micro-batch, the
    fact side never shuffles."""
    ev = _t(spark, sf_dir, "events")
    dic = spark.createDataFrame(
        [("view", "View Page"), ("click", "Click"), ("purchase", "Purchase"), ("signup", "Sign Up")],
        "dic_code string, dic_name string",
    )
    return lookup_join(ev, dic, "event_type", "dic_code", how="left").select(
        "event_id", "event_type", "dic_name"
    )


@register(
    "dim_config_routing",
    oracle="""
SELECT cfg.sink_table, e.event_id,
       array_to_string(
         list_sort(list_intersect(['event_id','user_id','value'],
                                  string_split(cfg.sink_columns, ','))), ',') AS kept_keys
FROM events e
JOIN (VALUES
  ('purchase', 'dwd_trade_order',   'event_id,user_id,value'),
  ('click',    'dwd_traffic_click', 'event_id,user_id'),
  ('view',     'dwd_traffic_page',  'event_id')
) cfg(source_table, sink_table, sink_columns)
  ON e.event_type = cfg.source_table
""",
    survey_ids=("J5", "P6", "R3", "S3", "S4"),
)
def dim_config_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-table-driven routing + runtime column pruning — the reference's
    most distinctive capability (DimBroadcastFunction.java:57-99 broadcast
    config join; DimApp.java:87-104 sinkColumns pruning; DwdBaseDb.java:77-98
    sink_table injection). Config is data: a table_process row per source,
    broadcast-joined, with the kept-column set applied via map_filter."""
    ev = _t(spark, sf_dir, "events")
    cfg = spark.createDataFrame(
        [
            ("purchase", "dwd_trade_order", "event_id,user_id,value"),
            ("click", "dwd_traffic_click", "event_id,user_id"),
            ("view", "dwd_traffic_page", "event_id"),
        ],
        "source_table string, sink_table string, sink_columns string",
    )
    routed = config_router_join(
        ev.withColumn("source_table", F.col("event_type")), cfg, on=["source_table"]
    )
    with_data = routed.withColumn(
        "data",
        F.create_map(
            F.lit("event_id"), F.col("event_id").cast("string"),
            F.lit("user_id"), F.col("user_id").cast("string"),
            F.lit("value"), F.col("value").cast("string"),
        ),
    )
    keep = F.split(F.col("sink_columns"), ",")
    pruned = with_data.withColumn(
        "data", F.map_filter(F.col("data"), lambda k, _v: F.array_contains(keep, k))
    )
    return pruned.select(
        "sink_table",
        "event_id",
        F.array_join(F.array_sort(F.map_keys(F.col("data"))), ",").alias("kept_keys"),
    )


@register(
    "k3_upsert_final_state",
    oracle="""
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type, value AS last_value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
""",
    survey_ids=("K3", "K5"),
    bench=True,
)
def k3_upsert_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed-upsert sink semantics (upsert-kafka PK compaction,
    DwdTradeOrderDetail.java:59-79; HBase put-by-rowkey,
    DimHBaseSinkFunction.java:34-47): last-write-wins final state per key.
    This dedup-by-key-keep-latest is exactly what the foreachBatch upsert
    writer (streaming/sinks.py) applies per micro-batch."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "dwd_keyword_split",
    oracle="""
SELECT t.tok AS keyword, count(*) AS keyword_count
FROM documents d,
     unnest(list_filter(regexp_split_to_array(trim(d.text), '\\s+'), x -> x <> '')) AS t(tok)
GROUP BY 1
""",
    survey_ids=("J6", "F13", "R2"),
)
def dwd_keyword_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword tokenize + lateral explode + count — the traffic-keyword DWS
    app (KwSplit UDTF + LATERAL TABLE, DwsTrafficSourceKeywordPageViewWindow
    .java:36,74-79). Tokenizer is a codegen'd split; explode is the lateral
    view; the count is the windowless core of A1."""
    docs = _t(spark, sf_dir, "documents")
    from ..functions import tokenize

    toks = lateral_tokens(docs.select("doc_id", "text"), tokenize(F.col("text")), out="keyword")
    return toks.groupBy("keyword").agg(F.count(F.lit(1)).alias("keyword_count"))


@register(
    "q_split_counts",
    oracle="""
SELECT CASE event_type
         WHEN 'error' THEN 'err' WHEN 'signup' THEN 'start'
         WHEN 'view' THEN 'display' WHEN 'click' THEN 'action'
         ELSE 'page' END AS branch,
       count(*) AS ct
FROM events GROUP BY 1
""",
    survey_ids=("R1",),
)
def q_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way side-output split (DwdBaseLog.java:76-152): one parsed pass
    derives five mutually-exclusive branches (filters over a shared plan
    prefix), here recombined with unionByName for verification."""
    ev = _t(spark, sf_dir, "events")
    branches = {
        "err": ev.filter(F.col("event_type") == "error"),
        "start": ev.filter(F.col("event_type") == "signup"),
        "display": ev.filter(F.col("event_type") == "view"),
        "action": ev.filter(F.col("event_type") == "click"),
        "page": ev.filter(~F.col("event_type").isin("error", "signup", "view", "click")),
    }
    parts = [df.select(F.lit(name).alias("branch")) for name, df in branches.items()]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("branch").agg(F.count(F.lit(1)).alias("ct"))


@register(
    "scalar_time_project",
    oracle="""
SELECT event_id,
       strftime(make_timestamp(ms * 1000) + INTERVAL 8 HOURS, '%Y-%m-%d') AS dt,
       strftime(make_timestamp(ms * 1000) + INTERVAL 8 HOURS, '%Y-%m-%d %H:%M:%S') AS dtt,
       strftime(make_timestamp(ms * 1000) + INTERVAL 8 HOURS, '%Y%m%d') AS dpart,
       strftime(make_timestamp((ms - 86400000) * 1000) + INTERVAL 8 HOURS, '%Y-%m-%d') AS yesterday,
       event_type || ':' || user_id::VARCHAR AS concat_key,
       (ms - ms % 1000) AS roundtrip_ms
FROM (SELECT event_id, user_id, event_type, event_id * 1000000 + 123456 AS ms FROM events)
""",
    survey_ids=("F2", "F3", "F4", "F5", "F9", "F11"),
)
def scalar_time_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DateFormatUtil surface (DateFormatUtil.java:26-57, +08:00 pinned):
    ms-epoch -> date / datetime / partition-key strings, yesterday arithmetic
    (DwdBaseLog.java:189), concat keys (DwsTrafficVcChArIsNewPageViewWindow
    .java:114), and the string->ms round trip (dateToTs)."""
    ev = _t(spark, sf_dir, "events")
    ms = (F.col("event_id") * 1000000 + 123456).alias("ms")
    base = ev.select("event_id", "user_id", "event_type", ms)
    return base.select(
        "event_id",
        ts_to_date(F.col("ms")).alias("dt"),
        ts_to_datetime(F.col("ms")).alias("dtt"),
        ts_to_partition(F.col("ms")).alias("dpart"),
        ts_to_date(F.col("ms") - 86400000).alias("yesterday"),
        F.concat_ws(":", F.col("event_type"), F.col("user_id")).alias("concat_key"),
        date_to_ts(ts_to_datetime(F.col("ms"))).alias("roundtrip_ms"),
    )


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
    """Top-k by revenue: broadcast dim join + two-level aggregate + ranking
    window (the batch-oracle formulation SURVEY §2.6 names for the
    reference's state-based dedups). Rank is over the rounded measure with a
    brand tie-break — deterministic across engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    r = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
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


# =========================================================================
# Training-data pipeline operators (beyond-reference; BASELINE.json north star)
# =========================================================================

# Shared DuckDB CTE: distinct 3-gram shingles per document (matches
# operators.dedup.shingles exactly: whitespace tokens, space-joined n-grams).
_SHINGLE_CTE = """
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)])) AS shingle
  FROM toks WHERE len(t) >= 3
)
"""

_JACCARD_SQL = f"""
WITH {_SHINGLE_CTE},
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) >= 0.35
"""


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_ct
FROM documents GROUP BY 1
""",
    survey_ids=("dedup-exact",),
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: only 32-byte hashes shuffle, never text."""
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


_CONTAINMENT_SQL = f"""
WITH {_SHINGLE_CTE},
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(inter::DOUBLE / least(sa.sz, sb.sz), 6) AS containment
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE round(inter::DOUBLE / least(sa.sz, sb.sz), 6) >= 0.5
"""


_CONTAINMENT_IDX_SQL = f"""
WITH {_SHINGLE_CTE},
h AS (SELECT doc_id, {md5_long_sql_duckdb('shingle')} AS hs FROM sh),
docsets AS (SELECT doc_id, list_sort(list(hs)) AS shs, count(*) AS sz FROM h GROUP BY 1),
-- r5: identical shingle sets collapse; df is counted over DISTINCT sets
-- (the engine's rep-level candidate rule — rarity robust to duplication)
grp AS (SELECT shs, min(doc_id) AS rep, list_sort(list(doc_id)) AS ids, min(sz) AS sz
        FROM docsets GROUP BY shs),
rh AS (SELECT g.rep AS doc_id, u.hs FROM grp g, unnest(g.shs) u(hs)),
dfq AS (SELECT hs, count(*) AS df FROM rh GROUP BY 1),
rare AS (
  SELECT doc_id AS rid, hs FROM (
    SELECT rh.doc_id, rh.hs,
           row_number() OVER (PARTITION BY rh.doc_id ORDER BY f.df, rh.hs) AS rn
    FROM rh JOIN dfq f ON rh.hs = f.hs
  ) t(doc_id, hs, rn) WHERE rn <= 8
),
cand AS (
  SELECT DISTINCT least(r.rid, o.doc_id) AS id_a, greatest(r.rid, o.doc_id) AS id_b
  FROM rare r JOIN rh o ON r.hs = o.hs AND r.rid <> o.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN rh ha ON ha.doc_id = c.id_a
  JOIN rh hb ON hb.doc_id = c.id_b AND hb.hs = ha.hs
  GROUP BY 1, 2
),
reppairs AS (
  SELECT id_a, id_b,
         round(inter::DOUBLE / least(sa.sz, sb.sz), 6) AS containment
  FROM inter
  JOIN grp sa ON sa.rep = id_a
  JOIN grp sb ON sb.rep = id_b
  WHERE round(inter::DOUBLE / least(sa.sz, sb.sz), 6) >= 0.5
),
intra AS (
  SELECT a.a_id AS id_a, b.b_id AS id_b, 1.0 AS containment
  FROM grp g, unnest(g.ids) a(a_id), unnest(g.ids) b(b_id)
  WHERE a.a_id < b.b_id
),
crossed AS (
  SELECT least(ua.ia, ub.ib) AS id_a, greatest(ua.ia, ub.ib) AS id_b, rp.containment
  FROM reppairs rp
  JOIN grp ga ON ga.rep = rp.id_a
  JOIN grp gb ON gb.rep = rp.id_b,
  unnest(ga.ids) ua(ia), unnest(gb.ids) ub(ib)
)
SELECT id_a, id_b, containment FROM intra
UNION ALL
SELECT id_a, id_b, containment FROM crossed
"""


@register(
    "dedup_containment_indexed",
    oracle=_CONTAINMENT_IDX_SQL,
    survey_ids=("dedup-containment",),
)
def dedup_containment_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment via the rare-shingle inverted index — the scale path:
    each doc probes with its 8 corpus-rarest shingles (recall ~1-(1-c)^8),
    candidates fan out O(df-of-rare-shingle) per probe, exact verification
    on candidates only. The oracle replicates the same candidate rule, so
    the check is hash-exact. See ``dedup.containment_pairs_rare_shingle``."""
    return dedup.containment_pairs_rare_shingle(_t(spark, sf_dir, "documents"), threshold=0.5)


@register("dedup_containment", oracle=_CONTAINMENT_SQL, survey_ids=("dedup-containment",))
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (|A∩B| / min(|A|,|B|) >= 0.5): finds a
    document embedded in a larger one, which symmetric Jaccard misses. See
    ``dedup.containment_pairs_brute`` for why candidates are the exact
    shared-shingle join rather than MinHash banding."""
    return dedup.containment_pairs_brute(_t(spark, sf_dir, "documents"), threshold=0.5)


@register("dedup_jaccard_brute", oracle=_JACCARD_SQL, survey_ids=("dedup-ngram-jaccard",))
def dedup_jaccard_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (threshold 0.35) via shared-shingle
    candidates — the exactness baseline the LSH path is verified against."""
    return dedup.jaccard_pairs_brute(_t(spark, sf_dir, "documents"), threshold=0.35)


@register("dedup_minhash_lsh", oracle=_JACCARD_SQL, survey_ids=("dedup-minhash-lsh",), bench=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified — the 100 TB scale
    path (equi-joins on band buckets only). Oracle is the exact brute-force
    pair set: at 64 perms / 2-row bands LSH recall at j>=0.35 is ~1, and the
    exact verification step removes every false candidate, so the outputs
    coincide."""
    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.35)


_MINHASH_SIG_SQL = f"""
WITH {_SHINGLE_CTE},
h AS (SELECT doc_id, {md5_long_sql_duckdb('shingle', 7)} AS h FROM sh)
SELECT doc_id, p.b AS perm,
       min(((2 * p.b + 1) * h + p.b * p.b + 1) % 2147483647) AS minval
FROM h CROSS JOIN range(64) p(b)
GROUP BY 1, 2
"""


@register("dedup_minhash_sig", oracle=_MINHASH_SIG_SQL, survey_ids=("dedup-minhash-lsh",))
def dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures, exploded to (doc_id, perm, minval) for exact
    value-level verification of the hash pipeline."""
    sig = dedup.minhash_signatures(_t(spark, sf_dir, "documents"))
    return sig.select("doc_id", F.posexplode("sig").alias("perm", "minval")).select(
        "doc_id", F.col("perm").cast("bigint").alias("perm"), "minval"
    )


_SIMHASH_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS tok
  FROM documents
),
h AS (SELECT doc_id, {md5_long_sql_duckdb('tok', 12)} AS h FROM dt),
bits AS (
  SELECT doc_id, p.b AS b,
         sum(CASE WHEN (h >> p.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN range(48) p(b)
  GROUP BY 1, 2
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY 1
"""


@register("dedup_simhash", oracle=_SIMHASH_SQL, survey_ids=("dedup-simhash",))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash fingerprints (near-dup = small Hamming distance),
    computed fully declaratively."""
    return dedup.simhash(_t(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_pairs",
    oracle=f"""
WITH fp AS ({_SIMHASH_SQL})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
    survey_ids=("dedup-simhash",),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3 over 48 bits) via pigeonhole
    chunk banding: distance <= 3 over 4 chunks forces at least one chunk
    to agree, so the bucketed candidate generation has recall exactly 1 —
    which is why the quadratic Hamming join is a sound oracle while the
    engine plan stays an equi-key groupBy. See ``dedup.simhash_pairs``."""
    return dedup.simhash_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)


def _simhash_combo_key_sql(bits: int = 48, chunks: int = 6, max_hamming: int = 3) -> str:
    """DuckDB list of the 6-choose-3 combo band keys, generated from the
    SAME layout the engine uses (``dedup._simhash_combo_layout``) — the
    oracle and the engine can never drift on the bucket definition."""
    width, mask, combos, _ = dedup._simhash_combo_layout(bits, chunks, max_hamming)
    exprs = []
    for ci, combo in enumerate(combos):
        acc = str(ci)
        for c in combo:
            acc = f"({acc} * {mask + 1} + ((simhash >> {c * width}) & {mask}))"
        exprs.append(acc)
    return "[" + ", ".join(exprs) + "]"


@register(
    "dedup_minhash_bucket_stats",
    oracle=f"""
WITH {_SHINGLE_CTE},
hs AS (SELECT doc_id, {md5_long_sql_duckdb('shingle', 15)} AS h60,
              {md5_long_sql_duckdb('shingle', 7)} AS h28
       FROM sh),
sets AS (SELECT doc_id, list_sort(list(DISTINCT h60)) AS shs FROM hs GROUP BY doc_id),
reps AS (SELECT min(doc_id) AS rep FROM sets GROUP BY shs),
sig AS (SELECT h.doc_id, p.b AS perm,
               min(((2 * p.b + 1) * h.h28 + p.b * p.b + 1) % 2147483647) AS mv
        FROM hs h JOIN reps r ON h.doc_id = r.rep CROSS JOIN range(64) p(b)
        GROUP BY 1, 2),
bands AS (SELECT doc_id, perm // 2 AS band,
                 min(CASE WHEN perm % 2 = 0 THEN mv END) AS v0,
                 min(CASE WHEN perm % 2 = 1 THEN mv END) AS v1
          FROM sig GROUP BY 1, 2),
sizes AS (SELECT count(*) AS c FROM bands GROUP BY band, v0, v1)
SELECT count(*)::BIGINT AS n_buckets, max(c)::BIGINT AS max_bucket,
       sum(CASE WHEN c > 256 THEN 1 ELSE 0 END)::BIGINT AS capped_buckets,
       sum(CASE WHEN c > 256 THEN c ELSE 0 END)::BIGINT AS capped_ids
FROM sizes
""",
    survey_ids=("dedup-minhash-lsh",),
)
def dedup_minhash_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The no-silent-caps rule for the MinHash family (VERDICT r5 #8; the
    simhash/semantic twins already exist): band-bucket population stats
    over the rep-level banded frame. ``capped_buckets > 0`` means
    ``dedup_minhash_lsh`` star-capped those buckets; on the driver fixtures
    it must be 0, proven hash-exact each round. The oracle rebuilds the
    collapse + banding independently — distinct shingle sets -> one rep ->
    64-perm signature -> 32 two-row bands grouped by VALUE tuple (the
    engine groups by its 64-bit FNV band key, identical up to FNV
    collisions, ~1e-10 at fixture scale)."""
    return dedup.minhash_band_stats(_t(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_bucket_stats",
    oracle=f"""
WITH fp AS ({_SIMHASH_SQL}),
reps AS (SELECT simhash FROM fp GROUP BY simhash),
keys AS (SELECT unnest({_simhash_combo_key_sql()}) AS ck FROM reps),
sizes AS (SELECT ck, count(*) AS c FROM keys GROUP BY ck)
SELECT count(*) AS n_buckets, max(c) AS max_bucket,
       sum(CASE WHEN c > 2048 THEN 1 ELSE 0 END)::BIGINT AS capped_buckets,
       sum(CASE WHEN c > 2048 THEN c ELSE 0 END)::BIGINT AS capped_ids
FROM sizes
""",
    survey_ids=("dedup-simhash",),
)
def dedup_simhash_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The no-silent-caps rule as a first-class oracle-checked query:
    combo-bucket population stats over the distinct-fingerprint frame.
    ``capped_buckets > 0`` means ``dedup_simhash_pairs`` star-capped those
    buckets (pair recall reduced, components preserved) — on the driver
    fixtures it must be 0, which this entry proves every round."""
    return dedup.simhash_band_stats(_t(spark, sf_dir, "documents"))


@register(
    "text_script_profile",
    oracle="""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-zÀ-ɏ]'))::INT AS latin_ct,
       len(regexp_extract_all(text, '[一-鿿぀-ヿ]'))::INT AS cjk_ct,
       len(regexp_extract_all(text, '[Ѐ-ӿ]'))::INT AS cyrillic_ct,
       len(regexp_extract_all(text, '[؀-ۿ]'))::INT AS arabic_ct,
       len(regexp_extract_all(text, '[0-9]'))::INT AS digit_ct,
       length(text)::INT AS char_ct,
       CASE WHEN len(regexp_extract_all(text, '[A-Za-zÀ-ɏ]')) >= len(regexp_extract_all(text, '[一-鿿぀-ヿ]'))
             AND len(regexp_extract_all(text, '[A-Za-zÀ-ɏ]')) >= len(regexp_extract_all(text, '[Ѐ-ӿ]'))
             AND len(regexp_extract_all(text, '[A-Za-zÀ-ɏ]')) >= len(regexp_extract_all(text, '[؀-ۿ]'))
            THEN 'latin'
            WHEN len(regexp_extract_all(text, '[一-鿿぀-ヿ]')) >= len(regexp_extract_all(text, '[Ѐ-ӿ]'))
             AND len(regexp_extract_all(text, '[一-鿿぀-ヿ]')) >= len(regexp_extract_all(text, '[؀-ۿ]'))
            THEN 'cjk'
            WHEN len(regexp_extract_all(text, '[Ѐ-ӿ]')) >= len(regexp_extract_all(text, '[؀-ۿ]'))
            THEN 'cyrillic'
            ELSE 'arabic' END AS dominant_script
FROM documents
""",
    survey_ids=("text-langid",),
)
def text_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script profile (r7): per-doc character counts over literal
    BMP script ranges + deterministic dominant-script label — the
    mixed-script/mojibake curation gate, all JVM-side ``regexp_count``
    codegen (same literal ranges run unchanged in DuckDB's RE2)."""
    return text.script_profile(_t(spark, sf_dir, "documents"))


_NORM_TEXT_SQL = md5_long_sql_duckdb("regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       {_NORM_TEXT_SQL} AS fp
FROM documents
""",
    survey_ids=("text-fingerprint",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized 60-bit document fingerprint (case/whitespace-insensitive
    identity for dedup and provenance joins)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp"))


def _marker_hits_sql(markers: tuple[str, ...]) -> str:
    parts = [
        f"len(list_filter(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> ''), x -> x = '{m}'))"
        for m in markers
    ]
    return "(" + " + ".join(parts) + ")"


_QUALITY_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars,
       len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens,
       round(length(text)::DOUBLE / greatest(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')), 1), 6) AS chars_per_token,
       round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE / greatest(length(text), 1), 6) AS punct_ratio,
       round({_marker_hits_sql(text.STOPWORDS)}::DOUBLE / greatest(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')), 1), 6) AS stopword_ratio,
       round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / greatest(length(text), 1), 6) AS alpha_ratio
FROM documents
"""


@register("text_quality", oracle=_QUALITY_SQL, survey_ids=("text-quality",), bench=True)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring feature vector (C4/Gopher-style length & symbol
    ratios) — one shuffle-free map-side projection."""
    return text.quality_features(_t(spark, sf_dir, "documents"))


def _lang_case_sql() -> str:
    langs = sorted(text.LANG_MARKERS)
    scores = {lang: _marker_hits_sql(text.LANG_MARKERS[lang]) for lang in langs}
    best = "greatest(" + ", ".join(scores[lang] for lang in langs) + ")"
    whens = "\n".join(
        f"  WHEN {best} > 0 AND {scores[lang]} = {best} THEN '{lang}'" for lang in langs
    )
    return f"SELECT doc_id, CASE\n{whens}\n  ELSE 'und' END AS lang_pred FROM documents"


@register("text_lang_id", oracle=_lang_case_sql(), survey_ids=("text-lang-id",))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic (stopword-marker) language ID; first language in code order
    wins ties, 'und' when no marker hits."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.lang_id(F.col("text")).alias("lang_pred"))


@register(
    "text_token_count",
    oracle="""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens
FROM documents
""",
    survey_ids=("text-token-count",),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting over the documents table (whitespace tokenizer)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.token_count(F.col("text")).alias("n_tokens"))


_ANN_BRUTE_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % 20 = 0
),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS sim
  FROM q CROSS JOIN c
  WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""


@register("ann_brute_force", oracle=_ANN_BRUTE_SQL, survey_ids=("sim-brute-cosine",), bench=True)
def ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the query subset (vec_id % 20 == 0): broadcast
    query side, corpus streams map-side; per-query top-k via ranking window.
    Dot/norm folds are sequential doubles — bit-identical to the oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    return similarity.brute_force_topk(emb, q, k=5)


@register("ann_lsh_bucketed", oracle=None, survey_ids=("sim-lsh",))
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via multi-probe sign-bit LSH: plane count auto-
    scales with the corpus (8 here, 22 at 10^9 vectors — expected bucket
    size stays ~256), each query probes 4 single-bit-flip buckets, and
    scoring is a cogrouped Arrow pass emitting bucket-local top-k, so the
    final ranking window sees nprobe*k rows per query — never O(|bucket|)
    raw candidates. Deterministic hyperplanes make even this approximate
    index exactly oracle-checkable (SQL twin installed below,
    _ANN_LSH_SQL)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    return similarity.lsh_topk(emb, q, k=5)


@register(
    "multimodal_meta",
    oracle="""
SELECT doc_id AS media_id, 'text/plain' AS mime,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha
FROM documents
""",
    survey_ids=("mm-meta",),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media table: payload stays a binary column; typed
    metadata (byte length, content sha) computed JVM-side without Python
    touching the bytes."""
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.to_media_table(docs, "doc_id", F.col("text").cast("binary"), "text/plain")
    return media.select("media_id", "mime", "n_bytes", "sha")


@register(
    "multimodal_decode",
    oracle="""
SELECT doc_id AS media_id,
       (doc_id % 31 + 1)::INT AS width,
       (doc_id % 17 + 1)::INT AS height,
       (54 + ((3 * (doc_id % 31 + 1) + 3) // 4 * 4) * (doc_id % 17 + 1))::BIGINT AS n_bytes,
       (3 * (doc_id % 31 + 1) * (doc_id % 17 + 1) * (doc_id % 251))::BIGINT AS pix_sum
FROM documents
""",
    survey_ids=("mm-decode",),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over an Arrow-batched binary column: synthesize a
    valid 24bpp BMP per doc (struct.pack encoder), decode it back with the
    independent numpy parser (header fields, bottom-up rows, 4-byte row
    padding stripped — padding bytes are 0xAB, so sloppy stripping breaks
    pix_sum). The oracle predicts width/height/file size/pixel sum from
    the seed arithmetic alone, so a hash match proves the decoder parsed
    the binary format correctly — not that it echoed the fixture."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "bmp")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "image/bmp")
    decoded = multimodal.decode_media(media)
    return decoded.select(
        "media_id", "width", "height", "n_bytes",
        F.col("sample_sum").alias("pix_sum"),
    )


@register(
    "multimodal_audio_decode",
    oracle="""
SELECT doc_id AS media_id,
       CAST(8000 AS INT) AS sample_rate,
       (doc_id % 1200 + 1)::INT AS n_samples,
       ((doc_id % 1200 + 1) * 1000 // 8000)::BIGINT AS duration_ms,
       ((doc_id % 1200 + 1) * (doc_id % 1001 - 500))::BIGINT AS amp_sum
FROM documents
""",
    survey_ids=("mm-decode",),
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: synthesize a valid PCM16 RIFF/WAV per doc (with a
    decoy 'cue ' chunk so data offsets can't be hardcoded), decode via the
    numpy RIFF walker, report rate / sample count / duration / amplitude
    sum — all predicted by the oracle from seed arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "wav")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "audio/wav")
    decoded = multimodal.decode_media(media)
    return decoded.select(
        "media_id", "sample_rate",
        F.col("n_frames").alias("n_samples"),
        "duration_ms",
        F.col("sample_sum").alias("amp_sum"),
    )


@register(
    "multimodal_jpeg_meta",
    oracle="""
SELECT doc_id AS media_id,
       (doc_id % 509 + 1)::INT AS width,
       (doc_id % 389 + 1)::INT AS height,
       (CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END)::INT AS n_components,
       (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::INT AS progressive,
       (doc_id % 8 + 1)::INT AS orientation
FROM documents
""",
    survey_ids=("mm-decode",),
)
def multimodal_jpeg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG header-metadata gate (VERDICT r5 #4): synthesize a structurally
    valid JPEG per doc (marker segments; layout varies by seed — JFIF APP0
    presence, COM segments, II/MM EXIF byte order, SOF0 vs SOF2), then
    parse the headers back with the independent marker walker: dimensions,
    component count, progressive flag, EXIF orientation — the most common
    multimodal curation filter, no pixel decode (that stays behind the
    decode_media vendor seam, ``operators/multimodal.py``). The oracle
    predicts every column from seed arithmetic alone."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "jpeg")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "image/jpeg")
    return multimodal.jpeg_meta(media)


@register(
    "multimodal_gif_meta",
    oracle="""
SELECT doc_id AS media_id,
       (doc_id % 777 + 1)::INT AS width,
       (doc_id % 555 + 1)::INT AS height,
       (doc_id % 12 + 1)::INT AS n_frames,
       (2 * 2 ** (doc_id % 3 + 1))::INT AS gct_colors,
       (CASE WHEN doc_id % 3 = 0 THEN doc_id % 70 ELSE 0 END)::INT AS loop_count,
       (CASE WHEN doc_id % 12 + 1 > 1 THEN 1 ELSE 0 END)::INT AS animated
FROM documents
""",
    survey_ids=("mm-decode",),
)
def multimodal_gif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF metadata gate (r7): synthesize a valid GIF89a per doc (global
    color table, optional NETSCAPE loop extension, per-frame graphic
    control + data sub-blocks), parse it back with the independent block
    walker: dimensions, palette size, frame count, loop count, animated
    flag — the animated-vs-static curation filter, no LZW decode. Oracle =
    seed arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "gif")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "image/gif")
    return multimodal.gif_meta(media)


@register(
    "multimodal_mp3_meta",
    oracle="""
WITH p AS (
  SELECT doc_id,
         doc_id % 2 = 1 AS v1,
         (doc_id % 13 + 2)::INT AS bi,
         (doc_id % 3 + 1)::INT AS si,
         (doc_id % 40 + 1)::INT AS nf
  FROM documents
)
SELECT doc_id AS media_id,
       (CASE WHEN v1 THEN ([0,32,40,48,56,64,80,96,112,128,160,192,224,256,320])[bi]
             ELSE ([0,8,16,24,32,40,48,56,64,80,96,112,128,144,160])[bi] END)::INT
         AS bitrate_kbps,
       (CASE WHEN v1 THEN ([44100,48000,32000])[si]
             ELSE ([22050,24000,16000])[si] END)::INT AS sample_rate,
       (CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 2 END)::INT AS channels,
       nf AS n_frames,
       (nf * (CASE WHEN v1 THEN 1152 ELSE 576 END) * 1000
          // (CASE WHEN v1 THEN ([44100,48000,32000])[si]
                   ELSE ([22050,24000,16000])[si] END))::BIGINT AS duration_ms,
       (CASE WHEN doc_id % 4 = 0
             THEN 10 + length('synthetic id3 payload ' || doc_id::VARCHAR)
             ELSE 0 END)::INT AS id3_bytes
FROM p
""",
    survey_ids=("mm-decode",),
)
def multimodal_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 frame-header gate (r7): synthesize a valid CBR layer-III stream
    per doc (MPEG-1/2 alternating, optional ID3v2 tag with syncsafe
    length, per-frame padding bits), parse it back with the independent
    frame walker: bitrate / samplerate / channels / exact frame count /
    duration — the compressed-audio curation filter, no sample decode
    (huffman/IMDCT stays behind the decode_media vendor seam). Oracle =
    seed arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "mp3")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "audio/mpeg")
    return multimodal.mp3_meta(media)


@register(
    "multimodal_mp4_meta",
    oracle="""
SELECT doc_id AS media_id,
       ((doc_id % 90000 + 1) * 1000 // 600)::BIGINT AS duration_ms,
       600::INT AS timescale,
       (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END)::INT AS n_tracks,
       (doc_id % 1920 + 16)::INT AS width,
       (doc_id % 1080 + 16)::INT AS height,
       (CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END)::INT AS has_audio
FROM documents
""",
    survey_ids=("mm-decode",),
)
def multimodal_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4/ISO-BMFF container-metadata gate (r7): synthesize a valid box
    tree per doc (ftyp + moov with mvhd/trak/tkhd/mdhd/hdlr — versions 0/1
    alternate, box order varies, decoy udta boxes), parse it back with the
    independent box walker: duration, timescale, track count, 16.16
    fixed-point display dimensions, audio presence — the video curation
    filter that needs no sample decode (H.264 stays behind the
    decode_media vendor seam). Oracle = seed arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "mp4")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "video/mp4")
    return multimodal.mp4_meta(media)


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id AS media_id,
       unnest(range(0, (doc_id % 1200 + 1), 100))::BIGINT AS frame_idx
FROM documents
""",
    survey_ids=("mm-frames",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/sample-index sampling plan over REAL decoded WAV sample counts:
    pure sequence+explode downstream of the decode — no extra Python, no
    shuffle."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "wav")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "audio/wav")
    decoded = multimodal.decode_media(media)
    return multimodal.frame_sample(decoded, every_nth=100).select(
        "media_id", F.col("frame_idx").cast("bigint").alias("frame_idx")
    )


# =========================================================================
# Extended coverage: near-dup embeddings, winnowing, BPE-ish tokens, and the
# SQL-surface operators a reference user would expect the engine to keep
# (rollup, set ops, pivot, hopping/session windows, percentiles)
# =========================================================================

_EMB_COS_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
"""


@register("dedup_embedding_cosine", oracle=_EMB_COS_SQL, survey_ids=("dedup-embedding-cosine",))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.4 — the fixture corpus
    has no planted vector dups; the threshold is a parameter)."""
    return dedup.embedding_cosine_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


_WINNOW_SQL = f"""
WITH {_SHINGLE_CTE},
fp AS (SELECT doc_id, {md5_long_sql_duckdb('shingle', 12)} AS fp FROM sh)
SELECT DISTINCT doc_id, fp FROM fp WHERE fp % 8 = 0
"""


@register("text_winnow_fingerprints", oracle=_WINNOW_SQL, survey_ids=("text-fingerprint",))
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style (mod-sampled shingle-hash) fingerprint sets — the
    content-defined rolling-hash fingerprinting used for overlap detection."""
    return text.winnow_fingerprints(_t(spark, sf_dir, "documents"))


@register(
    "text_bpe_token_count",
    oracle=r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_tokens_bpe
FROM documents
""",
    survey_ids=("text-token-count",),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under a BPE-ish pre-tokenizer regex (letter runs,
    single digits, single punctuation)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.bpe_ish_token_count(F.col("text")).alias("n_tokens_bpe"))


def _bpe_merges_values_sql() -> str:
    from ..functions.bpe_merges import MERGES

    return ",".join(f"('{a}','{b}',{r})" for r, (a, b) in enumerate(MERGES))


def _text_bpe_exact_tokens_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT BPE token counts under the vendored frozen merge table
    (VERDICT r7 #7): the engine runs the merge loop per DISTINCT word in
    an Arrow batch (``text.bpe_exact_token_count``); the oracle replays
    the IDENTICAL segmentation spec — merge the first occurrence of the
    min-rank adjacent pair until fixpoint — as a DuckDB recursive CTE
    over token LISTS, one merge per recursion step, with the same frozen
    table inlined as VALUES. Different languages, data structures, and
    join shapes; same spec, hash-exact."""
    docs = _t(spark, sf_dir, "documents")
    return text.bpe_exact_token_count(docs)


register(
    "text_bpe_exact_tokens",
    oracle=r"""
WITH RECURSIVE
merges(a, b, rank) AS (VALUES __BPE_MERGES__),
toks AS (
  SELECT d.doc_id, t.tok
  FROM documents d,
       unnest(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS t(tok)
),
words AS (SELECT DISTINCT tok FROM toks),
bpe(tok, ts, done) AS (
  SELECT tok, list_transform(generate_series(1, length(tok)), i -> tok[i]), false FROM words
  UNION ALL
  SELECT tok,
         CASE WHEN bp IS NULL THEN ts
              ELSE ts[1:bp-1] || [ts[bp] || ts[bp+1]] || ts[bp+2:] END,
         bp IS NULL
  FROM (
    SELECT tok, ts,
           (SELECT j FROM unnest(generate_series(1, len(ts)-1)) AS g(j)
              JOIN merges m ON m.a = ts[j] AND m.b = ts[j+1]
              ORDER BY m.rank, j LIMIT 1) AS bp
    FROM bpe WHERE NOT done
  )
),
final AS (SELECT tok, len(ts) AS n FROM bpe WHERE done),
counts AS (
  SELECT t.doc_id, count(*) AS n_pre, sum(f.n) AS nb
  FROM toks t JOIN final f USING (tok) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(c.n_pre, 0)::INT AS n_pretokens,
       coalesce(c.nb, 0)::BIGINT AS n_tokens_bpe
FROM documents d LEFT JOIN counts c USING (doc_id)
""".replace("__BPE_MERGES__", _bpe_merges_values_sql()),
    survey_ids=("text-token-count",),
)(_text_bpe_exact_tokens_impl)


@register(
    "q_rollup",
    oracle="""
SELECT r.r_name, n.n_name, count(*) AS cust_ct
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    survey_ids=("A2",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (region -> nation -> grand total) — subtotal rows
    carry nulls; one pass, partial-agg'd like any groupBy."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("cust_ct"))
    )


@register(
    "q_set_ops",
    oracle="""
WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
SELECT 'union' AS op, count(*) AS user_ct FROM (SELECT user_id FROM p UNION SELECT user_id FROM c)
UNION ALL
SELECT 'intersect', count(*) FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM c)
UNION ALL
SELECT 'except', count(*) FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM c)
""",
    survey_ids=("R1",),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (union / intersect / except) over keyed user sets — the
    inverse of the reference's stream split (SURVEY §2.6)."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    c = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    parts = [
        p.union(c).distinct().agg(F.count(F.lit(1)).alias("user_ct")).select(F.lit("union").alias("op"), "user_ct"),
        p.intersect(c).agg(F.count(F.lit(1)).alias("user_ct")).select(F.lit("intersect").alias("op"), "user_ct"),
        p.exceptAll(c).distinct().agg(F.count(F.lit(1)).alias("user_ct")).select(F.lit("except").alias("op"), "user_ct"),
    ]
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out


@register(
    "q_hopping_window",
    oracle="""
WITH h AS (
  SELECT unnest([time_bucket(INTERVAL '5 seconds', ts),
                 time_bucket(INTERVAL '5 seconds', ts) - INTERVAL '5 seconds']) AS ws,
         value
  FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS stt,
       count(*) AS pv_ct, round(sum(value), 2) AS val_sum
FROM h GROUP BY ws
""",
    survey_ids=("A1", "W1"),
)
def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window — size 10 s, hop 5 s: each event lands in two
    overlapping windows (the reference never uses sliding windows; Spark's
    window(slideDuration) provides them natively, SURVEY §2.8 note)."""
    ev = _t(spark, sf_dir, "events")
    out = ev.groupBy(F.window("ts", "10 seconds", "5 seconds")).agg(
        F.count(F.lit(1)).alias("pv_ct"), F.round(F.sum("value"), 2).alias("val_sum")
    )
    return out.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"), "pv_ct", "val_sum"
    )


@register(
    "q_session_window",
    oracle="""
WITH s AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS st
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT user_id, ts,
         sum(st) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM g GROUP BY user_id, sid
""",
    survey_ids=("W3",),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min inactivity gap) via F.session_window —
    the windowed-aggregation form of sessionization (islands formulation is
    the oracle). A session closes when no event arrives within the gap."""
    ev = _t(spark, sf_dir, "events")
    out = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return out.select(
        "user_id",
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
    )


@register(
    "q_pivot_daily_types",
    oracle="""
SELECT ts::DATE AS cur_date,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view
FROM events GROUP BY 1
""",
    survey_ids=("A2",),
)
def q_pivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily counts per event type as columns (explicit value list so
    the plan is a single pass, no distinct-scan)."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy(F.to_date("ts").alias("cur_date")).pivot("event_type", types).count()
    return out.select("cur_date", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types])


@register(
    "q_percentiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95
FROM events GROUP BY 1
""",
    survey_ids=("A2",),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per key (both engines use the same
    (n-1)*p linear interpolation)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )


_COS_PAIR = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

_IVF_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cen AS (SELECT vec_id AS cid, v AS cv FROM e
        WHERE vec_id % (SELECT greatest(50, CAST(ceil(count(*) / 256.0) AS BIGINT)) FROM e) = 0),
asg AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT e.vec_id, cen.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_COS_PAIR.format(a='e.v', b='cen.cv')} DESC, cen.cid) AS rn
    FROM e CROSS JOIN cen
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
probes AS (
  SELECT query_id, cid AS cell FROM (
    SELECT q.query_id, cen.cid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_COS_PAIR.format(a='q.qv', b='cen.cv')} DESC, cen.cid) AS rn
    FROM q CROSS JOIN cen
  ) WHERE rn <= 4
),
s AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
         {_COS_PAIR.format(a='qe.v', b='ne.v')} AS sim
  FROM probes p
  JOIN asg a ON p.cell = a.cell
  JOIN e qe ON qe.vec_id = p.query_id
  JOIN e ne ON ne.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""


_ANN_RECALL_SQL = f"""
WITH bf AS ({_ANN_BRUTE_SQL}),
ivf AS ({_IVF_SQL})
SELECT count(*) AS n_truth,
       sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
       round(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS recall_at_5
FROM bf b LEFT JOIN ivf i
  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
"""


@register("ann_recall_report", oracle=_ANN_RECALL_SQL, survey_ids=("sim-ivf", "sim-brute-cosine"))
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation: recall@5 of the IVF index against the exact
    brute-force ground truth over the same query set — the measurement any
    ANN deployment runs before trusting an index (here on a sample; at
    corpus scale the query subset IS the sample). One left join of two
    (queries x k)-sized frames; the expensive sides are the index/truth
    computations themselves."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    truth = similarity.brute_force_topk(emb, q, k=5).select("query_id", "neighbor_id")
    approx = similarity.ivf_topk(emb, q, k=5, centroid_mod=50, nprobe=4).select(
        "query_id", F.col("neighbor_id").alias("hit_id")
    )
    joined = truth.join(
        approx,
        (truth["query_id"] == approx["query_id"]) & (truth["neighbor_id"] == approx["hit_id"]),
        "left",
    )
    hit = F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
    return joined.agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(hit).alias("n_hit"),
        F.round(F.sum(hit) / F.count(F.lit(1)), 6).alias("recall_at_5"),
    )


_IVF_CELL_STATS_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cen AS (SELECT vec_id AS cid, v AS cv FROM e
        WHERE vec_id % (SELECT greatest(50, CAST(ceil(count(*) / 256.0) AS BIGINT)) FROM e) = 0),
asg AS (
  SELECT vec_id, v, cid AS cell FROM (
    SELECT e.vec_id, e.v, cen.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {{cos}} DESC, cen.cid) AS rn
    FROM e CROSS JOIN cen
  ) WHERE rn = 1
),
sizes AS (SELECT cell, count(*) AS c, count(DISTINCT v) AS dr FROM asg GROUP BY 1)
SELECT count(*) AS n_cells, max(c) AS max_cell, max(dr) AS max_distinct_vecs
FROM sizes
""".format(cos=_COS_PAIR.format(a="e.v", b="cen.cv"))


@register(
    "dedup_semantic_cross_corpus",
    oracle="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ev AS (SELECT vec_id, v FROM e WHERE vec_id % 20 = 0),
tr AS (SELECT vec_id, v FROM e WHERE vec_id % 20 <> 0)
SELECT ev.vec_id AS eval_id, tr.vec_id AS train_id,
       round(list_dot_product(tr.v, ev.v)
             / (sqrt(list_dot_product(tr.v, tr.v)) * sqrt(list_dot_product(ev.v, ev.v))), 6)
         AS sim
FROM tr CROSS JOIN ev
WHERE round(list_dot_product(tr.v, ev.v)
            / (sqrt(list_dot_product(tr.v, tr.v)) * sqrt(list_dot_product(ev.v, ev.v))), 6) >= 0.4
""",
    survey_ids=("dedup-cross", "dedup-semantic"),
)
def dedup_semantic_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic train/eval contamination (r7): embedding-cosine pairs
    BETWEEN the eval slice (vec_id % 20 == 0) and the training rest,
    never within a side — the embedding twin of ``dedup_cross_corpus``.
    The small eval matrix broadcasts; the training corpus streams through
    one Arrow map pass (no shuffle of the big side, no self-join)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cross_corpus_semantic_pairs(
        emb.filter(F.col("vec_id") % 20 != 0),
        emb.filter(F.col("vec_id") % 20 == 0),
        threshold=0.4,
    )


@register("ann_ivf_cell_stats", oracle=_IVF_CELL_STATS_SQL, survey_ids=("sim-ivf",))
def ann_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The no-silent-degradation witness for the IVF family (r7; the ANN
    twin of the dedup bucket-stats entries): cell populations AND
    distinct-vector counts under the same assignment ``ann_ivf`` scores
    with. The scorers collapse byte-identical vectors, so the cost bound
    is ``max_distinct_vecs`` — a fat_cell flood moves only ``max_cell``
    (free), a heterogeneous hot cell moves ``max_distinct_vecs`` (the
    retrain signal). Hash-exact each round on the driver fixtures."""
    return similarity.ivf_cell_stats(_t(spark, sf_dir, "embeddings"))


@register("ann_ivf", oracle=_IVF_SQL, survey_ids=("sim-ivf",), bench=True)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: deterministic centroids (vec_id % mod_eff,
    where mod_eff = max(50, ceil(n/256)) caps the driver-side centroid
    collect at ~256 rows for ANY corpus size), nearest-centroid assignment
    map-side against broadcast centroids, queries probe 4 cells, exact
    cosine within probed cells only. Deterministic end to end, so unlike
    most ANN indexes it carries an exact SQL oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    return similarity.ivf_topk(emb, q, k=5, centroid_mod=50, nprobe=4)


_IVF_FILTERED_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
corp AS (SELECT vec_id, v FROM e WHERE label = 1),
cen AS (SELECT vec_id AS cid, v AS cv FROM corp
        WHERE vec_id % (SELECT greatest(10, CAST(ceil(count(*) / 256.0) AS BIGINT)) FROM corp) = 0),
asg AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT c.vec_id, cen.cid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_COS_PAIR.format(a='c.v', b='cen.cv')} DESC, cen.cid) AS rn
    FROM corp c CROSS JOIN cen
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
probes AS (
  SELECT query_id, cid AS cell FROM (
    SELECT q.query_id, cen.cid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_COS_PAIR.format(a='q.qv', b='cen.cv')} DESC, cen.cid) AS rn
    FROM q CROSS JOIN cen
  ) WHERE rn <= 4
),
s AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
         {_COS_PAIR.format(a='qe.v', b='ne.v')} AS sim
  FROM probes p
  JOIN asg a ON p.cell = a.cell
  JOIN e qe ON qe.vec_id = p.query_id
  JOIN e ne ON ne.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""


@register("ann_ivf_filtered", oracle=_IVF_FILTERED_SQL, survey_ids=("sim-ivf",))
def ann_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search (pre-filter strategy): top-5 among corpus
    vectors with ``label = 1`` only. The predicate is applied to the corpus
    BEFORE index assignment, so it pushes down to the parquet scan and the
    cells are built over exactly the eligible vectors — the approach that
    keeps recall guarantees intact (post-filtering top-k can return fewer
    than k survivors). Queries stay unfiltered."""
    emb = _t(spark, sf_dir, "embeddings")
    corp = emb.filter(F.col("label") == 1)
    q = emb.filter(F.col("vec_id") % 20 == 0)
    return similarity.ivf_topk(corp, q, k=5, centroid_mod=10, nprobe=4)


@register(
    "dwd_trade_order_detail",
    oracle="""
WITH od AS (
  SELECT l_orderkey * 10 + l_linenumber AS id, l_orderkey AS order_id,
         l_partkey AS sku_id, l_extendedprice AS split_total_amount
  FROM lineitem
),
oi AS (SELECT o_orderkey AS id, o_custkey AS user_id, o_orderpriority AS province_id FROM orders),
oda AS (SELECT l_orderkey * 10 + l_linenumber AS order_detail_id,
               l_partkey % 10 AS activity_id
        FROM lineitem WHERE (l_orderkey + l_linenumber) % 5 = 0),
odc AS (SELECT l_orderkey * 10 + l_linenumber AS order_detail_id,
               l_suppkey % 4 AS coupon_id
        FROM lineitem WHERE (l_orderkey + l_linenumber) % 7 = 0)
SELECT od.id, od.order_id, oi.user_id, oi.province_id, od.sku_id,
       od.split_total_amount, oda.activity_id, odc.coupon_id
FROM od
JOIN oi ON od.order_id = oi.id
LEFT JOIN oda ON od.id = oda.order_detail_id
LEFT JOIN odc ON od.id = odc.order_detail_id
""",
    survey_ids=("J1", "J2", "P4", "K3"),
    bench=True,
)
def dwd_trade_order_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship DWD SQL app (DwdTradeOrderDetail.java:99-102): order
    detail INNER JOIN order info + LEFT JOIN activity + LEFT JOIN coupon.
    Flink runs this as three stateful stream joins with 5 s idle-state TTL
    and emits retractions; here the same logical plan is two broadcast-able
    left joins after one keyed shuffle, and the downstream keyed upsert (K3)
    sees identical final rows. Activity/coupon sides are synthesized CDC
    projections of lineitem (the fixture has no separate tables)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    od = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("sku_id"),
        F.col("l_extendedprice").alias("split_total_amount"),
    )
    oi = o.select(
        F.col("o_orderkey").alias("oi_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderpriority").alias("province_id"),
    )
    oda = (
        li.filter((F.col("l_orderkey") + F.col("l_linenumber")) % 5 == 0)
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("order_detail_id"),
            (F.col("l_partkey") % 10).alias("activity_id"),
        )
    )
    odc = (
        li.filter((F.col("l_orderkey") + F.col("l_linenumber")) % 7 == 0)
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("odc_id"),
            (F.col("l_suppkey") % 4).alias("coupon_id"),
        )
    )
    return (
        od.join(oi, od["order_id"] == oi["oi_id"])
        .join(oda, od["id"] == oda["order_detail_id"], "left")
        .join(odc, od["id"] == odc["odc_id"], "left")
        .select(
            "id", "order_id", "user_id", "province_id", "sku_id",
            "split_total_amount", "activity_id", "coupon_id",
        )
    )


@register(
    "dws_home_detail_uv",
    oracle="""
SELECT ts::DATE AS cur_date,
       count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS home_uv_ct,
       count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS good_detail_uv_ct
FROM events
WHERE event_type IN ('view', 'click')
GROUP BY 1
""",
    survey_ids=("A3", "W3", "P3"),
)
def dws_home_detail_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The home/good_detail per-page daily-UV app
    (DwsTrafficHomeDetailPageViewWindow.java:71-163: page-id whitelist + two
    per-mid ValueStates): page whitelist filter, per-page exact daily UV —
    conditional distinct counts in one pass."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("view", "click"))
    return ev.groupBy(F.to_date("ts").alias("cur_date")).agg(
        F.count_distinct(F.when(F.col("event_type") == "view", F.col("user_id"))).alias("home_uv_ct"),
        F.count_distinct(F.when(F.col("event_type") == "click", F.col("user_id"))).alias("good_detail_uv_ct"),
    )


@register(
    "q5_region_volume",
    oracle="""
SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
""",
    survey_ids=("J1", "J4"),
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped local-supplier volume: 6-way join with a selective dim
    filter — Catalyst pushes r_name into the region scan and broadcasts the
    dim chain; only orders-lineitem exchanges on the fact key."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"]) & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q17_small_quantity",
    oracle="""
SELECT l.l_partkey, round(sum(l.l_extendedprice), 2) AS small_qty_revenue
FROM lineitem l
WHERE l.l_quantity < (
  SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
GROUP BY 1
""",
    survey_ids=("J1", "A2"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped correlated scalar subquery (below-half-average
    quantity), expressed via spark.sql so Catalyst's decorrelation rewrites
    it into an aggregate + join — the optimizer path the reference never had."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT l.l_partkey, round(sum(l.l_extendedprice), 2) AS small_qty_revenue
        FROM v_lineitem l
        WHERE l.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM v_lineitem l2 WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY l.l_partkey
        """
    )


@register(
    "q10_returned_revenue",
    oracle="""
SELECT c.c_custkey, n.n_name,
       round(sum(round(l.l_extendedprice * (1 - l.l_discount), 6)::DECIMAL(28, 6)), 2)::DOUBLE
         AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    survey_ids=("J1", "A2"),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped: top-20 customers by returned-item revenue — a
    4-way join where the returnflag filter pushes into the lineitem scan,
    nation broadcasts, and the final top-20 plans as TakeOrderedAndProject
    (no global sort materializes). Revenue ties break by custkey so the
    LIMIT is deterministic. Per-row products are summed in DECIMAL (the
    q_salted_agg pattern) so the aggregate is partial-order invariant — a
    double sum could flip a rounded cent and change LIMIT-20 membership.

    Scale shape (VERDICT r4 #3): revenue is pre-aggregated per
    ``l_orderkey`` BEFORE the orders join, so the widest shuffle carries
    distinct returned-order keys (~one row per order) instead of every
    R-flagged line item (~25% of lineitem) — sum is additive over the
    final (custkey, n_name) grouping and the per-row rounding happens
    before either sum, so the rewrite is bit-identical."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).cast("decimal(28,6)")
    pre = li.groupBy("l_orderkey").agg(F.sum(rev).alias("_rev"))
    return (
        pre.join(o, pre["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "n_name")
        .agg(F.round(F.sum("_rev"), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_volume",
    oracle="""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 180
)
SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       round(b.qty, 2) AS total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    survey_ids=("J1", "A2"),
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: large-volume orders (lineitem quantity sum above
    threshold) joined back through orders to the customer — the
    aggregate-then-join composition where the HAVING shrinks the probe side
    to a sliver before any wide row is assembled."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 180)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("_qty"), 2).alias("total_qty"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT order_ct, count(*) AS cust_ct
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS order_ct
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
GROUP BY 1
""",
    survey_ids=("J2", "A2"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped two-level aggregate: orders-per-customer via left
    join (zero-order customers kept — count(col) skips the nulls the outer
    join manufactures), then the distribution of those counts. The first
    aggregate rides the join's hash shuffle on custkey; the second is a
    near-trivial shuffle of |distinct counts| rows."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_ct"))
    )
    return per_cust.groupBy("order_ct").agg(F.count(F.lit(1)).alias("cust_ct"))


@register(
    "q_having_big_orders",
    oracle="""
SELECT l_orderkey, count(*) AS li_ct, round(sum(l_quantity), 2) AS qty_sum
FROM lineitem
GROUP BY 1
HAVING count(*) >= 6 AND sum(l_quantity) > 150
""",
    survey_ids=("A2",),
)
def q_having_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING) — filter over aggregates, pushed
    nowhere (semantically), evaluated after partial+final agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("li_ct"),
            F.sum("l_quantity").alias("_qs"),  # HAVING filters the raw sum
        )
        .filter((F.col("li_ct") >= 6) & (F.col("_qs") > 150))
        .select("l_orderkey", "li_ct", F.round(F.col("_qs"), 2).alias("qty_sum"))
    )


@register(
    "dws_keyword_window",
    oracle="""
WITH k AS (
  SELECT ts, 'kw_' || json_extract_string(props, '$.k') AS keyword
  FROM events WHERE event_type = 'view'
),
b AS (
  SELECT time_bucket(INTERVAL '10 seconds', ts) AS w, keyword, count(*) AS keyword_count
  FROM k GROUP BY 1, 2
)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt,
       strftime(w + INTERVAL '10 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
       strftime(w, '%Y-%m-%d') AS cur_date,
       keyword, keyword_count
FROM b
""",
    survey_ids=("A1", "J6", "F13", "P3", "W1"),
)
def dws_keyword_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The traffic-keyword DWS app end to end
    (DwsTrafficSourceKeywordPageViewWindow.java:61-90: search-page filter ->
    keyword extraction/tokenize -> 10 s tumbling window count with stt/edt/
    cur_date): SURVEY §7.2's minimum end-to-end slice, as one query."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    kw = ev.select(
        "ts", F.concat(F.lit("kw_"), json_get(F.col("props"), "k")).alias("keyword")
    )
    return tumble(
        kw, "ts", keys=["keyword"], aggs=[F.count(F.lit(1)).alias("keyword_count")]
    )


@register("q_approx_aggregates", oracle=None, survey_ids=("A4",))
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the relaxation path SURVEY §2.5 notes the
    reference never takes (its UVs are exact): HLL distinct + quantile
    sketches per event_type. Sketch internals differ per engine, so this is
    a rows-only check; the exact twins (dws_daily_uv, q_percentiles) are the
    hash-checked versions."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("uv_approx"),
        F.percentile_approx("value", 0.5).alias("p50_approx"),
    )


@register(
    "text_repetition",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
t AS (SELECT doc_id, unnest(t) AS tok FROM toks),
tc AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
ts AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot, count(*) AS dct FROM tc GROUP BY 1),
bt AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bg
  FROM toks WHERE len(t) >= 2
),
bc AS (SELECT doc_id, bg, count(*) AS c FROM bt GROUP BY 1, 2),
bs AS (SELECT doc_id, max(c) AS bmx, sum(c) AS btot FROM bc GROUP BY 1)
SELECT ts.doc_id,
       round(ts.mx::DOUBLE / ts.tot, 6) AS top_token_ratio,
       round(coalesce(bs.bmx::DOUBLE / bs.btot, 0.0), 6) AS top_bigram_ratio,
       round(ts.dct::DOUBLE / ts.tot, 6) AS distinct_token_ratio
FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
""",
    survey_ids=("text-quality",),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition metrics (top-token / top-bigram coverage, distinct-token
    ratio) — the boilerplate/degeneracy filters of quality pipelines."""
    return text.repetition_features(_t(spark, sf_dir, "documents"))


@register(
    "text_pii_scrub",
    oracle="""
WITH synth AS (
  SELECT c_custkey AS doc_id,
         'reach ' || lower(replace(c_name, ' ', '.')) || '@example.com or +1 '
           || (c_custkey * 7919)::VARCHAR || ' ref ' || (c_custkey + 100000)::VARCHAR AS text
  FROM customer
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>', 'g'),
         '[0-9]{5,}', '<NUM>', 'g') AS scrubbed
FROM synth
""",
    survey_ids=("text-quality",),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: synthesize contact lines from customers, replace
    email/phone/long-number substrings with typed placeholders — pure
    codegen'd regexp_replace chain, shuffle-free."""
    c = _t(spark, sf_dir, "customer")
    synth = c.select(
        F.col("c_custkey").alias("doc_id"),
        F.concat(
            F.lit("reach "),
            F.lower(F.replace(F.col("c_name"), F.lit(" "), F.lit("."))),
            F.lit("@example.com or +1 "),
            (F.col("c_custkey") * 7919).cast("string"),
            F.lit(" ref "),
            (F.col("c_custkey") + 100000).cast("string"),
        ).alias("text"),
    )
    return synth.select("doc_id", text.scrub_pii(F.col("text")).alias("scrubbed"))


@register(
    "dwd_dynamic_fact_routing",
    oracle="""
SELECT cfg.sink_table, count(*) AS record_ct
FROM (
  SELECT 'order_info' AS src_table,
         CASE WHEN o_orderkey % 3 = 0 THEN 'update' ELSE 'insert' END AS src_type
  FROM orders
) e
JOIN (VALUES
  ('order_info', 'insert', 'dwd_trade_order_add'),
  ('order_info', 'update', 'dwd_trade_order_change')
) cfg(source_table, source_type, sink_table)
  ON e.src_table = cfg.source_table AND e.src_type = cfg.source_type
GROUP BY 1
""",
    survey_ids=("J5", "R3", "K2"),
)
def dwd_dynamic_fact_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DwdBaseDb's dynamic fact routing (DwdBaseDb.java:100-145): the config
    key is (source_table, source_type) — e.g. the same table's inserts and
    updates land in different sink topics. Broadcast two-key config join;
    the sink_table column then drives the dynamic sink (K2/R3)."""
    o = _t(spark, sf_dir, "orders")
    facts = o.select(
        F.lit("order_info").alias("src_table"),
        F.when(F.col("o_orderkey") % 3 == 0, "update").otherwise("insert").alias("src_type"),
    )
    cfg = spark.createDataFrame(
        [
            ("order_info", "insert", "dwd_trade_order_add"),
            ("order_info", "update", "dwd_trade_order_change"),
        ],
        "source_table string, source_type string, sink_table string",
    )
    routed = facts.join(
        F.broadcast(cfg),
        (facts["src_table"] == cfg["source_table"]) & (facts["src_type"] == cfg["source_type"]),
    )
    return routed.groupBy("sink_table").agg(F.count(F.lit(1)).alias("record_ct"))


_CLUSTER_SQL = f"""
WITH {_SHINGLE_CTE},
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
  WHERE round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) >= 0.35
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT d.doc_id,
       least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
GROUP BY d.doc_id
"""


@register("dedup_clusters", oracle="WITH RECURSIVE " + _CLUSTER_SQL.strip().removeprefix("WITH "), survey_ids=("dedup-minhash-lsh",))
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: connected components over the verified
    MinHash-LSH pair graph via iterative distributed label propagation (the
    'iterative algorithm' class of ops); oracle is a recursive-CTE closure.
    Keep-policy: doc survives iff doc_id == cluster_id."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.35)
    return dedup.dedup_clusters(docs, pairs)


@register(
    "dedup_keep_policy",
    oracle=(
        "SELECT sum(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END)::BIGINT AS kept_ct,\n"
        "       sum(CASE WHEN doc_id = cluster_id THEN 0 ELSE 1 END)::BIGINT AS dropped_ct\n"
        "FROM (WITH RECURSIVE " + _CLUSTER_SQL.strip().removeprefix("WITH ") + ")"
    ),
    survey_ids=("dedup-minhash-lsh",),
)
def dedup_keep_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end of the dedup pipeline a user actually runs: apply the
    keep-one-per-cluster policy (survivor = cluster's smallest doc_id) and
    report how much of the corpus survives. Composes the full chain —
    doc-local MinHash pass -> LSH candidates -> exact verify -> connected
    components -> policy filter — into the number pair the curation job
    logs."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.35)
    clusters = dedup.dedup_clusters(docs, pairs)
    keep = F.when(F.col("doc_id") == F.col("cluster_id"), 1).otherwise(0)
    return clusters.agg(
        F.sum(keep).alias("kept_ct"),
        F.sum(1 - keep).alias("dropped_ct"),
    )


@register(
    "dedup_lsh_incremental",
    oracle="SELECT * FROM (" + _JACCARD_SQL + ") WHERE id_a % 10 < 2 OR id_b % 10 < 2",
    survey_ids=("dedup-minhash-lsh",),
)
def dedup_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of an ingestion batch (docs with doc_id % 10 < 2
    playing "today's crawl") against the already-indexed corpus: per-batch
    work is O(batch + collisions), the indexed text is never re-read, and
    the output is exactly the full-corpus pair set restricted to pairs
    touching the batch — which is what the oracle checks."""
    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 10 < 2)
    idx = dedup.minhash_index(docs.filter(F.col("doc_id") % 10 >= 2))
    return dedup.minhash_lsh_pairs_incremental(new, idx, threshold=0.35)


@register(
    "dedup_span_exact",
    oracle="""
WITH d AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
dn AS (SELECT doc_id, t, len(t) AS n FROM d),
posn AS (SELECT doc_id, n, t, unnest(range(1, n + 1)) AS pos FROM dn),
toks AS (SELECT doc_id, pos, t[pos] AS tok FROM posn),
grams AS (
  SELECT doc_id, pos,
         (('0x' || substr(md5(array_to_string(list_slice(t, pos, pos + 7), ' ')), 1, 15))::BIGINT) AS g
  FROM posn WHERE pos + 7 <= n
),
firsts AS (SELECT g, min(doc_id) AS fdoc FROM grams GROUP BY 1),
fpos AS (
  SELECT gr.g, f.fdoc, min(gr.pos) AS fp
  FROM grams gr JOIN firsts f ON gr.g = f.g AND gr.doc_id = f.fdoc
  GROUP BY 1, 2
),
dups AS (
  SELECT gr.doc_id, gr.pos
  FROM grams gr JOIN fpos f ON gr.g = f.g
  WHERE gr.doc_id <> f.fdoc OR gr.pos <> f.fp
),
cov0 AS (SELECT doc_id, unnest(range(pos, pos + 8)) AS cpos FROM dups),
cov AS (SELECT DISTINCT doc_id, cpos FROM cov0),
kept AS (
  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text, count(*) AS kept_ct
  FROM toks t
  WHERE NOT EXISTS (SELECT 1 FROM cov c WHERE c.doc_id = t.doc_id AND c.cpos = t.pos)
  GROUP BY 1
)
SELECT dn.doc_id, coalesce(k.clean_text, '') AS clean_text,
       (dn.n - coalesce(k.kept_ct, 0))::BIGINT AS removed_tokens
FROM dn LEFT JOIN kept k ON dn.doc_id = k.doc_id
""",
    survey_ids=("dedup-span",),
)
def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span (word-8-gram) removal: boilerplate repeated
    across documents is deleted from every copy except its first corpus-wide
    occurrence — the substring-level dedup that document-level near-dup
    passes can't express. Gram election and join both key on a 60-bit gram
    hash; see ``dedup.duplicate_span_removal`` for the shuffle story."""
    return dedup.duplicate_span_removal(_t(spark, sf_dir, "documents"), width=8)


@register(
    "dedup_keep_best",
    oracle=(
        """
SELECT cluster_id, keep_id, keep_n_chars FROM (
  SELECT c.cluster_id, c.doc_id AS keep_id, d.n_chars AS keep_n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id) AS rn
  FROM (WITH RECURSIVE """
        + _CLUSTER_SQL.strip().removeprefix("WITH ")
        + """) c
  JOIN documents d ON d.doc_id = c.doc_id
) WHERE rn = 1
"""
    ),
    survey_ids=("dedup-minhash-lsh",),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST-per-cluster: real curation keeps the highest-quality
    member of each near-dup cluster, not the smallest id — here the
    longest document (n_chars, id tie-break). Composes the full chain
    (MinHash pass -> LSH candidates -> exact verify -> connected
    components) with a per-cluster arg-max, which plans as
    WindowGroupLimit on the cluster key. Output: one row per cluster
    (cluster_id, keep_id, keep_n_chars)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.35)
    clusters = dedup.dedup_clusters(docs, pairs)
    w = Window.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("keep_id"), F.col("n_chars").alias("keep_n_chars"))
    )


@register(
    "dws_traffic_vc_ch_ar_isnew",
    oracle="""
WITH e AS (
  SELECT user_id, ts, value,
         'v' || (user_id % 3)::VARCHAR AS vc,
         CASE user_id % 4 WHEN 0 THEN 'appstore' WHEN 1 THEN 'xiaomi'
                          WHEN 2 THEN 'huawei' ELSE 'web' END AS ch,
         (110000 + user_id % 5)::VARCHAR AS ar,
         floor(value * 100)::BIGINT AS dur
  FROM events
),
f AS (
  SELECT *,
         CASE WHEN ts::DATE = min(ts::DATE) OVER (PARTITION BY user_id)
              THEN '1' ELSE '0' END AS is_new,
         CASE WHEN row_number() OVER (PARTITION BY user_id, ts::DATE ORDER BY ts) = 1
              THEN 1 ELSE 0 END AS uv,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS sv
  FROM e
),
b AS (
  SELECT time_bucket(INTERVAL '10 seconds', ts) AS w, vc, ch, ar, is_new,
         sum(uv)::BIGINT AS uv_ct, sum(sv)::BIGINT AS sv_ct,
         count(*) AS pv_ct, sum(dur)::BIGINT AS dur_sum
  FROM f GROUP BY 1, 2, 3, 4, 5
)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt,
       strftime(w + INTERVAL '10 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
       strftime(w, '%Y-%m-%d') AS cur_date,
       vc, ch, ar, is_new, uv_ct, sv_ct, pv_ct, dur_sum
FROM b
""",
    survey_ids=("A2", "W2", "W3", "F9"),
    bench=True,
)
def dws_traffic_vc_ch_ar_isnew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's richest DWS table
    (DwsTrafficVcChArIsNewPageViewWindow.java:70-189): version/channel/area/
    is_new keyed 10 s windows carrying uv_ct (daily-first flag, W3), sv_ct
    (session starts), pv_ct and dur_sum — three keyed-state operators feeding
    one keyed window reduce, all in a single declarative plan: the analytic
    windows share one shuffle on user_id, then the tumble aggregates.

    Dimensions vc/ch/ar are deterministic functions of user_id (the fixture
    stream carries no device metadata); is_new via first-seen repair (W2)."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "ts", "value",
        F.concat(F.lit("v"), (F.col("user_id") % 3)).alias("vc"),
        F.element_at(
            F.array(F.lit("appstore"), F.lit("xiaomi"), F.lit("huawei"), F.lit("web")),
            (F.col("user_id") % 4 + 1).cast("int"),
        ).alias("ch"),
        (F.lit(110000) + F.col("user_id") % 5).cast("string").alias("ar"),
        (F.col("value") * 100).cast("long").alias("dur"),
    )
    # All three stateful flags share ONE window spec — partitioned by
    # user_id, ordered by ts: is_new's first-ever date is the date of the
    # cumulative-first row (same value as min(date) over the partition, but
    # an unordered min would plan a SECOND sort node), uv's first-of-day is
    # "previous event was an earlier day", sv is the 30-min gap. Catalyst
    # plans one shuffle + one sort for the whole repair stage.
    w_seq = Window.partitionBy("user_id").orderBy("ts")
    w_cum = w_seq.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("ts").over(w_seq)
    f = e.select(
        "*",
        F.when(F.to_date("ts") == F.first(F.to_date("ts")).over(w_cum), "1").otherwise("0").alias("is_new"),
        F.when(prev.isNull() | (F.to_date(prev) < F.to_date("ts")), 1).otherwise(0).alias("uv"),
        F.when(
            prev.isNull()
            | (F.col("ts").cast("timestamp").cast("double") - prev.cast("timestamp").cast("double") > 1800),
            1,
        ).otherwise(0).alias("sv"),
    )
    return tumble(
        f,
        "ts",
        keys=["vc", "ch", "ar", "is_new"],
        aggs=[
            F.sum("uv").alias("uv_ct"),
            F.sum("sv").alias("sv_ct"),
            F.count(F.lit(1)).alias("pv_ct"),
            F.sum("dur").alias("dur_sum"),
        ],
    )


@register(
    "dwd_trade_cart_add",
    oracle="""
WITH cdc AS (
  SELECT l_orderkey * 10 + l_linenumber AS id,
         CASE WHEN l_linenumber % 3 = 0 THEN 'update' ELSE 'insert' END AS type,
         l_quantity::BIGINT AS new_num,
         CASE WHEN l_linenumber % 3 = 0 AND l_orderkey % 2 = 0
              THEN l_quantity::BIGINT - 2 END AS old_num
  FROM lineitem
)
SELECT id,
       CASE WHEN type = 'insert' THEN new_num ELSE new_num - old_num END AS sku_num
FROM cdc
WHERE type = 'insert'
   OR (type = 'update' AND old_num IS NOT NULL AND new_num > old_num)
""",
    survey_ids=("P5", "P4", "F6", "F7"),
)
def dwd_trade_cart_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cart-add DWD app's update-delta predicate (DwdTradeCartAdd.java:
    57-78): keep inserts, and updates only when sku_num increased; emitted
    quantity is the full count on insert, the delta on update (the IF(...)
    at :64). CDC rows synthesized from lineitem with an ``old`` map."""
    from ..operators.etl import update_delta_predicate

    li = _t(spark, sf_dir, "lineitem")
    cdc = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.when(F.col("l_linenumber") % 3 == 0, "update").otherwise("insert").alias("type"),
        F.create_map(F.lit("sku_num"), F.col("l_quantity").cast("long").cast("string")).alias("data"),
        F.when(
            (F.col("l_linenumber") % 3 == 0) & (F.col("l_orderkey") % 2 == 0),
            F.create_map(F.lit("sku_num"), (F.col("l_quantity").cast("long") - 2).cast("string")),
        ).alias("old"),
    )
    kept = cdc.filter(update_delta_predicate("sku_num", new_gt_old=True))
    return kept.select(
        "id",
        F.when(
            F.col("type") == "insert", F.col("data")["sku_num"].cast("bigint")
        ).otherwise(
            F.col("data")["sku_num"].cast("bigint") - F.col("old")["sku_num"].cast("bigint")
        ).alias("sku_num"),
    )


@register(
    "q_order_limit",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    survey_ids=("A2",),
)
def q_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (TakeOrderedAndProject — per-partition top-N then
    merge on the driver, never a full global sort)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "scalar_string_project",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS uname,
       substr(c_name, 1, 8) AS prefix8,
       length(c_name) AS name_len,
       CASE WHEN c_name LIKE '%001%' THEN 1 ELSE 0 END AS has_001,
       strpos(c_name, '#') AS hash_pos,
       replace(c_mktsegment, 'A', '_') AS seg_repl,
       lpad(c_custkey::VARCHAR, 8, '0') AS padded_id,
       reverse(c_mktsegment) AS seg_rev,
       split_part(c_name, '#', 2) AS name_num
FROM customer
""",
    survey_ids=("F6", "F9"),
)
def scalar_string_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (upper/substr/length/like/instr/replace/
    lpad/reverse/split_part) — all codegen'd, shuffle-free."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.length("c_name").alias("name_len"),
        F.when(F.col("c_name").like("%001%"), 1).otherwise(0).alias("has_001"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.replace(F.col("c_mktsegment"), F.lit("A"), F.lit("_")).alias("seg_repl"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_id"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
    )


@register(
    "q_null_semantics",
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS maybe_price,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS maybe_prio
  FROM orders
)
SELECT o_orderkey,
       coalesce(maybe_price, -1.0) AS price_or_default,
       CASE WHEN maybe_price IS NULL THEN 'missing' ELSE 'present' END AS price_state,
       nullif(maybe_prio, '1-URGENT') AS prio_no_urgent,
       (maybe_prio IS NOT DISTINCT FROM NULL)::INT AS prio_null_safe_eq
FROM t
""",
    survey_ids=("P1", "F7"),
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: coalesce / nullif / null-safe equality — the
    defensive-null patterns the reference hand-codes around fastjson
    (DwdBaseLog.java:226-233)."""
    o = _t(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, None).otherwise(F.col("o_totalprice")).alias("maybe_price"),
        F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("o_orderpriority")).alias("maybe_prio"),
    )
    return t.select(
        "o_orderkey",
        F.coalesce(F.col("maybe_price"), F.lit(-1.0)).alias("price_or_default"),
        F.when(F.col("maybe_price").isNull(), "missing").otherwise("present").alias("price_state"),
        F.nullif(F.col("maybe_prio"), F.lit("1-URGENT")).alias("prio_no_urgent"),
        F.col("maybe_prio").eqNullSafe(F.lit(None).cast("string")).cast("int").alias("prio_null_safe_eq"),
    )


@register(
    "q_range_bucket_join",
    oracle="""
WITH f AS (
  SELECT date_diff('day', DATE '2024-01-01', ts::DATE) AS d, value FROM events
),
p(promo_id, lo, hi) AS (
  VALUES (1, 0, 10), (2, 5, 15), (3, 7, 8), (4, 12, 30),
         (5, 0, 30), (6, 20, 25), (7, 18, 28), (8, 3, 4)
)
SELECT promo_id, count(*) AS ev_ct,
       round(sum(round(value, 6)::DECIMAL(28, 6)), 2)::DOUBLE AS val_sum
FROM f JOIN p ON f.d >= p.lo AND f.d < p.hi
GROUP BY 1
""",
    survey_ids=("J3",),
)
def q_range_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join against OVERLAPPING promo windows via the
    band-join decomposition (``joins.range_bucket_join``): without it Spark
    plans a nested-loop join (no equality conjunct); with it the plan is a
    bucket equi-join + exact re-check. DECIMAL partial sums keep the
    per-promo value total order-invariant."""
    from ..operators.joins import range_bucket_join

    ev = _t(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("d"),
        F.round(F.col("value"), 6).cast("decimal(28,6)").alias("value"),
    )
    promos = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 15), (3, 7, 8), (4, 12, 30),
         (5, 0, 30), (6, 20, 25), (7, 18, 28), (8, 3, 4)],
        "promo_id int, lo int, hi int",
    )
    joined = range_bucket_join(ev, promos, "d", "lo", "hi", bucket_width=7)
    return joined.groupBy("promo_id").agg(
        F.count(F.lit(1)).alias("ev_ct"),
        F.round(F.sum("value"), 2).cast("double").alias("val_sum"),
    )


@register(
    "q_salted_agg",
    oracle="""
SELECT event_type, count(*) AS ev_ct,
       round(sum(round(value, 6)::DECIMAL(28, 6)), 2)::DOUBLE AS val_sum
FROM events GROUP BY 1
""",
    survey_ids=("skew-tools",),
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-grouping-key mitigation: events has only a handful of event_type
    values, the classic shape where ONE reducer per key absorbs the whole
    table. The salted two-phase aggregate spreads each hot key over 16
    reducers and merges partials. Partial sums run in DECIMAL so the result
    is exactly salt-order-invariant (double addition is not associative, and
    the salted merge order necessarily differs from the oracle's plain
    GROUP BY order)."""
    from ..operators.skew import salted_aggregate

    dec = F.round(F.col("value"), 6).cast("decimal(28,6)")
    ev = _t(spark, sf_dir, "events").withColumn("value", dec)
    return salted_aggregate(
        ev,
        ["event_type"],
        phase1=[F.count(F.lit(1)).alias("_c"), F.sum("value").alias("_s")],
        phase2=[
            F.sum("_c").alias("ev_ct"),
            F.round(F.sum("_s"), 2).cast("double").alias("val_sum"),
        ],
    ).select("event_type", "ev_ct", "val_sum")


@register(
    "q_salted_join",
    oracle="""
SELECT tier, count(*) AS ev_ct
FROM events e
JOIN (VALUES ('view', 'free'), ('click', 'free'), ('signup', 'free'),
             ('purchase', 'paid'), ('error', 'ops')) t(event_type, tier)
  ON e.event_type = t.event_type
GROUP BY 1
""",
    survey_ids=("skew-tools",),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-equi-join mitigation: every events row carries one of five
    event_type values, so an unsalted shuffle join lands each key on a
    single task. The salted form replicates the 5-row dim across 8 salts
    and joins on (key, salt) — each hot key fans over 8 tasks. Join output
    is aggregated per tier; salt-invariant, so the oracle is the plain
    join + GROUP BY."""
    from ..operators.skew import salted_join_hint

    ev = _t(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("view", "free"), ("click", "free"), ("signup", "free"),
         ("purchase", "paid"), ("error", "ops")],
        "event_type string, tier string",
    )
    joined = salted_join_hint(ev, tiers, "event_type", salt_buckets=8)
    return joined.groupBy("tier").agg(F.count(F.lit(1)).alias("ev_ct"))


@register(
    "q_cube_counts",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS order_ct
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    survey_ids=("A2",),
)
def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations (status x priority, each alone,
    grand total) in one pass."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("order_ct"))


@register(
    "q_rolling_avg",
    oracle="""
WITH daily AS (
  SELECT o_orderdate::DATE AS d, round(sum(o_totalprice), 2) AS rev
  FROM orders GROUP BY 1
)
SELECT d, rev,
       round(avg(rev) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS rev_7d_avg
FROM daily
""",
    survey_ids=("A2",),
)
def q_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAMES: 7-day moving average over daily revenue (rows-based
    frame) — the analytic-frame surface the reference lacks entirely."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select("d", "rev", F.round(F.avg("rev").over(w), 4).alias("rev_7d_avg"))


@register(
    "text_token_rarity",
    oracle="""
WITH toks AS (
  SELECT DISTINCT d.doc_id, t.tok
  FROM documents d,
       unnest(list_filter(regexp_split_to_array(trim(d.text), '\\s+'), x -> x <> '')) AS t(tok)
),
dfreq AS (SELECT tok, count(*) AS df FROM toks GROUP BY 1)
SELECT t.doc_id, count(*) AS n_distinct_tokens,
       min(f.df) AS min_df,
       round(quantile_cont(f.df, 0.5), 1) AS median_df
FROM toks t JOIN dfreq f ON t.tok = f.tok
GROUP BY 1
""",
    survey_ids=("text-rarity",),
)
def text_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token-rarity profile (min / median corpus document
    frequency) — the deterministic integer-space stand-in for an n-gram-LM
    surprisal filter; see ``text.token_rarity``."""
    return text.token_rarity(_t(spark, sf_dir, "documents"))


@register(
    "q_window_funcs",
    oracle="""
SELECT event_id, event_type,
       lag(event_id) OVER w AS prev_id,
       lead(event_id, 1, -1) OVER w AS next_id_or_default,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM events
WHERE event_type IN ('purchase', 'signup')
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
""",
    survey_ids=("A2",),
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-function surface — lag/lead (with default), ntile,
    percent_rank, cume_dist — WITHOUT the raw ``PARTITION BY event_type``
    window whose parallelism is capped at n_types at any scale (VERDICT r8
    #1, the last raw per-key-window plan): lag/lead come from
    skew.two_phase_shift and ntile/percent_rank/cume_dist are pure
    arithmetic on (skew.two_phase_rank, per-key count). The (ts, event_id)
    order is total (no ties), so percent_rank = (rank-1)/(n-1), cume_dist
    = rank/n, and ntile(k) follows Spark's size rule — the first n%k tiles
    hold n÷k+1 rows — in exact integer ``div`` arithmetic. mode="auto"
    resolves to the plain window at fixture scale and to hourly-bucketed
    decomposition past the safety bound, where a hot type's sort spreads
    over its time buckets instead of one task."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    base = ev.select("event_id", "event_type", "ts")
    shifted = skew.two_phase_shift(
        base,
        key="event_type",
        order_by=["ts", "event_id"],
        value_cols=["event_id"],
        bucket=skew.hour_bucket("ts"),
        direction="lag",
        suffix="_prev",
        mode="auto",
    )
    shifted = skew.two_phase_shift(
        shifted,
        key="event_type",
        order_by=["ts", "event_id"],
        value_cols=["event_id"],
        bucket=skew.hour_bucket("ts"),
        direction="lead",
        suffix="_next",
        mode="auto",
    )
    with_o = shifted.withColumn(
        "_o", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    ranked = skew.two_phase_rank(
        with_o,
        "event_type",
        "_o",
        "event_id",
        bucket_width=3_600_000_000,
        rank_col="_r",
        mode="auto",
    )
    n = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.join(F.broadcast(n), "event_type")
        .select(
            "event_id",
            "event_type",
            F.col("event_id_prev").alias("prev_id"),
            F.coalesce(F.col("event_id_next"), F.lit(-1)).alias(
                "next_id_or_default"
            ),
            F.expr(
                "CASE WHEN _r <= (_n % 4) * ((_n div 4) + 1)"
                " THEN (_r + (_n div 4)) div ((_n div 4) + 1)"
                " ELSE (_n % 4)"
                "  + (_r - (_n % 4) * ((_n div 4) + 1) + (_n div 4) - 1)"
                "    div (_n div 4)"
                " END"
            ).cast("int").alias("quartile"),
            F.round(
                F.when(
                    F.col("_n") > 1, (F.col("_r") - 1) / (F.col("_n") - 1)
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("pct_rank"),
            F.round(F.col("_r") / F.col("_n"), 6).alias("cume"),
        )
    )


@register(
    "q_array_agg_top_customers",
    oracle="""
SELECT n.n_name,
       (list(c.c_custkey ORDER BY c.c_acctbal DESC, c.c_custkey))[:3] AS top_custkeys
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
""",
    survey_ids=("A2", "F8"),
)
def q_array_agg_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: per nation, the 3 highest-balance customer
    keys as an array column. collect_list is order-nondeterministic, so the
    deterministic form collects sortable structs, array_sorts, slices, and
    projects — all JVM-side array expressions."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct((-F.col("c_acctbal")).alias("nb"), F.col("c_custkey").alias("k")))
                    ),
                    1, 3,
                ),
                lambda s: s["k"],
            ).alias("top_custkeys")
        )
    )


# =========================================================================
# Composed DWD apps: the two reference topologies that chain several
# operators in one job, end-to-end (VERDICT r1 gaps #1/#2), and the
# register-window app's create_time-string event-time path (gap #3).
# =========================================================================


@register(
    "dwd_trade_pay_suc_detail",
    oracle="""
WITH pay AS (
  SELECT o_orderkey AS order_id, o_custkey AS user_id,
         '110' || (o_custkey % 4 + 1)::VARCHAR AS payment_type_code,
         o_orderdate::TIMESTAMP + (o_orderkey % 25) * INTERVAL '1 minute' AS pay_ts
  FROM orders
  WHERE o_orderkey % 3 = 0 AND o_orderkey % 4 = 0
    AND (CASE WHEN o_orderkey % 2 = 0 THEN '1602' ELSE '1601' END) = '1602'
),
od AS (
  SELECT l_orderkey * 10 + l_linenumber AS id, l_orderkey AS order_id,
         l_partkey AS sku_id, l_extendedprice AS split_total_amount,
         o_orderpriority AS province_id,
         o_orderdate::TIMESTAMP + l_linenumber * INTERVAL '1 minute' AS od_ts
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT od.id, od.order_id, p.user_id, p.payment_type_code,
       d.dic_name AS payment_type_name,
       strftime(p.pay_ts, '%Y-%m-%d %H:%M:%S') AS payment_time,
       od.sku_id, od.province_id, od.split_total_amount
FROM pay p
JOIN od ON p.order_id = od.order_id
       AND p.pay_ts >= od.od_ts - INTERVAL '15 minutes'
       AND p.pay_ts <= od.od_ts + INTERVAL '15 seconds'
LEFT JOIN (VALUES ('1101','Alipay'),('1102','WeChat'),('1103','UnionPay')) d(dic_code, dic_name)
  ON p.payment_type_code = d.dic_code
""",
    survey_ids=("P5", "J3", "J4", "P4"),
)
def dwd_trade_pay_suc_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed payment-success app (DwdTradeOrderPaySucDetail.java:
    76-168) end-to-end in ONE plan, the way the reference chains it:

    1. P5 — payment CDC filtered to status-flip updates (``type='update' AND
       old['payment_status'] IS NOT NULL AND data['payment_status']='1602'``,
       :150-168), synthesized from orders with a CDC envelope;
    2. J3 — interval join with the upstream order-detail stream
       (``pay_ts BETWEEN od_ts - 15' AND od_ts + 15s``, :101-125) — the
       equality conjunct keeps it a hash join on order_id;
    3. J4 — left lookup join degrading the payment_type dim (:76-99); the
       '1104' code has no dict row, exercising the left-join null path.

    Event times derive deterministically from o_orderdate so the range
    predicate selects a non-trivial subset (~1/4 of eligible pairs)."""
    from ..operators.etl import update_delta_predicate

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    pay_cdc = o.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("user_id"),
        F.when(F.col("o_orderkey") % 3 == 0, "update").otherwise("insert").alias("type"),
        F.create_map(
            F.lit("payment_status"),
            F.when(F.col("o_orderkey") % 2 == 0, "1602").otherwise("1601"),
            F.lit("payment_type"),
            F.concat(F.lit("110"), (F.col("o_custkey") % 4 + 1).cast("string")),
        ).alias("data"),
        F.when(
            F.col("o_orderkey") % 4 == 0,
            F.create_map(F.lit("payment_status"), F.lit("1601")),
        ).alias("old"),
        F.timestamp_seconds(
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
            + (F.col("o_orderkey") % 25) * 60
        ).alias("pay_ts"),
    )
    pay = (
        pay_cdc.filter(
            update_delta_predicate("payment_status")
            & (F.col("data")["payment_status"] == "1602")
        )
        .select(
            "order_id",
            "user_id",
            F.col("data")["payment_type"].alias("payment_type_code"),
            "pay_ts",
        )
    )
    od = (
        li.join(
            o.select("o_orderkey", "o_orderpriority", "o_orderdate"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
            F.col("l_orderkey").alias("order_id"),
            F.col("l_partkey").alias("sku_id"),
            F.col("l_extendedprice").alias("split_total_amount"),
            F.col("o_orderpriority").alias("province_id"),
            F.timestamp_seconds(
                F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
                + F.col("l_linenumber") * 60
            ).alias("od_ts"),
        )
    )
    joined = interval_join(od, pay, "order_id", "od_ts", "pay_ts")
    dic = spark.createDataFrame(
        [("1101", "Alipay"), ("1102", "WeChat"), ("1103", "UnionPay")],
        "dic_code string, dic_name string",
    )
    return lookup_join(joined, dic, "payment_type_code", "dic_code", how="left").select(
        "id",
        od["order_id"].alias("order_id"),
        "user_id",
        "payment_type_code",
        F.col("dic_name").alias("payment_type_name"),
        F.date_format("pay_ts", "yyyy-MM-dd HH:mm:ss").alias("payment_time"),
        "sku_id",
        "province_id",
        "split_total_amount",
    )


@register(
    "dwd_interaction_comment_info",
    oracle="""
WITH cdc AS (
  SELECT event_id AS id, user_id,
         CASE WHEN event_id % 5 = 0 THEN 'update' ELSE 'insert' END AS type,
         '120' || (event_id % 4 + 1)::VARCHAR AS appraise,
         'cmt-' || event_id::VARCHAR AS comment_txt,
         (user_id % 100)::VARCHAR AS sku_id,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS create_time
  FROM events
)
SELECT c.id, c.user_id, c.sku_id, c.appraise AS appraise_code,
       d.dic_name AS appraise_name, c.comment_txt, c.create_time
FROM cdc c
JOIN (VALUES ('1201','Great'),('1202','Good'),('1203','Okay'),('1204','Poor')) d(dic_code, dic_name)
  ON c.appraise = d.dic_code
WHERE c.type = 'insert'
""",
    survey_ids=("P1", "P4", "J4"),
)
def dwd_interaction_comment_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed comment-info app (DwdInteractionCommentInfo.java:64-102)
    end-to-end: CDC insert filter (:82-102) -> map-subscript projection (P4)
    -> inner lookup join degrading the appraise dict (:64-80). The dict join
    broadcasts; the fact side never shuffles."""
    from ..operators.etl import cdc_project

    ev = _t(spark, sf_dir, "events")
    cdc = ev.select(
        F.col("event_id").alias("id"),
        F.col("user_id"),
        F.when(F.col("event_id") % 5 == 0, "update").otherwise("insert").alias("type"),
        F.create_map(
            F.lit("appraise"),
            F.concat(F.lit("120"), (F.col("event_id") % 4 + 1).cast("string")),
            F.lit("comment_txt"),
            F.concat(F.lit("cmt-"), F.col("event_id").cast("string")),
            F.lit("sku_id"),
            (F.col("user_id") % 100).cast("string"),
        ).alias("data"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("create_time"),
    )
    flat = cdc_project(
        cdc.filter(F.col("type") == "insert"),
        ["appraise", "comment_txt", "sku_id"],
        extra={
            "id": F.col("id"),
            "user_id": F.col("user_id"),
            "create_time": F.col("create_time"),
        },
    )
    dic = spark.createDataFrame(
        [("1201", "Great"), ("1202", "Good"), ("1203", "Okay"), ("1204", "Poor")],
        "dic_code string, dic_name string",
    )
    return lookup_join(flat, dic, "appraise", "dic_code", how="inner").select(
        "id",
        "user_id",
        "sku_id",
        F.col("appraise").alias("appraise_code"),
        F.col("dic_name").alias("appraise_name"),
        "comment_txt",
        "create_time",
    )


@register(
    "dws_user_register",
    oracle="""
WITH r AS (
  SELECT event_id AS id,
         CASE WHEN event_id % 97 <> 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S') END AS create_time
  FROM events WHERE event_type = 'signup'
)
SELECT strftime(time_bucket(INTERVAL '10 seconds', strptime(create_time, '%Y-%m-%d %H:%M:%S')),
                '%Y-%m-%d %H:%M:%S') AS stt,
       strftime(time_bucket(INTERVAL '10 seconds', strptime(create_time, '%Y-%m-%d %H:%M:%S'))
                + INTERVAL '10 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
       count(*) AS register_ct
FROM r WHERE id IS NOT NULL AND create_time IS NOT NULL
GROUP BY 1, 2
""",
    survey_ids=("A3", "W1", "P2", "F2"),
)
def dws_user_register(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The register-window app (DwsUserUserRegisterWindow.java:56-106) with
    its distinctive event-time source: the timestamp is the STRING
    ``create_time`` field of the JSON payload, parsed with the tz-pinned
    DateFormatUtil twin (:82-88 dateTImeToTs), not a numeric epoch. Rows
    missing id/create_time are dropped (:90-106), then a 10 s global tumble
    counts registrations. The JSON round-trip (to_json -> get_json_object)
    exercises the P2 parse edge; the string->epoch->window->string path is
    the tz-sensitive one (SURVEY §7.4 item 6) — session tz is pinned to
    Asia/Shanghai so wall-clock parity with the naive-SQL oracle holds."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    payload = ev.select(
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.when(
                    F.col("event_id") % 97 != 0,
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
                ).alias("create_time"),
            )
        ).alias("value")
    )
    parsed = payload.select(
        json_get(F.col("value"), "id").alias("id"),
        json_get(F.col("value"), "create_time").alias("create_time"),
    )
    ok = parsed.filter(F.col("id").isNotNull() & F.col("create_time").isNotNull())
    win = ok.select(
        F.window(F.timestamp_millis(date_to_ts(F.col("create_time"))), "10 seconds").alias("w")
    )
    return (
        win.groupBy("w")
        .agg(F.count(F.lit(1)).alias("register_ct"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
            "register_ct",
        )
    )


_CONTAM_SQL = f"""
WITH {_SHINGLE_CTE},
fp AS (SELECT doc_id, {md5_long_sql_duckdb('shingle', 12)} AS fp FROM sh),
sel AS (SELECT DISTINCT doc_id, fp FROM fp WHERE fp % 8 = 0),
bench AS (SELECT * FROM sel WHERE doc_id % 20 = 0),
train AS (SELECT DISTINCT fp FROM sel WHERE doc_id % 20 <> 0)
SELECT b.doc_id, round(count(t.fp)::DOUBLE / count(*), 6) AS contamination
FROM bench b LEFT JOIN train t ON b.fp = t.fp
GROUP BY 1
"""


@register("text_decontamination", oracle=_CONTAM_SQL, survey_ids=("text-fingerprint",))
def text_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the fraction of each held-out doc's
    winnowed fingerprints that also appear anywhere in the training corpus —
    the standard n-gram-overlap contamination check run before training.
    Fingerprints are content-defined (winnowing mod-sampling), so the check
    survives insertions around the overlap; the join is an equi-join on the
    60-bit fingerprint, so at corpus scale this is |selected fingerprints|,
    never docs x docs. Held-out set here: doc_id % 20 == 0."""
    docs = _t(spark, sf_dir, "documents")
    sel = text.winnow_fingerprints(docs)
    bench = sel.filter(F.col("doc_id") % 20 == 0)
    train = sel.filter(F.col("doc_id") % 20 != 0).select("fp").distinct()
    joined = bench.join(train.withColumn("hit", F.lit(1)), "fp", "left")
    return joined.groupBy("doc_id").agg(
        F.round(F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count(F.lit(1)), 6).alias("contamination")
    )


@register(
    "q_topn_per_group",
    oracle="""
SELECT n_name, c_name, revenue, rnk AS rank
FROM (
  SELECT n.n_name, c.c_name,
         round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
         row_number() OVER (PARTITION BY n.n_name
                            ORDER BY round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) DESC,
                                     c.c_name) AS rnk
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
WHERE rnk <= 3
""",
    survey_ids=("A2", "J1"),
)
def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N (top-3 customers by revenue per nation) — the Flink
    'Top-N' SQL pattern (rank over partition, filter rank): aggregate first
    so the ranking window sees |customers| rows, not |lineitems|; ties
    broken on the rounded score + name for cross-engine determinism."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    agg = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", "c_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("revenue").desc(), F.col("c_name"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("n_name", "c_name", "revenue", "rank")
    )


@register(
    "q_funnel_counts",
    oracle="""
WITH v AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.t GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t GROUP BY 1)
SELECT (SELECT count(*) FROM v) AS viewed,
       (SELECT count(*) FROM c) AS clicked_after_view,
       (SELECT count(*) FROM p) AS purchased_after_click
""",
    survey_ids=("A3", "P3"),
)
def q_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> later click -> later purchase per
    user): each stage keeps users whose stage event follows their previous
    stage's FIRST event. All three stages share one shuffle on user_id
    (min-aggregates + co-keyed joins); the final counts are scalar
    aggregates. The batch form of Flink's CEP-lite sequential-pattern
    counting."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_t"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_t"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_t"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_t"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_t"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("viewed"))
        .join(c.agg(F.count(F.lit(1)).alias("clicked_after_view")))
        .join(p.agg(F.count(F.lit(1)).alias("purchased_after_click")))
    )


@register(
    "q_asof_join",
    oracle="""
WITH v AS (
  SELECT user_id, ts, event_id AS view_id, value AS view_value
  FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
),
p AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
)
SELECT p.purchase_id, p.user_id, v.view_id, v.view_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
""",
    survey_ids=("join-asof",),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attribute each purchase to the same user's most recent
    view at-or-before it (the versioned-dim lookup / last-touch attribution
    shape). Spark lacks the operator; ``joins.asof_join`` composes it as a
    union-tag + single keyed window pass — one shuffle, no range-join
    explosion. The oracle is DuckDB's native ASOF LEFT JOIN, making this an
    engine-vs-engine check of the operator itself. Views are deduped to one
    per (user, ts) (max event_id) so the as-of pick is deterministic."""
    from ..operators.joins import asof_join

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    views = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id", "ts",
            F.col("event_id").alias("view_id"),
            F.col("value").alias("view_value"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    return asof_join(purchases, views, "user_id", "ts", ["view_id", "view_value"]).select(
        "purchase_id", "user_id", "view_id", "view_value"
    )


# =========================================================================
# Dataset-curation operators: deterministic sampling/splits and per-doc
# characteristic terms — the remaining staples of a training-data pipeline.
# =========================================================================


@register(
    "sample_stratified",
    oracle="""
SELECT e.event_id, e.event_type, c.rate
FROM events e
JOIN (VALUES ('view', 10), ('click', 50), ('purchase', 100)) c(stratum, rate)
  ON e.event_type = c.stratum
WHERE (('0x' || substr(md5(e.event_id::VARCHAR), 1, 15))::BIGINT) % 100 < c.rate
""",
    survey_ids=("sample-stratified",),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling: keep iff
    md5(id) % 100 < rate(stratum). Rates are a broadcast config table (J5
    shape); membership is a pure function of the key — reproducible on any
    engine and across backfills, no RNG state."""
    from ..operators.sampling import stratified_sample

    ev = _t(spark, sf_dir, "events")
    rates = spark.createDataFrame(
        [("view", 10), ("click", 50), ("purchase", 100)], "stratum string, rate int"
    )
    return stratified_sample(ev, rates, "event_type", "event_id").select(
        "event_id", "event_type", "rate"
    )


@register(
    "sample_train_split",
    oracle="""
WITH s AS (
  SELECT doc_id,
         CASE WHEN (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT) % 1000 < 800 THEN 'train'
              WHEN (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT) % 1000 < 900 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, count(*) AS ct FROM s GROUP BY 1
""",
    survey_ids=("sample-split",),
)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test split by hash range — a pure
    projection, so membership can be recomputed by any engine years later
    without a stored membership table. Checked via the per-split counts."""
    from ..operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id").groupBy("split").agg(F.count(F.lit(1)).alias("ct"))


@register(
    "sample_domain_cap",
    oracle="""
SELECT doc_id, source, keep_rank
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT), doc_id
         ) AS keep_rank
  FROM documents
)
WHERE keep_rank <= 15
""",
    survey_ids=("sample-domain-cap",),
)
def sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (web-corpus "no source may dominate"): keep at most 15
    docs per source, selected by deterministic hash rank so the survivors
    are a uniform reproducible sample of each domain. The rank-<=-cap
    predicate is a per-group limit Spark pushes map-side (WindowGroupLimit),
    so whole domains never shuffle."""
    from ..operators.sampling import domain_cap

    docs = _t(spark, sf_dir, "documents")
    return domain_cap(docs, "source", "doc_id", cap=15).select("doc_id", "source", "keep_rank")


_AES_KEY_SQL = (
    "round(ln(((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT) + 1)"
    " / 1152921504606846976.0) / length(text)::DOUBLE, 9)"
)


@register(
    "sample_weighted_topn",
    oracle=f"""
SELECT doc_id, source, samp_key, samp_rank FROM (
  SELECT doc_id, source,
         {_AES_KEY_SQL} AS samp_key,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_AES_KEY_SQL} DESC, doc_id
         ) AS samp_rank
  FROM documents WHERE length(text) > 0
) WHERE samp_rank <= 10
""",
    survey_ids=("sample-importance",),
)
def sample_weighted_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (r7): Efraimidis-Spirakis
    A-ES, 10 docs per source weighted by document length — the fixed-size
    complement to the Bernoulli ``sample_importance``. Hash coin, exp-key
    compared as round(ln(u)/w, 9) (identical in both engines), per-stratum
    top-n planned as a map-side WindowGroupLimit."""
    from ..operators.sampling import weighted_topn_sample

    docs = _t(spark, sf_dir, "documents").withColumn("w", F.length("text"))
    return weighted_topn_sample(docs, "source", "doc_id", "w", n=10).select(
        "doc_id", "source", "samp_key", "samp_rank"
    )


@register(
    "text_tfidf_topk",
    oracle="""
WITH toks AS (
  SELECT d.doc_id, t.tok AS term
  FROM documents d,
       unnest(list_filter(regexp_split_to_array(trim(d.text), '\\s+'), x -> x <> '')) AS t(tok)
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, term, round(raw_score, 6) AS score, rank
FROM (
  SELECT tf.doc_id, tf.term,
         tf.tf * (n.n_docs + 1) / (df.df + 1) AS raw_score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * (n.n_docs + 1) / (df.df + 1) DESC, tf.term) AS rank
  FROM tf JOIN df USING (term) CROSS JOIN n
)
WHERE rank <= 3
""",
    survey_ids=("text-tfidf",),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf (rational idf
    (N+1)/(df+1) — exactly-rounded IEEE ops, so scores hash-match across
    engines where ln would differ in the last ulp)."""
    return text.tfidf_topk(_t(spark, sf_dir, "documents"), k=3)


# Exact oracle for the sign-bit LSH ANN (hyperplane weights are a fixed
# integer pattern, so the bucketing is SQL-reproducible) — upgrades the
# entry from rows-only to hash-checked.

def _lsh_bucket_sql(planes: int = 8, dim: int = 64) -> str:
    """SQL form of the sign-bit bucket id, generated from the SAME
    ``plane_weights`` integer pattern the Arrow pass uses — the oracle and
    the engine can never drift on the bucket definition."""
    w = similarity.plane_weights(planes, dim)
    terms = []
    for pl in range(planes):
        vec = ", ".join(f"{w[pl, d]:.1f}" for d in range(dim))
        terms.append(f"(CASE WHEN list_dot_product(v, [{vec}]) > 0 THEN {1 << pl} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _ann_lsh_sql(planes: int = 8, nprobe: int = 4, k: int = 5) -> str:
    """Exact oracle for multi-probe sign-bit LSH ANN: each query probes its
    own bucket plus ``nprobe - 1`` fixed single-bit flips (bits 0, 1, ...),
    mirroring ``similarity.lsh_topk``. Corpus vectors live in exactly one
    bucket, so probe hits are disjoint and the rank window is exact."""
    b = _lsh_bucket_sql(planes)
    masks = ", ".join(f"({m})" for m in [0] + [1 << i for i in range(nprobe - 1)])
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q0 AS (SELECT vec_id AS query_id, v AS qv, {b} AS b0 FROM e WHERE vec_id % 20 = 0),
q AS (SELECT query_id, qv, xor(b0, CAST(m.m AS BIGINT)) AS bucket
      FROM q0 CROSS JOIN (VALUES {masks}) m(m)),
c AS (SELECT vec_id AS neighbor_id, v AS cv, {b} AS bucket FROM e),
s AS (
  SELECT q.query_id, c.neighbor_id,
         round(list_dot_product(q.qv, c.cv) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))), 6) AS sim
  FROM q JOIN c ON q.bucket = c.bucket
  WHERE q.query_id <> c.neighbor_id
)
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= {k}
"""


_ANN_LSH_SQL = _ann_lsh_sql(planes=8, nprobe=4, k=5)

CATALOG["ann_lsh_bucketed"] = QuerySpec(
    "ann_lsh_bucketed",
    CATALOG["ann_lsh_bucketed"].spark,
    _ANN_LSH_SQL,
    CATALOG["ann_lsh_bucketed"].survey_ids,
    True,  # benched since r3: the bucket-cogrouped rework must stay measured
)


_ANN_LSH_RECALL_SQL = f"""
WITH bf AS ({_ANN_BRUTE_SQL}),
lsh AS ({_ANN_LSH_SQL})
SELECT count(*) AS n_truth,
       sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
       round(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS recall_at_5
FROM bf b LEFT JOIN lsh l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
"""


@register("ann_lsh_recall_report", oracle=_ANN_LSH_RECALL_SQL, survey_ids=("sim-lsh", "sim-brute-cosine"))
def ann_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the multi-probe LSH index against exact brute-force
    ground truth — the companion measurement to ``ann_recall_report``
    (IVF). Multi-probe exists to hold recall while plane count scales with
    the corpus; this entry is the regression lock on that tradeoff."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    truth = similarity.brute_force_topk(emb, q, k=5).select("query_id", "neighbor_id")
    approx = similarity.lsh_topk(emb, q, k=5).select(
        "query_id", F.col("neighbor_id").alias("hit_id")
    )
    joined = truth.join(
        approx,
        (truth["query_id"] == approx["query_id"]) & (truth["neighbor_id"] == approx["hit_id"]),
        "left",
    )
    hit = F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
    return joined.agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(hit).alias("n_hit"),
        F.round(F.sum(hit) / F.count(F.lit(1)), 6).alias("recall_at_5"),
    )


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


# =========================================================================
# Warehouse layout: z-order clustering (sources/warehouse.py)
# =========================================================================

from ..sources.warehouse import zorder_value, zorder_value_sql  # noqa: E402

_ZORDER_SQL = f"""
WITH e AS (
  SELECT event_id,
         (event_id % 256)::INT AS zx,
         (floor(value)::INT % 256) AS zy
  FROM events
)
SELECT event_id, ({zorder_value_sql(["zx", "zy"], bits=8)})::BIGINT AS zval
FROM e
"""


@register("q_zorder_values", oracle=_ZORDER_SQL, survey_ids=("warehouse-zorder",))
def q_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values over two 8-bit event dimensions, as one closed-form
    codegen expression (32 shift/mask terms, no UDF) — the clustering key
    ``write_zordered`` range-partitions and sorts by so that parquet
    min/max stats prune on EITHER dimension.  The oracle runs the
    bit-identical expression (generated from the same positions table) in
    DuckDB — an engine-vs-engine check of the interleaving itself."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        (F.col("event_id") % 256).cast("int").alias("zx"),
        (F.floor("value").cast("int") % 256).alias("zy"),
    )
    return e.select("event_id", zorder_value(["zx", "zy"], bits=8).alias("zval"))


@register(
    "text_chunking",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
d AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
c AS (
  SELECT doc_id, n, unnest(range(0, 1 + ceil(greatest(n - 64, 0) / 48.0)::INT)) AS chunk_id, t
  FROM d
)
SELECT doc_id, chunk_id,
       array_to_string(list_slice(t, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ') AS chunk_text,
       least(64, n - chunk_id * 48)::BIGINT AS chunk_tokens
FROM c
""",
    survey_ids=("text-chunking",),
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (64-token chunks, stride 48):
    the map-side explode that turns documents into training-window-sized
    pieces.  Chunk boundaries are pure arithmetic over the token array, so
    the whole operator is codegen and shuffle-free."""
    return text.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    ).select("doc_id", "chunk_id", "chunk_text", "chunk_tokens")


@register(
    "text_pack_sequences",
    oracle="""
WITH d AS (
  SELECT lang, doc_id,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens
  FROM documents
)
SELECT lang, doc_id, n_tokens,
       (coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 256) AS bin_id
FROM d
""",
    survey_ids=("text-packing",),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing, sharded by language: within each
    lang shard, doc-id-ordered prefix sums of token counts assign
    consecutive documents to ~256-token training bins ((lang, bin_id) is
    the sequence key) — the order-preserving batch form of greedy packing.
    Sharding keeps the ordered window distributed: one hash shuffle on
    lang, per-shard sorts, no single-partition bottleneck."""
    return text.pack_sequences(
        _t(spark, sf_dir, "documents"), cap_tokens=256, shard_col="lang"
    )


@register(
    "corpus_mix_report",
    oracle="""
WITH d AS (
  SELECT source, lang,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens
  FROM documents
)
SELECT source, lang, count(*) AS docs, sum(n_tokens)::BIGINT AS tokens,
       round(sum(n_tokens) / (SELECT sum(n_tokens) FROM d), 6) AS token_share
FROM d GROUP BY 1, 2
""",
    survey_ids=("corpus-mix",),
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: docs and token totals per (source, lang)
    with each cell's share of all tokens — the data-governance summary every
    curation run publishes.  One grouped aggregate plus a scalar total
    (computed as an unpartitioned window over the tiny grouped frame, not
    over the corpus)."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "source", "lang", text.token_count(F.col("text")).alias("n_tokens")
    )
    g = per.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens")
    )
    total = Window.partitionBy()
    return g.select(
        "source", "lang", "docs", "tokens",
        F.round(F.col("tokens") / F.sum("tokens").over(total), 6).alias("token_share"),
    )


@register(
    "text_quality_model",
    oracle="""
WITH f AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
               / greatest(length(text), 1), 6) AS punct_ratio,
         round(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
               x -> list_contains(['the','a','of','and','to','in','is','it'], x)))::DOUBLE
               / greatest(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')), 1), 6)
               AS stopword_ratio,
         round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               / greatest(length(text), 1), 6) AS alpha_ratio,
         round(length(text) / greatest(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
               x -> x <> '')), 1), 6) AS chars_per_token
  FROM documents
),
s AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-(-2.0 + 0.8 * ln(1 + n_tokens)
           + 3.0 * stopword_ratio + 1.5 * alpha_ratio
           - 4.0 * punct_ratio - 0.1 * chars_per_token))), 6) AS quality_score
  FROM f
)
SELECT doc_id, quality_score, quality_score >= 0.5 AS keep FROM s
""",
    survey_ids=("text-quality-model",),
)
def text_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate: logistic score over the heuristic feature
    set with fixed documented weights (the classifier-filter shape of a
    curation pipeline), computed as one codegen'd expression — the oracle
    recomputes the identical linear form + sigmoid in DuckDB."""
    return text.quality_model_score(_t(spark, sf_dir, "documents"))


@register(
    "text_extract_structured",
    oracle="""
SELECT doc_id,
       regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') AS emails,
       regexp_extract_all(text, '\\+?[0-9][0-9()\\- ]{7,}[0-9]') AS phones,
       regexp_extract_all(text, '[0-9]{5,}') AS numbers,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::INT AS n_emails,
       len(regexp_extract_all(text, '\\+?[0-9][0-9()\\- ]{7,}[0-9]'))::INT AS n_phones,
       len(regexp_extract_all(text, '[0-9]{5,}'))::INT AS n_numbers
FROM documents
""",
    survey_ids=("text-extract",),
)
def text_extract_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured extraction (the PII scrub's inverse): emails, phone-shaped
    spans, and long numbers pulled out as typed array columns with counts —
    the regex-table extraction pass, shuffle-free map-side."""
    return text.extract_structured(_t(spark, sf_dir, "documents"))


@register(
    "text_vocab_topk",
    oracle="""
WITH t AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS tok
  FROM documents
),
per_doc AS (SELECT tok, doc_id, count(*) AS tf FROM t GROUP BY 1, 2),
freq AS (SELECT tok, count(*) AS df, sum(tf)::BIGINT AS tf_total FROM per_doc GROUP BY 1)
SELECT tok, df, tf_total, row_number() OVER (ORDER BY df DESC, tok) AS rank
FROM freq
ORDER BY df DESC, tok
LIMIT 100
""",
    survey_ids=("text-vocab",),
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-100 tokens by document frequency (tie by
    token) with total term frequency — the df table tokenizer/tf-idf
    passes build first.  The exploded (token, doc) pairs map-side combine
    before shuffling, and the top-k is a TakeOrdered over the token table,
    not a global sort."""
    return text.vocab_topk(_t(spark, sf_dir, "documents"), k=100)


# =========================================================================
# Round 3 additions: corpus-trained bigram LM scoring + skew-proof ranking
# =========================================================================

_BIGRAM_LM_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
big AS (
  SELECT doc_id, unnest([{'w1': t[i], 'w2': t[i+1]} FOR i IN range(1, len(t))], recursive := true)
  FROM toks WHERE len(t) >= 2
),
c2 AS (SELECT w1, w2, count(*) AS n12 FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, sum(n12) AS n1 FROM c2 GROUP BY 1),
model AS (SELECT c2.w1, c2.w2, round(n12::DOUBLE / n1, 6) AS p FROM c2 JOIN c1 USING (w1))
SELECT doc_id, count(*) AS n_bigrams,
       round(sum(p::DECIMAL(28, 6)), 6)::DOUBLE AS pred_score
FROM big JOIN model USING (w1, w2)
GROUP BY 1
"""


@register("text_bigram_lm", oracle=_BIGRAM_LM_SQL, survey_ids=("text-bigram-lm",))
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style predictability score from a corpus-trained bigram
    LM — train (count tables) and apply (per-doc conditional-probability
    sum) in one plan. All joins equi-keyed on tokens; count tables are
    vocabulary-sized. DECIMAL partials keep the score order-invariant."""
    return text.bigram_lm_score(_t(spark, sf_dir, "documents"))


@register(
    "q_skew_rank",
    oracle="""
SELECT event_id, event_type, value,
       row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rnk
FROM events
""",
    survey_ids=("skew-tools",),
)
def q_skew_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase skew-proof ranking: identical semantics to a per-key
    row_number window, but a hot key's sort spreads across value-range
    buckets; the only global pass runs over the tiny per-bucket counts
    frame. The oracle is the plain window the operator decomposes."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return skew.two_phase_rank(
        ev, "event_type", "value", "event_id", bucket_width=20.0, rank_col="rnk"
    )


def _multimodal_jpeg_decode_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG pixel decode, zero vendored libs (VERDICT r7 #4):
    synthesize a valid SOF0 JPEG per doc with genuine entropy-coded scan
    data (custom canonical Huffman tables in DHT, per-block DC prediction
    with alternating diffs, one run-length-coded AC coefficient, 0xFF
    byte stuffing) and decode it back through the full pipeline — Huffman,
    dequant, dezigzag, IDCT, level shift, BT.601 YCbCr->RGB. The fixture
    pins quant tables to 8 and uses a zero-block-sum AC basis so decoded
    pixel sums are EXACT seed arithmetic despite JPEG's lossy transform;
    a wrong Huffman walk, EXTEND, zigzag, IDCT scale, or color matrix
    corrupts pix_sum. Per-row Arrow map work — linear by construction,
    the same scale shape as multimodal_png_decode."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "jpeg_scan")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "image/jpeg")
    decoded = multimodal.decode_media(media)
    ch = F.when(F.col("media_id") % 4 == 0, F.lit(1)).otherwise(F.lit(3))
    return decoded.select(
        "media_id", "width", "height",
        (ch * F.col("width") * F.col("height")).cast("long").alias("n_px"),
        F.col("sample_sum").alias("pix_sum"),
    )


register(
    "multimodal_jpeg_decode",
    oracle="""
SELECT doc_id AS media_id,
       ((doc_id % 24 + 1) * 8)::INT AS width,
       ((doc_id % 11 + 1) * 8)::INT AS height,
       ((CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END)
        * (doc_id % 24 + 1) * 8 * (doc_id % 11 + 1) * 8)::BIGINT AS n_px,
       ((CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END) * 64 *
        ((doc_id % 24 + 1) * (doc_id % 11 + 1) * (28 + doc_id % 200)
         + ((doc_id % 24 + 1) * (doc_id % 11 + 1)) // 2))::BIGINT AS pix_sum
FROM documents
""",
    survey_ids=("mm-decode",),
)(_multimodal_jpeg_decode_impl)


@register(
    "multimodal_png_decode",
    oracle="""
SELECT doc_id AS media_id,
       (doc_id % 29 + 1)::INT AS width,
       (doc_id % 13 + 1)::INT AS height,
       (3 * (doc_id % 29 + 1) * (doc_id % 13 + 1))::BIGINT AS n_px,
       (3 * (doc_id % 29 + 1) * (doc_id % 13 + 1) * (doc_id % 251))::BIGINT AS pix_sum
FROM documents
""",
    survey_ids=("mm-decode",),
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode, zero vendored libs: synthesize a valid
    8-bit RGB PNG per doc (stdlib-zlib IDAT, CRC32 chunk framing, row r
    filtered with type r%5) and decode it back — chunk walk with CRC
    verification, inflate, full five-filter scanline reconstruction. The
    oracle predicts pixel geometry/sum from seed arithmetic; a wrong
    Sub/Up/Average/Paeth reconstruction corrupts pix_sum."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "png")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "image/png")
    decoded = multimodal.decode_media(media)
    return decoded.select(
        "media_id", "width", "height",
        (F.lit(3) * F.col("width") * F.col("height")).cast("long").alias("n_px"),
        F.col("sample_sum").alias("pix_sum"),
    )


def _pq_sub_dist_sql(av: str, bv: str, s: int, ds: int = 8) -> str:
    """Unrolled left-to-right squared-L2 over subspace s's dims (1-indexed
    SQL arrays) — textual order matches the numpy dimension-sequential
    accumulation bit for bit."""
    terms = []
    for i in range(ds):
        idx = s * ds + i + 1
        terms.append(f"(({av}[{idx}] - {bv}[{idx}]) * ({av}[{idx}] - {bv}[{idx}]))")
    return "(" + " + ".join(terms) + ")"


def _ann_pq_sql(m: int = 8, cb_k: int = 16, k: int = 5) -> str:
    corpus_subs = "\nUNION ALL\n".join(
        f"SELECT e.vec_id, {s} AS s, cb.j, {_pq_sub_dist_sql('e.v', 'cb.cv', s)} AS d FROM e CROSS JOIN cb"
        for s in range(m)
    )
    query_subs = "\nUNION ALL\n".join(
        f"SELECT q.query_id, {s} AS s, cb.j, {_pq_sub_dist_sql('q.qv', 'cb.cv', s)} AS d FROM q CROSS JOIN cb"
        for s in range(m)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v AS cv
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {cb_k}) t
),
sub AS ({corpus_subs}),
code AS (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn
    FROM sub
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
qsub AS ({query_subs}),
approx AS (
  SELECT qs.query_id, c.vec_id AS neighbor_id,
         round(sum(round(qs.d, 6)::DECIMAL(28, 6)), 6)::DOUBLE AS dist
  FROM code c JOIN qsub qs ON qs.s = c.s AND qs.j = c.j
  WHERE c.vec_id <> qs.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, dist, rank FROM (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
  FROM approx
) WHERE rank <= {k}
"""


_ANN_SQ8_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
mm AS (
  SELECT p.d, min(v[p.d + 1]) AS mn, max(v[p.d + 1]) AS mx
  FROM e CROSS JOIN range(64) p(d) GROUP BY 1
),
code AS (
  SELECT e.vec_id, mm.d,
         CASE WHEN mm.mx = mm.mn THEN 0
              ELSE round((255.0 * (v[mm.d + 1] - mm.mn)) / (mm.mx - mm.mn)) END::BIGINT AS c
  FROM e CROSS JOIN mm
),
rec AS (
  SELECT vec_id, array_agg(mm.mn + (c * (mm.mx - mm.mn)) / 255.0 ORDER BY code.d) AS rv
  FROM code JOIN mm ON mm.d = code.d GROUP BY vec_id
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
sims AS (
  SELECT q.query_id, r.vec_id AS neighbor_id,
         round(list_dot_product(r.rv, q.qv)
               / (sqrt(list_dot_product(r.rv, r.rv)) * sqrt(list_dot_product(q.qv, q.qv))), 6)
           AS sim
  FROM rec r CROSS JOIN q WHERE r.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
) WHERE rank <= 5
"""


@register("ann_sq8", oracle=_ANN_SQ8_SQL, survey_ids=("sim-pq",))
def ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization (SQ8) ANN (r7) — the SIMPLE memory-compression
    path next to PQ: one uint8 code per dimension (4x smaller than
    float32; PQ's 8 B/vector trades more recall), encode/de-quantize as
    codegen maps, per-dim min/max as the whole model (one map-side-partial
    shuffle of dim rows). Scoring = exact brute force over reconstructed
    vectors, so the only error is quantization error — and every step
    (HALF_UP rounds, fixed association order, dimension-sequential dots)
    is replicated by the SQL oracle bit-exactly."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    return similarity.sq8_topk(emb, q, k=5)


@register("ann_pq", oracle=_ann_pq_sql(), survey_ids=("sim-pq",))
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN — the memory-compression scale path: the
    scoring pass reads 8 centroid indices per vector (8 ints), never the
    vectors, against per-query distance tables; at 10^9 x 64-float scale
    the scored index is ~8 GB of codes instead of ~256 GB of vectors.
    Deterministic placeholder codebook (16 smallest-id vectors, bounded
    collect) + integer-micro distance accumulation make even this
    approximate index exactly SQL-oracle-checkable."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    return similarity.pq_topk(emb, q, k=5)


@register(
    "q_bloom_join",
    oracle="""
SELECT l.l_linestatus,
       count(*) AS line_ct,
       round(sum(round(l.l_extendedprice * (1 - l.l_discount), 6)::DECIMAL(28, 6)), 2)::DOUBLE
         AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1
""",
    survey_ids=("J1", "sketch-bloom"),
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning: urgent orders' key set becomes a
    64 Kbit bloom filter that prunes the lineitem scan BEFORE its join
    Exchange — the 100 TB shape where the filtered dim is too big to
    broadcast but its key set fits a few KiB of bits.  False positives
    are eliminated by the exact join, so the result (and the oracle) is
    the plain join; the DECIMAL partial sum keeps the revenue aggregate
    partial-order invariant."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).cast("decimal(28,6)")
    joined = sketch.bloom_prefilter_join(li, o, "l_orderkey", "o_orderkey")
    return joined.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("line_ct"),
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
    )


def _pagerank_sql(iters: int = 3) -> str:
    """Chained-CTE oracle: one CTE per PageRank iteration, floor division in
    integer micro-units — the arithmetic is exact, so an iterative algorithm
    still hash-matches across engines."""
    head = """
WITH seq AS (
  SELECT user_id, event_id, ts,
         json_extract_string(props, '$.k')::BIGINT AS page
  FROM events
),
trans AS (
  SELECT lag(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         page AS dst
  FROM seq
),
edges AS (
  SELECT src, dst, count(*) AS cnt FROM trans
  WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2
),
outw AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS outw FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
pr{i} AS (
  SELECT n.node, CAST(150000 + COALESCE(c.s, 0) AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM(CAST((CAST(p.pr AS HUGEINT) * 85 * e.cnt) // (100 * o.outw) AS BIGINT)) AS BIGINT) AS s
    FROM edges e
    JOIN outw o ON e.src = o.src
    JOIN pr{i - 1} p ON p.node = e.src
    GROUP BY 1
  ) c ON n.node = c.node
)""")
    return head + "".join(steps) + f"""
SELECT node AS page, pr AS pr_units FROM pr{iters}
"""


@register("graph_pagerank", oracle=_pagerank_sql(3), survey_ids=("graph-pagerank",))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link analysis over the click-path graph: per-user page transitions
    become weighted directed edges; 3 fixed PageRank iterations in integer
    micro-units (floor-division contributions) rank the pages.  Iterative
    join/groupBy algebra — two same-key hash exchanges per round, node
    state one long each, nothing driver-side — yet exactly oracle-checkable
    because the arithmetic is order-invariant."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "page", json_get(F.col("props"), "k").cast("long")
    )
    edges = graph.transition_edges(ev)
    return graph.pagerank(edges, iters=3).select(
        F.col("node").alias("page"), F.col("pr").alias("pr_units")
    )


@register(
    "q_incremental_join",
    oracle="""
WITH full_v AS (
  SELECT o.o_orderpriority, l.l_extendedprice, l.l_discount
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
base_v AS (
  SELECT o.o_orderpriority, l.l_extendedprice, l.l_discount
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey % 10 <> 0 AND l.l_linenumber <> 1
),
delta AS (SELECT * FROM full_v EXCEPT ALL SELECT * FROM base_v)
SELECT o_orderpriority,
       count(*) AS delta_ct,
       round(sum(round(l_extendedprice * (1 - l_discount), 6)::DECIMAL(28, 6)), 2)::DOUBLE
         AS delta_revenue
FROM delta
GROUP BY 1
""",
    survey_ids=("merge-ivm-join",),
)
def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a join view: the engine computes the
    view's delta as dA><B + A><dB + dA><dB and never recomputes the full
    join; the oracle derives the same delta independently as the multiset
    difference (A+dA)><(B+dB) EXCEPT ALL A><B — two formulations that can
    only agree if the join-derivative algebra is right."""
    from ..operators import merge

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    base_o, delta_o = o.filter(F.col("o_orderkey") % 10 != 0), o.filter(F.col("o_orderkey") % 10 == 0)
    base_l, delta_l = li.filter(F.col("l_linenumber") != 1), li.filter(F.col("l_linenumber") == 1)
    delta_view = merge.incremental_join_delta(
        base_o.select("o_orderkey", "o_orderpriority"),
        delta_o.select("o_orderkey", "o_orderpriority"),
        base_l.select("o_orderkey", "l_extendedprice", "l_discount"),
        delta_l.select("o_orderkey", "l_extendedprice", "l_discount"),
        on=["o_orderkey"],
    )
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).cast("decimal(28,6)")
    return delta_view.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("delta_ct"),
        F.round(F.sum(rev), 2).cast("double").alias("delta_revenue"),
    )


@register(
    "q_incremental_join_retract",
    oracle="""
WITH base_o AS (
  SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 10 <> 0
),
new_o AS (
  SELECT o_orderkey, o_orderpriority FROM orders
  WHERE o_orderkey % 10 = 0 OR o_orderkey % 7 <> 0
),
base_l AS (
  SELECT l_orderkey AS o_orderkey, l_extendedprice, l_discount
  FROM lineitem WHERE l_linenumber <> 1
),
new_l AS (
  SELECT l_orderkey AS o_orderkey, l_extendedprice, l_discount
  FROM lineitem WHERE l_linenumber <> 2
),
old_v AS (SELECT o.o_orderkey, o.o_orderpriority, l.l_extendedprice, l.l_discount
          FROM base_o o JOIN base_l l USING (o_orderkey)),
new_v AS (SELECT o.o_orderkey, o.o_orderpriority, l.l_extendedprice, l.l_discount
          FROM new_o o JOIN new_l l USING (o_orderkey)),
signed AS (
  SELECT *, 1 AS w FROM (SELECT * FROM new_v EXCEPT ALL SELECT * FROM old_v)
  UNION ALL
  SELECT *, -1 AS w FROM (SELECT * FROM old_v EXCEPT ALL SELECT * FROM new_v)
)
SELECT o_orderkey, o_orderpriority, l_extendedprice, l_discount,
       CAST(SUM(w) AS BIGINT) AS delta_w
FROM signed
GROUP BY 1, 2, 3, 4
HAVING SUM(w) <> 0
""",
    survey_ids=("merge-ivm-retract",),
)
def q_incremental_join_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM with RETRACTIONS: deltas carry signed weights (+1 insert, -1
    retract) and the engine computes the view delta via the weighted join
    derivative (weights multiply through the cross term).  The oracle
    derives the same delta with zero shared algebra: it materializes the
    old and new views outright and takes the signed multiset difference
    (EXCEPT ALL both directions, then nets per row content) — the two
    formulations agree only if the Z-set derivative is right.  Retracted
    orders are base orders with key % 7 == 0; retracted lineitems are the
    linenumber-2 rows; inserts are the % 10 == 0 orders and linenumber-1
    rows, so every weight combination (including retract-meets-insert)
    occurs."""
    from ..operators import merge

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_discount",
        "l_linenumber",
    )
    base_o = o.filter(F.col("o_orderkey") % 10 != 0)
    delta_o = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("_w", F.lit(1))
        .unionByName(
            base_o.filter(F.col("o_orderkey") % 7 == 0).withColumn("_w", F.lit(-1))
        )
    )
    base_l = li.filter(F.col("l_linenumber") != 1).drop("l_linenumber")
    delta_l = (
        li.filter(F.col("l_linenumber") == 1)
        .drop("l_linenumber")
        .withColumn("_w", F.lit(1))
        .unionByName(
            li.filter(F.col("l_linenumber") == 2).drop("l_linenumber").withColumn("_w", F.lit(-1))
        )
    )
    out = merge.incremental_join_delta_retract(
        base_o, delta_o, base_l, delta_l, on=["o_orderkey"]
    )
    return out.withColumnRenamed("_w", "delta_w")


@register(
    "q_incremental_agg_retract",
    oracle="""
SELECT o_custkey,
       round(sum(round(o_totalprice, 6)::DECIMAL(28, 6)), 2)::DOUBLE AS sum_price,
       count(*) AS cnt
FROM orders
WHERE o_orderkey % 10 = 0 OR o_orderkey % 7 <> 0
GROUP BY 1
""",
    survey_ids=("merge-ivm-agg-retract",),
)
def q_incremental_agg_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM for a grouped-aggregate view under retractions: the engine never
    re-aggregates the base — it partial-aggs the signed delta (sums
    weighted by w, count as SUM(w)) and merges it onto the stored state,
    dropping zero-net groups.  The oracle recomputes the final view from
    scratch over the post-delta row set (inserts are the %10 orders,
    retractions the %7 base orders), so the two agree only if the
    commutative-group merge algebra is right.  The aggregate twin of
    ``q_incremental_join_retract``."""
    from ..operators import merge

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice"), 6).cast("decimal(28,6)").alias("price"),
    )
    base = o.filter(F.col("o_orderkey") % 10 != 0)
    state0 = base.groupBy("o_custkey").agg(
        F.sum("price").alias("sum_price"), F.count(F.lit(1)).alias("cnt")
    )
    delta = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("_w", F.lit(1))
        .unionByName(
            base.filter(F.col("o_orderkey") % 7 == 0).withColumn("_w", F.lit(-1))
        )
    )
    new_state = merge.incremental_agg_delta_retract(
        state0, delta, ["o_custkey"], {"sum_price": "price"}, count_col="cnt"
    )
    return new_state.select(
        "o_custkey",
        F.round(F.col("sum_price"), 2).cast("double").alias("sum_price"),
        "cnt",
    )


def _kmeans_micro_cte(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """Chained-CTE integer-micro k-means (the oracle twin of
    ``similarity.kmeans_centroids_micro``): one assign/update CTE pair per
    Lloyd iteration, entirely in BIGINT micro-units — quantization by
    CAST(round(x,6)*1e6), squared-L2 assignment with ties to the smaller
    cell, truncating ``//`` centroid update (DuckDB ``//`` truncates toward
    zero, matching Spark ``div`` and the engine's sign-decomposed numpy
    form), empty cells carried forward.  Ends at ``cen{iters}`` with
    (cell, cm BIGINT[])."""
    dist = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        "d -> (em.vm[d] - c.cm[d]) * (em.vm[d] - c.cm[d])))"
    )
    head = f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
em AS (SELECT vec_id,
              list_transform(v, x -> CAST(round(x, 6) * 1000000 AS BIGINT)) AS vm
       FROM e),
cen0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, vm AS cm
  FROM (SELECT vec_id, vm FROM em ORDER BY vec_id LIMIT {k})
)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
asg{i} AS (
  SELECT vec_id, vm, cell FROM (
    SELECT em.vec_id, em.vm, c.cell,
           row_number() OVER (PARTITION BY em.vec_id ORDER BY {dist}, c.cell) AS rn
    FROM em CROSS JOIN cen{i - 1} c
  ) WHERE rn = 1
),
sums{i} AS (
  SELECT cell, t.d, SUM(vm[t.d]) AS s, COUNT(*) AS n
  FROM asg{i}, range(1, {dim + 1}) t(d)
  GROUP BY cell, t.d
),
upd{i} AS (
  SELECT cell, list(s // n ORDER BY d) AS cm
  FROM sums{i} GROUP BY cell
),
cen{i} AS (
  SELECT p.cell, COALESCE(u.cm, p.cm) AS cm
  FROM cen{i - 1} p LEFT JOIN upd{i} u ON p.cell = u.cell
)""")
    return head + "".join(steps)


_KM_K, _KM_ITERS = 8, 3

_IVF_TRAINED_SQL = f"""
WITH {_kmeans_micro_cte(_KM_K, _KM_ITERS)},
cen AS (SELECT cell AS cid, list_transform(cm, x -> x / 1000000.0) AS cv
        FROM cen{_KM_ITERS}),
asg AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT e.vec_id, cen.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_COS_PAIR.format(a='e.v', b='cen.cv')} DESC, cen.cid) AS rn
    FROM e CROSS JOIN cen
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
probes AS (
  SELECT query_id, cid AS cell FROM (
    SELECT q.query_id, cen.cid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_COS_PAIR.format(a='q.qv', b='cen.cv')} DESC, cen.cid) AS rn
    FROM q CROSS JOIN cen
  ) WHERE rn <= 4
),
s AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
         {_COS_PAIR.format(a='qe.v', b='ne.v')} AS sim
  FROM probes p
  JOIN asg a ON p.cell = a.cell
  JOIN e qe ON qe.vec_id = p.query_id
  JOIN e ne ON ne.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""


@register(
    "ann_ivf_trained",
    oracle=_IVF_TRAINED_SQL,
    survey_ids=("sim-ivf", "sim-kmeans"),
)
def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over TRAINED cells — closing the gap that kept k-means an
    opt-in: ``kmeans_centroids_micro`` runs Lloyd iterations entirely in
    int64 micro-units (associative/commutative partials), so the trained
    centroids are partitioning-invariant and the whole index carries an
    exact chained-CTE SQL oracle, unlike float k-means whose reduction
    order drifts.  Assignment/probing/scoring reuse ``ivf_topk``
    unchanged (centroids enter as micros/1e6 — bit-identical doubles on
    both engines)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    ids, cen_micro = similarity.kmeans_centroids_micro(emb, k=_KM_K, iters=_KM_ITERS)
    return similarity.ivf_topk(
        emb, q, k=5, nprobe=4, centroids=(ids, cen_micro / 1e6)
    )


_IVF_TRAINED_RECALL_SQL = f"""
WITH bf AS ({_ANN_BRUTE_SQL}),
ivf AS ({_IVF_TRAINED_SQL})
SELECT count(*) AS n_truth,
       sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
       round(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS recall_at_5
FROM bf b LEFT JOIN ivf i
  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
"""


@register(
    "ann_ivf_trained_recall_report",
    oracle=_IVF_TRAINED_RECALL_SQL,
    survey_ids=("sim-ivf", "sim-kmeans", "sim-brute-cosine"),
)
def ann_ivf_trained_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the trained-centroid IVF index vs exact brute force —
    the quality lock for ``ann_ivf_trained`` (``tests/test_catalog.py``
    additionally pins trained >= placeholder recall at sf0.01)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    truth = similarity.brute_force_topk(emb, q, k=5).select("query_id", "neighbor_id")
    ids, cen_micro = similarity.kmeans_centroids_micro(emb, k=_KM_K, iters=_KM_ITERS)
    approx = similarity.ivf_topk(
        emb, q, k=5, nprobe=4, centroids=(ids, cen_micro / 1e6)
    ).select("query_id", F.col("neighbor_id").alias("hit_id"))
    joined = truth.join(
        approx,
        (truth["query_id"] == approx["query_id"]) & (truth["neighbor_id"] == approx["hit_id"]),
        "left",
    )
    hit = F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
    return joined.agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(hit).alias("n_hit"),
        F.round(F.sum(hit) / F.count(F.lit(1)), 6).alias("recall_at_5"),
    )


_SEMANTIC_DEDUP_SQL = f"""
WITH {_kmeans_micro_cte(_KM_K, _KM_ITERS)},
cen AS (SELECT cell AS cid, list_transform(cm, x -> x / 1000000.0) AS cv
        FROM cen{_KM_ITERS}),
asg AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT e.vec_id, cen.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_COS_PAIR.format(a='e.v', b='cen.cv')} DESC, cen.cid) AS rn
    FROM e CROSS JOIN cen
  ) WHERE rn = 1
)
SELECT a1.vec_id AS id_a, a2.vec_id AS id_b,
       {_COS_PAIR.format(a='e1.v', b='e2.v')} AS sim
FROM asg a1
JOIN asg a2 ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
JOIN e e1 ON e1.vec_id = a1.vec_id
JOIN e e2 ON e2.vec_id = a2.vec_id
WHERE {_COS_PAIR.format(a='e1.v', b='e2.v')} >= 0.4
"""


@register(
    "dedup_semantic",
    oracle=_SEMANTIC_DEDUP_SQL,
    survey_ids=("dedup-embedding-cosine", "sim-kmeans"),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-cluster the embeddings (integer-micro Lloyd, so
    training is partitioning-invariant and exactly reproducible in SQL),
    then emit cosine near-dup pairs WITHIN each cluster only.  The
    clustering bounds the pairwise term at O(n^2/k) vs the exact block
    grid's O(n^2) (``dedup_embedding_cosine``) — recall gives up only
    cross-cluster pairs, which near-dup geometry makes rare.  Threshold
    0.4 matches the exact entry (the fixture plants no vector dups), so
    the two entries' pair sets are directly comparable."""
    emb = _t(spark, sf_dir, "embeddings")
    ids, cen_micro = similarity.kmeans_centroids_micro(emb, k=_KM_K, iters=_KM_ITERS)
    return dedup.semantic_dedup_pairs(emb, (ids, cen_micro / 1e6), threshold=0.4)


_SEMANTIC_RECALL_SQL = f"""
WITH exact_p AS ({_EMB_COS_SQL}),
sem AS ({_SEMANTIC_DEDUP_SQL})
SELECT count(*) AS n_exact,
       sum(CASE WHEN s.id_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       round(sum(CASE WHEN s.id_a IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS pair_recall
FROM exact_p x LEFT JOIN sem s ON x.id_a = s.id_a AND x.id_b = s.id_b
"""


@register(
    "dedup_semantic_recall_report",
    oracle=_SEMANTIC_RECALL_SQL,
    survey_ids=("dedup-semantic", "dedup-embedding-cosine"),
)
def dedup_semantic_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair recall of the cluster-bounded semantic dedup vs the exact block
    grid — the quality lock for ``dedup_semantic``, mirroring the ANN
    recall reports: what fraction of TRUE near-dup pairs survive the
    within-cluster restriction.  Deterministic end-to-end, so the report
    itself is exactly oracle-checked.  At sf0.01 this reads 29/59 = 0.49 —
    a floor, not the operating point: the fixture's isotropic embeddings at
    threshold 0.4 make the weakest possible 'near-dups' (real corpora dedup
    at >= 0.9, where pairs co-locate in one cell); tests pin >= 0.45."""
    emb = _t(spark, sf_dir, "embeddings")
    exact_p = dedup.embedding_cosine_pairs(emb, threshold=0.4).select("id_a", "id_b")
    ids, cen_micro = similarity.kmeans_centroids_micro(emb, k=_KM_K, iters=_KM_ITERS)
    sem = (
        dedup.semantic_dedup_pairs(emb, (ids, cen_micro / 1e6), threshold=0.4)
        .select(F.col("id_a").alias("s_a"), F.col("id_b").alias("s_b"))
    )
    joined = exact_p.join(
        sem, (exact_p["id_a"] == sem["s_a"]) & (exact_p["id_b"] == sem["s_b"]), "left"
    )
    kept = F.when(F.col("s_a").isNotNull(), 1).otherwise(0)
    return joined.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(kept).alias("n_kept"),
        F.round(F.sum(kept) / F.count(F.lit(1)), 6).alias("pair_recall"),
    )


_SEMANTIC_CELL_STATS_SQL = f"""
WITH {_kmeans_micro_cte(_KM_K, _KM_ITERS)},
cen AS (SELECT cell AS cid, list_transform(cm, x -> x / 1000000.0) AS cv
        FROM cen{_KM_ITERS}),
asg AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT e.vec_id, cen.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_COS_PAIR.format(a='e.v', b='cen.cv')} DESC, cen.cid) AS rn
    FROM e CROSS JOIN cen
  ) WHERE rn = 1
),
sizes AS (
  SELECT a.cell, count(*) AS c, count(DISTINCT e.v) AS r
  FROM asg a JOIN e ON e.vec_id = a.vec_id
  GROUP BY a.cell
)
SELECT count(*) AS n_cells, max(c) AS max_cell, max(r) AS max_reps,
       sum(CASE WHEN r > 2048 THEN 1 ELSE 0 END)::BIGINT AS capped_cells
FROM sizes
"""


@register(
    "dedup_semantic_cell_stats",
    oracle=_SEMANTIC_CELL_STATS_SQL,
    survey_ids=("dedup-semantic", "sim-kmeans"),
)
def dedup_semantic_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-silent-caps companion to ``dedup_semantic`` (the semantic twin of
    ``dedup_simhash_bucket_stats``): per-cell population and DISTINCT-rep
    counts — ``capped_cells > 0`` means the rep-level star backstop engaged
    somewhere and k is undersized for the corpus. Must read 0 on the
    driver fixtures, which this entry proves every round."""
    emb = _t(spark, sf_dir, "embeddings")
    ids, cen_micro = similarity.kmeans_centroids_micro(emb, k=_KM_K, iters=_KM_ITERS)
    return dedup.semantic_cell_stats(emb, (ids, cen_micro / 1e6))


@register(
    "q_incremental_minmax_retract",
    oracle="""
SELECT o_custkey,
       round(min(round(o_totalprice, 6)::DECIMAL(28, 6)), 2)::DOUBLE AS min_price,
       round(max(round(o_totalprice, 6)::DECIMAL(28, 6)), 2)::DOUBLE AS max_price,
       count(*) AS cnt
FROM orders
WHERE o_orderkey % 10 = 0 OR o_orderkey % 7 <> 0
GROUP BY 1
""",
    survey_ids=("merge-ivm-agg-retract",),
)
def q_incremental_minmax_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM for a MIN/MAX view under retractions — the monoid-only case
    ``q_incremental_agg_retract`` excludes: the engine merges unaffected
    groups and re-aggregates ONLY groups where a retraction hit the stored
    extremum (plus brand-new groups), from net value multiplicities.  The
    oracle recomputes the final view outright, so it agrees only if the
    affected-group detection, the net-count rescan, and the monoid merge
    are all right."""
    from ..operators import merge

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice"), 6).cast("decimal(28,6)").alias("price"),
    )
    base = o.filter(F.col("o_orderkey") % 10 != 0).drop("o_orderkey")
    # the operator reads state/delta several times (affected-key probe,
    # count merge, monoid merge, rescan); in production both are STORED
    # tables — model that here, or every branch re-aggregates the base
    state = merge.build_extrema_state(
        base, ["o_custkey"], min_cols=["price"], max_cols=["price"]
    ).localCheckpoint(eager=False)
    delta = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("_w", F.lit(1))
        .unionByName(
            o.filter((F.col("o_orderkey") % 10 != 0) & (F.col("o_orderkey") % 7 == 0))
            .withColumn("_w", F.lit(-1))
        )
        .drop("o_orderkey")
        .localCheckpoint(eager=False)
    )
    new_state = merge.incremental_extrema_retract(
        base, state, delta, ["o_custkey"], min_cols=["price"], max_cols=["price"]
    )
    return new_state.select(
        "o_custkey",
        F.round(F.col("min_price"), 2).cast("double").alias("min_price"),
        F.round(F.col("max_price"), 2).cast("double").alias("max_price"),
        "cnt",
    )


@register(
    "text_bm25_topk",
    oracle="""
WITH toks AS (
  SELECT d.doc_id, t.tok AS term
  FROM documents d,
       unnest(list_filter(regexp_split_to_array(trim(d.text), '\\s+'), x -> x <> '')) AS t(tok)
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
corpus AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(dl) / count(*) FROM dl) AS avgdl
)
SELECT doc_id, term, round(raw_score, 6) AS score, rank
FROM (
  SELECT tf.doc_id, tf.term,
         ((c.n_docs - df.df + 0.5) / (df.df + 0.5))
         * ((tf.tf * 2.5) / (tf.tf + 1.5 * (0.25 + 0.75 * (dl.dl / c.avgdl)))) AS raw_score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY ((c.n_docs - df.df + 0.5) / (df.df + 0.5))
                    * ((tf.tf * 2.5) / (tf.tf + 1.5 * (0.25 + 0.75 * (dl.dl / c.avgdl)))) DESC,
                    tf.term
         ) AS rank
  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN corpus c
)
WHERE rank <= 3
""",
    survey_ids=("text-tfidf",),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by BM25 weight — the
    length-normalized retrieval scorer (rational Robertson idf, dyadic
    constants k1=1.5 / b=0.75, so every step is an exactly-rounded IEEE op
    and the oracle hash-matches)."""
    return text.bm25_topk(_t(spark, sf_dir, "documents"), k=3)


@register(
    "text_inverted_index",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT t.tok AS term, d.doc_id
  FROM documents d,
       unnest(list_filter(regexp_split_to_array(trim(d.text), '\\s+'), x -> x <> '')) AS t(tok)
)
SELECT term, count(*) AS df, list(doc_id ORDER BY doc_id) AS postings
FROM pairs
GROUP BY term
HAVING count(*) >= 2
   AND count(*) * 10 <= (SELECT count(*) FROM documents) * 9
""",
    survey_ids=("text-tfidf",),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list inverted index for terms with df in [2, 90% of the
    corpus] — the build-once probe-many structure behind retrieval /
    decontamination. The df band is declared query semantics (both bounds
    parameters; the ceiling is the integer-exact scale-relative
    ``df * 10 <= n_docs * 9``), not a silent cap."""
    return text.inverted_index(_t(spark, sf_dir, "documents"))


@register(
    "q_order_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
),
isl AS (
  SELECT o_custkey,
         (d - DATE '1970-01-01') - row_number() OVER (PARTITION BY o_custkey ORDER BY d) AS island
  FROM days
),
s AS (SELECT o_custkey, island, count(*) AS len FROM isl GROUP BY 1, 2)
SELECT o_custkey,
       max(len) AS max_streak_days,
       count(*) AS n_streaks,
       sum(len) AS active_days
FROM s GROUP BY o_custkey
""",
    survey_ids=("w3-sessionize",),
)
def q_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per customer, the longest run of consecutive
    order *days* plus streak count and total active days — the classic
    date - row_number() island trick, the calendar-granularity sibling of
    the event-time sessionize (`state.sessionize`,
    DwsTrafficVcChArIsNewPageViewWindow.java:100-123's keyed-state family).

    Scale shape: distinct (cust, day) collapses first (keyed shuffle with
    map-side combine), the window runs per customer over day counts (a few
    thousand rows max per key — bounded by the calendar, not the data),
    and both follow-up aggregates reuse the same key. Pure integers, so
    the oracle is hash-exact."""
    orders = _t(spark, sf_dir, "orders")
    return state.calendar_streaks(orders, "o_custkey", F.to_date("o_orderdate"))


@register(
    "q_table_profile",
    oracle="""
SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
       count(*) - count(o_orderkey) AS null_count, count(DISTINCT o_orderkey) AS distinct_count FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(*) - count(o_custkey), count(DISTINCT o_custkey) FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus) FROM orders
UNION ALL
SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice), count(DISTINCT o_totalprice) FROM orders
UNION ALL
SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate), count(DISTINCT o_orderdate) FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority), count(DISTINCT o_orderpriority) FROM orders
""",
    survey_ids=("p2-etl",),
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the orders table: per column, row / null /
    exact-distinct counts in ONE scan (multi-distinct planned via Expand
    with map-side partials; see operators/profile.py for the 100 TB
    trade-off vs the HLL sketch path)."""
    from ..operators.profile import table_profile

    return table_profile(_t(spark, sf_dir, "orders"))


@register(
    "multimodal_webp_meta",
    oracle="""
SELECT doc_id AS media_id,
       (doc_id % 611 + 1)::INT AS width,
       (doc_id % 433 + 1)::INT AS height,
       (CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END)::INT AS lossless,
       (CASE WHEN doc_id % 3 = 0 THEN 0 ELSE (doc_id // 3) % 2 END)::INT AS has_alpha,
       (CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END)::INT AS animated,
       (CASE WHEN doc_id % 3 = 2 THEN doc_id % 7 + 2 ELSE 1 END)::INT AS n_frames,
       (CASE WHEN doc_id % 3 = 2 THEN doc_id % 42 ELSE 0 END)::INT AS loop_count
FROM documents
""",
    survey_ids=("mm-decode",),
)
def multimodal_webp_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP metadata gate (r7): synthesize a structurally valid WebP per
    doc rotating through all three public header layouts (simple lossy
    VP8 sync-code header, simple lossless VP8L packed bitfield, extended
    VP8X canvas + ANIM/ANMF animation chunks, with odd-sized decoy ICCP /
    EXIF chunks exercising RIFF padding), then parse the headers back with
    the independent chunk walker: dimensions, lossless/alpha/animated
    flags, frame and loop counts — the modern-web image curation columns,
    no pixel decode (that stays behind the decode_media vendor seam).
    Oracle = seed arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "webp")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "image/webp")
    return multimodal.webp_meta(media)


@register(
    "emb_hygiene",
    oracle="""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(round(x, 6) * 1000000.0, 0) AS BIGINT)) AS m
  FROM embeddings
),
s AS (
  SELECT vec_id, m,
         list_sum(list_transform(m, x -> x * x)) AS nsq,
         list_sum(list_transform(m[1:16], x -> x * x)) AS nsq16
  FROM e
)
SELECT vec_id,
       round(sqrt(CAST(nsq AS DOUBLE)) / 1000000.0, 6) AS norm,
       round(sqrt(CAST(nsq16 AS DOUBLE)) / 1000000.0, 6) AS prefix_norm,
       CASE WHEN nsq16 = 0 THEN NULL
            ELSE list_transform(m[1:16],
                                x -> round(x / sqrt(CAST(nsq16 AS DOUBLE)), 6))
       END AS prefix_unit,
       CASE WHEN nsq = 0 THEN 1 ELSE 0 END AS is_zero
FROM s
""",
    survey_ids=("ann-brute",),
)
def emb_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene audit + Matryoshka truncate-renormalize (first 16
    dims): int64 micro-unit quantization makes every sum order-free and
    the sqrt/divide steps single exactly-rounded IEEE ops, so the oracle
    is hash-exact. Pure map-side Catalyst — no shuffle at any scale."""
    return similarity.embedding_hygiene(_t(spark, sf_dir, "embeddings"))


@register(
    "multimodal_flac_meta",
    oracle="""
SELECT doc_id AS media_id,
       ((doc_id % 48) * 1000 + 8000)::INT AS sample_rate,
       (doc_id % 8 + 1)::INT AS channels,
       (doc_id % 17 + 8)::INT AS bits_per_sample,
       (doc_id * 1000 + 1)::BIGINT AS total_samples,
       ((doc_id * 1000 + 1) * 1000 // ((doc_id % 48) * 1000 + 8000))::BIGINT AS duration_ms,
       (1 + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
          + (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END))::INT AS n_blocks
FROM documents
""",
    survey_ids=("mm-decode",),
)
def multimodal_flac_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC STREAMINFO gate (r7): synthesize a valid FLAC header chain per
    doc (STREAMINFO 20/3/5/36-bit packed word, decoy PADDING and
    VORBIS_COMMENT blocks, last-block flag), parse it back with the
    independent block walker: rate / channels / depth / exact sample count
    / duration — the lossless-audio curation columns, no frame decode
    (that stays behind the decode_media vendor seam). Oracle = seed
    arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "flac")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "audio/flac")
    return multimodal.flac_meta(media)


@register(
    "q_full_outer_join",
    oracle="""
WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000),
o AS (
  SELECT o_custkey, count(*) AS order_cnt
  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
)
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
       c.c_name,
       o.order_cnt,
       CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END AS cust_missing,
       CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END AS orders_missing
FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
""",
    survey_ids=("J2",),
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER equi-join with unmatched rows surviving from BOTH sides
    (the retract-join surface J2 covers only the left-preserving half of):
    high-balance customers vs open-order counts, each side filtered so
    both kinds of dangling rows exist. SortMergeJoin on the shuffled key —
    full-outer cannot broadcast (either side may need to emit unmatched),
    which is exactly how it should plan at scale."""
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_name")
    )
    ords = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
    )
    j = cust.join(ords, cust.c_custkey == ords.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        "order_cnt",
        F.when(F.col("c_custkey").isNull(), 1).otherwise(0).alias("cust_missing"),
        F.when(F.col("o_custkey").isNull(), 1).otherwise(0).alias("orders_missing"),
    )


@register(
    "q_range_frame_sum",
    oracle="""
SELECT o_orderkey,
       o_custkey,
       round(CAST(sum(price) OVER (
         PARTITION BY o_custkey ORDER BY day
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 2) AS trailing_30d
FROM (
  SELECT o_orderkey, o_custkey,
         (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS day,
         CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS price
  FROM orders
)
""",
    survey_ids=("A2",),
)
def q_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): per customer, the
    trailing-30-day revenue at each order — the frame is defined on the
    day VALUE, so all same-day peers enter together and within-frame row
    order cannot matter; summing DECIMAL(18,2) keeps it order-invariant
    exact. One Exchange + one Sort per customer; frames are bounded by
    the 30-day span, not row count."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")).alias("day"),
        F.round("o_totalprice", 2).cast("decimal(18,2)").alias("price"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("price").over(w).cast("double"), 2).alias("trailing_30d"),
    )


# =========================================================================
# Product-analytics suite (operators/analytics.py): funnel, retention,
# gap-fill, equi-depth buckets, histogram, data-quality audit
# =========================================================================


@register(
    "q_funnel_conversion",
    oracle="""
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' AND user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts >= s1.t GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'click' AND e.ts >= s2.t GROUP BY 1
),
s4 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 ON e.user_id = s3.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s3.t GROUP BY 1
)
SELECT 1 AS stage_index, 'signup' AS stage, (SELECT count(*) FROM s1) AS users
UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)
""",
    survey_ids=("A2", "W2"),
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel signup -> view -> click ->
    purchase over the events stream (the composition of the reference's
    per-step DWS windows, DwsUserUserLoginWindow.java:60-103). Each stage
    is a keyed join + min-agg over the previous stage's PER-USER THRESHOLD
    frame — see operators/analytics.funnel for the 100 TB argument."""
    from ..operators import analytics

    ev = _t(spark, sf_dir, "events")
    out = analytics.funnel(ev, ("signup", "view", "click", "purchase"))
    return out.withColumn("stage_index", F.col("stage_index").cast("int"))


@register(
    "q_retention_cohorts",
    oracle="""
WITH uw AS (
  SELECT DISTINCT user_id AS u, date_trunc('week', ts)::DATE AS w
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
first AS (SELECT u, min(w) AS cohort_week FROM uw GROUP BY 1),
act AS (
  SELECT uw.u, f.cohort_week,
         CAST((uw.w - f.cohort_week) // 7 AS INT) AS week_offset
  FROM uw JOIN first f ON uw.u = f.u
),
counted AS (
  SELECT cohort_week, week_offset, count(*) AS n_users
  FROM act GROUP BY 1, 2
),
base AS (
  SELECT cohort_week, n_users AS cohort_size FROM counted WHERE week_offset = 0
)
SELECT c.cohort_week, c.week_offset, c.n_users, b.cohort_size,
       round(c.n_users / b.cohort_size, 6) AS retained_ratio
FROM counted c JOIN base b ON c.cohort_week = b.cohort_week
""",
    survey_ids=("W2", "W4"),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle (cohort = Monday-truncated week of first
    event) — the batch generalization of the reference's is-new repair +
    returning-user gap logic (DwsUserUserLoginWindow.java:78-95): the W2
    ValueState answers 'is this the user's first week', W4's 7-day gap is
    week_offset >= 1. See operators/analytics.retention_cohorts."""
    from ..operators import analytics

    return analytics.retention_cohorts(_t(spark, sf_dir, "events"))


@register(
    "q_gap_fill_daily",
    oracle="""
WITH daily AS (
  SELECT event_type AS k, ts::DATE AS d, count(*) AS n,
         round(max(value), 2) AS mx
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value > 195
  GROUP BY 1, 2
),
span AS (SELECT k, min(d) AS lo, max(d) AS hi FROM daily GROUP BY 1),
calendar AS (
  SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM span
)
SELECT c.k AS event_type, c.d AS day,
       coalesce(dl.n, 0) AS n_events,
       CAST(CASE WHEN dl.n IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap,
       last_value(dl.mx IGNORE NULLS) OVER (
         PARTITION BY c.k ORDER BY c.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS carried_max_value
FROM calendar c LEFT JOIN daily dl ON c.k = dl.k AND c.d = dl.d
""",
    survey_ids=("A1", "A3"),
)
def q_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + forward fill over a sparse daily series
    (high-value events only, so real gaps exist at every SF): missing days
    get n_events=0/is_gap=1 and carry the last observed max forward —
    what Flink's continuously-firing windows give for free and a batch
    engine must synthesize (DwsTrafficVcChArIsNewPageViewWindow.java's
    dense emission). Window runs over the bounded per-key calendar frame,
    never raw events — operators/analytics.gap_fill_daily."""
    from ..operators import analytics

    ev = _t(spark, sf_dir, "events").where(F.col("value") > 195)
    return analytics.gap_fill_daily(ev)


@register(
    "q_equidepth_buckets",
    oracle="""
WITH ranked AS (
  SELECT o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
         count(*) OVER () AS n
  FROM orders
)
SELECT CAST(((rnk - 1) * 8) // n + 1 AS INT) AS bucket,
       count(*) AS n_rows,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM ranked GROUP BY 1
""",
    survey_ids=("A2",),
)
def q_equidepth_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (octile) bucketing of order value — the quantile-binning
    step behind quality-score stratification. The global rank that makes
    this a skew trap (row_number with no PARTITION BY = one task) runs as
    skew.two_phase_rank over value-range buckets; only the tiny bucket-
    count frame sees a global window. Bucket = ((rank-1)*8) div n + 1 in
    integer arithmetic — identical formula in the oracle, hash-exact."""
    from ..operators import analytics

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return analytics.equidepth_buckets(
        o, "o_totalprice", "o_orderkey", k=8, bucket_width=25000.0
    )


@register(
    "q_value_histogram",
    oracle="""
SELECT CAST(floor(o_totalprice / 20000.0) AS BIGINT) AS bin,
       count(*) AS n_rows,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders WHERE o_totalprice IS NOT NULL
GROUP BY 1
""",
    survey_ids=("A1",),
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (bin = floor(v / 20000)): one
    keyed shuffle with map-side partials, bin cardinality bounded by the
    value range — the distribution-profile dual of q_equidepth_buckets
    (fixed width vs fixed depth). floor of an IEEE division is
    bit-identical across engines."""
    from ..operators import analytics

    return analytics.value_histogram(
        _t(spark, sf_dir, "orders"), "o_totalprice", 20000.0
    )


@register(
    "q_dq_audit",
    oracle="""
SELECT 'orphan_order_custkey' AS check_name,
       (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_bad,
       (SELECT count(*) FROM orders) AS n_total
UNION ALL
SELECT 'orphan_lineitem_orderkey',
       (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
       (SELECT count(*) FROM lineitem)
UNION ALL
SELECT 'dup_orderkey',
       (SELECT coalesce(sum(c), 0) FROM (
          SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1)),
       (SELECT count(*) FROM orders)
UNION ALL
SELECT 'null_custkey',
       (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
       (SELECT count(*) FROM orders)
UNION ALL
SELECT 'nonpositive_totalprice',
       (SELECT count(*) FROM orders WHERE o_totalprice <= 0),
       (SELECT count(*) FROM orders)
""",
    survey_ids=("P2", "P6"),
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit in one result set: referential orphans (anti
    joins), duplicate-PK mass, null and domain violations — the batch
    generalization of the reference's dirty-data side-output routing
    (DwdBaseLog.java:216-239 dead-letter split). Anti joins are keyed
    (AQE picks broadcast when the dim side is small); duplicate mass is
    a keyed count-filter-sum; everything else is a scan aggregate. All
    integer counts, hash-exact."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")

    def _row(name: str, bad: DataFrame, total: DataFrame) -> DataFrame:
        b = bad.agg(F.count(F.lit(1)).cast("long").alias("n_bad"))
        t = total.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        return b.crossJoin(t).select(
            F.lit(name).alias("check_name"), "n_bad", "n_total"
        )

    orphan_o = o.where(F.col("o_custkey").isNotNull()).join(
        c, o["o_custkey"] == c["c_custkey"], "left_anti"
    )
    orphan_l = li.where(F.col("l_orderkey").isNotNull()).join(
        o, li["l_orderkey"] == o["o_orderkey"], "left_anti"
    )
    dup_mass = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") > 1)
        .agg(F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_bad"))
    )
    dup_row = dup_mass.crossJoin(
        o.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    ).select(F.lit("dup_orderkey").alias("check_name"), "n_bad", "n_total")

    out = _row("orphan_order_custkey", orphan_o, o)
    out = out.unionByName(_row("orphan_lineitem_orderkey", orphan_l, li))
    out = out.unionByName(dup_row)
    out = out.unionByName(_row("null_custkey", o.where(F.col("o_custkey").isNull()), o))
    out = out.unionByName(
        _row("nonpositive_totalprice", o.where(F.col("o_totalprice") <= 0), o)
    )
    return out


@register(
    "multimodal_tiff_meta",
    oracle="""
SELECT doc_id AS media_id,
       (doc_id % 509 + 1)::INT AS width,
       (doc_id % 389 + 1)::INT AS height,
       (CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END)::INT AS n_samples,
       8::INT AS bits_per_sample,
       (CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)::INT AS compressed,
       (doc_id % 8 + 1)::INT AS orientation,
       (CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END)::INT AS n_pages
FROM documents
""",
    survey_ids=("mm-decode",),
)
def multimodal_tiff_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF metadata gate: synthesize a structurally valid TIFF per doc
    (both II/MM byte orders, out-of-line BitsPerSample and RATIONAL
    resolutions, odd-length ASCII decoys, strip decoys, chained second
    page every third doc), then parse the IFD chain back with the
    independent directory walker: dimensions, samples, bit depth,
    compression flag, orientation, page count — the archival/scan image
    curation columns, no strip decode (that stays behind the decode_media
    vendor seam). The EXIF IFD inside multimodal_jpeg_meta is this exact
    structure — one parser family, two container entries. Oracle = seed
    arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "tiff")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "image/tiff")
    return multimodal.tiff_meta(media)


@register(
    "graph_triangle_count",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e AS (
  SELECT x AS a, y AS b FROM pairs
  WHERE {md5_long_sql_duckdb("x || '-' || y")} % 3 = 0
),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
verts AS (
  SELECT x AS vertex FROM t
  UNION ALL SELECT y FROM t
  UNION ALL SELECT z FROM t
)
SELECT vertex, count(*) AS n_triangles FROM verts GROUP BY 1
""",
    survey_ids=("graph-pagerank",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the co-order parts graph (parts appearing in
    the same order, hash-sampled to ~1/3 of pairs). This graph's density
    FALLS with scale — pairs per order are bounded by C(lines, 2) <= 21
    while the vertex set grows with the part count, so expected degree
    stays constant and the triangle mass grows ~linearly (measured: 5.8%
    dense at sf0.01, 0.6% at sf0.1). The earlier co-supply formulation was
    ~33% of the complete supplier graph at every SF — triangle output grew
    cubically in the vertex count, a fixture defect, not an operator one.
    The Spark side runs the degree-ordered wedge enumeration
    (graph.triangle_count — O(m^1.5), celebrity-vertex safe); the oracle
    is the INDEPENDENT naive a<b<c triple join, feasible only at fixture
    scale — agreeing answers from two different algorithms is the point.
    Integer-exact."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("pa"), li.alias("pb")
    pairs = (
        a.join(
            b,
            (F.col("pa.l_orderkey") == F.col("pb.l_orderkey"))
            & (F.col("pa.l_partkey") < F.col("pb.l_partkey")),
        )
        .select(F.col("pa.l_partkey").alias("x"), F.col("pb.l_partkey").alias("y"))
        .distinct()
    )
    edges = pairs.where(
        md5_long(F.concat_ws("-", F.col("x"), F.col("y"))) % 3 == 0
    )
    return graph.triangle_count(edges, "x", "y")


@register(
    "graph_connected_components",
    oracle=f"""
WITH RECURSIVE
ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
prs AS (
  SELECT DISTINCT a.s AS x, b.s AS y FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
),
e AS (
  SELECT x AS a, y AS b FROM prs
  WHERE {md5_long_sql_duckdb("x || '-' || y")} % 3 = 0
),
und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
reach AS (
  SELECT a AS src, b AS dst FROM und
  UNION
  SELECT r.src, u.b AS dst FROM reach r JOIN und u ON r.dst = u.a
),
verts AS (SELECT DISTINCT s AS v FROM ps)
SELECT v AS supplier, least(v, coalesce(min(r.dst), v)) AS component_id
FROM verts LEFT JOIN reach r ON r.src = v
GROUP BY v
""",
    survey_ids=("graph-pagerank",),
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the hash-sampled co-supply graph (same
    edge set as graph_triangle_count): component_id = smallest reachable
    supplier id. The Spark side is the iterative min-label propagation
    already powering near-dup clustering (dedup.dedup_clusters —
    O(diameter) keyed-join rounds, lineage cut per round via eager local
    checkpoints); the oracle computes full transitive closure with a
    recursive CTE — a formulation only feasible at fixture scale, which is
    exactly why two independent algorithms agreeing is the check.
    Integer-exact."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")).distinct()
    a, b = ps.alias("ca"), ps.alias("cb")
    pairs = (
        a.join(b, (F.col("ca.p") == F.col("cb.p")) & (F.col("ca.s") < F.col("cb.s")))
        .select(F.col("ca.s").alias("x"), F.col("cb.s").alias("y"))
        .distinct()
    )
    edges = pairs.where(
        md5_long(F.concat_ws("-", F.col("x"), F.col("y"))) % 3 == 0
    ).select(F.col("x").alias("id_a"), F.col("y").alias("id_b"))
    verts = ps.select(F.col("s").alias("supplier")).distinct()
    out = dedup.dedup_clusters(verts, edges, id_col="supplier")
    return out.withColumnRenamed("cluster_id", "component_id")


@register(
    "q_unpivot_metrics",
    oracle="""
SELECT o_orderkey, 'total_price' AS metric, round(o_totalprice, 2) AS value
FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, 'cust_key', CAST(o_custkey AS DOUBLE) FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, 'order_epoch_day', CAST(o_orderdate::DATE - DATE '1970-01-01' AS DOUBLE)
FROM orders WHERE o_orderstatus = 'F'
""",
    survey_ids=("R2",),
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long melt): three typed metrics per order become
    (key, metric, value) rows — the R2 array-flatten's relational dual and
    the standard shape for metric stores. Spark's native unpivot plans an
    Expand (each input row emits k rows map-side, no shuffle at all); the
    oracle is the equivalent UNION ALL. Values are exact (round/cast,
    no arithmetic)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    wide = o.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total_price"),
        F.col("o_custkey").cast("double").alias("cust_key"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("double")
        .alias("order_epoch_day"),
    )
    return wide.unpivot(
        ["o_orderkey"],
        ["total_price", "cust_key", "order_epoch_day"],
        "metric",
        "value",
    )


@register(
    "q_time_weighted_avg",
    oracle="""
WITH held AS (
  SELECT user_id AS k,
         CAST(round(value, 2) AS DECIMAL(18,2)) AS v,
         ts AS t,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, CAST(round(value, 2) AS DECIMAL(18,2))) AS nxt
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
),
agg AS (
  SELECT k,
         sum(v * (epoch_us(nxt) - epoch_us(t))) AS mass,
         sum(epoch_us(nxt) - epoch_us(t)) AS span
  FROM held WHERE nxt IS NOT NULL GROUP BY k
)
SELECT k AS user_id,
       round(CAST(mass AS DOUBLE) / CAST(span AS DOUBLE), 6) AS twavg,
       CAST(span AS BIGINT) AS held_micros
FROM agg
""",
    survey_ids=("A2", "J3"),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the event value (zero-order hold:
    each value is weighted by the microseconds until the user's next
    event) — the correct mean for irregularly-sampled series, where plain
    AVG over-weights bursts. DECIMAL(38,2) mass x integer-microsecond
    durations keep the aggregation order-invariant exact; one final IEEE
    division both engines share. See operators/analytics.time_weighted_avg
    for the skew story (same two-phase recipe as sessionize if a key
    floods)."""
    from ..operators import analytics

    return analytics.time_weighted_avg(_t(spark, sf_dir, "events"))


@register(
    "q_rank_distribution",
    oracle="""
WITH c AS (
  SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS bal FROM customer
)
SELECT c_custkey, c_nationkey, bal,
       row_number() OVER w AS rnk,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       lag(bal) OVER w AS prev_bal,
       round(bal - lag(bal) OVER w, 2) AS step
FROM c
WINDOW w AS (PARTITION BY c_nationkey ORDER BY bal, c_custkey)
""",
    survey_ids=("A2",),
)
def q_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-window surface (row_number / percent_rank / cume_dist /
    lag) computed WITHOUT a per-key single-task sort: skew.two_phase_rank
    gives the unique (value, id) rank per nation, per-key counts give
    n, and — because the ordering is unique, making every row its own peer
    group — percent_rank = (rnk-1)/(n-1), cume_dist = rnk/n follow
    arithmetically; lag is a keyed self-join on (key, rnk-1). The oracle
    is the standard window formulation — same numbers, different plan: the
    hot key's rows never gather into one task here, which is the 100 TB
    difference. Ratios are single IEEE divisions of exact integers."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.round("c_acctbal", 2).alias("bal")
    )
    ranked = skew.two_phase_rank(
        c, "c_nationkey", "bal", "c_custkey", bucket_width=500.0, rank_col="rnk"
    )
    n = ranked.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("_n"))
    prev = ranked.select(
        F.col("c_nationkey").alias("_pk"),
        (F.col("rnk") + 1).alias("_prnk"),
        F.col("bal").alias("prev_bal"),
    )
    out = (
        ranked.join(n, "c_nationkey")
        .join(
            prev,
            (F.col("c_nationkey") == F.col("_pk")) & (F.col("rnk") == F.col("_prnk")),
            "left",
        )
        .select(
            "c_custkey",
            "c_nationkey",
            "bal",
            "rnk",
            F.when(F.col("_n") == 1, F.lit(0.0))
            .otherwise(F.round((F.col("rnk") - 1) / (F.col("_n") - 1), 6))
            .alias("pct_rank"),
            F.round(F.col("rnk") / F.col("_n"), 6).alias("cume"),
            "prev_bal",
            F.round(F.col("bal") - F.col("prev_bal"), 2).alias("step"),
        )
    )
    return out


@register(
    "q_rolling_wau",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id AS u, ts::DATE AS d FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
days AS (SELECT DISTINCT d FROM ud),
win AS (
  SELECT DISTINCT ud.u, days.d
  FROM ud JOIN days ON days.d >= ud.d AND days.d <= ud.d + INTERVAL 6 DAY
)
SELECT d AS day, count(*) AS wau FROM win GROUP BY 1
""",
    survey_ids=("A4", "W3"),
)
def q_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the sliding-window DISTINCT
    that a naive window function cannot express (COUNT(DISTINCT) over a
    RANGE frame isn't supported, and recomputing distinct per day rescans
    everything). The scalable shape: collapse to distinct (user, day)
    FIRST, then each pair contributes to exactly 7 window-days via a
    bounded explode(sequence), distinct again, and count — work is
    7 x |user-days|, independent of raw event volume. The oracle joins a
    calendar instead (feasible only at fixture scale). Only days that
    appear in the data are reported (declared semantics: a day with zero
    events has no row). Integer-exact."""
    ev = _t(spark, sf_dir, "events")
    ud = (
        ev.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(F.col("user_id").alias("u"), F.to_date("ts").alias("d"))
        .distinct()
    )
    days = ud.select("d").distinct()
    expanded = ud.select(
        "u",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6), F.expr("interval 1 day"))
        ).alias("wd"),
    ).distinct()
    # keep only window-days that exist in the data (join on the small
    # distinct-days frame; broadcast)
    present = expanded.join(
        F.broadcast(days).withColumnRenamed("d", "wd"), "wd"
    )
    return present.groupBy(F.col("wd").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("wau")
    )


@register(
    "q_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
cnt AS (
  SELECT src, dst, count(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT src, sum(n) AS n_src FROM cnt GROUP BY 1)
SELECT c.src, c.dst, c.n, round(c.n / t.n_src, 6) AS p
FROM cnt c JOIN tot t ON c.src = t.src
""",
    survey_ids=("A2", "graph-pagerank"),
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    count (src -> next) pairs, normalize per source — the behavioral model
    behind next-event prediction and the probabilistic sibling of the
    pagerank click-graph (graph.transition_edges). The lead runs through
    skew.two_phase_shift(mode="auto") over the unique (ts, event_id)
    order — hourly-bucketed when the row estimate says a key could be
    hot, so no user's lifetime ever sorts in one task (VERDICT r7 #1);
    counts shuffle once keyed on (src, dst), and the normalization joins
    a 5x5 frame. Counts are exact; p is one IEEE division both engines
    share."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    seq = skew.two_phase_shift(
        ev,
        "user_id",
        ["ts", "event_id"],
        ["event_type"],
        skew.hour_bucket("ts"),
        mode="auto",
    ).select(
        F.col("event_type").alias("src"),
        F.col("event_type_lead").alias("dst"),
    ).where(F.col("dst").isNotNull())
    cnt = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cnt.groupBy("src").agg(F.sum("n").alias("_n_src"))
    return cnt.join(tot, "src").select(
        "src", "dst", "n", F.round(F.col("n") / F.col("_n_src"), 6).alias("p")
    )


@register(
    "q_mode_per_group",
    oracle="""
WITH cnt AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS n
  FROM customer GROUP BY 1, 2
)
SELECT c_nationkey, c_mktsegment AS mode_segment, n AS mode_count
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY c_nationkey ORDER BY n DESC, c_mktsegment
  ) AS rn FROM cnt
)
WHERE rn = 1
""",
    survey_ids=("A2",),
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group (most frequent market segment per
    nation, ties broken by segment name ascending — declared, not
    incidental): two keyed aggregates with map-side partials, no window,
    no sort of raw rows. Spark side uses min_by over the (-count, value)
    struct; the oracle mirrors with a rank-1 window over the counts frame.
    Integer-exact."""
    c = _t(spark, sf_dir, "customer")
    cnt = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return cnt.groupBy("c_nationkey").agg(
        F.min_by(
            "c_mktsegment", F.struct((-F.col("n")).alias("neg"), F.col("c_mktsegment"))
        ).alias("mode_segment"),
        F.max("n").alias("mode_count"),
    )


@register(
    "q_weighted_median",
    oracle="""
WITH r AS (
  SELECT l.l_suppkey, round(l.l_extendedprice, 2) AS price, l.l_quantity AS w,
         sum(l.l_quantity) OVER (
           PARTITION BY l.l_suppkey
           ORDER BY round(l.l_extendedprice, 2), l.l_orderkey, l.l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_w,
         sum(l.l_quantity) OVER (PARTITION BY l.l_suppkey) AS total_w
  FROM lineitem l
)
SELECT l_suppkey,
       min(price) FILTER (WHERE cum_w * 2 >= total_w) AS weighted_median_price,
       max(total_w) AS total_quantity
FROM r GROUP BY l_suppkey
""",
    survey_ids=("A2",),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (lower) of line price per supplier, weighted
    by quantity: the first price (in (price, orderkey, linenumber) order)
    whose inclusive cumulative weight reaches half the total. The
    cumulative weight — the skew trap, since a running total over raw rows
    normally pins a key to one task — comes from skew.two_phase_cumsum
    (two_phase_rank's weighted generalization: local prefix within value
    buckets + one window over the tiny (key, bucket) totals frame). The
    oracle is the standard one-window formulation. Quantities are integral
    doubles far below 2^53, so every partial sum is exact in any order."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round("l_extendedprice", 2).alias("price"),
        F.col("l_quantity").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    # unique per-key order: (price, orderkey, linenumber); the *10 packing
    # is collision-free because l_linenumber <= 7 by TPC-H construction
    cum = skew.two_phase_cumsum(
        li.withColumn(
            "_tb",
            F.col("l_orderkey") * 10 + F.col("l_linenumber"),
        ),
        "l_suppkey",
        "price",
        "_tb",
        "w",
        bucket_width=5000.0,
    )
    return cum.groupBy("l_suppkey").agg(
        F.min(F.when(F.col("cum_w") * 2 >= F.col("total_w"), F.col("price"))).alias(
            "weighted_median_price"
        ),
        F.max("total_w").alias("total_quantity"),
    )


@register(
    "q_linear_trend",
    oracle="""
WITH q AS (
  SELECT event_type,
         epoch_us(ts) // 1000000 AS xs,
         CAST(round(round(value, 6) * 1000000.0, 0) AS BIGINT) AS ym
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
),
base AS (SELECT event_type, min(xs) AS x0 FROM q GROUP BY 1),
c AS (
  SELECT q.event_type, (q.xs - b.x0) AS x, q.ym AS y
  FROM q JOIN base b ON q.event_type = b.event_type
),
s AS (
  SELECT event_type,
         count(*) AS n,
         sum(x) AS sx,
         sum(y) AS sy,
         sum(x * y) AS sxy,
         sum(x * x) AS sxx
  FROM c GROUP BY 1
)
SELECT event_type, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) * 86400.0 / 1000000.0, 6) AS slope_per_day,
       round((CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) / 1000000.0, 6) AS intercept
FROM s
""",
    survey_ids=("A2",),
)
def q_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ordinary-least-squares trend: per event type, the slope
    (micro-units/second scaled to value-units/day) and intercept of value
    against time, from the closed-form normal equations. All five
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) are EXACT integer sums —
    y is micro-unit-quantized (emb_hygiene's recipe) and x is seconds
    re-based to the group minimum so Σx² stays ~1e18, far inside BIGINT —
    making the aggregation order-free and the oracle hash-exact; the two
    final divisions are the only floats and both engines IEEE-share them.
    One pass for the per-group re-base minimum, one for the statistics —
    both keyed aggregates with map-side partials, no window, no collect.
    The classic map-reduce formulation of regression at 100 TB."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    q = ev.select(
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
        .cast("long")
        .alias("xs"),
        F.round(F.round("value", 6) * 1_000_000.0, 0).cast("long").alias("ym"),
    )
    base = q.groupBy("event_type").agg(F.min("xs").alias("_x0"))
    c = q.join(base, "event_type").select(
        "event_type",
        (F.col("xs") - F.col("_x0")).alias("x"),
        F.col("ym").alias("y"),
    )
    # decimal sums: long x long products can pass 2^63 at scale (DuckDB
    # promotes to HUGEINT; Spark longs would wrap silently)
    xd = F.col("x").cast("decimal(20,0)")
    yd = F.col("y").cast("decimal(20,0)")
    s = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
    )
    nd = F.col("n").cast("decimal(20,0)")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    return s.select(
        "event_type",
        "n",
        F.round(slope * 86400.0 / 1_000_000.0, 6).alias("slope_per_day"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
            / 1_000_000.0,
            6,
        ).alias("intercept"),
    )


@register(
    "q_grouping_sets",
    oracle="""
SELECT grouping(o_orderstatus) AS g_status,
       grouping(o_orderpriority) AS g_priority,
       o_orderstatus, o_orderpriority,
       count(*) AS n,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority), ())
""",
    survey_ids=("A1", "A3"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (each dimension alone, the cross, and the
    grand total) with grouping() indicator columns — completing the
    grouped-aggregation surface next to q_rollup and q_cube_counts. Spark
    plans ONE scan + one Expand (4 replicas map-side) + one shuffle; at
    scale the Expand multiplies map output, which is the documented cost
    of multi-set aggregation vs running the sets separately (4 scans).
    Indicator + count + min/max only: integer/rounded-exact."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return o.sparkSession.sql(
        """
        SELECT grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_priority,
               o_orderstatus, o_orderpriority,
               count(*) AS n,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority), ())
        """
    ).withColumn("g_status", F.col("g_status").cast("int")).withColumn(
        "g_priority", F.col("g_priority").cast("int")
    )


@register(
    "q_grouped_correlation",
    oracle="""
WITH q AS (
  SELECT event_type,
         epoch_us(ts) // 1000000 AS xs,
         CAST(round(round(value, 6) * 1000000.0, 0) AS BIGINT) AS ym
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
),
base AS (SELECT event_type, min(xs) AS x0 FROM q GROUP BY 1),
c AS (SELECT q.event_type, (q.xs - b.x0) AS x, q.ym AS y FROM q JOIN base b USING (event_type)),
s AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM c GROUP BY 1
)
SELECT event_type, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6) AS pearson_r
FROM s
""",
    survey_ids=("A2",),
)
def q_grouped_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Pearson correlation of value against time from the same
    exact integer sufficient statistics as q_linear_trend (plus Σy²):
    decimal sums make the aggregation order-free; r is two IEEE sqrt/
    divide steps both engines share. The built-in F.corr is the
    convenience path but accumulates in floats (order-dependent at the
    ulp level, unusable for a hash gate) — the sufficient-statistics
    formulation is both the exact one and the map-reduce-friendly one."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    q = ev.select(
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
        .cast("long")
        .alias("xs"),
        F.round(F.round("value", 6) * 1_000_000.0, 0).cast("long").alias("ym"),
    )
    base = q.groupBy("event_type").agg(F.min("xs").alias("_x0"))
    c = q.join(base, "event_type").select(
        "event_type",
        (F.col("xs") - F.col("_x0")).alias("x"),
        F.col("ym").alias("y"),
    )
    xd = F.col("x").cast("decimal(20,0)")
    yd = F.col("y").cast("decimal(20,0)")
    s = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    nd = F.col("n").cast("decimal(20,0)")
    return s.select(
        "event_type",
        "n",
        F.round(
            (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt((nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
            / F.sqrt((nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
            6,
        ).alias("pearson_r"),
    )


@register(
    "q_daily_anomalies",
    oracle="""
WITH d AS (
  SELECT event_type, ts::DATE AS day, count(*) AS n
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
s AS (
  SELECT event_type, count(*) AS k, sum(n) AS sn, sum(n * n) AS snn
  FROM d GROUP BY 1
)
SELECT d.event_type, d.day, d.n,
       round(CAST(d.n * s.k - s.sn AS DOUBLE)
             / sqrt(CAST(s.k * s.snn - s.sn * s.sn AS DOUBLE)), 6) AS z_num_scaled,
       CASE WHEN abs(CAST(d.n * s.k - s.sn AS DOUBLE))
                 > 2.0 * sqrt(CAST(s.k * s.snn - s.sn * s.sn AS DOUBLE))
            THEN 1 ELSE 0 END AS is_anomaly
FROM d JOIN s USING (event_type)
""",
    survey_ids=("A1", "P2"),
)
def q_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly gate over daily event volumes: a day is anomalous
    when |n - mean| > 2 sigma within its event type. Rearranged to clear
    denominators — compare ``|n*k - sum(n)|`` against
    ``2*sqrt(k*sum(n^2) - sum(n)^2)`` — so every input to the one sqrt
    and one divide is an EXACT integer (counts and counts-of-squares);
    the flag is a comparison both engines evaluate on identical doubles.
    Two keyed aggregates over the bounded per-(type, day) frame; the
    monitoring primitive a curation pipeline runs on every ingest."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("sn"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
    )
    j = d.join(s, "event_type")
    num = (F.col("n") * F.col("k") - F.col("sn")).cast("double")
    var = (F.col("k") * F.col("snn") - F.col("sn") * F.col("sn")).cast("double")
    return j.select(
        "event_type",
        "day",
        "n",
        F.round(num / F.sqrt(var), 6).alias("z_num_scaled"),
        F.when(F.abs(num) > 2.0 * F.sqrt(var), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_anomaly"),
    )


@register(
    "q_last_touch_attribution",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w AS last_click_id,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER w AS last_click_ts,
         min(CASE WHEN event_type = 'view' THEN ts END) OVER w AS first_view_ts
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       last_click_id,
       CAST(CASE WHEN last_click_ts IS NOT NULL
                 THEN epoch_us(ts) // 1000000 - epoch_us(last_click_ts) // 1000000 END
            AS BIGINT) AS secs_since_click,
       first_view_ts
FROM e WHERE event_type = 'purchase'
""",
    survey_ids=("W2", "J4"),
)
def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: for every purchase, the user's most recent
    click at-or-before it (last touch — carry-forward of click ids/times
    over the unique (ts, event_id) order) and their earliest view so far
    (first touch — running min). Both prefix scans run through
    skew.two_phase_prefix(mode="auto") over the unique (ts, event_id)
    order — hourly-bucketed when the row estimate says a key could be
    hot, so carry-forwards stitch with each bucket's last carried value
    instead of sorting a flooding user's lifetime in one task (VERDICT
    r7 #1). Integer/timestamp-exact."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    pre = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("_ck_id"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("_ck_ts"),
        F.when(F.col("event_type") == "view", F.col("ts")).alias("_vw_ts"),
    )
    carried = skew.two_phase_prefix(
        pre,
        "user_id",
        ["ts", "event_id"],
        carry_cols=["_ck_id", "_ck_ts"],
        min_cols=["_vw_ts"],
        bucket=skew.hour_bucket("ts"),
        mode="auto",
    ).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.col("_ck_id_pfx").alias("last_click_id"),
        F.col("_ck_ts_pfx").alias("last_click_ts"),
        F.col("_vw_ts_pfx").alias("first_view_ts"),
    )
    return carried.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_id",
        F.when(
            F.col("last_click_ts").isNotNull(),
            (
                F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
            ).cast("long")
            - (
                F.unix_micros(F.col("last_click_ts").cast("timestamp")) / 1_000_000
            ).cast("long"),
        ).cast("long").alias("secs_since_click"),
        "first_view_ts",
    )


@register(
    "q_type_entropy",
    oracle="""
WITH d AS (
  SELECT ts::DATE AS day, event_type, count(*) AS n
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT day, sum(n) AS nd, count(*) AS k FROM d GROUP BY 1),
terms AS (
  SELECT d.day, t.nd, t.k,
         CAST(round(-(CAST(d.n AS DOUBLE) / t.nd) * ln(CAST(d.n AS DOUBLE) / t.nd), 9)
              AS DECIMAL(18,9)) AS term
  FROM d JOIN tot t USING (day)
)
SELECT day, max(nd) AS n_events, max(k) AS n_types,
       round(CAST(sum(term) AS DOUBLE), 6) AS entropy,
       round(CAST(sum(term) AS DOUBLE) / ln(CAST(max(k) AS DOUBLE)), 6) AS norm_entropy
FROM terms GROUP BY day
""",
    survey_ids=("A1", "text-quality"),
)
def q_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Shannon entropy of the event-type mix (plus the 0..1
    normalized form) — the distribution-drift monitor a curation pipeline
    watches next to q_daily_anomalies. Float discipline: each -p*ln(p)
    term rounds to 9 places and sums as DECIMAL(18,9), so the
    order-dependence of float addition never reaches the result; ln is
    libm-identical across engines (proven by the A-ES sampler's hash-green
    ln keys). Counts shuffle once keyed on (day, type); the entropy
    aggregate groups a frame bounded by days x types."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    d = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = d.groupBy("day").agg(
        F.sum("n").alias("nd"), F.count(F.lit(1)).alias("k")
    )
    p = F.col("n").cast("double") / F.col("nd")
    terms = d.join(tot, "day").select(
        "day",
        "nd",
        "k",
        F.round(-p * F.log(p), 9).cast("decimal(18,9)").alias("term"),
    )
    return terms.groupBy("day").agg(
        F.max("nd").cast("long").alias("n_events"),
        F.max("k").cast("long").alias("n_types"),
        F.round(F.sum("term").cast("double"), 6).alias("entropy"),
        F.round(
            F.sum("term").cast("double") / F.log(F.max("k").cast("double")), 6
        ).alias("norm_entropy"),
    )


@register(
    "q_audience_overlap",
    oracle="""
WITH a AS (
  SELECT DISTINCT event_type AS t, user_id AS u FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
sz AS (SELECT t, count(*) AS n FROM a GROUP BY 1),
inter AS (
  SELECT x.t AS t1, y.t AS t2, count(*) AS n_both
  FROM a x JOIN a y ON x.u = y.u AND x.t < y.t
  GROUP BY 1, 2
)
SELECT i.t1, i.t2, i.n_both, s1.n AS n1, s2.n AS n2,
       round(i.n_both / (s1.n + s2.n - i.n_both), 6) AS jaccard,
       round(i.n_both / least(s1.n, s2.n), 6) AS overlap_coef
FROM inter i JOIN sz s1 ON i.t1 = s1.t JOIN sz s2 ON i.t2 = s2.t
""",
    survey_ids=("A4", "dedup-exact"),
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: Jaccard and Szymkiewicz-
    Simpson coefficients over distinct user sets — the audience-analysis
    dual of document Jaccard. Events collapse to distinct (type, user)
    FIRST (one keyed shuffle); the pair join is keyed on user with the
    t1 < t2 triangle filter, so work is sum of per-user type-pair counts
    (bounded by C(5,2) per user), never users x users. Exact integers plus
    two shared IEEE divisions."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    a = ev.select(F.col("event_type").alias("t"), F.col("user_id").alias("u")).distinct()
    sz = a.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n"))
    x, y = a.alias("x"), a.alias("y")
    inter = (
        x.join(y, (F.col("x.u") == F.col("y.u")) & (F.col("x.t") < F.col("y.t")))
        .groupBy(F.col("x.t").alias("t1"), F.col("y.t").alias("t2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    s1 = sz.select(F.col("t").alias("t1"), F.col("n").alias("n1"))
    s2 = sz.select(F.col("t").alias("t2"), F.col("n").alias("n2"))
    return (
        inter.join(s1, "t1")
        .join(s2, "t2")
        .select(
            "t1",
            "t2",
            "n_both",
            "n1",
            "n2",
            F.round(
                F.col("n_both") / (F.col("n1") + F.col("n2") - F.col("n_both")), 6
            ).alias("jaccard"),
            F.round(F.col("n_both") / F.least("n1", "n2"), 6).alias("overlap_coef"),
        )
    )


@register(
    "q_pareto_concentration",
    oracle="""
WITH per_user AS (
  SELECT user_id, count(*) AS n FROM events
  WHERE user_id IS NOT NULL GROUP BY 1
),
r AS (
  SELECT user_id, n,
         sum(n) OVER (ORDER BY n DESC, user_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         sum(n) OVER () AS total_n,
         row_number() OVER (ORDER BY n DESC, user_id) AS rnk,
         count(*) OVER () AS n_users
  FROM per_user
)
SELECT CAST((rnk * 10 - 1) // n_users + 1 AS INT) AS decile,
       max(rnk) AS users_through,
       max(cum_n) AS events_through,
       round(max(cum_n) / max(total_n), 6) AS share_through
FROM r GROUP BY 1
""",
    survey_ids=("A2",),
)
def q_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration (Pareto/whale curve): rank users by event
    count descending and report, at each population decile, the
    cumulative share of all events the top users produce. The global
    ordered prefix — normally a one-task sort+scan — reuses BOTH two-phase
    tools: two_phase_rank for the descending rank and two_phase_cumsum
    for the running event total (constant key; the only global windows run
    over the tiny value-bucket count frames). The per-user pre-aggregate
    bounds everything at |users|. Decile = ((rank*10 - 1) div n_users)+1
    in integer arithmetic. Exact integers, one shared division."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # descending order via negated count (two_phase_* order ascending)
    pu = per_user.withColumn("_g", F.lit(1)).withColumn("_neg", -F.col("n"))
    ranked = skew.two_phase_rank(pu, "_g", "_neg", "user_id", bucket_width=64.0, rank_col="rnk")
    cum = skew.two_phase_cumsum(
        ranked, "_g", "_neg", "user_id", "n", bucket_width=64.0,
        cum_col="cum_n", total_col="total_n",
    )
    totals = cum.groupBy("_g").agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    j = cum.join(totals, "_g").withColumn(
        "decile",
        (F.expr("(rnk * 10 - 1) div n_users") + 1).cast("int"),
    )
    return j.groupBy("decile").agg(
        F.max("rnk").cast("long").alias("users_through"),
        F.max("cum_n").cast("long").alias("events_through"),
        F.round(F.max("cum_n") / F.max("total_n"), 6).alias("share_through"),
    )


@register(
    "text_pmi_bigrams",
    oracle="""
WITH t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), s -> s <> '') AS l
  FROM documents WHERE text IS NOT NULL
),
bi AS (
  SELECT l[i] AS x, l[i+1] AS y
  FROM t, unnest(generate_series(1, len(l) - 1)) AS g(i)
),
uni AS (SELECT unnest(l) AS tok FROM t),
c_bi AS (SELECT x, y, count(*) AS c_xy FROM bi GROUP BY 1, 2),
c_uni AS (SELECT tok, count(*) AS c FROM uni GROUP BY 1),
nb AS (SELECT sum(c_xy) AS nb FROM c_bi),
nu AS (SELECT sum(c) AS nu FROM c_uni)
SELECT b.x, b.y, b.c_xy,
       round(ln((CAST(b.c_xy AS DOUBLE) / nb.nb)
                / ((CAST(ux.c AS DOUBLE) / nu.nu) * (CAST(uy.c AS DOUBLE) / nu.nu))), 6) AS pmi
FROM c_bi b
JOIN c_uni ux ON b.x = ux.tok
JOIN c_uni uy ON b.y = uy.tok, nb, nu
WHERE b.c_xy >= 5
""",
    survey_ids=("text-tfidf", "F13"),
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocations by pointwise mutual information over
    consecutive-token bigrams (frequency floor 5, declared) — the phrase-
    detection signal for vocabulary induction. Bigrams zip each token
    array against its own tail in-row (codegen slice + arrays_zip, no
    self-join); only counts shuffle; totals broadcast. See
    operators/text.pmi_bigrams."""
    return text.pmi_bigrams(_t(spark, sf_dir, "documents"))


@register(
    "q_purchase_intervals",
    oracle="""
WITH p AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL
),
g AS (
  SELECT CAST((epoch_us(ts) - epoch_us(prev_ts)) // 3600000000 AS BIGINT) AS gap_hours
  FROM p WHERE prev_ts IS NOT NULL
)
SELECT gap_hours, count(*) AS n
FROM g GROUP BY 1
""",
    survey_ids=("W4", "A2"),
)
def q_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval distribution (whole hours): lag over the
    unique (ts, event_id) order per user via skew.two_phase_shift
    (mode="auto" — day-bucketed above the row bound, so a bot account's
    purchase flood never sorts in one task; VERDICT r7 #1), integer-hour
    bucket, corpus histogram — the W4 returning-gap logic generalized
    from a 7-day flag to the full distribution. Purchases pre-filter
    before the window (pushdown), gaps collapse to a bounded histogram
    frame. Integer-exact."""
    ev = _t(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    p = skew.two_phase_shift(
        ev,
        "user_id",
        ["ts", "event_id"],
        ["ts"],
        skew.hour_bucket("ts", 86400),
        direction="lag",
        mode="auto",
    ).select("user_id", "ts", F.col("ts_lag").alias("prev_ts")).where(
        F.col("prev_ts").isNotNull()
    )
    g = p.select(
        F.floor(
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("prev_ts").cast("timestamp"))
            )
            / 3_600_000_000
        )
        .cast("long")
        .alias("gap_hours")
    )
    return g.groupBy("gap_hours").agg(F.count(F.lit(1)).cast("long").alias("n"))


@register(
    "q_dow_seasonality",
    oracle="""
WITH d AS (
  SELECT event_type, dayofweek(ts) AS dow, count(*) AS n
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
t AS (SELECT event_type, sum(n) AS tot FROM d GROUP BY 1)
SELECT d.event_type, d.dow, d.n,
       round(d.n / t.tot, 6) AS share
FROM d JOIN t USING (event_type)
""",
    survey_ids=("A1", "F2"),
)
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type (count + share) —
    the weekly-rhythm summary behind staffing/anomaly baselines. Spark's
    dayofweek and DuckDB's dayofweek differ by convention (Sun=1..Sat=7
    vs Sun=0..Sat=6), so the Spark side subtracts 1 to the DuckDB
    numbering — a declared mapping, locked by the oracle. Two keyed
    aggregates; one shared division."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    d = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = d.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return d.join(t, "event_type").select(
        "event_type",
        "dow",
        "n",
        F.round(F.col("n") / F.col("tot"), 6).alias("share"),
    )


@register(
    "q_abandoned_carts",
    oracle="""
SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts
FROM events c
WHERE c.event_type = 'click' AND c.user_id IS NOT NULL AND c.ts IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase'
      AND p.user_id = c.user_id
      AND p.ts >= c.ts
      AND p.ts <= c.ts + INTERVAL 24 HOUR
  )
""",
    survey_ids=("J3", "J2"),
)
def q_abandoned_carts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval ANTI-join: clicks with NO purchase by the same user within
    the following 24 hours — the abandonment query, and the anti
    complement of the J3 interval join (DwdTradeOrderPaySucDetail.java:123's
    ±window bounds). Spark plans left_anti on the user equi-key with the
    range predicate as the join condition — a hash anti-join probing only
    same-user purchases, never a cartesian (the J3 plan-lock family
    argument applies unchanged). Timestamp/id-exact."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("interval 24 hours"))
    )
    return clicks.join(purchases, cond, "left_anti")


@register(
    "q_session_conversion",
    oracle="""
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS st
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sid AS (
  SELECT user_id, ts, event_type,
         sum(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM s
),
per AS (
  SELECT user_id, session_id, min(ts::DATE) AS d,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM sid GROUP BY 1, 2
)
SELECT d AS day, count(*) AS n_sessions, sum(conv)::BIGINT AS n_converting,
       round(sum(conv) / count(*), 6) AS conversion_rate
FROM per GROUP BY 1
""",
    survey_ids=("W3", "A1"),
)
def q_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level conversion: sessionize (30-min gap), roll events up
    to (user, session) with a purchase flag, then daily session counts and
    conversion rate — the composition of the W3 sessionizer with the
    funnel's outcome event, and the number a growth dashboard actually
    shows. Boundary determinism: both engines run the id prefix sum over
    the UNIQUE (ts, event_id) order (sessionize tiebreaks on event_id when
    present) — with ties broken arbitrarily, a row tied with a session
    starter could be attributed to the previous session on one side only.
    Reuses state.sessionize (auto skew mode) — the
    rollup groups by (user, session_id), bounded per session. Exact
    integers, one shared division."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    s = state.sessionize(ev, "user_id", "ts", gap_seconds=1800)
    per = s.groupBy("user_id", "session_id").agg(
        F.min(F.to_date("ts")).alias("day"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0))
        ).alias("conv"),
    )
    return per.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("conv").cast("long").alias("n_converting"),
        F.round(F.sum("conv") / F.count(F.lit(1)), 6).alias("conversion_rate"),
    )


@register(
    "q_rfm_segments",
    oracle="""
WITH per AS (
  SELECT o_custkey,
         (SELECT max(o_orderdate::DATE) FROM orders) - max(o_orderdate::DATE) AS recency_days,
         count(*) AS frequency,
         sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS monetary
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
),
r AS (
  SELECT *,
         row_number() OVER (ORDER BY recency_days, o_custkey) AS r_rnk,
         row_number() OVER (ORDER BY frequency DESC, o_custkey) AS f_rnk,
         row_number() OVER (ORDER BY monetary DESC, o_custkey) AS m_rnk,
         count(*) OVER () AS n
  FROM per
),
seg AS (
  SELECT CAST(((r_rnk - 1) * 5) // n + 1 AS INT) AS r_q,
         CAST(((f_rnk - 1) * 5) // n + 1 AS INT) AS f_q,
         CAST(((m_rnk - 1) * 5) // n + 1 AS INT) AS m_q,
         recency_days, frequency, monetary
  FROM r
)
SELECT r_q, f_q, m_q, count(*) AS n_customers,
       max(recency_days)::BIGINT AS max_recency_days,
       max(frequency) AS max_frequency,
       round(CAST(max(monetary) AS DOUBLE), 2) AS max_monetary
FROM seg GROUP BY 1, 2, 3
""",
    survey_ids=("A2", "W4"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer recency (days since last order,
    anchored to the corpus max date — deterministic), frequency (order
    count) and monetary (DECIMAL-exact revenue), each quintiled by the
    equi-depth floor formula over a skew-safe two_phase_rank (recency
    ascending = best first; frequency/monetary via negation), then
    customer counts per (R,F,M) cell — the classic lifecycle-marketing
    segment table. All three ranks run on the bounded per-customer frame;
    the oracle uses plain row_number windows, same formula."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey").isNotNull())
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("_maxd"))
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("_last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("_maxd"), F.col("_last")).cast("long").alias("recency_days"),
            "frequency",
            "monetary",
        )
        .withColumn("_g", F.lit(1))
    )

    def quintile(df: DataFrame, order_col, out_col: str, width: float) -> DataFrame:
        ranked = skew.two_phase_rank(
            df.withColumn("_o", order_col), "_g", "_o", "o_custkey", width, rank_col="_r"
        )
        n = ranked.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
        return (
            ranked.join(n, "_g")
            .withColumn(out_col, (F.expr("((_r - 1) * 5) div _n") + 1).cast("int"))
            .drop("_o", "_r", "_n")
        )

    seg = quintile(per, F.col("recency_days"), "r_q", 30.0)
    seg = quintile(seg, -F.col("frequency"), "f_q", 4.0)
    # rank on the negated DECIMAL directly (no narrowing cast: sum yields
    # decimal(28,2) and a (19,2) cast would NULL totals >= 10^17 and rank
    # them nulls-first, diverging from the oracle's exact DESC — ADVICE r8;
    # floor(_o/width) bucketing works on the wide decimal as-is)
    seg = quintile(seg, -F.col("monetary"), "m_q", 50000.0)
    return seg.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.max("recency_days").alias("max_recency_days"),
        F.max("frequency").alias("max_frequency"),
        F.round(F.max("monetary").cast("double"), 2).alias("max_monetary"),
    )


@register(
    "q_basket_affinity",
    oracle="""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM baskets),
item AS (SELECT l_partkey, count(*) AS c FROM baskets GROUP BY 1),
pair AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, count(*) AS c_xy
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT p.x, p.y, p.c_xy,
       round(CAST(p.c_xy AS DOUBLE) / n.n, 6) AS support,
       round(CAST(p.c_xy AS DOUBLE) / ix.c, 6) AS confidence_x_to_y,
       round((CAST(p.c_xy AS DOUBLE) * n.n) / (CAST(ix.c AS DOUBLE) * iy.c), 6) AS lift
FROM pair p
JOIN item ix ON p.x = ix.l_partkey
JOIN item iy ON p.y = iy.l_partkey, n_orders n
WHERE p.c_xy >= 3
""",
    survey_ids=("J1", "A1"),
)
def q_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (the 2-itemset Apriori stage):
    support, confidence and lift for part pairs co-occurring in an order.
    Pair generation is the bounded same-order self-join (<= C(lines,2)
    <= 21 pairs per basket — the same falling-density shape as the
    triangle fixture), item and pair counts are keyed aggregates, and the
    tiny order-count total broadcasts. Declared support floor c_xy >= 3.
    Counts exact; the three ratios are shared IEEE divisions."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a, b = li.alias("ba"), li.alias("bb")
    pair = (
        a.join(
            b,
            (F.col("ba.l_orderkey") == F.col("bb.l_orderkey"))
            & (F.col("ba.l_partkey") < F.col("bb.l_partkey")),
        )
        .groupBy(F.col("ba.l_partkey").alias("x"), F.col("bb.l_partkey").alias("y"))
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
        .where(F.col("c_xy") >= 3)
    )
    ix = item.select(F.col("l_partkey").alias("x"), F.col("c").alias("cx"))
    iy = item.select(F.col("l_partkey").alias("y"), F.col("c").alias("cy"))
    return (
        pair.join(ix, "x")
        .join(iy, "y")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "x",
            "y",
            "c_xy",
            F.round(F.col("c_xy").cast("double") / F.col("n"), 6).alias("support"),
            F.round(F.col("c_xy").cast("double") / F.col("cx"), 6).alias(
                "confidence_x_to_y"
            ),
            F.round(
                (F.col("c_xy").cast("double") * F.col("n"))
                / (F.col("cx").cast("double") * F.col("cy")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "multimodal_ogg_meta",
    oracle="""
SELECT doc_id AS media_id,
       (doc_id % 5 + 3)::INT AS n_pages,
       (doc_id % 2 + 1)::INT AS channels,
       (doc_id % 1000)::INT AS pre_skip,
       (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                        WHEN 2 THEN 24000 ELSE 48000 END)::INT AS input_rate,
       (doc_id % 2000 + 20)::INT AS duration_ms,
       (doc_id % 5 + 1)::INT AS n_audio_pages
FROM documents
""",
    survey_ids=("mm-decode",),
)
def multimodal_ogg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGG/Opus metadata gate: synthesize a structurally valid Opus-in-Ogg
    stream per doc (BOS OpusHead, OpusTags with odd-length vendor decoy,
    multi-segment lacing with 255-boundary segments, continuation flags,
    EOS granule encoding duration per RFC 7845), then walk the pages back:
    page/packet accounting, channels, pre-skip, input rate, duration —
    the streaming-audio curation columns, no packet decode. Oracle = seed
    arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.synth_media(docs, "doc_id", "ogg")
    media = multimodal.to_media_table(payloads, "media_id", F.col("payload"), "audio/ogg")
    return multimodal.ogg_meta(media)


@register(
    "q_cohort_ltv",
    oracle="""
WITH f AS (
  SELECT o_custkey, min(date_trunc('week', o_orderdate))::DATE AS cohort_week
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
),
rev AS (
  SELECT f.cohort_week,
         CAST((date_trunc('week', o.o_orderdate)::DATE - f.cohort_week) // 7 AS INT) AS week_offset,
         sum(CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2))) AS wk_rev,
         count(*) AS n_orders
  FROM orders o JOIN f ON o.o_custkey = f.o_custkey
  GROUP BY 1, 2
)
SELECT cohort_week, week_offset, n_orders,
       round(CAST(wk_rev AS DOUBLE), 2) AS week_revenue,
       round(CAST(sum(wk_rev) OVER (
         PARTITION BY cohort_week ORDER BY week_offset
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 2) AS cumulative_revenue
FROM rev
""",
    survey_ids=("W2", "A2"),
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: revenue per (first-order-week cohort, week
    offset) with the cumulative LTV curve — q_retention_cohorts' revenue
    sibling. DECIMAL(18,2) weekly masses make both the aggregate and the
    running total order-invariant exact (the prefix window runs over the
    bounded cohorts x weeks frame, never raw orders); the final rounding
    to double is shared. One keyed min-agg for cohorts, one keyed join +
    aggregate, one tiny window."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey").isNotNull())
    f = o.groupBy("o_custkey").agg(
        F.date_trunc("week", F.min("o_orderdate")).cast("date").alias("cohort_week")
    )
    rev = (
        o.join(f, "o_custkey")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("o_orderdate")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(
            F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")).alias("_wk"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return rev.select(
        "cohort_week",
        "week_offset",
        "n_orders",
        F.round(F.col("_wk").cast("double"), 2).alias("week_revenue"),
        F.round(F.sum("_wk").over(w).cast("double"), 2).alias("cumulative_revenue"),
    )


@register(
    "q_order_to_ship_lag",
    oracle="""
SELECT CAST(l.l_shipdate::DATE - o.o_orderdate::DATE AS BIGINT) AS lag_days,
       count(*) AS n,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
    survey_ids=("J1", "A1"),
)
def q_order_to_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution: day lag between the order date
    and each line's ship date, as a corpus histogram with per-bin distinct
    order counts — the cross-table SLA profile. One keyed fact-to-fact
    join (orders projected to two columns — AQE broadcasts at fixture
    scale, co-partitioned hash at warehouse scale), then a keyed count +
    two-phase distinct. Integer-exact."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    return (
        j.select(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            .cast("long")
            .alias("lag_days"),
            "o_orderkey",
        )
        .groupBy("lag_days")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_distinct("o_orderkey").cast("long").alias("n_orders"),
        )
    )


@register(
    "q_mad_robust_dispersion",
    oracle="""
WITH c AS (
  SELECT c_nationkey, round(c_acctbal, 2) AS bal, c_custkey FROM customer
),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY bal, c_custkey) AS rnk,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM c
),
med AS (
  SELECT c_nationkey, bal AS median_bal, n FROM r1 WHERE rnk = (n + 1) // 2
),
dev AS (
  SELECT c.c_nationkey, c.c_custkey, m.median_bal, m.n,
         round(abs(c.bal - m.median_bal), 2) AS d
  FROM c JOIN med m ON c.c_nationkey = m.c_nationkey
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY d, c_custkey) AS rnk
  FROM dev
)
SELECT c_nationkey, max(n)::BIGINT AS n,
       max(median_bal) AS median_bal,
       max(CASE WHEN rnk = (n + 1) // 2 THEN d END) AS mad
FROM r2 GROUP BY c_nationkey
""",
    survey_ids=("A2",),
)
def q_mad_robust_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per nation: lower median of account balance and
    the median absolute deviation around it — the outlier-resistant
    (median, MAD) pair that replaces (mean, stddev) on heavy-tailed data.
    TWO order-statistics passes, both through skew.two_phase_rank (no
    per-key single-task sort anywhere); the rank-picked median is exact
    (no interpolation — lower median at rank (n+1) div 2, declared), the
    deviations are rounded subtractions of rounded values, and the oracle
    runs the same two rounds with plain windows."""
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey", F.round("c_acctbal", 2).alias("bal"), "c_custkey"
    )
    r1 = skew.two_phase_rank(c, "c_nationkey", "bal", "c_custkey", 500.0, rank_col="_r")
    n = r1.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("_n"))
    med = (
        r1.join(n, "c_nationkey")
        .where(F.col("_r") == F.expr("(_n + 1) div 2"))
        .select("c_nationkey", F.col("bal").alias("median_bal"), F.col("_n"))
    )
    dev = c.join(med, "c_nationkey").select(
        "c_nationkey",
        "c_custkey",
        "median_bal",
        "_n",
        F.round(F.abs(F.col("bal") - F.col("median_bal")), 2).alias("d"),
    )
    r2 = skew.two_phase_rank(dev, "c_nationkey", "d", "c_custkey", 200.0, rank_col="_r2")
    return r2.groupBy("c_nationkey").agg(
        F.max("_n").cast("long").alias("n"),
        F.max("median_bal").alias("median_bal"),
        F.max(F.when(F.col("_r2") == F.expr("(_n + 1) div 2"), F.col("d"))).alias("mad"),
    )
