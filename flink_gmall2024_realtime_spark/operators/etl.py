"""ETL parse+filter operators (SURVEY §2.3 P1-P6).

The reference parses every Kafka record with fastjson and drops malformed /
irrelevant rows imperatively (``DimApp.java:181-201``, ``DwdBaseLog.java:
216-239``).  Spark-first, parsing is ``from_json`` (bad rows -> null -> one
filter) and the predicates are Catalyst expressions, so the whole edge is
whole-stage-codegen'd and — crucially at 100 TB — filters placed here are
pushed into the scan by ``PushDownPredicates``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import json_map

# CDC-envelope types the DIM/DWD layers must drop (DimApp.java:191-196).
BOOTSTRAP_CONTROL_TYPES = ("bootstrap-start", "bootstrap-complete")


def etl_db_stream(raw: DataFrame, json_col: str = "value", database: str = "gmall") -> DataFrame:
    """P1 — CDC (topic_db) edge ETL: parse JSON, keep the target database,
    drop bootstrap control records and rows with empty ``data``.

    Reference: ``DimApp.java:181-201``."""
    parsed = raw.withColumn("j", F.from_json(
        F.col(json_col),
        "struct<database:string,`table`:string,type:string,"
        "data:map<string,string>,old:map<string,string>,ts:bigint>",
    ))
    return (
        parsed.filter(F.col("j").isNotNull())
        .select("j.*")
        .filter(
            (F.col("database") == database)
            & ~F.col("type").isin(*BOOTSTRAP_CONTROL_TYPES)
            & F.col("data").isNotNull()
            & (F.size(F.map_keys(F.col("data"))) > 0)
        )
    )


def etl_log_stream(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """P2 — behavior-log edge ETL: require ``page`` or ``start`` present,
    ``common.mid`` and ``ts`` non-null.  Reference: ``DwdBaseLog.java:216-239``."""
    schema = (
        "struct<common:struct<mid:string,uid:string,vc:string,ch:string,ar:string,is_new:string>,"
        "page:struct<page_id:string,last_page_id:string,item:string,item_type:string,during_time:bigint>,"
        "start:struct<entry:string,open_ad_id:string>,"
        "err:struct<error_code:string,msg:string>,"
        "displays:array<struct<item:string,item_type:string,pos_id:string>>,"
        "actions:array<struct<action_id:string,item:string,item_type:string,ts:bigint>>,"
        "ts:bigint>"
    )
    parsed = raw.withColumn("j", F.from_json(F.col(json_col), schema))
    return (
        parsed.filter(F.col("j").isNotNull())
        .select("j.*")
        .filter(
            (F.col("page").isNotNull() | F.col("start").isNotNull())
            & F.col("common.mid").isNotNull()
            & F.col("ts").isNotNull()
        )
    )


def etl_log_stream_with_rejects(
    raw: DataFrame, json_col: str = "value"
) -> dict[str, DataFrame]:
    """P2 + the dirty-data side output (``DwdBaseLog.java:70-93``: malformed
    records go to a ``dirty_data`` topic instead of vanishing): returns
    ``{"ok": ..., "rejects": ...}`` where ``rejects`` carries the ORIGINAL
    raw value plus a reject reason — the dead-letter channel a production
    edge needs for replay/audit.

    Both branches derive from one shared parse (Catalyst collapses the
    common prefix; in streaming, ``foreachBatch`` fans the materialized
    batch to both sinks atomically). A record is dirty if the JSON fails to
    parse or the required identity fields are missing."""
    schema = (
        "struct<common:struct<mid:string,uid:string,vc:string,ch:string,ar:string,is_new:string>,"
        "page:struct<page_id:string,last_page_id:string,item:string,item_type:string,during_time:bigint>,"
        "start:struct<entry:string,open_ad_id:string>,"
        "err:struct<error_code:string,msg:string>,"
        "displays:array<struct<item:string,item_type:string,pos_id:string>>,"
        "actions:array<struct<action_id:string,item:string,item_type:string,ts:bigint>>,"
        "ts:bigint>"
    )
    parsed = raw.withColumn("j", F.from_json(F.col(json_col), schema))
    ok_pred = (
        F.col("j").isNotNull()
        & (F.col("j.page").isNotNull() | F.col("j.start").isNotNull())
        & F.col("j.common.mid").isNotNull()
        & F.col("j.ts").isNotNull()
    )
    # PERMISSIVE from_json yields an all-null struct (not NULL) for
    # unparseable input, so "did not parse" = every top-level field null
    unparsed = F.col("j").isNull() | (
        F.col("j.common").isNull()
        & F.col("j.page").isNull()
        & F.col("j.start").isNull()
        & F.col("j.err").isNull()
        & F.col("j.displays").isNull()
        & F.col("j.actions").isNull()
        & F.col("j.ts").isNull()
    )
    reason = (
        F.when(unparsed, "unparseable_json")
        .when(F.col("j.page").isNull() & F.col("j.start").isNull(), "no_page_or_start")
        .when(F.col("j.common.mid").isNull(), "missing_mid")
        .otherwise("missing_ts")
    )
    ok = parsed.filter(ok_pred).select("j.*")
    rejects = parsed.filter(~ok_pred).select(
        F.col(json_col).alias("raw"), reason.alias("reject_reason")
    )
    return {"ok": ok, "rejects": rejects}


def cdc_project(df: DataFrame, columns: Sequence[str], extra: dict[str, Column] | None = None) -> DataFrame:
    """P4 — map-subscript projection of the CDC ``data`` payload into typed
    fact columns: ``SELECT data['id'] AS id, ...``.

    Reference: ``DwdInteractionCommentInfo.java:82-102`` and the three other
    Flink-SQL DWD apps."""
    cols = [F.col("data")[c].alias(c) for c in columns]
    for name, expr in (extra or {}).items():
        cols.append(expr.alias(name))
    return df.select(*cols)


def update_delta_predicate(field: str, new_gt_old: bool = False) -> Column:
    """P5 — predicate on the ``old`` map detecting a meaningful update delta.

    ``new_gt_old=True`` reproduces the cart-add rule (insert, or update where
    ``data.sku_num > old.sku_num`` — ``DwdTradeCartAdd.java:72-77``); the
    default reproduces the payment-success rule (update flipping a status
    field — ``DwdTradeOrderPaySucDetail.java:161-166``)."""
    old_has = F.col("old")[field].isNotNull()
    if new_gt_old:
        return (F.col("type") == "insert") | (
            (F.col("type") == "update")
            & old_has
            & (F.col("data")[field].cast("bigint") > F.col("old")[field].cast("bigint"))
        )
    return (F.col("type") == "update") & old_has


def prune_columns_by_config(df: DataFrame, data_col: str = "data", cfg_cols: str = "sink_columns") -> DataFrame:
    """P6 — config-driven runtime column pruning: keep only the ``data`` keys
    listed in the joined config row's csv ``sink_columns``.

    Reference: ``DimApp.java:87-104`` (and ``DwdBaseDb.java:84-98``).  The
    kept-column set is *data*, not code, so this stays a runtime ``map_filter``
    rather than a Catalyst projection."""
    keep = F.split(F.col(cfg_cols), ",")
    return df.withColumn(
        data_col,
        F.map_filter(F.col(data_col), lambda k, _v: F.array_contains(keep, k)),
    )
