"""Keyed-state operators (SURVEY §2.8 W2-W4) — batch-deterministic forms.

The reference keeps tiny per-key scalars in Flink ValueState: first-visit date
(``DwdBaseLog.java:154-198``), last-seen date with 1-day TTL
(``DwsTrafficVcChArIsNewPageViewWindow.java:134-189``), last-login date for
7-day-gap detection (``DwsUserUserLoginWindow.java:95-135``).

Spark-first these have two equivalent expressions, both provided:

1. **Declarative (this module)** — analytic window functions over (key, time).
   Fully distributed: one shuffle on the key, whole-stage codegen, no Python.
   This is the form the query catalog and the DuckDB oracle check, and the
   form you want for backfills over 100 TB of history.
2. **Streaming (streaming/state.py)** — ``applyInPandasWithState`` with the
   same per-key scalar, for live unbounded input.  Tests assert the two agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_seen_repair(
    df: DataFrame, key: str, date_col: Column, out: str = "is_new"
) -> DataFrame:
    """W2 — new/old-visitor repair: ``is_new`` = 1 only on the key's first
    active date, 0 on any later date.

    Reference semantics (``DwdBaseLog.java:154-198``): per ``mid`` ValueState
    holds the first-visit date; a claimed new visitor on a later date is
    rewritten 1 -> 0.  Declaratively: min(date) over (partition by key)."""
    d = df.withColumn("_d", date_col)
    w = Window.partitionBy(key)
    return (
        d.withColumn("_first", F.min("_d").over(w))
        .withColumn(out, F.when(F.col("_d") == F.col("_first"), F.lit(1)).otherwise(F.lit(0)))
        .drop("_first")
        .withColumnRenamed("_d", "cur_date")
    )


def daily_first_flag(
    df: DataFrame, key: str, date_col: Column, order_col: str, out: str = "uv_flag"
) -> DataFrame:
    """W3 — daily-dedup flag: 1 on the key's first record of each day, else 0
    (the ValueState ``last_seen_date`` TTL-1-day pattern).  Declaratively:
    row_number over (key, date) ordered by time == 1."""
    d = df.withColumn("cur_date", date_col)
    w = Window.partitionBy(key, "cur_date").orderBy(F.col(order_col))
    return d.withColumn(out, F.when(F.row_number().over(w) == 1, 1).otherwise(0))


def returning_user_flags(
    visits: DataFrame, key: str, date_col: str, gap_days: int = 7
) -> DataFrame:
    """W4 — returning-user detection: per key per active date, ``uu=1``;
    ``back=1`` when the previous active date is more than ``gap_days`` ago.

    Reference: ``DwsUserUserLoginWindow.java:95-135`` (uid ValueState holding
    last login date; 7-day gap => back_ct).  Declaratively: lag(date) over
    (key order by date) on the deduped (key, date) set."""
    d = visits.select(key, date_col).dropDuplicates([key, date_col])
    w = Window.partitionBy(key).orderBy(F.col(date_col))
    return (
        d.withColumn("_prev", F.lag(date_col).over(w))
        .withColumn("uu", F.lit(1))
        .withColumn(
            "back",
            F.when(
                F.col("_prev").isNotNull()
                & (F.datediff(F.col(date_col), F.col("_prev")) > gap_days),
                1,
            ).otherwise(0),
        )
        .drop("_prev")
    )


def sessionize(
    df: DataFrame, key: str, ts_col: str, gap_seconds: int = 1800
) -> DataFrame:
    """Session assignment by inactivity gap: a new session starts when the
    previous event of the same key is more than ``gap`` earlier (the
    reference marks session starts with ``last_page_id IS NULL``,
    ``DwsTrafficVcChArIsNewPageViewWindow.java:171-174``; gap-based
    sessionization is the general form).  Emits ``session_start`` (0/1) and a
    per-key ``session_id`` (cumulative count of starts)."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col("event_id") if "event_id" in df.columns else F.col(ts_col))
    prev = F.lag(ts_col).over(w)
    # timestamp_ntz has no direct double cast; going through timestamp only
    # shifts both sides by the same session offset, so the gap is unchanged
    secs = F.col(ts_col).cast("timestamp").cast("double")
    prev_secs = prev.cast("timestamp").cast("double")
    started = df.withColumn(
        "session_start",
        F.when(prev.isNull() | (secs - prev_secs > gap_seconds), 1).otherwise(0),
    )
    return started.withColumn(
        "session_id",
        F.sum("session_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
