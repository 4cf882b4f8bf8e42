"""Windowed aggregation operators (SURVEY §2.5 A1-A4, §2.8 W1).

Every DWS table in the reference is a 10-second event-time tumbling window
(``TUMBLE(row_time, INTERVAL '10' SECOND)``,
``DwsTrafficSourceKeywordPageViewWindow.java:61-72``;
``TumblingEventTimeWindows.of(10s)``,
``DwsTrafficVcChArIsNewPageViewWindow.java:70``) whose output carries the
window bounds as strings (``stt``/``edt``) plus ``cur_date``.

Spark's ``window()`` + ``groupBy().agg()`` gives the same semantics with
automatic partial (map-side) aggregation — the reference hand-builds that with
``reduce`` + ``ProcessWindowFunction``.  Even the reference's parallelism-1
``windowAll`` globals (A3) parallelize here: partials are computed per
partition and merged, so a global count at 100 TB is still a full scan but
never a single-task bottleneck.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WINDOW = "10 seconds"


def tumble(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str | Column] = (),
    aggs: Sequence[Column] = (),
    window_size: str = DEFAULT_WINDOW,
    watermark: str | None = None,
    stamp_strings: bool = True,
) -> DataFrame:
    """A1/A2/A3 — keyed (or global, ``keys=()``) tumbling-window aggregate.

    Returns ``stt``/``edt`` (window bound strings, the reference's window
    decorator ``DwsTrafficVcChArIsNewPageViewWindow.java:93-107``) and
    ``cur_date`` alongside the group keys and aggregates.  ``watermark``
    (e.g. ``"5 seconds"``) enables streaming use with late-data drop (W1)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.window(F.col(ts_col), window_size), *keys).agg(*aggs)
    win = F.col("window")
    if stamp_strings:
        bounds = [
            F.date_format(win["start"], "yyyy-MM-dd HH:mm:ss").alias("stt"),
            F.date_format(win["end"], "yyyy-MM-dd HH:mm:ss").alias("edt"),
            F.date_format(win["start"], "yyyy-MM-dd").alias("cur_date"),
        ]
    else:
        bounds = [win["start"].alias("wstart"), win["end"].alias("wend")]
    rest = [F.col(n) for n in out.columns if n != "window"]
    return out.select(*bounds, *rest)


def daily_distinct_count(
    df: DataFrame,
    date_col: Column,
    key: str,
    extra_keys: Sequence[str] = (),
    out: str = "uv_ct",
) -> DataFrame:
    """A4 — exact per-day distinct count (daily UV).

    The reference does this with per-key ValueState emitting 1 on first
    sighting per day (§2.8 W3).  Batch/Spark-first: dedupe on (key, date) then
    count — identical result, deterministic, and replay-stable; in streaming
    the same shape runs as ``dropDuplicates`` + window count with watermarked
    state eviction (TTL-1-day ≈ keying by date)."""
    d = df.select(date_col.alias("cur_date"), key, *extra_keys).dropDuplicates(
        ["cur_date", key, *extra_keys]
    )
    return d.groupBy("cur_date", *extra_keys).agg(F.count(F.lit(1)).alias(out))
