"""Routing / splitting / flattening operators (SURVEY §2.7 R1-R3).

The reference splits the page-log stream five ways with Flink side outputs in
one keyed pass (``DwdBaseLog.java:76-152``) and routes CDC facts to dynamic
Kafka topics (``DwdBaseDb.java:77-81``).  Spark-first: parse once, derive each
branch as a filter+projection on the shared plan (Catalyst collapses the
common prefix; in streaming, ``foreachBatch`` fans one materialized batch out
to all sinks atomically), and dynamic routing is just a ``topic``/partition
column on the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_log_stream(parsed: DataFrame) -> dict[str, DataFrame]:
    """R1 — 5-way split of the parsed log stream into err / start / display /
    action / page branches, mutually exclusive routing with field removal, as
    in ``DwdBaseLog.splitLog`` (:95-152):

    - err records (err field present) -> whole record, then err removed
    - start records -> launch log
    - page records -> displays/actions exploded into their own branches
      (R2, ``DwdBaseLog.java:117-141``) and removed from the page record
    """
    err = parsed.filter(F.col("err").isNotNull())
    no_err = parsed.drop("err")
    start = no_err.filter(F.col("start").isNotNull())
    page = no_err.filter(F.col("start").isNull())
    display = explode_with_context(page, "displays", "display")
    action = explode_with_context(page, "actions", "action")
    page_main = page.drop("displays", "actions", "start")
    return {
        "err": err,
        "start": start.drop("displays", "actions"),
        "display": display,
        "action": action,
        "page": page_main,
    }


def explode_with_context(df: DataFrame, array_col: str, out: str) -> DataFrame:
    """R2 — array flattening with context re-attach: one row per array element
    carrying ``common``/``page``/``ts`` (``DwdBaseLog.java:117-141``)."""
    return (
        df.filter(F.col(array_col).isNotNull() & (F.size(array_col) > 0))
        .select("common", "page", "ts", F.explode(array_col).alias(out))
    )


def with_sink_table(df: DataFrame, sink_table_col: str = "sink_table") -> DataFrame:
    """R3 — dynamic routing: expose the per-record destination as a ``topic``
    column; Spark's Kafka sink routes on it natively (K2,
    ``FlinkSinkUtil.java:44-60``), and file sinks partition on it."""
    return df.withColumn("topic", F.col(sink_table_col))
