"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``flink_gmall2024_realtime_spark.plans.CATALOG`` — every
implemented operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) is registered there as a (Spark plan, DuckDB oracle) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from flink_gmall2024_realtime_spark.plans import catalog as _catalog


def _ensure_confs(spark: SparkSession) -> SparkSession:
    """The driver may hand us a session built without our factory; pin the
    confs correctness depends on (naive-timestamp parity, nanos decoding)."""
    spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
    for conf, val in (
        # events.ts has shipped as TIMESTAMP(NANOS) and as timestamp[us]
        # across driver fixture versions; with this set, either decodes and
        # the reader's dtype-conditional normalization handles both
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "true"),  # naive ts == DuckDB wall time
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(conf, val)
        except Exception:
            pass  # static on some builds; defaults then match anyway
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 10-second tumbling-window
    keyed aggregate (the reference's core DWS shape)."""
    _ensure_confs(spark)
    return _catalog.CATALOG["dws_tumble_type_counts"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in _catalog.CATALOG.items():
        def make(fn):
            def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
                return fn(_ensure_confs(spark), sf_dir)
            return wrapped
        out[name] = make(spec.spark)
    return out


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
