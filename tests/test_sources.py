"""Source-layer tests: config snapshot folding (S3/S4) and fixture loading."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from flink_gmall2024_realtime_spark.sources import cdc, fixtures


def test_cdc_log_folds_to_current_state(spark):
    log = spark.createDataFrame(
        [
            Row(op="r", before=None, after=Row(source_table="user_info", sink_table="dim_user", sink_columns="id,name"), ts=1),
            Row(op="c", before=None, after=Row(source_table="sku_info", sink_table="dim_sku", sink_columns="id"), ts=2),
            Row(op="u", before=Row(source_table="user_info", sink_table="dim_user", sink_columns="id,name"),
                after=Row(source_table="user_info", sink_table="dim_user", sink_columns="id,name,email"), ts=3),
            Row(op="d", before=Row(source_table="sku_info", sink_table="dim_sku", sink_columns="id"), after=None, ts=4),
        ]
    )
    out = {r["source_table"]: r for r in cdc.cdc_log_config_source(log).collect()}
    assert set(out) == {"user_info"}  # sku deleted
    assert out["user_info"]["sink_columns"] == "id,name,email"  # latest update wins


def test_events_normalized_to_ntz(spark, sf_dir):
    ev = fixtures.load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    assert ev.count() > 0


def test_register_views_sql_access(spark, sf_dir):
    fixtures.register_views(spark, sf_dir)
    n = spark.sql("select count(*) c from lineitem").collect()[0]["c"]
    assert n > 0


def test_kafka_payload_shapes(spark):
    """K1/K2/K3 payload logic on batch frames (no broker in container): the
    dynamic sink's (topic, value) projection and PK compaction."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from flink_gmall2024_realtime_spark.streaming.kafka import compact_by_key

    df = spark.createDataFrame(
        [Row(sink_table="dwd_a", id="1", v=10), Row(sink_table="dwd_b", id="2", v=20)]
    )
    # K2 shape: topic column + JSON payload without the routing column
    payload_cols = [c for c in df.columns if c != "sink_table"]
    out = df.select(
        F.col("sink_table").alias("topic"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    ).collect()
    got = {r["topic"]: r["value"] for r in out}
    assert got["dwd_a"] == '{"id":"1","v":10}'  # sink_table removed from payload
    # K3: per-batch PK compaction keeps latest per key
    b = spark.createDataFrame(
        [Row(id="1", ts=1, v="old"), Row(id="1", ts=2, v="new"), Row(id="2", ts=1, v="x")]
    )
    compacted = {r["id"]: r["v"] for r in compact_by_key(b, "id", "ts").collect()}
    assert compacted == {"1": "new", "2": "x"}
