"""Kafka source/sink builders — the FlinkSourceUtil/FlinkSinkUtil equivalents.

These are the live-deployment edges for the topologies in pipelines.py; the
container has no broker, so they are exercised only as plan builders (tests
assert construction, not delivery). All options are stock Structured
Streaming — nothing here needs custom code at 100 TB; throughput scales with
``minPartitions`` and the sink's idempotent keying.

Reference parity:
- ``kafka_source``        <- FlinkSourceUtil.getKafkaSource (:24-56), incl.
                            the null/tombstone tolerance (value cast is null-safe)
- ``kafka_json_source``   <- SQLUtil.getKafkaSourceSQL/getKafkaTopicDb (:14-37):
                            JSON envelope -> typed columns + event time + watermark
- ``kafka_sink``          <- FlinkSinkUtil.getKafkaSink (:31-42) (K1)
- ``kafka_dynamic_sink``  <- FlinkSinkUtil dynamic topic variant (:44-60) (K2):
                            Spark's Kafka sink routes on a ``topic`` column natively
- ``kafka_upsert_sink``   <- SQLUtil.getUpsertKafkaDDL (:54-62) (K3): keyed
                            changelog -- per-batch PK compaction + keyed write
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    group_id: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Raw string stream from a topic; tombstone (null-value) records survive
    as nulls and are filtered, not crashed on (FlinkSourceUtil.java:32-51)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("kafka.group.id", group_id)
        .load()
    )
    return raw.select(F.col("value").cast("string").alias("value")).filter(
        F.col("value").isNotNull()
    )


def kafka_json_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    group_id: str,
    schema: str,
    ts_col: str = "ts",
    ts_unit: str = "seconds",
    watermark: str = "5 seconds",
) -> DataFrame:
    """Typed JSON stream table with event time + watermark — the Flink-SQL
    Kafka table (SQLUtil.java:25-37): ts seconds -> TO_TIMESTAMP_LTZ(ts*1000)
    becomes timestamp_seconds, 5 s bounded out-of-orderness watermark."""
    raw = kafka_source(spark, brokers, topic, group_id)
    parsed = raw.select(F.from_json("value", schema).alias("j")).select("j.*")
    to_ts = F.timestamp_seconds if ts_unit == "seconds" else F.timestamp_millis
    return parsed.withColumn("row_time", to_ts(F.col(ts_col))).withWatermark(
        "row_time", watermark
    )


def kafka_sink(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    """K1 — fixed-topic sink. Checkpointed offsets + idempotent downstream
    keying give the effectively-once the reference buys with 15-min
    transactions."""
    return (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def kafka_dynamic_sink(df: DataFrame, brokers: str, checkpoint: str, topic_col: str = "sink_table"):
    """K2 — per-record topic routing: Spark's Kafka sink reads the ``topic``
    column when no fixed topic option is set; the routing column is removed
    from the payload exactly like FlinkSinkUtil.java:51-57."""
    payload_cols = [c for c in df.columns if c != topic_col]
    return (
        df.select(
            F.col(topic_col).alias("topic"),
            F.to_json(F.struct(*payload_cols)).alias("value"),
        )
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint)
    )


def compact_by_key(batch: DataFrame, key: str, order_col: str) -> DataFrame:
    """K3 helper — per-batch PK compaction (latest row per key), the
    upsert-kafka changelog contract. Spelled as a partial-aggregatable
    argmax (``max_by``) rather than row_number-over-sort, so a hot key's
    flood collapses map-side per task instead of sorting its lifetime in
    one reducer (see operators/skew.latest_by_key)."""
    from ..operators.skew import latest_by_key

    return latest_by_key(batch, key, order_col)


def kafka_upsert_sink(df: DataFrame, brokers: str, topic: str, checkpoint: str, key: str, order_col: str):
    """K3 — keyed changelog sink: each micro-batch is PK-compacted then
    written with the key as the Kafka message key (a compacted topic keyed by
    PK is the upsert-kafka table)."""

    def write(batch: DataFrame, batch_id: int) -> None:
        (
            compact_by_key(batch, key, order_col)
            .select(
                F.col(key).cast("string").alias("key"),
                F.to_json(F.struct(*[c for c in batch.columns])).alias("value"),
            )
            .write.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("topic", topic)
            .save()
        )

    return df.writeStream.foreachBatch(write).option("checkpointLocation", checkpoint)
