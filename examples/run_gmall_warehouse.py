"""End-to-end gmall warehouse demo — the reference's full topology on Spark.

Synthesizes the two ODS streams (``topic_log`` behavior logs, ``topic_db``
Maxwell-style CDC) from the driver fixtures, then runs every layer:

  ODS(topic_db)  -> DIM   config-routed, column-pruned, keyed-upserted dim tables
  ODS(topic_log) -> DWD   five-way log split (err/start/display/action/page)
  DWD(page)      -> DWS   watermarked 10 s window aggregates + exact daily UV

A user of the reference repo would run DimApp + DwdBaseLog + the DWS apps; this
script is those jobs' topologies executed as Structured Streaming file-stream
replays (swap the edges for streaming/kafka.py builders for live Kafka).

Usage: PYTHONPATH=/root/repo python3 examples/run_gmall_warehouse.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_gmall2024_realtime_spark.session import get_spark
from flink_gmall2024_realtime_spark.sources.fixtures import load_table
from flink_gmall2024_realtime_spark.streaming import pipelines, sinks


def synthesize_ods(spark, sf_dir: str, ods_dir: str) -> None:
    """Fixture tables -> JSON envelope streams (FIXTURES.md §1-2 shapes)."""
    ev = load_table(spark, sf_dir, "events")
    logs = ev.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.col("user_id").cast("string").alias("mid"),
                    F.col("user_id").cast("string").alias("uid"),
                    F.lit("v2.1.0").alias("vc"),
                    F.lit("appstore").alias("ch"),
                    F.lit("110000").alias("ar"),
                    F.when(F.col("event_id") % 7 == 0, "1").otherwise("0").alias("is_new"),
                ).alias("common"),
                F.when(
                    F.col("event_type") != "signup",
                    F.struct(
                        F.col("event_type").alias("page_id"),
                        F.when(F.col("event_id") % 3 == 0, "home").alias("last_page_id"),
                        F.get_json_object("props", "$.k").alias("item"),
                        F.lit("keyword").alias("item_type"),
                        (F.col("value") * 100).cast("long").alias("during_time"),
                    ),
                ).alias("page"),
                F.when(
                    F.col("event_type") == "signup",
                    F.struct(F.lit("icon").alias("entry"), F.lit("1").alias("open_ad_id")),
                ).alias("start"),
                F.when(
                    F.col("event_type") == "error",
                    F.struct(F.lit("2633").alias("error_code"), F.lit("oops").alias("msg")),
                ).alias("err"),
                F.unix_millis(F.col("ts").cast("timestamp")).alias("ts"),
            )
        ).alias("value")
    )
    logs.coalesce(1).write.mode("overwrite").text(os.path.join(ods_dir, "topic_log"))

    orders = load_table(spark, sf_dir, "orders")
    db = orders.select(
        F.to_json(
            F.struct(
                F.lit("gmall").alias("database"),
                F.lit("user_info").alias("table"),
                F.when(F.col("o_orderkey") % 11 == 0, "update").otherwise("insert").alias("type"),
                F.create_map(
                    F.lit("id"), F.col("o_custkey").cast("string"),
                    F.lit("name"), F.concat(F.lit("cust_"), F.col("o_custkey")).alias("n"),
                    F.lit("order_total"), F.col("o_totalprice").cast("string"),
                ).alias("data"),
                (F.col("o_orderkey")).alias("ts"),
            )
        ).alias("value")
    )
    db.coalesce(1).write.mode("overwrite").text(os.path.join(ods_dir, "topic_db"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="gmall_wh_")
    spark = get_spark("gmall-warehouse", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    ods = os.path.join(out, "ods")
    synthesize_ods(spark, sf_dir, ods)
    print(f"ODS synthesized under {ods}")

    # ---- DIM: config-driven routing (DimApp topology) -------------------
    from flink_gmall2024_realtime_spark.operators.etl import etl_db_stream

    catalog = sinks.DimCatalog(os.path.join(out, "dim"))
    config = spark.createDataFrame(
        [("user_info", "dim_user_info", "id,name", "id", "c")],
        "source_table string, sink_table string, sink_columns string, sink_row_key string, op string",
    )
    db_raw = spark.readStream.format("text").schema("value string").load(os.path.join(ods, "topic_db"))
    db_parsed = etl_db_stream(db_raw)
    dim_process = pipelines.dim_app_pipeline(spark, None, config, catalog, out)
    q_dim = (
        db_parsed.writeStream.foreachBatch(dim_process)
        .option("checkpointLocation", os.path.join(out, "ckpt", "dim"))
        .trigger(availableNow=True)
        .start()
    )
    q_dim.awaitTermination(300)
    users = spark.read.parquet(catalog.path("dim_user_info") + "/table")
    print(f"DIM: tables={catalog.tables()} dim_user_info rows={users.count()}")

    # ---- DWD: five-way log split (DwdBaseLog topology) ------------------
    log_raw = spark.readStream.format("text").schema("value string").load(os.path.join(ods, "topic_log"))
    branches = pipelines.dwd_base_log_pipeline(log_raw)
    for name, df in branches.items():
        (
            df.select(F.to_json(F.struct(*df.columns)).alias("value"))
            .writeStream.format("text")
            .option("path", os.path.join(out, "dwd", f"dwd_traffic_{name}"))
            .option("checkpointLocation", os.path.join(out, "ckpt", f"dwd_{name}"))
            .trigger(availableNow=True)
            .start()
        )
    for q in spark.streams.active:
        q.awaitTermination(300)
    counts = {
        name: spark.read.text(os.path.join(out, "dwd", f"dwd_traffic_{name}")).count()
        for name in branches
    }
    print(f"DWD: branch rows={counts}")

    # ---- DWS: watermarked window agg on the page branch -----------------
    page = branches["page"].withColumn("row_time", F.timestamp_millis(F.col("ts")))
    agg = (
        page.withWatermark("row_time", "5 seconds")
        .groupBy(F.window("row_time", "10 seconds"), F.col("page.page_id").alias("page_id"))
        .agg(F.count(F.lit(1)).alias("pv_ct"), F.sum("page.during_time").alias("dur_sum"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
            F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
            F.date_format("window.start", "yyyy-MM-dd").alias("cur_date"),
            "page_id", "pv_ct", "dur_sum",
        )
    )
    writer = sinks.append_serving_sink(os.path.join(out, "dws"), "dws_traffic_page_view_window")
    q_dws = (
        agg.writeStream.foreachBatch(writer)
        .option("checkpointLocation", os.path.join(out, "ckpt", "dws"))
        .trigger(availableNow=True)
        .start()
    )
    q_dws.awaitTermination(300)
    dws = spark.read.parquet(os.path.join(out, "dws", "dws_traffic_page_view_window"))
    print(f"DWS: window rows={dws.count()} partitions=cur_date")
    dws.orderBy("stt").show(5, truncate=False)
    print(f"warehouse at {out}")
    spark.stop()


if __name__ == "__main__":
    main()
