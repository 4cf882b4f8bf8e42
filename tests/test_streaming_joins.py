"""Stream-stream join + watermark late-data tests (SURVEY §2.4 J1-J3, §2.8 W1).

The reference's DWD SQL apps are stateful stream-stream joins (regular with
idle-state TTL, interval with event-time bounds). Spark's symmetric hash join
with watermarks is the equivalent; these tests replay fixtures as two real
streams over multiple micro-batches and check against the batch result.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def _write_stream_files(tmp_path, name, rows, files=3):
    """Split rows across several files -> several micro-batches with
    maxFilesPerTrigger=1 (real incremental arrival)."""
    d = os.path.join(str(tmp_path), name)
    os.makedirs(d)
    per = max(1, len(rows) // files)
    for i in range(files):
        chunk = rows[i * per : (i + 1) * per if i < files - 1 else len(rows)]
        with open(os.path.join(d, f"{i:02d}.jsonl"), "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
    return d


def _drain(df, tmp_path, qname, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(mode)
        .option("checkpointLocation", os.path.join(str(tmp_path), f"ck_{qname}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_stream_stream_interval_join(spark, tmp_path):
    """J3 — payment-within-window-of-order as two real streams."""
    orders = [
        {"oid": 1, "ots": "2024-01-01 10:00:00"},
        {"oid": 2, "ots": "2024-01-01 10:30:00"},
        {"oid": 3, "ots": "2024-01-01 11:00:00"},
    ]
    pays = [
        {"oid": 1, "pts": "2024-01-01 10:05:00"},   # within 15 min
        {"oid": 2, "pts": "2024-01-01 10:50:00"},   # too late (> 15 min)
        {"oid": 3, "pts": "2024-01-01 11:00:10"},   # within
        {"oid": 99, "pts": "2024-01-01 11:00:00"},  # no order
    ]
    od = _write_stream_files(tmp_path, "orders", orders)
    pd_ = _write_stream_files(tmp_path, "pays", pays)
    so = (
        spark.readStream.schema("oid long, ots string").option("maxFilesPerTrigger", "1").json(od)
        .withColumn("ots", F.col("ots").cast("timestamp"))
        .withWatermark("ots", "10 seconds")
    )
    sp = (
        spark.readStream.schema("oid long, pts string").option("maxFilesPerTrigger", "1").json(pd_)
        .withColumn("pts", F.col("pts").cast("timestamp"))
        .withWatermark("pts", "10 seconds")
    )
    joined = so.withColumnRenamed("oid", "so_oid").join(
        sp, F.expr("so_oid = oid AND pts BETWEEN ots AND ots + interval 15 minutes")
    )
    _drain(joined.select("so_oid"), tmp_path, "ivj")
    got = sorted(r["so_oid"] for r in spark.sql("select * from ivj").collect())
    assert got == [1, 3]


def test_stream_stream_inner_join_matches_batch(spark, sf_dir, tmp_path):
    """J1 — purchases x clicks per user (equality + time range), streamed in
    micro-batches, equals the batch interval-join catalog query."""
    from flink_gmall2024_realtime_spark.plans import CATALOG
    from flink_gmall2024_realtime_spark.sources.fixtures import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = [
        {
            "event_id": r["event_id"],
            "user_id": r["user_id"],
            "event_type": r["event_type"],
            "ts": str(r["ts"]),
        }
        for r in ev.filter(F.col("event_type").isin("purchase", "click")).collect()
    ]
    d = _write_stream_files(tmp_path, "ev", rows, files=4)
    s = (
        spark.readStream.schema("event_id long, user_id long, event_type string, ts string")
        .option("maxFilesPerTrigger", "1")
        .json(d)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    p = (
        s.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("event_id").alias("pay_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        s.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    joined = p.join(
        c,
        F.expr(
            "p_user = c_user AND c_ts >= p_ts - interval 15 minutes AND c_ts <= p_ts + interval 15 seconds"
        ),
    ).select("pay_id", "click_id")
    _drain(joined, tmp_path, "ssj")
    got = {(r["pay_id"], r["click_id"]) for r in spark.sql("select * from ssj").collect()}
    want = {
        (r["pay_id"], r["click_id"])
        for r in CATALOG["dwd_interval_join"].spark(spark, sf_dir).collect()
    }
    assert got == want


def test_watermark_drops_late_rows(spark, tmp_path):
    """W1 — late-data semantics, precisely: the watermark guarantees state
    EVICTION, not eager dropping. A late row arriving while its window is
    still in state merges; a late row arriving after the window was emitted
    and evicted is dropped (no duplicate append-mode emission)."""
    import time

    batches = [
        [{"k": "a", "ts": "2024-01-01 10:00:01"}],
        [{"k": "a", "ts": "2024-01-01 10:10:00"}],  # advances wm to 10:09:50
        [{"k": "a", "ts": "2024-01-01 10:10:01"}],  # this batch emits+evicts the 10:00:00 window
        [{"k": "a", "ts": "2024-01-01 10:00:02"}],  # late, state evicted -> dropped
        [{"k": "a", "ts": "2024-01-01 10:20:00"}],  # closes the 10:10:00 window
    ]
    d = os.path.join(str(tmp_path), "late")
    os.makedirs(d)
    for i, rows in enumerate(batches):
        with open(os.path.join(d, f"{i:02d}.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        time.sleep(1.1)  # distinct modTimes -> deterministic file (batch) order
    s = (
        spark.readStream.schema("k string, ts string")
        .option("maxFilesPerTrigger", "1")
        .json(d)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "10 seconds"), "k")
        .agg(F.count(F.lit(1)).alias("ct"))
        .select(F.date_format("window.start", "HH:mm:ss").alias("stt"), "ct")
    )
    _drain(s, tmp_path, "late_agg")
    got = {(r["stt"], r["ct"]) for r in spark.sql("select * from late_agg").collect()}
    # late 10:00:02 dropped (no re-emission, no count 2); 10:10:00 window
    # holds both its rows; trailing 10:20:00 window withheld (unclosed)
    assert got == {("10:00:00", 1), ("10:10:00", 2)}


def test_stateful_state_carries_across_batches(spark, tmp_path):
    """W2 via applyInPandasWithState over MULTIPLE micro-batches: the
    first-seen date learned in batch 0 must repair is_new in later batches."""
    from flink_gmall2024_realtime_spark.streaming.state import (
        FIRST_SEEN_SCHEMA,
        FIRST_SEEN_STATE,
        apply_stateful,
        first_seen_repair_func,
    )

    batches = [
        [{"key": "u1", "cur_date": "2024-01-01"}],
        [{"key": "u1", "cur_date": "2024-01-02"}, {"key": "u2", "cur_date": "2024-01-02"}],
        [{"key": "u1", "cur_date": "2024-01-03"}, {"key": "u2", "cur_date": "2024-01-03"}],
    ]
    import time
    d = os.path.join(str(tmp_path), "seen")
    os.makedirs(d)
    for i, rows in enumerate(batches):
        with open(os.path.join(d, f"{i:02d}.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        time.sleep(1.1)
    s = (
        spark.readStream.schema("key string, cur_date string")
        .option("maxFilesPerTrigger", "1")
        .json(d)
    )
    out = apply_stateful(s.groupBy("key"), first_seen_repair_func, FIRST_SEEN_SCHEMA, FIRST_SEEN_STATE)
    _drain(out, tmp_path, "seen_out")
    got = {
        (r["key"], r["cur_date"]): r["is_new"]
        for r in spark.sql("select * from seen_out").collect()
    }
    assert got == {
        ("u1", "2024-01-01"): 1,
        ("u1", "2024-01-02"): 0,  # state from batch 0 repaired this
        ("u1", "2024-01-03"): 0,
        ("u2", "2024-01-02"): 1,
        ("u2", "2024-01-03"): 0,
    }


def test_daily_uv_late_cross_day_event(spark, tmp_path):
    """W3 nuance: an event for an ALREADY-COUNTED previous day arriving after
    the state moved on must not double-count and must not regress state.

    (The reference's single ValueState compares equality with the stored
    date — DwsTrafficVcChArIsNewPageViewWindow.java:160-180 — so a late
    yesterday-event after today would re-emit uv=1 AND overwrite state
    backwards; our processor tracks the two most recent distinct dates,
    which resolves this case the way the batch twin does.)"""
    import time
    from flink_gmall2024_realtime_spark.streaming.state import (
        DAILY_UV_SCHEMA,
        DAILY_UV_STATE,
        apply_stateful,
        daily_uv_func,
    )

    batches = [
        [{"key": "u1", "cur_date": "2024-01-01"}],
        [{"key": "u1", "cur_date": "2024-01-02"}],
        [{"key": "u1", "cur_date": "2024-01-01"}],  # late: day already counted
        [{"key": "u1", "cur_date": "2024-01-02"}],  # state must still be 01-02
    ]
    d = os.path.join(str(tmp_path), "uvlate")
    os.makedirs(d)
    for i, rows in enumerate(batches):
        with open(os.path.join(d, f"{i:02d}.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        time.sleep(1.1)
    s = (
        spark.readStream.schema("key string, cur_date string")
        .option("maxFilesPerTrigger", "1")
        .json(d)
    )
    out = apply_stateful(s.groupBy("key"), daily_uv_func, DAILY_UV_SCHEMA, DAILY_UV_STATE)
    _drain(out, tmp_path, "uv_late")
    per_day = {
        r["cur_date"]: r["uv"]
        for r in spark.sql(
            "select cur_date, sum(uv) uv from uv_late group by 1"
        ).collect()
    }
    assert per_day == {"2024-01-01": 1, "2024-01-02": 1}  # no double counts


def test_daily_uv_late_unseen_day_still_counts(spark, tmp_path):
    """W3 counterpart: a late event for a NEVER-seen earlier day must still
    count (the batch twin flags every day's first row; a single ordered-date
    state would drop it)."""
    import time
    from flink_gmall2024_realtime_spark.streaming.state import (
        DAILY_UV_SCHEMA,
        DAILY_UV_STATE,
        apply_stateful,
        daily_uv_func,
    )

    batches = [
        [{"key": "u1", "cur_date": "2024-01-02"}],
        [{"key": "u1", "cur_date": "2024-01-01"}],  # late, never counted before
        [{"key": "u1", "cur_date": "2024-01-01"}],  # repeat: stays deduped
    ]
    d = os.path.join(str(tmp_path), "uvunseen")
    os.makedirs(d)
    for i, rows in enumerate(batches):
        with open(os.path.join(d, f"{i:02d}.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        time.sleep(1.1)
    s = (
        spark.readStream.schema("key string, cur_date string")
        .option("maxFilesPerTrigger", "1")
        .json(d)
    )
    out = apply_stateful(s.groupBy("key"), daily_uv_func, DAILY_UV_SCHEMA, DAILY_UV_STATE)
    _drain(out, tmp_path, "uv_unseen")
    per_day = {
        r["cur_date"]: r["uv"]
        for r in spark.sql("select cur_date, sum(uv) uv from uv_unseen group by 1").collect()
    }
    assert per_day == {"2024-01-01": 1, "2024-01-02": 1}


def test_streaming_pay_suc_topology_matches_batch(spark, sf_dir, tmp_path):
    """The composed payment-success app as a real two-stream topology
    (status-flip filter -> watermarked interval join -> static lookup):
    an availableNow replay over the fixtures emits exactly the batch
    catalog entry's rows (inner stream-stream joins emit eagerly)."""
    from flink_gmall2024_realtime_spark.operators.etl import update_delta_predicate
    from flink_gmall2024_realtime_spark.plans import CATALOG
    from flink_gmall2024_realtime_spark.sources.fixtures import load_table, table_path
    from flink_gmall2024_realtime_spark.streaming import pipelines

    o_schema = spark.read.parquet(table_path(sf_dir, "orders")).schema
    li_schema = spark.read.parquet(table_path(sf_dir, "lineitem")).schema
    o_stream = (
        spark.readStream.schema(o_schema)
        .option("pathGlobFilter", "orders.parquet").parquet(sf_dir)
    )
    li_stream = (
        spark.readStream.schema(li_schema)
        .option("pathGlobFilter", "lineitem.parquet").parquet(sf_dir)
    )
    pay_cdc = o_stream.select(
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
        .select("order_id", "user_id",
                F.col("data")["payment_type"].alias("payment_type_code"), "pay_ts")
    )
    # order-detail stream enriched by the bounded orders table (stream-static)
    o_static = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    od = (
        li_stream.join(o_static, li_stream["l_orderkey"] == F.col("o_orderkey"))
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
    dic = spark.createDataFrame(
        [("1101", "Alipay"), ("1102", "WeChat"), ("1103", "UnionPay")],
        "dic_code string, dic_name string",
    )
    out = pipelines.dwd_trade_pay_suc_pipeline(od, pay, dic)
    _drain(out, tmp_path, "pay_suc_stream")
    got = {tuple(r) for r in spark.sql("select * from pay_suc_stream").collect()}
    want = {tuple(r) for r in CATALOG["dwd_trade_pay_suc_detail"].spark(spark, sf_dir).collect()}
    assert got == want and len(want) > 0
