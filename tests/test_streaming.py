"""Structured Streaming tests: replay fixtures through micro-batches and
assert streaming results match the batch-declarative (oracle-checked) forms —
the backfill/live consistency contract (SURVEY §5)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_gmall2024_realtime_spark.operators import state as batch_state
from flink_gmall2024_realtime_spark.sources.fixtures import load_table
from flink_gmall2024_realtime_spark.streaming import pipelines, sinks
from flink_gmall2024_realtime_spark.streaming.state import (
    DAILY_UV_SCHEMA,
    DAILY_UV_STATE,
    LOGIN_SCHEMA,
    LOGIN_STATE,
    apply_stateful,
    daily_uv_func,
    returning_user_func,
)


def run_stream(df, tmpdir, name):
    """Drain a streaming DataFrame into memory via availableNow."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


def test_streaming_window_counts_match_batch(spark, sf_dir, tmp_path):
    ev_stream = pipelines.stream_events(spark, sf_dir)
    out = pipelines.windowed_type_counts(ev_stream)
    run_stream(out, str(tmp_path), "win_counts")
    got = {
        (r["stt"], r["event_type"]): (r["pv_ct"], r["val_sum"])
        for r in spark.sql("select * from win_counts").collect()
    }
    # batch reference = the oracle-checked catalog query
    from flink_gmall2024_realtime_spark.plans import CATALOG

    batch_rows = CATALOG["dws_tumble_type_counts"].spark(spark, sf_dir).collect()
    want = {(r["stt"], r["event_type"]): (r["pv_ct"], r["val_sum"]) for r in batch_rows}
    # Append-mode semantics: windows not yet closed by the final watermark
    # (those covering the last events) stay in state and are not emitted —
    # everything the stream DID emit must match the batch result exactly,
    # and only trailing windows may be withheld.
    from datetime import datetime, timedelta

    assert got == {k: v for k, v in want.items() if k in got}  # emitted == batch
    withheld = set(want) - set(got)
    max_edt = datetime.strptime(max(r["edt"] for r in batch_rows), "%Y-%m-%d %H:%M:%S")
    wm_cut = max_edt - timedelta(seconds=30)
    for stt, _etype in withheld:  # only trailing (unclosed) windows withheld
        assert datetime.strptime(stt, "%Y-%m-%d %H:%M:%S") >= wm_cut


def test_streaming_is_new_repair_matches_batch(spark, sf_dir, tmp_path):
    ev_stream = pipelines.stream_events(spark, sf_dir)
    out = pipelines.is_new_repair_stream(ev_stream)
    run_stream(out, str(tmp_path), "is_new")
    got = {
        (r["key"], r["cur_date"]): r["is_new"]
        for r in spark.sql("select key, cur_date, max(is_new) is_new from is_new group by 1,2").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (str(r["user_id"]), str(r["cur_date"])): r["is_new"]
        for r in batch_state.first_seen_repair(ev, "user_id", F.to_date("ts"))
        .select("user_id", "cur_date", "is_new")
        .distinct()
        .collect()
    }
    assert got == want


def test_streaming_user_register_matches_batch(spark, sf_dir, tmp_path):
    """The register-window app's streaming twin emits exactly the batch
    catalog result for every window the watermark closed."""
    ev_stream = pipelines.stream_events(spark, sf_dir)
    out = pipelines.dws_user_register_pipeline(ev_stream)
    run_stream(out, str(tmp_path), "user_reg")
    got = {
        r["stt"]: r["register_ct"]
        for r in spark.sql("select * from user_reg").collect()
    }
    from flink_gmall2024_realtime_spark.plans import CATALOG

    want = {
        r["stt"]: r["register_ct"]
        for r in CATALOG["dws_user_register"].spark(spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in want.items() if k in got}
    assert len(got) >= len(want) - 3  # only trailing (unclosed) windows withheld


def test_stateful_daily_uv_matches_batch(spark, sf_dir, tmp_path):
    ev_stream = pipelines.stream_events(spark, sf_dir)
    keyed = ev_stream.select(
        F.col("user_id").cast("string").alias("key"),
        F.date_format("ts", "yyyy-MM-dd").alias("cur_date"),
    )
    out = apply_stateful(keyed.groupBy("key"), daily_uv_func, DAILY_UV_SCHEMA, DAILY_UV_STATE)
    daily = out.groupBy("cur_date").agg(F.sum("uv").alias("uv_ct"))
    q = (
        daily.writeStream.format("memory")
        .queryName("daily_uv")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt_uv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {str(r["cur_date"]): r["uv_ct"] for r in spark.sql("select * from daily_uv").collect()}
    ev = load_table(spark, sf_dir, "events")
    want = {
        str(r["cur_date"]): r["uv_ct"]
        for r in ev.groupBy(F.to_date("ts").alias("cur_date"))
        .agg(F.count_distinct("user_id").alias("uv_ct"))
        .collect()
    }
    assert got == want


def test_stateful_returning_users_matches_batch(spark, sf_dir, tmp_path):
    ev_stream = pipelines.stream_events(spark, sf_dir)
    keyed = ev_stream.select(
        F.col("user_id").cast("string").alias("key"),
        F.date_format("ts", "yyyy-MM-dd").alias("cur_date"),
    )
    out = apply_stateful(keyed.groupBy("key"), returning_user_func, LOGIN_SCHEMA, LOGIN_STATE)
    run_stream(out, str(tmp_path), "login")
    got = {
        str(r["cur_date"]): (r["uu"], r["back"])
        for r in spark.sql(
            "select cur_date, sum(uu) uu, sum(back) back from login group by 1"
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    flags = batch_state.returning_user_flags(
        ev.select("user_id", F.to_date("ts").alias("d")), "user_id", "d"
    )
    want = {
        str(r["d"]): (r["uu"], r["back"])
        for r in flags.groupBy("d").agg(F.sum("uu").alias("uu"), F.sum("back").alias("back")).collect()
    }
    assert got == want


def test_online_dedup_matches_batch_exact_dedup(spark, sf_dir, tmp_path):
    """Streaming first-seen-by-content-hash == batch exact_dedup keepers
    (same keep-smallest policy), replayed from the documents fixture."""
    from flink_gmall2024_realtime_spark.operators.dedup import exact_dedup
    from flink_gmall2024_realtime_spark.streaming.state import (
        SEEN_HASH_SCHEMA,
        SEEN_HASH_STATE,
        online_dedup_func,
    )

    raw = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    hashed = raw.select(F.md5("text").alias("content_hash"), "doc_id")
    out = apply_stateful(
        hashed.groupBy("content_hash"), online_dedup_func, SEEN_HASH_SCHEMA, SEEN_HASH_STATE
    )
    run_stream(out.filter(F.col("is_first") == 1), str(tmp_path), "online_dedup")
    got = {
        r["content_hash"]: r["doc_id"]
        for r in spark.sql("select * from online_dedup").collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    want = {r["content_hash"]: r["keep_id"] for r in exact_dedup(docs).collect()}
    assert got == want


def test_keyed_upsert_sink_merge_and_delete(spark, tmp_path):
    path = os.path.join(str(tmp_path), "dim_user")
    writer = sinks.keyed_upsert_sink(spark, path, key="id", order_col="ts", type_col="type")
    b1 = spark.createDataFrame(
        [("1", "insert", "alice", 10), ("2", "insert", "bob", 11)],
        "id string, type string, name string, ts long",
    )
    writer(b1, 0)
    b2 = spark.createDataFrame(
        [("1", "update", "alice2", 20), ("1", "update", "alice3", 25),
         ("2", "delete", None, 21), ("3", "insert", "carol", 22)],
        "id string, type string, name string, ts long",
    )
    writer(b2, 1)
    final = {r["id"]: r["name"] for r in spark.read.parquet(path).collect()}
    assert final == {"1": "alice3", "3": "carol"}  # latest wins, delete removes


def test_keyed_upsert_sink_rewrites_only_touched_buckets(spark, tmp_path):
    """Per-batch write cost must be proportional to the batch, not the table:
    buckets without batch keys keep byte-identical file listings."""
    path = os.path.join(str(tmp_path), "dim_bucketed")
    writer = sinks.keyed_upsert_sink(spark, path, key="id", order_col="ts", n_buckets=8)
    b1 = spark.createDataFrame(
        [(str(i), f"v{i}", 1) for i in range(40)], "id string, v string, ts long"
    )
    writer(b1, 0)
    bucket_dirs = sorted(d for d in os.listdir(path) if d.startswith("bucket="))
    assert len(bucket_dirs) > 1

    def listing(d):
        full = os.path.join(path, d)
        return sorted((f, os.path.getmtime(os.path.join(full, f))) for f in os.listdir(full))

    before = {d: listing(d) for d in bucket_dirs}
    writer(spark.createDataFrame([("7", "v7b", 2)], "id string, v string, ts long"), 1)
    touched = spark.createDataFrame([("7",)], "id string").select(
        F.pmod(F.xxhash64("id"), F.lit(8)).cast("int").alias("b")
    ).collect()[0]["b"]
    assert sorted(d for d in os.listdir(path) if d.startswith("bucket=")) == bucket_dirs
    for d in bucket_dirs:
        if d == f"bucket={touched}":
            assert listing(d) != before[d]
        else:
            assert listing(d) == before[d]
    final = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    want = {str(i): f"v{i}" for i in range(40)}
    want["7"] = "v7b"
    assert final == want


def test_keyed_upsert_sink_heals_interrupted_swap(spark, tmp_path):
    """A crash between the two swap renames leaves only `.old_NN`; the next
    write must restore it and merge on top — no data loss."""
    path = os.path.join(str(tmp_path), "dim_heal")
    writer = sinks.keyed_upsert_sink(spark, path, key="id", order_col="ts", n_buckets=4)
    writer(spark.createDataFrame([("a", 1, 1)], "id string, v long, ts long"), 0)
    (bdir,) = [d for d in os.listdir(path) if d.startswith("bucket=")]
    n = bdir.split("=")[1]
    os.rename(os.path.join(path, bdir), os.path.join(path, f".old_{n}"))
    writer(spark.createDataFrame([("b", 9, 2)], "id string, v long, ts long"), 1)
    rows = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert rows.get("a") == 1  # healed from the interrupted swap
    assert rows.get("b") == 9


def test_append_sink_replay_is_idempotent(spark, tmp_path):
    """W6: an at-least-once replay of a committed micro-batch must not
    duplicate rows in the append-mode serving sink."""
    writer = sinks.append_serving_sink(str(tmp_path), "dws_serving")
    batch = spark.createDataFrame(
        [("2024-01-01", "view", 10), ("2024-01-01", "click", 5)],
        "cur_date string, event_type string, ct long",
    )
    writer(batch, 0)
    writer(batch, 0)  # replay after a simulated driver restart
    writer(batch, 1)  # a genuinely new batch still appends
    rows = spark.read.parquet(os.path.join(str(tmp_path), "dws_serving")).collect()
    assert len(rows) == 4
    assert sorted({r["_batch_id"] for r in rows}) == [0, 1]


def test_streaming_restart_resumes_without_duplicates(spark, tmp_path):
    """W6 end-to-end: stop a checkpointed stream, add input, restart with the
    same checkpoint — the second run processes ONLY the new file, and the
    commit-marker sink keeps output exactly-once across both runs."""
    import json

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out_base = os.path.join(str(tmp_path), "out")
    writer = sinks.append_serving_sink(out_base, "agg")

    def run_once():
        q = (
            spark.readStream.schema("cur_date string, v long")
            .json(src)
            .writeStream.foreachBatch(writer)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    with open(os.path.join(src, "a.jsonl"), "w") as f:
        f.write(json.dumps({"cur_date": "2024-01-01", "v": 1}) + "\n")
    run_once()
    with open(os.path.join(src, "b.jsonl"), "w") as f:
        f.write(json.dumps({"cur_date": "2024-01-02", "v": 2}) + "\n")
    run_once()
    run_once()  # a third run with nothing new must write nothing

    rows = spark.read.parquet(os.path.join(out_base, "agg")).collect()
    # cur_date comes back as a date: partition-dir values are type-inferred
    assert sorted((str(r["cur_date"]), r["v"]) for r in rows) == [
        ("2024-01-01", 1),
        ("2024-01-02", 2),
    ]


def test_dim_catalog_ddl_ops(tmp_path):
    cat = sinks.DimCatalog(os.path.join(str(tmp_path), "dims"))
    cat.apply_ops([{"op": "c", "sink_table": "dim_a"}, {"op": "c", "sink_table": "dim_b"}])
    assert cat.tables() == ["dim_a", "dim_b"]
    cat.apply_ops([{"op": "d", "sink_table": "dim_a"}, {"op": "u", "sink_table": "dim_b"}])
    assert cat.tables() == ["dim_b"]


def test_dim_app_pipeline_end_to_end(spark, tmp_path):
    """DimApp topology (config-driven routing -> prune -> keyed upsert)."""
    catalog = sinks.DimCatalog(os.path.join(str(tmp_path), "dimstore"))
    cfg = spark.createDataFrame(
        [("user_info", "dim_user_info", "id,name", "id", "c"),
         ("sku_info", "dim_sku_info", "id,price", "id", "c")],
        "source_table string, sink_table string, sink_columns string, sink_row_key string, op string",
    )
    batch = spark.createDataFrame(
        [
            ("user_info", "insert", {"id": "1", "name": "a", "secret": "x"}, 1),
            ("user_info", "update", {"id": "1", "name": "a2", "secret": "y"}, 2),
            ("sku_info", "insert", {"id": "9", "price": "5", "junk": "z"}, 1),
            ("other_tbl", "insert", {"id": "7"}, 1),  # unrouted -> dropped
        ],
        "`table` string, type string, data map<string,string>, ts long",
    )
    process = pipelines.dim_app_pipeline(spark, None, cfg, catalog, str(tmp_path))
    process(batch, 0)
    assert catalog.tables() == ["dim_sku_info", "dim_user_info"]
    users = spark.read.parquet(catalog.path("dim_user_info") + "/table").collect()
    assert len(users) == 1
    assert users[0]["data"] == {"id": "1", "name": "a2"}  # pruned + latest
    skus = spark.read.parquet(catalog.path("dim_sku_info") + "/table").collect()
    assert skus[0]["data"] == {"id": "9", "price": "5"}


def test_dwd_base_log_split_stream(spark, tmp_path):
    """R1 five-way split on a streamed JSON log file."""
    logs = [
        '{"common":{"mid":"m1","is_new":"1"},"page":{"page_id":"home"},"ts":1000,"displays":[{"item":"a","item_type":"sku","pos_id":"1"}]}',
        '{"common":{"mid":"m2","is_new":"0"},"start":{"entry":"icon","open_ad_id":"5"},"ts":2000}',
        '{"common":{"mid":"m3"},"err":{"error_code":"42","msg":"x"},"page":{"page_id":"cart"},"ts":3000}',
    ]
    src = os.path.join(str(tmp_path), "logs")
    os.makedirs(src)
    with open(os.path.join(src, "part-0.txt"), "w") as f:
        f.write("\n".join(logs))
    raw = spark.readStream.format("text").schema("value string").load(src)
    branches = pipelines.dwd_base_log_pipeline(raw)
    counts = {}
    for name, df in branches.items():
        q = run_stream(df, str(tmp_path), f"branch_{name}")
        counts[name] = spark.sql(f"select count(*) c from branch_{name}").collect()[0]["c"]
    assert counts == {"err": 1, "start": 1, "display": 1, "action": 0, "page": 2}


def test_streaming_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """The gap-session processor assigns every event the same session_start
    flag and session_id the batch sessionize window plan assigns on replay."""
    from flink_gmall2024_realtime_spark.streaming.state import (
        SESSION_SCHEMA,
        SESSION_STATE,
        session_window_func,
    )

    ev_stream = pipelines.stream_events(spark, sf_dir)
    keyed = ev_stream.filter(F.col("user_id").isNotNull()).select(
        F.col("user_id").cast("string").alias("key"),
        "event_id",
        F.col("ts").cast("timestamp").cast("double").alias("ts_secs"),
    )
    out = apply_stateful(
        keyed.groupBy("key"), session_window_func, SESSION_SCHEMA, SESSION_STATE
    )
    run_stream(out, str(tmp_path), "sessions")
    got = {
        r["event_id"]: (r["session_start"], r["session_id"])
        for r in spark.sql("select * from sessions").collect()
    }

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    want = {
        r["event_id"]: (r["session_start"], r["session_id"])
        for r in batch_state.sessionize(ev, "user_id", "ts").collect()
    }
    assert got == want


def test_dim_app_pipeline_live_jdbc_config_mid_stream_change(spark, tmp_path):
    """W5 made moot, proven against a LIVE JDBC database: the pipeline's
    config DataFrame is Derby-backed, so every batch's collect() re-reads a
    fresh snapshot — a config row added between batches routes the very next
    batch, with no broadcast-state race to guard (DimApp.java:73-74's
    machinery)."""
    from flink_gmall2024_realtime_spark.sources.cdc import jdbc_config_source

    url = "jdbc:derby:memory:gmall_dimcfg;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    schema = (
        "source_table string, sink_table string, sink_columns string, "
        "sink_row_key string, op string"
    )
    # Derby maps StringType to CLOB by default, which its SQL can't compare —
    # and the pipeline's `op != 'd'` filter is pushed down to the database
    varchar_cols = ", ".join(
        f"{c} VARCHAR(256)"
        for c in ["source_table", "sink_table", "sink_columns", "sink_row_key", "op"]
    )

    def write_cfg(rows):
        (
            spark.createDataFrame(rows, schema)
            .write.option("createTableColumnTypes", varchar_cols)
            .jdbc(url, "table_process_dim", mode="overwrite", properties=props)
        )

    write_cfg([("user_info", "dim_user_info", "id,name", "id", "c")])

    catalog = sinks.DimCatalog(os.path.join(str(tmp_path), "dimstore_jdbc"))
    cfg = jdbc_config_source(spark, url, "table_process_dim", "", "", props["driver"])
    process = pipelines.dim_app_pipeline(spark, None, cfg, catalog, str(tmp_path))

    mk = lambda rows: spark.createDataFrame(
        rows, "`table` string, type string, data map<string,string>, ts long"
    )
    process(mk([("user_info", "insert", {"id": "1", "name": "a"}, 1),
                ("sku_info", "insert", {"id": "9", "price": "5"}, 1)]), 0)
    assert catalog.tables() == ["dim_user_info"]  # sku not routed yet

    # config change lands in the DB between micro-batches
    write_cfg([("user_info", "dim_user_info", "id,name", "id", "c"),
               ("sku_info", "dim_sku_info", "id,price", "id", "c")])

    process(mk([("sku_info", "insert", {"id": "9", "price": "5", "junk": "z"}, 2)]), 1)
    assert catalog.tables() == ["dim_sku_info", "dim_user_info"]
    skus = spark.read.parquet(catalog.path("dim_sku_info") + "/table").collect()
    assert skus[0]["data"] == {"id": "9", "price": "5"}


def test_jdbc_merge_sink_transactional_upsert_delete(spark):
    """The transactional-MERGE seam, end-to-end against a live database:
    micro-batches of insert/update/delete changelog rows applied to a Derby
    table via staging-load + one SQL MERGE each; replaying a batch is a
    no-op (MERGE idempotence = effectively-once without markers)."""
    from flink_gmall2024_realtime_spark.streaming.sinks import jdbc_merge_sink

    url = "jdbc:derby:memory:gmall_merge;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    # only predicate columns get VARCHAR: Spark's Derby dialect writes null
    # strings as setNull(CLOB), which Derby rejects against VARCHAR columns,
    # so the nullable payload column keeps the default CLOB type
    vt = "id VARCHAR(64), type VARCHAR(16)"
    sink = jdbc_merge_sink(
        url, "dim_t", key="id", order_col="ts", type_col="type",
        driver=driver, column_types=vt,
    )
    mk = lambda rows: spark.createDataFrame(
        rows, "id string, v string, type string, ts long"
    )

    sink(mk([("1", "a", "insert", 1), ("1", "a2", "update", 2),
             ("2", "b", "insert", 1)]), 0)
    sink(mk([("2", None, "delete", 3), ("3", "c", "insert", 1)]), 1)
    sink(mk([("2", None, "delete", 3), ("3", "c", "insert", 1)]), 1)  # replay

    got = {
        r["id"]: r["v"]
        for r in spark.read.jdbc(url, "dim_t", properties={"driver": driver}).collect()
    }
    assert got == {"1": "a2", "3": "c"}


def test_jdbc_merge_sink_from_writestream(spark, sf_dir, tmp_path):
    """The MERGE sink wired into a real writeStream.foreachBatch loop over
    the replayed events fixture: the final Derby table equals the batch
    fold (latest per user; error events delete the key)."""
    from flink_gmall2024_realtime_spark.operators.merge import fold_changelog
    from flink_gmall2024_realtime_spark.streaming.sinks import jdbc_merge_sink

    url = "jdbc:derby:memory:gmall_stream_merge;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

    def changelog(df):
        return df.filter(F.col("user_id").isNotNull()).select(
            F.col("user_id").cast("string").alias("id"),
            F.round("value", 2).cast("string").alias("v"),
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("upsert")
            .alias("type"),
            F.col("ts").cast("timestamp").cast("double").alias("ord"),
            "event_id",
        ).withColumn("ord", F.col("ord") * 1000000 + F.col("event_id")).drop("event_id")

    sink = jdbc_merge_sink(
        url, "dim_user_latest", key="id", order_col="ord", type_col="type",
        driver=driver, column_types="id VARCHAR(64), type VARCHAR(16)",
    )
    q = (
        changelog(pipelines.stream_events(spark, sf_dir))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt_merge"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        r["id"]: r["v"]
        for r in spark.read.jdbc(url, "dim_user_latest", properties={"driver": driver}).collect()
    }
    ev = changelog(load_table(spark, sf_dir, "events"))
    latest = fold_changelog(ev, ["id"], ["ord"])
    want = {
        r["id"]: r["v"] for r in latest.filter(F.col("type") != "delete").collect()
    }
    assert got == want


def test_lsh_dedup_sink_streaming_equals_batch(spark, sf_dir, tmp_path):
    """Streaming micro-batch dedup service: the union of per-batch pair
    emissions over a 3-batch replay equals the full-corpus LSH pair set,
    and the index store ends holding every document exactly once."""
    from flink_gmall2024_realtime_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = os.path.join(str(tmp_path), "incoming")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"chunk={i}")
        )
    index_path = os.path.join(str(tmp_path), "lsh_index")
    pairs_path = os.path.join(str(tmp_path), "lsh_pairs")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            sinks.lsh_dedup_sink(spark, index_path, pairs_path)
        )
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in spark.read.parquet(os.path.join(pairs_path, "data")).collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    assert got == want and len(want) > 0
    # r7 store-side collapse: the docs store holds one rep row per distinct
    # shingle set per batch; every document appears exactly once across the
    # member lists (docs with <3 tokens produce no index row by contract)
    indexed = spark.read.parquet(os.path.join(index_path, "docs"))
    members = indexed.select(F.explode("ids").alias("doc_id"))
    n_indexable = dedup.minhash_index(docs).count()
    assert members.count() == n_indexable
    assert members.distinct().count() == n_indexable
    # reps are members of their own group
    assert indexed.filter(~F.array_contains("ids", F.col("doc_id"))).count() == 0


def test_lsh_dedup_sink_prunes_index_scan_to_colliding_partitions(spark, sf_dir, tmp_path):
    """The per-batch candidate scan must read ONLY the band-store partitions
    whose p = pmod(bkt, P) collides with the batch's own band keys — a
    one-doc batch touches at most 32 band keys, so with P=64 it must read a
    strict subset of the store's partition directories (file-count
    assertion), and pruning must be lossless: pairs equal the unpruned
    incremental run against the full index."""
    import glob

    from flink_gmall2024_realtime_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index_path = os.path.join(str(tmp_path), "lsh_index")
    pairs_path = os.path.join(str(tmp_path), "lsh_pairs")
    write = sinks.lsh_dedup_sink(
        spark, index_path, pairs_path, band_partitions=64, doc_partitions=64
    )
    corpus = docs.filter(F.col("doc_id") % 3 != 2)
    write(corpus, 0)  # seed the store
    bands_root = os.path.join(index_path, "bands")
    all_parts = glob.glob(os.path.join(bands_root, "batch=*", "p=*"))

    one = docs.orderBy("doc_id").limit(1)
    sig = dedup.minhash_index(one)
    pvals = {
        r["p"]
        for r in sig.select(F.explode("bkt").alias("bkt"))
        .select(F.pmod("bkt", F.lit(64)).alias("p"))
        .collect()
    }
    pruned = sinks.colliding_partition_paths(bands_root, "p", pvals)
    assert 0 < len(pruned) < len(all_parts)  # strict subset of the store
    assert set(pruned) <= set(all_parts)
    # lossless: the pruned banded read yields the same pairs as the
    # unpruned incremental run against the full index frame
    write(one, 1)
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in spark.read.parquet(
            os.path.join(pairs_path, "data", "batch=1")
        ).collect()
    }
    full_index = dedup.minhash_index(corpus)
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs_incremental(one, full_index).collect()
    }
    assert got == want and len(want) > 0


def test_lsh_dedup_sink_crash_between_write_and_marker_is_idempotent(spark, sf_dir, tmp_path):
    """ADVICE r2: a crash AFTER the pairs/index write but BEFORE the commit
    marker must not duplicate rows on replay — every batch write overwrites
    its own deterministic batch=<id> directory, so replaying batch N
    rewrites the same data instead of appending a second copy."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index_path = os.path.join(str(tmp_path), "lsh_index")
    pairs_path = os.path.join(str(tmp_path), "lsh_pairs")
    write = sinks.lsh_dedup_sink(spark, index_path, pairs_path)
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 != 0)
    write(b0, 0)
    write(b1, 1)
    # simulate the crash window: markers for batch 1 vanish after the data
    # landed, so the replay re-runs the full batch-1 write path
    os.remove(os.path.join(pairs_path, "_commits", "1"))
    os.remove(os.path.join(index_path, "_commits", "1"))
    write(b1, 1)
    pairs = spark.read.parquet(os.path.join(pairs_path, "data")).select(
        "id_a", "id_b", "jaccard"
    )
    assert pairs.count() == pairs.distinct().count()  # no duplicated pairs
    indexed = spark.read.parquet(os.path.join(index_path, "docs"))
    members = indexed.select(F.explode("ids").alias("doc_id"))
    assert members.count() == members.distinct().count()  # no double inserts
    from flink_gmall2024_realtime_spark.operators import dedup

    assert members.count() == dedup.minhash_index(docs).count()

    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in pairs.collect()}
    assert got == want


def test_lsh_index_compaction_preserves_pairs_and_prunes(spark, sf_dir, tmp_path):
    """compact_lsh_index folds per-batch store dirs into one batch=base:
    same future pairs, pruning intact, O(1) dirs per partition — and an
    interrupted swap heals on the next write."""
    import glob

    from flink_gmall2024_realtime_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index_path = os.path.join(str(tmp_path), "lsh_index")
    pairs_path = os.path.join(str(tmp_path), "lsh_pairs")
    write = sinks.lsh_dedup_sink(spark, index_path, pairs_path)
    for i in range(3):
        write(docs.filter(F.col("doc_id") % 4 == i), i)
    bands_root = os.path.join(index_path, "bands")
    assert len(glob.glob(os.path.join(bands_root, "batch=*"))) == 3
    sinks.compact_lsh_index(spark, index_path)
    assert [os.path.basename(d) for d in glob.glob(os.path.join(bands_root, "batch=*"))] == ["batch=base"]
    # the fourth batch dedups against the compacted store identically
    last = docs.filter(F.col("doc_id") % 4 == 3)
    write(last, 3)
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in spark.read.parquet(os.path.join(pairs_path, "data", "batch=3")).collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs_incremental(
            last, dedup.minhash_index(docs.filter(F.col("doc_id") % 4 != 3))
        ).collect()
    }
    assert got == want and len(want) > 0
    # index content identical to the uncompacted equivalent
    indexed = spark.read.parquet(os.path.join(index_path, "docs"))
    assert indexed.count() == docs.count()
    # interrupted swap: live root renamed aside, stage in place -> heal
    os.rename(bands_root, bands_root + ".old")
    sinks._heal_store(bands_root)
    assert os.path.isdir(bands_root) and not os.path.isdir(bands_root + ".old")


def test_streaming_keyword_window_matches_batch(spark, sf_dir, tmp_path):
    """The keyword-window app's streaming twin emits exactly the batch
    catalog rows for every window the watermark closed."""
    ev_stream = pipelines.stream_events(spark, sf_dir)
    out = pipelines.dws_keyword_pipeline(ev_stream)
    run_stream(out, str(tmp_path), "kw_win")
    got = {
        (r["stt"], r["keyword"]): r["keyword_count"]
        for r in spark.sql("select * from kw_win").collect()
    }
    from flink_gmall2024_realtime_spark.plans import CATALOG

    want = {
        (r["stt"], r["keyword"]): r["keyword_count"]
        for r in CATALOG["dws_keyword_window"].spark(spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in want.items() if k in got}
    trailing = {k for k in want if k not in got}
    # only windows at the very end of the stream (not closed by the final
    # watermark) may be withheld
    if trailing:
        max_closed = max(stt for stt, _ in got)
        assert all(stt >= max_closed for stt, _ in trailing)


def test_lsh_dedup_sink_restart_exactly_once(spark, sf_dir, tmp_path):
    """Stop the dedup service, add new input, restart: the checkpoint
    resumes at the right offset and the commit markers keep emissions
    exactly-once — the final pair set equals the full-corpus run with no
    duplicates."""
    from flink_gmall2024_realtime_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = os.path.join(str(tmp_path), "incoming")
    ck = os.path.join(str(tmp_path), "ck")
    index_path = os.path.join(str(tmp_path), "lsh_index")
    pairs_path = os.path.join(str(tmp_path), "lsh_pairs")

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                sinks.lsh_dedup_sink(spark, index_path, pairs_path)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for i in range(2):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"chunk={i}")
        )
    run_once()  # first life: chunks 0 and 1
    docs.filter(F.col("doc_id") % 3 == 2).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "chunk=2")
    )
    run_once()  # restart: must process only chunk 2
    run_once()  # replay with nothing new: must be a no-op

    pairs = spark.read.parquet(os.path.join(pairs_path, "data")).select(
        "id_a", "id_b", "jaccard"
    )
    assert pairs.count() == pairs.distinct().count()  # no duplicate emissions
    got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in pairs.collect()}
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    assert got == want
    indexed = spark.read.parquet(os.path.join(index_path, "docs"))
    assert indexed.select(F.explode("ids")).count() == dedup.minhash_index(docs).count()


def test_lsh_dedup_sink_flood_in_store_is_rep_collapsed(spark, tmp_path):
    """VERDICT r5 #5 (r7): a duplicate flood RESIDENT in the index costs one
    band row per band per batch, never one per copy — and later batches
    colliding with it still emit the exact full-corpus pair set."""
    from flink_gmall2024_realtime_spark.operators import dedup

    # under the 256 star cap so the union is EXACTLY the batch operator's
    # output (an over-cap flood emits the documented per-batch capped
    # superset — components identical); the store-collapse assertion below
    # is cap-independent
    n_flood = 200
    flood_text = "spam boilerplate page about cheap watches and replica goods"
    uniq = [
        (1000 + i, f"document number {i} concerning unrelated subject matter {i * 7}")
        for i in range(20)
    ]
    batch0 = spark.createDataFrame(
        [(i, flood_text) for i in range(n_flood)] + uniq, "doc_id long, text string"
    )
    # batch 1: one more copy of the flood text + a near-dup of it
    batch1 = spark.createDataFrame(
        [
            (5000, flood_text),
            (5001, "spam boilerplate page about cheap watches and replica handbags"),
            (5002, "completely unrelated fresh document about gardening tips"),
        ],
        "doc_id long, text string",
    )
    index_path = os.path.join(str(tmp_path), "idx")
    pairs_path = os.path.join(str(tmp_path), "prs")
    write = sinks.lsh_dedup_sink(spark, index_path, pairs_path)
    write(batch0, 0)
    # store-side collapse: batch 0's band store holds one row per band per
    # DISTINCT set (21 sets x 32 bands), not per copy (319 x 32)
    bands0 = spark.read.schema(sinks.BANDS_SCHEMA).parquet(
        os.path.join(index_path, "bands", "batch=0", "p=*")
    )
    n_sets = 21  # flood collapses to 1 + 20 unique docs
    assert bands0.count() == n_sets * 32
    assert bands0.select("idx_id").distinct().count() == n_sets
    write(batch1, 1)
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in spark.read.parquet(os.path.join(pairs_path, "data")).collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs(batch0.unionByName(batch1)).collect()
    }
    assert got == want and len(want) > 0
    # the flood pairs themselves are present (all-pairs within the flood,
    # subject to the same rep-expansion cap as the batch operator)
    assert any(a < n_flood and b == 5000 for a, b, _ in got)


def test_pq_index_sink_streaming_equals_batch(spark, sf_dir, tmp_path):
    """Streaming PQ index maintenance: codes accumulated over a 3-batch
    replay equal one batch encode of the whole corpus (frozen codebook),
    and a replayed batch does not duplicate rows."""
    from flink_gmall2024_realtime_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = similarity.pq_codebook(emb)
    index_path = os.path.join(str(tmp_path), "pq_index")
    write = sinks.pq_index_sink(spark, index_path, cb)
    for i in range(3):
        write(emb.filter(F.col("vec_id") % 3 == i), i)
    os.remove(os.path.join(index_path, "_commits", "2"))
    write(emb.filter(F.col("vec_id") % 3 == 2), 2)  # lost-marker replay
    got = {
        r["neighbor_id"]: tuple(r["code"])
        for r in spark.read.parquet(os.path.join(index_path, "codes")).collect()
    }
    want = {
        r["neighbor_id"]: tuple(r["code"])
        for r in similarity.pq_encode(emb, cb).collect()
    }
    assert got == want and len(want) == emb.count()


def test_semantic_dedup_sink_streaming_equals_batch(spark, sf_dir, tmp_path):
    """Streaming SemDeDup twin (frozen trained centroids): the union of
    per-batch pair emissions over a 3-batch replay equals the batch
    ``semantic_dedup_pairs`` output, and the cell store ends holding every
    vector exactly once."""
    from flink_gmall2024_realtime_spark.operators import dedup, similarity

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ids, cen_micro = similarity.kmeans_centroids_micro(emb, k=8, iters=3)
    centroids = (ids, cen_micro / 1e6)
    src = os.path.join(str(tmp_path), "incoming")
    for i in range(3):
        emb.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"chunk={i}")
        )
    index_path = os.path.join(str(tmp_path), "sem_index")
    pairs_path = os.path.join(str(tmp_path), "sem_pairs")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            sinks.semantic_dedup_sink(spark, centroids, index_path, pairs_path, threshold=0.4)
        )
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in spark.read.parquet(os.path.join(pairs_path, "data")).collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in dedup.semantic_dedup_pairs(emb, centroids, threshold=0.4).collect()
    }
    assert got == want and len(want) > 0
    cells = spark.read.parquet(os.path.join(index_path, "cells"))
    assert cells.count() == emb.count()
    assert cells.select("vid").distinct().count() == emb.count()


def test_semantic_dedup_sink_restart_exactly_once(spark, sf_dir, tmp_path):
    """Stop the semantic dedup service, add new input, restart twice: the
    checkpoint resumes at the right offset, markers keep emissions
    exactly-once, and the final pair set equals the batch run."""
    from flink_gmall2024_realtime_spark.operators import dedup, similarity

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ids, cen_micro = similarity.kmeans_centroids_micro(emb, k=8, iters=3)
    centroids = (ids, cen_micro / 1e6)
    src = os.path.join(str(tmp_path), "incoming")
    ck = os.path.join(str(tmp_path), "ck")
    index_path = os.path.join(str(tmp_path), "sem_index")
    pairs_path = os.path.join(str(tmp_path), "sem_pairs")

    def run_once():
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                sinks.semantic_dedup_sink(spark, centroids, index_path, pairs_path, threshold=0.4)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for i in range(2):
        emb.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"chunk={i}")
        )
    run_once()  # first life: chunks 0 and 1
    emb.filter(F.col("vec_id") % 3 == 2).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "chunk=2")
    )
    run_once()  # restart: must process only chunk 2
    run_once()  # replay with nothing new: must be a no-op

    pairs = spark.read.parquet(os.path.join(pairs_path, "data")).select("id_a", "id_b", "sim")
    assert pairs.count() == pairs.distinct().count()  # no duplicate emissions
    got = {(r["id_a"], r["id_b"], r["sim"]) for r in pairs.collect()}
    want = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in dedup.semantic_dedup_pairs(emb, centroids, threshold=0.4).collect()
    }
    assert got == want


def test_cells_index_compaction_preserves_pairs_and_prunes(spark, sf_dir, tmp_path):
    """compact_cells_index folds the semantic index's per-batch dirs into
    one batch=base: the next batch dedups against the compacted store
    identically, and an interrupted swap heals on the next write."""
    import glob

    from flink_gmall2024_realtime_spark.operators import dedup, similarity

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ids, cen_micro = similarity.kmeans_centroids_micro(emb, k=8, iters=3)
    centroids = (ids, cen_micro / 1e6)
    index_path = os.path.join(str(tmp_path), "sem_index")
    pairs_path = os.path.join(str(tmp_path), "sem_pairs")
    write = sinks.semantic_dedup_sink(spark, centroids, index_path, pairs_path, threshold=0.4)
    for i in range(3):
        write(emb.filter(F.col("vec_id") % 4 == i), i)
    cells_root = os.path.join(index_path, "cells")
    assert len(glob.glob(os.path.join(cells_root, "batch=*"))) == 3
    sinks.compact_cells_index(spark, index_path)
    assert [os.path.basename(d) for d in glob.glob(os.path.join(cells_root, "batch=*"))] == ["batch=base"]
    write(emb.filter(F.col("vec_id") % 4 == 3), 3)
    got = spark.read.parquet(os.path.join(pairs_path, "data"))
    want = dedup.semantic_dedup_pairs(emb, centroids, threshold=0.4)
    assert {tuple(r) for r in got.select("id_a", "id_b", "sim").collect()} == {
        tuple(r) for r in want.collect()
    }
    indexed = spark.read.parquet(cells_root)
    assert indexed.count() == emb.count()
    os.rename(cells_root, cells_root + ".old")
    sinks._heal_store(cells_root)
    assert os.path.isdir(cells_root) and not os.path.isdir(cells_root + ".old")


def test_compact_lsh_index_merges_groups_across_batches(spark, tmp_path):
    """r7 compaction re-collapse: a flood that arrived over two batches
    holds two rep rows pre-compaction and ONE merged group (global-min
    rep, unioned member list, one band row per band) after — and a
    subsequent colliding batch still emits the exact full-corpus pairs."""
    from flink_gmall2024_realtime_spark.operators import dedup

    flood_text = "spam boilerplate page about cheap watches and replica goods"
    b0 = spark.createDataFrame(
        [(i, flood_text) for i in range(40)]
        + [(900, "unrelated document about alpine hiking routes and gear")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(100 + i, flood_text) for i in range(40)]
        + [(901, "unrelated document about deep sea fishing techniques")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(5000, flood_text), (5001, "fresh unrelated content about pottery")],
        "doc_id long, text string",
    )
    index_path = os.path.join(str(tmp_path), "idx")
    pairs_path = os.path.join(str(tmp_path), "prs")
    write = sinks.lsh_dedup_sink(spark, index_path, pairs_path)
    write(b0, 0)
    write(b1, 1)
    docs_pre = spark.read.schema(sinks.INDEX_SCHEMA).parquet(
        os.path.join(index_path, "docs", "batch=*", "q=*")
    )
    assert docs_pre.count() == 4  # flood rep per batch + 2 uniques
    sinks.compact_lsh_index(spark, index_path)
    docs_post = spark.read.schema(sinks.INDEX_SCHEMA).parquet(
        os.path.join(index_path, "docs", "batch=*", "q=*")
    )
    assert docs_post.count() == 3  # flood merged to ONE group
    flood_row = docs_post.filter(F.size("ids") > 1).collect()
    assert len(flood_row) == 1
    assert flood_row[0]["doc_id"] == 0 and len(flood_row[0]["ids"]) == 80
    bands_post = spark.read.schema(sinks.BANDS_SCHEMA).parquet(
        os.path.join(index_path, "bands", "batch=*", "p=*")
    )
    assert bands_post.count() == 3 * 32
    write(b2, 2)
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in spark.read.parquet(os.path.join(pairs_path, "data")).collect()
    }
    allb = b0.unionByName(b1).unionByName(b2)
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs(allb).collect()
    }
    assert got == want and len(want) > 0


def test_heal_index_swap_rolls_forward(tmp_path):
    """Crash between the two store renames leaves bands on the merged
    generation and docs on the old one — _heal_index_swap must roll BOTH
    forward (stage sentinels win) and remove the intent; without an
    intent, stray stage dirs are ignored (pre-intent crash)."""
    idx = str(tmp_path / "idx")
    for d, sentinel in (
        ("bands", "old"), ("docs", "old"),
        ("bands.stage", "new"), ("docs.stage", "new"),
    ):
        os.makedirs(os.path.join(idx, d))
        with open(os.path.join(idx, d, "gen"), "w") as f:
            f.write(sentinel)
    # simulate: intent written, bands swap completed, docs swap not started
    with open(os.path.join(idx, "_swap_intent"), "w") as f:
        f.write("bands docs")
    os.rename(os.path.join(idx, "bands"), os.path.join(idx, "bands.old"))
    os.rename(os.path.join(idx, "bands.stage"), os.path.join(idx, "bands"))
    sinks._heal_index_swap(idx)
    for d in ("bands", "docs"):
        assert open(os.path.join(idx, d, "gen")).read() == "new", d
        assert not os.path.isdir(os.path.join(idx, d + ".stage"))
        assert not os.path.isdir(os.path.join(idx, d + ".old"))
    assert not os.path.isfile(os.path.join(idx, "_swap_intent"))
    # no intent -> stage dirs are pre-intent leftovers, heal leaves them
    os.makedirs(os.path.join(idx, "docs.stage"))
    sinks._heal_index_swap(idx)
    assert os.path.isdir(os.path.join(idx, "docs.stage"))
    assert open(os.path.join(idx, "docs", "gen")).read() == "new"


def test_streaming_funnel_matches_batch(spark, sf_dir, tmp_path):
    """Three-batch event-time-ordered replay of the events fixture through
    the stateful funnel twin equals the batch funnel's per-stage counts;
    within-batch rows are deliberately unsorted (the func sorts)."""
    import os as _os

    from flink_gmall2024_realtime_spark.operators import analytics
    from flink_gmall2024_realtime_spark.sources.fixtures import load_table
    from flink_gmall2024_realtime_spark.streaming.state import (
        FUNNEL_SCHEMA,
        FUNNEL_STATE,
        funnel_progress_func,
    )

    stages = ["signup", "view", "click", "purchase"]
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(stages) & F.col("user_id").isNotNull()
    )
    want = {
        r["stage_index"]: r["users"]
        for r in analytics.funnel(ev, tuple(stages)).collect()
    }

    # time-partitioned 3-batch replay directory
    src = ev.select(
        F.col("user_id").cast("string").alias("key"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_micros"),
        F.array_position(F.array(*[F.lit(s) for s in stages]), F.col("event_type"))
        .cast("int")
        .alias("pos"),
    ).withColumn("stage_idx", (F.col("pos") - 1).cast("int")).drop("pos")
    lo, hi = src.agg(F.min("ts_micros"), F.max("ts_micros")).first()
    cuts = [lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3]
    replay = str(tmp_path / "funnel_replay")
    _os.makedirs(replay)
    parts = [
        src.where(F.col("ts_micros") <= cuts[0]),
        src.where((F.col("ts_micros") > cuts[0]) & (F.col("ts_micros") <= cuts[1])),
        src.where(F.col("ts_micros") > cuts[1]),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(tmp_path / f"b{i}"))
        f = [x for x in _os.listdir(str(tmp_path / f"b{i}")) if x.endswith(".parquet")][0]
        dst = _os.path.join(replay, f"batch_{i}.parquet")
        _os.rename(_os.path.join(str(tmp_path / f"b{i}"), f), dst)
        _os.utime(dst, (1000 + i, 1000 + i))  # file-source order = mtime

    sch = "key string, ts_micros long, stage_idx int"
    stream = (
        spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(replay)
    )
    out = apply_stateful(
        stream.groupBy("key"), funnel_progress_func, FUNNEL_SCHEMA, FUNNEL_STATE
    )
    run_stream(out, str(tmp_path), "funnel_twin")
    rows = spark.sql(
        "select key, max(stage_reached) as s from funnel_twin group by key"
    ).collect()
    got = {
        i: sum(1 for r in rows if r["s"] >= i) for i in range(1, 5)
    }
    assert got == want


def test_streaming_retention_matches_batch(spark, sf_dir, tmp_path):
    """Three-batch ordered replay through the retention twin: summed
    (cohort, offset) activations equal the batch triangle's n_users."""
    import os as _os

    from flink_gmall2024_realtime_spark.operators import analytics
    from flink_gmall2024_realtime_spark.sources.fixtures import load_table
    from flink_gmall2024_realtime_spark.streaming.state import (
        RETENTION_SCHEMA,
        RETENTION_STATE,
        retention_progress_func,
    )

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    want = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in analytics.retention_cohorts(ev).collect()
    }

    src = ev.select(
        F.col("user_id").cast("string").alias("key"),
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias("week"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tm"),
    )
    lo, hi = src.agg(F.min("tm"), F.max("tm")).first()
    cuts = [lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3]
    replay = str(tmp_path / "ret_replay")
    _os.makedirs(replay)
    parts = [
        src.where(F.col("tm") <= cuts[0]),
        src.where((F.col("tm") > cuts[0]) & (F.col("tm") <= cuts[1])),
        src.where(F.col("tm") > cuts[1]),
    ]
    for i, p in enumerate(parts):
        d = str(tmp_path / f"rb{i}")
        p.select("key", "week").coalesce(1).write.parquet(d)
        f = [x for x in _os.listdir(d) if x.endswith(".parquet")][0]
        dst = _os.path.join(replay, f"batch_{i}.parquet")
        _os.rename(_os.path.join(d, f), dst)
        _os.utime(dst, (1000 + i, 1000 + i))

    stream = (
        spark.readStream.schema("key string, week string")
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    out = apply_stateful(
        stream.groupBy("key"), retention_progress_func, RETENTION_SCHEMA, RETENTION_STATE
    )
    run_stream(out, str(tmp_path), "ret_twin")
    got = {
        (r["cohort_week"], r["week_offset"]): r["n"]
        for r in spark.sql(
            "select cohort_week, week_offset, count(*) n from ret_twin group by 1, 2"
        ).collect()
    }
    assert got == want


def test_retention_mask_stays_inside_signed_long():
    """Offset 63 would set the sign bit of the LongType seen_mask state
    (1 << 63 > int64 max) and crash the batch; the horizon guard must
    stop at 62 (ADVICE r7). Direct call with a fake GroupState."""
    import pandas as pd

    from flink_gmall2024_realtime_spark.streaming.state import (
        retention_progress_func,
    )

    class _FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists = True
            self._v = v

    st = _FakeState()
    weeks = ["2024-01-01"] + [
        (pd.Timestamp("2024-01-01") + pd.Timedelta(weeks=w)).strftime("%Y-%m-%d")
        for w in (62, 63, 64)
    ]
    out = list(
        retention_progress_func(
            ("u1",), iter([pd.DataFrame({"week": weeks})]), st
        )
    )[0]
    assert sorted(out["week_offset"]) == [0, 62]  # 63/64 beyond horizon
    cohort, mask = st.get
    assert cohort == "2024-01-01"
    assert 0 < mask <= (1 << 63) - 1  # fits signed int64


def test_streaming_warc_ingestion_matches_batch(spark, sf_dir, tmp_path):
    """Ingestion gates are streaming-ready: WARC payloads landing as files
    stream through the SAME Arrow record walk (multi-member gunzip, HTTP
    parse, token counts) per micro-batch, and the drained table equals the
    batch run row-for-row — 'ingest the crawl as it lands'."""
    from flink_gmall2024_realtime_spark.operators import multimodal
    from flink_gmall2024_realtime_spark.operators.webarchive import warc_records

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(60)
    payloads = multimodal.synth_media(docs, "doc_id", "warc_gz")
    src = os.path.join(str(tmp_path), "warc_landing")
    # three separate landings -> three micro-batches
    payloads.filter(F.col("media_id") % 3 == 0).write.parquet(os.path.join(src, "f0"))
    payloads.filter(F.col("media_id") % 3 == 1).write.parquet(os.path.join(src, "f1"))
    payloads.filter(F.col("media_id") % 3 == 2).write.parquet(os.path.join(src, "f2"))
    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    run_stream(warc_records(stream), str(tmp_path), "warc_stream")
    got = {
        tuple(r) for r in spark.sql("select * from warc_stream").collect()
    }
    want = {tuple(r) for r in warc_records(payloads).collect()}
    assert got == want and len(want) > 0


def test_streaming_zstd_ingestion_matches_batch(spark, sf_dir, tmp_path):
    """The r10 codec gates are streaming-ready too: .zst shards landing as
    files stream through the SAME Arrow decode (full RFC 8878 path,
    checksum verified) per micro-batch, and the drained table equals the
    batch run row-for-row — 'ingest the drop as it lands'."""
    from flink_gmall2024_realtime_spark.operators import multimodal
    from flink_gmall2024_realtime_spark.operators.zstdcodec import (
        zstd_dump_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(45)
    payloads = multimodal.synth_media(docs, "doc_id", "zstd_dump")
    src = os.path.join(str(tmp_path), "zstd_landing")
    payloads.filter(F.col("media_id") % 3 == 0).write.parquet(os.path.join(src, "f0"))
    payloads.filter(F.col("media_id") % 3 == 1).write.parquet(os.path.join(src, "f1"))
    payloads.filter(F.col("media_id") % 3 == 2).write.parquet(os.path.join(src, "f2"))
    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    run_stream(zstd_dump_stats(stream), str(tmp_path), "zstd_stream")
    got = {tuple(r) for r in spark.sql("select * from zstd_stream").collect()}
    want = {tuple(r) for r in zstd_dump_stats(payloads).collect()}
    assert got == want and len(want) > 0


def test_streaming_xz_and_lz4_ingestion_match_batch(spark, sf_dir, tmp_path):
    """The remaining r10 codec gates stream too: .xz and .lz4 shards
    landing as files decode per micro-batch, drained tables equal the
    batch runs row-for-row."""
    from flink_gmall2024_realtime_spark.operators import multimodal
    from flink_gmall2024_realtime_spark.operators.lz4snappy import (
        lz4_dump_stats,
    )
    from flink_gmall2024_realtime_spark.operators.lzmadec import xz_dump_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(30)
    for kind, op, view in (("xz_dump", xz_dump_stats, "xz_stream"),
                           ("lz4_dump", lz4_dump_stats, "lz4_stream")):
        payloads = multimodal.synth_media(docs, "doc_id", kind)
        src = os.path.join(str(tmp_path), f"{kind}_landing")
        payloads.filter(F.col("media_id") % 2 == 0).write.parquet(os.path.join(src, "f0"))
        payloads.filter(F.col("media_id") % 2 == 1).write.parquet(os.path.join(src, "f1"))
        stream = (
            spark.readStream.schema("media_id long, payload binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        run_stream(op(stream), str(tmp_path), view)
        got = {tuple(r) for r in spark.sql(f"select * from {view}").collect()}
        want = {tuple(r) for r in op(payloads).collect()}
        assert got == want and len(want) > 0, kind


def test_streaming_delta_lake_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """The r12 Delta surface under a REAL Structured Streaming query (not
    direct foreachBatch calls): a file-landing stream drains through
    foreachBatch into DeltaAppendSink (checkpointed, multi-micro-batch),
    the table reads back exactly via delta_scan, a second IDENTICAL run
    over the same Spark checkpoint replays nothing (txn idempotence under
    the engine's own batch ids), and DeltaStreamSource chains the table
    into a downstream DeltaKeyedStore — lake-to-lake, all open format."""
    import os

    from flink_gmall2024_realtime_spark.operators.deltalog import delta_scan
    from flink_gmall2024_realtime_spark.streaming.delta import (
        DeltaAppendSink,
        DeltaKeyedStore,
        DeltaStreamSource,
    )

    # pin ts to its ISO string so the stream schema, the delta
    # schemaString and the comparison all agree (load_table normalizes
    # the on-disk flavor to timestamp_ntz; ISO strings sort
    # chronologically, so max-per-user semantics survive)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("string").alias("ts"),
    ).filter(F.col("event_id") % 37 == 0)
    src = os.path.join(str(tmp_path), "landing")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).write.parquet(
            os.path.join(src, f"f{i}")
        )
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    table = os.path.join(str(tmp_path), "delta_tbl")
    sink = DeltaAppendSink(table, checkpoint_interval=2)

    def run(name):
        q = (
            stream.writeStream.foreachBatch(sink.sink())
            .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
            .trigger(availableNow=True)
            .queryName(name)
            .start()
        )
        q.awaitTermination(300)

    run("delta_e2e_1")
    got = {tuple(r) for r in delta_scan(spark, table).collect()}
    want = {tuple(r) for r in ev.collect()}
    assert got == want and len(want) > 10
    head = sink.snapshot()
    # identical second run over the same Spark checkpoint: availableNow
    # re-reads nothing, and even a fresh sink instance skips known ids
    run("delta_e2e_2")
    assert sink.snapshot() == head
    # chain: incremental source -> keyed store (latest event per user)
    source = DeltaStreamSource(spark, table)
    store = DeltaKeyedStore(
        spark, os.path.join(str(tmp_path), "per_user"), key="user_id",
        order_col="ts",
    )
    n = source.stream_to(store.sink())
    assert n == 1  # snapshot-first batch covers the whole table
    per_user = {r["user_id"]: r["ts"] for r in store.read_latest().collect()}
    want_latest = {
        r["user_id"]: r["max(ts)"]
        for r in ev.groupBy("user_id").agg(F.max("ts")).collect()
    }
    assert per_user == want_latest
