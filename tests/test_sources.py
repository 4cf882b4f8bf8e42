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


DERBY_URL = "jdbc:derby:memory:gmall_cfg;create=true"
DERBY_PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def test_jdbc_config_source_end_to_end(spark):
    """S4 e2e against a LIVE JDBC database (embedded Derby ships with
    Spark): seed the routing-config table over JDBC, read it back through
    jdbc_config_source, and confirm the per-batch re-read sees an update —
    the property the reference needs Flink-CDC + broadcast state for
    (FlinkSourceUtil.java:58-77, JdbcUtil.java:37-68)."""
    from flink_gmall2024_realtime_spark.sources.cdc import jdbc_config_source

    cfg = spark.createDataFrame(
        [
            ("base_dic", "dim_base_dic", "dic_code,dic_name", "info", "dic_code", "c"),
            ("user_info", "dim_user_info", "id,name", "info", "id", "c"),
        ],
        "source_table string, sink_table string, sink_columns string, "
        "sink_family string, sink_row_key string, op string",
    )
    cfg.write.jdbc(DERBY_URL, "table_process_dim", mode="overwrite", properties=DERBY_PROPS)

    got = jdbc_config_source(
        spark, DERBY_URL, "table_process_dim", user="", password="",
        driver=DERBY_PROPS["driver"],
    )
    assert {r["source_table"]: r["sink_table"] for r in got.collect()} == {
        "base_dic": "dim_base_dic",
        "user_info": "dim_user_info",
    }

    # config changes between batches are visible on the next re-read
    cfg2 = cfg.replace("dim_user_info", "dim_user_info_v2", subset=["sink_table"])
    cfg2.write.jdbc(DERBY_URL, "table_process_dim", mode="overwrite", properties=DERBY_PROPS)
    again = jdbc_config_source(
        spark, DERBY_URL, "table_process_dim", user="", password="",
        driver=DERBY_PROPS["driver"],
    )
    assert {r["sink_table"] for r in again.collect()} == {"dim_base_dic", "dim_user_info_v2"}


def test_jdbc_bounded_partitioned_read(spark):
    """S4's bounded-read shape at scale: a partitioned JDBC scan splits the
    key range across tasks (numPartitions parallel queries), and predicate
    pushdown reaches the remote database (filter appears in the JDBC scan,
    not a Spark Filter over a full read)."""
    facts = spark.range(1000).selectExpr("id", "cast(id % 7 as int) AS grp")
    facts.write.jdbc(DERBY_URL, "fact_rows", mode="overwrite", properties=DERBY_PROPS)

    from pyspark.sql import functions as F

    part = spark.read.jdbc(
        DERBY_URL, "fact_rows", column="id", lowerBound=0, upperBound=1000,
        numPartitions=4, properties=DERBY_PROPS,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 1000
    filtered = part.filter(F.col("grp") == 3)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "grp" in plan.split("PushedFilters")[1][:120]
    assert filtered.count() == sum(1 for i in range(1000) if i % 7 == 3)


def test_read_evolving_schema_union_and_backfill(spark, tmp_path):
    """Files written under three schema generations read back under one
    contract: retired columns dropped, added columns null where absent,
    contract casts widening the merged type."""
    from flink_gmall2024_realtime_spark.sources.warehouse import read_evolving

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id int, old_col string").write.parquet(p)
    spark.createDataFrame([(2, "b", 9)], "id int, name string, score int").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame(
        [(3, "c", 7, "x")], "id int, name string, score int, extra string"
    ).write.mode("append").parquet(p)

    out = read_evolving(spark, p, "id long, name string, score double, flag boolean")
    rows = {r["id"]: (r["name"], r["score"], r["flag"]) for r in out.collect()}
    assert rows == {1: (None, None, None), 2: ("b", 9.0, None), 3: ("c", 7.0, None)}
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "string", "double", "boolean",
    ]


def test_scaled_fixtures_grow_joins_by_m_not_m_squared(spark, sf_dir):
    """Scaling regression lock for the M^2 dim-join blow-up the first 100x
    sweep hit: fixed dims (nation/region) must stay FIXED — replicating
    them verbatim matches every fact row M times and a 'linear' fixture
    quietly becomes quadratic. Checks: facts scale by M; fixed dims don't
    scale; fact x dim and fact x fact equi-joins both scale by exactly M."""
    from pyspark.sql import functions as F

    from flink_gmall2024_realtime_spark.sources.scaling import scaled_table

    m = 3
    c1 = scaled_table(spark, sf_dir, "customer", 1)
    cm = scaled_table(spark, sf_dir, "customer", m)
    n1 = scaled_table(spark, sf_dir, "nation", 1)
    nm = scaled_table(spark, sf_dir, "nation", m)
    o1 = scaled_table(spark, sf_dir, "orders", 1)
    om = scaled_table(spark, sf_dir, "orders", m)
    assert cm.count() == m * c1.count()
    assert nm.count() == n1.count()  # fixed dim: no replication
    # fact x fixed-dim join scales by M (the M^2 failure mode)
    j1 = c1.join(n1, c1["c_nationkey"] == n1["n_nationkey"]).count()
    jm = cm.join(nm, cm["c_nationkey"] == nm["n_nationkey"]).count()
    assert jm == m * j1
    # fact x fact join on an offset key also scales by M (offsets consistent)
    f1 = o1.join(c1, o1["o_custkey"] == c1["c_custkey"]).count()
    fm = om.join(cm, om["o_custkey"] == cm["c_custkey"]).count()
    assert fm == m * f1


def test_format_roundtrip_matrix(spark, sf_dir, tmp_path):
    """Spark-native source formats (csv, json, orc) round-trip the orders
    fixture losslessly: write from the parquet frame, read back with an
    explicit schema, compare full contents. CSV/JSON stringify timestamps
    (written/parsed with an explicit pattern carrying microseconds); ORC
    is binary-faithful including TIMESTAMP_NTZ. This is the bounded-source
    connector surface (SURVEY S4 family) beyond the parquet fixtures."""
    from flink_gmall2024_realtime_spark.sources.fixtures import load_table

    orders = load_table(spark, sf_dir, "orders")
    expect = sorted(
        (r["o_orderkey"], r["o_custkey"], r["o_orderstatus"],
         round(r["o_totalprice"], 2), str(r["o_orderdate"]), r["o_orderpriority"])
        for r in orders.collect()
    )
    tspat = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    schema = orders.schema

    def norm(df):
        return sorted(
            (r["o_orderkey"], r["o_custkey"], r["o_orderstatus"],
             round(r["o_totalprice"], 2), str(r["o_orderdate"]), r["o_orderpriority"])
            for r in df.collect()
        )

    csv_dir = str(tmp_path / "orders_csv")
    orders.write.option("header", "true").option("timestampNTZFormat", tspat).csv(csv_dir)
    got_csv = (
        spark.read.schema(schema).option("header", "true")
        .option("timestampNTZFormat", tspat).csv(csv_dir)
    )
    assert norm(got_csv) == expect

    json_dir = str(tmp_path / "orders_json")
    orders.write.option("timestampNTZFormat", tspat).json(json_dir)
    got_json = spark.read.schema(schema).option("timestampNTZFormat", tspat).json(json_dir)
    assert norm(got_json) == expect

    orc_dir = str(tmp_path / "orders_orc")
    orders.write.orc(orc_dir)
    got_orc = spark.read.orc(orc_dir)
    assert got_orc.schema == schema
    assert norm(got_orc) == expect
