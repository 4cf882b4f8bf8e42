"""The Flink-SQL migration path (SURVEY §3.2): the reference's SQL apps run
~1:1 as spark.sql over envelope temp views — a reference user's query text
needs only dialect tweaks (map access is identical; FOR SYSTEM_TIME AS OF
becomes a plain join against the per-batch dict view)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_comment_info_sql_app(spark):
    """DwdInteractionCommentInfo.java:64-102 — CDC filter + map-subscript
    projection + dictionary lookup join, as one spark.sql statement."""
    topic_db = spark.createDataFrame(
        [
            Row(database="gmall", table="comment_info", type="insert",
                data={"id": "101", "user_id": "7", "sku_id": "55", "appraise": "1201",
                      "comment_txt": "nice", "create_time": "2024-01-01 10:00:00"},
                old=None, ts=1704074400),
            Row(database="gmall", table="comment_info", type="update",
                data={"id": "102", "appraise": "1202"}, old={"appraise": "1201"}, ts=1704074401),
            Row(database="gmall", table="order_info", type="insert",
                data={"id": "201"}, old=None, ts=1704074402),
        ]
    )
    topic_db.createOrReplaceTempView("topic_db")
    spark.createDataFrame(
        [Row(dic_code="1201", dic_name="好评"), Row(dic_code="1202", dic_name="中评")]
    ).createOrReplaceTempView("base_dic")
    out = spark.sql(
        """
        SELECT ci.id, ci.user_id, ci.sku_id, ci.appraise, dic.dic_name AS appraise_name,
               ci.comment_txt, ci.ts
        FROM (
          SELECT data['id'] AS id, data['user_id'] AS user_id, data['sku_id'] AS sku_id,
                 data['appraise'] AS appraise, data['comment_txt'] AS comment_txt, ts
          FROM topic_db
          WHERE `table` = 'comment_info' AND `type` = 'insert'
        ) ci
        JOIN base_dic dic ON ci.appraise = dic.dic_code
        """
    ).collect()
    assert len(out) == 1
    assert out[0]["id"] == "101" and out[0]["appraise_name"] == "好评"


def test_keyword_sql_app_with_lateral_view(spark):
    """DwsTrafficSourceKeywordPageViewWindow SQL shape: page filter ->
    LATERAL VIEW explode(kw_split(...)) -> grouped count."""
    from flink_gmall2024_realtime_spark.functions import cjk

    cjk.register_udf(spark)
    spark.createDataFrame(
        [
            Row(page={"last_page_id": "search", "item": "苹果手机", "item_type": "keyword"}, ts=1000),
            Row(page={"last_page_id": "search", "item": "小米 电视", "item_type": "keyword"}, ts=2000),
            Row(page={"last_page_id": "home", "item": None, "item_type": None}, ts=3000),
        ]
    ).createOrReplaceTempView("page_log")
    out = spark.sql(
        """
        SELECT keyword, count(*) AS keyword_count
        FROM page_log
        LATERAL VIEW explode(kw_split(page.item)) t AS keyword
        WHERE page.last_page_id = 'search' AND page.item_type = 'keyword'
        GROUP BY keyword
        """
    ).collect()
    got = {r["keyword"]: r["keyword_count"] for r in out}
    assert got == {"苹果手机": 1, "小米": 1, "电视": 1}


def test_user_login_pipeline_stream(spark, sf_dir, tmp_path):
    """DWS user-login topology end-to-end on a replayed stream."""
    import os

    from flink_gmall2024_realtime_spark.operators import state as batch_state
    from flink_gmall2024_realtime_spark.sources.fixtures import load_table
    from flink_gmall2024_realtime_spark.streaming import pipelines

    ev = pipelines.stream_events(spark, sf_dir)
    agg = pipelines.dws_user_login_pipeline(ev)
    q = (
        agg.writeStream.format("memory").queryName("login_dws").outputMode("complete")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        str(r["cur_date"]): (r["uu_ct"], r["back_ct"])
        for r in spark.sql("select * from login_dws").collect()
    }
    evb = load_table(spark, sf_dir, "events")
    flags = batch_state.returning_user_flags(
        evb.select("user_id", F.to_date("ts").alias("d")), "user_id", "d"
    )
    want = {
        str(r["d"]): (r["uu"], r["back"])
        for r in flags.groupBy("d").agg(F.sum("uu").alias("uu"), F.sum("back").alias("back")).collect()
    }
    assert got == want
