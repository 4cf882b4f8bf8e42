"""F13 — deterministic CJK tokenizer (IK-analyzer stand-in) tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_gmall2024_realtime_spark.functions import cjk


def test_fmm_longest_match():
    assert cjk.fmm_segment("苹果手机") == ["苹果手机"]  # longest wins over 苹果+手机
    assert cjk.fmm_segment("小米电视机") == ["小米", "电视机"]
    assert cjk.fmm_segment("买口红的人") == ["买", "口红", "的", "人"]  # OOV -> single chars


def test_segment_mixed_text():
    assert cjk.segment_text("iphone 苹果手机 128g") == ["iphone", "苹果手机", "128g"]
    assert cjk.segment_text("蓝牙耳机promo款") == ["蓝牙耳机", "promo", "款"]
    assert cjk.segment_text(None) == []
    assert cjk.segment_text("   ") == []


def test_lateral_view_sql_parity(spark):
    """The reference's LATERAL TABLE(KwSplit(...)) pattern end-to-end in SQL
    (DwsTrafficSourceKeywordPageViewWindow.java:74-79)."""
    cjk.register_udf(spark)
    df = spark.createDataFrame([Row(kw="苹果手机 保护壳"), Row(kw="小米 电视")])
    df.createOrReplaceTempView("kwt")
    out = spark.sql(
        "SELECT keyword, count(*) AS ct FROM kwt "
        "LATERAL VIEW explode(kw_split(kw)) t AS keyword GROUP BY keyword"
    ).collect()
    got = {r["keyword"]: r["ct"] for r in out}
    # 保护壳 is out-of-vocabulary -> single-character tokens
    assert got == {"苹果手机": 1, "保": 1, "护": 1, "壳": 1, "小米": 1, "电视": 1}
