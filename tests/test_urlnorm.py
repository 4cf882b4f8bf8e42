"""URL canonicalization tests: the RFC 3986 §6 normalization subset,
case by case, plus the plan shape (pure Catalyst, no Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_gmall2024_realtime_spark.operators.urlnorm import canonicalize_url

CASES = [
    # scheme/host case, default port, dot segment, fragment, query order
    ("HTTP://Site7.Example:80/a/3/x/../y?b=2&a=1#frag",
     "http://site7.example/a/3/y?a=1&b=2"),
    ("http://site7.example/a/3/./y?a=1&b=2",
     "http://site7.example/a/3/y?a=1&b=2"),
    ("http://site7.example//a//3//y?b=2&a=1",
     "http://site7.example/a/3/y?a=1&b=2"),
    ("https://Host.Example:443/", "https://host.example/"),
    # non-default ports survive
    ("https://host.example:8443/p", "https://host.example:8443/p"),
    ("http://host.example:8080/p", "http://host.example:8080/p"),
    # :443 is NOT default for http (and vice versa)
    ("http://host.example:443/p", "http://host.example:443/p"),
    # empty path -> '/'
    ("http://h.example", "http://h.example/"),
    # trailing slash not preserved (documented dedup choice)
    ("http://h.example/a/b/", "http://h.example/a/b"),
    # '..' underflow clamps at root
    ("http://h.example/../../x", "http://h.example/x"),
    # empty query forms
    ("http://h.example/p?", "http://h.example/p"),
    ("http://h.example/p?z=1&&a=2", "http://h.example/p?a=2&z=1"),
    # path case is PRESERVED (paths are case-sensitive per RFC)
    ("ftp://H.Example/Dir/File", "ftp://h.example/Dir/File"),
    # relative URLs pass through unchanged
    ("relative/path?x=1", "relative/path?x=1"),
    ("", ""),
]


def test_canonicalization_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "u string")
    got = [
        r["c"] for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()
    ]
    for (u, want), g in zip(CASES, got):
        assert g == want, (u, g, want)


def test_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) — a canonical
    form must be a fixpoint."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], "u string")
    once = df.select(canonicalize_url(F.col("u")).alias("c"))
    twice = once.select(
        F.col("c").alias("first"), canonicalize_url(F.col("c")).alias("second")
    )
    for r in twice.collect():
        assert r["first"] == r["second"], r


def test_plan_is_pure_catalyst(spark):
    """No Python UDF / BatchEvalPython anywhere — the normalizer must be
    whole-stage-codegen-friendly column expressions only."""
    df = spark.createDataFrame([("http://A.b:80/c/../d?y=1&x=2",)], "u string")
    plan = (
        df.select(canonicalize_url(F.col("u")).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan, plan
