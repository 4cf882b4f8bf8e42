"""Scalar function library (SURVEY.md §2.9, F1-F13).

Re-expresses the reference's helper utilities as Catalyst column expressions —
everything here stays JVM-side (whole-stage codegen), no Python UDFs:

- ``DateFormatUtil.java:26-57`` (ms-epoch <-> formatted strings, +08:00) →
  ``ts_to_date`` / ``ts_to_datetime`` / ``ts_to_partition`` / ``date_to_ts``;
- fastjson field access (``DimApp.java:186-189``) → ``json_map`` / ``json_get``;
- ``IKUtil.java:19-34`` (IK analyzer keyword split) → ``tokenize`` — a
  deterministic regex tokenizer (the fixture corpus is space-separated; a
  CJK-capable trie/jieba drop-in would slot in here behind the same column
  signature);
- deterministic 48/60-bit hashes derived from md5 so Spark results hash-match
  the DuckDB oracle exactly (used by dedup/minhash/simhash operators).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F2-F5, F10-F11: time functions (reference DateFormatUtil.java:26-57).
# Session timezone is pinned to Asia/Shanghai by session.get_spark, so these
# match the reference's hard-coded +08:00 semantics.
# ---------------------------------------------------------------------------


def ts_to_date(ts_ms: Column) -> Column:
    """ms epoch -> 'yyyy-MM-dd' (DateFormatUtil.tsToDate, :37-41)."""
    return F.date_format(F.timestamp_millis(ts_ms.cast("long")), "yyyy-MM-dd")


def ts_to_datetime(ts_ms: Column) -> Column:
    """ms epoch -> 'yyyy-MM-dd HH:mm:ss' (DateFormatUtil.tsToDateTime, :43-47)."""
    return F.date_format(F.timestamp_millis(ts_ms.cast("long")), "yyyy-MM-dd HH:mm:ss")


def ts_to_partition(ts_ms: Column) -> Column:
    """ms epoch -> 'yyyyMMdd' partition key (DateFormatUtil.java:49-53)."""
    return F.date_format(F.timestamp_millis(ts_ms.cast("long")), "yyyyMMdd")


def date_to_ts(s: Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """'yyyy-MM-dd HH:mm:ss' -> ms epoch (DateFormatUtil.dateToTs, :55-57)."""
    return F.unix_timestamp(s, fmt) * F.lit(1000)


# ---------------------------------------------------------------------------
# F1/F8: JSON parsing and map subscripting (fastjson / Flink-SQL map access).
# ---------------------------------------------------------------------------


def json_map(col: Column) -> Column:
    """Parse a JSON object string into map<string,string> — the CDC envelope's
    ``data``/``old`` payload shape (SQLUtil.java:30-31). Malformed JSON
    becomes null (PERMISSIVE), matching the reference's drop-bad-rows ETL."""
    return F.from_json(col, "map<string,string>")


def json_get(col: Column, key: str) -> Column:
    """``get_json_object`` single-field access (fastjson getString)."""
    return F.get_json_object(col, f"$.{key}")


# ---------------------------------------------------------------------------
# F13: tokenizer (reference IKUtil.java:19-34 + KwSplit.java:17-25).
# ---------------------------------------------------------------------------

TOKEN_SPLIT_RE = r"\s+"


def tokenize(col: Column) -> Column:
    """Split text into an array of non-empty tokens, deterministically.

    The reference uses the IK Chinese analyzer (smart mode) as a Flink UDTF;
    exploded via LATERAL TABLE (DwsTrafficSourceKeywordPageViewWindow.java:74-79).
    Spark-first this is a codegen'd ``split`` + ``filter`` — no Python UDF —
    and ``explode`` is the lateral view (SURVEY §2.4 J6)."""
    return F.filter(F.split(F.trim(col), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


# ---------------------------------------------------------------------------
# Deterministic hashing (dedup / minhash / simhash / fingerprinting).
# md5-derived so DuckDB can reproduce it bit-for-bit:
#   Spark:  conv(substr(md5(x), 1, 15), 16, 10) :: bigint   (60-bit)
#   DuckDB: ('0x' || substr(md5(x), 1, 15)) :: BIGINT
# xxhash64 would be faster but has no DuckDB twin; md5 keeps the oracle exact.
# At 100 TB the hash cost is embedded in whole-stage codegen and is a small
# fraction of scan+shuffle cost.
# ---------------------------------------------------------------------------


def md5_long(col: Column, hex_chars: int = 15, skip: int = 0) -> Column:
    """First (or offset) ``hex_chars`` hex digits of md5 as a non-negative
    bigint. 15 hex chars = 60 bits, always < 2^63 so the cast is safe."""
    return F.conv(F.substring(F.md5(col), 1 + skip, hex_chars), 16, 10).cast("long")


def md5_long_sql_duckdb(expr: str, hex_chars: int = 15, skip: int = 0) -> str:
    """The DuckDB expression producing exactly ``md5_long``'s value."""
    return f"(('0x' || substr(md5({expr}), {1 + skip}, {hex_chars}))::BIGINT)"


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
