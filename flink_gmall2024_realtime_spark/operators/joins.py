"""Join operators (SURVEY §2.4 J1-J6).

Spark-first join strategy, designed for the 100 TB case:

- small sides (dims, config tables) are **broadcast** explicitly — no shuffle
  of the big fact side at all;
- stream-stream / fact-fact equi-joins shuffle on the join key once; AQE
  handles skewed keys at runtime;
- the interval join is an equi-join on the key plus a range predicate, so it
  still hash-partitions by key (never a cross product);
- the config-driven router (J5) is an inner broadcast join — the reference's
  broadcast-state race machinery (``DimBroadcastFunction.java:33-47``)
  disappears under micro-batch semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def inner_equi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """J1 — regular inner equi-join (``DwdTradeOrderDetail.java:99-100``:
    order_detail x order_info).  Shuffled hash / sort-merge picked by Catalyst;
    at scale, pre-bucketing both sides on the key removes the shuffle."""
    return left.join(right, on=on, how="inner")


def left_outer_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """J2 — left outer equi-join (``DwdTradeOrderDetail.java:101-102``).

    Flink emits null-padded rows then retracts on match; Spark emits the final
    row once (at watermark, in streaming) — downstream keyed upserts (K3) make
    the results equivalent, and the oracle compares final keyed state."""
    return left.join(right, on=on, how="left")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "interval 15 minutes",
    upper: str = "interval 15 seconds",
) -> DataFrame:
    """J3 — event-time interval join: rows pair when keys match and
    ``right_ts`` in ``[left_ts - lower, left_ts + upper]``.

    Reference: ``DwdTradeOrderPaySucDetail.java:101-125`` (payment within
    [-15 min, +15 s] of order_detail).  The equality conjunct keeps this a
    hash join on ``key``; the range is a post-join filter within each key
    partition, so state/size is bounded by per-key traffic, not the stream."""
    cond = (
        (left[key] == right[key])
        & (right[right_ts] >= F.expr(f"{left_ts} - {lower}"))
        & (right[right_ts] <= F.expr(f"{left_ts} + {upper}"))
    )
    return left.join(right, on=cond, how="inner")


def lookup_join(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "inner",
) -> DataFrame:
    """J4 — lookup join (``FOR SYSTEM_TIME AS OF proc_time``): enrich a fact
    stream with a dimension dictionary.

    Reference: ``DwdInteractionCommentInfo.java:64-80`` (inner, appraise) and
    ``DwdTradeOrderPaySucDetail.java:76-99`` (left, payment_type).  Spark-first
    this is a stream-static **broadcast** join — the static side is re-scanned
    each micro-batch, which IS processing-time semantics, and broadcasting it
    means the 100 TB fact side never shuffles."""
    return stream.join(F.broadcast(dim), on=stream[stream_key] == dim[dim_key], how=how)


def config_router_join(stream: DataFrame, config: DataFrame, on: Sequence[str]) -> DataFrame:
    """J5 — config-driven routing: keep stream records whose routing key has a
    config entry, attaching the config row (sink table, kept columns...).

    Reference: ``DimBroadcastFunction.java:57-99`` (DIM, keyed by ``table``)
    and ``DwdBaseDb.java:100-145`` (DWD, keyed by ``table:type``).  The config
    is one row per routed table — always broadcast."""
    return stream.join(F.broadcast(config), on=list(on), how="inner")


def asof_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    ts_col: str,
    payload: Sequence[str],
) -> DataFrame:
    """As-of (left) join: each fact row picks the dim row with the greatest
    ``ts <= fact.ts`` for its key — the versioned-dimension lookup Spark has
    no built-in operator for (DuckDB/kdb ``ASOF JOIN``; Flink's
    ``FOR SYSTEM_TIME AS OF`` against a versioned table is the streaming
    twin of J4's processing-time lookup).

    Composed, not nested-loop: union-tag both sides, then one window pass
    per key ordered by (ts, dim-first) carrying the payload forward with
    ``last(ignorenulls)``. ONE shuffle on the key and a per-key sort —
    at 100 TB this is the merge-join formulation (no range-join explosion,
    no per-fact probe); all payload columns share the single window sort.
    Dim rows tie-break before fact rows at equal ts, giving ``>=``
    semantics. Facts with no preceding dim row keep null payload (left
    join). A dim payload that is legitimately NULL reads as absent — dedupe
    or sentinel such rows upstream.

    Skew note: the per-key window sorts each key's rows in one task — for
    a pathologically hot key, decompose by ts-range buckets exactly as
    ``skew.two_phase_rank`` does (carry-in = last dim row of each
    preceding bucket, computed on the tiny per-bucket frame)."""
    d = dims.select(key, ts_col, *payload).withColumn("_is_dim", F.lit(1))
    f = facts.withColumn("_is_dim", F.lit(0))
    u = f.unionByName(d, allowMissingColumns=True)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col), F.col("_is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in payload:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_is_dim") == 0).drop("_is_dim")


def lateral_tokens(df: DataFrame, tokens: Column, out: str = "keyword") -> DataFrame:
    """J6 — lateral table-function join: one output row per token.

    Reference: ``LEFT JOIN LATERAL TABLE(KwSplit(keywords))``
    (``DwsTrafficSourceKeywordPageViewWindow.java:74-79``).  ``explode`` is
    Spark's lateral view, fully codegen'd."""
    return df.select("*", F.explode(tokens).alias(out))


def range_bucket_join(
    facts: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join against (possibly overlapping) ranges WITHOUT
    a nested-loop plan — the band-join decomposition Spark's optimizer
    doesn't do on its own.

    A plain ``lo <= p AND p < hi`` join has no equality conjunct, so Spark
    plans BroadcastNestedLoopJoin — O(|facts| x |ranges|) compares and a
    broadcast of whichever side is smaller; with a large ranges side it is
    simply infeasible. Decomposition: quantize the domain into
    ``bucket_width`` buckets, explode each range to the buckets it covers
    (``sequence`` — one row per covered bucket), map each fact to its single
    bucket, equi-join on the bucket id, and re-check the exact predicate.
    Each (fact, range) pair meets in exactly one bucket — the fact's — so no
    dedup pass is needed. Cost: shuffle of facts by bucket + ranges
    replicated ~range_span/bucket_width times; pick ``bucket_width`` near
    the median range span so replication stays O(1) per range.

    ``point_col``, ``lo_col``, ``hi_col`` must be integer-valued (cast
    timestamps to epoch units first). Interval semantics: [lo, hi).

    The exact range predicate is part of the JOIN CONDITION (not a
    post-join filter): Spark still extracts the bucket equality as the hash
    key and evaluates the range as a join residual, and outer semantics
    stay correct — under ``how='left'`` a fact matching no range (wrong
    bucket OR bucket collision that fails the exact check) survives as one
    null-padded row, where a post-join filter would silently drop it."""
    fb = facts.withColumn("_fb", F.floor(F.col(point_col) / bucket_width))
    rb = ranges.withColumn(
        "_rb",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor((F.col(hi_col) - 1) / bucket_width),
            )
        ),
    )
    cond = (
        (fb["_fb"] == rb["_rb"])
        & (fb[point_col] >= rb[lo_col])
        & (fb[point_col] < rb[hi_col])
    )
    return fb.join(rb, cond, how).drop("_fb", "_rb")
