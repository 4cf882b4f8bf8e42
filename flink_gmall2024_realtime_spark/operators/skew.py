"""Skew-mitigation operators for hot keys at scale.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
these are the explicit tools for the cases AQE can't see:

- ``salted_aggregate`` — two-phase aggregation for aggregations onto a few
  enormous keys (the classic hot-grouping-key fix): phase 1 aggregates on
  (key, salt) spreading each hot key over N reducers, phase 2 merges the N
  partials. Correct for any algebraic aggregate (sum/count/min/max).
- ``salted_join_hint`` — replicate the small side N ways and salt the big
  side so one hot join key fans across N tasks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    phase1: Sequence[Column],
    phase2: Sequence[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``phase1`` aggregates run per (keys..., salt); ``phase2`` merge the
    partials per keys. E.g. count: phase1 ``count(1) as c``, phase2
    ``sum(c) as c``. The salt is a deterministic hash of a uniformly
    distributed column-free random substitute: ``monotonically_increasing_id``
    modulo buckets (row-local, no shuffle to compute)."""
    salted = df.withColumn("_salt", (F.monotonically_increasing_id() % salt_buckets).cast("int"))
    p1 = salted.groupBy(*keys, "_salt").agg(*phase1)
    return p1.groupBy(*keys).agg(*phase2)


def two_phase_rank(
    df: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str,
    bucket_width: float,
    rank_col: str = "rank",
) -> DataFrame:
    """Skew-proof per-key ranking: ``row_number() OVER (PARTITION BY key
    ORDER BY order_col, tiebreak)`` without sorting any key's rows in ONE
    task.

    A plain ranking window sends every row of a hot key to a single task —
    the one skew shape neither partial aggregation nor AQE can split
    (ordering semantics pin rows together). Two-phase decomposition:

    1. bucket rows by value range (``floor(order_col / bucket_width)`` —
       equal values land in the same bucket, so bucket order IS value
       order);
    2. local ``row_number`` within (key, bucket) — the hot key's sort
       spreads over its buckets;
    3. per-(key, bucket) counts (a tiny keys x buckets frame) get a
       running-total window — the ONLY global pass, over counts, not rows;
    4. final rank = local rank + preceding-buckets offset.

    ``tiebreak`` must make (order_col, tiebreak) unique per key for a
    deterministic total order. Pick ``bucket_width`` so a hot key spans
    many buckets (e.g. value-range / desired parallelism)."""
    from pyspark.sql import Window

    b = df.withColumn("_b", F.floor(F.col(order_col) / bucket_width))
    local = Window.partitionBy(key, "_b").orderBy(order_col, tiebreak)
    ranked = b.withColumn("_rn", F.row_number().over(local))
    counts = b.groupBy(key, "_b").agg(F.count(F.lit(1)).alias("_cnt"))
    run = (
        Window.partitionBy(key)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_cnt").over(run), F.lit(0)))
    return (
        ranked.join(offsets.select(key, "_b", "_off"), [key, "_b"])
        .withColumn(rank_col, (F.col("_rn") + F.col("_off")).cast("long"))
        .drop("_b", "_rn", "_off")
    )


def salted_join_hint(
    big: DataFrame, small: DataFrame, key: str, salt_buckets: int = 8
) -> DataFrame:
    """Skewed equi-join: salt the big side, explode the small side across all
    salt values, join on (key, salt). Each hot key's rows spread over
    ``salt_buckets`` tasks instead of one."""
    big_s = big.withColumn("_salt", (F.monotonically_increasing_id() % salt_buckets).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_s.join(small_s, on=[key, "_salt"]).drop("_salt")


def two_phase_cumsum(
    df: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str,
    weight_col: str,
    bucket_width: float,
    cum_col: str = "cum_w",
    total_col: str = "total_w",
) -> DataFrame:
    """Skew-proof per-key running total: inclusive
    ``SUM(weight) OVER (PARTITION BY key ORDER BY order_col, tiebreak)``
    plus the key's grand total, without sorting any key's rows in one
    task — the weighted generalization of `two_phase_rank` (same bucket
    decomposition; rank is the weight==1 special case):

    1. bucket rows by value range;
    2. local inclusive cumsum within (key, bucket);
    3. per-(key, bucket) weight totals get the ONLY per-key window — a
       running total over the tiny keys x buckets frame — giving each
       bucket its preceding-weight offset and the key total;
    4. final ``cum = local_cum + offset``.

    Exactness: weights must sum exactly regardless of order (integers,
    integral doubles < 2^53, or decimals) — the caller's contract, same
    as every oracle-checked aggregate here. (order_col, tiebreak) must be
    unique per key for a deterministic inclusive prefix."""
    from pyspark.sql import Window

    b = df.withColumn("_b", F.floor(F.col(order_col) / bucket_width))
    local = (
        Window.partitionBy(key, "_b")
        .orderBy(order_col, tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_local = b.withColumn("_cl", F.sum(weight_col).over(local))
    totals = b.groupBy(key, "_b").agg(F.sum(weight_col).alias("_bw"))
    run = (
        Window.partitionBy(key)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grand = Window.partitionBy(key)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_bw").over(run), F.lit(0))
    ).withColumn(total_col, F.sum("_bw").over(grand))
    return (
        cum_local.join(offsets.select(key, "_b", "_off", total_col), [key, "_b"])
        .withColumn(cum_col, F.col("_cl") + F.col("_off"))
        .drop("_b", "_cl", "_off", "_bw")
    )
