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
