"""Data-quality profiling: per-column null / distinct / row counts.

The pre-flight audit a pipeline runs before trusting a new drop of data —
the batch analogue of the reference's per-stream validity filters
(BaseApp.java etl chains drop malformed rows; a profile *measures* the
damage instead). Everything is integer counts, so the DuckDB oracle is
hash-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One profile row per column: (column_name, n_rows, null_count,
    distinct_count).

    Single-pass plan: one global aggregate computes count(*) plus
    count(col) and count(DISTINCT col) for every column — Catalyst plans
    the multi-distinct via Expand (each input row fans out once per
    distinct group, partial-aggregated map-side before the one shuffle),
    so the input is scanned exactly once regardless of column count. The
    one-row result is then unpivoted driver-free with explode(array(
    struct...)). At 100 TB the Expand multiplies shuffle input by the
    column count — that is the exact-semantics price; the sketch-based
    alternative (``sketch.hll_add``) answers the same question
    approximately with a plain map-side aggregate and is the scale path
    when +-2% error is acceptable.
    """
    cols = cols if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("null_count"),
            F.col(f"nd_{c}").alias("distinct_count"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
