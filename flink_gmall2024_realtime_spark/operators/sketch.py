"""Deterministic mergeable sketches (engine-agnostic, exact-oracle-able).

The reference computes its UVs exactly (SURVEY §2.5 — per-mid ValueState);
at 100 TB the relaxation every warehouse eventually reaches for is a sketch.
Spark's native ``approx_count_distinct`` exists (``q_approx_aggregates``),
but its sketch bytes are engine-private: they can't be checked against
another engine, stored in an open table, or merged by a different system.
This module builds HyperLogLog from SQL-expressible integer arithmetic so
the sketch STATE is portable data:

- register index = low 8 bits of the 60-bit md5 hash; rho = leading-zero
  count + 1 of the remaining 52-bit word via ``length(bin(w))`` (both
  engines print minimal binary digits);
- the per-group register table (group, j, max rho) is the sketch — an
  associative, commutative, idempotent max-aggregate, so partials from any
  partitioning/replay merge to the same table;
- the harmonic sum accumulates in integer units of 2^-53 (every term is a
  power of two), so the estimate is partial-order invariant and bit-equal
  across engines.

``plans/curation.py::q_hll_sketch`` carries the exact DuckDB oracle;
``streaming/sinks.py::hll_register_sink`` maintains the register table
incrementally per micro-batch."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import md5_long

HLL_M = 256  # registers; 8 index bits of the 60-bit hash, 52-bit rho word
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_UNIT = 9007199254740992  # 2^53: fixed-point unit of the harmonic sum


def hll_registers(df: DataFrame, group_col: str, id_col: str) -> DataFrame:
    """Per-group HLL register table: (group, j, r) with r = max rho seen.

    This IS the sketch state. Max-merge algebra means: partition the input
    any way, build registers per partition, union + groupBy-max — identical
    table; replay a batch — identical table. One shuffle on (group, j),
    partially aggregated map-side."""
    h = md5_long(F.col(id_col).cast("string"))
    w = F.shiftright(h, 8)
    rho = F.when(w > 0, F.lit(53) - F.length(F.bin(w))).otherwise(F.lit(53))
    return (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(group_col), (h % HLL_M).alias("j"), rho.alias("r"))
        .groupBy(group_col, "j")
        .agg(F.max("r").alias("r"))
    )


def merge_registers(a: DataFrame, b: DataFrame, group_col: str) -> DataFrame:
    """Union two register tables into one (the distributed-sketch merge)."""
    return (
        a.unionByName(b).groupBy(group_col, "j").agg(F.max("r").alias("r"))
    )


def hll_estimate(reg: DataFrame, group_col: str) -> DataFrame:
    """Distinct-count estimate from a register table: raw HLL plus the
    standard linear-counting small-range rule (raw <= 2.5m and empty
    registers remain -> count by occupancy). ln() is the one transcendental
    in the catalog's determinism budget — tolerable because both engines
    ln() the identical double and the 4-dp rounding leaves ~1e12 margin
    over a last-ulp libm difference."""
    s = reg.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("used_registers"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT))")).alias("_used_units"),
    )
    total_units = F.col("_used_units") + (HLL_M - F.col("used_registers")) * F.lit(_UNIT)
    raw = F.lit(HLL_ALPHA) * float(HLL_M * HLL_M) * float(_UNIT) / total_units.cast("double")
    lin = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / (HLL_M - F.col("used_registers")))
    est = F.when((raw <= 2.5 * HLL_M) & (F.col("used_registers") < HLL_M), lin).otherwise(raw)
    return s.select(
        group_col,
        "used_registers",
        total_units.alias("hll_sum_units"),
        F.round(raw, 4).alias("uv_raw"),
        F.round(est, 4).alias("uv_est"),
    )
