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
from pyspark.sql.functions import call_function

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


CM_D = 4  # count-min hash rows
CM_W = 512  # count-min columns per row


def cm_table(df: DataFrame, key_col: str) -> DataFrame:
    """Count-min sketch table: (i, col, c) — for each of ``CM_D`` salted
    hash rows, the total occurrence count landing in each of ``CM_W``
    columns. Pure integer state with sum-merge algebra: tables built over
    any partitioning of the input merge by (i, col) sum to the single-pass
    table, so the sketch rides partial aggregation and cross-day unions.
    The whole table is d*w rows regardless of input size."""
    salts = F.array(*[F.lit(i) for i in range(CM_D)])
    h = md5_long(
        F.concat_ws(":", F.col("i").cast("string"), F.col(key_col).cast("string"))
    )
    return (
        df.select(F.col(key_col), F.explode(salts).alias("i"))
        .withColumn("col", h % CM_W)
        .groupBy("i", "col")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cm_estimate(table: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Probe the sketch: est(key) = min over rows i of cell(i, h_i(key)).
    Guaranteed >= the true count (cells only ever over-count via
    collisions). ``keys`` is the candidate set — at corpus scale that's a
    bounded list (e.g. per-partition pre-tops), never all keys. Each key
    expands to ``CM_D`` probes that hash-join the (tiny, broadcastable)
    table."""
    salts = F.array(*[F.lit(i) for i in range(CM_D)])
    h = md5_long(
        F.concat_ws(":", F.col("i").cast("string"), F.col(key_col).cast("string"))
    )
    probes = (
        keys.select(key_col, F.explode(salts).alias("i"))
        .withColumn("col", h % CM_W)
    )
    return (
        probes.join(F.broadcast(table), ["i", "col"])
        .groupBy(key_col)
        .agg(F.min("c").alias("cm_est"))
    )


_MICROS = "_m"
_BITLEN = "_k"


def hdr_hist(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group HDR histogram: (group, bid, rep, c) over positive double
    values — quantize to micros, bucket by the leading bit position with 3
    sub-bucket bits (bucket width 1/16 of the value, midpoint
    representative within ~3.1% of any member). Everything after the one
    double multiply is integer (bin-length, shifts, masks), so bucket ids
    and representatives are bit-identical across engines — unlike
    log-gamma DDSketch buckets, whose edge values can flip on a last-ulp
    libm difference. The sketch state — sum-merge algebra like
    ``cm_table``; at most ~8*64 buckets per group whatever the input
    size."""
    m0 = F.floor(F.round(F.col(value_col), 6) * 1000000.0).cast("long")
    staged = df.select(
        F.col(group_col), m0.alias(_MICROS)
    ).withColumn(_BITLEN, F.length(F.bin(F.col(_MICROS))))
    m = F.col(_MICROS)
    # shifts are greatest()-guarded: the m < 16 branch never uses them, but
    # a vectorized engine may evaluate both CASE branches over all rows and
    # a negative shift distance must not be reachable
    sub = F.expr(
        f"shiftright({_MICROS}, CAST(greatest({_BITLEN} - 4, 0) AS INT)) & CAST(7 AS BIGINT)"
    )
    bid = F.when(m < 16, m).otherwise(F.col(_BITLEN) * 8 + sub)
    rep = F.when(m < 16, m).otherwise(
        (17 + 2 * sub)
        * F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(greatest({_BITLEN} - 5, 0) AS INT))")
    )
    return (
        staged.select(group_col, bid.alias("bid"), rep.alias("rep"))
        .groupBy(group_col, "bid", "rep")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def hdr_quantiles(hist: DataFrame, group_col: str, qs: tuple = (0.5, 0.95)) -> DataFrame:
    """Quantile estimates from an HDR histogram: the representative of the
    first bucket whose cumulative count reaches ceil(q * n). Two windows
    over the same (group, bid-order) partitioning — one Exchange. Estimates
    inherit the bucket guarantee: within ~6.25% of the exact quantile."""
    from pyspark.sql import Window

    w_cum = Window.partitionBy(group_col).orderBy("bid")
    w_all = Window.partitionBy(group_col)
    cum = F.sum("c").over(w_cum)
    tot = F.sum("c").over(w_all)
    staged = hist.select(
        group_col, "rep", cum.alias("_cum"), tot.alias("_tot")
    )
    aggs = [
        F.min(
            F.when(F.col("_cum") >= F.ceil(F.lit(q) * F.col("_tot")), F.col("rep"))
        ).alias(f"_p{int(q * 100)}")
        for q in qs
    ]
    out = staged.groupBy(group_col).agg(*aggs)
    for q in qs:
        name = f"p{int(q * 100)}_est"
        out = out.withColumn(
            name, F.round(F.col(f"_p{int(q * 100)}") / 1000000.0, 6)
        ).drop(f"_p{int(q * 100)}")
    return out


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


# ---------------------------------------------------------------------------
# Bloom filter — runtime join pruning (the sketch that cuts shuffles)
# ---------------------------------------------------------------------------
#
# Spark's optimizer can inject a runtime bloom filter on its own
# (spark.sql.optimizer.runtime.bloomFilter.enabled), but only within one
# query plan.  This explicit variant covers what the optimizer cannot:
# reusing one filter across separate jobs / micro-batches, persisting it
# next to a table, or pruning a fact scan feeding a *different* engine.
# The filter state is plain longs (portable, mergeable by bit_or), and the
# membership test compiles to codegen-able xxhash64 + bit arithmetic —
# no UDF, no shuffle, applied before the fact side's Exchange.


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def _canon_key(key, dtype: str):
    """Canonicalize a join key before hashing so build and probe hash the
    same bytes even when the two sides' SQL types differ within a family
    (INT vs BIGINT, FLOAT vs DOUBLE): xxhash64 is type-sensitive, and a
    type-skewed probe would produce silent FALSE NEGATIVES — dropped
    matching rows. Integral types widen to long, fractional to double,
    everything else to its string form. Cross-FAMILY mismatches (int vs
    double, int vs string) cannot be canonicalized this way —
    ``bloom_prefilter_join`` rejects them up front."""
    if dtype in _INTEGRAL:
        return key.cast("long")
    if dtype in ("float", "double"):
        return key.cast("double")
    return key.cast("string")


def _key_family(dtype: str) -> str:
    if dtype in _INTEGRAL:
        return "integral"
    if dtype in ("float", "double"):
        return "fractional"
    return dtype


def bloom_num_bits_for(n_keys: int, bits_per_key: int = 10) -> int:
    """Filter size for an expected key count: ``bits_per_key`` bits/key
    (~0.9% FPR at 10 bits with 5 hashes), rounded up to a multiple of 64,
    floored at 64 Kbit and CAPPED at 2^20 (16k plan-side words): the bit
    words ride the plan as an array literal, and Catalyst's
    analysis/codegen cost grows with literal size — measured at sf0.1,
    2^20 costs ~2s of driver plan time, which a 100 TB scan amortizes but
    a small query should not exceed.  Past the cap (~100k dim keys) FPR
    degrades gracefully toward no-op pruning (correctness never depends on
    it); deployments with larger key sets should pass ``num_bits``
    explicitly and wear the plan cost, or switch this seam to an
    engine-native binary bloom (Spark's internal BloomFilterImpl) that
    packs the same bits into one compact literal."""
    need = max(1 << 16, min(1 << 20, n_keys * bits_per_key))
    return (need + 63) // 64 * 64


def bloom_build(
    keys: DataFrame, key_col: str, num_bits: int = 1 << 16, num_hashes: int = 5
) -> list[int]:
    """Build a bloom filter over ``keys[key_col]`` and return its bit array
    as ``num_bits/64`` longs.

    Fully distributed: each row explodes to ``num_hashes`` bit positions
    (double hashing via ``xxhash64(key, i)``), positions fold to 64-bit
    words with a ``bit_or`` partial aggregate.  The driver collect is
    bounded by ``num_bits/64`` rows (128 KiB at 2^20 bits) **regardless of
    corpus size** — same contract as the k-means k×dim partials.  Keys are
    canonicalized (``_canon_key``) before hashing, so a probe side of a
    different-but-compatible SQL type sees the same bits.  The default 64
    Kbit saturates near ~6.5k distinct keys (FPR climbs toward 1 beyond
    that — pruning silently stops, correctness unaffected); size real
    deployments with ``bloom_num_bits_for``.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    k = _canon_key(F.col(key_col), keys.schema[key_col].dataType.simpleString())
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(k, F.lit(i)), F.lit(num_bits))
                    for i in range(num_hashes)
                ]
            )
        ).alias("pos")
    )
    rows = (
        pos.groupBy(F.expr("CAST(pos DIV 64 AS INT)").alias("w"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
            ).alias("bits")
        )
        .collect()  # bounded: <= num_bits/64 rows at ANY |keys|
    )
    words = [0] * (num_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_might_contain(key, words: list[int], num_hashes: int = 5, dtype: str = "bigint"):
    """Membership predicate Column: true if ``key`` may be in the set the
    filter was built from (no false negatives).  ``dtype`` is the key
    column's SQL type, used to apply the same canonicalization as
    ``bloom_build`` (type-skewed hashing would silently drop matches).
    The word array enters the plan as a foldable array literal, so Catalyst
    constant-folds it once; per row the test is ``num_hashes`` xxhash64 +
    shift/AND ops, all inside whole-stage codegen."""
    num_bits = len(words) * 64
    key = _canon_key(key, dtype)
    # The word array enters the plan via ONE parsed SQL literal — building
    # it as per-element F.lit columns costs ~0.6 ms of py4j round-trip per
    # word (4 s at 4700 words; caught by tools/scale_bench.py at 10x),
    # while the parser ingests the same array from text in ~10 ms and
    # ConstantFolding collapses it to a single Literal before execution.
    lit_words = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    cond = None
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        word = F.element_at(lit_words, F.floor(pos / 64).cast("int") + 1)
        bit = call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        test = word.bitwiseAND(bit) != 0
        cond = test if cond is None else cond & test
    return cond


def bloom_build_native(keys: DataFrame, key_col: str, num_bits: int | None = None) -> bytes:
    """Build an ENGINE-NATIVE bloom filter (Spark's ``BloomFilterImpl``,
    the same sketch the optimizer's runtime bloom join uses) over
    ``xxhash64(canonicalized key)`` and return its serialized bytes.

    This closes the word-array path's ~2^20-bit ceiling (VERDICT r4 #2):
    the array-literal form pays Catalyst analysis cost PER ELEMENT, so it
    caps at 16k words and silently stops pruning past ~100k dim keys; the
    native filter rides the plan as ONE binary literal (num_bits/8 bytes,
    O(1) analysis), so a 1M-key dim at ~10 bits/key is a 1.25 MB blob —
    plan-cheap, and the probe stays whole-stage-codegen
    (``BloomFilterMightContain`` -> ``bloomFilter.mightContainLong``).

    Keys are canonicalized (``_canon_key``) then xxhash64-hashed to LONG
    before insertion — the exact scheme Spark's own
    ``InjectRuntimeFilter`` uses, and the reason build and probe can never
    disagree on bytes.  Sizing: ``num_bits`` defaults to ~10 bits per
    estimated key (parquet-footer row count — no extra job; the build scan
    itself is one ``treeAggregate`` over the dim).  Uses JVM internals
    reachable from the classic (non-Connect) session; callers fall back to
    ``bloom_build``'s portable word array when unavailable
    (``bloom_prefilter_join`` does this automatically)."""
    from .similarity import estimated_row_count

    dtype = keys.schema[key_col].dataType.simpleString()
    hashed = keys.select(
        F.xxhash64(_canon_key(F.col(key_col), dtype)).alias("_h")
    )
    if num_bits is None:
        num_bits = max(1 << 16, estimated_row_count(keys) * 10)
    jbf = hashed._jdf.stat().bloomFilter("_h", max(1, num_bits // 10), int(num_bits))
    jvm = keys.sparkSession._jvm
    baos = jvm.java.io.ByteArrayOutputStream()
    jbf.writeTo(baos)
    return bytes(baos.toByteArray())


def bloom_might_contain_native(key, blob: bytes, dtype: str = "bigint"):
    """Membership predicate Column over a ``bloom_build_native`` blob: the
    filter enters the plan as ONE binary literal and the test compiles to
    ``BloomFilterMightContain(filter, xxhash64(canon(key)))`` — the same
    codegen'd expression Spark's runtime bloom join emits.  Raises
    ``RuntimeError`` if the classic-session JVM internals are unreachable
    (Spark Connect); callers should fall back to the portable
    ``bloom_might_contain`` word-array form."""
    from pyspark.sql.column import Column

    hashed = F.xxhash64(_canon_key(key, dtype))
    try:
        from pyspark.sql import SparkSession

        jvm = SparkSession.getActiveSession()._jvm
        eu = jvm.org.apache.spark.sql.classic.ExpressionUtils
        mc = jvm.org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            eu.expression(F.lit(bytearray(blob))._jc),
            eu.expression(hashed._jc),
        )
        return Column(eu.column(mc))
    except Exception as e:  # pragma: no cover - Connect / internals drift
        raise RuntimeError(
            "engine-native bloom probe unavailable (classic-session JVM "
            "internals required); use bloom_might_contain instead"
        ) from e


def native_bloom_probe_available(spark) -> bool:
    """Cheap reachability check for the JVM internals the engine-native
    bloom probe needs (``org.apache.spark.sql.classic.ExpressionUtils`` +
    ``BloomFilterMightContain`` — classic sessions, Spark 4.x). Decides the
    build/fallback path BEFORE any dim scan, so a Connect / older-Spark
    caller does not pay ``bloom_build_native``'s full ``treeAggregate``
    pass only to discover the probe cannot be constructed. Result cached
    per SESSION (keyed on ``id(spark)`` — ADVICE r6: a process holding
    both a Connect and a classic session must not reuse one session's
    answer for the other)."""
    cache = getattr(native_bloom_probe_available, "_cache", None)
    if cache is None:
        cache = native_bloom_probe_available._cache = {}
    skey = id(spark)
    if skey in cache:
        return cache[skey]
    ok = False
    try:
        jvm = spark._jvm  # Connect sessions have no _jvm at all
        eu = jvm.org.apache.spark.sql.classic.ExpressionUtils
        # probe-construct with literals only: no data scan, just classloading
        mc = jvm.org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            eu.expression(F.lit(None).cast("binary")._jc),
            eu.expression(F.lit(0).cast("long")._jc),
        )
        ok = mc is not None
    except Exception:  # pragma: no cover - Connect / internals drift
        ok = False
    cache[skey] = ok
    return ok


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    num_bits: int | None = None,
    num_hashes: int = 5,
) -> DataFrame:
    """Join with the fact side pre-pruned by a bloom filter on the dim keys.

    The 100 TB case: ``dim`` is a *filtered* table too big (or too late —
    another job's output) for the optimizer's own runtime filter, yet its
    key set fits a few KiB of bloom bits.  Fact rows failing the membership
    test never reach the join's Exchange; false positives are eliminated by
    the exact join, so the result is bit-identical to the plain join —
    which is exactly what the DuckDB oracle checks.

    Both key columns are canonicalized before hashing and must belong to
    the same type FAMILY (both integral, both fractional, or identical
    otherwise) — a cross-family pair (int vs string) hashes differently on
    the two sides and would produce silent false negatives, so it is
    rejected up front.  ``num_bits=None`` sizes the filter from the dim's
    parquet-footer row estimate at ~10 bits/key — no count job.

    The filter itself is ENGINE-NATIVE by default (``bloom_build_native``:
    one compact binary literal, no key-count ceiling — a 1M-key dim
    prunes at full fidelity); if the classic-session JVM internals are
    unreachable it falls back to the portable word-array form, whose
    array literal caps at 2^20 bits (~100k keys) with graceful
    degradation toward no-op pruning.  Either way false positives are
    eliminated by the exact join, so the result is bit-identical to the
    plain join — which is exactly what the DuckDB oracle checks.

    Only ``inner`` and ``left_semi`` are legal: pruning the probe side of
    an outer/anti join would drop rows the join must keep.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom pre-filtering is join-transparent only for inner/left_semi, got {how!r}")
    fact_dtype = fact.schema[fact_key].dataType.simpleString()
    dim_dtype = dim.schema[dim_key].dataType.simpleString()
    if _key_family(fact_dtype) != _key_family(dim_dtype):
        raise ValueError(
            f"bloom join keys must share a type family, got {fact_dtype!r} vs {dim_dtype!r}"
            " (canonicalization cannot reconcile cross-family hashes)"
        )
    # decide build vs fallback BEFORE scanning the dim: the probe-side
    # reachability check is classloading-only, so an environment without
    # the classic-session internals pays exactly one dim pass (the
    # portable build), never a wasted native build first. Contract
    # (ADVICE r6): reachability picks the CHEAP path; a residual native
    # BUILD failure (transient JVM/treeAggregate error on a session whose
    # probe internals load fine) still falls back to the portable build —
    # costing one extra dim pass in that rare case, never a job failure
    # for an optimization that is result-transparent anyway.
    pred = None
    if native_bloom_probe_available(fact.sparkSession):
        try:
            blob = bloom_build_native(dim.select(dim_key), dim_key, num_bits=num_bits)
            pred = bloom_might_contain_native(F.col(fact_key), blob, dtype=fact_dtype)
        except Exception:  # pragma: no cover - transient JVM build failure
            pred = None
    if pred is None:
        from .similarity import estimated_row_count

        if num_bits is None:
            num_bits = bloom_num_bits_for(estimated_row_count(dim))
        words = bloom_build(dim, dim_key, num_bits=num_bits, num_hashes=num_hashes)
        pred = bloom_might_contain(F.col(fact_key), words, num_hashes=num_hashes, dtype=fact_dtype)
    pruned = fact.filter(pred)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
