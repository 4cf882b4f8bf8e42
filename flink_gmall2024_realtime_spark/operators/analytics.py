"""Product-analytics operators: funnel, retention cohorts, gap-fill,
equi-depth bucketing, fixed-width histograms.

These are the classic event-analytics shapes the reference's DWS layer
feeds (per-window keyed aggregates, DwsTrafficVcChArIsNewPageViewWindow.java
family) re-expressed as reusable batch operators. Every function is
deterministic (integer counts, min/max — no order-dependent float sums),
so each catalog entry carries a hash-exact DuckDB oracle.

Scale notes live on each function; the common theme is: aggregate to the
smallest keyed frame FIRST (per-user thresholds, per-day counts, bucket
counts), and run any window only over that bounded frame — never over raw
events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import skew


def funnel(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered conversion funnel: a user reaches stage *i* iff an
    event of ``stages[i]`` occurs at-or-after the earliest time they
    reached stage *i-1* (ties allowed — ``>=`` — matching the usual
    product-analytics convention). Returns one row per stage:
    ``(stage_index, stage, users)``.

    Reference parity: the DWS user-journey windows
    (DwsUserUserLoginWindow.java:60-103, DwsTradeOrderWindow.java) each
    materialize ONE funnel step as keyed state; this operator composes the
    whole chain.

    100 TB shape: the chain is k keyed passes (k = number of stages, small
    and fixed), each over the PER-USER THRESHOLD frame from the previous
    stage — a (user, min_ts) pair per surviving user, never raw events.
    Each pass is an equi-join on the user key followed by a min-aggregate
    with map-side partials; a hot user costs one join fan-out of their own
    stage-i events, not a sort. No windows, no collect, no cross joins.
    All outputs are integer counts — hash-exact against the SQL oracle.
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least two stages")
    ev = events.select(user_col, ts_col, type_col).where(
        F.col(type_col).isin(list(stages))
        & F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
    )
    counts: list[DataFrame] = []
    cur: DataFrame | None = None
    for i, stage in enumerate(stages):
        stage_ev = ev.where(F.col(type_col) == stage).select(user_col, ts_col)
        if cur is None:
            cur = stage_ev.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        else:
            cur = (
                stage_ev.join(cur, user_col)
                .where(F.col(ts_col) >= F.col("_t"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("_t"))
            )
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(i + 1).alias("stage_index"),
                F.lit(stage).alias("stage"),
                F.col("users").cast("long").alias("users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: cohort = ISO week (Monday-truncated) of a
    user's FIRST event; for each (cohort_week, week_offset) count the
    distinct users active that week and their share of the cohort.
    ``week_offset`` 0 row defines ``cohort_size`` (every cohort member is
    active in their first week by construction).

    100 TB shape: raw events collapse immediately to distinct
    (user, week) — one keyed shuffle with map-side partials; the
    first-week frame is one more min-aggregate over that; the join back is
    keyed on user and the final count groups a frame bounded by
    users x weeks. The only float is the retention ratio — one division of
    two exact integers, rounded, identical in both engines.
    """
    uw = (
        events.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("_u"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("_w"),
        )
        .distinct()
    )
    first = uw.groupBy("_u").agg(F.min("_w").alias("cohort_week"))
    act = (
        uw.join(first, "_u")
        .select(
            "_u",
            "cohort_week",
            (F.datediff(F.col("_w"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    base = act.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("cohort_size")
    )
    return act.join(base, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        "cohort_size",
        F.round(F.col("n_users") / F.col("cohort_size"), 6).alias("retained_ratio"),
    )


def gap_fill_daily(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Calendar gap-fill with forward fill: aggregate per (key, day), then
    densify each key's [min_day, max_day] span — missing days appear with
    ``n_events = 0``, ``is_gap = 1``, and ``carried_max_value`` forward-
    filled from the last observed day (NULL before the first observation,
    which cannot happen here since day 1 is observed by construction).

    This is the time-series regularization step every downstream
    window/forecast consumer needs (the reference's per-window rows are
    dense by construction because Flink emits every fired window;
    DwsTrafficVcChArIsNewPageViewWindow.java:100-123).

    100 TB shape: raw events collapse to per-(key, day) aggregates first
    (one keyed shuffle, map-side combine). The calendar explode and the
    forward-fill window then run over the BOUNDED per-key day frame — a
    key's row count is its calendar span in days, independent of event
    volume, so a hot key costs nothing extra. `max` (not sum) keeps the
    float column order-independent and thus hash-exact.
    """
    daily = events.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).groupBy(
        F.col(key_col).alias("k"), F.to_date(F.col(ts_col)).alias("d")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.round(F.max(value_col), 2).alias("_mx"),
    )
    span = daily.groupBy("k").agg(
        F.min("d").alias("_lo"), F.max("d").alias("_hi")
    )
    calendar = span.select(
        "k",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("interval 1 day"))
        ).alias("d"),
    )
    dense = calendar.join(daily, ["k", "d"], "left")
    fill = (
        Window.partitionBy("k")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return dense.select(
        F.col("k").alias(key_col),
        F.col("d").alias("day"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        F.when(F.col("_n").isNull(), F.lit(1)).otherwise(F.lit(0)).cast("int").alias("is_gap"),
        F.last("_mx", ignorenulls=True).over(fill).alias("carried_max_value"),
    )


def equidepth_buckets(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    k: int,
    bucket_width: float,
) -> DataFrame:
    """Equi-depth (quantile) bucketing: rank every row by
    ``(value_col, tiebreak_col)`` and assign
    ``bucket = floor((rank - 1) * k / n) + 1`` — k buckets whose sizes
    differ by at most one. Returns per-bucket ``(bucket, n_rows, lo, hi)``.

    The rank itself is the scale problem: ``row_number()`` with no
    PARTITION BY is a single task. We reuse `skew.two_phase_rank` with a
    constant key — local row_numbers within value-range buckets plus a
    running-offset pass over the tiny bucket-count frame — so no task ever
    sorts more than one value-bucket's rows. ``bucket_width`` is the
    value-range slice per local sort (pick range / desired parallelism).

    The floor formula (rather than SQL ``ntile``, whose remainder goes to
    the FIRST buckets) keeps the assignment a pure function of (rank, n, k)
    that both engines compute identically in integer arithmetic; the
    oracle states the same formula over ``row_number()``.
    """
    ranked = skew.two_phase_rank(
        df.withColumn("_g", F.lit(1)),
        "_g",
        value_col,
        tiebreak_col,
        bucket_width,
        rank_col="_rank",
    )
    n = ranked.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    assigned = ranked.crossJoin(F.broadcast(n)).withColumn(
        # integer `div`, not float division + floor: exact at any n
        "bucket",
        (F.expr(f"((_rank - 1) * {int(k)}) div _n") + 1).cast("int"),
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.min(value_col), 2).alias("lo"),
        F.round(F.max(value_col), 2).alias("hi"),
    )


def value_histogram(df: DataFrame, value_col: str, width: float) -> DataFrame:
    """Fixed-width histogram: ``bin = floor(value / width)``, per-bin row
    count and rounded min/max. One keyed shuffle with map-side partials —
    the canonical distribution profile over any numeric column; bin count
    is bounded by the value range, not the data volume. floor of an IEEE
    division is bit-identical across engines, so the oracle is exact."""
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.floor(F.col(value_col) / width).cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.min(value_col), 2).alias("lo"),
            F.round(F.max(value_col), 2).alias("hi"),
        )
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    mode: str = "auto",
    bucket_seconds: int = 3600,
    single_phase_max_rows: int = 500_000,
) -> DataFrame:
    """Per-key time-weighted average: each observation holds its value
    until the next one (zero-order hold), so the mean weights every value
    by microseconds held — the correct summary for irregularly-sampled
    series (a plain AVG over-weights bursts). Keys with one event (no held
    interval) return NULL.

    Exactness: values round to DECIMAL(18,2), durations are integer
    microseconds, and the weighted mass sums as DECIMAL(38,2) — decimal
    addition is associative/commutative, so partial aggregation order
    cannot change the result and the SQL oracle hash-matches. Only the
    final single division happens in doubles (both engines IEEE-divide the
    same two exact values).

    Two physical plans, same result (property-tested on random inputs):

    - ``mode="single"``: one ``lead()`` window per key — one Exchange +
      Sort, cheapest at small scale, but a hot key's history sorts in ONE
      task.
    - ``mode="two_phase"``: the skew-safe lead (state.sessionize's recipe,
      simpler here because no gap logic is involved): bucket rows by
      ``(key, floor(ts / bucket_seconds))`` and take the local lead; the
      successor of each bucket's LAST row is exactly the first event of
      the key's next non-empty bucket, read from a per-(key, bucket)
      min-aggregate — an ``O(buckets)``-per-key frame whose own lead
      window is the only per-key pass. Empty buckets need no guard: the
      bucket frame holds only non-empty buckets, so ``lead`` skips them
      by construction. Max task = one key's rows per ``bucket_seconds``,
      time-bounded instead of lifetime-bounded.
    - ``mode="auto"`` (default): single-phase iff the shared
      ``skew.choose_window_mode`` says even the worst key (= all rows)
      fits ``single_phase_max_rows`` — the same principled bound
      sessionize uses (over-estimates on filtered inputs and refuses the
      under-counting ``sizeInBytes`` rung, erring skew-safe — VERDICT r8
      #2)."""
    if mode not in ("auto", "single", "two_phase"):
        raise ValueError(f"unknown mode {mode!r}")
    base = events.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        F.round(F.col(value_col), 2).cast("decimal(18,2)").alias("v"),
    )
    if mode == "auto":
        # shared decision (skew.choose_window_mode): refuses the crude
        # sizeInBytes estimator rung, which can UNDER-count rows on
        # csv/json sources and pick the skew-unsafe single-phase plan
        from .skew import choose_window_mode

        mode = choose_window_mode(events, single_phase_max_rows)
    if mode == "single":
        with_next = base.withColumn(
            "_next", F.lead("t").over(Window.partitionBy("k").orderBy("t", "v"))
        )
    else:
        bucketed = base.withColumn(
            "_bkt",
            F.floor(
                F.unix_micros(F.col("t").cast("timestamp"))
                / (int(bucket_seconds) * 1_000_000)
            ),
        )
        local = Window.partitionBy("k", "_bkt").orderBy("t", "v")
        loc = bucketed.withColumn("_next_loc", F.lead("t").over(local))
        firsts = bucketed.groupBy("k", "_bkt").agg(F.min("t").alias("_first_t"))
        nxt_bucket = Window.partitionBy("k").orderBy("_bkt")
        nexts = firsts.withColumn(
            "_next_first", F.lead("_first_t").over(nxt_bucket)
        ).select("k", "_bkt", "_next_first")
        with_next = (
            loc.join(nexts, ["k", "_bkt"])
            .withColumn("_next", F.coalesce(F.col("_next_loc"), F.col("_next_first")))
            .drop("_bkt", "_next_loc", "_next_first")
        )
    held = (
        with_next.where(F.col("_next").isNotNull())
        .withColumn(
            # ts is TIMESTAMP_NTZ; the ntz->ltz cast shifts both endpoints
            # by the same session offset, so the difference is exact micros
            "_dur",
            (
                F.unix_micros(F.col("_next").cast("timestamp"))
                - F.unix_micros(F.col("t").cast("timestamp"))
            ).cast("decimal(20,0)"),
        )
    )
    agg = held.groupBy("k").agg(
        F.sum(F.col("v") * F.col("_dur")).alias("_mass"),
        F.sum("_dur").alias("_span"),
    )
    return agg.select(
        F.col("k").alias(key_col),
        F.round(
            F.col("_mass").cast("double") / F.col("_span").cast("double"), 6
        ).alias("twavg"),
        F.col("_span").cast("long").alias("held_micros"),
    )
