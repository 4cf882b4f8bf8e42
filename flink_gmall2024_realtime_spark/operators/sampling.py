"""Deterministic sampling operators for training-data pipelines.

Large-scale dataset curation constantly downsamples by stratum (source,
language, quality tier) and carves reproducible train/val/test splits. Both
must be **deterministic functions of the row key** — never ``rand()`` — so
that (a) re-runs and backfills select identical rows, (b) the choice is
reproducible on any engine (exact DuckDB oracles), and (c) membership can be
recomputed later without storing a membership table.

Both operators are pure map-side Catalyst expressions over an md5-derived
hash (``functions.md5_long``): no shuffle, no RNG state, embarrassingly
parallel at 100 TB. The per-stratum rate table rides in as a broadcast
config join (the same J5 shape as the reference's table_process config).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import md5_long


def _key_mod(id_col: Column, denom: int) -> Column:
    """Uniform-ish deterministic value in [0, denom) from the row key."""
    return md5_long(id_col.cast("string")) % denom


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    stratum_col: str,
    id_col: str,
    denom: int = 100,
) -> DataFrame:
    """Keep each row iff ``md5(id) % denom < rate(stratum)``.

    ``rates`` is a config table (stratum, rate) — data, not code, exactly
    like the reference's config-driven routing — broadcast so the fact side
    never shuffles. Unconfigured strata drop (inner join), mirroring the
    config-router's semantics."""
    joined = df.join(F.broadcast(rates), on=df[stratum_col] == rates["stratum"])
    return joined.filter(_key_mod(df[id_col], denom) < F.col("rate"))


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, int]] | None = None,
    denom: int = 1000,
) -> DataFrame:
    """Assign each row a reproducible split label by hash range:
    ``splits`` = [(label, upper_bound_exclusive), ...] over [0, denom).

    Default 80/10/10 train/val/test. The assignment is a pure projection —
    any engine (or a later job years on) recomputes the same membership."""
    splits = splits or [("train", 800), ("val", 900), ("test", 1000)]
    h = _key_mod(F.col(id_col), denom)
    # nested whens lowest-bound-first so the first matching range wins
    out = F.lit(splits[-1][0])
    for label, upper in reversed(splits[:-1]):
        out = F.when(h < upper, F.lit(label)).otherwise(out)
    return df.withColumn("split", out)


def importance_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    frac: float,
) -> DataFrame:
    """Deterministic importance-weighted Bernoulli sampling: keep each row
    with probability ``p_i = min(1, frac * w_i / mean(w))`` — expected kept
    fraction ``frac`` (exactly, when no p_i clamps), with selection pressure
    proportional to the weight (quality score, length, dedup-cluster size).

    This is the "sample 30% of the corpus, preferring high-quality docs"
    primitive of training-mix construction. Like every sampler here the coin
    is a hash, not an RNG: u_i = md5(id)/2^60, keep iff u_i < p_i — so
    membership is reproducible on any engine and recomputable years later.
    Determinism of the comparison: mean(w) divides a DECIMAL-exact sum by an
    exact count, p_i is a fixed-shape double expression, and u_i's division
    by 2^60 (a power of two) is float-exact — no partial-order hazard
    anywhere.  The mean is a one-row aggregate broadcast back over the rows
    (never an ``over ()`` window).  Adds ``keep_p`` (rounded 6 dp).
    """
    w_dec = F.round(F.col(weight_col).cast("double"), 6).cast("decimal(28,6)")
    stats = df.agg((F.sum(w_dec).cast("double") / F.count(F.lit(1))).alias("_mean_w"))
    u = md5_long(F.col(id_col).cast("string")).cast("double") / F.lit(float(2**60))
    p = F.least(F.lit(1.0), F.lit(frac) * F.col(weight_col).cast("double") / F.col("_mean_w"))
    return (
        df.crossJoin(F.broadcast(stats))
        .filter(u < p)
        .withColumn("keep_p", F.round(p, 6))
        .drop("_mean_w")
    )


def domain_cap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Cap each group (source domain, language, site) at ``cap`` rows,
    choosing the survivors deterministically: rank rows within the group by
    ``(md5(id), id)`` and keep rank <= cap.

    This is the web-corpus "no domain may dominate" rule. Hash order makes
    the kept subset a uniform deterministic sample of the group (head-of-file
    order would bias toward whatever the crawler saw first), and the id
    tie-break makes the ranking total. One shuffle on the group key; the
    rank-<=-cap predicate is a per-group limit, which Spark's
    WindowGroupLimit rewrite applies map-side BEFORE the shuffle, so at
    corpus scale each task forwards at most ``cap`` rows per group instead
    of shuffling whole domains. Output adds the rank as ``keep_rank``."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        md5_long(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("keep_rank", F.row_number().over(w))
        .filter(F.col("keep_rank") <= cap)
    )


def weighted_topn_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weight_col: str,
    n: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, n per stratum — the
    Efraimidis–Spirakis A-ES scheme: each row draws key ``u^(1/w)`` with
    ``u`` uniform, and the n largest keys per stratum form an exact
    weighted sample without replacement. Complements
    ``importance_sample`` (Bernoulli, no size guarantee) with the
    fixed-size variant training-mix builders actually schedule around.

    Deterministic like every sampler here: ``u = (md5(id)+1) / 2^60``
    (hash coin, never an RNG; +1 keeps ln defined; the power-of-two
    division is float-exact). The key is compared as ``ln(u)/w`` —
    monotone with ``u^(1/w)`` for w > 0 and cheaper — rounded to 9 dp so
    the comparison is identical across engines (both Spark and DuckDB
    round HALF_UP; their ``ln`` agree far beyond 9 dp), ties broken by
    id. Per-stratum top-n plans as WindowGroupLimit, so each map task
    forwards at most n rows per stratum BEFORE the shuffle — the
    domain_cap scale shape. Non-positive weights are excluded (a zero
    weight must never be sampled; the ln-key would be undefined).
    Output adds ``samp_key`` and ``samp_rank``."""
    from pyspark.sql import Window

    u = (md5_long(F.col(id_col).cast("string")) + 1).cast("double") / F.lit(float(2**60))
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    d = df.filter(F.col(weight_col) > 0).withColumn("samp_key", key)
    w = Window.partitionBy(stratum_col).orderBy(F.col("samp_key").desc(), F.col(id_col))
    return (
        d.withColumn("samp_rank", F.row_number().over(w))
        .filter(F.col("samp_rank") <= n)
    )


def mix_plan(
    docs: DataFrame,
    weights: DataFrame,
    target_tokens: int,
    rate_cap_ppm: int = 4_000_000,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    weight_col: str = "weight",
) -> DataFrame:
    """Training-mix planner — the mixture table every large pretraining
    run starts from (Pile/Dolma-style): given per-doc token counts and an
    integer ``weight`` per source, allocate a ``target_tokens`` budget
    proportionally and turn each source's allocation into a deterministic
    sampling rate in parts-per-million, capped at ``rate_cap_ppm``
    (max epochs — a small source cannot be upsampled without bound).

    All arithmetic is exact-integer (decimal(38) intermediates, floor
    division) so the plan is reproducible bit-for-bit on any engine, and
    the whole computation is one groupBy over the corpus followed by a
    broadcast join against the tiny weight table — the avail aggregation
    is the only shuffle at 100 TB. Output per source: ``avail_tokens``,
    ``weight``, ``target_alloc``, ``rate_ppm``, ``planned_tokens``,
    ``capped``."""
    avail = docs.groupBy(source_col).agg(
        F.sum(F.col(tokens_col)).cast("long").alias("avail_tokens")
    )
    total_w = weights.agg(F.sum(F.col(weight_col)).cast("long").alias("_wsum"))
    j = (
        avail.join(F.broadcast(weights.select(source_col, weight_col)), source_col)
        .crossJoin(F.broadcast(total_w))
    )
    target_alloc = F.floor(
        (F.lit(target_tokens).cast("decimal(38,0)") * F.col(weight_col))
        / F.col("_wsum")
    ).cast("long")
    j = j.withColumn("target_alloc", target_alloc)
    rate = F.floor(
        (F.col("target_alloc").cast("decimal(38,0)") * F.lit(1_000_000))
        / F.col("avail_tokens")
    ).cast("long")
    j = j.withColumn("rate_ppm", F.least(rate, F.lit(int(rate_cap_ppm)).cast("long")))
    return j.select(
        source_col,
        "avail_tokens",
        F.col(weight_col).cast("long").alias("weight"),
        "target_alloc",
        "rate_ppm",
        F.floor(
            (F.col("avail_tokens").cast("decimal(38,0)") * F.col("rate_ppm"))
            / F.lit(1_000_000)
        ).cast("long").alias("planned_tokens"),
        (rate > F.lit(int(rate_cap_ppm))).cast("int").alias("capped"),
    )


def mix_apply(
    docs: DataFrame,
    plan: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Materialize a mix plan into an epoched corpus: each doc appears
    ``rate_ppm // 1M`` times (full epochs) plus one more iff its hash coin
    ``md5(id) % 1M`` lands under the fractional remainder — so every
    source's expected token volume matches the plan exactly and the chosen
    rows are a deterministic function of the row key (re-runs, backfills
    and other engines select identical rows; no RNG state).

    Map-side only: a broadcast join against the per-source rate table and
    an ``explode(sequence(...))`` for epochs — no shuffle at 100 TB.
    Output adds ``epoch`` (0-based)."""
    j = docs.join(
        F.broadcast(plan.select(source_col, "rate_ppm")), source_col
    )
    full = (F.col("rate_ppm") / F.lit(1_000_000)).cast("long")
    frac = F.col("rate_ppm") % F.lit(1_000_000)
    copies = full + F.when(_key_mod(F.col(id_col), 1_000_000) < frac, 1).otherwise(0)
    return (
        j.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), (F.col("_copies") - 1).cast("int")))
        )
        .drop("_copies", "rate_ppm")
    )
