"""MERGE / upsert-apply and SCD2 history operators.

The reference's serving sinks apply a keyed changelog to a mutable store —
HBase puts/deletes by rowkey (``HBaseUtil.java:118-160``, driven by
``DimHBaseSinkFunction.java:33-59``) and upsert-Kafka PK compaction
(``SQLUtil.java:54-62`` upsert-kafka DDL).  Batch-side, the same semantics
are the warehouse MERGE: fold the changelog to its latest state per key,
then full-outer-join it against the target and resolve each key with a CASE.
This module is that seam, expressed as pure Catalyst plans:

- ``fold_changelog``   — latest-wins compaction of a keyed changelog,
- ``merge_into``       — MERGE (update / insert / delete) as one full-outer
                         equi-join; the batch twin of
                         ``streaming.sinks.keyed_upsert_sink``'s bucket
                         rewrite, and the exact plan a Delta/Iceberg
                         ``MERGE INTO`` would compile to,
- ``scd2_history``     — type-2 slowly-changing-dimension history (validity
                         intervals) from the same changelog, the batch
                         materialization of the dim layer's audit trail.

100 TB shape: every operator here is a single hash shuffle on the merge key
(plus per-key sorts that share that shuffle).  Nothing collects to the
driver; the source side of ``merge_into`` stays joinable by AQE broadcast
when a micro-batch is small, and sort-merge when it is not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fold_changelog(
    changelog: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Compact a keyed changelog to its latest row per key (K3 upsert
    semantics — last write wins, ordered by ``order_by`` with the final
    column as tie-break).  One shuffle on ``keys``; the row_number window
    and any downstream merge join share that partitioning."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str],
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """MERGE ``source`` (one row per key — pre-fold with ``fold_changelog``)
    into ``target``:

    - matched,   op != delete  -> target row with ``update_cols`` overwritten
    - matched,   op == delete  -> row dropped
    - unmatched, op != delete  -> inserted (non-update target columns null)
    - unmatched, op == delete  -> no-op
    - target rows never touched by ``source`` pass through unchanged

    ``op_col`` names the source's operation column; ``None`` means every
    source row is an upsert.  The plan is one full-outer equi-join on
    ``keys`` — no driver collect, no cartesian; AQE picks broadcast vs
    sort-merge by the folded source's actual size.  Keys are a primary key
    and must be non-null (plain ``==`` join — null-safe keys would defeat
    reuse of ``fold_changelog``'s hash partitioning and force a second
    shuffle of the source side).  Reference semantics:
    ``DimHBaseSinkFunction.java:33-59`` (delete -> HBase delete, else put)."""
    src_cols = [c for c in source.columns if c not in keys]
    s = source.select(
        *[F.col(k).alias(f"_s_{k}") for k in keys],
        *[F.col(c).alias(f"_s_{c}") for c in src_cols],
    )
    cond = [target[k] == s[f"_s_{k}"] for k in keys]
    j = target.join(s, cond, "full_outer")

    matched_src = s[f"_s_{keys[0]}"].isNotNull()
    is_delete = (
        (F.col(f"_s_{op_col}") == delete_op) if op_col is not None else F.lit(False)
    )
    # delete of a missing key is a no-op; delete of a present key drops it
    kept = j.filter(~(matched_src & is_delete))

    out = []
    for c in target.columns:
        if c in keys:
            out.append(F.coalesce(target[c], s[f"_s_{c}"]).alias(c))
        elif c in update_cols:
            out.append(
                F.when(matched_src, s[f"_s_{c}"]).otherwise(target[c]).alias(c)
            )
        else:
            out.append(target[c].alias(c))
    return kept.select(*out)


def scd2_history(
    changelog: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tracked: Sequence[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Type-2 SCD history: collapse consecutive changelog rows whose
    ``tracked`` attributes did not change, then assign each surviving
    version its validity interval ``[effective_from, effective_to)`` with
    ``effective_to IS NULL`` marking the current row.

    Both window passes (the lag-compare and the lead-interval) partition by
    ``keys`` and order by ``(ts_col, tie_break)`` — same partitioning, same
    sort order, so Catalyst plans ONE Exchange and one Sort; the collapse
    filter runs between them without re-shuffling.  This is the batch
    materialization of what the dim layer's HBase puts overwrite in place
    (``DimHBaseSinkFunction.java:40-46``) — kept as history instead."""
    order = [F.col(ts_col).asc()] + (
        [F.col(tie_break).asc()] if tie_break is not None else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.row_number().over(w) == 1
    versions = changelog.withColumn("_keep", first | changed).filter("_keep").drop("_keep")
    return versions.select(
        *keys,
        *tracked,
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w).alias("effective_to"),
    ).withColumn("is_current", F.col("effective_to").isNull())


def snapshot_asof(history: DataFrame, at) -> DataFrame:
    """Point-in-time snapshot of an SCD2 history (``scd2_history`` output):
    the version live at instant ``at`` — ``effective_from <= at`` and the
    interval end is open (null or ``> at``).  At scale this is a pure filter
    (no shuffle), and with the history partitioned on ``effective_from``
    dates it partition-prunes; it is how a training run pins dimension
    state to its data's event time instead of leaking future values."""
    return history.filter(
        (F.col("effective_from") <= F.lit(at))
        & (F.col("effective_to").isNull() | (F.col("effective_to") > F.lit(at)))
    ).drop("is_current")


def merge_partial_aggs(
    parts: Sequence[DataFrame],
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge decomposable aggregate states: union per-slice partial
    aggregates and re-reduce (sums add — counts are sums of partial counts —
    mins/maxes re-min/max).  This is materialized-view maintenance: a new
    slice's partial agg merges into the stored state without touching the
    base data, the batch form of the streaming total-state accumulators
    (``DwsTrafficVcChArIsNewPageViewWindow.java`` reduce functions).  Each
    partial agg map-side combines before its shuffle, so what moves is
    O(groups), never O(rows); the merge itself shuffles only the partial
    frames."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return u.groupBy(*keys).agg(*aggs)


def incremental_join_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Delta of an inner-join materialized view under insert-only deltas:

        Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB

    (the standard DBSP/IVM join derivative).  The stored view is updated by
    appending this delta — the base tables' full join never recomputes.  At
    100 TB the asymmetry is the point: ΔA and ΔB are micro-batch-sized, so
    two of the three joins broadcast their delta side and the third joins
    two small frames; the only big-table access is the equi-key probe,
    which co-located bucketing on ``on`` turns shuffle-free.

    Insert-only by contract (append-only facts); retractions compose with
    ``fold_changelog`` upstream (which collapses them before the view sees
    the rows) or carry signed weights through
    ``incremental_join_delta_retract``."""
    d1 = delta_a.join(base_b, on=list(on))
    d2 = base_a.join(delta_b, on=list(on))
    d3 = delta_a.join(delta_b, on=list(on))
    return d1.unionByName(d2).unionByName(d3)


def incremental_join_delta_retract(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
    weight_col: str = "_w",
    net: bool = True,
) -> DataFrame:
    """Join-view delta under INSERT AND RETRACT deltas — the full DBSP/
    differential-dataflow join derivative over Z-sets (rows with signed
    multiplicities).  ``delta_a``/``delta_b`` carry ``weight_col`` with +1
    for an inserted row and -1 for a retracted one (a retraction must name
    a row currently in the base); base tables are implicit weight +1.

        Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB

    with the weight of each joined row the PRODUCT of its inputs' weights —
    the cross term is what makes retract-meets-insert net correctly.  This
    is the changelog-to-view story the reference's retract streams imply
    (``DwdTradeOrderDetail.java:52-55``: Flink's left-join retractions
    re-emitted downstream): applying this delta to the stored view (append
    signed rows, or MERGE netting weights) yields exactly
    ``(A+ΔA) ⋈ (B+ΔB)``, never recomputing the base join.

    ``net=True`` canonicalizes the output: group by full row content and
    sum weights, dropping zero-net rows — one extra shuffle on the output
    columns, and what the exact multiset oracle checks.  Pass ``net=False``
    for the append-path shape (consumers net on read; same three
    broadcast-sized joins as the insert-only form, no extra Exchange).

    100 TB shape: identical to ``incremental_join_delta`` — the deltas are
    micro-batch-sized, so two joins broadcast their delta side and the
    third joins two small frames; the optional netting groups only delta
    rows, never the view."""
    wa, wb = f"{weight_col}_a", f"{weight_col}_b"
    da = delta_a.withColumnRenamed(weight_col, wa)
    db = delta_b.withColumnRenamed(weight_col, wb)
    d1 = da.join(base_b, on=list(on)).withColumn(weight_col, F.col(wa)).drop(wa)
    d2 = base_a.join(db, on=list(on)).withColumn(weight_col, F.col(wb)).drop(wb)
    d3 = (
        da.join(db, on=list(on))
        .withColumn(weight_col, F.col(wa) * F.col(wb))
        .drop(wa, wb)
    )
    out = d1.unionByName(d2).unionByName(d3)
    if not net:
        return out
    cols = [c for c in out.columns if c != weight_col]
    return (
        out.groupBy(*cols)
        .agg(F.sum(weight_col).alias(weight_col))
        .filter(F.col(weight_col) != 0)
    )


def incremental_agg_delta_retract(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: dict[str, str],
    weight_col: str = "_w",
    count_col: str = "cnt",
) -> DataFrame:
    """Grouped-aggregate materialized view maintained under INSERT AND
    RETRACT deltas — the Z-set derivative of ``GROUP BY keys`` with
    sum/count states, closing the aggregate half of the changelog-to-view
    story next to ``incremental_join_delta_retract``'s join half (the
    reference's left-join retract stream re-emits corrected rows the same
    way: ``DwdTradeOrderDetail.java:52-55`` upsert-Kafka re-emission).

    ``state`` holds the stored view: ``keys`` + one column per entry of
    ``sum_cols`` (``{out_col: delta_source_col}``) + ``count_col``.
    ``delta`` carries ``weight_col`` = +1 per inserted row, -1 per
    retracted row (a retraction must name a row the base aggregated).
    Because SUM and COUNT are commutative-group aggregates, the new view is
    a pure merge — partial-agg the signed delta (each sum weighted by w,
    the count as SUM(w)) and add it onto the state, dropping groups whose
    net count reaches zero (a group whose every row retracts vanishes,
    exactly as a recompute would make it).  MIN/MAX are deliberately NOT
    supported here: they are monoid-only — a retraction of the current
    extremum needs a rescan of the group's surviving rows, which is a
    targeted re-aggregation of affected groups, not a state merge
    (``merge_partial_aggs`` covers their insert-only form).

    100 TB shape: the delta partial-agg map-side combines before its one
    shuffle, so what moves is O(touched groups); the state merge shuffles
    state + partial on ``keys`` — never the base rows — and co-located
    bucketing on ``keys`` makes the merge shuffle-free.  Nothing
    driver-side."""
    aggs = [
        F.sum(F.col(weight_col) * F.col(src)).alias(out)
        for out, src in sum_cols.items()
    ] + [F.sum(weight_col).alias(count_col)]
    partial = delta.groupBy(*keys).agg(*aggs)
    # align partial's widened sum types with the stored state's schema so
    # the union resolves without implicit up-casts drifting the view type
    for out in list(sum_cols) + [count_col]:
        partial = partial.withColumn(
            out, F.col(out).cast(state.schema[out].dataType)
        )
    merged = state.unionByName(partial.select(*state.columns))
    return (
        merged.groupBy(*keys)
        .agg(
            *[F.sum(c).cast(state.schema[c].dataType).alias(c) for c in sum_cols],
            F.sum(count_col).cast(state.schema[count_col].dataType).alias(count_col),
        )
        .filter(F.col(count_col) != 0)
    )


def build_extrema_state(
    base: DataFrame,
    keys: Sequence[str],
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count_col: str = "cnt",
) -> DataFrame:
    """Materialize the stored state ``incremental_extrema_retract``
    maintains: per-group ``min_<c>`` / ``max_<c>`` + row count."""
    aggs = (
        [F.min(c).alias(f"min_{c}") for c in min_cols]
        + [F.max(c).alias(f"max_{c}") for c in max_cols]
        + [F.count(F.lit(1)).alias(count_col)]
    )
    return base.groupBy(*keys).agg(*aggs)


def incremental_extrema_retract(
    base: DataFrame,
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    weight_col: str = "_w",
    count_col: str = "cnt",
) -> DataFrame:
    """MIN/MAX materialized view maintained under retractions — the
    targeted-re-aggregation path that ``incremental_agg_delta_retract``
    deliberately excludes: extrema are monoid-only (no inverse), so a
    retraction of the CURRENT extremum cannot be merged away; the group
    must rescan its surviving values.  The standard IVM treatment makes
    that rescan *targeted*:

    - **merge-path groups** (no retraction touches a stored extremum, and
      the group already exists) update by pure monoid merge:
      ``least(stored_min, min(inserted))`` / ``greatest(stored_max,
      max(inserted))`` — zero base access;
    - **recompute-path groups** (a retracted value equals the stored min
      or max, or the group is brand-new) rebuild their extrema from
      per-(group, value) NET multiplicities — base values at +1, delta
      values at their signed weights, values with net > 0 survive — with
      base restricted to the recompute keys by a semi-join BEFORE any
      shuffle, so base I/O is proportional to touched groups, not the
      view.  Net-count semantics make duplicate extrema exact: retracting
      one copy of a twice-held minimum leaves the minimum in place.

    ``state`` holds ``keys`` + ``min_<c>`` / ``max_<c>`` + ``count_col``
    (build it with ``build_extrema_state``); ``delta`` carries
    ``weight_col`` = +1 / -1.  Groups whose net count reaches zero drop,
    exactly as a recompute would.  Value columns must be exact types
    (integers / decimals) so net-count equality grouping is sound — for
    floats, quantize first (the same contract the sketch family uses).

    100 TB shape: every shuffle is keyed on ``keys`` (or (keys, value)
    for the net pass, which map-side combines); the recompute-key frame
    is delta-sized, so AQE broadcasts the semi-joins; the merge path
    joins state against a delta-sized partial.  Nothing driver-side."""
    val_cols = list(dict.fromkeys([*min_cols, *max_cols]))
    if not val_cols:
        raise ValueError(
            "incremental_extrema_retract needs at least one min_cols/max_cols "
            "entry (an empty call would build no recompute frame and crash "
            "later; use incremental_agg_delta_retract for sum/count-only views)"
        )
    for c in val_cols:
        dt = base.schema[c].dataType.simpleString()
        if dt in ("float", "double"):
            raise ValueError(
                f"value column {c!r} is {dt}: net-count equality grouping "
                "needs an exact type — quantize floats to decimal/integer "
                "first (the documented contract)"
            )
    w = F.col(weight_col)
    ext_cols = [f"min_{c}" for c in min_cols] + [f"max_{c}" for c in max_cols]

    # groups where a retraction hits a stored extremum
    hit = F.lit(False)
    for c in min_cols:
        hit = hit | (F.col(c) == F.col(f"min_{c}"))
    for c in max_cols:
        hit = hit | (F.col(c) == F.col(f"max_{c}"))
    hit_keys = (
        delta.filter(w < 0)
        .join(state.select(*keys, *ext_cols), list(keys))
        .filter(hit)
        .select(*keys)
    )
    # brand-new groups (insert-only, absent from state) also recompute —
    # their "rescan" reads no base rows at all
    fresh_keys = delta.select(*keys).join(state.select(*keys), list(keys), "left_anti")
    recompute_keys = hit_keys.unionByName(fresh_keys).distinct()

    new_cnt = (
        state.select(*keys, count_col)
        .unionByName(
            delta.groupBy(*keys).agg(
                F.sum(w).cast(state.schema[count_col].dataType).alias(count_col)
            )
        )
        .groupBy(*keys)
        .agg(F.sum(count_col).cast(state.schema[count_col].dataType).alias(count_col))
        .filter(F.col(count_col) != 0)
    )

    signed_vals = (
        base.select(*keys, *val_cols)
        .withColumn(weight_col, F.lit(1))
        .unionByName(delta.select(*keys, *val_cols, weight_col))
        .join(recompute_keys, list(keys), "left_semi")
    )
    recomputed = None
    for c in val_cols:
        net = (
            signed_vals.groupBy(*keys, c)
            .agg(F.sum(weight_col).alias("_net"))
            .filter(F.col("_net") > 0)
        )
        aggs = []
        if c in min_cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
        if c in max_cols:
            aggs.append(F.max(c).alias(f"max_{c}"))
        part = net.groupBy(*keys).agg(*aggs)
        recomputed = part if recomputed is None else recomputed.join(part, list(keys))

    ins_part = delta.filter(w > 0).groupBy(*keys).agg(
        *[F.min(c).alias(f"_ins_min_{c}") for c in min_cols],
        *[F.max(c).alias(f"_ins_max_{c}") for c in max_cols],
    )
    merged = (
        state.join(recompute_keys, list(keys), "left_anti")
        .join(ins_part, list(keys), "left")
    )
    for c in min_cols:
        merged = merged.withColumn(
            f"min_{c}",
            F.least(F.col(f"min_{c}"), F.coalesce(F.col(f"_ins_min_{c}"), F.col(f"min_{c}"))),
        )
    for c in max_cols:
        merged = merged.withColumn(
            f"max_{c}",
            F.greatest(F.col(f"max_{c}"), F.coalesce(F.col(f"_ins_max_{c}"), F.col(f"max_{c}"))),
        )
    out_cols = [*keys, *ext_cols]
    return (
        merged.select(*out_cols)
        .unionByName(recomputed.select(*out_cols))
        .join(new_cnt, list(keys))
        .select(*out_cols, count_col)
    )
