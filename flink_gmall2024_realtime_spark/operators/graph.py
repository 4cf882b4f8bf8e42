"""Graph operators over edge DataFrames — iterative join/aggregate algebra.

The dedup family already runs distributed label propagation for components
(``operators/dedup.py::dedup_clusters``); this module adds the other graph
primitive a curation pipeline reaches for: **PageRank-style link analysis**
(score pages/domains by the browsing graph, weight crawl sources, rank docs
in a citation/similarity graph).

Scale shape: every step is an equi-keyed join or groupBy — edges hash-
partition by ``src`` once and the iteration reuses that partitioning; node
state is one long per node.  Nothing collects to the driver.

Determinism: ranks live in integer micro-units and per-edge contributions
use floor division, so the result is a pure function of the edge multiset —
partial-aggregation order, partitioning, and engine cannot change a single
unit, which is what lets an *iterative* algorithm carry an exact SQL oracle
(chained CTEs, one per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_UNIT = 1_000_000  # rank micro-units: initial rank per node
PR_DAMPING_PCT = 85  # damping factor as integer percent


def transition_edges(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    page_col: str = "page",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-user click-path edges: consecutive distinct pages become a
    directed edge, weighted by transition count.

    The per-user lag runs through ``skew.two_phase_shift(direction="lag",
    mode="auto")`` (VERDICT r8 #1): at fixture scale it resolves to the
    plain one-Exchange window; past the safety bound (or on a source whose
    row estimate is crude) it hourly-buckets the per-user sort, so one
    flooding user's lifetime never sorts in a single task — the same
    bounded-state shape the reference's keyed ValueState keeps
    (DwsTrafficVcChArIsNewPageViewWindow.java:136-148 holds one scalar per
    key).  Self-loops (page refresh) are dropped so the random surfer
    always moves."""
    from .skew import hour_bucket, two_phase_shift

    shifted = two_phase_shift(
        events,
        key=user_col,
        order_by=[ts_col, tiebreak_col],
        value_cols=[page_col],
        bucket=hour_bucket(ts_col),
        direction="lag",
        suffix="_prevpg",
        mode="auto",
    )
    prev = F.col(f"{page_col}_prevpg")
    return (
        shifted.filter(prev.isNotNull() & (prev != F.col(page_col)))
        .groupBy(prev.alias("src"), F.col(page_col).alias("dst"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def pagerank(edges: DataFrame, iters: int = 3, checkpoint_every: int = 5) -> DataFrame:
    """Fixed-iteration weighted PageRank in exact integer arithmetic.

    Per iteration: each node sends ``floor(pr * 85 * w / (100 * out_w))``
    micro-units along each out-edge; a node's next rank is 0.15 teleport
    (150 000 units) plus the sum of incoming contributions.  Dangling-node
    mass is dropped (standard simplification) — the spec the oracle mirrors.
    The per-edge product ``pr * 85 * cnt`` is widened to DECIMAL(38,0)
    before the floor division (DuckDB side: HUGEINT): on a large graph a
    hub's rank approaches |nodes| * 1e6 micro-units and a BIGINT product
    with a heavy edge weight would overflow (ANSI mode aborts the job);
    the 38-digit intermediate is exact to ~1e38 — beyond any real corpus.

    Plan shape: ``edges ⋈ rank`` on ``src`` then groupBy ``dst`` — two
    hash exchanges per iteration on the same keys, reusable under
    co-partitioning; rank state is (node, long).  The edge set is
    localCheckpointed once so the transition-extraction stage (window +
    groupBy) runs a single time, not once per iteration, and the rank
    frame is localCheckpointed every ``checkpoint_every`` iterations so
    deep runs (iters = 20+) keep a bounded plan depth instead of chaining
    every iteration's join into one optimizer tree.
    """
    e = edges.join(
        edges.groupBy("src").agg(F.sum("cnt").alias("outw")), "src"
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pr = nodes.withColumn("pr", F.lit(PR_UNIT).cast("long"))
    for i in range(iters):
        contrib = (
            e.join(pr, e["src"] == pr["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST((CAST(pr AS DECIMAL(38,0)) * {PR_DAMPING_PCT} * cnt)"
                    " div (100 * outw) AS BIGINT)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit((100 - PR_DAMPING_PCT) * PR_UNIT // 100) + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("pr"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            pr = pr.localCheckpoint(eager=True)
    return pr


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex triangle counts via degree-ordered wedge enumeration —
    the O(m^1.5) algorithm, not the naive triple join.

    Canonicalize to undirected distinct edges (a < b), then orient every
    edge from its lower-(degree, id) endpoint to the higher one. Every
    triangle has exactly ONE vertex whose two oriented out-edges reach the
    other two (the order-smallest), so enumerating unordered out-neighbor
    pairs per apex and closing them against the canonical edge set finds
    each triangle exactly once. The payoff at scale: an oriented
    out-degree is bounded by ~sqrt(2m) regardless of raw degree, so a
    celebrity vertex with 10^6 neighbors does NOT enumerate 10^12 wedges —
    its edges point INTO it and the wedge work lands on the low-degree
    endpoints. All joins are keyed equi-joins (apex for the wedge
    self-join, (lo, hi) pair for the closure); no cartesian anywhere.

    Returns (vertex, n_triangles) for every vertex in at least one
    triangle. Integer-exact.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("_db"))
    with_deg = e.join(da, "a").join(db, "b")
    lower_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"),
    )
    o1 = oriented.select("u", F.col("w").alias("v1"))
    o2 = oriented.select("u", F.col("w").alias("v2"))
    wedges = o1.join(o2, "u").where(F.col("v1") < F.col("v2"))
    closed = wedges.join(
        e,
        (F.col("v1") == F.col("a")) & (F.col("v2") == F.col("b")),
        "inner",
    ).select("u", "v1", "v2")
    verts = (
        closed.select(F.col("u").alias("vertex"))
        .unionAll(closed.select(F.col("v1").alias("vertex")))
        .unionAll(closed.select(F.col("v2").alias("vertex")))
    )
    return verts.groupBy("vertex").agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
