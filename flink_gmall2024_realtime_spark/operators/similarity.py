"""Similarity search over embedding columns (``array<float>``).

Approximate-nearest-neighbor for training-data pipelines:

- **brute-force cosine top-k** — the exactness baseline. Query set x corpus
  cross join, pruned to an equi-join-free broadcast: the (small) query side
  is broadcast, so the 100 TB corpus streams through map-side only — no
  shuffle of the corpus, and the top-k per query is a partial-aggregated
  window, not a global sort.
- **LSH-bucketed (random hyperplane / sign-bit) variant** — the scale path
  when the query side is NOT small: both sides hash to sign-bit buckets,
  candidates are bucket equi-joins, verified by exact cosine.

Dot products are unrolled into flat codegen'd expressions (sequential
left-to-right adds — bit-identical to DuckDB's ``list_dot_product`` on
DOUBLE, which the oracle exploits; Spark's higher-order ``aggregate`` is the
interpreted fallback for unknown dims). A Pandas-UDF/numpy path would batch
better for very wide vectors, at the cost of FP-order determinism (BLAS
reorders sums); at 64-dim the JVM-side expression wins on both counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential (left-to-right) double dot product.

    With a known ``dim`` the sum is unrolled into a flat codegen'd expression
    — Spark's higher-order ``aggregate`` runs interpreted per element and
    measured several times slower on wide cross joins. Both forms add in the
    same order, so they are bit-identical to each other and to DuckDB's
    ``list_dot_product``."""
    if dim is not None:
        acc = a[0].cast("double") * b[0].cast("double")
        for j in range(1, dim):
            acc = acc + a[j].cast("double") * b[j].cast("double")
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        acc = a[0].cast("double") * a[0].cast("double")
        for j in range(1, dim):
            acc = acc + a[j].cast("double") * a[j].cast("double")
        return F.sqrt(acc)
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return _dot(a, b, dim) / (_norm(a, dim) * _norm(b, dim))


def _mat(series):
    """Arrow list-column -> (rows, dim) float64 matrix. np.stack over the
    Series' ndarray elements is ~3x faster than per-row list() conversion
    and bit-identical (float32 -> float64 widening is exact)."""
    import numpy as np

    return np.stack(series.to_numpy()).astype(np.float64, copy=False)


def _collapse_groups(mat, ids, cap: int):
    """Group byte-identical rows of ``mat`` — the ANN twin of the dedup
    family's collapse-before-quadratic idiom (``dedup._cell_pairs_arrays``):
    score ONE representative per distinct vector/code, and reconstruct the
    exact expanded top-k from each group's first ``cap`` member ids.

    Returns ``(rep_idx, exp_ids, exp_grp)``:

    - ``rep_idx`` — row index of each group's min-id member; scoring runs on
      ``mat[rep_idx]`` only, so a fat-cell flood (45k copies of one vector in
      one LSH bucket / IVF cell) costs O(distinct) per probing query instead
      of O(members) — and the cost of hashing members is paid ONCE per
      group-batch, not once per query.
    - ``exp_ids``/``exp_grp`` — each group's first ``min(count, cap)`` member
      ids ascending, tagged with their group index. With ``cap = k + 1`` this
      prefix is sufficient for an EXACT top-k under any (score, id asc) order:
      identical rows score identically, so at most ``k`` members of one group
      can appear in a top-k, plus one slot for a dropped self-match. Expansion
      size is <= min(members, groups * cap), never the full flood.

    The grouping key is the raw BYTES (an optimization keyed on exact
    equality, never semantics — ADVICE r6): float rows differing only in
    NaN payload stay in separate groups, harmless for correctness, merely
    forfeiting their share of the collapse speedup. The one common benign
    case, ``-0.0`` vs ``0.0``, IS normalized below (``+ 0.0``) — the two
    are arithmetically identical, so merging their groups keeps every
    score bit-exact."""
    import numpy as np

    m = np.ascontiguousarray(mat)
    if np.issubdtype(m.dtype, np.floating):
        m = m + 0.0  # -0.0 -> 0.0; NaNs and everything else unchanged
    view = m.view([("", m.dtype)] * m.shape[1]).ravel()
    uniq, inv = np.unique(view, return_inverse=True)
    order = np.lexsort((ids, inv))  # group-major, id ascending within group
    sinv = inv[order]
    starts = np.searchsorted(sinv, np.arange(len(uniq)))
    counts = np.diff(np.append(starts, len(sinv)))
    rep_idx = order[starts]
    take = np.minimum(counts, cap)
    base = np.repeat(starts, take)
    offs = np.arange(int(take.sum())) - np.repeat(np.cumsum(take) - take, take)
    exp_ids = ids[order[base + offs]]
    exp_grp = np.repeat(np.arange(len(uniq)), take)
    return rep_idx, exp_ids, exp_grp


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = 64,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, sim, rank), sim rounded to 6 dp, ties
    broken by neighbor id — fully deterministic.

    Execution: the (small) query side is collected and broadcast to every
    task as a numpy matrix; the corpus streams through ``mapInPandas`` in
    Arrow batches. The accumulation is vectorized ACROSS pairs but runs
    dimension-by-dimension in order, so every dot/norm is bit-identical to a
    sequential scalar loop (= DuckDB's ``list_dot_product`` — the oracle
    contract), while still using SIMD across the batch. Each task emits only
    its batch-local top-k per query (a superset of the global top-k), so the
    final ranking window sees tasks*k*queries rows, not |corpus|*|queries|."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    d = qmat.shape[1]
    qn = qmat[:, 0] * qmat[:, 0]
    for j in range(1, d):
        qn = qn + qmat[:, j] * qmat[:, j]
    qn = np.sqrt(qn)
    sc = corpus.sparkSession
    bq = sc.sparkContext.broadcast((qids, qmat, qn))

    out_schema = "query_id long, neighbor_id long, sim double"

    def score(batches):
        qids_, qmat_, qn_ = bq.value
        nq = len(qids_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            cmat_all = _mat(pdf[vec_col])
            # batch-local identical-vector collapse (exact; see _collapse_groups)
            rep_idx, exp_ids, exp_grp = _collapse_groups(cmat_all, cids, k + 1)
            cmat = cmat_all[rep_idx]
            # dim-sequential accumulation: bit-equal to a scalar loop
            acc = cmat[:, 0:1] * qmat_[None, :, 0]
            for j in range(1, d):
                acc = acc + cmat[:, j : j + 1] * qmat_[None, :, j]
            cn = cmat[:, 0] * cmat[:, 0]
            for j in range(1, d):
                cn = cn + cmat[:, j] * cmat[:, j]
            cn = np.sqrt(cn)
            sim = np.round(acc / (cn[:, None] * qn_[None, :]), 6)
            # batch-local top-k per query (superset of global top-k)
            rows = []
            for qi in range(nq):
                col = sim[exp_grp, qi]
                mask = exp_ids != qids_[qi]  # exclude self by id, not by rep
                eids, esim = exp_ids[mask], col[mask]
                # order: sim desc, neighbor_id asc — lexsort keys reversed
                idx = np.lexsort((eids, -esim))[: min(k, len(eids))]
                for ci in idx:
                    if np.isfinite(esim[ci]):
                        rows.append((qids_[qi], eids[ci], esim[ci]))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"])

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def plane_weights(planes: int = 8, dim: int = 64):
    """Deterministic pseudo-random hyperplane weights: plane p's weight for
    coordinate d is ``((1 + (2p+1)*(d+13)) % 7) - 3`` — a fixed integer
    pattern, so the bucketing is reproducible anywhere (including SQL) with
    no stored model. Returns a planes x dim float64 matrix."""
    import numpy as np

    return np.array(
        [[((1 + (2 * p + 1) * (d + 13)) % 7) - 3 for d in range(dim)] for p in range(planes)],
        dtype=np.float64,
    )


def signbit_bucket(vec: Column, planes: int = 8, dim: int = 64) -> Column:
    """Column-expression form of the sign-bit LSH bucket id (the SQL-parity
    reference). Spark evaluates higher-order lambdas interpreted per element
    — several times slower than codegen — so hot paths use the Arrow/numpy
    twin ``_assign_buckets`` below; this form exists for declarative use and
    as executable documentation of the oracle's bucket definition."""
    acc = F.lit(0)
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, d: v.cast("double") * (((F.lit(1) + F.lit(2 * p + 1) * (d + F.lit(13))) % 7) - 3).cast("double"),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        acc = acc + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def _assign_buckets(
    df: DataFrame,
    planes: int,
    dim: int,
    id_col: str,
    vec_col: str,
    id_out: str,
    vec_out: str,
    norm_out: str,
) -> DataFrame:
    """One Arrow pass computing (id, vec, norm, bucket) per vector — the
    vectorized twin of ``signbit_bucket`` + ``_norm``. Projections and norms
    accumulate dimension-sequentially (vectorized across rows only), so every
    value is bit-identical to the interpreted Column form and to DuckDB's
    ``list_dot_product`` — the bucket ids and norms survive the oracle check
    exactly."""
    import numpy as np
    import pandas as pd

    vec_type = df.schema[vec_col].dataType.simpleString()
    weights = plane_weights(planes, dim)
    bits = np.power(2, np.arange(planes), dtype=np.int64)

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vmat = _mat(pdf[vec_col])
            proj = vmat[:, 0:1] * weights[None, :, 0]
            nrm = vmat[:, 0] * vmat[:, 0]
            for j in range(1, dim):
                proj = proj + vmat[:, j : j + 1] * weights[None, :, j]
                nrm = nrm + vmat[:, j] * vmat[:, j]
            yield pd.DataFrame(
                {
                    id_out: pdf[id_col],
                    vec_out: pdf[vec_col],
                    norm_out: np.sqrt(nrm),
                    "bucket": ((proj > 0).astype(np.int64) * bits[None, :]).sum(axis=1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        fn, f"{id_out} long, {vec_out} {vec_type}, {norm_out} double, bucket long"
    )


def _score_arrays(cids, cm_all, qids, qm, k: int, dim: int) -> list:
    """Score one key group's corpus members x probing queries and return the
    group-local top-k rows as (query_id, neighbor_id, sim) tuples — the
    arithmetic core shared by the streaming scorer below. Dots/norms
    accumulate dimension-sequentially (vectorized across rows only) — bit-
    identical to the scalar loop and DuckDB's ``list_dot_product``.

    Byte-identical corpus vectors collapse to one representative before
    scoring (``_collapse_groups``): a fat bucket/cell of N copies scores
    O(distinct) work per probing query, and the exact top-k is rebuilt from
    each group's first ``k+1`` member ids (identical vectors tie on sim, so
    rank order within a group is id order and only that prefix can win)."""
    import numpy as np

    rep_idx, exp_ids, exp_grp = _collapse_groups(cm_all, cids, k + 1)
    cm = cm_all[rep_idx]
    acc = cm[:, 0:1] * qm[None, :, 0]
    cn = cm[:, 0] * cm[:, 0]
    qn = qm[:, 0] * qm[:, 0]
    for j in range(1, dim):
        acc = acc + cm[:, j : j + 1] * qm[None, :, j]
        cn = cn + cm[:, j] * cm[:, j]
        qn = qn + qm[:, j] * qm[:, j]
    sim = np.round(acc / (np.sqrt(cn)[:, None] * np.sqrt(qn)[None, :]), 6)
    rows = []
    for qi in range(len(qids)):
        col = sim[exp_grp, qi]
        mask = exp_ids != qids[qi]  # exclude self by id, not by rep
        eids, esim = exp_ids[mask], col[mask]
        idx = np.lexsort((eids, -esim))[: min(k, len(eids))]
        for ci in idx:
            if np.isfinite(esim[ci]):
                rows.append((qids[qi], eids[ci], esim[ci]))
    return rows


def _complete_key_blocks(batches, key_col: str = "_k"):
    """Regroup an iterator of KEY-SORTED pandas batches into blocks that
    contain only COMPLETE key groups: the trailing (possibly incomplete)
    key's rows are carried into the next batch and flushed at end-of-
    partition. Memory is bounded by one Arrow batch plus the largest single
    key group — the same bound a cogroup holds. Requires rows sorted
    ascending by ``key_col`` within the partition (``searchsorted`` relies
    on it)."""
    import numpy as np
    import pandas as pd

    pend = None
    for pdf in batches:
        if pend is not None:
            pdf = pd.concat([pend, pdf], ignore_index=True)
            pend = None
        if len(pdf) == 0:
            continue
        ks = pdf[key_col].to_numpy()
        cut = int(np.searchsorted(ks, ks[-1], side="left"))
        pend = pdf.iloc[cut:]
        head = pdf.iloc[:cut]
        if len(head):
            yield head
    if pend is not None and len(pend):
        yield pend


def _score_grouped(corpus_side: DataFrame, query_side: DataFrame, key: str, k: int, dim: int) -> DataFrame:
    """Per-``key``-group ANN scoring emitting each query's GROUP-LOCAL top-k
    — the shape that makes bucketed/partitioned ANN survive a big corpus:
    raw candidates never shuffle to a global window; only ``groups-probed x
    k`` rows per query reach the final ranking.

    ``corpus_side``: (neighbor_id, cv, key); ``query_side``: (query_id, qv,
    key). Group-local top-k under (sim desc, id asc) is a superset of the
    global top-k restricted to that group, so composing with a final
    ``row_number`` window is exact over the candidate set.

    Execution (r16, guide §2.4/§4): both sides union under a role tag and
    share ONE hash exchange on the key + a partition-local sort; scoring is
    a ``mapInPandas`` pass that regroups the sorted stream into complete
    key blocks (``_complete_key_blocks``) and scores each group with
    ``_score_arrays``. The prior ``cogroup().applyInPandas`` form shuffled
    each side separately (2 exchanges) and paid the per-GROUP Python
    dispatch + pandas-frame cost on every bucket — at ~256 rows/bucket by
    construction (``auto_planes``), a 10^9-vector corpus has ~4M groups, so
    per-group overhead is a real at-scale tax, not a fixture artifact.
    Here Python is invoked per Arrow batch, the vector matrix is built once
    per block, and groups are numpy slices. Measured at sf0.1: lsh 0.70x,
    ivf 0.79x (pairwise medians), results bit-identical."""
    import numpy as np
    import pandas as pd

    u = corpus_side.select(
        F.col(key).alias("_k"),
        F.lit(False).alias("_q"),
        F.col("neighbor_id").alias("_id"),
        F.col("cv").alias("_v"),
    ).unionByName(
        query_side.select(
            F.col(key).alias("_k"),
            F.lit(True).alias("_q"),
            F.col("query_id").alias("_id"),
            F.col("qv").alias("_v"),
        )
    )
    part = u.repartition(F.col("_k")).sortWithinPartitions("_k")

    def fn(batches):
        for pdf in _complete_key_blocks(batches):
            ks = pdf["_k"].to_numpy()
            isq = pdf["_q"].to_numpy()
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            vm = _mat(pdf["_v"])
            rows = []
            bounds = np.flatnonzero(ks[1:] != ks[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(ks)]))
            for s, e in zip(starts, ends):
                q = isq[s:e]
                # a group missing either side scores nothing (the cogroup
                # emitted empty for one-sided groups too)
                if q.all() or not q.any():
                    continue
                ci = np.flatnonzero(~q) + s
                qi = np.flatnonzero(q) + s
                rows.extend(_score_arrays(ids[ci], vm[ci], ids[qi], vm[qi], k, dim))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"])

    return part.mapInPandas(fn, "query_id long, neighbor_id long, sim double")


def estimated_row_count(df: DataFrame, with_source: bool = False):
    """Catalyst-statistics row-count estimate — **no Spark job launched**
    (VERDICT r4 #6: index sizing at plan-construction time must not run a
    table scan; at 100 TB that pre-count is a full pass over the corpus).

    Resolution order: the optimized plan's CBO ``rowCount`` when table
    statistics exist (``ANALYZE TABLE``/CBO); else the EXACT row counts
    from the parquet file footers behind the scan (``df.inputFiles()`` is
    resolved from the already-listed file index and footer metadata is a
    driver-side read of a few KiB per file — no job, no data scan); else
    ``sizeInBytes / schema.defaultSize()`` as the last resort (crude:
    Catalyst's defaultSize counts ONE element for array columns, so wide
    embedding tables over-estimate badly — the footer path exists
    precisely because of that).

    Filter-blind: footers count pre-filter rows, so a filtered corpus
    over-estimates by 1/selectivity. Callers must treat this as a SCALE
    estimate (index sizing, coarsening thresholds with hysteresis), never
    as semantics — see ``_effective_mod``. ``with_source=True`` also
    returns which rung produced the number (``"cbo"``/``"footers"``/
    ``"sizeInBytes"``) so callers can refuse to derive oracle-visible
    parameters from the crude last rung (``lsh_topk`` does)."""
    qe = df._jdf.queryExecution()
    stats = qe.optimizedPlan().stats()
    rc = stats.rowCount()
    n, source = None, "sizeInBytes"
    if rc.isDefined():
        n, source = max(1, int(str(rc.get()))), "cbo"
    else:
        files = df.inputFiles()
        if files and all(f.rsplit(".", 1)[-1] in ("parquet", "snappy") or ".parquet" in f for f in files):
            try:
                import re as _re

                import pyarrow.parquet as _pq

                total = 0
                for f in files:
                    total += _pq.read_metadata(_re.sub("^file:/*", "/", f)).num_rows
                n, source = max(1, total), "footers"
            except Exception:
                pass  # non-local scheme / unreadable footer -> size fallback
    if n is None:
        width = max(1, qe.optimizedPlan().schema().defaultSize())
        n = max(1, int(str(stats.sizeInBytes())) // width)
    return (n, source) if with_source else n


def _effective_mod(corpus: DataFrame, centroid_mod: int, max_centroids: int) -> int:
    """Centroid sampling modulus with scale auto-coarsening and hysteresis:
    coarsen to ``ceil(est / max_centroids)`` only when that is DECISIVELY
    (>4x) past the caller's ``centroid_mod``.  The row-count estimate is
    job-free but filter-blind (file footers count pre-filter rows), so the
    hysteresis keeps small and filtered corpora exactly on the caller's
    modulus — the oracle-aligned identity — while a 100x corpus still
    coarsens to the ``max_centroids`` collect bound."""
    mod_auto = -(-estimated_row_count(corpus) // max_centroids)
    return mod_auto if mod_auto > 4 * centroid_mod else centroid_mod


def auto_planes(n: int, target_bucket: int = 256, lo: int = 8, hi: int = 24) -> int:
    """Plane count that keeps the expected sign-bit bucket size near
    ``target_bucket``: ceil(log2(n / target_bucket)), clamped to [lo, hi].
    500 vectors -> 8 planes (256 buckets); 1e9 vectors -> 22 planes (~4M
    buckets, ~256 vectors/bucket) — candidate volume per probe stays O(1)
    in the corpus size instead of O(n)."""
    import math

    return max(lo, min(hi, math.ceil(math.log2(max(1, n) / target_bucket)) if n > target_bucket else lo))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int | None = None,
    nprobe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket: int = 256,
    on_crude_estimate: str = "raise",
) -> DataFrame:
    """Approximate top-k via sign-bit LSH — the equi-key scale path when the
    query side is too large to broadcast.

    Scale shape (all three legs required at 10^9 vectors):

    1. ``planes`` defaults to ``auto_planes(estimated_row_count(corpus))``
       so bucket population stays ~``target_bucket`` regardless of corpus
       size (a fixed 8 planes means |corpus|/256 candidates PER QUERY at
       any scale — the O(n) hole this design closes). The estimate comes
       from Catalyst statistics — no job runs at plan-construction time.
    2. Multi-probe: each query probes its own bucket plus ``nprobe - 1``
       single-bit-flipped neighbors (fixed flip order: bit 0, 1, ... — a
       deterministic, SQL-expressible variant of classic
       lowest-confidence-first multi-probe), recovering the recall that
       more planes take away. A corpus vector lives in exactly ONE bucket,
       so probe results are disjoint and need no dedup.
    3. Scoring is one shared-shuffle streaming Arrow pass emitting bucket-local
       top-k (``_score_grouped``, the ``ivf_topk`` pattern) — the final
       ranking window sees at most ``nprobe * k`` rows per query, never raw
       candidates. No join, no global window over O(bucket) rows.

    Buckets come from the vectorized ``_assign_buckets`` pass; the
    interpreted ``signbit_bucket`` Column form stays as the SQL-parity
    reference. Fully deterministic -> exact SQL oracle.

    Oracle contract for auto planes: ``estimated_row_count`` is
    filter-blind (parquet footers count pre-filter rows) and its
    ``sizeInBytes`` last rung badly over-estimates array columns
    (Catalyst's defaultSize counts ONE element per array). An oracle
    whose SQL hardcodes a plane count is only sound while the estimate
    lands in the same ``auto_planes`` clamp band — the driver fixtures
    clamp to ``lo`` from exact footer counts. When the estimate comes
    from the ``sizeInBytes`` rung AND would leave the ``lo`` band, the
    default ``on_crude_estimate="raise"`` fails fast instead of silently
    changing the candidate sets: pass ``planes`` explicitly for
    filtered/transformed/non-parquet corpora. **This is a deliberate
    behavior break vs pre-r6** (such calls used to run silently on the
    inflated estimate); callers that prefer the old never-fail posture can
    pass ``on_crude_estimate="clamp"`` to warn and clamp to the ``lo``
    plane count (more candidates scored than optimal, results still exact
    for the planes actually used — the oracle-parity-safe direction)."""
    if planes is None:
        est, src = estimated_row_count(corpus, with_source=True)
        planes = auto_planes(est, target_bucket)
        if src == "sizeInBytes" and planes != auto_planes(1, target_bucket):
            if on_crude_estimate == "clamp":
                import warnings

                lo_planes = auto_planes(1, target_bucket)
                warnings.warn(
                    f"lsh_topk auto planes={planes} derives from the crude "
                    f"sizeInBytes row estimate ({est}); clamping to lo={lo_planes}"
                    " — pass planes explicitly to size the index deliberately"
                )
                planes = lo_planes
            else:
                raise ValueError(
                    f"lsh_topk auto planes={planes} derives from the crude sizeInBytes "
                    f"row estimate ({est}); pass planes explicitly (array columns make "
                    "this rung over-estimate and would silently change candidate sets), "
                    "or pass on_crude_estimate='clamp' to warn-and-clamp to lo"
                )
    nprobe = min(nprobe, planes + 1)
    q = _assign_buckets(queries, planes, dim, id_col, vec_col, "query_id", "qv", "qn")
    c = _assign_buckets(corpus, planes, dim, id_col, vec_col, "neighbor_id", "cv", "cn")
    masks = [0] + [1 << i for i in range(nprobe - 1)]
    probes = q.select(
        "query_id",
        "qv",
        F.explode(F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])).alias("bucket"),
    )
    scored = _score_grouped(c.select("neighbor_id", "cv", "bucket"), probes, "bucket", k, dim)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def assign_nearest_cells(
    df: DataFrame,
    cen_ids,
    cen_mat,
    top: int,
    id_out: str,
    vec_out: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-side nearest-centroid routing: score every vector against the
    broadcast centroid matrix (cosine rounded to 6 decimals, ties to the
    smaller centroid id — dimension-sequential accumulation for oracle
    bit-parity) and emit its ``top`` nearest cells, carrying the vector
    through so cell membership never joins back to the source.  The shared
    cell-assignment pass of ``ivf_topk`` (corpus ``top=1`` / query probes
    ``top=nprobe``) and ``dedup.semantic_dedup_pairs``.  Output schema:
    ``(id_out long, cell long, vec_out <vec type>)``."""
    import numpy as np
    import pandas as pd

    cen_ids = np.asarray(cen_ids, dtype=np.int64)
    cen_mat = np.asarray(cen_mat, dtype=np.float64)
    d = cen_mat.shape[1]
    cen_n = cen_mat[:, 0] * cen_mat[:, 0]
    for j in range(1, d):
        cen_n = cen_n + cen_mat[:, j] * cen_mat[:, j]
    cen_n = np.sqrt(cen_n)
    bc = df.sparkSession.sparkContext.broadcast((cen_ids, cen_mat, cen_n))
    vec_type = df.schema[vec_col].dataType.simpleString()

    def fn(batches):
        cen_ids_, cen_mat_, cen_n_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vids = pdf[id_col].to_numpy(dtype=np.int64)
            vmat = _mat(pdf[vec_col])
            acc = vmat[:, 0:1] * cen_mat_[None, :, 0]
            for j in range(1, d):
                acc = acc + vmat[:, j : j + 1] * cen_mat_[None, :, j]
            vn = vmat[:, 0] * vmat[:, 0]
            for j in range(1, d):
                vn = vn + vmat[:, j] * vmat[:, j]
            vn = np.sqrt(vn)
            sim = np.round(acc / (vn[:, None] * cen_n_[None, :]), 6)
            order = np.lexsort((cen_ids_[None, :].repeat(len(vids), 0), -sim), axis=1)
            rows = []
            for i in range(len(vids)):
                for c in order[i, :top]:
                    rows.append((vids[i], int(cen_ids_[c]), pdf[vec_col].iloc[i]))
            yield pd.DataFrame(rows, columns=[id_out, "cell", vec_out])

    return df.select(id_col, vec_col).mapInPandas(
        fn, f"{id_out} long, cell long, {vec_out} {vec_type}"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroid_mod: int = 50,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: tuple | None = None,
    max_centroids: int = 256,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the partitioned-index scale path.

    'Training' defaults to the deterministic placeholder — centroids are
    the vectors with ``id % mod_eff == 0`` where ``mod_eff =
    max(centroid_mod, ceil(n / max_centroids))`` — which is what the exact
    SQL oracle models. The ``max_centroids`` cap bounds the driver-side
    centroid collect at ~``max_centroids`` rows of ``dim`` doubles no matter
    how big the corpus is (a bare ``id % centroid_mod`` collect grows
    linearly with the corpus — 20M rows at 10^9 vectors / mod 50). Sizing
    ``mod_eff`` needs the corpus count: one cheap count job, skipped
    entirely when ``centroids`` is passed. Pass ``centroids`` (e.g. from
    ``kmeans_centroids``) to use trained cells instead; the assignment/probe
    mechanics are identical either way.

    1. assign every corpus vector to its nearest centroid (cosine, rounded,
       ties by centroid id) — a map-side pass against the broadcast centroid
       matrix that carries the vector through, so cell membership never
       needs a join back to the corpus;
    2. each query probes its ``nprobe`` nearest centroids the same way;
    3. one shared-shuffle streaming Arrow pass per cell scores corpus-members x probing
       queries and keeps each query's cell-local top-k (a superset of its
       global top-k under the same (sim desc, id asc) order), so the final
       ranking window sees nprobe*k rows per query, not whole cells.

    Corpus vectors land in exactly one cell, so no dedup pass is needed.
    Fully deterministic, so (unlike most ANN) it has an exact SQL oracle.
    Output: (query_id, neighbor_id, sim, rank)."""
    import numpy as np

    if centroids is not None:
        cen_ids, cen_mat = centroids
        cen_ids = np.asarray(cen_ids, dtype=np.int64)
        cen_mat = np.asarray(cen_mat, dtype=np.float64)
    else:
        mod_eff = _effective_mod(corpus, centroid_mod, max_centroids)
        cen_rows = (
            corpus.filter(F.col(id_col) % mod_eff == 0)
            .select(id_col, vec_col)
            .collect()
        )
        cen_ids = np.array([r[0] for r in cen_rows], dtype=np.int64)
        cen_mat = np.array([list(r[1]) for r in cen_rows], dtype=np.float64)
    d = cen_mat.shape[1]

    cells = assign_nearest_cells(
        corpus, cen_ids, cen_mat, 1, "neighbor_id", "cv", id_col, vec_col
    )
    probes = assign_nearest_cells(
        queries, cen_ids, cen_mat, nprobe, "query_id", "qv", id_col, vec_col
    )

    scored = _score_grouped(cells, probes, "cell", k, d)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 40,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Distributed Lloyd k-means for IVF cell training — the step
    ``ivf_topk``'s default deterministic placeholder stands in for.

    Each iteration is one map-side Arrow pass: every task assigns its
    vectors to the nearest broadcast centroid (squared-L2) and emits ONE
    partial (count, sum-vector) row per touched cell — so what crosses to
    the driver per round is at most ``tasks x k`` rows of k x d floats,
    never vectors.  The driver reduces partials and re-seeds empty cells
    from the previous round.  Init is the k smallest-id vectors
    (deterministic); float reduction order varies with partitioning, so
    trained centroids are stable only to FP tolerance — which is why the
    catalog's oracle-checked ``ann_ivf`` entry keeps the placeholder cells
    and trained centroids are an explicit opt-in.

    Returns ``(cell_ids, centroid_matrix)`` ready for
    ``ivf_topk(..., centroids=...)``; cell ids are ``0..k-1``."""
    import numpy as np
    import pandas as pd

    init = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    cen = np.array([list(r[0]) for r in init], dtype=np.float64)
    sc = corpus.sparkSession.sparkContext
    vecs = corpus.select(vec_col)

    for _ in range(iters):
        bc = sc.broadcast(cen)

        def partials(batches):
            c = bc.value
            kk, d = c.shape
            counts = np.zeros(kk, dtype=np.int64)
            sums = np.zeros((kk, d), dtype=np.float64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = _mat(pdf[vec_col])
                # ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2 ; argmin over cells
                d2 = (v * v).sum(axis=1)[:, None] - 2.0 * (v @ c.T) + (c * c).sum(axis=1)[None, :]
                cell = d2.argmin(axis=1)
                for ci in np.unique(cell):
                    m = cell == ci
                    counts[ci] += int(m.sum())
                    sums[ci] += v[m].sum(axis=0)
            touched = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {
                    "cell": touched.astype("int64"),
                    "n": counts[touched],
                    # dtype=object keeps an EMPTY column list-typed for Arrow
                    # (a bare [] defaults to float64, which can't cast)
                    "s": pd.Series([sums[t].tolist() for t in touched], dtype="object"),
                }
            )

        rows = vecs.mapInPandas(partials, "cell long, n long, s array<double>").collect()
        counts = np.zeros(len(cen), dtype=np.int64)
        sums = np.zeros_like(cen)
        for r in rows:
            counts[r["cell"]] += r["n"]
            sums[r["cell"]] += np.asarray(r["s"])
        nz = counts > 0
        cen = np.where(nz[:, None], sums / np.maximum(counts, 1)[:, None], cen)
        bc.destroy()

    return np.arange(len(cen), dtype=np.int64), cen


def kmeans_centroids_micro(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Integer-micro Lloyd k-means — TRAINED centroids that are still
    exactly SQL-oracle-checkable (the gap ``kmeans_centroids``'s FP-order
    tolerance leaves open).

    Every quantity is int64: vectors quantize to micro-units
    (``rint(round(v, 6) * 1e6)`` — the PQ ADC idiom), assignment is argmin
    of integer squared-L2 with ties to the smaller cell id, and the update
    is a truncating division of integer sums by counts (DuckDB ``//`` and
    Spark ``div`` both truncate toward zero — numpy's floor division does
    NOT, hence the sign-decomposed form).  Integer addition is associative
    and commutative, so partial-aggregation order, partitioning, and replay
    cannot move a single unit: the trained centroids are a pure function of
    the input multiset, reproducible by chained SQL CTEs (one per
    iteration, ``plans/catalog.py::_kmeans_micro_cte``).

    Same distribution shape as ``kmeans_centroids``: one map-side Arrow
    pass per iteration emitting <= tasks x k partial (count, sum-vector)
    rows; empty cells keep their previous centroid.  Init is the ``k``
    smallest-id vectors.  Returns ``(cell_ids 0..k-1, centroid_matrix)``
    with the matrix in MICRO-UNITS (divide by 1e6 for the float form
    ``ivf_topk`` consumes)."""
    import numpy as np
    import pandas as pd

    init = corpus.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    cen = np.rint(
        np.round(np.array([list(r[1]) for r in init], dtype=np.float64), 6) * 1e6
    ).astype(np.int64)
    sc = corpus.sparkSession.sparkContext
    vecs = corpus.select(vec_col)

    for _ in range(iters):
        bc = sc.broadcast(cen)

        def partials(batches):
            c = bc.value
            kk, d = c.shape
            cn = (c * c).sum(axis=1)
            counts = np.zeros(kk, dtype=np.int64)
            sums = np.zeros((kk, d), dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.rint(np.round(_mat(pdf[vec_col]), 6) * 1e6).astype(np.int64)
                # row blocks bound memory at n_blk x k (~32 MB) — the naive
                # (v - c) tensor is n x k x d and crashed workers at k=800.
                # |v|^2 - 2 v.c + |c|^2 in int64 is EXACT (integer matmul,
                # |values| < 2^57), so argmin ties break identically.
                blk = max(16, (1 << 22) // max(kk, 1))
                for s0 in range(0, len(v), blk):
                    sub = v[s0 : s0 + blk]
                    d2 = (
                        (sub * sub).sum(axis=1)[:, None]
                        - 2 * (sub @ c.T)
                        + cn[None, :]
                    )
                    cell = d2.argmin(axis=1)  # first minimum -> smallest cell id
                    np.add.at(counts, cell, 1)
                    np.add.at(sums, cell, sub)
            touched = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {
                    "cell": touched.astype("int64"),
                    "n": counts[touched],
                    "s": pd.Series([sums[t].tolist() for t in touched], dtype="object"),
                }
            )

        rows = vecs.mapInPandas(partials, "cell long, n long, s array<bigint>").collect()
        counts = np.zeros(len(cen), dtype=np.int64)
        sums = np.zeros_like(cen)
        for r in rows:
            counts[r["cell"]] += r["n"]
            sums[r["cell"]] += np.asarray(r["s"], dtype=np.int64)
        nz = counts > 0
        # truncate-toward-zero division (SQL semantics), not numpy floor
        trunc = np.sign(sums) * (np.abs(sums) // np.maximum(counts, 1)[:, None])
        cen = np.where(nz[:, None], trunc, cen)
        bc.destroy()

    return np.arange(len(cen), dtype=np.int64), cen


def kmeans_inertia(
    corpus: DataFrame, centroids, vec_col: str = "embedding"
) -> float:
    """Sum of squared distances to each vector's nearest centroid — the
    k-means objective, computed in one map-side pass (per-task partial
    sums; only scalars reach the driver)."""
    import numpy as np
    import pandas as pd

    _ids, cen = centroids
    cen = np.asarray(cen, dtype=np.float64)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(cen)

    def partial(batches):
        c = bc.value
        tot = 0.0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = _mat(pdf[vec_col])
            d2 = (v * v).sum(axis=1)[:, None] - 2.0 * (v @ c.T) + (c * c).sum(axis=1)[None, :]
            tot += float(d2.min(axis=1).sum())
        yield pd.DataFrame({"t": [tot]})

    rows = corpus.select(vec_col).mapInPandas(partial, "t double").collect()
    return float(sum(r["t"] for r in rows))


def pq_codebook(
    corpus: DataFrame,
    cb_k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic placeholder PQ codebook: the ``cb_k`` smallest-id
    corpus vectors (bounded collect — cb_k rows regardless of corpus
    size). Every subspace shares these source vectors, sliced to its dims.
    Swap in per-subspace k-means (``kmeans_centroids`` on subvectors) for
    trained codebooks; assignment/scoring below is identical either way."""
    import numpy as np

    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(cb_k).collect()
    return np.array([list(r[1]) for r in rows], dtype=np.float64)


def _pq_sub_dists(vmat, cb, s, ds):
    """Squared-L2 distances of every row's subspace-s slice to each codebook
    row's slice — accumulated DIMENSION-SEQUENTIALLY (vectorized across
    rows x centroids only), bit-identical to the unrolled left-to-right SQL
    expression the oracle uses."""
    lo = s * ds
    diff = vmat[:, lo : lo + 1] - cb[None, :, lo]
    acc = diff * diff
    for i in range(1, ds):
        diff = vmat[:, lo + i : lo + i + 1] - cb[None, :, lo + i]
        acc = acc + diff * diff
    return acc  # (rows, cb_k)


def pq_encode(
    corpus: DataFrame,
    codebook,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding: each vector becomes ``m`` small
    centroid indices (nearest codebook entry per subspace, ties to the
    smaller index). THIS is PQ's scale story: the stored/scored
    representation is m ints per vector (8 bytes at m=8) instead of
    dim floats — a 10^9-vector index fits where raw vectors cannot.
    Output: (neighbor_id, code array<int>)."""
    import numpy as np
    import pandas as pd

    ds = dim // m
    sc = corpus.sparkSession
    bcb = sc.sparkContext.broadcast(np.asarray(codebook, dtype=np.float64))

    def encode(batches):
        cb = bcb.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vmat = _mat(pdf[vec_col])
            codes = np.empty((len(vmat), m), dtype=np.int64)
            for s in range(m):
                # argmin returns the FIRST minimum -> ties to smallest j,
                # matching the oracle's ORDER BY d, j
                codes[:, s] = _pq_sub_dists(vmat, cb, s, ds).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "code": list(codes),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        encode, "neighbor_id long, code array<bigint>"
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroid_mod: int = 50,
    nprobe: int = 4,
    m: int = 8,
    cb_k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_centroids: int = 256,
) -> DataFrame:
    """IVF + PQ: the composed big-ANN architecture — a coarse inverted file
    prunes the corpus to ``nprobe`` cells per query, and within cells the
    scoring reads 8-byte PQ codes, never vectors.  This is the memory AND
    compute shape of a production 10^9-vector index (FAISS's IVFPQ layout):
    the scored representation is m ints/vector, and each query touches only
    its probed cells' codes instead of every code in the corpus (``pq_topk``
    scans all codes; ``ivf_topk`` reads full vectors in probed cells).

    Everything is the deterministic composition of the two parents, so the
    approximate two-level index still carries an exact SQL oracle:
    - coarse cells: ``id % mod_eff == 0`` placeholder centroids (driver
      collect capped at ~``max_centroids`` rows at any corpus size),
      cosine assignment rounded to 6 dp with centroid-id ties;
    - codes: nearest codebook entry per subspace, first-minimum ties;
    - distances: per-subspace ADC values rounded to 6 dp and accumulated
      as integer micros — order-invariant, DECIMAL-exact in SQL.

    One corpus Arrow pass emits (id, cell, code) — assignment and encoding
    share the vector read, and the raw vector is dropped before anything
    shuffles.  Queries carry their raw vector into the cogrouped per-cell
    scoring pass (standard asymmetric PQ: the query side is exact), which
    emits cell-local top-k; the final rank window sees ≤ nprobe*k rows per
    query. Output: (query_id, neighbor_id, dist, rank), dist ascending."""
    import numpy as np
    import pandas as pd

    ds = dim // m
    mod_eff = _effective_mod(corpus, centroid_mod, max_centroids)
    cen_rows = (
        corpus.filter(F.col(id_col) % mod_eff == 0).select(id_col, vec_col).collect()
    )
    cen_ids = np.array([r[0] for r in cen_rows], dtype=np.int64)
    cen_mat = np.array([list(r[1]) for r in cen_rows], dtype=np.float64)
    cen_n = cen_mat[:, 0] * cen_mat[:, 0]
    for j in range(1, dim):
        cen_n = cen_n + cen_mat[:, j] * cen_mat[:, j]
    cen_n = np.sqrt(cen_n)
    cb = pq_codebook(corpus, cb_k, id_col, vec_col)
    sc = corpus.sparkSession
    bc = sc.sparkContext.broadcast((cen_ids, cen_mat, cen_n, cb))
    vec_type = corpus.schema[vec_col].dataType.simpleString()

    def _cells(vmat):
        """Rounded-cosine similarity of each row to every centroid, ordered
        (sim desc, cid asc) — identical arithmetic to ``ivf_topk.assign``."""
        cen_ids_, cen_mat_, cen_n_, _cb = bc.value
        acc = vmat[:, 0:1] * cen_mat_[None, :, 0]
        vn = vmat[:, 0] * vmat[:, 0]
        for j in range(1, dim):
            acc = acc + vmat[:, j : j + 1] * cen_mat_[None, :, j]
            vn = vn + vmat[:, j] * vmat[:, j]
        sim = np.round(acc / (np.sqrt(vn)[:, None] * cen_n_[None, :]), 6)
        return np.lexsort((cen_ids_[None, :].repeat(len(vmat), 0), -sim), axis=1)

    def encode_corpus(batches):
        cen_ids_, _cm, _cn, cb_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vmat = _mat(pdf[vec_col])
            order = _cells(vmat)
            codes = np.empty((len(vmat), m), dtype=np.int64)
            for s in range(m):
                codes[:, s] = _pq_sub_dists(vmat, cb_, s, ds).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "cell": cen_ids_[order[:, 0]],
                    "code": list(codes),
                }
            )

    def probe_queries(batches):
        cen_ids_, _cm, _cn, _cb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vmat = _mat(pdf[vec_col])
            order = _cells(vmat)
            rows = []
            for i in range(len(vmat)):
                for c in order[i, :nprobe]:
                    rows.append((int(pdf[id_col].iloc[i]), int(cen_ids_[c]), pdf[vec_col].iloc[i]))
            yield pd.DataFrame(rows, columns=["query_id", "cell", "qv"])

    coded = corpus.select(id_col, vec_col).mapInPandas(
        encode_corpus, "neighbor_id long, cell long, code array<bigint>"
    )
    probes = queries.select(id_col, vec_col).mapInPandas(
        probe_queries, f"query_id long, cell long, qv {vec_type}"
    )

    def score(cpdf: pd.DataFrame, qpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "dist": pd.Series(dtype="float64"),
            }
        )
        if len(cpdf) == 0 or len(qpdf) == 0:
            return empty
        _ci, _cm, _cn, cb_ = bc.value
        cids = cpdf["neighbor_id"].to_numpy(dtype=np.int64)
        cmat_all = np.stack(cpdf["code"].to_numpy()).astype(np.int64)
        # identical codes collapse to one ADC lookup per group (exact:
        # equal codes => equal dist); top-k rebuilt from each group's
        # first k+1 member ids — a fat cell scores O(distinct codes)
        rep_idx, exp_ids, exp_grp = _collapse_groups(cmat_all, cids, k + 1)
        cmat = cmat_all[rep_idx]
        qids = qpdf["query_id"].to_numpy(dtype=np.int64)
        qmat = _mat(qpdf["qv"])
        # per-query ADC tables in integer micros (== oracle's DECIMAL(28,6))
        tables = np.empty((len(qids), m, cb_.shape[0]), dtype=np.int64)
        for s in range(m):
            d = _pq_sub_dists(qmat, cb_, s, ds)
            tables[:, s, :] = np.rint(np.round(d, 6) * 1e6).astype(np.int64)
        srange = np.arange(m)
        rows = []
        for qi in range(len(qids)):
            micros = tables[qi][srange[None, :], cmat].sum(axis=1)
            dist = np.round(micros / 1e6, 6)[exp_grp]
            mask = exp_ids != qids[qi]
            mids, mdist = exp_ids[mask], dist[mask]
            idx = np.lexsort((mids, mdist))[: min(k, len(mids))]
            for ci in idx:
                rows.append((qids[qi], mids[ci], mdist[ci]))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "dist"])

    scored = (
        coded.groupby("cell")
        .cogroup(probes.groupby("cell"))
        .applyInPandas(lambda l, r: score(l, r), "query_id long, neighbor_id long, dist double")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist", "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    cb_k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate top-k by squared L2 (asymmetric distance computation):
    the corpus is scored FROM ITS CODES ONLY — the scoring pass reads m
    ints per vector, never the vectors — against per-query lookup tables
    (query-subvector -> each centroid, m x cb_k doubles per query,
    broadcast with the small query side as in ``brute_force_topk``).

    Determinism contract (exact SQL oracle despite FP addition being
    non-associative): per-subspace distances are rounded to 6 dp and
    accumulated as integer micro-units, so the total is order-invariant and
    bit-equal to the oracle's DECIMAL(28,6) sum. Batch-local top-k bounds
    the final rank window input. Output: (query_id, neighbor_id, dist,
    rank), dist ascending."""
    import numpy as np
    import pandas as pd

    ds = dim // m
    cb = pq_codebook(corpus, cb_k, id_col, vec_col)
    codes = pq_encode(corpus, cb, m, dim, id_col, vec_col)

    qrows = queries.select(id_col, vec_col).orderBy(id_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    # per-query ADC tables in integer micros: rint(round(d, 6) * 1e6) is
    # exactly the DECIMAL(28,6) the oracle sums
    tables = np.empty((len(qids), m, cb.shape[0]), dtype=np.int64)
    for s in range(m):
        d = _pq_sub_dists(qmat, cb, s, ds)
        tables[:, s, :] = np.rint(np.round(d, 6) * 1e6).astype(np.int64)
    sc = corpus.sparkSession
    bq = sc.sparkContext.broadcast((qids, tables))

    def score(batches):
        qids_, tables_ = bq.value
        srange = np.arange(m)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            cmat_all = np.stack(pdf["code"].to_numpy()).astype(np.int64)
            # batch-local identical-code collapse (exact; see _collapse_groups)
            rep_idx, exp_ids, exp_grp = _collapse_groups(cmat_all, cids, k + 1)
            cmat = cmat_all[rep_idx]
            rows = []
            for qi in range(len(qids_)):
                micros = tables_[qi][srange[None, :], cmat].sum(axis=1)
                dist = np.round(micros / 1e6, 6)[exp_grp]
                mask = exp_ids != qids_[qi]
                mids, mdist = exp_ids[mask], dist[mask]
                idx = np.lexsort((mids, mdist))[: min(k, len(mids))]
                for ci in idx:
                    rows.append((qids_[qi], mids[ci], mdist[ci]))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "dist"])

    scored = codes.mapInPandas(score, "query_id long, neighbor_id long, dist double")
    w = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist", "rank")
    )


def sq8_minmax(corpus: DataFrame, dim: int = 64, vec_col: str = "embedding"):
    """Per-dimension (min, max) over the corpus — SQ8's entire "model"
    (2*dim doubles). One ``posexplode`` + ``groupBy(dim)``: min/max are
    algebraic, so the map side partial-aggregates to ``dim`` rows per
    task and the shuffle carries O(dim x tasks) rows regardless of corpus
    size; the collect is ``dim`` rows — bounded, like the k-means
    centroid collect."""
    rows = (
        corpus.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    by_d = {r["d"]: (r["mn"], r["mx"]) for r in rows}
    mins = [by_d[d][0] for d in range(dim)]
    maxs = [by_d[d][1] for d in range(dim)]
    return mins, maxs


def sq8_encode_expr(vec_col: Column, mins: list, maxs: list) -> Column:
    """uint8 scalar-quantization codes as a codegen expression:
    ``round(255*(x - mn_d) / (mx_d - mn_d))`` per dimension (HALF_UP in
    both Spark and DuckDB — the determinism contract), constant dims -> 0.
    JVM-side so the quantizer is bit-identical to the SQL oracle (a numpy
    ``round`` would be half-even)."""
    mn = F.array(*[F.lit(float(v)) for v in mins])
    mx = F.array(*[F.lit(float(v)) for v in maxs])
    return F.transform(
        vec_col.cast("array<double>"),
        lambda x, i: F.when(
            F.element_at(mx, i + 1) == F.element_at(mn, i + 1), F.lit(0).cast("bigint")
        ).otherwise(
            F.round(
                (F.lit(255.0) * (x - F.element_at(mn, i + 1)))
                / (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
            ).cast("bigint")
        ),
    )


def sq8_reconstruct_expr(code_col: Column, mins: list, maxs: list) -> Column:
    """De-quantize codes back to doubles: ``mn_d + (c*(mx_d - mn_d))/255``
    — the same association order as the oracle SQL, so reconstruction is
    bit-identical."""
    mn = F.array(*[F.lit(float(v)) for v in mins])
    mx = F.array(*[F.lit(float(v)) for v in maxs])
    return F.transform(
        code_col,
        lambda c, i: F.element_at(mn, i + 1)
        + (c.cast("double") * (F.element_at(mx, i + 1) - F.element_at(mn, i + 1)))
        / F.lit(255.0),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Scalar-quantization (SQ8) ANN — the simple memory-compression path
    next to PQ: the stored index is one uint8 code per dimension (64 B per
    64-dim vector vs 256 B float32 — 4x; PQ's 8 B trades more recall).
    Encode is a codegen map (no training beyond the per-dim min/max pass);
    scoring reconstructs per-dim and runs the exact brute-force pass over
    the reconstructed corpus, so result quality degrades ONLY by the
    quantization error, and the whole pipeline stays deterministic enough
    for an exact SQL oracle (round HALF_UP both engines, fixed association
    order, dimension-sequential dot products)."""
    mins, maxs = sq8_minmax(corpus, dim=dim, vec_col=vec_col)
    codes = corpus.select(id_col, sq8_encode_expr(F.col(vec_col), mins, maxs).alias("code"))
    rec = codes.select(id_col, sq8_reconstruct_expr(F.col("code"), mins, maxs).alias(vec_col))
    return brute_force_topk(rec, queries, k=k, id_col=id_col, vec_col=vec_col, dim=dim)


def ivf_cell_stats(
    corpus: DataFrame,
    centroid_mod: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_centroids: int = 256,
    centroids: tuple | None = None,
) -> DataFrame:
    """The no-silent-degradation witness for the IVF family (the ANN twin
    of ``dedup.capped_bucket_stats``): one row of cell-population stats —
    (n_cells, max_cell, max_distinct_vecs). The ANN scorers never cap;
    they collapse byte-identical vectors (``_collapse_groups``), so the
    quantity that bounds a cell's scoring cost is its DISTINCT-vector
    count: a fat_cell flood shows max_cell exploding while
    max_distinct_vecs stays flat (cost bounded), whereas a genuinely
    heterogeneous hot cell moves max_distinct_vecs — the signal to train
    better centroids (``kmeans_centroids_micro``) or raise the cell
    count."""
    import numpy as np

    if centroids is not None:
        cen_ids, cen_mat = centroids
        cen_ids = np.asarray(cen_ids, dtype=np.int64)
        cen_mat = np.asarray(cen_mat, dtype=np.float64)
    else:
        mod_eff = _effective_mod(corpus, centroid_mod, max_centroids)
        cen_rows = (
            corpus.filter(F.col(id_col) % mod_eff == 0).select(id_col, vec_col).collect()
        )
        cen_ids = np.array([r[0] for r in cen_rows], dtype=np.int64)
        cen_mat = np.array([list(r[1]) for r in cen_rows], dtype=np.float64)
    cells = assign_nearest_cells(corpus, cen_ids, cen_mat, 1, "vid", "v", id_col, vec_col)
    sizes = cells.groupBy("cell").agg(
        F.count(F.lit(1)).alias("c"), F.count_distinct("v").alias("dr")
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.max("c").alias("max_cell"),
        F.max("dr").alias("max_distinct_vecs"),
    )


def cross_corpus_semantic_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic train/eval contamination pairs — the embedding twin of
    ``dedup.minhash_lsh_pairs_cross``: every (eval, train) pair with
    cosine >= threshold, never a within-side pair. The 100 TB shape
    mirrors decontamination reality: the EVAL side is small (benchmarks),
    so its matrix broadcasts and the training corpus streams through one
    Arrow map pass — no shuffle of the big side, no self-join, output
    bounded by true contamination. Dimension-sequential accumulation and
    round(6) keep it bit-identical to the SQL oracle (the
    ``brute_force_topk`` contract)."""
    import numpy as np
    import pandas as pd

    erows = eval_df.select(F.col(id_col), F.col(vec_col)).collect()
    eids = np.array([r[0] for r in erows], dtype=np.int64)
    emat = np.array([list(r[1]) for r in erows], dtype=np.float64)
    d = emat.shape[1]
    en = emat[:, 0] * emat[:, 0]
    for j in range(1, d):
        en = en + emat[:, j] * emat[:, j]
    en = np.sqrt(en)
    bq = train.sparkSession.sparkContext.broadcast((eids, emat, en))

    def score(batches):
        eids_, emat_, en_ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            tids = pdf[id_col].to_numpy(dtype=np.int64)
            tmat = _mat(pdf[vec_col])
            acc = tmat[:, 0:1] * emat_[None, :, 0]
            for j in range(1, d):
                acc = acc + tmat[:, j : j + 1] * emat_[None, :, j]
            tn = tmat[:, 0] * tmat[:, 0]
            for j in range(1, d):
                tn = tn + tmat[:, j] * tmat[:, j]
            tn = np.sqrt(tn)
            sim = np.round(acc / (tn[:, None] * en_[None, :]), 6)
            ti, ei = np.nonzero(sim >= threshold)
            yield pd.DataFrame(
                {
                    "eval_id": eids_[ei],
                    "train_id": tids[ti],
                    "sim": sim[ti, ei],
                }
            )

    return train.select(id_col, vec_col).mapInPandas(
        score, "eval_id long, train_id long, sim double"
    )


def embedding_hygiene(
    corpus: DataFrame,
    prefix_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding hygiene columns: full-vector L2 norm, Matryoshka-prefix
    norm, the renormalized prefix vector, and a zero-vector flag — the
    pre-index audit that catches unnormalized / degenerate embeddings
    before they poison an ANN index, plus the truncate-and-renormalize
    step an MRL-style model's short-vector serving path needs.

    Exactness: vectors quantize to int64 micro-units (the PQ ADC idiom —
    ``round(round(x, 6) * 1e6)``; the fractional residue after the inner
    round is ~1e-4 from an integer, so HALF_UP here equals rint equals a
    direct cast), every sum is integer (order-free under any partial
    aggregation), and sqrt / division are single exactly-rounded IEEE ops
    with pinned association — hash-identical to the SQL oracle.

    Pure Catalyst (transform/aggregate higher-order functions, no Python,
    no shuffle): embarrassingly parallel map-side at any scale."""
    m = F.transform(
        F.col(vec_col),
        lambda x: F.round(F.round(x.cast("double"), 6) * F.lit(1000000.0)).cast("long"),
    )
    sq_sum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda a, x: a + x * x
    )
    out = (
        corpus.select(F.col(id_col).alias("vec_id"), m.alias("_m"))
        .withColumn("_nsq", sq_sum(F.col("_m")))
        .withColumn("_m16", F.slice("_m", 1, prefix_dims))
        .withColumn("_nsq16", sq_sum(F.col("_m16")))
    )
    return out.select(
        "vec_id",
        F.round(F.sqrt(F.col("_nsq")) / F.lit(1000000.0), 6).alias("norm"),
        F.round(F.sqrt(F.col("_nsq16")) / F.lit(1000000.0), 6).alias("prefix_norm"),
        F.when(F.col("_nsq16") == 0, F.lit(None)).otherwise(
            F.transform(
                F.col("_m16"), lambda x: F.round(x / F.sqrt(F.col("_nsq16")), 6)
            )
        ).alias("prefix_unit"),
        F.when(F.col("_nsq") == 0, 1).otherwise(0).alias("is_zero"),
    )
