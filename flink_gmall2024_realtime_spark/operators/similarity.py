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

Dot products use ``F.zip_with`` + ``F.aggregate`` (codegen'd, sequential
left-to-right fold — bit-identical to DuckDB's ``list_dot_product`` on
DOUBLE, which the oracle exploits). A Pandas-UDF/numpy path would batch
better for very wide vectors; at 64-dim the built-in fold wins by staying
JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, sim, rank), sim rounded to 6 dp, ties
    broken by neighbor id — fully deterministic. The query side is broadcast;
    per-query top-k runs as a window over the per-partition candidates."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), on=F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def signbit_bucket(vec: Column, planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket id: ``planes`` sign bits of deterministic
    pseudo-random hyperplanes. Hyperplane p's weight for coordinate d is
    ``((1 + (2p+1)*(d+13)) % 7) - 3`` — a fixed integer pattern, so the
    bucketing is reproducible anywhere (including SQL) with no stored model."""
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


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share a sign-bit bucket, verified by
    exact cosine. Bucket join is an equi-join — scales to corpus sizes where
    broadcast of the query side is impossible."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        signbit_bucket(F.col(vec_col), planes, dim).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        signbit_bucket(F.col(vec_col), planes, dim).alias("bucket"),
    )
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
