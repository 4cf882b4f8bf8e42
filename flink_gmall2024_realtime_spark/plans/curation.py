"""Round-3 curation-pipeline additions: composed ANN indexing, cross-corpus
contamination dedup, and importance-weighted sampling.

Each entry follows the catalog's determinism rules (see ``catalog.py``
module docstring) so even the approximate indexes carry exact DuckDB
oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import md5_long_sql_duckdb
from ..operators import dedup, sampling, similarity
from .catalog import _COS_PAIR, _SHINGLE_CTE, _pq_sub_dist_sql, _t, register


def _ann_ivf_pq_sql(m: int = 8, cb_k: int = 16, k: int = 5, nprobe: int = 4) -> str:
    """The IVF+PQ oracle is the literal composition of the two parents:
    ``_IVF_SQL``'s centroid/assignment/probe CTEs restrict which (query,
    neighbor) pairs are scored; ``_ann_pq_sql``'s codebook/code/ADC CTEs
    supply the distance. Each corpus vector lives in exactly one cell, so
    the probe join produces each pair at most once."""
    corpus_subs = "\nUNION ALL\n".join(
        f"SELECT e.vec_id, {s} AS s, cb.j, {_pq_sub_dist_sql('e.v', 'cb.cv', s)} AS d FROM e CROSS JOIN cb"
        for s in range(m)
    )
    query_subs = "\nUNION ALL\n".join(
        f"SELECT q.query_id, {s} AS s, cb.j, {_pq_sub_dist_sql('q.qv', 'cb.cv', s)} AS d FROM q CROSS JOIN cb"
        for s in range(m)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cen AS (SELECT vec_id AS cid, v AS cv FROM e
        WHERE vec_id % (SELECT greatest(50, CAST(ceil(count(*) / 256.0) AS BIGINT)) FROM e) = 0),
asg AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT e.vec_id, cen.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_COS_PAIR.format(a='e.v', b='cen.cv')} DESC, cen.cid) AS rn
    FROM e CROSS JOIN cen
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
probes AS (
  SELECT query_id, cid AS cell FROM (
    SELECT q.query_id, cen.cid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_COS_PAIR.format(a='q.qv', b='cen.cv')} DESC, cen.cid) AS rn
    FROM q CROSS JOIN cen
  ) WHERE rn <= {nprobe}
),
cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v AS cv
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {cb_k}) t
),
sub AS ({corpus_subs}),
code AS (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn
    FROM sub
  ) WHERE rn = 1
),
qsub AS ({query_subs}),
approx AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         round(sum(round(qs.d, 6)::DECIMAL(28, 6)), 6)::DOUBLE AS dist
  FROM probes p
  JOIN asg a ON a.cell = p.cell
  JOIN code c ON c.vec_id = a.vec_id
  JOIN qsub qs ON qs.query_id = p.query_id AND qs.s = c.s AND qs.j = c.j
  WHERE a.vec_id <> p.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, dist, rank FROM (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
  FROM approx
) WHERE rank <= {k}
"""


@register("ann_ivf_pq", oracle=_ann_ivf_pq_sql(), survey_ids=("sim-ivf", "sim-pq"))
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed index (the production big-ANN layout): the inverted
    file prunes to 4 probed cells per query, and in-cell scoring reads
    8-byte PQ codes, never vectors — at 10^9 x 64-float scale each query
    touches ~nprobe/cells of an ~8 GB code index instead of all of a
    ~256 GB vector corpus. Deterministic placeholder centroids + codebook
    keep the two-level approximate index exactly SQL-oracle-checkable."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    return similarity.ivf_pq_topk(emb, q, k=5, centroid_mod=50, nprobe=4)


_CROSS_DEDUP_SQL = f"""
WITH {_SHINGLE_CTE},
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS query_id, b.doc_id AS corpus_id, count(*) AS inter
  FROM sh a
  JOIN documents da ON da.doc_id = a.doc_id AND da.source = 'src0'
  JOIN sh b ON b.shingle = a.shingle
  JOIN documents db ON db.doc_id = b.doc_id AND db.source <> 'src0'
  GROUP BY 1, 2
)
SELECT query_id, corpus_id,
       round(inter::DOUBLE / (sq.sz + sc.sz - inter), 6) AS jaccard
FROM inter
JOIN sz sq ON sq.doc_id = query_id
JOIN sz sc ON sc.doc_id = corpus_id
WHERE round(inter::DOUBLE / (sq.sz + sc.sz - inter), 6) >= 0.35
"""


@register("dedup_cross_corpus", oracle=_CROSS_DEDUP_SQL, survey_ids=("dedup-minhash-lsh", "text-decontam"))
def dedup_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level train/test contamination: MinHash+LSH near-dup pairs
    BETWEEN an eval set (source 'src0') and the rest of the corpus — never
    within a side, so the big side never self-joins. Candidates are one
    band-bucket equi-join (AQE broadcasts the small eval side's banded
    frame), verification is exact Jaccard on candidates; the oracle is the
    brute cross-side pair set, which the banded path must fully recall —
    the same recall contract ``dedup_minhash_lsh`` is held to."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs_cross(
        docs.filter(F.col("source") == "src0"),
        docs.filter(F.col("source") != "src0"),
        threshold=0.35,
    )


# Deterministic HLL: m=256 registers over the 60-bit md5 hash. Register =
# low 8 bits; rho = leading-zero count + 1 within the remaining 52-bit word
# (via length(bin(w)) — both engines print minimal binary digits). The
# 2^-R_j harmonic sum is accumulated in integer units of 2^-53, so it is
# partial-order invariant and the raw estimate is bit-identical cross-engine.
from ..operators.sketch import HLL_ALPHA as _HLL_ALPHA  # identical double both sides
_HLL_SQL = f"""
WITH h AS (
  SELECT event_type, {md5_long_sql_duckdb("user_id::VARCHAR")} AS h
  FROM events WHERE user_id IS NOT NULL
),
reg AS (
  SELECT event_type, h % 256 AS j,
         max(CASE WHEN (h >> 8) > 0 THEN 53 - length(bin(h >> 8)) ELSE 53 END) AS r
  FROM h GROUP BY 1, 2
),
s AS (
  SELECT event_type, count(*) AS used_registers,
         sum((1::BIGINT << (53 - r)))::BIGINT AS used_units
  FROM reg GROUP BY 1
),
x AS (SELECT event_type, count(DISTINCT user_id) AS uv_exact
      FROM events WHERE user_id IS NOT NULL GROUP BY 1),
est AS (
  SELECT s.event_type, s.used_registers,
         s.used_units + (256 - s.used_registers) * 9007199254740992 AS hll_sum_units,
         {_HLL_ALPHA!r}::DOUBLE * 65536.0 * 9007199254740992.0
           / (s.used_units + (256 - s.used_registers) * 9007199254740992)::DOUBLE AS raw
  FROM s
)
SELECT e.event_type, e.used_registers, e.hll_sum_units,
       round(e.raw, 4) AS uv_raw,
       round(CASE WHEN e.raw <= 640.0 AND e.used_registers < 256
                  THEN 256.0 * ln(256.0 / (256 - e.used_registers))
                  ELSE e.raw END, 4) AS uv_est,
       x.uv_exact
FROM est e JOIN x ON x.event_type = e.event_type
"""


@register("q_hll_sketch", oracle=_HLL_SQL, survey_ids=("A4",))
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-agnostic deterministic HyperLogLog — the mergeable-sketch
    path ``q_approx_aggregates`` (rows-only, engine-native sketches) leaves
    unchecked. The register table (per-key max rho over 256 registers) is
    an associative aggregate: partials merge by max, so at 100 TB the
    sketch rides ordinary partial aggregation and register tables from
    different days/partitions union with a groupBy-max — no re-scan.
    Everything is integer arithmetic (hash bits, bin-length rho,
    2^-R in fixed-point units), so this approximate structure carries an
    exact oracle; ``uv_exact`` rides the same shuffle key for an on-query
    error readout."""
    from ..operators import sketch

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    reg = sketch.hll_registers(ev, "event_type", "user_id")
    est = sketch.hll_estimate(reg, "event_type")
    x = ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("uv_exact"))
    return est.join(x, "event_type").select(
        "event_type", "used_registers", "hll_sum_units", "uv_raw", "uv_est", "uv_exact"
    )


_CM_HASH = md5_long_sql_duckdb("i::VARCHAR || ':' || user_id::VARCHAR")
_COUNTMIN_SQL = f"""
WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
salted AS (SELECT user_id, i FROM ev, UNNEST([0, 1, 2, 3]) AS t(i)),
cells AS (
  SELECT i, {_CM_HASH} % 512 AS col, count(*) AS c
  FROM salted GROUP BY 1, 2
),
keys AS (SELECT DISTINCT user_id FROM ev),
truth AS (SELECT user_id, count(*) AS true_ct FROM ev GROUP BY 1),
probes AS (SELECT user_id, i, {_CM_HASH} % 512 AS col
           FROM keys, UNNEST([0, 1, 2, 3]) AS t(i)),
est AS (
  SELECT p.user_id, min(c.c) AS cm_est
  FROM probes p JOIN cells c ON c.i = p.i AND c.col = p.col
  GROUP BY 1
)
SELECT e.user_id, t.true_ct, e.cm_est
FROM est e JOIN truth t ON t.user_id = e.user_id
"""


@register("q_countmin_sketch", oracle=_COUNTMIN_SQL, survey_ids=("A4",))
def q_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch (heavy-hitter counting): 4 salted hash
    rows x 512 columns of pure integer counts, probed with min-over-rows.
    Like ``q_hll_sketch`` the sketch STATE is portable data with sum-merge
    algebra (partials from any partitioning merge to the same table), so
    the approximate structure is hash-exact against DuckDB. True counts
    ride along to expose the overestimate (cm_est >= true_ct always —
    unit-asserted). At corpus scale the probe set is a bounded candidate
    list, not all keys (here the fixture's 150 users ARE the bounded
    list)."""
    from ..operators import sketch

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull()).select("user_id")
    table = sketch.cm_table(ev, "user_id")
    est = sketch.cm_estimate(table, ev.distinct(), "user_id")
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_ct"))
    return est.join(truth, "user_id").select("user_id", "true_ct", "cm_est")


_HDR_SQL = """
WITH st AS (
  SELECT event_type, CAST(floor(round(value, 6) * 1000000.0) AS BIGINT) AS m
  FROM events
),
st2 AS (SELECT event_type, m, length(bin(m)) AS k FROM st),
hist AS (
  SELECT event_type,
         CASE WHEN m < 16 THEN m
              ELSE k * 8 + ((m >> greatest(k - 4, 0)) & 7) END AS bid,
         CASE WHEN m < 16 THEN m
              ELSE (17 + 2 * ((m >> greatest(k - 4, 0)) & 7))
                   * (1::BIGINT << greatest(k - 5, 0)) END AS rep,
         count(*) AS c
  FROM st2 GROUP BY 1, 2, 3
),
cum AS (
  SELECT event_type, rep,
         sum(c) OVER (PARTITION BY event_type ORDER BY bid) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS tot
  FROM hist
),
q AS (
  SELECT event_type,
         round(min(CASE WHEN cum >= ceil(0.5 * tot) THEN rep END) / 1000000.0, 6) AS p50_est,
         round(min(CASE WHEN cum >= ceil(0.95 * tot) THEN rep END) / 1000000.0, 6) AS p95_est
  FROM cum GROUP BY 1
),
x AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50_exact,
             round(quantile_cont(value, 0.95), 6) AS p95_exact
      FROM events GROUP BY 1)
SELECT q.event_type, q.p50_est, q.p95_est, x.p50_exact, x.p95_exact
FROM q JOIN x ON x.event_type = q.event_type
"""


@register("q_hdr_quantiles", oracle=_HDR_SQL, survey_ids=("A4",))
def q_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram quantile sketch: leading-bit buckets with 3 sub-bucket
    bits (~6% worst-case relative error), all integer arithmetic after one
    double quantization — so unlike log-gamma DDSketch buckets, edge values
    cannot flip buckets on a libm last-ulp difference, and the sketch is
    hash-exact cross-engine. Histograms are (group, bucket, count) rows
    with sum-merge algebra; the quantile read is two windows sharing one
    Exchange. Exact interpolated percentiles ride along as the error
    readout (within-7%% unit-asserted)."""
    from ..operators import sketch

    ev = _t(spark, sf_dir, "events")
    hist = sketch.hdr_hist(ev, "event_type", "value")
    est = sketch.hdr_quantiles(hist, "event_type", (0.5, 0.95))
    x = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_exact"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95_exact"),
    )
    return est.join(x, "event_type").select(
        "event_type", "p50_est", "p95_est", "p50_exact", "p95_exact"
    )


_FUZZY_JOIN_SQL = """
WITH names AS (SELECT DISTINCT p_name FROM part),
t AS (SELECT p_name, split_part(p_name, ' ', 2) AS noun FROM names)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS lev
FROM t a JOIN t b ON a.noun = b.noun AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 4
"""


@register("q_fuzzy_join", oracle=_FUZZY_JOIN_SQL, survey_ids=("J1", "J6"))
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join (record linkage): name pairs within edit distance 4,
    blocked on a shared token so the quadratic edit-distance verify runs
    only within blocks — never all-pairs. The scale shape: (1) linkage runs
    over the DISTINCT name vocabulary, which is orders of magnitude smaller
    than the fact table (match the vocabulary, then hash-join matches back);
    (2) the blocking key turns the candidate space from |V|^2 into
    sum-of-block^2; (3) ``levenshtein`` is a JVM codegen builtin — no UDF.
    Both engines implement standard unit-cost edit distance, so the check
    is hash-exact."""
    p = _t(spark, sf_dir, "part").select("p_name").distinct()
    noun = F.split_part(F.col("p_name"), F.lit(" "), F.lit(2))
    a = p.select(F.col("p_name").alias("name_a"), noun.alias("noun"))
    b = p.select(F.col("p_name").alias("name_b"), noun.alias("noun"))
    return (
        a.join(b, "noun")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("lev", F.levenshtein("name_a", "name_b"))
        .filter(F.col("lev") <= 4)
        .select("name_a", "name_b", "lev")
    )


_IMPORTANCE_SQL = f"""
WITH d AS (SELECT doc_id, source, n_chars FROM documents),
stats AS (
  SELECT sum(round(n_chars::DOUBLE, 6)::DECIMAL(28,6))::DOUBLE / count(*) AS mean_w FROM d
)
SELECT doc_id, source, n_chars,
       round(least(1.0, 0.3 * n_chars::DOUBLE / mean_w), 6) AS keep_p
FROM d, stats
WHERE ({md5_long_sql_duckdb("doc_id::VARCHAR")})::DOUBLE / 1152921504606846976.0
      < least(1.0, 0.3 * n_chars::DOUBLE / mean_w)
"""


@register("sample_importance", oracle=_IMPORTANCE_SQL, survey_ids=("sample-stratified",))
def sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted corpus sampling: keep ~30% of documents with
    per-doc probability proportional to length (the stand-in for a quality
    weight) — the training-mix primitive 'downsample, preferring the rows
    worth keeping'. Hash-coin + DECIMAL-exact mean keep membership exactly
    reproducible cross-engine; see ``sampling.importance_sample``."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return sampling.importance_sample(docs, "doc_id", "n_chars", 0.3)
