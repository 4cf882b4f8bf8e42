"""Extended coverage: near-dup embeddings, winnowing, BPE tokens, IVF family.

Split from the original single-file ``plans/catalog.py`` (r9, VERDICT r7
#6) with ZERO entry changes: importing this module registers its section's
queries into the shared ``catalog.CATALOG`` registry; the full oracle run
proves behavior identity. Shared determinism rules live in ``catalog``'s
module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..functions import (  # noqa: F401
    date_to_ts,
    json_get,
    json_map,
    md5_long,
    md5_long_sql_duckdb,
    ts_to_date,
    ts_to_datetime,
    ts_to_partition,
)
from ..operators import (  # noqa: F401
    dedup,
    graph,
    multimodal,
    similarity,
    sketch,
    skew,
    state,
    text,
)
from ..operators.etl import cdc_project, etl_db_stream  # noqa: F401
from ..operators.joins import (  # noqa: F401
    config_router_join,
    interval_join,
    lateral_tokens,
    lookup_join,
)
from ..operators.windows import daily_distinct_count, tumble  # noqa: F401
from ..sources.fixtures import load_table  # noqa: F401
from .catalog import CATALOG, QuerySpec, _t, register  # noqa: F401
from .pipeline import _ANN_BRUTE_SQL, _JACCARD_SQL, _SHINGLE_CTE


# =========================================================================
# Extended coverage: near-dup embeddings, winnowing, BPE-ish tokens, and the
# SQL-surface operators a reference user would expect the engine to keep
# (rollup, set ops, pivot, hopping/session windows, percentiles)
# =========================================================================

_EMB_COS_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
"""


@register("dedup_embedding_cosine", oracle=_EMB_COS_SQL, survey_ids=("dedup-embedding-cosine",))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.4 — the fixture corpus
    has no planted vector dups; the threshold is a parameter)."""
    return dedup.embedding_cosine_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


_WINNOW_SQL = f"""
WITH {_SHINGLE_CTE},
fp AS (SELECT doc_id, {md5_long_sql_duckdb('shingle', 12)} AS fp FROM sh)
SELECT DISTINCT doc_id, fp FROM fp WHERE fp % 8 = 0
"""


@register("text_winnow_fingerprints", oracle=_WINNOW_SQL, survey_ids=("text-fingerprint",))
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style (mod-sampled shingle-hash) fingerprint sets — the
    content-defined rolling-hash fingerprinting used for overlap detection."""
    return text.winnow_fingerprints(_t(spark, sf_dir, "documents"))


@register(
    "text_bpe_token_count",
    oracle=r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_tokens_bpe
FROM documents
""",
    survey_ids=("text-token-count",),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under a BPE-ish pre-tokenizer regex (letter runs,
    single digits, single punctuation)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.bpe_ish_token_count(F.col("text")).alias("n_tokens_bpe"))


def _bpe_merges_values_sql() -> str:
    from ..functions.bpe_merges import MERGES

    return ",".join(f"('{a}','{b}',{r})" for r, (a, b) in enumerate(MERGES))


def _text_bpe_exact_tokens_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT BPE token counts under the vendored frozen merge table
    (VERDICT r7 #7): the engine runs the merge loop per DISTINCT word in
    an Arrow batch (``text.bpe_exact_token_count``); the oracle replays
    the IDENTICAL segmentation spec — merge the first occurrence of the
    min-rank adjacent pair until fixpoint — as a DuckDB recursive CTE
    over token LISTS, one merge per recursion step, with the same frozen
    table inlined as VALUES. Different languages, data structures, and
    join shapes; same spec, hash-exact."""
    docs = _t(spark, sf_dir, "documents")
    return text.bpe_exact_token_count(docs)


register(
    "text_bpe_exact_tokens",
    oracle=r"""
WITH RECURSIVE
merges(a, b, rank) AS (VALUES __BPE_MERGES__),
toks AS (
  SELECT d.doc_id, t.tok
  FROM documents d,
       unnest(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS t(tok)
),
words AS (SELECT DISTINCT tok FROM toks),
bpe(tok, ts, done) AS (
  SELECT tok, list_transform(generate_series(1, length(tok)), i -> tok[i]), false FROM words
  UNION ALL
  SELECT tok,
         CASE WHEN bp IS NULL THEN ts
              ELSE ts[1:bp-1] || [ts[bp] || ts[bp+1]] || ts[bp+2:] END,
         bp IS NULL
  FROM (
    SELECT tok, ts,
           (SELECT j FROM unnest(generate_series(1, len(ts)-1)) AS g(j)
              JOIN merges m ON m.a = ts[j] AND m.b = ts[j+1]
              ORDER BY m.rank, j LIMIT 1) AS bp
    FROM bpe WHERE NOT done
  )
),
final AS (SELECT tok, len(ts) AS n FROM bpe WHERE done),
counts AS (
  SELECT t.doc_id, count(*) AS n_pre, sum(f.n) AS nb
  FROM toks t JOIN final f USING (tok) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(c.n_pre, 0)::INT AS n_pretokens,
       coalesce(c.nb, 0)::BIGINT AS n_tokens_bpe
FROM documents d LEFT JOIN counts c USING (doc_id)
""".replace("__BPE_MERGES__", _bpe_merges_values_sql()),
    survey_ids=("text-token-count",),
)(_text_bpe_exact_tokens_impl)


@register(
    "q_rollup",
    oracle="""
SELECT r.r_name, n.n_name, count(*) AS cust_ct
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    survey_ids=("A2",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (region -> nation -> grand total) — subtotal rows
    carry nulls; one pass, partial-agg'd like any groupBy."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("cust_ct"))
    )


@register(
    "q_set_ops",
    oracle="""
WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
SELECT 'union' AS op, count(*) AS user_ct FROM (SELECT user_id FROM p UNION SELECT user_id FROM c)
UNION ALL
SELECT 'intersect', count(*) FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM c)
UNION ALL
SELECT 'except', count(*) FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM c)
""",
    survey_ids=("R1",),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (union / intersect / except) over keyed user sets — the
    inverse of the reference's stream split (SURVEY §2.6)."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    c = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    parts = [
        p.union(c).distinct().agg(F.count(F.lit(1)).alias("user_ct")).select(F.lit("union").alias("op"), "user_ct"),
        p.intersect(c).agg(F.count(F.lit(1)).alias("user_ct")).select(F.lit("intersect").alias("op"), "user_ct"),
        p.exceptAll(c).distinct().agg(F.count(F.lit(1)).alias("user_ct")).select(F.lit("except").alias("op"), "user_ct"),
    ]
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out


@register(
    "q_hopping_window",
    oracle="""
WITH h AS (
  SELECT unnest([time_bucket(INTERVAL '5 seconds', ts),
                 time_bucket(INTERVAL '5 seconds', ts) - INTERVAL '5 seconds']) AS ws,
         value
  FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS stt,
       count(*) AS pv_ct, round(sum(value), 2) AS val_sum
FROM h GROUP BY ws
""",
    survey_ids=("A1", "W1"),
)
def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window — size 10 s, hop 5 s: each event lands in two
    overlapping windows (the reference never uses sliding windows; Spark's
    window(slideDuration) provides them natively, SURVEY §2.8 note)."""
    ev = _t(spark, sf_dir, "events")
    out = ev.groupBy(F.window("ts", "10 seconds", "5 seconds")).agg(
        F.count(F.lit(1)).alias("pv_ct"), F.round(F.sum("value"), 2).alias("val_sum")
    )
    return out.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"), "pv_ct", "val_sum"
    )


@register(
    "q_session_window",
    oracle="""
WITH s AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS st
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT user_id, ts,
         sum(st) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM g GROUP BY user_id, sid
""",
    survey_ids=("W3",),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min inactivity gap) via F.session_window —
    the windowed-aggregation form of sessionization (islands formulation is
    the oracle). A session closes when no event arrives within the gap."""
    ev = _t(spark, sf_dir, "events")
    out = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return out.select(
        "user_id",
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
    )


@register(
    "q_pivot_daily_types",
    oracle="""
SELECT ts::DATE AS cur_date,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view
FROM events GROUP BY 1
""",
    survey_ids=("A2",),
)
def q_pivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily counts per event type as columns (explicit value list so
    the plan is a single pass, no distinct-scan)."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy(F.to_date("ts").alias("cur_date")).pivot("event_type", types).count()
    return out.select("cur_date", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types])


@register(
    "q_percentiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95
FROM events GROUP BY 1
""",
    survey_ids=("A2",),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per key (both engines use the same
    (n-1)*p linear interpolation)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )


_COS_PAIR = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

_IVF_SQL = f"""
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
  ) WHERE rn <= 4
),
s AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
         {_COS_PAIR.format(a='qe.v', b='ne.v')} AS sim
  FROM probes p
  JOIN asg a ON p.cell = a.cell
  JOIN e qe ON qe.vec_id = p.query_id
  JOIN e ne ON ne.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""


_ANN_RECALL_SQL = f"""
WITH bf AS ({_ANN_BRUTE_SQL}),
ivf AS ({_IVF_SQL})
SELECT count(*) AS n_truth,
       sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
       round(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS recall_at_5
FROM bf b LEFT JOIN ivf i
  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
"""


@register("ann_recall_report", oracle=_ANN_RECALL_SQL, survey_ids=("sim-ivf", "sim-brute-cosine"))
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation: recall@5 of the IVF index against the exact
    brute-force ground truth over the same query set — the measurement any
    ANN deployment runs before trusting an index (here on a sample; at
    corpus scale the query subset IS the sample). One left join of two
    (queries x k)-sized frames; the expensive sides are the index/truth
    computations themselves."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    truth = similarity.brute_force_topk(emb, q, k=5).select("query_id", "neighbor_id")
    approx = similarity.ivf_topk(emb, q, k=5, centroid_mod=50, nprobe=4).select(
        "query_id", F.col("neighbor_id").alias("hit_id")
    )
    joined = truth.join(
        approx,
        (truth["query_id"] == approx["query_id"]) & (truth["neighbor_id"] == approx["hit_id"]),
        "left",
    )
    hit = F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
    return joined.agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(hit).alias("n_hit"),
        F.round(F.sum(hit) / F.count(F.lit(1)), 6).alias("recall_at_5"),
    )


_IVF_CELL_STATS_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cen AS (SELECT vec_id AS cid, v AS cv FROM e
        WHERE vec_id % (SELECT greatest(50, CAST(ceil(count(*) / 256.0) AS BIGINT)) FROM e) = 0),
asg AS (
  SELECT vec_id, v, cid AS cell FROM (
    SELECT e.vec_id, e.v, cen.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {{cos}} DESC, cen.cid) AS rn
    FROM e CROSS JOIN cen
  ) WHERE rn = 1
),
sizes AS (SELECT cell, count(*) AS c, count(DISTINCT v) AS dr FROM asg GROUP BY 1)
SELECT count(*) AS n_cells, max(c) AS max_cell, max(dr) AS max_distinct_vecs
FROM sizes
""".format(cos=_COS_PAIR.format(a="e.v", b="cen.cv"))


@register(
    "dedup_semantic_cross_corpus",
    oracle="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ev AS (SELECT vec_id, v FROM e WHERE vec_id % 20 = 0),
tr AS (SELECT vec_id, v FROM e WHERE vec_id % 20 <> 0)
SELECT ev.vec_id AS eval_id, tr.vec_id AS train_id,
       round(list_dot_product(tr.v, ev.v)
             / (sqrt(list_dot_product(tr.v, tr.v)) * sqrt(list_dot_product(ev.v, ev.v))), 6)
         AS sim
FROM tr CROSS JOIN ev
WHERE round(list_dot_product(tr.v, ev.v)
            / (sqrt(list_dot_product(tr.v, tr.v)) * sqrt(list_dot_product(ev.v, ev.v))), 6) >= 0.4
""",
    survey_ids=("dedup-cross", "dedup-semantic"),
)
def dedup_semantic_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic train/eval contamination (r7): embedding-cosine pairs
    BETWEEN the eval slice (vec_id % 20 == 0) and the training rest,
    never within a side — the embedding twin of ``dedup_cross_corpus``.
    The small eval matrix broadcasts; the training corpus streams through
    one Arrow map pass (no shuffle of the big side, no self-join)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cross_corpus_semantic_pairs(
        emb.filter(F.col("vec_id") % 20 != 0),
        emb.filter(F.col("vec_id") % 20 == 0),
        threshold=0.4,
    )


@register("ann_ivf_cell_stats", oracle=_IVF_CELL_STATS_SQL, survey_ids=("sim-ivf",))
def ann_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The no-silent-degradation witness for the IVF family (r7; the ANN
    twin of the dedup bucket-stats entries): cell populations AND
    distinct-vector counts under the same assignment ``ann_ivf`` scores
    with. The scorers collapse byte-identical vectors, so the cost bound
    is ``max_distinct_vecs`` — a fat_cell flood moves only ``max_cell``
    (free), a heterogeneous hot cell moves ``max_distinct_vecs`` (the
    retrain signal). Hash-exact each round on the driver fixtures."""
    return similarity.ivf_cell_stats(_t(spark, sf_dir, "embeddings"))


@register("ann_ivf", oracle=_IVF_SQL, survey_ids=("sim-ivf",), bench=True)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: deterministic centroids (vec_id % mod_eff,
    where mod_eff = max(50, ceil(n/256)) caps the driver-side centroid
    collect at ~256 rows for ANY corpus size), nearest-centroid assignment
    map-side against broadcast centroids, queries probe 4 cells, exact
    cosine within probed cells only. Deterministic end to end, so unlike
    most ANN indexes it carries an exact SQL oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 20 == 0)
    return similarity.ivf_topk(emb, q, k=5, centroid_mod=50, nprobe=4)


_IVF_FILTERED_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
corp AS (SELECT vec_id, v FROM e WHERE label = 1),
cen AS (SELECT vec_id AS cid, v AS cv FROM corp
        WHERE vec_id % (SELECT greatest(10, CAST(ceil(count(*) / 256.0) AS BIGINT)) FROM corp) = 0),
asg AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT c.vec_id, cen.cid,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY {_COS_PAIR.format(a='c.v', b='cen.cv')} DESC, cen.cid) AS rn
    FROM corp c CROSS JOIN cen
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 20 = 0),
probes AS (
  SELECT query_id, cid AS cell FROM (
    SELECT q.query_id, cen.cid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_COS_PAIR.format(a='q.qv', b='cen.cv')} DESC, cen.cid) AS rn
    FROM q CROSS JOIN cen
  ) WHERE rn <= 4
),
s AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
         {_COS_PAIR.format(a='qe.v', b='ne.v')} AS sim
  FROM probes p
  JOIN asg a ON p.cell = a.cell
  JOIN e qe ON qe.vec_id = p.query_id
  JOIN e ne ON ne.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""


@register("ann_ivf_filtered", oracle=_IVF_FILTERED_SQL, survey_ids=("sim-ivf",))
def ann_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search (pre-filter strategy): top-5 among corpus
    vectors with ``label = 1`` only. The predicate is applied to the corpus
    BEFORE index assignment, so it pushes down to the parquet scan and the
    cells are built over exactly the eligible vectors — the approach that
    keeps recall guarantees intact (post-filtering top-k can return fewer
    than k survivors). Queries stay unfiltered."""
    emb = _t(spark, sf_dir, "embeddings")
    corp = emb.filter(F.col("label") == 1)
    q = emb.filter(F.col("vec_id") % 20 == 0)
    return similarity.ivf_topk(corp, q, k=5, centroid_mod=10, nprobe=4)


@register(
    "dwd_trade_order_detail",
    oracle="""
WITH od AS (
  SELECT l_orderkey * 10 + l_linenumber AS id, l_orderkey AS order_id,
         l_partkey AS sku_id, l_extendedprice AS split_total_amount
  FROM lineitem
),
oi AS (SELECT o_orderkey AS id, o_custkey AS user_id, o_orderpriority AS province_id FROM orders),
oda AS (SELECT l_orderkey * 10 + l_linenumber AS order_detail_id,
               l_partkey % 10 AS activity_id
        FROM lineitem WHERE (l_orderkey + l_linenumber) % 5 = 0),
odc AS (SELECT l_orderkey * 10 + l_linenumber AS order_detail_id,
               l_suppkey % 4 AS coupon_id
        FROM lineitem WHERE (l_orderkey + l_linenumber) % 7 = 0)
SELECT od.id, od.order_id, oi.user_id, oi.province_id, od.sku_id,
       od.split_total_amount, oda.activity_id, odc.coupon_id
FROM od
JOIN oi ON od.order_id = oi.id
LEFT JOIN oda ON od.id = oda.order_detail_id
LEFT JOIN odc ON od.id = odc.order_detail_id
""",
    survey_ids=("J1", "J2", "P4", "K3"),
    bench=True,
)
def dwd_trade_order_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship DWD SQL app (DwdTradeOrderDetail.java:99-102): order
    detail INNER JOIN order info + LEFT JOIN activity + LEFT JOIN coupon.
    Flink runs this as three stateful stream joins with 5 s idle-state TTL
    and emits retractions. Activity/coupon sides are synthesized CDC
    projections of lineitem (the fixture has no separate tables).

    r15, examined and kept as-is: a one-scan groupBy(id) +
    collect_list/explode_outer rewrite (the per-id cross product the left
    joins compute — the fixture has 118k duplicate (orderkey, linenumber)
    groups) was prototyped and paired-A/B measured 2.0x SLOWER at sf0.1
    (0.895 → 1.807 s): the full-width fact shuffle + list building +
    triple re-explosion costs far more than the three pruned scans feeding
    broadcast probes, and the joined plan is what AQE can keep adapting at
    scale (id-keyed SMJs with exchange reuse). Reverted; evidence in
    OPTIMIZATION_r15.md."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    od = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("sku_id"),
        F.col("l_extendedprice").alias("split_total_amount"),
    )
    oi = o.select(
        F.col("o_orderkey").alias("oi_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderpriority").alias("province_id"),
    )
    oda = (
        li.filter((F.col("l_orderkey") + F.col("l_linenumber")) % 5 == 0)
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("order_detail_id"),
            (F.col("l_partkey") % 10).alias("activity_id"),
        )
    )
    odc = (
        li.filter((F.col("l_orderkey") + F.col("l_linenumber")) % 7 == 0)
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("odc_id"),
            (F.col("l_suppkey") % 4).alias("coupon_id"),
        )
    )
    return (
        od.join(oi, od["order_id"] == oi["oi_id"])
        .join(oda, od["id"] == oda["order_detail_id"], "left")
        .join(odc, od["id"] == odc["odc_id"], "left")
        .select(
            "id", "order_id", "user_id", "province_id", "sku_id",
            "split_total_amount", "activity_id", "coupon_id",
        )
    )


@register(
    "dws_home_detail_uv",
    oracle="""
SELECT ts::DATE AS cur_date,
       count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS home_uv_ct,
       count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS good_detail_uv_ct
FROM events
WHERE event_type IN ('view', 'click')
GROUP BY 1
""",
    survey_ids=("A3", "W3", "P3"),
)
def dws_home_detail_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The home/good_detail per-page daily-UV app
    (DwsTrafficHomeDetailPageViewWindow.java:71-163: page-id whitelist + two
    per-mid ValueStates): page whitelist filter, per-page exact daily UV —
    conditional distinct counts in one pass."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("view", "click"))
    return ev.groupBy(F.to_date("ts").alias("cur_date")).agg(
        F.count_distinct(F.when(F.col("event_type") == "view", F.col("user_id"))).alias("home_uv_ct"),
        F.count_distinct(F.when(F.col("event_type") == "click", F.col("user_id"))).alias("good_detail_uv_ct"),
    )


@register(
    "q5_region_volume",
    oracle="""
SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
""",
    survey_ids=("J1", "J4"),
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped local-supplier volume: 6-way join with a selective dim
    filter — Catalyst pushes r_name into the region scan and broadcasts the
    fixed-size dim chain; only orders-lineitem exchanges on the fact key.

    r15: dropped the explicit broadcast hints on ``customer`` and
    ``supplier`` — both scale with SF, so a hard hint is a guaranteed
    driver/broadcast-cap blowup at warehouse scale (guide §3.1); at fixture
    scale AQE broadcasts them anyway from their runtime sizes, so the
    executed plan (and the bench number) is unchanged.

    r15 (guide §3 join ordering): the ASIA restriction is applied to
    ``customer`` and ``supplier`` BEFORE their fact joins, as broadcast
    LEFT-SEMI joins against the 5-row nation⋈region chain — the optimizer
    cannot push a dim-chain filter backwards through joins on its own, so
    previously every customer/supplier row shuffled and every joined row
    survived until the final region join; now both dim-fact joins move
    ~1/5 of the rows at any scale.  Semi joins specifically (not inner):
    Catalyst sizes a LeftSemi's output at the LEFT side's estimate, so the
    customer/supplier relations stay broadcast-eligible at fixture scale
    (an inner-join subtree's inflated estimate forced the whole fact spine
    into a SortMergeJoin — measured 1.07 → 1.78 s before this was caught;
    the semi form paired-A/B's at 0.94x of the old tail-filter plan).
    ``n_name`` re-attaches AFTER the 5-group aggregate via the same
    broadcast (nationkey↔name is 1:1, so grouping by key is identical).
    Inner joins commute, so the surviving row set is unchanged."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    asia_n = (
        n.join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            n["n_regionkey"] == r["r_regionkey"],
        )
        .select("n_nationkey", "n_name")
    )
    ca = c.join(
        F.broadcast(asia_n.select(F.col("n_nationkey").alias("_cn"))),
        c["c_nationkey"] == F.col("_cn"),
        "left_semi",
    ).select("c_custkey", "c_nationkey")
    sa = s.join(
        F.broadcast(asia_n.select(F.col("n_nationkey").alias("_sn"))),
        s["s_nationkey"] == F.col("_sn"),
        "left_semi",
    ).select("s_suppkey", "s_nationkey")
    agg = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(ca, o["o_custkey"] == ca["c_custkey"])
        .join(
            sa,
            (li["l_suppkey"] == sa["s_suppkey"]) & (sa["s_nationkey"] == ca["c_nationkey"]),
        )
        .groupBy("c_nationkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return agg.join(
        F.broadcast(asia_n), agg["c_nationkey"] == asia_n["n_nationkey"]
    ).select("n_name", "revenue")


@register(
    "q17_small_quantity",
    oracle="""
SELECT l.l_partkey, round(sum(l.l_extendedprice), 2) AS small_qty_revenue
FROM lineitem l
WHERE l.l_quantity < (
  SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
GROUP BY 1
""",
    survey_ids=("J1", "A2"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped correlated scalar subquery (below-half-average
    quantity).

    r15 (guide §2.4): the correlated avg is a per-``l_partkey`` set property,
    so it is ONE window over a single lineitem scan instead of Catalyst's
    decorrelation (which plans a second full lineitem scan + aggregate +
    self-join — at warehouse scale two fact-sized exchanges and a fact-fact
    join; the fixture plan hid that by broadcasting the aggregate). The final
    per-part rollup rides the window's ``HashPartitioning(l_partkey)``
    shuffle-free, so the whole query is one scan + one fact exchange.

    Numerically identical: ``l_quantity`` is integer-valued, so the window
    avg (exact integer sum / count) equals the decorrelated aggregate under
    any partial ordering, and the comparison cannot flip."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .withColumn("_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("_avg_qty"))
        .groupBy("l_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"))
    )


@register(
    "q10_returned_revenue",
    oracle="""
SELECT c.c_custkey, n.n_name,
       round(sum(round(l.l_extendedprice * (1 - l.l_discount), 6)::DECIMAL(28, 6)), 2)::DOUBLE
         AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    survey_ids=("J1", "A2"),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped: top-20 customers by returned-item revenue — a
    4-way join where the returnflag filter pushes into the lineitem scan,
    nation broadcasts, and the final top-20 plans as TakeOrderedAndProject
    (no global sort materializes). Revenue ties break by custkey so the
    LIMIT is deterministic. Per-row products are summed in DECIMAL (the
    q_salted_agg pattern) so the aggregate is partial-order invariant — a
    double sum could flip a rounded cent and change LIMIT-20 membership.

    Scale shape (VERDICT r4 #3): revenue is pre-aggregated per
    ``l_orderkey`` BEFORE the orders join, so the widest shuffle carries
    distinct returned-order keys (~one row per order) instead of every
    R-flagged line item (~25% of lineitem) — sum is additive over the
    final (custkey, n_name) grouping and the per-row rounding happens
    before either sum, so the rewrite is bit-identical."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).cast("decimal(28,6)")
    pre = li.groupBy("l_orderkey").agg(F.sum(rev).alias("_rev"))
    return (
        pre.join(o, pre["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "n_name")
        .agg(F.round(F.sum("_rev"), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_volume",
    oracle="""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 180
)
SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       round(b.qty, 2) AS total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    survey_ids=("J1", "A2"),
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: large-volume orders (lineitem quantity sum above
    threshold) joined back through orders to the customer — the
    aggregate-then-join composition where the HAVING shrinks the probe side
    to a sliver before any wide row is assembled."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 180)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("_qty"), 2).alias("total_qty"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT order_ct, count(*) AS cust_ct
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS order_ct
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
GROUP BY 1
""",
    survey_ids=("J2", "A2"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped two-level aggregate: orders-per-customer via left
    join (zero-order customers kept), then the distribution of those counts.

    r15 (guide §2.3 "aggregate before you shuffle"): orders pre-aggregate to
    (o_custkey, count) BEFORE the customer join — map-side partials collapse
    ~10 orders/customer to one row, so the join's orders side shuffles ~10x
    fewer rows at any scale, and the post-join per-customer aggregate
    disappears entirely (each customer matches <= 1 pre-agged row;
    ``coalesce(ct, 0)`` keeps the zero-order customers the LEFT join
    manufactures). Counts are integers — bit-identical under regrouping."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    ocnt = o.groupBy("o_custkey").agg(F.count("o_orderkey").alias("_ct"))
    return (
        c.join(ocnt, c["c_custkey"] == ocnt["o_custkey"], "left")
        .select(F.coalesce(F.col("_ct"), F.lit(0)).alias("order_ct"))
        .groupBy("order_ct")
        .agg(F.count(F.lit(1)).alias("cust_ct"))
    )


@register(
    "q_having_big_orders",
    oracle="""
SELECT l_orderkey, count(*) AS li_ct, round(sum(l_quantity), 2) AS qty_sum
FROM lineitem
GROUP BY 1
HAVING count(*) >= 6 AND sum(l_quantity) > 150
""",
    survey_ids=("A2",),
)
def q_having_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING) — filter over aggregates, pushed
    nowhere (semantically), evaluated after partial+final agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("li_ct"),
            F.sum("l_quantity").alias("_qs"),  # HAVING filters the raw sum
        )
        .filter((F.col("li_ct") >= 6) & (F.col("_qs") > 150))
        .select("l_orderkey", "li_ct", F.round(F.col("_qs"), 2).alias("qty_sum"))
    )


@register(
    "dws_keyword_window",
    oracle="""
WITH k AS (
  SELECT ts, 'kw_' || json_extract_string(props, '$.k') AS keyword
  FROM events WHERE event_type = 'view'
),
b AS (
  SELECT time_bucket(INTERVAL '10 seconds', ts) AS w, keyword, count(*) AS keyword_count
  FROM k GROUP BY 1, 2
)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt,
       strftime(w + INTERVAL '10 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
       strftime(w, '%Y-%m-%d') AS cur_date,
       keyword, keyword_count
FROM b
""",
    survey_ids=("A1", "J6", "F13", "P3", "W1"),
)
def dws_keyword_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The traffic-keyword DWS app end to end
    (DwsTrafficSourceKeywordPageViewWindow.java:61-90: search-page filter ->
    keyword extraction/tokenize -> 10 s tumbling window count with stt/edt/
    cur_date): SURVEY §7.2's minimum end-to-end slice, as one query."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    kw = ev.select(
        "ts", F.concat(F.lit("kw_"), json_get(F.col("props"), "k")).alias("keyword")
    )
    return tumble(
        kw, "ts", keys=["keyword"], aggs=[F.count(F.lit(1)).alias("keyword_count")]
    )


# q_approx_aggregates oracle: the deterministic HLL (identical to
# q_hll_sketch's register algebra — see plans/curation.py for the
# derivation) + a fixed-grid histogram median, both pure integer
# arithmetic, so the approximate answers hash-match cross-engine.
from ..operators.sketch import HLL_ALPHA as _Q_HLL_ALPHA

_APPROX_AGG_SQL = f"""
WITH h AS (
  SELECT event_type, {{md5}} AS h
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
est AS (
  SELECT event_type, used_registers,
         {_Q_HLL_ALPHA!r}::DOUBLE * 65536.0 * 9007199254740992.0
           / (used_units + (256 - used_registers) * 9007199254740992)::DOUBLE AS raw
  FROM s
),
uv AS (
  SELECT event_type,
         round(CASE WHEN raw <= 640.0 AND used_registers < 256
                    THEN 256.0 * ln(256.0 / (256 - used_registers))
                    ELSE raw END, 4) AS uv_approx
  FROM est
),
hist AS (
  SELECT event_type, floor(value * 64)::BIGINT AS bin, count(*) AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT event_type, sum(c) AS n FROM hist GROUP BY 1),
cum AS (
  SELECT event_type, bin,
         sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
  FROM hist
),
med AS (
  SELECT c.event_type, min(c.bin) AS mbin
  FROM cum c JOIN tot t ON t.event_type = c.event_type
  WHERE c.cum * 2 >= t.n
  GROUP BY 1
)
SELECT uv.event_type, uv.uv_approx, med.mbin / 64.0 AS p50_approx
FROM uv JOIN med ON med.event_type = uv.event_type
""".format(md5=md5_long_sql_duckdb("user_id::VARCHAR"))


@register("q_approx_aggregates", oracle=_APPROX_AGG_SQL, survey_ids=("A4",))
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the relaxation path SURVEY §2.5 notes the
    reference never takes (its UVs are exact): HLL distinct + histogram-
    sketch median per event_type. r12 (VERDICT r11 #4): was the catalog's
    one rows-only entry (engine-native sketches); now both sketches are
    the engine's own DETERMINISTIC mergeable structures with an exact
    DuckDB oracle — uv via the md5-based HLL register algebra
    (``operators/sketch.py``, max-merge = partition-order invariant) and
    p50 via a fixed-grid histogram (bin = floor(value*64), lower weighted
    median off the per-bin counts): partials merge map-side, the median
    scan runs over the BOUNDED bin histogram, never the rows, so both
    sketches ride ordinary partial aggregation at 100 TB. The exact twins
    (dws_daily_uv, q_percentiles) remain the precision versions; this
    entry is the mergeable-sketch answer with its approximation error
    pinned by the oracle."""
    from ..operators import sketch as _sk

    ev = _t(spark, sf_dir, "events")
    reg = _sk.hll_registers(ev, "event_type", "user_id")
    uv = _sk.hll_estimate(reg, "event_type").select(
        "event_type", F.col("uv_est").alias("uv_approx")
    )
    hist = (
        ev.filter(F.col("value").isNotNull())
        .select("event_type", F.floor(F.col("value") * 64).alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = hist.groupBy("event_type").agg(F.sum("c").alias("n"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            Window.partitionBy("event_type")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    med = (
        cum.join(tot, "event_type")
        .filter(F.col("cum") * 2 >= F.col("n"))
        .groupBy("event_type")
        .agg((F.min("bin") / 64.0).alias("p50_approx"))
    )
    return uv.join(med, "event_type").select(
        "event_type", "uv_approx", "p50_approx"
    )


@register(
    "text_repetition",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
t AS (SELECT doc_id, unnest(t) AS tok FROM toks),
tc AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
ts AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot, count(*) AS dct FROM tc GROUP BY 1),
bt AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bg
  FROM toks WHERE len(t) >= 2
),
bc AS (SELECT doc_id, bg, count(*) AS c FROM bt GROUP BY 1, 2),
bs AS (SELECT doc_id, max(c) AS bmx, sum(c) AS btot FROM bc GROUP BY 1)
SELECT ts.doc_id,
       round(ts.mx::DOUBLE / ts.tot, 6) AS top_token_ratio,
       round(coalesce(bs.bmx::DOUBLE / bs.btot, 0.0), 6) AS top_bigram_ratio,
       round(ts.dct::DOUBLE / ts.tot, 6) AS distinct_token_ratio
FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
""",
    survey_ids=("text-quality",),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition metrics (top-token / top-bigram coverage, distinct-token
    ratio) — the boilerplate/degeneracy filters of quality pipelines."""
    return text.repetition_features(_t(spark, sf_dir, "documents"))


@register(
    "text_pii_scrub",
    oracle="""
WITH synth AS (
  SELECT c_custkey AS doc_id,
         'reach ' || lower(replace(c_name, ' ', '.')) || '@example.com or +1 '
           || (c_custkey * 7919)::VARCHAR || ' ref ' || (c_custkey + 100000)::VARCHAR AS text
  FROM customer
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>', 'g'),
         '[0-9]{5,}', '<NUM>', 'g') AS scrubbed
FROM synth
""",
    survey_ids=("text-quality",),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: synthesize contact lines from customers, replace
    email/phone/long-number substrings with typed placeholders — pure
    codegen'd regexp_replace chain, shuffle-free."""
    c = _t(spark, sf_dir, "customer")
    synth = c.select(
        F.col("c_custkey").alias("doc_id"),
        F.concat(
            F.lit("reach "),
            F.lower(F.replace(F.col("c_name"), F.lit(" "), F.lit("."))),
            F.lit("@example.com or +1 "),
            (F.col("c_custkey") * 7919).cast("string"),
            F.lit(" ref "),
            (F.col("c_custkey") + 100000).cast("string"),
        ).alias("text"),
    )
    return synth.select("doc_id", text.scrub_pii(F.col("text")).alias("scrubbed"))


@register(
    "dwd_dynamic_fact_routing",
    oracle="""
SELECT cfg.sink_table, count(*) AS record_ct
FROM (
  SELECT 'order_info' AS src_table,
         CASE WHEN o_orderkey % 3 = 0 THEN 'update' ELSE 'insert' END AS src_type
  FROM orders
) e
JOIN (VALUES
  ('order_info', 'insert', 'dwd_trade_order_add'),
  ('order_info', 'update', 'dwd_trade_order_change')
) cfg(source_table, source_type, sink_table)
  ON e.src_table = cfg.source_table AND e.src_type = cfg.source_type
GROUP BY 1
""",
    survey_ids=("J5", "R3", "K2"),
)
def dwd_dynamic_fact_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DwdBaseDb's dynamic fact routing (DwdBaseDb.java:100-145): the config
    key is (source_table, source_type) — e.g. the same table's inserts and
    updates land in different sink topics. Broadcast two-key config join;
    the sink_table column then drives the dynamic sink (K2/R3)."""
    o = _t(spark, sf_dir, "orders")
    facts = o.select(
        F.lit("order_info").alias("src_table"),
        F.when(F.col("o_orderkey") % 3 == 0, "update").otherwise("insert").alias("src_type"),
    )
    cfg = spark.createDataFrame(
        [
            ("order_info", "insert", "dwd_trade_order_add"),
            ("order_info", "update", "dwd_trade_order_change"),
        ],
        "source_table string, source_type string, sink_table string",
    )
    routed = facts.join(
        F.broadcast(cfg),
        (facts["src_table"] == cfg["source_table"]) & (facts["src_type"] == cfg["source_type"]),
    )
    return routed.groupBy("sink_table").agg(F.count(F.lit(1)).alias("record_ct"))


_CLUSTER_SQL = f"""
WITH {_SHINGLE_CTE},
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
  WHERE round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) >= 0.35
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT d.doc_id,
       least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
GROUP BY d.doc_id
"""


@register("dedup_clusters", oracle="WITH RECURSIVE " + _CLUSTER_SQL.strip().removeprefix("WITH "), survey_ids=("dedup-minhash-lsh",))
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: connected components over the verified
    MinHash-LSH pair graph via iterative distributed label propagation (the
    'iterative algorithm' class of ops); oracle is a recursive-CTE closure.
    Keep-policy: doc survives iff doc_id == cluster_id."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.35)
    return dedup.dedup_clusters(docs, pairs)


@register(
    "dedup_keep_policy",
    oracle=(
        "SELECT sum(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END)::BIGINT AS kept_ct,\n"
        "       sum(CASE WHEN doc_id = cluster_id THEN 0 ELSE 1 END)::BIGINT AS dropped_ct\n"
        "FROM (WITH RECURSIVE " + _CLUSTER_SQL.strip().removeprefix("WITH ") + ")"
    ),
    survey_ids=("dedup-minhash-lsh",),
)
def dedup_keep_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end of the dedup pipeline a user actually runs: apply the
    keep-one-per-cluster policy (survivor = cluster's smallest doc_id) and
    report how much of the corpus survives. Composes the full chain —
    doc-local MinHash pass -> LSH candidates -> exact verify -> connected
    components -> policy filter — into the number pair the curation job
    logs."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.35)
    clusters = dedup.dedup_clusters(docs, pairs)
    keep = F.when(F.col("doc_id") == F.col("cluster_id"), 1).otherwise(0)
    return clusters.agg(
        F.sum(keep).alias("kept_ct"),
        F.sum(1 - keep).alias("dropped_ct"),
    )


@register(
    "dedup_lsh_incremental",
    oracle="SELECT * FROM (" + _JACCARD_SQL + ") WHERE id_a % 10 < 2 OR id_b % 10 < 2",
    survey_ids=("dedup-minhash-lsh",),
)
def dedup_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of an ingestion batch (docs with doc_id % 10 < 2
    playing "today's crawl") against the already-indexed corpus: per-batch
    work is O(batch + collisions), the indexed text is never re-read, and
    the output is exactly the full-corpus pair set restricted to pairs
    touching the batch — which is what the oracle checks."""
    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 10 < 2)
    idx = dedup.minhash_index(docs.filter(F.col("doc_id") % 10 >= 2))
    return dedup.minhash_lsh_pairs_incremental(new, idx, threshold=0.35)


@register(
    "dedup_span_exact",
    oracle="""
WITH d AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
dn AS (SELECT doc_id, t, len(t) AS n FROM d),
posn AS (SELECT doc_id, n, t, unnest(range(1, n + 1)) AS pos FROM dn),
toks AS (SELECT doc_id, pos, t[pos] AS tok FROM posn),
grams AS (
  SELECT doc_id, pos,
         (('0x' || substr(md5(array_to_string(list_slice(t, pos, pos + 7), ' ')), 1, 15))::BIGINT) AS g
  FROM posn WHERE pos + 7 <= n
),
firsts AS (SELECT g, min(doc_id) AS fdoc FROM grams GROUP BY 1),
fpos AS (
  SELECT gr.g, f.fdoc, min(gr.pos) AS fp
  FROM grams gr JOIN firsts f ON gr.g = f.g AND gr.doc_id = f.fdoc
  GROUP BY 1, 2
),
dups AS (
  SELECT gr.doc_id, gr.pos
  FROM grams gr JOIN fpos f ON gr.g = f.g
  WHERE gr.doc_id <> f.fdoc OR gr.pos <> f.fp
),
cov0 AS (SELECT doc_id, unnest(range(pos, pos + 8)) AS cpos FROM dups),
cov AS (SELECT DISTINCT doc_id, cpos FROM cov0),
kept AS (
  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text, count(*) AS kept_ct
  FROM toks t
  WHERE NOT EXISTS (SELECT 1 FROM cov c WHERE c.doc_id = t.doc_id AND c.cpos = t.pos)
  GROUP BY 1
)
SELECT dn.doc_id, coalesce(k.clean_text, '') AS clean_text,
       (dn.n - coalesce(k.kept_ct, 0))::BIGINT AS removed_tokens
FROM dn LEFT JOIN kept k ON dn.doc_id = k.doc_id
""",
    survey_ids=("dedup-span",),
)
def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span (word-8-gram) removal: boilerplate repeated
    across documents is deleted from every copy except its first corpus-wide
    occurrence — the substring-level dedup that document-level near-dup
    passes can't express. Gram election and join both key on a 60-bit gram
    hash; see ``dedup.duplicate_span_removal`` for the shuffle story."""
    return dedup.duplicate_span_removal(_t(spark, sf_dir, "documents"), width=8)


@register(
    "dedup_keep_best",
    oracle=(
        """
SELECT cluster_id, keep_id, keep_n_chars FROM (
  SELECT c.cluster_id, c.doc_id AS keep_id, d.n_chars AS keep_n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id) AS rn
  FROM (WITH RECURSIVE """
        + _CLUSTER_SQL.strip().removeprefix("WITH ")
        + """) c
  JOIN documents d ON d.doc_id = c.doc_id
) WHERE rn = 1
"""
    ),
    survey_ids=("dedup-minhash-lsh",),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST-per-cluster: real curation keeps the highest-quality
    member of each near-dup cluster, not the smallest id — here the
    longest document (n_chars, id tie-break). Composes the full chain
    (MinHash pass -> LSH candidates -> exact verify -> connected
    components) with a per-cluster arg-max, which plans as
    WindowGroupLimit on the cluster key. Output: one row per cluster
    (cluster_id, keep_id, keep_n_chars)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.35)
    clusters = dedup.dedup_clusters(docs, pairs)
    # keep-best is an argmax (max n_chars, tie -> min doc_id): the
    # partial-agg max_by collapses a boilerplate mega-cluster map-side
    # instead of sorting it in one task (same rewire as VERDICT r9 #1)
    return (
        clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max_by(
                F.struct(F.col("doc_id"), F.col("n_chars")),
                F.struct(F.col("n_chars"), -F.col("doc_id")),
            ).alias("_best")
        )
        .select(
            "cluster_id",
            F.col("_best.doc_id").alias("keep_id"),
            F.col("_best.n_chars").alias("keep_n_chars"),
        )
    )


@register(
    "dws_traffic_vc_ch_ar_isnew",
    oracle="""
WITH e AS (
  SELECT user_id, ts, value,
         'v' || (user_id % 3)::VARCHAR AS vc,
         CASE user_id % 4 WHEN 0 THEN 'appstore' WHEN 1 THEN 'xiaomi'
                          WHEN 2 THEN 'huawei' ELSE 'web' END AS ch,
         (110000 + user_id % 5)::VARCHAR AS ar,
         floor(value * 100)::BIGINT AS dur
  FROM events
),
f AS (
  SELECT *,
         CASE WHEN ts::DATE = min(ts::DATE) OVER (PARTITION BY user_id)
              THEN '1' ELSE '0' END AS is_new,
         CASE WHEN row_number() OVER (PARTITION BY user_id, ts::DATE ORDER BY ts) = 1
              THEN 1 ELSE 0 END AS uv,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS sv
  FROM e
),
b AS (
  SELECT time_bucket(INTERVAL '10 seconds', ts) AS w, vc, ch, ar, is_new,
         sum(uv)::BIGINT AS uv_ct, sum(sv)::BIGINT AS sv_ct,
         count(*) AS pv_ct, sum(dur)::BIGINT AS dur_sum
  FROM f GROUP BY 1, 2, 3, 4, 5
)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt,
       strftime(w + INTERVAL '10 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
       strftime(w, '%Y-%m-%d') AS cur_date,
       vc, ch, ar, is_new, uv_ct, sv_ct, pv_ct, dur_sum
FROM b
""",
    survey_ids=("A2", "W2", "W3", "F9"),
    bench=True,
)
def dws_traffic_vc_ch_ar_isnew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's richest DWS table
    (DwsTrafficVcChArIsNewPageViewWindow.java:70-189): version/channel/area/
    is_new keyed 10 s windows carrying uv_ct (daily-first flag, W3), sv_ct
    (session starts), pv_ct and dur_sum — three keyed-state operators feeding
    one keyed window reduce, all in a single declarative plan: the analytic
    windows share one shuffle on user_id, then the tumble aggregates.

    Dimensions vc/ch/ar are deterministic functions of user_id (the fixture
    stream carries no device metadata); is_new via first-seen repair (W2)."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "ts", "value",
        F.concat(F.lit("v"), (F.col("user_id") % 3)).alias("vc"),
        F.element_at(
            F.array(F.lit("appstore"), F.lit("xiaomi"), F.lit("huawei"), F.lit("web")),
            (F.col("user_id") % 4 + 1).cast("int"),
        ).alias("ch"),
        (F.lit(110000) + F.col("user_id") % 5).cast("string").alias("ar"),
        (F.col("value") * 100).cast("long").alias("dur"),
    )
    # Skew-safe ADAPTIVE repair stage (VERDICT r9 #2): the reference keeps
    # ONE scalar of state per mid and never sorts a mid's history
    # (DwsTrafficVcChArIsNewPageViewWindow.java:136-148). mode="auto"
    # keeps the one-window plan while the input is provably safe
    # (<= 500k rows: worst key <= total), and switches to the per-(user,
    # day) partial-agg + two_phase_shift decomposition before any mid
    # COULD be hot — the sessionize recipe. Both shapes oracle-green;
    # forced-mode equivalence is property-tested and plan-locked.
    f = state.traffic_repair_flags(e, mode="auto")
    return tumble(
        f,
        "ts",
        keys=["vc", "ch", "ar", "is_new"],
        aggs=[
            F.sum("uv").alias("uv_ct"),
            F.sum("sv").alias("sv_ct"),
            F.count(F.lit(1)).alias("pv_ct"),
            F.sum("dur").alias("dur_sum"),
        ],
    )


@register(
    "dwd_trade_cart_add",
    oracle="""
WITH cdc AS (
  SELECT l_orderkey * 10 + l_linenumber AS id,
         CASE WHEN l_linenumber % 3 = 0 THEN 'update' ELSE 'insert' END AS type,
         l_quantity::BIGINT AS new_num,
         CASE WHEN l_linenumber % 3 = 0 AND l_orderkey % 2 = 0
              THEN l_quantity::BIGINT - 2 END AS old_num
  FROM lineitem
)
SELECT id,
       CASE WHEN type = 'insert' THEN new_num ELSE new_num - old_num END AS sku_num
FROM cdc
WHERE type = 'insert'
   OR (type = 'update' AND old_num IS NOT NULL AND new_num > old_num)
""",
    survey_ids=("P5", "P4", "F6", "F7"),
)
def dwd_trade_cart_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cart-add DWD app's update-delta predicate (DwdTradeCartAdd.java:
    57-78): keep inserts, and updates only when sku_num increased; emitted
    quantity is the full count on insert, the delta on update (the IF(...)
    at :64). CDC rows synthesized from lineitem with an ``old`` map."""
    from ..operators.etl import update_delta_predicate

    li = _t(spark, sf_dir, "lineitem")
    cdc = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.when(F.col("l_linenumber") % 3 == 0, "update").otherwise("insert").alias("type"),
        F.create_map(F.lit("sku_num"), F.col("l_quantity").cast("long").cast("string")).alias("data"),
        F.when(
            (F.col("l_linenumber") % 3 == 0) & (F.col("l_orderkey") % 2 == 0),
            F.create_map(F.lit("sku_num"), (F.col("l_quantity").cast("long") - 2).cast("string")),
        ).alias("old"),
    )
    kept = cdc.filter(update_delta_predicate("sku_num", new_gt_old=True))
    return kept.select(
        "id",
        F.when(
            F.col("type") == "insert", F.col("data")["sku_num"].cast("bigint")
        ).otherwise(
            F.col("data")["sku_num"].cast("bigint") - F.col("old")["sku_num"].cast("bigint")
        ).alias("sku_num"),
    )


@register(
    "q_order_limit",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    survey_ids=("A2",),
)
def q_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (TakeOrderedAndProject — per-partition top-N then
    merge on the driver, never a full global sort)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "scalar_string_project",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS uname,
       substr(c_name, 1, 8) AS prefix8,
       length(c_name) AS name_len,
       CASE WHEN c_name LIKE '%001%' THEN 1 ELSE 0 END AS has_001,
       strpos(c_name, '#') AS hash_pos,
       replace(c_mktsegment, 'A', '_') AS seg_repl,
       lpad(c_custkey::VARCHAR, 8, '0') AS padded_id,
       reverse(c_mktsegment) AS seg_rev,
       split_part(c_name, '#', 2) AS name_num
FROM customer
""",
    survey_ids=("F6", "F9"),
)
def scalar_string_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (upper/substr/length/like/instr/replace/
    lpad/reverse/split_part) — all codegen'd, shuffle-free."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.length("c_name").alias("name_len"),
        F.when(F.col("c_name").like("%001%"), 1).otherwise(0).alias("has_001"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.replace(F.col("c_mktsegment"), F.lit("A"), F.lit("_")).alias("seg_repl"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_id"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
    )


@register(
    "q_null_semantics",
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS maybe_price,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS maybe_prio
  FROM orders
)
SELECT o_orderkey,
       coalesce(maybe_price, -1.0) AS price_or_default,
       CASE WHEN maybe_price IS NULL THEN 'missing' ELSE 'present' END AS price_state,
       nullif(maybe_prio, '1-URGENT') AS prio_no_urgent,
       (maybe_prio IS NOT DISTINCT FROM NULL)::INT AS prio_null_safe_eq
FROM t
""",
    survey_ids=("P1", "F7"),
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: coalesce / nullif / null-safe equality — the
    defensive-null patterns the reference hand-codes around fastjson
    (DwdBaseLog.java:226-233)."""
    o = _t(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, None).otherwise(F.col("o_totalprice")).alias("maybe_price"),
        F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("o_orderpriority")).alias("maybe_prio"),
    )
    return t.select(
        "o_orderkey",
        F.coalesce(F.col("maybe_price"), F.lit(-1.0)).alias("price_or_default"),
        F.when(F.col("maybe_price").isNull(), "missing").otherwise("present").alias("price_state"),
        F.nullif(F.col("maybe_prio"), F.lit("1-URGENT")).alias("prio_no_urgent"),
        F.col("maybe_prio").eqNullSafe(F.lit(None).cast("string")).cast("int").alias("prio_null_safe_eq"),
    )


@register(
    "q_range_bucket_join",
    oracle="""
WITH f AS (
  SELECT date_diff('day', DATE '2024-01-01', ts::DATE) AS d, value FROM events
),
p(promo_id, lo, hi) AS (
  VALUES (1, 0, 10), (2, 5, 15), (3, 7, 8), (4, 12, 30),
         (5, 0, 30), (6, 20, 25), (7, 18, 28), (8, 3, 4)
)
SELECT promo_id, count(*) AS ev_ct,
       round(sum(round(value, 6)::DECIMAL(28, 6)), 2)::DOUBLE AS val_sum
FROM f JOIN p ON f.d >= p.lo AND f.d < p.hi
GROUP BY 1
""",
    survey_ids=("J3",),
)
def q_range_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join against OVERLAPPING promo windows via the
    band-join decomposition (``joins.range_bucket_join``): without it Spark
    plans a nested-loop join (no equality conjunct); with it the plan is a
    bucket equi-join + exact re-check. DECIMAL partial sums keep the
    per-promo value total order-invariant."""
    from ..operators.joins import range_bucket_join

    ev = _t(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("d"),
        F.round(F.col("value"), 6).cast("decimal(28,6)").alias("value"),
    )
    promos = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 15), (3, 7, 8), (4, 12, 30),
         (5, 0, 30), (6, 20, 25), (7, 18, 28), (8, 3, 4)],
        "promo_id int, lo int, hi int",
    )
    joined = range_bucket_join(ev, promos, "d", "lo", "hi", bucket_width=7)
    return joined.groupBy("promo_id").agg(
        F.count(F.lit(1)).alias("ev_ct"),
        F.round(F.sum("value"), 2).cast("double").alias("val_sum"),
    )


@register(
    "q_salted_agg",
    oracle="""
SELECT event_type, count(*) AS ev_ct,
       round(sum(round(value, 6)::DECIMAL(28, 6)), 2)::DOUBLE AS val_sum
FROM events GROUP BY 1
""",
    survey_ids=("skew-tools",),
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-grouping-key mitigation: events has only a handful of event_type
    values, the classic shape where ONE reducer per key absorbs the whole
    table. The salted two-phase aggregate spreads each hot key over 16
    reducers and merges partials. Partial sums run in DECIMAL so the result
    is exactly salt-order-invariant (double addition is not associative, and
    the salted merge order necessarily differs from the oracle's plain
    GROUP BY order)."""
    from ..operators.skew import salted_aggregate

    dec = F.round(F.col("value"), 6).cast("decimal(28,6)")
    ev = _t(spark, sf_dir, "events").withColumn("value", dec)
    return salted_aggregate(
        ev,
        ["event_type"],
        phase1=[F.count(F.lit(1)).alias("_c"), F.sum("value").alias("_s")],
        phase2=[
            F.sum("_c").alias("ev_ct"),
            F.round(F.sum("_s"), 2).cast("double").alias("val_sum"),
        ],
    ).select("event_type", "ev_ct", "val_sum")


@register(
    "q_salted_join",
    oracle="""
SELECT tier, count(*) AS ev_ct
FROM events e
JOIN (VALUES ('view', 'free'), ('click', 'free'), ('signup', 'free'),
             ('purchase', 'paid'), ('error', 'ops')) t(event_type, tier)
  ON e.event_type = t.event_type
GROUP BY 1
""",
    survey_ids=("skew-tools",),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-equi-join mitigation: every events row carries one of five
    event_type values, so an unsalted shuffle join lands each key on a
    single task. The salted form replicates the 5-row dim across 8 salts
    and joins on (key, salt) — each hot key fans over 8 tasks. Join output
    is aggregated per tier; salt-invariant, so the oracle is the plain
    join + GROUP BY."""
    from ..operators.skew import salted_join_hint

    ev = _t(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("view", "free"), ("click", "free"), ("signup", "free"),
         ("purchase", "paid"), ("error", "ops")],
        "event_type string, tier string",
    )
    joined = salted_join_hint(ev, tiers, "event_type", salt_buckets=8)
    return joined.groupBy("tier").agg(F.count(F.lit(1)).alias("ev_ct"))


@register(
    "q_cube_counts",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS order_ct
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    survey_ids=("A2",),
)
def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations (status x priority, each alone,
    grand total) in one pass."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("order_ct"))


@register(
    "q_rolling_avg",
    oracle="""
WITH daily AS (
  SELECT o_orderdate::DATE AS d, round(sum(o_totalprice), 2) AS rev
  FROM orders GROUP BY 1
)
SELECT d, rev,
       round(avg(rev) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS rev_7d_avg
FROM daily
""",
    survey_ids=("A2",),
)
def q_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAMES: 7-day moving average over daily revenue (rows-based
    frame) — the analytic-frame surface the reference lacks entirely."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select("d", "rev", F.round(F.avg("rev").over(w), 4).alias("rev_7d_avg"))


@register(
    "text_token_rarity",
    oracle="""
WITH toks AS (
  SELECT DISTINCT d.doc_id, t.tok
  FROM documents d,
       unnest(list_filter(regexp_split_to_array(trim(d.text), '\\s+'), x -> x <> '')) AS t(tok)
),
dfreq AS (SELECT tok, count(*) AS df FROM toks GROUP BY 1)
SELECT t.doc_id, count(*) AS n_distinct_tokens,
       min(f.df) AS min_df,
       round(quantile_cont(f.df, 0.5), 1) AS median_df
FROM toks t JOIN dfreq f ON t.tok = f.tok
GROUP BY 1
""",
    survey_ids=("text-rarity",),
)
def text_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token-rarity profile (min / median corpus document
    frequency) — the deterministic integer-space stand-in for an n-gram-LM
    surprisal filter; see ``text.token_rarity``."""
    return text.token_rarity(_t(spark, sf_dir, "documents"))


@register(
    "q_window_funcs",
    oracle="""
SELECT event_id, event_type,
       lag(event_id) OVER w AS prev_id,
       lead(event_id, 1, -1) OVER w AS next_id_or_default,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM events
WHERE event_type IN ('purchase', 'signup')
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
""",
    survey_ids=("A2",),
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-function surface — lag/lead (with default), ntile,
    percent_rank, cume_dist — WITHOUT the raw ``PARTITION BY event_type``
    window whose parallelism is capped at n_types at any scale (VERDICT r8
    #1, the last raw per-key-window plan): lag/lead come from
    skew.two_phase_shift and ntile/percent_rank/cume_dist are pure
    arithmetic on (skew.two_phase_rank, per-key count). The (ts, event_id)
    order is total (no ties), so percent_rank = (rank-1)/(n-1), cume_dist
    = rank/n, and ntile(k) follows Spark's size rule — the first n%k tiles
    hold n÷k+1 rows — in exact integer ``div`` arithmetic. mode="auto"
    resolves to the plain window at fixture scale and to hourly-bucketed
    decomposition past the safety bound, where a hot type's sort spreads
    over its time buckets instead of one task."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    base = ev.select("event_id", "event_type", "ts")
    shifted = skew.two_phase_shift(
        base,
        key="event_type",
        order_by=["ts", "event_id"],
        value_cols=["event_id"],
        bucket=skew.hour_bucket("ts"),
        direction="lag",
        suffix="_prev",
        mode="auto",
    )
    shifted = skew.two_phase_shift(
        shifted,
        key="event_type",
        order_by=["ts", "event_id"],
        value_cols=["event_id"],
        bucket=skew.hour_bucket("ts"),
        direction="lead",
        suffix="_next",
        mode="auto",
    )
    with_o = shifted.withColumn(
        "_o", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    ranked = skew.two_phase_rank(
        with_o,
        "event_type",
        "_o",
        "event_id",
        bucket_width=3_600_000_000,
        rank_col="_r",
        mode="auto",
    )
    n = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.join(F.broadcast(n), "event_type")
        .select(
            "event_id",
            "event_type",
            F.col("event_id_prev").alias("prev_id"),
            F.coalesce(F.col("event_id_next"), F.lit(-1)).alias(
                "next_id_or_default"
            ),
            F.expr(
                "CASE WHEN _r <= (_n % 4) * ((_n div 4) + 1)"
                " THEN (_r + (_n div 4)) div ((_n div 4) + 1)"
                " ELSE (_n % 4)"
                "  + (_r - (_n % 4) * ((_n div 4) + 1) + (_n div 4) - 1)"
                "    div (_n div 4)"
                " END"
            ).cast("int").alias("quartile"),
            F.round(
                F.when(
                    F.col("_n") > 1, (F.col("_r") - 1) / (F.col("_n") - 1)
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("pct_rank"),
            F.round(F.col("_r") / F.col("_n"), 6).alias("cume"),
        )
    )


@register(
    "q_array_agg_top_customers",
    oracle="""
SELECT n.n_name,
       (list(c.c_custkey ORDER BY c.c_acctbal DESC, c.c_custkey))[:3] AS top_custkeys
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
""",
    survey_ids=("A2", "F8"),
)
def q_array_agg_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: per nation, the 3 highest-balance customer
    keys as an array column. collect_list is order-nondeterministic, so the
    deterministic form collects sortable structs, array_sorts, slices, and
    projects — all JVM-side array expressions."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct((-F.col("c_acctbal")).alias("nb"), F.col("c_custkey").alias("k")))
                    ),
                    1, 3,
                ),
                lambda s: s["k"],
            ).alias("top_custkeys")
        )
    )


