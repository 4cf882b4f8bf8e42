"""Warehouse layout: z-order clustering (sources/warehouse.py).

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


# =========================================================================
# Warehouse layout: z-order clustering (sources/warehouse.py)
# =========================================================================

from ..sources.warehouse import zorder_value, zorder_value_sql  # noqa: E402

_ZORDER_SQL = f"""
WITH e AS (
  SELECT event_id,
         (event_id % 256)::INT AS zx,
         (floor(value)::INT % 256) AS zy
  FROM events
)
SELECT event_id, ({zorder_value_sql(["zx", "zy"], bits=8)})::BIGINT AS zval
FROM e
"""


@register("q_zorder_values", oracle=_ZORDER_SQL, survey_ids=("warehouse-zorder",))
def q_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values over two 8-bit event dimensions, as one closed-form
    codegen expression (32 shift/mask terms, no UDF) — the clustering key
    ``write_zordered`` range-partitions and sorts by so that parquet
    min/max stats prune on EITHER dimension.  The oracle runs the
    bit-identical expression (generated from the same positions table) in
    DuckDB — an engine-vs-engine check of the interleaving itself."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        (F.col("event_id") % 256).cast("int").alias("zx"),
        (F.floor("value").cast("int") % 256).alias("zy"),
    )
    return e.select("event_id", zorder_value(["zx", "zy"], bits=8).alias("zval"))


@register(
    "text_chunking",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
d AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
c AS (
  SELECT doc_id, n, unnest(range(0, 1 + ceil(greatest(n - 64, 0) / 48.0)::INT)) AS chunk_id, t
  FROM d
)
SELECT doc_id, chunk_id,
       array_to_string(list_slice(t, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ') AS chunk_text,
       least(64, n - chunk_id * 48)::BIGINT AS chunk_tokens
FROM c
""",
    survey_ids=("text-chunking",),
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (64-token chunks, stride 48):
    the map-side explode that turns documents into training-window-sized
    pieces.  Chunk boundaries are pure arithmetic over the token array, so
    the whole operator is codegen and shuffle-free."""
    return text.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    ).select("doc_id", "chunk_id", "chunk_text", "chunk_tokens")


@register(
    "text_pack_sequences",
    oracle="""
WITH d AS (
  SELECT lang, doc_id,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens
  FROM documents
)
SELECT lang, doc_id, n_tokens,
       (coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 256) AS bin_id
FROM d
""",
    survey_ids=("text-packing",),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing, sharded by language: within each
    lang shard, doc-id-ordered prefix sums of token counts assign
    consecutive documents to ~256-token training bins ((lang, bin_id) is
    the sequence key) — the order-preserving batch form of greedy packing.
    Sharding keeps the ordered window distributed: one hash shuffle on
    lang, per-shard sorts, no single-partition bottleneck."""
    return text.pack_sequences(
        _t(spark, sf_dir, "documents"), cap_tokens=256, shard_col="lang"
    )


@register(
    "corpus_mix_report",
    oracle="""
WITH d AS (
  SELECT source, lang,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens
  FROM documents
)
SELECT source, lang, count(*) AS docs, sum(n_tokens)::BIGINT AS tokens,
       round(sum(n_tokens) / (SELECT sum(n_tokens) FROM d), 6) AS token_share
FROM d GROUP BY 1, 2
""",
    survey_ids=("corpus-mix",),
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: docs and token totals per (source, lang)
    with each cell's share of all tokens — the data-governance summary every
    curation run publishes.  One grouped aggregate plus a scalar total
    (computed as an unpartitioned window over the tiny grouped frame, not
    over the corpus)."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "source", "lang", text.token_count(F.col("text")).alias("n_tokens")
    )
    g = per.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens")
    )
    total = Window.partitionBy()
    return g.select(
        "source", "lang", "docs", "tokens",
        F.round(F.col("tokens") / F.sum("tokens").over(total), 6).alias("token_share"),
    )


@register(
    "text_quality_model",
    oracle="""
WITH f AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
               / greatest(length(text), 1), 6) AS punct_ratio,
         round(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
               x -> list_contains(['the','a','of','and','to','in','is','it'], x)))::DOUBLE
               / greatest(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')), 1), 6)
               AS stopword_ratio,
         round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               / greatest(length(text), 1), 6) AS alpha_ratio,
         round(length(text) / greatest(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
               x -> x <> '')), 1), 6) AS chars_per_token
  FROM documents
),
s AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-(-2.0 + 0.8 * ln(1 + n_tokens)
           + 3.0 * stopword_ratio + 1.5 * alpha_ratio
           - 4.0 * punct_ratio - 0.1 * chars_per_token))), 6) AS quality_score
  FROM f
)
SELECT doc_id, quality_score, quality_score >= 0.5 AS keep FROM s
""",
    survey_ids=("text-quality-model",),
)
def text_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate: logistic score over the heuristic feature
    set with fixed documented weights (the classifier-filter shape of a
    curation pipeline), computed as one codegen'd expression — the oracle
    recomputes the identical linear form + sigmoid in DuckDB."""
    return text.quality_model_score(_t(spark, sf_dir, "documents"))


@register(
    "text_extract_structured",
    oracle="""
SELECT doc_id,
       regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') AS emails,
       regexp_extract_all(text, '\\+?[0-9][0-9()\\- ]{7,}[0-9]') AS phones,
       regexp_extract_all(text, '[0-9]{5,}') AS numbers,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::INT AS n_emails,
       len(regexp_extract_all(text, '\\+?[0-9][0-9()\\- ]{7,}[0-9]'))::INT AS n_phones,
       len(regexp_extract_all(text, '[0-9]{5,}'))::INT AS n_numbers
FROM documents
""",
    survey_ids=("text-extract",),
)
def text_extract_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured extraction (the PII scrub's inverse): emails, phone-shaped
    spans, and long numbers pulled out as typed array columns with counts —
    the regex-table extraction pass, shuffle-free map-side."""
    return text.extract_structured(_t(spark, sf_dir, "documents"))


@register(
    "text_vocab_topk",
    oracle="""
WITH t AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS tok
  FROM documents
),
per_doc AS (SELECT tok, doc_id, count(*) AS tf FROM t GROUP BY 1, 2),
freq AS (SELECT tok, count(*) AS df, sum(tf)::BIGINT AS tf_total FROM per_doc GROUP BY 1)
SELECT tok, df, tf_total, row_number() OVER (ORDER BY df DESC, tok) AS rank
FROM freq
ORDER BY df DESC, tok
LIMIT 100
""",
    survey_ids=("text-vocab",),
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-100 tokens by document frequency (tie by
    token) with total term frequency — the df table tokenizer/tf-idf
    passes build first.  The exploded (token, doc) pairs map-side combine
    before shuffling, and the top-k is a TakeOrdered over the token table,
    not a global sort."""
    return text.vocab_topk(_t(spark, sf_dir, "documents"), k=100)


