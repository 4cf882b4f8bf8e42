"""The query catalog: every implemented capability as (Spark plan, DuckDB oracle).

Each entry re-expresses one operator row of SURVEY.md §2 (reference file:line
cited per query) — or one of the beyond-reference training-data operators —
over the driver's fixture tables. The Spark side is the engine; the ``oracle``
is an independent ANSI-SQL formulation DuckDB runs on the same parquet for the
correctness gate (row count + schema + order-insensitive value hash).

Determinism rules (both sides, so hashes match):
- every computed float is ``round(x, n)`` with identical expression shape and
  summation order;
- hashes are md5-derived (``functions.md5_long``) — reproducible in SQL;
- rankings order by the *rounded* score with an id tie-break;
- timestamps stay naive wall-clock (timestamp_ntz == DuckDB TIMESTAMP).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import (
    date_to_ts,
    json_get,
    json_map,
    md5_long,
    md5_long_sql_duckdb,
    ts_to_date,
    ts_to_datetime,
    ts_to_partition,
)
from ..operators import dedup, graph, multimodal, similarity, sketch, skew, state, text
from ..operators.etl import cdc_project, etl_db_stream
from ..operators.joins import (
    config_router_join,
    interval_join,
    lateral_tokens,
    lookup_join,
)
from ..operators.windows import daily_distinct_count, tumble
from ..sources.fixtures import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ids: tuple[str, ...] = ()
    bench: bool = False


CATALOG: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    survey_ids: tuple[str, ...] = (),
    bench: bool = False,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in CATALOG:
            raise ValueError(
                f"catalog entry {name!r} registered twice — rename one "
                "(a silent overwrite shadows the earlier oracle)"
            )
        CATALOG[name] = QuerySpec(name, fn, oracle, survey_ids, bench)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None}


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in CATALOG.items() if spec.bench}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)



# =========================================================================
# Entry families — split from this file in r9 (VERDICT r7 #6). Importing
# each module registers its section's queries into CATALOG, in the same
# order the single file defined them. The shared oracle-SQL helpers a few
# modules exchange are re-exported here so external importers
# (plans/curation.py, tests) keep their stable import path.
# =========================================================================

from . import gmall_stream  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import extended  # noqa: E402,F401
from . import dwd_apps  # noqa: E402,F401
from . import sampling_splits  # noqa: E402,F401
from . import merge_scd2  # noqa: E402,F401
from . import warehouse_layout  # noqa: E402,F401
from . import scoring_rank  # noqa: E402,F401
from . import analytics_suite  # noqa: E402,F401

from .pipeline import _SHINGLE_CTE  # noqa: E402,F401
from .extended import _COS_PAIR  # noqa: E402,F401
from .scoring_rank import _pq_sub_dist_sql  # noqa: E402,F401
