"""Query plans: the engine's capability catalog.

``catalog.CATALOG`` maps every implemented operator/query (SURVEY.md §2 plus
the training-data-pipeline extensions) to a Spark DataFrame builder and, where
SQL-expressible, an exact DuckDB oracle. ``__spark_entry__.py`` and
``bench.py`` are thin views over this registry.
"""

from .catalog import CATALOG, QuerySpec, bench_queries, oracle_sql, queries
from . import tpch  # noqa: F401  — registers the TPC-H completion queries
from . import curation  # noqa: F401  — registers the curation-pipeline additions

__all__ = ["CATALOG", "QuerySpec", "queries", "oracle_sql", "bench_queries"]
