"""Catalog smoke + oracle spot checks at sf0.001 (full oracle sweep lives in
tools/verify_oracle.py and the driver's own gate)."""

from __future__ import annotations

import duckdb
import pytest

from flink_gmall2024_realtime_spark.plans import CATALOG
from flink_gmall2024_realtime_spark.sources.fixtures import TABLES, table_path

# Queries worth re-checking value-for-value in CI (cover each operator family).
ORACLE_SPOT = [
    "dws_tumble_type_counts",
    "dwd_interval_join",
    "dedup_minhash_lsh",
    "ann_brute_force",
    "k3_upsert_final_state",
    "scalar_time_project",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_catalog_query_runs(spark, sf_dir, name):
    spec = CATALOG[name]
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
    assert df.columns  # stable, non-empty schema


@pytest.mark.parametrize("name", ORACLE_SPOT)
def test_oracle_spot_match(spark, sf_dir, duck, name):
    spec = CATALOG[name]
    sdf = spec.spark(spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(row[c]) for c in scols) for row in sdf.collect()
    )
    res = duck.execute(spec.oracle)
    ocols_raw = [d[0] for d in res.description]
    order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    orows = sorted(tuple(str(r[i]) for i in order) for r in res.fetchall())
    assert scols == sorted(ocols_raw)
    assert srows == orows
