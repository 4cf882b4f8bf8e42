"""Benchmark harness: runs the headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is fully materialized via a sum of xxhash64 over every output
column (no collect of payload rows — we measure engine wall-clock, not driver
serialization). A plain count() would let Catalyst prune unused projections,
so map-only queries would measure the parquet scan instead of the feature
computation; hashing every column forces the full result to be computed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_gmall2024_realtime_spark.plans import CATALOG
from flink_gmall2024_realtime_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("gmall-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    def materialize(df) -> None:
        # bit_xor, not sum: ANSI mode (Spark 4 default) raises on long overflow
        df.select(F.xxhash64(*df.columns).alias("_h")).agg(F.bit_xor("_h")).collect()

    bench = {name: spec for name, spec in CATALOG.items() if spec.bench}
    # warm the JVM/codegen path once on the smallest query, and the Python
    # worker pool once (mapInPandas queries would otherwise bill the spawn)
    materialize(next(iter(bench.values())).spark(spark, sf_dir))
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    # Three passes, report the per-query min: pass 1 pays JIT/codegen
    # compilation (the local[32] JVM is cold; a long-running cluster is
    # not), later passes are the steady-state engine speed we are actually
    # optimizing — and the min also rides out this VM's ±20-30% background
    # load bursts (documented in BASELINE.md), which otherwise dominate
    # same-code run-to-run deltas at sf0.1.
    timings: dict[str, float] = {}
    for _ in range(3):
        for name, spec in sorted(bench.items()):
            t0 = time.perf_counter()
            materialize(spec.spark(spark, sf_dir))
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
