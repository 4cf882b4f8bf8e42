"""Dump .explain("formatted") for named catalog queries to plans/r16/.

Usage: PYTHONPATH=/root/repo python3 tools/dump_plans_r16.py <suffix> <query> [query ...]
  suffix: "before" or "after"
Optional env SPARK_GRAFT_SF_DIR selects the fixture (default sf0.1 — the
bench scale, so plan shapes match what the driver measures).
"""

from __future__ import annotations

import os
import sys

from flink_gmall2024_realtime_spark.plans import CATALOG
from flink_gmall2024_realtime_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump-r16")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    os.makedirs("plans/r16", exist_ok=True)
    for name in names:
        plan = (
            CATALOG[name]
            .spark(spark, sf_dir)
            ._jdf.queryExecution()
            .explainString(mode)
        )
        path = f"plans/r16/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
