"""Round-15 optimization probe: time individual catalog queries and dump
their formatted physical plans.

Usage:
  PYTHONPATH=/root/repo python3 tools/r15_profile.py [--sf SF_DIR] \
      [--plans-dir plans/r15 --suffix before] [--runs 3] [--noop] q1 q2 ...

With no query names: all bench-flagged queries. Timing methodology matches
bench.py (xxhash64-materialize, min of N) unless --noop is given, which
times ``df.write.format("noop")`` instead (guide §1.4) — noop numbers are
for isolation/diagnosis, never for the headline contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_gmall2024_realtime_spark.plans import CATALOG
from flink_gmall2024_realtime_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default=None, help="dump explain('formatted') per query here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    spark = get_spark("r15-profile")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.select(F.xxhash64(*df.columns).alias("_h")).agg(F.bit_xor("_h")).collect()

    names = args.names or sorted(n for n, s in CATALOG.items() if s.bench)
    # JVM/codegen + python worker warmup (mirrors bench.py)
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = {}
    for name in names:
        spec = CATALOG[name]
        spark.sparkContext.setJobDescription(f"r15:{name}")
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = spec.spark(spark, args.sf)._jdf.queryExecution().explainString(mode)
            with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        walls = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            materialize(spec.spark(spark, args.sf))
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(walls), "runs": walls}
        print(f"{name}: min={min(walls)} runs={walls}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
