"""Scale-proofing harness: measure wall-clock growth of the flagship
queries against synthetic 10x/100x fixtures (VERDICT r3 #1).

Every 100 TB claim in the repo is a plan-shape argument until measured;
this prints the measurement: per-query wall at each multiplier and the
wall-growth : input-growth ratio (1.0 = perfectly linear, < 1 = sublinear
economies of scale, >> 1 = a hidden superlinearity the plan locks missed).

Usage:
    PYTHONPATH=. python tools/scale_bench.py \
        [--sf-dir /root/testdata/sf0.1] [--multipliers 1,10] [--runs 2] \
        [--queries dedup_minhash_lsh,...] [--keep-dir DIR]

Prints one JSON object. Scaled fixtures build under a temp dir (or
--keep-dir) via ``sources/scaling.py`` — deterministic M-sharded replicas
with consistent key offsets and content perturbation so output sizes scale
by M, never M^2.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_gmall2024_realtime_spark.plans import CATALOG
from flink_gmall2024_realtime_spark.session import get_spark
from flink_gmall2024_realtime_spark.sources import scaling

# Heads of each operator family (VERDICT r3 #1's list).
DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_span_exact",
    "ann_lsh_bucketed",
    "ann_ivf_pq",
    "q_bloom_join",
    "graph_pagerank",
    "q18_large_volume",
    "q16_parts_supplier_cnt",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--multipliers", default="1,10")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--keep-dir", default=None)
    ap.add_argument(
        "--adversarial",
        default=None,
        choices=sorted(scaling.ADVERSARIAL_MODES),
        help="flood one entity instead of structure-preserving replicas "
        "(dup_corpus/hot_key/fat_cell): measures the capped/salted paths' "
        "survival, not throughput",
    )
    args = ap.parse_args()
    multipliers = [int(m) for m in args.multipliers.split(",")]
    queries = args.queries.split(",")

    from pyspark.sql import functions as F

    spark = get_spark("gmall-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        df.select(F.xxhash64(*df.columns).alias("_h")).agg(F.bit_xor("_h")).collect()

    work = args.keep_dir or tempfile.mkdtemp(prefix="scale_bench_")
    result: dict = {
        "sf_dir": args.sf_dir,
        "multipliers": multipliers,
        "runs": args.runs,
        "queries": {q: {} for q in queries},
    }
    if args.adversarial:
        result["adversarial"] = args.adversarial
    try:
        # warm JIT/codegen + the Python worker pool once
        materialize(CATALOG[queries[0]].spark(spark, args.sf_dir))
        spark.range(32).mapInPandas(lambda it: it, "id long").count()
        for m in multipliers:
            if m == 1:
                sf_dir = args.sf_dir
            else:
                sf_dir = os.path.join(work, f"x{m}" + (f"_{args.adversarial}" if args.adversarial else ""))
                t0 = time.perf_counter()
                if args.adversarial:
                    scaling.build_adversarial_dir(spark, args.sf_dir, sf_dir, args.adversarial, m)
                else:
                    scaling.build_scaled_dir(spark, args.sf_dir, sf_dir, m)
                print(
                    f"# built x{m} fixtures in {time.perf_counter() - t0:.1f}s",
                    file=sys.stderr,
                )
            for q in queries:
                best = float("inf")
                for _ in range(args.runs):
                    t0 = time.perf_counter()
                    materialize(CATALOG[q].spark(spark, sf_dir))
                    best = min(best, time.perf_counter() - t0)
                result["queries"][q][f"x{m}"] = round(best, 3)
                if args.adversarial:
                    # adversarial runs also record output size: a capped
                    # path's survival claim is "bounded wall AND bounded
                    # rows", not just the former
                    result["queries"][q][f"x{m}_rows"] = CATALOG[q].spark(spark, sf_dir).count()
                print(f"# x{m} {q}: {best:.3f}s", file=sys.stderr)
        base_m = multipliers[0]
        for q in queries:
            walls = result["queries"][q]
            for m in multipliers[1:]:
                ratio = walls[f"x{m}"] / walls[f"x{base_m}"]
                # wall growth relative to input growth: 1.0 == linear
                walls[f"growth_vs_input_x{m}"] = round(ratio / (m / base_m), 3)
        print(json.dumps(result))
    finally:
        if not args.keep_dir:
            shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
