"""End-to-end product-analytics demo — the event-analytics layer this
engine adds beyond the reference's DWS windows, composed as one job.

Runs the full behavioral read-out a growth dashboard needs, at fixture
scale, every stage a declarative DataFrame transform from the
oracle-checked catalog:

  1. funnel            strictly-ordered signup -> view -> click -> purchase
                       (keyed min-agg chain over per-user threshold frames)
  2. retention         weekly cohort triangle (Monday-truncated)
  3. engagement        rolling 7-day WAU + daily sessionized counts
  4. conversion        session-level conversion rate (sessionize ∘ rollup)
  5. attribution       last click / first view per purchase (one window,
                       triple carry-forward)
  6. behavior model    Markov transition matrix + inter-purchase intervals
  7. monitoring        z-score daily anomalies + type-mix entropy drift
  8. concentration     Pareto/whale curve (two_phase_rank ∘ two_phase_cumsum)
  9. audiences         pairwise overlap (Jaccard / Simpson) between types

Usage: PYTHONPATH=. python examples/run_product_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from flink_gmall2024_realtime_spark.plans import CATALOG
from flink_gmall2024_realtime_spark.session import get_spark

STAGES = [
    ("funnel", "q_funnel_conversion"),
    ("retention", "q_retention_cohorts"),
    ("rolling WAU", "q_rolling_wau"),
    ("session conversion", "q_session_conversion"),
    ("attribution", "q_last_touch_attribution"),
    ("markov transitions", "q_markov_transitions"),
    ("purchase intervals", "q_purchase_intervals"),
    ("daily anomalies", "q_daily_anomalies"),
    ("type entropy", "q_type_entropy"),
    ("pareto curve", "q_pareto_concentration"),
    ("audience overlap", "q_audience_overlap"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("product-analytics-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    print(f"== product analytics over {sf_dir} ==")
    for label, name in STAGES:
        df = CATALOG[name].spark(spark, sf_dir)
        rows = df.collect()
        print(f"{label:20s} {name:28s} {len(rows):6d} rows")

    # a few cross-stage sanity reads
    funnel = {
        r["stage"]: r["users"]
        for r in CATALOG["q_funnel_conversion"].spark(spark, sf_dir).collect()
    }
    assert funnel["signup"] >= funnel["view"] >= funnel["click"] >= funnel["purchase"]
    print(f"funnel monotone: {funnel}")

    conv = CATALOG["q_session_conversion"].spark(spark, sf_dir).collect()
    assert all(0.0 <= r["conversion_rate"] <= 1.0 for r in conv)
    pareto = sorted(
        CATALOG["q_pareto_concentration"].spark(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    shares = [r["share_through"] for r in pareto]
    assert shares == sorted(shares) and shares[-1] == 1.0
    print(f"top-decile event share: {shares[0]:.3f}; curve closes at 1.0")
    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
