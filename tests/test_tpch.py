"""Plan-shape locks for the TPC-H completion queries (plans/tpch.py).

Correctness is covered by the DuckDB oracles (tools/verify_oracle.py and the
driver gate); these tests pin the *physical* properties the 100 TB story
depends on — pushdown, join strategy, no accidental nested-loop / cartesian
blowups, scalar thresholds built as one-row broadcasts."""

from __future__ import annotations

import re

import pytest

from flink_gmall2024_realtime_spark.plans import CATALOG

from test_plans import formatted_plan, read_schemas

TPCH_NEW = [
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_values",
    "q12_shipmode_priority",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_cnt",
    "q19_disjunctive_revenue",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_global_sales",
]

# The three scalar-threshold queries intentionally cross-join a ONE-ROW
# aggregate back over the table; Spark plans that as a BroadcastNestedLoopJoin
# with a single-row build side, which is the right plan (each task streams
# against one row). Everywhere else a nested-loop join means a predicate
# failed to become a hash key — a scale bug.
ONE_ROW_SCALAR = {"q11_important_values", "q15_top_supplier", "q22_global_sales"}


@pytest.mark.parametrize("name", TPCH_NEW)
def test_no_cartesian_product_anywhere(spark, sf_dir, name):
    plan = formatted_plan(spark, CATALOG[name].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan, name
    if name not in ONE_ROW_SCALAR:
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q6_all_predicates_reach_the_scan(spark, sf_dir):
    """Q6 is the pushdown benchmark: date range, discount band, and quantity
    cap must all appear as parquet PushedFilters, and the scan must read only
    the four referenced columns."""
    plan = formatted_plan(spark, CATALOG["q6_forecast_revenue"].spark(spark, sf_dir))
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThanOrEqual(l_discount,0.07)" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    (schema,) = read_schemas(plan)
    assert schema.count(":") == 4  # shipdate, discount, quantity, extendedprice


def test_q4_exists_is_preaggregated_hash_join(spark, sf_dir):
    """r15: EXISTS(late line) == max(l_shipdate) > o_orderdate + 60d — the
    lineitem side partial-aggregates to one row per order BEFORE the join
    (a semi join would ship every raw line), and the lateness comparison
    still rides the equi join, not a loop join."""
    plan = formatted_plan(spark, CATALOG["q4_order_priority"].spark(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    # per-order max aggregate below the join: two HashAggregates (partial+
    # final) feeding the join's lineitem side
    assert "max(l_shipdate" in plan
    # the lateness comparison must ride the equi join, not force a loop join
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree
    # the half-year window reaches the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q21_is_one_scan_one_window(spark, sf_dir):
    """r15: the EXISTS/NOT EXISTS co-supplier pair is ONE window pass over
    lineitem (collect_set sizes per order), not a semi+anti join trio —
    exactly one lineitem scan, one Window node, no lineitem-vs-lineitem
    join shape to degrade at scale."""
    plan = formatted_plan(spark, CATALOG["q21_waiting_suppliers"].spark(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1
    assert plan.split("\n\n")[0].count("Window") == 1
    assert "CartesianProduct" not in plan
    # top-20 must not materialize a global sort
    assert "TakeOrderedAndProject" in plan


def test_q2_min_is_one_window_not_a_rejoin(spark, sf_dir):
    """The per-part minimum is a window over the candidate set — exactly one
    Window node, and no correlated-subquery rewrite that would re-join the
    bridge a second time (the oracle's formulation, not the engine's)."""
    plan = formatted_plan(spark, CATALOG["q2_min_cost_supplier"].spark(spark, sf_dir))
    assert plan.count("Window") >= 1
    # bridge (distinct l_partkey,l_suppkey) appears once: one HashAggregate
    # pair for the distinct, not two
    assert "CartesianProduct" not in plan


def test_q19_disjunction_is_filter_over_hash_join(spark, sf_dir):
    """The OR-of-ANDs must not degrade the partkey equi-join; the part side
    carries the derivable brand/size pre-filters."""
    plan = formatted_plan(spark, CATALOG["q19_disjunctive_revenue"].spark(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "In(p_brand" in plan  # derived brand-set filter pushed to part scan


def test_q22_dormancy_filter_pushes_to_orders_scan(spark, sf_dir):
    plan = formatted_plan(spark, CATALOG["q22_global_sales"].spark(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # 1999 cutoff at the scan


def test_q14_month_filter_prunes_lineitem_scan(spark, sf_dir):
    plan = formatted_plan(spark, CATALOG["q14_promo_revenue"].spark(spark, sf_dir))
    assert "GreaterThanOrEqual(l_shipdate" in plan
    schemas = read_schemas(plan)
    li_schema = [s for s in schemas if "l_partkey" in s]
    assert li_schema and all("l_tax" not in s for s in li_schema)  # pruned


def test_tpch_shuffle_budgets(spark, sf_dir):
    """Exchange-count locks for the new suite's heaviest shapes — a refactor
    that silently adds a shuffle to these fails here, not at 100 TB."""
    budgets = {
        "q6_forecast_revenue": 1,   # partial->final global agg only
        "q14_promo_revenue": 3,     # li<->part join (2) + single-group agg
        "q16_parts_supplier_cnt": 5,  # distinct, anti, part join, 2-level agg
        "q20_excess_suppliers": 3,  # one pk repartition feeds sp/ptot/join
                                    # shuffle-free (r15); dom distinct; slack
    }
    for name, budget in budgets.items():
        tree = formatted_plan(spark, CATALOG[name].spark(spark, sf_dir))
        shuffles = len(re.findall(r"[+:]- Exchange ", tree))
        assert shuffles <= budget, f"{name}: {shuffles} > {budget}"
