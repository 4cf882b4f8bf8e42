"""Physical-plan regression tests: the plan properties the engine's 100 TB
story depends on (pushdown, pruning, broadcast strategy) must survive
refactors — 'the plan you'd want, not just the first one that passed'."""

from __future__ import annotations

import re

import pytest

from flink_gmall2024_realtime_spark.plans import CATALOG


def formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: (.*)", plan)


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = formatted_plan(spark, CATALOG["q1_pricing_summary"].spark(spark, sf_dir))
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached the scan
    (schema,) = read_schemas(plan)
    assert "l_orderkey" not in schema and "l_partkey" not in schema  # pruned
    assert "l_quantity" in schema


def test_etl_predicate_reaches_scan(spark, sf_dir):
    plan = formatted_plan(spark, CATALOG["dwd_etl_project"].spark(spark, sf_dir))
    assert "In(event_type" in plan
    assert "IsNotNull(user_id)" in plan


def test_dim_joins_are_broadcast(spark, sf_dir):
    for name in ["dwd_lookup_join_dict", "q_dims_broadcast", "dim_config_routing"]:
        plan = formatted_plan(spark, CATALOG[name].spark(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_interval_join_is_hash_not_cartesian(spark, sf_dir):
    plan = formatted_plan(spark, CATALOG["dwd_interval_join"].spark(spark, sf_dir))
    # equality conjunct must be extracted as the join key; range is a filter
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_daily_uv_reads_two_columns(spark, sf_dir):
    plan = formatted_plan(spark, CATALOG["dws_daily_uv"].spark(spark, sf_dir))
    (schema,) = read_schemas(plan)
    assert schema.count(":") == 2  # ts + user_id only


def test_lsh_has_no_cross_join(spark, sf_dir):
    plan = formatted_plan(spark, CATALOG["dedup_minhash_lsh"].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_q3_customer_join_is_aqe_decided(spark, sf_dir):
    """Customer is a fact-sized table at TPC-H scale: its join strategy must
    be left to AQE/autoBroadcastJoinThreshold, never a hard-coded hint."""
    df = CATALOG["q3_segment_revenue"].spark(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    # dim-chain broadcasts stay asserted via test_dim_joins_are_broadcast


def test_embedding_cosine_is_distributed(spark, sf_dir):
    """The embedding near-dup self-join must be a shuffled block-grid plan:
    no cartesian product, no nested-loop join, scoring in cogrouped Arrow
    batches (and the builder performs no driver-side collect of the corpus)."""
    df = CATALOG["dedup_embedding_cosine"].spark(spark, sf_dir)
    plan = formatted_plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapCoGroupsInPandas" in plan


def test_merge_upsert_reuses_fold_shuffle(spark, sf_dir):
    """MERGE = one full-outer equi-join; the changelog fold's hash shuffle
    on the merge key is reused as the join's source-side distribution (no
    second Exchange), and the fold itself is rank-limit pushed
    (WindowGroupLimit) so only per-key candidates shuffle."""
    plan = formatted_plan(spark, CATALOG["q_merge_upsert"].spark(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "FullOuter" in tree
    assert "CartesianProduct" not in tree and "BroadcastNestedLoopJoin" not in tree
    assert tree.count("Exchange") == 2  # target side + fold (reused by join)
    assert "WindowGroupLimit" in tree


def test_scd2_windows_share_one_shuffle_and_sort(spark, sf_dir):
    """Both SCD2 window passes (lag-collapse, lead-interval) partition and
    order identically — the plan must carry exactly one Exchange and one
    Sort, with the second Window consuming the first's ordering."""
    plan = formatted_plan(spark, CATALOG["dim_scd2_history"].spark(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert tree.count("Sort") == 1
    assert tree.count("Window") == 2


def test_domain_cap_limit_pushed_map_side(spark, sf_dir):
    """The per-domain cap must plan as WindowGroupLimit (per-group top-k
    pushed before the shuffle), so whole domains never shuffle."""
    plan = formatted_plan(spark, CATALOG["sample_domain_cap"].spark(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "WindowGroupLimit" in tree


def test_span_dedup_no_cartesian_and_pruned_scan(spark, sf_dir):
    """Span dedup joins only on gram-hash / doc_id keys, reads just
    (doc_id, text) from the documents scan, and builds grams map-side —
    no Window operator may shuffle/sort the exploded token corpus."""
    plan = formatted_plan(spark, CATALOG["dedup_span_exact"].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    for schema in read_schemas(plan):
        assert "n_chars" not in schema and "lang" not in schema


def test_filtered_ann_label_predicate_reaches_scan(spark, sf_dir):
    """Pre-filter ANN must push the label predicate into the parquet scan of
    the corpus side (the whole point of pre- over post-filtering)."""
    plan = formatted_plan(spark, CATALOG["ann_ivf_filtered"].spark(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(label), EqualTo(label,1)]" in plan


def test_shuffle_budgets_headline_queries(spark, sf_dir):
    """Plan-regression lock: each headline query's shuffle-Exchange count is
    at its engineered minimum — a future edit that sneaks in an extra
    shuffle (lost exchange reuse, broken broadcast, accidental
    repartition) fails here before it costs anything at scale."""
    import re

    budgets = {
        "q1_pricing_summary": 1,          # partial+final agg
        "dws_tumble_type_counts": 1,
        "dws_traffic_vc_ch_ar_isnew": 2,  # adaptive repair resolves to the
                                          # provably-safe one-window plan at
                                          # fixture scale (<=500k rows); the
                                          # flood shape is locked separately
                                          # in the forced-two_phase test
        "dwd_trade_order_detail": 0,      # pure broadcast-join pipeline
        "dedup_exact": 1,
        "q3_segment_revenue": 2,          # per-order pre-agg + final agg
        "q_topk_brands": 1,
        "dws_daily_uv": 2,                # first-flag window + daily agg
        "k3_upsert_final_state": 1,
        "dwd_interval_join": 0,           # broadcast + range filter
        # dedup/ANN family — the pipelines that matter most at 100 TB.
        # (localCheckpointed stages don't appear in the plan tree; these pin
        # the post-checkpoint shape: banding/verify joins, cogroup scoring,
        # final rank windows.)
        "dedup_minhash_lsh": 2,           # band groupBy + verify attach
        "dedup_span_exact": 3,            # gram election + coverage anti-join
        "ann_ivf": 2,                     # shared scorer exchange + rank window
        "ann_lsh_bucketed": 2,            # shared scorer exchange + rank window
                                          # (r16: union+repartition streaming
                                          # scorer — one exchange for both
                                          # sides instead of the cogroup's two)
        "dedup_embedding_cosine": 2,      # symmetric block-grid cogroup
        "dedup_simhash_pairs": 4,         # 4 combo-band windows over the
                                          # DISTINCT-fingerprint frame (the
                                          # doc-level groupBy hides in the
                                          # checkpoint; banded-rep rows are
                                          # the only thing shuffled — r5's
                                          # fp-collapse cut x1 23.8->4.0 s)
        "q_skew_rank": 3,                 # bucketed local sort + counts + join
        "text_bigram_lm": 3,              # post-checkpoint: model join + score join + final agg
                                          # (training pass runs once at the c2 checkpoint)
        # heavy TPC-H join trees (r4 lock, VERDICT r3 #6): a refactor that
        # breaks a broadcast or loses an exchange reuse fails here first.
        # r4 additions: retract IVM nets by row content in ONE exchange
        # (the three delta joins broadcast); trained IVF keeps the
        # placeholder path's cell-cogroup shape exactly.
        "q_incremental_join_retract": 1,
        "ann_ivf_trained": 2,
        # agg-retract IVM: state agg + merge agg, delta partial map-side
        # combined into the union; semantic dedup: ONE groupBy(cell) — the
        # assignment is a map-side Arrow pass, pairing never joins back.
        "q_incremental_agg_retract": 2,
        "dedup_semantic": 1,
        # extrema IVM: 5 keyed branches over checkpointed state/delta
        # (9 hash shuffles + 8 delta-sized broadcasts); a refactor that
        # un-broadcasts an affected-key probe or duplicates the state
        # lineage fails here first.
        "q_incremental_minmax_retract": 17,
        "q7_volume_shipping": 1,          # dims broadcast; nation-pair agg
        "q8_market_share": 3,
        "q9_product_type_profit": 1,
        "q16_parts_supplier_cnt": 4,      # 2 broadcasts + count_distinct's
                                          # two phases — no bridge distinct;
                                          # only filtered (group, suppkey)
                                          # pairs ever shuffle
        "q18_large_volume": 1,
        "q21_waiting_suppliers": 2,  # r15 window rewrite: one fact-sized
                                     # window exchange + the s_name agg
    }
    for name, budget in budgets.items():
        plan = formatted_plan(spark, CATALOG[name].spark(spark, sf_dir))
        tree = plan.split("\n\n")[0]
        shuffles = len(re.findall(r"[+:]- Exchange ", tree))
        assert shuffles <= budget, f"{name}: {shuffles} shuffles > budget {budget}"


def test_window_funcs_shuffle_budget(spark, sf_dir):
    """q_window_funcs (rewired onto two_phase_shift/rank arithmetic, r9):
    at fixture scale mode="auto" resolves to single-phase and the plan must
    stay tight — the lag+lead shifts collapse into ONE Window node sharing
    one Exchange+Sort, the rank window reuses the event_type partitioning
    (a second Sort but NO second row shuffle), and the per-key count joins
    as a broadcast. Budget: 2 shuffle Exchanges (rows + tiny count agg),
    2 Sorts, count side broadcast, no cartesian."""
    plan = formatted_plan(spark, CATALOG["q_window_funcs"].spark(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert len(re.findall(r"[+:]- Exchange ", tree)) <= 2
    assert len(re.findall(r"[+:-]+ Sort ", tree)) <= 2
    assert "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in tree and "BroadcastNestedLoopJoin" not in tree


def test_range_bucket_join_not_nested_loop(spark, sf_dir):
    """The band-join decomposition must plan as a hash equi-join on the
    bucket id — never BroadcastNestedLoopJoin or a cartesian product."""
    plan = formatted_plan(spark, CATALOG["q_range_bucket_join"].spark(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree
    assert "Join" in tree  # it IS still a join, on the bucket key


def test_lsh_ann_scores_grouped_no_global_window_over_candidates(spark, sf_dir):
    """ann_lsh_bucketed must score candidates in a grouped Arrow pass with
    bucket-local top-k — the plan carries NO join (the old bucket equi-join
    fed raw candidates to a global window: O(|corpus|/buckets) rows per
    query at scale). The only Window input is the scorer's nprobe*k rows
    per query. r16: the scorer is a union + ONE shared hash exchange +
    sorted streaming ``MapInPandas`` (per-batch Python dispatch), replacing
    the two-exchange ``FlatMapCoGroupsInPandas`` whose per-GROUP dispatch
    taxes every ~256-row bucket (~4M groups at 10^9 vectors)."""
    plan = formatted_plan(spark, CATALOG["ann_lsh_bucketed"].spark(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInPandas") >= 3  # 2 assign passes + the scorer
    assert "FlatMapCoGroupsInPandas" not in tree  # scorer is the streaming pass
    assert "Join" not in tree  # no bucket join — scoring happens in the scorer
    # final rank over bucket-local top-k only (WindowGroupLimit ≠ Window)
    assert len(re.findall(r"Window \(", tree)) == 1


def test_simhash_pairs_no_cross_join(spark, sf_dir):
    """SimHash pair generation must stay the pigeonhole chunk-banding
    equi-join — the quadratic form lives only in the oracle."""
    plan = formatted_plan(spark, CATALOG["dedup_simhash_pairs"].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_join_prunes_fact_before_exchange(spark, sf_dir):
    """The bloom membership predicate must sit on the lineitem side BELOW its
    join Exchange (prune-then-shuffle — the operator's entire point), stay
    codegen-able (xxhash64 + bit ops, no UDF), and add no extra shuffle:
    fact Exchange + dim Exchange + final agg Exchange = 3."""
    import re

    plan = formatted_plan(spark, CATALOG["q_bloom_join"].spark(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "xxhash64" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    shuffles = len(re.findall(r"[+:]- Exchange ", tree))
    assert shuffles <= 3, f"{shuffles} shuffles > budget 3"
    # the Filter carrying xxhash64 must sit on the LINEITEM side, below its
    # Exchange: find the Filter node whose Condition contains xxhash64 and
    # assert its Input schema is lineitem-only (no o_* columns — i.e. the
    # filter runs before the join, not over the joined stream).
    detail = plan.split("\n\n", 1)[1] if "\n\n" in plan else plan
    nodes = re.findall(r"\(\d+\) Filter.*?(?=\n\(\d+\)|\Z)", detail, re.S)
    bloom_filters = [n for n in nodes if "xxhash64" in n]
    assert bloom_filters, "no Filter node carries the bloom xxhash64 predicate"
    # (Catalyst may ALSO infer the predicate onto the dim side via join-key
    # constraints — harmless; what must exist is a lineitem-only instance.)
    def input_cols(node: str) -> list[str]:
        inp = re.search(r"Input \[\d+\]: \[(.*?)\]", node, re.S)
        assert inp is not None
        return [c.strip().split("#")[0] for c in inp.group(1).split(",")]

    assert any(
        all(c.startswith("l_") for c in input_cols(n)) for n in bloom_filters
    ), "no bloom Filter sits on the lineitem side below its Exchange"


def test_index_sizing_launches_no_job(spark, sf_dir):
    """VERDICT r4 #6: `lsh_topk`/`ivf_topk` default index sizing must come
    from Catalyst statistics, not a planning-time `count()` — at 100 TB
    that pre-count is a full corpus scan before the real job even starts.
    Constructing the plan with default sizing must launch zero Spark jobs;
    the estimate must still land in the same auto_planes clamp band as the
    true count at this SF (so the oracle's hardcoded planes stay aligned)."""
    from flink_gmall2024_realtime_spark.operators import similarity
    from flink_gmall2024_realtime_spark.plans.catalog import _t

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id % 20 = 0")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    est = similarity.estimated_row_count(emb)
    df = similarity.lsh_topk(emb, q, k=5)  # planes=None -> estimate path
    _ = df._jdf.queryExecution().optimizedPlan()  # force full planning
    after = len(tracker.getJobIdsForGroup(None))
    assert after == before, "plan construction launched a Spark job"
    true_n = emb.count()
    assert similarity.auto_planes(est) == similarity.auto_planes(true_n)


def test_unpivot_is_shuffle_free_expand(spark, sf_dir):
    """UNPIVOT must plan as a map-side Expand (each row emits k metric
    rows in place) — zero Exchanges; the melt never shuffles."""
    plan = formatted_plan(spark, CATALOG["q_unpivot_metrics"].spark(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "Expand" in tree
    assert "Exchange" not in tree


def test_triangle_count_no_cartesian(spark, sf_dir):
    """Wedge enumeration and closure are keyed equi-joins — no cartesian
    or nested-loop fallback anywhere in the triangle plan."""
    plan = formatted_plan(spark, CATALOG["graph_triangle_count"].spark(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_shuffle_budgets_analytics_suite(spark, sf_dir):
    """Plan-regression lock for the r7 product-analytics suite: each
    entry's static Exchange count at its engineered value (AQE can only
    improve on these at runtime — threshold/count frames broadcast)."""
    import re

    budgets = {
        "q_funnel_conversion": 11,   # 4 stage min-aggs + 3 chain joins + 4 count rows
        "q_retention_cohorts": 6,    # distinct + first-week agg + join + count + base join
        "q_markov_transitions": 5,   # lead window + pair counts + source totals + join
        "q_rolling_wau": 4,          # user-day distinct + expand distinct + day count
        "q_weighted_median": 4,      # two_phase_cumsum (local + bucket frames) + median agg
        "q_mode_per_group": 2,       # two keyed aggs
        "q_gap_fill_daily": 2,       # daily agg + span/calendar join (fill window reuses)
        "q_time_weighted_avg": 1,    # one per-key window; agg reuses its exchange
        "q_linear_trend": 2,         # re-base min agg + sufficient-stats agg
        "q_daily_anomalies": 3,      # day counts + per-type stats + join back
        "q_type_entropy": 3,         # (day,type) counts + day totals + final agg
        "q_audience_overlap": 7,     # distinct + sizes + keyed pair join + 2 size joins
    }
    for name, budget in budgets.items():
        plan = formatted_plan(spark, CATALOG[name].spark(spark, sf_dir))
        tree = plan.split("\n\n")[0]
        shuffles = len(re.findall(r"[+:]- Exchange ", tree))
        assert shuffles <= budget, f"{name}: {shuffles} shuffles > budget {budget}"


def test_interval_anti_join_is_hashed(spark, sf_dir):
    """The abandoned-carts interval ANTI join must probe on the user
    equi-key (hash anti-join with the range as residual condition), never
    a cartesian/nested-loop."""
    plan = formatted_plan(spark, CATALOG["q_abandoned_carts"].spark(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "LeftAnti" in tree


def test_two_phase_shapes_shuffle_budget_and_no_per_key_row_sort(spark, sf_dir):
    """Plan locks for the forced two-phase skew shapes behind the r8/r9
    rewires (q_markov_transitions, q_last_touch_attribution,
    q_purchase_intervals, q_window_funcs, graph.transition_edges): each
    resolves to at most 3 shuffle Exchanges (bucketed row window, per-
    (key, bucket) summary agg, stitch join), carries no cartesian /
    nested-loop join, and — the entire point — NO window ever partitions
    the ROW frame by the key alone ordered by event time (the shape that
    pins a hot key's lifetime to one task). The per-key windows that do
    appear run over the tiny (key, bucket) summary frame, ordered by the
    bucket id."""
    from pyspark.sql import functions as F

    from flink_gmall2024_realtime_spark.operators import skew

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    shapes = {
        "shift_lead": skew.two_phase_shift(
            ev, "user_id", ["ts", "event_id"], ["event_type"],
            skew.hour_bucket("ts"), "lead", mode="two_phase",
        ),
        "shift_lag": skew.two_phase_shift(
            ev, "user_id", ["ts", "event_id"], ["event_type"],
            skew.hour_bucket("ts"), "lag", mode="two_phase",
        ),
        "prefix_carry": skew.two_phase_prefix(
            ev, "user_id", ["ts", "event_id"], carry_cols=["event_type"],
            bucket=skew.hour_bucket("ts"), mode="two_phase",
        ),
        "rank": skew.two_phase_rank(
            ev.withColumn("_o", F.unix_micros(F.col("ts").cast("timestamp"))),
            "user_id", "_o", "event_id", 3_600_000_000, mode="two_phase",
        ),
    }
    for name, df in shapes.items():
        plan = formatted_plan(spark, df)
        tree = plan.split("\n\n")[0]
        shuffles = len(re.findall(r"[+:]- Exchange ", tree))
        assert shuffles <= 3, f"{name}: {shuffles} shuffles > budget 3"
        assert "CartesianProduct" not in tree, name
        assert "BroadcastNestedLoopJoin" not in tree, name
        # no raw per-key row sort: every windowspec over the row frame
        # partitions by (key, bucket); a spec of the form
        # (user_id, ts ASC ...) would be the lifetime-in-one-task shape
        assert not re.search(
            r"windowspecdefinition\(user_id#\d+L?, ts#", plan
        ), f"{name}: raw per-key window over the row frame"


def test_keyed_compaction_is_partial_agg_argmax(spark, sf_dir):
    """Plan lock for the keyed-compaction family (VERDICT r9 #1):
    k3_upsert_final_state / compact_by_key / upsert_batch must plan
    last-write-wins as a max_by AGGREGATE with a map-side partial
    (partial_max_by below the Exchange) — never the row_number-over-
    per-key-sort shape that serializes a hot key's lifetime onto one
    task."""
    from flink_gmall2024_realtime_spark.streaming.kafka import compact_by_key

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    frames = {
        "k3_plan": CATALOG["k3_upsert_final_state"].spark(spark, sf_dir),
        "compact_by_key": compact_by_key(ev, "user_id", "ts"),
    }
    for name, df in frames.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "partial_max_by" in plan, f"{name}: no map-side partial argmax"
        assert "row_number" not in plan, f"{name}: row_number sort shape came back"
        assert "windowspecdefinition" not in plan, f"{name}: per-key window over row frame"
    # the other argmax rewires (r10): keep-best per cluster and the as-of
    # view dedup also plan the map-side partial, not a per-key sort
    for name in ("dedup_keep_best", "q_asof_join"):
        plan = CATALOG[name].spark(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "partial_max_by" in plan, f"{name}: no map-side partial argmax"
        assert "row_number" not in plan, f"{name}: row_number sort shape came back"


def test_dws_traffic_repair_is_partial_agg_plus_bounded_shift(spark, sf_dir):
    """Plan lock + mode equivalence for the dws_traffic repair rewire
    (VERDICT r9 #2). The repair is ADAPTIVE (sessionize recipe): at
    fixture scale mode="auto" keeps the provably-safe one-window plan;
    past the 500k bound it must decompose — uv/is_new ride a per-(user,
    day) PARTIAL aggregate (map-side partial_min of the (ts, event_id)
    struct) joined back to rows, never a first()-over-lifetime window,
    and sv's lag buckets through two_phase_shift. Locks: the forced
    two-phase shape carries the partial and NO per-(key, ts-only)
    lifetime window; the two forced modes return identical rows."""
    from pyspark.sql import functions as F

    from flink_gmall2024_realtime_spark.operators.state import (
        traffic_repair_flags,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id", "ts"
    )
    two = traffic_repair_flags(ev, mode="two_phase")
    plan = formatted_plan(spark, two)
    assert "partial_min(struct(ts" in plan, "daily first agg lost its map-side partial"
    assert "row_number" not in plan
    assert plan.count("first(") == 0, "cumulative first-over-lifetime window came back"
    # the only per-user windows run over the tiny day frame (ordered by
    # _b / unordered min) — never (user_id, ts) over the row frame
    assert not re.search(r"windowspecdefinition\(user_id#\d+L?, ts#\d+ ASC", plan)
    single = traffic_repair_flags(ev, mode="single")
    key = ["user_id", "event_id"]
    a = {tuple(r) for r in two.select(*key, "is_new", "uv", "sv").collect()}
    b = {tuple(r) for r in single.select(*key, "is_new", "uv", "sv").collect()}
    assert a == b, "forced modes disagree"
    # and the catalog entry stays oracle-shaped end to end
    assert CATALOG["dws_traffic_vc_ch_ar_isnew"].spark(spark, sf_dir).count() > 0


def test_scan_bench_footer_max_is_exact_with_job_fallback(spark, sf_dir):
    """r15: delta/iceberg_scan_bench derive their quartile threshold from
    parquet FOOTER stats (job-free) — the footer max must equal the
    aggregate-job max on every fixture, and the helper must return None
    (forcing the Spark fallback) for a missing column or empty dir."""
    import tempfile

    from pyspark.sql import functions as F

    from flink_gmall2024_realtime_spark.plans.scoring_rank import _footer_col_max

    path = f"{sf_dir}/orders.parquet"
    footer = _footer_col_max(path, "o_orderkey")
    job = (
        spark.read.parquet(path).agg(F.max("o_orderkey")).collect()[0][0]
    )
    assert footer == job
    assert _footer_col_max(path, "no_such_column") is None
    with tempfile.TemporaryDirectory() as d:
        assert _footer_col_max(d, "o_orderkey") is None
    # a directory of parquet files (the scaled-fixture shape) also resolves
    with tempfile.TemporaryDirectory() as d:
        spark.read.parquet(path).repartition(3).write.parquet(f"{d}/t")
        assert _footer_col_max(f"{d}/t", "o_orderkey") == job


def test_footer_col_max_refuses_truncatable_string_stats(spark, sf_dir):
    """Parquet string/binary max_value may be truncated upward by writers;
    the footer-max helper must refuse non-fixed-width columns and force the
    exact Spark-job fallback."""
    from flink_gmall2024_realtime_spark.plans.scoring_rank import _footer_col_max

    path = f"{sf_dir}/orders.parquet"
    assert _footer_col_max(path, "o_orderpriority") is None  # string column
    assert _footer_col_max(path, "o_orderkey") is not None   # int64 column


def test_range_bucketed_matches_spark_hash_and_keeps_locality(spark, sf_dir):
    """r16 (VERDICT r15 #8): the scan benches replace repartitionByRange's
    sampling pass with footer-bounds range bucketing. Three contracts:
    (1) the Python murmur3 predicts Spark's hash() exactly, (2) the label
    set maps slices onto shuffle partitions bijectively, and (3) every
    output partition holds one contiguous, disjoint key range — the
    file-level min/max locality the pruning leg measures."""
    from pyspark.sql import functions as F

    from flink_gmall2024_realtime_spark.plans.scoring_rank import (
        _murmur3_int32,
        _range_bucket_labels,
        _range_bucketed,
    )

    vals = list(range(-3, 40)) + [12345, -98765, 2**31 - 1, -(2**31)]
    got = (
        spark.createDataFrame([(v,) for v in vals], "x int")
        .select(F.hash("x").alias("h"))
        .collect()
    )
    assert [r.h for r in got] == [_murmur3_int32(v) for v in vals]
    labels = _range_bucket_labels(8)
    assert sorted(_murmur3_int32(v) % 8 for v in labels) == list(range(8))
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    mn, mx = df.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    parts = (
        _range_bucketed(df, "o_orderkey", 8, mn, mx)
        .rdd.glom()
        .map(lambda rows: (min(r[0] for r in rows), max(r[0] for r in rows), len(rows)) if rows else None)
        .collect()
    )
    ranges = sorted(p[:2] for p in parts if p)
    assert len(ranges) == 8
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "partition key ranges must be disjoint"
    assert ranges[0][0] == mn and max(h for _l, h in ranges) == mx
    total = sum(p[2] for p in parts if p)
    assert total == df.count()


def test_footer_col_max_r16_guards(spark, sf_dir, tmp_path):
    """r16 hardening (ADVICE r15 + VERDICT r15 #5): leaf-column indexing
    must survive a nested column placed BEFORE the target (Arrow top-level
    index != parquet leaf index), FLOAT/DOUBLE stats are refused (footer
    min/max excludes NaN, Spark max() sorts NaN highest), and above the
    file-count cap the helper returns None so the driver never serially
    opens thousands of footers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import flink_gmall2024_realtime_spark.plans.scoring_rank as sr

    # nested (struct) column ahead of the int leaf: names.index() would
    # pick the struct's first leaf; the path-matched lookup must not
    nested = tmp_path / "nested.parquet"
    pq.write_table(
        pa.table(
            {
                "s": pa.array([{"a": 9, "b": 9}] * 4),
                "o_orderkey": pa.array([1, 7, 3, 5], type=pa.int64()),
            }
        ),
        nested,
    )
    assert sr._footer_col_max(str(nested), "o_orderkey") == 7
    # a float column is refused even though its stats exist
    floats = tmp_path / "floats.parquet"
    pq.write_table(
        pa.table({"x": pa.array([1.0, float("nan"), 2.0])}), floats
    )
    assert sr._footer_col_max(str(floats), "x") is None
    # file-count cap: a directory with more than _FOOTER_MAX_FILES parquet
    # files forces the Spark-job fallback
    many = tmp_path / "many"
    many.mkdir()
    one = pa.table({"o_orderkey": pa.array([1], type=pa.int64())})
    for i in range(sr._FOOTER_MAX_FILES + 1):
        pq.write_table(one, many / f"part-{i:05d}.parquet")
    assert sr._footer_col_max(str(many), "o_orderkey") is None
