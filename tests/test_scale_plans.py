"""Physical-plan regression gates (SURVEY.md §4): assert the plans
that make operators scale — pushdown, pruning, broadcast, top-k
short-circuit, partition pruning, and bucketed (exchange-free) joins.
A refactor that silently loses one of these still passes value parity
at sf0.01 but dies at 100 TB; these tests pin the plan shape."""

import re

import pytest
from pyspark.sql import functions as F

from data_pipeline_standalone_scripts_spark.operators.common import dsum
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.tables import load
import data_pipeline_standalone_scripts_spark as engine

engine.load_all_operators()


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark, sf_med):
    plan = plan_of(REGISTRY["q_filter_simple"].fn(spark, sf_med))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark, sf_med):
    plan = plan_of(REGISTRY["q_scan_project"].fn(spark, sf_med))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"}


def test_star_join_broadcasts_dims(spark, sf_med):
    plan = plan_of(REGISTRY["q_join_star6"].fn(spark, sf_med))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan  # all dims fit under the threshold here


def test_topk_uses_take_ordered(spark, sf_med):
    """Global top-k must not global-sort: TakeOrderedAndProject keeps
    k rows per partition and merges on the driver."""
    plan = plan_of(REGISTRY["q_topk_global"].fn(spark, sf_med))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_agg_is_partial_then_final(spark, sf_med):
    """Q1 shape: map-side partial aggregate before the exchange —
    shuffle carries one row per (group × partition), not the table."""
    plan = plan_of(REGISTRY["q_agg_pricing_summary"].fn(spark, sf_med))
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 2
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_partitioned_sink_prunes(spark, sf_med):
    """S5's re-read filter must resolve against partition directories
    (PartitionFilters), reading one partition, zero data filters."""
    df = REGISTRY["q_partitioned_prune"].fn(spark, sf_med)
    plan = plan_of(df)
    assert re.search(r"PartitionFilters: \[[^\]]*event_date[^\]]*\]", plan), plan


def test_bucketed_join_avoids_shuffle(spark, sf_small, tmp_path):
    """Bucketed co-located join: both sides saved with bucketBy on the
    join key → SortMergeJoin with NO Exchange. This is the 100 TB
    recurring-join pattern (pay the shuffle once at write time, never
    again). Uses saveAsTable into the session warehouse (path
    override to tmp), dropped afterwards."""
    orders = load(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    li = load(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.mode("overwrite")
        .option("path", str(tmp_path / "b_orders"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .option("path", str(tmp_path / "b_lineitem"))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at sf0.001 the dims broadcast, which also avoids the shuffle
        # but hides the bucketing effect; disable broadcast to expose
        # the co-located SortMergeJoin a 100 TB join would use
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(dsum("l_quantity", "qty"))
        )
        plan = plan_of(joined)
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        # the join inputs must come straight from the bucketed scans —
        # no Exchange between scan and join
        pre_join = plan.split("SortMergeJoin")[0]
        assert "Exchange" not in join_section or "Exchange" not in pre_join
        # value sanity: bucketed join equals plain join
        plain = (
            orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(dsum("l_quantity", "qty"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_whole_stage_codegen_covers_hot_path(spark, sf_med):
    """The Q1 pipeline (scan → filter → project → partial agg) must sit
    inside WholeStageCodegen spans — falling out of codegen is the
    classic 10× regression. Simple-mode explain marks codegen stages
    with '*(n)'."""
    df = REGISTRY["q_agg_pricing_summary"].fn(spark, sf_med)
    df.collect()  # AQE finalizes subtrees only at execution
    final = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark operators fused into WholeStageCodegen
    assert re.search(r"\*\(\d+\) HashAggregate", final), final[:600]


@pytest.mark.parametrize(
    "qname",
    ["q_join_star3", "q_tf_idf", "q_cosine_topk", "q_knn_label_vote", "q_lang_id"],
)
def test_no_cartesian_products(spark, sf_med, qname):
    """Broadcast crossJoins against 1-row/20-row frames are fine;
    unplanned CartesianProduct (both sides large) is never fine."""
    plan = plan_of(REGISTRY[qname].fn(spark, sf_med))
    assert "CartesianProduct" not in plan


def test_winnow_single_preexplosion_exchange(spark, sf_med):
    """Winnowing must shuffle whole DOCUMENTS (1 row each, before the
    per-doc gram expansion) exactly once. A second exchange means the
    plan regressed to shuffling expanded gram rows. r13: the expansion
    is one mapInArrow kernel (explode/window/distinct folded in), so
    the plan must also carry exactly one MapInArrow and no Window or
    hash-distinct aggregate."""
    plan = plan_of(REGISTRY["q_fingerprint_winnow"].fn(spark, sf_med))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:800]
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInArrow") == 1, plan[:800]
    assert "Window" not in tree
    assert "HashAggregate" not in tree


def test_repetition_filter_single_preexplosion_exchange(spark, sf_med):
    """Same shuffle-before-expansion contract for the repetition
    filter: one doc-keyed exchange, count-distincts reuse it."""
    plan = plan_of(REGISTRY["q_repetition_filter"].fn(spark, sf_med))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:800]


def test_simhash_persists_fingerprints(spark, sf_med):
    """The SimHash self-join must read the persisted fingerprint table
    (InMemoryTableScan on both branches), not recompute the sketch
    pipeline twice."""
    df = REGISTRY["q_simhash_neardup"].fn(spark, sf_med)
    plan = plan_of(df)
    assert plan.count("InMemoryTableScan") >= 2, plan[:800]
    spark.catalog.clearCache()


def test_star6_prunes_fact_before_shuffle(spark, sf_med):
    """q5's only large exchange must carry lineitem AFTER the ASIA dim
    broadcast join pruned it: in the formatted plan the BroadcastHashJoin
    with s_suppkey must appear on the lineitem scan's side of the
    orderkey exchange (i.e. before any Exchange boundary above the
    lineitem scan)."""
    plan = plan_of(REGISTRY["q_join_star6"].fn(spark, sf_med))
    # the lineitem-side broadcast join keyed on l_suppkey must exist
    # (formatted plans list join keys in a "Left keys" detail section)
    m = re.search(r"\(\d+\) BroadcastHashJoin[^(]*Left keys \[1\]: \[l_suppkey", plan)
    assert m, plan[:800]
    assert "SortMergeJoin" not in plan


def test_bm25_topk_short_circuits(spark, sf_med):
    """BM25's top-20 must be TakeOrderedAndProject (per-partition heap
    + driver merge), never a global sort of all scored docs."""
    plan = plan_of(REGISTRY["q_bm25_rank"].fn(spark, sf_med))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_unpivot_is_exchange_free(spark, sf_med):
    """Wide→long reshape is a per-row Expand — any exchange in this
    plan means the reshape started shuffling data it never needs to."""
    plan = plan_of(REGISTRY["q_unpivot"].fn(spark, sf_med))
    assert "Expand" in plan
    assert "Exchange" not in plan


def test_quality_score_is_exchange_free(spark, sf_med):
    """The quality scorer is a pure narrow scan: zero exchanges."""
    plan = plan_of(REGISTRY["q_quality_score_model"].fn(spark, sf_med))
    assert "Exchange" not in plan


def test_lm_score_is_two_narrow_passes(spark, sf_med):
    """The LM scorer is fit-pass + score-pass (CCNet shape): each pass
    re-explodes the corpus NARROWLY — no persist (a corpus-sized cache
    write), no pre-explode shuffle. Gated: exactly TWO corpus explodes
    in the plan (r13 — the r12 shape's three broadcast builds each
    re-exploded the corpus, 4 passes without AQE stage reuse; c1 and V
    now derive from the bigram table via vocab-bounded windows), the
    (g, m) model table broadcast into the score pass (no sort-merge
    join against the stream), and no exchange between the scan and
    either explode (the expansion is map-side; the regression is a
    repartition ahead of it)."""
    spark.catalog.clearCache()
    df = REGISTRY["q_ngram_lm_score"].fn(spark, sf_med)
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert tree.count("Generate") == 2, plan[:1200]
    assert tree.count("Scan parquet") == 2, plan[:1200]
    assert plan.count("BroadcastHashJoin") >= 1, plan[:1200]
    assert "SortMergeJoin" not in plan
    assert "InMemoryTableScan" not in plan  # no corpus-sized cache
    spark.catalog.clearCache()


def test_corr_subquery_decorrelates(spark, sf_med):
    """Correlated scalar + EXISTS must decorrelate to joins — no
    per-row subquery execution nodes in the physical plan."""
    plan = plan_of(REGISTRY["q_corr_subquery"].fn(spark, sf_med))
    assert "LeftSemi" in plan  # EXISTS became a semi join
    assert "Subquery" not in plan


def test_bloom_probe_all_broadcast(spark, sf_med):
    """The Bloom pre-filter must reach the fact table exclusively via
    broadcast hash joins (bitmap words + membership check) — a
    SortMergeJoin would mean the fact shuffled for a lookup that the
    sketch exists to avoid."""
    plan = plan_of(REGISTRY["q_bloom_prefilter"].fn(spark, sf_med))
    assert "SortMergeJoin" not in plan, plan[:800]
    assert "CartesianProduct" not in plan, plan[:800]
    assert plan.count("BroadcastHashJoin") >= 5, plan[:800]


def test_retention_is_single_scan_no_join(spark, sf_med):
    """AN1 (r8 single-pass form): ONE events scan, NO join at all —
    the per-user day-set aggregate replaced the r4 join-back, and the
    distinct-collapse happens at per-user-week grain."""
    plan = plan_of(REGISTRY["q_retention_cohort"].fn(spark, sf_med))
    # formatted explain lists each scan twice (tree node + detail)
    assert plan.count("Scan parquet") == 2, plan[:800]
    assert "Join" not in plan, plan[:800]
    assert "partial_collect_set" in plan  # map-side combined day sets


def test_funnel_is_single_scan_single_user_exchange(spark, sf_med):
    """AN4 (r8 single-pass form): the type IN-filter reaches the one
    parquet scan and the only keyed exchange is user_id — the r4
    form's three join-chained passes are gone."""
    plan = plan_of(REGISTRY["q_funnel_conversion"].fn(spark, sf_med))
    # formatted explain lists each scan twice (tree node + detail)
    assert plan.count("Scan parquet") == 2, plan[:800]
    assert "In(event_type, [click,purchase,view])" in plan, plan[:800]
    assert "Join" not in plan, plan[:800]
    assert plan.count("hashpartitioning(user_id") >= 1, plan[:800]


def test_boilerplate_topk_short_circuits(spark, sf_med):
    """C1: top-20 shingles via TakeOrderedAndProject with map-side
    partial aggregation of the kernel's (gram, occ, docs) partials —
    no global sort of the gram stream."""
    plan = plan_of(REGISTRY["q_boilerplate_ngrams"].fn(spark, sf_med))
    assert "TakeOrderedAndProject" in plan
    assert "partial_sum" in plan


def test_weighted_sample_topk_short_circuits(spark, sf_med):
    """C4: A-Res top-K must be TakeOrderedAndProject (per-partition
    heaps), never a global sort."""
    plan = plan_of(REGISTRY["q_weighted_sample"].fn(spark, sf_med))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_incremental_dedup_uses_anti_join(spark, sf_med):
    """C2: the admission gate must plan as a LEFT ANTI join on the
    digest, not a filter over a materialized outer join."""
    plan = plan_of(REGISTRY["q_incremental_dedup"].fn(spark, sf_med))
    assert "LeftAnti" in plan


def test_equidepth_histogram_has_no_global_sort(spark, sf_med):
    """AN11: bin assignment ships as a 1-row boundary broadcast +
    codegen expression — no ntile-style single-partition sort of the
    fact, no CartesianProduct (the 1-row join plans as broadcast
    nested-loop, which is fine)."""
    plan = plan_of(REGISTRY["q_histogram_equidepth"].fn(spark, sf_med))
    assert "CartesianProduct" not in plan
    assert not re.search(r"\bntile\(", plan)  # \b: don't match percentile(
    body = plan.split("== Physical Plan ==")[1]
    assert not re.search(r"\(\d+\) Sort\b", body), body[:400]


def test_triangle_joins_are_equi(spark, sf_med):
    """G1: both wedge/closure joins must be hash/sort-merge equi-joins;
    only the three 1-row result frames may broadcast-nested-loop."""
    plan = plan_of(REGISTRY["q_triangle_count"].fn(spark, sf_med))
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_q6_scan_agg_is_pure_pushdown(spark, sf_med):
    """OL4 (Q6 shape): all three predicate families reach the parquet
    scan, the scan reads exactly the 4 referenced columns, and the
    whole query is one partial/final agg pair — a single 1-row
    exchange."""
    plan = plan_of(REGISTRY["q_revenue_uplift"].fn(spark, sf_med))
    pushed = re.search(r"PushedFilters: \[[^\]]*\]", plan).group(0)
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount",
        "LessThan(l_quantity",
    ):
        assert frag in pushed, pushed
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate",
    }
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_q10_returned_items_topk_short_circuits(spark, sf_med):
    """OL7 (Q10 shape): the top-20 must be TakeOrderedAndProject (no
    global sort), the order-date window must be pushed to the orders
    scan, and every join must stay broadcast-hash."""
    plan = plan_of(REGISTRY["q_returned_items"].fn(spark, sf_med))
    assert "TakeOrderedAndProject" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "SortMergeJoin" not in plan


def test_q19_disjunction_pushes_to_both_scans(spark, sf_med):
    """OL13 (Q19 shape): Catalyst must push the OR-of-conjunctions
    residual to BOTH sides — the quantity envelope to the fact scan
    and the brand/size envelope to the part scan — and the join must
    broadcast with no extra exchange (only the final 1-row agg)."""
    plan = plan_of(REGISTRY["q_disjunctive_revenue"].fn(spark, sf_med))
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    fact = [p for p in pushed if "l_quantity" in p]
    dim = [p for p in pushed if "p_brand" in p]
    assert fact and "Or(" in fact[0], pushed
    assert dim and "Or(" in dim[0], pushed
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_q21_set_agg_replaces_correlated_exists(spark, sf_med):
    """OL18 (Q21 shape): the Spark plan must express both EXISTS
    correlations as ONE per-order set aggregation (partial-merged
    ObjectHashAggregate) — exactly 2 exchanges total (orderkey
    rollup, final suppkey count), no window sort, and no self-join
    of the fact."""
    plan = plan_of(REGISTRY["q_waiting_suppliers"].fn(spark, sf_med))
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert "ObjectHashAggregate" in plan  # collect_set with partials
    assert "Window" not in plan


def test_funnel_is_single_pass(spark, sf_med):
    """C7: the composed funnel must stay a flag computation — at most
    2 scans of documents (never the 5-branch union's rescan per
    stage) and at most 3 exchanges (two digest windows + final)."""
    plan = plan_of(REGISTRY["q_curation_funnel"].fn(spark, sf_med))
    assert plan.count("Scan parquet") <= 2, plan.count("Scan parquet")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3


def test_ppjoin_no_cartesian(spark, sf_med):
    """X38: the prefix-filtered candidate join must stay an equi-join
    on the token key — no cartesian fallback."""
    plan = plan_of(REGISTRY["q_ppjoin_neardup"].fn(spark, sf_med))
    assert "CartesianProduct" not in plan


def test_incremental_agg_prunes_delta_scan(spark, sf_med):
    """A16: both epoch scans must push their shipdate predicate — at
    real scale the delta side partition-prunes to the new epoch."""
    plan = plan_of(REGISTRY["q_incremental_agg"].fn(spark, sf_med))
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    assert any("GreaterThanOrEqual(l_shipdate" in p for p in pushed), pushed
    assert any("LessThan(l_shipdate" in p for p in pushed), pushed


def test_pii_redact_is_scan_side(spark, sf_med):
    """The three regex passes and counts are narrow expressions: one
    map-side-combined aggregate, exactly one exchange, zero joins."""
    plan = plan_of(REGISTRY["q_pii_redact"].fn(spark, sf_med))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2  # agg + sort
    assert "Join" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_ks_collapses_fact_before_walk(spark, sf_med):
    """KS must aggregate to distinct values (map-side combine) BEFORE
    the single-partition ECDF walk — the walk's window input is the
    collapsed frame, never the fact table."""
    plan = plan_of(REGISTRY["q_ks_test"].fn(spark, sf_med))
    assert "partial_sum" in plan
    idx_agg = plan.find("HashAggregate")
    idx_win = plan.find("Window")
    assert idx_agg != -1 and idx_win != -1


def test_interpolate_shares_one_key_partitioning(spark, sf_med):
    """Both fill windows and the spine join key on n_name — the plan
    must not re-exchange between the join and the windows."""
    plan = plan_of(REGISTRY["q_interpolate_linear"].fn(spark, sf_med))
    n_windows = len(re.findall(r"\(\d+\) Window", plan))
    assert n_windows <= 2  # prev-fill + next-fill, nothing more
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 6, plan  # spine build + join + final agg


def test_mutual_info_marginals_broadcast(spark, sf_med):
    """MI joins the cell frame against both marginals and the total —
    all three are bounded aggregates and must broadcast."""
    plan = plan_of(REGISTRY["q_mutual_info"].fn(spark, sf_med))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total
    assert "SortMergeJoin" not in plan


def test_zonemap_two_bounded_aggs(spark, sf_med):
    """Zone stats and match counts are two map-side-combined passes on
    the zone key; the report join is between two bounded frames."""
    plan = plan_of(REGISTRY["q_zonemap_prune"].fn(spark, sf_med))
    assert "partial_min" in plan and "partial_max" in plan
    assert "SortMergeJoin" not in plan


def test_calibration_is_single_agg(spark, sf_med):
    """Scoring is scan-side; exactly one aggregation exchange."""
    plan = plan_of(REGISTRY["q_calibration_bins"].fn(spark, sf_med))
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 2  # partial+final


def test_random_projection_sign_matrix_broadcasts(spark, sf_med):
    """The 64×16 sign matrix joins the exploded vectors via broadcast;
    the vector side must never shuffle for that join."""
    plan = plan_of(REGISTRY["q_random_projection"].fn(spark, sf_med))
    assert "BroadcastHashJoin" in plan


def test_label_propagation_reuses_edge_partitioning(spark, sf_med):
    """The undirected edge frame is repartitioned on the message key
    once and persisted — iterations must reuse it (InMemoryTableScan),
    not rebuild the co-purchase self-join per iteration."""
    df = REGISTRY["q_label_propagation"].fn(spark, sf_med)
    plan = plan_of(df)
    # every iteration's edge consumption is a cache scan (the formatted
    # explain re-prints the cached relation per scan site, so count
    # scans, not relations)
    assert plan.count("InMemoryTableScan") >= 4
    # the cached frame is hash-partitioned on the message key, so the
    # per-iteration joins add no exchange on the edge side
    assert "hashpartitioning(u" in plan
    spark.catalog.clearCache()


def test_ohlc_is_single_agg_no_window(spark, sf_med):
    """FIN1: the struct-MIN/MAX open/close pick must keep OHLC a pure
    two-phase hash aggregate — no window operator, exactly one
    exchange carrying per-(type,hour) partials."""
    plan = plan_of(REGISTRY["q_ohlc_bars"].fn(spark, sf_med))
    assert "Window" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "partial_min" in plan and "partial_max" in plan


def test_twa_window_and_agg_share_user_partitioning(spark, sf_med):
    """FIN3: the lead window and the per-user aggregate must reuse ONE
    user_id hash partitioning — a second exchange would shuffle the
    fact twice at 100 TB."""
    plan = plan_of(REGISTRY["q_time_weighted_avg"].fn(spark, sf_med))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_interval_coverage_single_shuffle(spark, sf_med):
    """FIN4: both sweep windows and both aggregates key on user_id —
    one exchange total."""
    plan = plan_of(REGISTRY["q_interval_coverage"].fn(spark, sf_med))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_nearest_hub_broadcasts_and_preaggregates(spark, sf_med):
    """GEO1: the hub fan-out must be a broadcast nested loop with a
    map-side partial MIN — the point table itself is never exchanged
    with the x25 blowup."""
    plan = plan_of(REGISTRY["q_geo_nearest_hub"].fn(spark, sf_med))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_min" in plan


def test_grid_join_agg_reuses_cell_partitioning(spark, sf_med):
    """GEO2: the cell equi-join and the per-cell rollup share the
    (cell_lat, cell_lon) partitioning — two scan-side exchanges (one
    per side), none after the join."""
    plan = plan_of(REGISTRY["q_geo_grid_join"].fn(spark, sf_med))
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 2, plan


def test_wau_mau_sweep_branch_shape(spark, sf_med, monkeypatch):
    """AN24 scale branch (round-5 dispatch): with the explode
    threshold pinned to 0 the sweep plan must fire — no Generate, and
    the only nested-loop joins are the cumulative theta-joins over the
    CALENDAR-BOUNDED delta tables (≤ |days|+28 rows on the broadcast
    side — the same bounded-frame class as theilsen's 1-row BNLJ)."""
    from data_pipeline_standalone_scripts_spark.operators import analytics

    monkeypatch.setattr(analytics, "_WAU_EXPLODE_MAX_BYTES", 0)
    plan = plan_of(REGISTRY["q_wau_mau"].fn(spark, sf_med))
    assert "CartesianProduct" not in plan
    assert "Generate" not in plan  # the explode is gone
    # the two calendar-bounded cumulative joins (wau + mau) are
    # nested-loop — assert their presence without coupling to how many
    # times explain("formatted") renders each operator (tree + detail
    # today; a rendering change must not fail this test — ADVICE r04 #5)
    assert plan.count("BroadcastNestedLoopJoin") >= 2


def test_wau_mau_small_input_takes_explode(spark, sf_med):
    """AN24 dispatch: under the size threshold (sf0.01 events ≈ 0.2 MB)
    the low-fixed-cost explode plan fires — Generate present, no
    nested-loop join, no cartesian."""
    plan = plan_of(REGISTRY["q_wau_mau"].fn(spark, sf_med))
    assert "Generate" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_l_diversity_broadcasts_dimension(spark, sf_med):
    """PI9: the customer dimension broadcasts into the fact scan."""
    plan = plan_of(REGISTRY["q_l_diversity"].fn(spark, sf_med))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_overlap_join_is_binned_equi(spark, sf_med):
    """J18: the interval overlap join must plan as a bin equi-join —
    no nested loop, no cartesian; the explode (Generate) does the
    fan-out and one exchange per side feeds the join."""
    plan = plan_of(REGISTRY["q_join_overlap_binned"].fn(spark, sf_med))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_golden_record_is_aggregate_not_window(spark, sf_med):
    """RC3: survivorship picks are struct MIN/MAX aggregates — no
    window operator, and the customer dim broadcasts into the fact
    rollup."""
    plan = plan_of(REGISTRY["q_golden_record"].fn(spark, sf_med))
    assert "Window" not in plan
    assert "partial_min" in plan and "partial_max" in plan


def test_pit_join_collapses_fact_first(spark, sf_med):
    """ML6: the snapshot side aggregates to user-day grain BEFORE the
    label join (partial aggregate present), and no nested loop forms
    from the range predicate."""
    plan = plan_of(REGISTRY["q_pit_join"].fn(spark, sf_med))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_shortest_path_never_cartesian(spark, sf_med):
    """G5: every relaxation round joins frontier to edges on the node
    key — a lost key would nested-loop the graph."""
    plan = plan_of(REGISTRY["q_shortest_path_bf"].fn(spark, sf_med))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_codebook_broadcasts(spark, sf_med):
    """KM5/KM6: the codebook (and ADC's query table) must broadcast —
    a shuffled codebook join would exchange the exploded vector
    stream twice."""
    for name in ("q_product_quantize", "q_pq_adc_topk"):
        plan = plan_of(REGISTRY[name].fn(spark, sf_med))
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_incremental_join_prunes_delta_scans(spark, sf_med):
    """MT6: the epoch predicates must reach the parquet scans so the
    delta terms read delta-sized inputs."""
    plan = plan_of(REGISTRY["q_incremental_join"].fn(spark, sf_med))
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


# Ops allowed to keep an UNPARTITIONED window, each with the bound that
# makes the single-partition sort harmless at ANY data size. Everything
# else must use the distributed primitives in operators/common.py
# (dist_row_number / dist_ntile / dist_running / topk_with_rank).
UNPARTITIONED_WINDOW_ALLOWLIST = {
    "q_dau_rolling": "rolling window over per-DAY aggregate rows (calendar-bounded, ~2.4k rows/decade)",
    "q_rolling_corr": "rolling stats over per-DAY aggregate rows (calendar-bounded)",
    "q_forecast_backtest": "walk-forward folds over per-DAY aggregate rows (calendar-bounded)",
    "q_seasonal_decompose": "trend/seasonal windows over per-DAY aggregate rows (calendar-bounded)",
    "q_survival_km": "KM product over distinct lifetime-day rows (calendar-span-bounded, analytics.py docstring)",
    "q_funnel_conversion": "step-to-step rates over the 3-row funnel-step frame (literal step list)",
    "q_param_sweep": "ranking over the parameter GRID (fixed |grid| rows, data-independent)",
    "q_evolutionary_sweep": "per-generation ranking over the fixed population (|pop| rows, data-independent)",
    "q_saes_sweep": "per-generation survivor ranking over the fixed 8-member population (data-independent; the gen filter constant-folds the partition key, X13's class)",
    "q_win_moving_avg": "W5 semantic demo: 7-day MA over per-DAY aggregate rows (calendar-bounded)",
}


def _unpartitioned_windows(plan: str) -> int:
    """Count Window nodes whose Arguments carry no partition list.

    Formatted-plan signature: '(n) Window' + 'Arguments: [funcs],
    [part], [sort]'. Two bracket groups where the second contains
    ASC/DESC sort markers = unpartitioned (a partition-only spec also
    prints two groups but without sort directions)."""
    bad = 0
    for m in re.finditer(r"\(\d+\) Window\s*\n(?:[^\n]*\n)*?Arguments: (.*)", plan):
        groups = re.findall(r"\[(?:[^\[\]]|\[[^\]]*\])*\]", m.group(1).strip())
        if len(groups) == 2 and re.search(r" (ASC|DESC) ", groups[1]):
            bad += 1
    return bad


def test_no_unpartitioned_windows_registry_wide(spark, sf_small):
    """VERDICT r02 #5: a global ORDER BY window with no PARTITION BY
    moves the whole frame to ONE task — the class of plan that ran RFM's
    per-customer ntile on a single partition. Sweep every registered
    op's physical plan; any unpartitioned window outside the documented
    allowlist is a scale regression. The same pass also bans
    CartesianProduct everywhere (verified zero across the registry:
    every intentional small-side cross join plans as
    BroadcastNestedLoopJoin, never the shuffle-cartesian)."""
    offenders, cartesians = {}, {}
    for name, q in REGISTRY.items():
        plan = plan_of(q.fn(spark, sf_small))
        if "CartesianProduct" in plan:
            cartesians[name] = plan.count("CartesianProduct")
        if name in UNPARTITIONED_WINDOW_ALLOWLIST:
            continue
        n = _unpartitioned_windows(plan)
        if n:
            offenders[name] = n
    assert not offenders, f"unpartitioned windows outside allowlist: {offenders}"
    assert not cartesians, f"CartesianProduct in plans: {cartesians}"
    # the allowlist itself must stay small and justified
    assert len(UNPARTITIONED_WINDOW_ALLOWLIST) <= 10


def test_star3_shj_dispatch_plumbing(spark, sf_med, monkeypatch):
    """The q3 shuffled-hash dispatch (joins._SHJ_MIN_ORDERS_BYTES):
    OFF at test tier (all-broadcast plan, pinned elsewhere); when
    forced ON, the plan must carry ShuffledHashJoin with no
    SortMergeJoin, and values must be identical to the default plan."""
    from data_pipeline_standalone_scripts_spark.operators import joins

    base = REGISTRY["q_join_star3"].fn(spark, sf_med)
    assert "ShuffledHashJoin" not in plan_of(base)
    plain = base.toPandas()
    monkeypatch.setattr(joins, "_SHJ_MIN_ORDERS_BYTES", 0)
    hinted_df = REGISTRY["q_join_star3"].fn(spark, sf_med)
    plan = plan_of(hinted_df)
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert hinted_df.toPandas().equals(plain)


# --- round-10 gates: the 2-D raster family (VERDICT r09 #7) ------------------


def _assert_raster_plan(plan: str, name: str) -> None:
    """Shared contract for the per-image raster kernels: the ONLY
    Exchange allowed is fits_table's single-file parallelism-crutch
    REPARTITION of the thin (doc_id, n_chars) generator input — the
    kernel OUTPUT must never shuffle, and nothing aggregates outside
    the kernel."""
    assert "MapInPandas" in plan, name
    assert "HashAggregate" not in plan and "SortAggregate" not in plan, name
    # formatted explain renders each node once in the tree and once as
    # a detail block — every Exchange occurrence must be the crutch
    assert plan.count("Exchange") <= 2, (name, plan.count("Exchange"))
    if "Exchange" in plan:
        assert "REPARTITION" in plan, name
        assert "hashpartitioning(doc_id" in plan, name


@pytest.mark.parametrize(
    "name",
    ["q_tailcut_2d", "q_connected_2d", "q_atrous_2d", "q_atrous_ksigma",
     "q_tailcut_hex", "q_connected_hex", "q_pipeline_hex",
     "q_pipeline_e2e"],
)
def test_raster2d_kernels_plan_no_kernel_shuffle(spark, sf_med, name):
    """The 2-D raster cleaners must stay embarrassingly parallel: one
    documents scan feeding Arrow-batched Python stages; the kernel
    output never shuffles and never re-aggregates — a refactor that
    sneaks a shuffle into the per-image path multiplies 100 TB cost."""
    _assert_raster_plan(plan_of(REGISTRY[name].fn(spark, sf_med)), name)


@pytest.mark.parametrize("name", ["q_hillas_2d", "q_hillas_hex"])
def test_hillas_moments_reduce_inside_kernel(spark, sf_med, name):
    """X62/X71's moment sums must reduce INSIDE the kernel (one output
    row per image): no aggregate operator anywhere — the ellipse math
    (and X71's change of basis) is a scalar Project over the kernel's
    integer sums."""
    plan = plan_of(REGISTRY[name].fn(spark, sf_med))
    _assert_raster_plan(plan, name)
    assert "Project" in plan


def test_pipeline_e2e_is_single_pass(spark, sf_med):
    """X63 fuses five reference stages; the plan must show exactly one
    documents scan (the reference re-reads per stage — the fused shape
    is the point). Formatted explain renders the scan once in the tree
    plus one detail header."""
    plan = plan_of(REGISTRY["q_pipeline_e2e"].fn(spark, sf_med))
    assert plan.count("Scan parquet") <= 2, plan.count("Scan parquet")
    # generate + fused kernel: count tree-section node headers only
    # (the detail blocks re-render each node; a raw substring count
    # would break on any explain-format change without a regression)
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 2, plan[:600]


@pytest.mark.parametrize("name", ["q_warc_extract", "q_warc_roundtrip"])
def test_warc_kernel_single_generator_exchange(spark, sf_med, name):
    """X66/X73: the only Exchange is the generator's blob-assembly
    groupBy (real crawl files arrive via binaryFile with zero
    shuffle); the extract/roundtrip kernel's output must never
    re-shuffle or aggregate."""
    plan = plan_of(REGISTRY[name].fn(spark, sf_med))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:600]
    assert "HashAggregate" not in plan and "SortAggregate" not in plan
    assert "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan


def test_web_curation_sheds_text_before_shuffle(spark, sf_med):
    """X67: exactly three exchanges — the generator's blob groupBy
    (which necessarily moves text to BUILD the crawl files; at 100 TB
    real .warc.gz arrive via binaryFile with no such exchange), then
    the digest dedup window and the host aggregate, NEITHER of which
    may carry the text column — the kernel output sheds it into
    sha2 + flags before anything moves."""
    plan = plan_of(REGISTRY["q_web_curation_e2e"].fn(spark, sf_med))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 3, plan[:800]
    for block in plan.split("\n\n"):
        if block.lstrip().startswith("(") and ") Exchange" in block.split("\n")[0]:
            if "hashpartitioning(blob_id" in block:
                continue  # the generator-only blob-assembly exchange
            assert "text#" not in block, block
