"""Invariant tests for the round-3 analytics / corpus / maintenance
families — semantic properties the oracle parity alone doesn't state
(SURVEY.md §5.2: every operator family carries its own invariants
beyond parity).
"""

from pyspark.sql import functions as F

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.tables import load

engine.load_all_operators()


def _run(name, spark, sf):
    return REGISTRY[name].fn(spark, sf)


def test_retention_week0_counts_whole_cohort(spark, sf_small):
    """Offset-0 cell of each cohort equals that cohort's user count —
    by construction every user is active in their first week — and no
    later cell may exceed it (retention is a survival curve)."""
    ret = _run("q_retention_cohort", spark, sf_small).toPandas()
    base = ret[ret.week_offset == 0].set_index("cohort_week").n_users
    e = load(spark, sf_small, "events")
    cohort_sizes = (
        e.groupBy("user_id")
        .agg(F.date_format(F.date_trunc("week", F.min("ts")), "yyyy-MM-dd").alias("w"))
        .groupBy("w")
        .count()
        .toPandas()
        .set_index("w")["count"]
    )
    for w, n in cohort_sizes.items():
        assert base[w] == n
    for _, row in ret.iterrows():
        assert row.n_users <= base[row.cohort_week]


def test_funnel_is_monotone_and_rates_consistent(spark, sf_small):
    """Step counts never increase down the funnel (strict ordering
    semantics), and each row's rate equals its count over the
    previous count."""
    f = (
        _run("q_funnel_conversion", spark, sf_small)
        .toPandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    assert list(f.step) == ["1_view", "2_click", "3_purchase"]
    assert f.n_users.is_monotonic_decreasing
    assert f.conv_from_prev[0] == 1.0
    for i in (1, 2):
        if f.n_users[i - 1] > 0:
            assert abs(
                f.conv_from_prev[i] - round(f.n_users[i] / f.n_users[i - 1], 6)
            ) < 1e-9


def test_path_transitions_conserve_events(spark, sf_small):
    """Total transition mass (without the top-20 cut) equals
    |events| − |users with ≥1 event|: every event except each user's
    first has exactly one predecessor."""
    e = load(spark, sf_small, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    total = (
        e.select(F.lag("event_type").over(w).alias("p"))
        .filter(F.col("p").isNotNull())
        .count()
    )
    assert total == n_events - n_users


def test_mad_outliers_bounded_and_robust(spark, sf_small):
    """Outlier count is bounded by group size, and MAD ≤ max|x−med|
    by definition of a median of deviations."""
    m = _run("q_mad_outliers", spark, sf_small).toPandas()
    assert (m.n_outliers <= m.n).all()
    assert (m["mad"] >= 0).all()
    assert (m.max_abs_z >= 0).all()


def test_percentile_bands_ordered(spark, sf_small):
    """p50 ≤ p90 ≤ p99 on every day (quantile monotonicity)."""
    p = _run("q_percentile_bands", spark, sf_small).toPandas()
    assert (p.p50 <= p.p90).all() and (p.p90 <= p.p99).all()


def test_benford_frequencies_sum_to_one(spark, sf_small):
    """Observed and theoretical digit frequencies each total 1."""
    b = _run("q_benford_digits", spark, sf_small).toPandas()
    assert abs(b.obs_freq.sum() - 1.0) < 1e-4
    assert abs(b.benford_freq.sum() - 1.0) < 1e-4
    assert set(b.digit) <= set(range(1, 10))


def test_incremental_dedup_admits_only_novel_hashes(spark, sf_small):
    """No admitted doc's hash exists in the existing corpus, and
    admitted hashes are unique (batch-internal dedup)."""
    kept = _run("q_incremental_dedup", spark, sf_small)
    d = load(spark, sf_small, "documents")
    existing = (
        d.filter(F.substring("source", 4, 10).cast("int") < 10)
        .select(F.sha2("text", 256).alias("text_hash"))
        .distinct()
    )
    assert kept.join(existing, "text_hash").count() == 0
    n = kept.count()
    assert kept.select("text_hash").distinct().count() == n
    # every admitted doc really is from the new batch
    batch_ids = d.filter(
        F.substring("source", 4, 10).cast("int") >= 10
    ).select("doc_id")
    assert kept.join(batch_ids, "doc_id").count() == n


def test_compaction_bins_are_contiguous_and_sized(spark, sf_small):
    """Bins partition the date line into contiguous, non-overlapping
    ranges; every bin except possibly the last holds ≥ TARGET rows
    only if it spans multiple files... the invariant that matters:
    a bin exceeds TARGET only via its final file (prefix-sum packing
    can't split a file)."""
    from data_pipeline_standalone_scripts_spark.operators.maintenance import (
        _TARGET_ROWS,
    )

    plan = (
        _run("q_compaction_plan", spark, sf_small)
        .toPandas()
        .sort_values("bin_id")
        .reset_index(drop=True)
    )
    # contiguity: each bin's range starts after the previous bin's end
    for i in range(1, len(plan)):
        assert plan.d_min[i] > plan.d_max[i - 1]
    # size: bins begin before crossing the target boundary, so any bin
    # holds < TARGET rows before its last file was added
    li = load(spark, sf_small, "lineitem")
    max_file = (
        li.groupBy("l_shipdate").count().agg(F.max("count")).collect()[0][0]
    )
    assert (plan.n_rows < _TARGET_ROWS + max_file).all()


def test_partition_skew_mean_is_one(spark, sf_small):
    """Skew factors average to 1 across partitions by construction."""
    s = _run("q_partition_skew", spark, sf_small).toPandas()
    assert abs(s.skew_factor.mean() - 1.0) < 1e-4
    hot = s[s.is_hot]
    assert (hot.skew_factor > 2.0 - 1e-9).all()


def test_ttr_bounds(spark, sf_small):
    """0 < TTR ≤ 1 and hapax_ratio ≤ 1; types ≤ tokens."""
    t = _run("q_ttr_lexical", spark, sf_small).toPandas()
    assert ((t.ttr > 0) & (t.ttr <= 1)).all()
    assert ((t.hapax_ratio >= 0) & (t.hapax_ratio <= 1)).all()
    assert (t.n_types <= t.n_tokens).all()


def test_boilerplate_ngrams_are_5_words(spark, sf_small):
    """Every mined shingle is exactly 5 space-separated words and
    n_docs ≤ n_occurrences."""
    g = _run("q_boilerplate_ngrams", spark, sf_small).toPandas()
    assert (g.gram.str.split(" ").str.len() == 5).all()
    assert (g.n_docs <= g.n_occurrences).all()


def test_ab_arms_partition_users(spark, sf_small):
    """Arms partition the user population; rates are valid
    probabilities; value means are positive on this data."""
    r = _run("q_ab_lift", spark, sf_small).toPandas().iloc[0]
    e = load(spark, sf_small, "events")
    assert r.n_a + r.n_b == e.select("user_id").distinct().count()
    for c in ("conv_a", "conv_b"):
        assert 0.0 <= r[c] <= 1.0
    assert r.avg_value_a > 0 and r.avg_value_b > 0


def test_triangle_count_matches_bruteforce(spark, sf_small):
    """Node-iterator join count equals a set-intersection brute force
    over the same edge list."""
    from data_pipeline_standalone_scripts_spark.operators.graph import (
        copurchase_edges,
    )

    edges = [(r.a, r.b) for r in copurchase_edges(spark, sf_small).collect()]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    brute = sum(
        1
        for a, nbrs in adj.items()
        for b in nbrs
        for _ in adj.get(b, set()) & nbrs
    )
    out = _run("q_triangle_count", spark, sf_small).toPandas().iloc[0]
    assert out.n_triangles == brute
    assert 0.0 <= (out.clustering_coeff or 0.0) <= 1.0
    assert out.n_wedges >= 3 * out.n_triangles
    assert out.n_edges == len(edges)


def test_dq_report_all_checks_pass_on_clean_data(spark, sf_small):
    """The synthetic tables are referentially clean — every check row
    must pass with zero violations, and n_checked must equal the
    actual table sizes."""
    dq = _run("q_dq_report", spark, sf_small).toPandas().set_index("check_name")
    assert dq.passed.all() and (dq.n_violations == 0).all()
    assert dq.loc["orders.custkey_fk_valid", "n_checked"] == load(
        spark, sf_small, "orders"
    ).count()


def test_attribution_shares_sum_to_one(spark, sf_small):
    """Channel shares total 1 and every purchase is attributed."""
    a = _run("q_attribution_lasttouch", spark, sf_small).toPandas()
    assert abs(a.share.sum() - 1.0) < 1e-4
    n_purchases = (
        load(spark, sf_small, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert a.n_purchases.sum() == n_purchases
    assert set(a.touch) <= {"view", "click", "signup", "error", "direct"}


def test_lateral_join_matches_window_topk(spark, sf_small):
    """The decorrelated lateral equals the explicit window top-2
    formulation."""
    from pyspark.sql.window import Window

    lat = _run("q_join_lateral", spark, sf_small)
    c = load(spark, sf_small, "customer")
    n = load(spark, sf_small, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    win = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "c_name", "c_acctbal")
    )
    assert lat.exceptAll(win).count() == 0 and win.exceptAll(lat).count() == 0


def test_weighted_sample_favors_heavy_docs(spark, sf_small):
    """The length-weighted sample's mean n_chars must exceed the
    corpus mean (inclusion ∝ weight), sample is exactly K unique
    docs."""
    s = _run("q_weighted_sample", spark, sf_small).toPandas()
    d = load(spark, sf_small, "documents").toPandas()
    assert len(s) == 100 and s.doc_id.nunique() == 100
    assert s.n_chars.mean() > d.n_chars.mean()


def test_equidepth_bins_are_balanced_and_ordered(spark, sf_small):
    """Decile bins are near-equal mass (within interpolation slack)
    and their [lo, hi] ranges are disjoint and ordered."""
    h = (
        _run("q_histogram_equidepth", spark, sf_small)
        .toPandas()
        .sort_values("bin_id")
        .reset_index(drop=True)
    )
    total = h.n.sum()
    assert (abs(h.n - total / 10) / (total / 10) < 0.05).all()
    for i in range(1, len(h)):
        assert h.lo[i] > h.hi[i - 1]


def test_psi_terms_nonnegative_and_probs_sum(spark, sf_small):
    """PSI terms are individually ≥ 0 ((p−q)·ln(p/q) has the sign of
    its factors squared) and each side's bin masses are complete."""
    p = _run("q_psi_drift", spark, sf_small).toPandas()
    assert (p.psi_term >= -1e-12).all()
    assert abs(p.p_ref.sum() - 1.0) < 1e-4
    assert abs(p.p_cur.sum() - 1.0) < 1e-4
    e = load(spark, sf_small, "events")
    assert p.n_ref.sum() + p.n_cur.sum() == e.count()


def test_forecast_backtest_lag_alignment(spark, sf_small):
    """Each forecast equals the actual of exactly 7 days earlier."""
    import pandas as pd

    f = _run("q_forecast_backtest", spark, sf_small).toPandas()
    actual = dict(zip(f.day, f.n))
    for _, r in f.iterrows():
        prev = (
            pd.Timestamp(r.day) - pd.Timedelta(days=7)
        ).strftime("%Y-%m-%d")
        if prev in actual:
            assert r.forecast == actual[prev]


def test_copurchase_recs_top3_and_lift_symmetry_inputs(spark, sf_small):
    """≤3 recs per part, no self-recommendation, co-order counts are
    symmetric inputs (c_ab appears for both directions)."""
    r = _run("q_copurchase_recs", spark, sf_small).toPandas()
    assert (r.groupby("part").size() <= 3).all()
    assert (r.part != r.also_bought).all()
    assert (r.lift > 0).all() and (r.n_co_orders >= 1).all()


def test_ngram_novelty_bounds_and_batch_membership(spark, sf_small):
    """Novelty ∈ [0,1], n_novel ≤ n_grams, and every scored doc is
    from the new batch (src10+)."""
    nv = _run("q_ngram_novelty", spark, sf_small).toPandas()
    assert ((nv.novelty >= 0) & (nv.novelty <= 1)).all()
    assert (nv.n_novel <= nv.n_grams).all()
    d = load(spark, sf_small, "documents").toPandas()
    new_ids = set(
        d[d.source.str.slice(3).astype(int) >= 10].doc_id
    )
    assert set(nv.doc_id) <= new_ids
