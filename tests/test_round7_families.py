"""Invariant tests for the round-7 additions (substring-window dedup,
minhash containment, DP count release, canonical-set dedup) — semantic
properties parity alone doesn't state (SURVEY.md §5.2).
"""

from pyspark.sql import functions as F

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.tables import load

engine.load_all_operators()


def _run(name, spark, sf):
    return REGISTRY[name].fn(spark, sf)


def test_substring_dedup_ledger_is_consistent(spark, sf_small):
    """Window accounting: 0 <= dups <= total, ratio = dups/total, and
    total windows per doc equals len(tokens) - K + 1 recomputed from
    the raw text (occurrence counting conserves the explode)."""
    from data_pipeline_standalone_scripts_spark.operators.dedup_ext import (
        SUBSTR_K,
    )

    r = _run("q_substring_dedup", spark, sf_small).toPandas()
    assert (r.n_dup_windows >= 0).all()
    assert (r.n_dup_windows <= r.n_windows).all()
    assert (
        abs(r.dup_ratio - (r.n_dup_windows / r.n_windows).round(6)) < 1e-9
    ).all()
    expected = (
        load(spark, sf_small, "documents")
        .select(
            "doc_id",
            (F.size(F.split("text", " ")) - (SUBSTR_K - 1)).alias("exp_n"),
        )
        .filter(F.col("exp_n") >= 1)
        .toPandas()
    )
    merged = r.merge(expected, on="doc_id", how="outer")
    assert not merged.exp_n.isna().any() and not merged.n_windows.isna().any()
    assert (merged.n_windows == merged.exp_n).all()


def test_substring_dedup_min_owner_has_no_dups(spark, sf_small):
    """The lowest doc_id in the corpus owns every window it has — its
    dup count must be exactly zero (first occurrence owns)."""
    r = _run("q_substring_dedup", spark, sf_small).toPandas()
    first = r.doc_id.min()
    assert (r[r.doc_id == first].n_dup_windows == 0).all()


def test_containment_dominates_jaccard_on_shared_pairs(spark, sf_small):
    """|A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| always; every verified L8
    Jaccard >= 0.8 pair with equal-size sets must appear here (for
    equal sizes, containment = 2J/(1+J) >= J >= 0.8... >= 0.9 only
    when J >= 0.818 — so assert on the J >= 0.9 subset, where
    containment >= 2*0.9/1.9 > 0.94 for ANY sizes)."""
    cont = _run("q_minhash_containment", spark, sf_small).toPandas()
    jac = _run("q_minhash_lsh", spark, sf_small).toPandas()
    strong = jac[jac.jaccard >= 0.9]
    key = lambda df: set(zip(df.doc_a, df.doc_b))
    missing = key(strong) - key(cont)
    assert not missing, f"{len(missing)} strong-Jaccard pairs missing"
    assert (cont.containment >= 0.9).all()
    assert (cont.containment <= 1.0 + 1e-9).all()


def test_containment_inner_doc_is_smaller_side(spark, sf_small):
    """inner_doc must be one of the pair and the side with the
    smaller (or equal) distinct-token set."""
    cont = _run("q_minhash_containment", spark, sf_small).toPandas()
    assert (
        (cont.inner_doc == cont.doc_a) | (cont.inner_doc == cont.doc_b)
    ).all()
    sizes = (
        load(spark, sf_small, "documents")
        .select(
            "doc_id",
            F.size(F.array_distinct(F.split("text", " "))).alias("sz"),
        )
        .toPandas()
        .set_index("doc_id")
        .sz
    )
    sa = cont.doc_a.map(sizes)
    sb = cont.doc_b.map(sizes)
    inner_sz = cont.inner_doc.map(sizes)
    assert (inner_sz == sa.combine(sb, min)).all()


def test_dp_counts_noise_is_bounded_and_clamped(spark, sf_small):
    """Released counts differ from true counts by at most the ±8
    truncation and never go negative."""
    r = _run("q_dp_counts", spark, sf_small).toPandas()
    truth = (
        load(spark, sf_small, "events")
        .groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    merged = r.merge(truth, on=["event_type", "day"], how="outer")
    assert not merged.n.isna().any() and not merged.noisy_n.isna().any()
    assert (merged.noisy_n >= 0).all()
    assert (abs(merged.noisy_n - merged.n.clip(lower=0)) <= 8).all()


def test_dp_threshold_table_is_a_cdf():
    """The quantized inverse-CDF table must be monotone, span the full
    20-bit range, and put ~1/3 of the mass on k = 0 (alpha = 1/2
    two-sided geometric, truncation mass < 2^-8)."""
    from data_pipeline_standalone_scripts_spark.operators.textclean import (
        _GEOM,
        DP_MOD,
    )

    ks = [k for k, _ in _GEOM]
    ts = [t for _, t in _GEOM]
    assert ks == list(range(-8, 9))
    assert all(b > a for a, b in zip(ts, ts[1:]))
    assert ts[-1] == DP_MOD
    p0 = (ts[8] - ts[7]) / DP_MOD
    assert abs(p0 - 1 / 3) < 0.005


def test_normalized_dedup_groups_are_set_identical(spark, sf_small):
    """Every reported group really is token-set identical: recompute
    the canonical fingerprint per doc and check group sizes match."""
    r = _run("q_normalized_dedup", spark, sf_small).toPandas()
    assert (r.n_docs >= 2).all()
    assert (r.n_raw_variants >= 1).all()
    assert (r.n_raw_variants <= r.n_docs).all()
    canon = (
        load(spark, sf_small, "documents")
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(F.split("text", " ")))
            ).alias("canon"),
        )
        .groupBy("canon")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("rep"))
        .filter(F.col("n") >= 2)
        .toPandas()
    )
    # fixture text is already lowercase alnum + single spaces, so the
    # normalization is the identity here and set-grouping must agree
    assert sorted(canon.n.tolist()) == sorted(r.n_docs.tolist())
    assert set(canon.rep) == set(r.rep_doc)


def test_pr_curve_is_monotone_and_consistent(spark, sf_small):
    """Recall is nondecreasing in the rank budget, the p=100% point
    degenerates to (precision = base rate, recall = 1), and tp/fp/fn
    are a consistent confusion decomposition at every point."""
    r = (
        _run("q_pr_curve", spark, sf_small)
        .toPandas()
        .sort_values("p_pct")
        .reset_index(drop=True)
    )
    assert list(r.p_pct) == [5 * i for i in range(1, 21)]
    assert (r.recall.diff().dropna() >= -1e-9).all()
    n_pos = int(r.tp.iloc[0] + r.fn.iloc[0])
    assert ((r.tp + r.fn) == n_pos).all()
    last = r.iloc[-1]
    assert last.recall == 1.0
    docs = load(spark, sf_small, "documents").count()
    assert int(last.tp + last.fp) == docs
    prec = r.tp / (r.tp + r.fp)
    assert (abs(r.precision - prec.round(6)) < 1e-9).all()
    nz = r[r.tp > 0]
    f1 = 2 * (nz.tp / (nz.tp + nz.fp)) * (nz.tp / n_pos) / (
        (nz.tp / (nz.tp + nz.fp)) + (nz.tp / n_pos)
    )
    assert (abs(nz.f1 - f1.round(6)) < 1e-6).all()


def test_target_encoding_shrinks_toward_global_mean(spark, sf_small):
    """Every encoded value lies strictly between the category's raw
    rate and the global rate (or equals both when they coincide), and
    reconstructing the shrinkage identity from the emitted integers
    reproduces the encoding."""
    from data_pipeline_standalone_scripts_spark.operators.mlfit import (
        TE_SMOOTH,
    )

    r = _run("q_target_encoding", spark, sf_small).toPandas()
    gmean = r.n_returned.sum() / r.n.sum()
    raw = r.n_returned / r.n
    lo = raw.combine(gmean, min)
    hi = raw.combine(gmean, max)
    assert ((r.encoded >= lo - 1e-9) & (r.encoded <= hi + 1e-9)).all()
    recon = (r.n_returned + TE_SMOOTH * gmean) / (r.n + TE_SMOOTH)
    assert (abs(r.encoded - recon.round(6)) < 1e-9).all()


def test_kmv_exact_path_and_estimator_error(spark, sf_small):
    """Where the merged sketch is unsaturated the op must be EXACT
    (kmv == exact for both union and jaccard); where saturated, the
    (k-1)/u_k estimator must land within 5 standard errors
    (se ~ 1/sqrt(k-2)) of the exact union."""
    from data_pipeline_standalone_scripts_spark.operators.sketches import (
        KMV_SET_K,
    )

    r = _run("q_kmv_set_ops", spark, sf_small).toPandas()
    assert ((r.exact_jaccard >= 0) & (r.exact_jaccard <= 1)).all()
    exact_path = r[r.k_used < KMV_SET_K]
    assert (exact_path.kmv_union_est == exact_path.exact_union).all()
    assert (
        abs(
            exact_path.kmv_jaccard
            - (exact_path.exact_jaccard)
        )
        < 1e-6
    ).all()
    est_path = r[r.k_used == KMV_SET_K]
    if len(est_path):
        rel = abs(est_path.kmv_union_est - est_path.exact_union) / est_path.exact_union
        assert (rel < 5.0 / (KMV_SET_K - 2) ** 0.5).all(), rel.max()


def test_dup_spans_partition_the_dup_windows(spark, sf_small):
    """Per doc, the spans' contributing-window counts must sum to
    exactly X51's n_dup_windows (same owner election, two views of the
    same set); spans are disjoint with >= K-1 token gaps, each at
    least K tokens wide, and end within the document."""
    from data_pipeline_standalone_scripts_spark.operators.dedup_ext import (
        SUBSTR_K,
    )

    spans = _run("q_dup_span_trim", spark, sf_small).toPandas()
    ledger = _run("q_substring_dedup", spark, sf_small).toPandas()
    per_doc = spans.groupby("doc_id").n_windows.sum()
    led = ledger.set_index("doc_id").n_dup_windows
    for doc, n in per_doc.items():
        assert led[doc] == n, (doc, n, led[doc])
    assert set(ledger[ledger.n_dup_windows > 0].doc_id) == set(spans.doc_id)
    assert (spans.span_tokens >= SUBSTR_K).all()
    assert (
        spans.span_tokens == spans.span_end - spans.span_start + 1
    ).all()
    lens = (
        load(spark, sf_small, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n_toks"))
        .toPandas()
        .set_index("doc_id")
        .n_toks
    )
    assert (spans.span_end <= spans.doc_id.map(lens)).all()
    s = spans.sort_values(["doc_id", "span_start"])
    prev_end = s.groupby("doc_id").span_end.shift()
    gap_ok = prev_end.isna() | (s.span_start - prev_end > SUBSTR_K - 1)
    assert gap_ok.all()


def test_semantic_dedup_budget_and_km1_consistency(spark, sf_small):
    """The drop budget is exactly ceil(n/8) per non-singleton cluster
    where n is KM1's member count for that cluster (the two ops share
    the integer Lloyd verbatim), ranks are 1..budget, and scores are
    valid rounded cosines."""
    from data_pipeline_standalone_scripts_spark.operators.clustering import (
        SEMDEDUP_DROP_DIV,
    )

    drop = _run("q_semantic_dedup", spark, sf_small).toPandas()
    km = _run("q_kmeans_embed", spark, sf_small).toPandas()
    sizes = km.set_index("cluster_id").n_members
    per = drop.groupby("cluster_id").agg(
        n_drop=("vec_id", "size"), max_rk=("redundancy_rank", "max")
    )
    for cid, row in per.iterrows():
        n = int(sizes[cid])
        budget = (n + SEMDEDUP_DROP_DIV - 1) // SEMDEDUP_DROP_DIV
        assert row.n_drop == budget, (cid, row.n_drop, budget, n)
        assert row.max_rk == budget
    # every multi-member cluster must appear (budget >= 1 there)
    assert set(per.index) == set(sizes[sizes >= 2].index)
    assert ((drop.max_cos >= -1 - 1e-9) & (drop.max_cos <= 1 + 1e-9)).all()


def test_dsir_selection_invariants(spark, sf_small):
    """Exactly TOPK raw-pool docs (no target docs), weights sorted
    descending with doc_id tiebreak, and each doc's feature count is
    2·|tokens| − 1 (unigrams + bigrams) recomputed from raw text."""
    from data_pipeline_standalone_scripts_spark.operators.textpipe import (
        DSIR_TOPK,
    )

    r = _run("q_dsir_selection", spark, sf_small).toPandas()
    assert len(r) == DSIR_TOPK
    assert (r.doc_id % 97 != 0).all()
    w = list(zip(-r.dsir_micro_nats, r.doc_id))
    assert w == sorted(w)
    toks = (
        load(spark, sf_small, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .toPandas()
        .set_index("doc_id")
        .n
    )
    expect = r.doc_id.map(toks).map(lambda n: n + max(n - 1, 0))
    assert (r.n_feats == expect).all()
