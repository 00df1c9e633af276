"""Tolerance tests for approximate operators (SURVEY.md §5.2.5)."""

from pyspark.sql import functions as F

from data_pipeline_standalone_scripts_spark.operators.aggregates import (
    q_agg_approx_distinct,
)
from data_pipeline_standalone_scripts_spark.operators.llm import (
    minhash_candidates,
    q_jaccard_neardup,
)
from data_pipeline_standalone_scripts_spark.tables import load


def test_approx_distinct_within_5pct(spark, sf_med):
    """A3: HLL estimate within ±5% of the exact distinct count."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in q_agg_approx_distinct(spark, sf_med).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load(spark, sf_med, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, est in approx.items():
        assert abs(est - exact[t]) / exact[t] <= 0.05, (t, est, exact[t])


def test_lsh_candidates_cover_exact_pairs(spark, sf_small):
    """L8: the MinHash-LSH candidate set is a superset of the exact
    Jaccard>=0.8 pairs (recall check; precision is handled by the
    exact verification stage)."""
    cand = {
        (r["doc_a"], r["doc_b"]) for r in minhash_candidates(spark, sf_small).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]) for r in q_jaccard_neardup(spark, sf_small).collect()
    }
    assert exact, "exact near-dup set unexpectedly empty — test data changed?"
    missed = exact - cand
    assert not missed, f"LSH missed {len(missed)}/{len(exact)} true pairs: {sorted(missed)[:5]}"


def test_approx_percentile_close_to_exact(spark, sf_med):
    """A14 vs A10 machinery: the sketch answer must sit within 1% of
    the exact percentile per group (accuracy=10000 on ~1.5k-150k row
    groups is effectively exact)."""
    from pyspark.sql import functions as F

    from data_pipeline_standalone_scripts_spark.operators.aggregates import (
        q_agg_approx_percentile,
    )

    approx = {
        r["o_orderstatus"]: (r["p50_approx"], r["p90_approx"])
        for r in q_agg_approx_percentile(spark, sf_med).collect()
    }
    exact = {
        r["o_orderstatus"]: (r["p50"], r["p90"])
        for r in load(spark, sf_med, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for status, (a50, a90) in approx.items():
        e50, e90 = exact[status]
        assert abs(a50 - e50) / e50 < 0.01, (status, a50, e50)
        assert abs(a90 - e90) / e90 < 0.01, (status, a90, e90)
