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
