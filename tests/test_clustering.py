"""Invariants for the clustering family (KM1/KM2) beyond oracle
parity: partition totality for k-means, unit-norm + idempotent
determinism for the power-method component."""

import math

from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.tables import load
import data_pipeline_standalone_scripts_spark as engine

engine.load_all_operators()


def test_kmeans_partitions_whole_corpus(spark, sf_small):
    rows = REGISTRY["q_kmeans_embed"].fn(spark, sf_small).collect()
    n_vecs = load(spark, sf_small, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vecs
    assert all(r.inertia_micro2 >= 0 for r in rows)
    # every cluster id must come from the deterministic init range
    assert {r.cluster_id for r in rows} <= set(range(8))


def test_kmeans_assignment_is_deterministic(spark, sf_small):
    a = sorted(map(tuple, REGISTRY["q_kmeans_embed"].fn(spark, sf_small).collect()))
    b = sorted(map(tuple, REGISTRY["q_kmeans_embed"].fn(spark, sf_small).collect()))
    assert a == b  # bit-identical across runs, not just approximately


def test_power_iteration_unit_norm(spark, sf_small):
    rows = REGISTRY["q_power_iteration_pc"].fn(spark, sf_small).collect()
    assert len(rows) == 64
    assert sorted(r.pos for r in rows) == list(range(1, 65))
    nrm = math.sqrt(sum(r.loading**2 for r in rows))
    # re-quantization truncates at 1e-6 per component; 64 components
    assert abs(nrm - 1.0) < 1e-3, nrm


def test_ppjoin_equals_naive_allpairs(spark, sf_small):
    """X38's prefix filter must be lossless: bit-identical pair set
    and jaccard values vs the L7 all-pairs baseline."""
    pp = sorted(map(tuple, REGISTRY["q_ppjoin_neardup"].fn(spark, sf_small).collect()))
    naive = sorted(map(tuple, REGISTRY["q_jaccard_neardup"].fn(spark, sf_small).collect()))
    assert pp == naive


def test_curation_funnel_is_monotone(spark, sf_small):
    """C7: each stage can only shrink the corpus — docs and tokens
    non-increasing down the funnel, retention starts at 1.0."""
    rows = {r.stage: r for r in REGISTRY["q_curation_funnel"].fn(spark, sf_small).collect()}
    order = ["s0_ingest", "s1_quality", "s2_exact_dedup",
             "s3_prefix_dedup", "s4_lang_en"]
    assert set(rows) == set(order)
    for a, b in zip(order, order[1:]):
        assert rows[b].n_docs <= rows[a].n_docs
        assert rows[b].n_tokens <= rows[a].n_tokens
    assert rows["s0_ingest"].docs_retained == 1.0


def test_incremental_agg_counts_delta(spark, sf_small):
    """A16: merged totals must cover every row, and the delta column
    must count only the new epoch."""
    rows = REGISTRY["q_incremental_agg"].fn(spark, sf_small).collect()
    from data_pipeline_standalone_scripts_spark.tables import load
    li = load(spark, sf_small, "lineitem")
    assert sum(r.n_rows for r in rows) == li.count()
    import pyspark.sql.functions as F
    n_delta = li.filter(F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp")).count()
    assert sum(r.n_delta for r in rows) == n_delta


def test_semantic_dedup_rounding_matches_engine_round_on_negatives(spark):
    """ADVICE r07 #1: the SemDeDup kernel's micro-rounding must be
    HALF_UP AWAY FROM ZERO on negative cosines too (Spark F.round and
    DuckDB ROUND semantics), not floor(x+0.5)'s half-toward-+inf.
    Probes the exact negative half-microtick plus Spark itself."""
    import numpy as np
    from pyspark.sql import functions as F

    vals = [-0.0000005, -1.2345675, -0.9999995, 0.0000005, 1.2345675, 0.0]
    C = np.array(vals)
    kernel = (
        np.where(C >= 0, np.floor(C * 1e6 + 0.5), np.ceil(C * 1e6 - 0.5)) / 1e6
    )
    spark_side = [
        r[0]
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round("x", 6))
        .collect()
    ]
    assert list(kernel) == spark_side, (list(kernel), spark_side)
    # the specific divergence the old floor(x+0.5) form had:
    assert kernel[0] == -0.000001  # floor form gave -0.0 (toward +inf)
