"""Round-12 optimization gates: internals changed for performance must
keep results identical and hold their claimed plan shapes."""

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.tables import load

engine.load_all_operators()


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_interval_coverage_bucketed_layout_is_exchange_free(
    spark, sf_small, tmp_path
):
    """VERDICT r11 #8: with events bucketed by user_id (the deployment
    layout), q_interval_coverage's one exchange becomes a scan
    property — the plan must carry ZERO Exchange nodes and the result
    must equal the plain-parquet path row for row."""
    from data_pipeline_standalone_scripts_spark.operators.finance import (
        EVENTS_BUCKETED_TABLE_CONF,
    )

    tbl = "r12_events_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        load(spark, sf_small, "events")
        .repartition(4, "user_id")
        .write.mode("overwrite")
        .option("path", str(tmp_path / "events_bucketed"))
        .bucketBy(4, "user_id")
        .sortBy("user_id")
        .saveAsTable(tbl)
    )
    fn = REGISTRY["q_interval_coverage"].fn
    plain = fn(spark, sf_small).toPandas().sort_values("user_id").reset_index(drop=True)
    spark.conf.set(EVENTS_BUCKETED_TABLE_CONF, tbl)
    try:
        df = fn(spark, sf_small)
        plan = plan_of(df)
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan[:1200]
        bucketed = df.toPandas().sort_values("user_id").reset_index(drop=True)
    finally:
        spark.conf.unset(EVENTS_BUCKETED_TABLE_CONF)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    assert plain.equals(bucketed)


def test_scan_handle_cache_returns_fresh_lazy_scans(spark, sf_small):
    """r12: tables.load memoizes the ANALYZED scan handle per
    (session, sf_dir, table). The handle must stay lazy — no storage
    level, no InMemoryRelation in the plan — so every execution still
    reads the parquet from disk."""
    df1 = load(spark, sf_small, "lineitem")
    df2 = load(spark, sf_small, "lineitem")
    assert df1 is df2  # the memo actually hits
    assert df1.storageLevel.useMemory is False
    assert df1.storageLevel.useDisk is False
    assert "InMemoryRelation" not in df1._jdf.queryExecution().toString()
    # distinct sf_dirs never alias (ADVICE r12 #3: guard rather than
    # error on boxes without the second fixture tier)
    other = "/root/testdata/sf0.01"
    if os.path.isdir(other):
        assert load(spark, other, "lineitem") is not df1


def test_scan_cache_invalidation_serves_fresh_listing(spark, tmp_path):
    """ADVICE r12 #1 hardening: an in-session rewrite of a fixture dir
    is served stale by design (catalog-table semantics); the explicit
    invalidate_scan_cache REFRESH analog must pick up the new files."""
    from data_pipeline_standalone_scripts_spark.tables import (
        invalidate_scan_cache,
    )

    d = str(tmp_path / "sf_rw")
    src = load(spark, "/root/testdata/sf0.001", "nation")
    src.limit(3).write.parquet(f"{d}/nation.parquet")
    assert load(spark, d, "nation").count() == 3
    src.limit(5).write.mode("overwrite").parquet(f"{d}/nation.parquet")
    # stale-by-design: the cached handle still serves the old listing
    # (same contract as an unrefreshed catalog table)
    invalidate_scan_cache(d)
    assert load(spark, d, "nation").count() == 5


def test_simhash_fold_sql_matches_naive_conditional_sum(spark, sf_small):
    """r12: the fingerprint fold moved to one parsed CASE-sum
    expression. Pin it against the naive 60-conditional-sum Column
    formulation doc-by-doc (the same cross-check the SWAR packing
    carries in its docstring)."""
    from pyspark.sql import functions as F

    from data_pipeline_standalone_scripts_spark.operators.dedup_ext import (
        SIMHASH_BITS,
        simhash_fingerprints,
    )

    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(spark, sf_small).collect()
    }
    tok = load(spark, sf_small, "documents").select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    ).withColumn(
        "h", F.expr("cast(conv(substring(md5(token), 1, 15), 16, 10) as long)")
    )
    bits = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.expr(f"shiftright(h, {j}) & 1")).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ],
    )
    naive = bits.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{j}") * 2 > F.col("n"), F.lit(1 << j)).otherwise(
                    F.lit(0)
                )
                for j in range(SIMHASH_BITS)
            ],
            F.lit(0),
        ).cast("long").alias("simhash"),
    )
    want = {r["doc_id"]: r["simhash"] for r in naive.collect()}
    assert got == want
