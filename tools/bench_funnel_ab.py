"""Counterbalanced ABBA: round-4 multi-pass funnel/retention forms vs
the round-8 single-pass rewrites (VERDICT r07 "Next round #2").

Old forms reconstructed below exactly as the r4 implementations the
docstrings describe (3 type-filtered groupBy-MIN passes chained by
joins for the funnel; first-touch agg + join-back + COUNT DISTINCT for
retention). Each repetition alternates which form runs first (ABBA),
so neither side systematically inherits warm page cache / JIT state —
the lesson from the retracted fixed-order bench_join_conf A/B.

Usage:
    python -m tools.bench_funnel_ab [--sf DIR] [--runs N]
Prints one JSON line per op: {"op", "sf", "values_equal", "old_median",
"new_median", "new_vs_old", "old_runs", "new_runs"}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.operators.common import (
    release_persists,
)
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.session import get_spark
from data_pipeline_standalone_scripts_spark.tables import load


def funnel_r4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 q_funnel_conversion: 3 scans + 3 join-chained shuffles."""
    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    steps = (
        v.agg(F.lit("1_view").alias("step"), F.count(F.lit(1)).alias("n_users"))
        .unionByName(
            c.agg(
                F.lit("2_click").alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
        .unionByName(
            p.agg(
                F.lit("3_purchase").alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    )
    w = Window.orderBy("step")
    nd = F.col("n_users").cast("double")
    return steps.select(
        "step",
        "n_users",
        F.round(nd / F.lag(nd, 1, None).over(w), 6).alias("conv_from_prev"),
    ).withColumn("conv_from_prev", F.coalesce("conv_from_prev", F.lit(1.0)))


def retention_r4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 q_retention_cohort: 2 scans, join-back, COUNT DISTINCT."""
    e = load(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        e.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.expr(
                "cast(datediff(date_trunc('day', ts), cohort_week) div 7"
                " as bigint)"
            ).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


PAIRS = {
    "events_funnel_steps": ("q_funnel_conversion", funnel_r4),
    "events_retention": ("q_retention_cohort", retention_r4),
}


def _timed(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).toPandas()
    dt = time.time() - t0
    release_persists()
    return dt


def _canon(pdf):
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    engine.load_all_operators()
    spark = get_spark("funnel-ab")
    rows = PAIRS
    if args.only:
        keep = set(args.only.split(","))
        rows = {k: v for k, v in PAIRS.items() if k in keep}

    for row, (reg_name, old_fn) in rows.items():
        new_fn = REGISTRY[reg_name].fn
        op = _canon(old_fn(spark, args.sf).toPandas())
        release_persists()
        np_ = _canon(new_fn(spark, args.sf).toPandas())
        release_persists()
        same = op.equals(np_)
        old_t, new_t = [], []
        for i in range(args.runs):
            if i % 2 == 0:  # ABBA counterbalance
                old_t.append(_timed(old_fn, spark, args.sf))
                new_t.append(_timed(new_fn, spark, args.sf))
            else:
                new_t.append(_timed(new_fn, spark, args.sf))
                old_t.append(_timed(old_fn, spark, args.sf))
        om, nm = statistics.median(old_t), statistics.median(new_t)
        print(
            json.dumps(
                {
                    "op": row,
                    "sf": args.sf,
                    "values_equal": bool(same),
                    "old_median": round(om, 4),
                    "new_median": round(nm, 4),
                    "new_vs_old": round(nm / om, 3) if om else None,
                    "old_runs": [round(t, 3) for t in old_t],
                    "new_runs": [round(t, 3) for t in new_t],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
