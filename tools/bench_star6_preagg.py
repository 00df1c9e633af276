"""Counterbalanced ABBA: q5 (q_join_star6) shipped form vs the
pre-aggregated-lineitem lever (VERDICT r07 "Next round #8") — the one
untried shape: collapse ASIA lineitem revenue to
(l_orderkey, s_nationkey) grain BEFORE the join chain, cutting the big
orderkey exchange's payload to ~order-grain rows (lineitem is
file-ordered by orderkey, so the map-side partial combine does most of
the collapse before any exchange). Revenue micros partial-sum exactly
(BIGINT), so values are bit-identical to dsum.

Usage: python -m tools.bench_star6_preagg [--sf DIR] [--runs N]
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

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.operators.common import (
    _half_away_micros,
    release_persists,
)
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.session import get_spark
from data_pipeline_standalone_scripts_spark.tables import load


def star6_preagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    dims = (
        supplier.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    li_asia = li.select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    ).join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
    pre = li_asia.groupBy("l_orderkey", "s_nationkey", "n_name").agg(
        F.sum(
            _half_away_micros(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            )
        ).alias("rev_micro")
    )
    return (
        pre.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg((F.sum("rev_micro") / 1_000_000.0).alias("revenue"))
    )


def _timed(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).toPandas()
    dt = time.time() - t0
    release_persists()
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.testdata_sf10")
    ap.add_argument("--runs", type=int, default=8)
    args = ap.parse_args()

    engine.load_all_operators()
    spark = get_spark("star6-ab")
    shipped = REGISTRY["q_join_star6"].fn
    a = shipped(spark, args.sf).toPandas().sort_values("n_name").reset_index(drop=True)
    release_persists()
    b = star6_preagg(spark, args.sf).toPandas().sort_values("n_name").reset_index(drop=True)
    release_persists()
    same = a.equals(b[a.columns])
    st, pt = [], []
    for i in range(args.runs):
        if i % 2 == 0:
            st.append(_timed(shipped, spark, args.sf))
            pt.append(_timed(star6_preagg, spark, args.sf))
        else:
            pt.append(_timed(star6_preagg, spark, args.sf))
            st.append(_timed(shipped, spark, args.sf))
    print(
        json.dumps(
            {
                "op": "q5_star6_preagg_lever",
                "sf": args.sf,
                "values_equal": bool(same),
                "shipped_median": round(statistics.median(st), 4),
                "preagg_median": round(statistics.median(pt), 4),
                "preagg_vs_shipped": round(
                    statistics.median(pt) / statistics.median(st), 3
                ),
                "shipped_runs": [round(t, 3) for t in st],
                "preagg_runs": [round(t, 3) for t in pt],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
