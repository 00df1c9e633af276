"""Bucketed-layout bench for the shuffle-materialization class
(VERDICT r05 #3): q3 / q5 / interval_coverage at sf10 with the fact
tables pre-bucketed on their join/window keys.

SCALE.md's 100 TB answer for these rows is "pay the fact shuffle once
at write time": bucket lineitem+orders by orderkey, bucket events by
user_id. This harness MATERIALIZES that layout for the sf10 fixture
(bucketBy into the session warehouse, data under .testdata_sf10b/),
re-expresses the three queries against the bucketed tables, asserts
the fact exchange is GONE from each plan, checks value equality with
the registry ops, and times both forms under the bench protocol
(2 warm-ups, clearCache between runs, median of 5).

Usage:
    python -m tools.bench_bucketed           # build (if needed) + bench
    python -m tools.bench_bucketed rebuild   # force table rebuild
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_standalone_scripts_spark import load_all_operators
from data_pipeline_standalone_scripts_spark.operators.common import (
    dsum,
    release_persists,
)
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.session import get_spark
from data_pipeline_standalone_scripts_spark.tables import load

SF_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".testdata_sf10"
)
BUCKET_DIR = SF_DIR + "b"
N_BUCKETS = 32
TABLES = {"b10_orders", "b10_lineitem", "b10_events"}


def build_tables(spark, rebuild: bool) -> None:
    have = {t.name for t in spark.catalog.listTables()}
    if TABLES <= have and not rebuild and os.path.isdir(BUCKET_DIR):
        return
    if os.path.isdir(BUCKET_DIR):
        shutil.rmtree(BUCKET_DIR)
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    t0 = time.time()
    (
        load(spark, SF_DIR, "orders")
        .repartition(N_BUCKETS, "o_orderkey")
        .write.mode("overwrite")
        .option("path", os.path.join(BUCKET_DIR, "orders"))
        .bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b10_orders")
    )
    (
        load(spark, SF_DIR, "lineitem")
        .repartition(N_BUCKETS, "l_orderkey")
        .write.mode("overwrite")
        .option("path", os.path.join(BUCKET_DIR, "lineitem"))
        .bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b10_lineitem")
    )
    (
        load(spark, SF_DIR, "events")
        .repartition(N_BUCKETS, "user_id")
        .write.mode("overwrite")
        .option("path", os.path.join(BUCKET_DIR, "events"))
        .bucketBy(N_BUCKETS, "user_id")
        .sortBy("user_id", "ts")
        .saveAsTable("b10_events")
    )
    print(f"built bucketed tables in {time.time() - t0:.1f}s", flush=True)


def q3_bucketed(spark, sf_dir):
    """q_join_star3 over bucketed orders/lineitem: the orderkey join is
    a co-located SortMergeJoin (zero fact exchange) and the
    groupBy(o_orderkey, ...) reuses the same clustering."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.table("b10_orders").filter(F.col("o_orderdate") < cutoff)
    li = spark.table("b10_lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(
            orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q5_bucketed(spark, sf_dir):
    """q_join_star6 over bucketed orders/lineitem: the orderkey fact
    join co-locates; the custkey join and final n_name agg remain the
    (broadcast-pruned) residual shuffles."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = spark.table("b10_orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = spark.table("b10_lineitem")
    dims = (
        supplier.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    li_asia = li.select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    ).join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
    return (
        li_asia.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


def interval_bucketed(spark, sf_dir):
    """q_interval_coverage over events bucketed by user_id: the one
    mandatory fact exchange (window partitionBy user_id) disappears —
    the bucketed scan already satisfies the distribution."""
    from data_pipeline_standalone_scripts_spark.operators.finance import (
        interval_coverage_core,
    )

    e = spark.table("b10_events")
    sec = F.expr("unix_micros(ts) div 1000000")
    width = (F.lit(10) + F.from_json("props", "k long")["k"] % 50) * 60
    iv = e.select(
        "user_id", "event_id", sec.alias("s"), (sec + width).alias("e")
    )
    return interval_coverage_core(iv)


def assert_no_fact_exchange(df, label: str, key_frag: str) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line and key_frag in line:
            raise AssertionError(f"{label}: fact exchange survived: {line}")
    print(f"[plan] {label}: no {key_frag} exchange", flush=True)


def run_once(fn, spark, sf):
    t0 = time.perf_counter()
    fn(spark, sf).toPandas()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    release_persists()
    return dt


def main() -> None:
    rebuild = len(sys.argv) > 1 and sys.argv[1] == "rebuild"
    spark = get_spark()
    load_all_operators()
    build_tables(spark, rebuild)

    assert_no_fact_exchange(q3_bucketed(spark, SF_DIR), "q3_bucketed", "l_orderkey")
    assert_no_fact_exchange(q5_bucketed(spark, SF_DIR), "q5_bucketed", "l_orderkey")
    assert_no_fact_exchange(
        interval_bucketed(spark, SF_DIR), "interval_bucketed", "user_id"
    )

    pairs = {
        "q3": (REGISTRY["q_join_star3"].fn, q3_bucketed),
        "q5": (REGISTRY["q_join_star6"].fn, q5_bucketed),
        "interval": (REGISTRY["q_interval_coverage"].fn, interval_bucketed),
    }
    # value equality first
    for name, (plain, bucketed) in pairs.items():
        a = plain(spark, SF_DIR).toPandas()
        b = bucketed(spark, SF_DIR).toPandas()
        a = a.sort_values(list(a.columns)).reset_index(drop=True)
        b = b.sort_values(list(b.columns)).reset_index(drop=True)
        assert a.equals(b), f"{name}: bucketed result differs"
        release_persists()
        print(f"[values] {name}: bucketed == plain ({len(a)} rows)", flush=True)

    forms = {}
    for name, (plain, bucketed) in pairs.items():
        forms[f"{name}_plain"] = plain
        forms[f"{name}_bucketed"] = bucketed
    for fn in forms.values():
        run_once(fn, spark, SF_DIR)
        run_once(fn, spark, SF_DIR)
    res = {n: [] for n in forms}
    for _ in range(5):
        for name, fn in forms.items():
            res[name].append(run_once(fn, spark, SF_DIR))
    out = {n: round(statistics.median(ts), 4) for n, ts in res.items()}
    print(json.dumps({"metric": "bucketed_vs_plain_median_wall",
                      "unit": "sec", "sf": 10.0, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
