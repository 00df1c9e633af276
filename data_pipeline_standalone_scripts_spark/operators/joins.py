"""Join operators J1–J12 (SURVEY.md §2.3).

Reference capability: the parameter-sweep grid joins and metadata
correlation of datapipe/optimization/* and benchmark/assess.py
(SURVEY.md §2.12) — here generalized to the full relational join
surface, expressed declaratively so Catalyst/AQE pick the physical
strategy.

Scale notes (100 TB), per operator in its docstring; the common rules:
- dimension tables (region/nation/supplier at TPC-H ratios) are
  broadcast — an explicit `F.broadcast` hint, so no shuffle of the
  fact side by dim keys ever happens;
- fact⋈fact joins shuffle on the join key; AQE handles skew
  (skewJoin splits oversized partitions at runtime);
- non-equi joins are ALWAYS reduced to an equi-join prefilter
  (bucket key) + residual predicate — a raw BroadcastNestedLoopJoin
  over 100 TB is not a plan, it's an outage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load
from .common import dsum, o_dsum

CAT = "joins"


@register(
    "q_join_broadcast",
    oracle="""
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    category=CAT,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: nation⋈region with an explicit broadcast hint.

    Scale: region is 5 rows at any SF — broadcast is the only sane
    physical plan; the hint makes it deterministic rather than
    threshold-dependent (plan shows BroadcastHashJoin).
    """
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name", "r_name")
    )


@register(
    "q_join_shuffle",
    oracle=f"""
        SELECT o_orderpriority,
               COUNT(*) AS n_items,
               {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    category=CAT,
)
def q_join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: lineitem⋈orders — both fact-sized, shuffles on orderkey.

    Scale: classic co-partitioned join; at 100 TB both sides would be
    bucketed by orderkey at write time so the Exchange disappears.
    AQE may still downgrade to broadcast at small SF — that's the
    point of leaving the strategy to the optimizer.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@register(
    "q_join_star3",
    oracle=f"""
        SELECT o_orderkey,
               {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
               {("strftime(o_orderdate, '%Y-%m-%d')")} AS orderdate
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    category=CAT,
)
def q_join_star3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: TPC-H Q3 shape — customer⋈orders⋈lineitem, BUILDING
    segment, top-10 open orders by revenue (tie-break o_orderkey).

    Scale: customer filter first (segment selectivity ~1/5), then
    orders, then lineitem — dims-to-facts ordering keeps intermediate
    rows minimal; top-k via TakeOrderedAndProject, no global sort.
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
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


@register(
    "q_join_star6",
    oracle=f"""
        SELECT n_name,
               {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    category=CAT,
)
def q_join_star6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 (flagship): TPC-H Q5 shape — 6-way star join, ASIA revenue
    by nation for order years 1995–1996.

    Scale: the two fact tables (orders, lineitem) shuffle once on
    orderkey; supplier/nation/region broadcast; the c_nationkey =
    s_nationkey residual rides the supplier broadcast. Exactly one
    big Exchange in the whole plan — verified via explain().
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
