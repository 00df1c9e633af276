"""Projection / filter / predicate operators P1–P5 (SURVEY.md §2.2).

Reference capability: tailcut thresholding (datapipe/denoising/
tailcut.py — per-pixel predicates over an image) generalized to
columnar predicates; all of these push down to the parquet scan.

Scale notes: every filter here appears in `PushedFilters` of the scan
node — row-group statistics skip unmatched data before decode. That
is the 100 TB story: selectivity applied at the storage layer, not
after a full decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

CAT = "filters"


@register(
    "q_filter_simple",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1996-01-01'
    """,
    category=CAT,
)
def q_filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: single comparison predicate, pushed to parquet row-groups."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate") <= F.lit("1996-01-01").cast("timestamp")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "q_filter_compound",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM orders
        WHERE (o_orderstatus = 'O' AND o_totalprice BETWEEN 50000 AND 150000)
           OR (o_orderpriority IN ('1-URGENT', '2-HIGH') AND NOT o_orderstatus = 'F')
    """,
    category=CAT,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: AND/OR/NOT + IN + BETWEEN boolean algebra."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "O") & F.col("o_totalprice").between(50000, 150000))
        | (
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & ~(F.col("o_orderstatus") == "F")
        )
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@register(
    "q_filter_null_like",
    oracle="""
        SELECT p_partkey, p_name, p_brand,
               (NULLIF(p_type, 'PROMO') IS NULL) AS is_promo
        FROM part
        WHERE p_name LIKE '%bolt%'
           OR regexp_matches(p_brand, 'Brand#1[0-9]$')
    """,
    category=CAT,
)
def q_filter_null_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: LIKE + regex + IS NULL (synthesized via NULLIF — the test
    data is null-free by construction, FIXTURES.md)."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%bolt%") | F.col("p_brand").rlike("Brand#1[0-9]$")
    ).select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.nullif(F.col("p_type"), F.lit("PROMO")).isNull().alias("is_promo"),
    )


@register(
    "q_case_when",
    oracle="""
        SELECT CASE WHEN o_totalprice >= 200000 THEN 'large'
                    WHEN o_totalprice >= 100000 THEN 'medium'
                    WHEN o_orderpriority = '1-URGENT' THEN 'urgent-small'
                    ELSE 'small' END AS order_class,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS total
        FROM orders
        GROUP BY 1
    """,
    category=CAT,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: CASE WHEN derived column feeding an aggregate."""
    from .common import dsum

    o = load(spark, sf_dir, "orders")
    order_class = (
        F.when(F.col("o_totalprice") >= 200000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .when(F.col("o_orderpriority") == "1-URGENT", "urgent-small")
        .otherwise("small")
    )
    return (
        o.select(order_class.alias("order_class"), "o_totalprice")
        .groupBy("order_class")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
    )


@register(
    "q_computed_cols",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
               l_quantity * l_extendedprice AS gross
        FROM lineitem
        WHERE l_linenumber = 1 AND l_orderkey % 10 = 0
    """,
    category=CAT,
)
def q_computed_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: arithmetic projections. Per-row double arithmetic is
    deterministic (same IEEE ops, same association both engines) —
    no rounding needed, unlike aggregates."""
    li = load(spark, sf_dir, "lineitem")
    ep, d, t = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 10 == 0)).select(
        "l_orderkey",
        "l_linenumber",
        (ep * (1 - d)).alias("revenue"),
        (ep * (1 - d) * (1 + t)).alias("charge"),
        (F.col("l_quantity") * ep).alias("gross"),
    )
