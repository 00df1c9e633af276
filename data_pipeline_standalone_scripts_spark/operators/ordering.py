"""Sort / limit / top-k / sampling operators O1–O3 (SURVEY.md §2.6).

Scale notes: orderBy().limit(k) compiles to TakeOrderedAndProject —
each partition keeps a k-heap, the driver merges n_partitions×k rows;
no global sort ever materializes. Deterministic sampling uses
arithmetic hashing (portable across engines), never `df.sample`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

CAT = "ordering"


@register(
    "q_order_multi",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               NULLIF(o_orderstatus, 'P') AS status_or_null
        FROM orders
        ORDER BY status_or_null ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
        LIMIT 50
    """,
    category=CAT,
)
def q_order_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: multi-column order with explicit nulls placement + limit.
    (NULLIF synthesizes nulls; data is null-free.) Tie-break on the
    unique o_orderkey makes the limited set deterministic."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        )
        .orderBy(
            F.col("status_or_null").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(50)
    )


@register(
    "q_topk_global",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
        ORDER BY revenue DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 20
    """,
    category=CAT,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global top-20 by computed revenue, tie-broken on the unique
    (l_orderkey, l_linenumber) pair. TakeOrderedAndProject: per-
    partition heaps, no shuffle of the full table."""
    li = load(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    return (
        li.select("l_orderkey", "l_linenumber", rev)
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"), F.col("l_linenumber"))
        .limit(20)
    )


@register(
    "q_sample_deterministic",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE (o_orderkey * 2654435761) % 4294967296 < 429496730
    """,
    category=CAT,
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: deterministic ~10% "sample" via Knuth multiplicative hash on
    the key — pure BIGINT arithmetic, portable across engines, unlike
    df.sample (RNG/partition dependent). Scale: embarrassingly
    parallel scan-side filter."""
    o = load(spark, sf_dir, "orders")
    h = (F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296)
    return o.filter(h < 429496730).select("o_orderkey", "o_custkey", "o_totalprice")

# Morton (Z-order) interleave of the low 16 bits of two keys. Even bit
# positions take l_partkey's bits, odd take l_suppkey's — the curve that
# makes a single range of the code cover a 2-D rectangle of key space.
_MORTON_BITS = 16


def _morton_spark() -> str:
    terms = [
        f"(shiftleft(shiftright(l_partkey, {i}) & 1, {2 * i}) "
        f"+ shiftleft(shiftright(l_suppkey, {i}) & 1, {2 * i + 1}))"
        for i in range(_MORTON_BITS)
    ]
    return "cast(" + " + ".join(terms) + " as bigint)"


def _morton_duck() -> str:
    terms = [
        f"((((l_partkey >> {i}) & 1) << {2 * i}) "
        f"+ (((l_suppkey >> {i}) & 1) << {2 * i + 1}))"
        for i in range(_MORTON_BITS)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "q_morton_cluster",
    oracle=f"""
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               {_morton_duck()} AS morton
        FROM lineitem
        ORDER BY morton ASC, l_orderkey ASC, l_linenumber ASC
        LIMIT 100
    """,
    category=CAT,
)
def q_morton_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: Z-order (Morton) clustering key — interleave the low 16 bits
    of (l_partkey, l_suppkey) and take the first 100 rows of the curve
    (tie-broken on the unique PK). Pure BIGINT shift/mask arithmetic,
    identical in both engines, fully inside codegen.

    Scale: this is the write-side clustering pattern (Delta/Iceberg
    Z-ORDER): `repartitionByRange(morton).sortWithinPartitions(morton)`
    before a parquet write yields files whose (partkey, suppkey)
    min/max envelopes are tight rectangles, so point/range predicates
    on EITHER column prune files — one sort buys data-skipping on two
    dimensions. The query form here computes the key and reads back
    the head of the curve (TakeOrderedAndProject, no global sort).
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            F.expr(_morton_spark()).alias("morton"),
        )
        .orderBy("morton", "l_orderkey", "l_linenumber")
        .limit(100)
    )
