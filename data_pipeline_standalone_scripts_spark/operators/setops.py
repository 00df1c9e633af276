"""Set operators U1–U4 (SURVEY.md §2.7).

Scale notes: UNION ALL is a zero-shuffle concatenation of lineages;
DISTINCT/INTERSECT/EXCEPT shuffle on the full row — at 100 TB apply
them after projecting to the minimal key set (done here: single-key
projections), and prefer semi/anti joins when one side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

CAT = "setops"


def _slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    b = o.filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    return a, b


_SLICES_SQL = """
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION {all_kw}
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 250000
"""


@register("q_union_all", oracle=_SLICES_SQL.format(all_kw="ALL"), category=CAT)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: UNION ALL of two overlapping slices (duplicates kept)."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b)


@register("q_union_distinct", oracle=_SLICES_SQL.format(all_kw=""), category=CAT)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: UNION with dedup — one shuffle on the projected row."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b).distinct()


@register(
    "q_intersect",
    oracle="""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    category=CAT,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: custkeys both in BUILDING segment and holding urgent orders."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.select("c_custkey").intersect(o.select(F.col("o_custkey").alias("c_custkey")))


@register(
    "q_except",
    oracle="""
        SELECT o_custkey FROM orders
        EXCEPT
        SELECT user_id AS o_custkey FROM events WHERE event_type = 'purchase'
    """,
    category=CAT,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: customers with orders but no purchase events (EXCEPT ≡
    distinct + left-anti join; Catalyst plans exactly that)."""
    o = load(spark, sf_dir, "orders").select("o_custkey")
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("o_custkey"))
    )
    return o.subtract(e)


# --- reshape ----------------------------------------------------------------

_UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "q_unpivot",
    oracle=f"""
        UNPIVOT (
            SELECT l_orderkey, l_linenumber, {", ".join(_UNPIVOT_MEASURES)}
            FROM lineitem WHERE l_orderkey < 200
        )
        ON {", ".join(_UNPIVOT_MEASURES)}
        INTO NAME measure VALUE val
    """,
    category=CAT,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt): the four lineitem measures
    become (measure, val) rows keyed by (orderkey, linenumber) — the
    inverse of A13's pivot and the standard shape for feeding generic
    metric pipelines. Values are raw column pass-throughs (no
    arithmetic), so cross-engine equality is exact.

    Scale: narrow ×4 row expansion, zero shuffle — Expand node in the
    plan, no exchange. The filter prunes at the scan before expansion.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 200)
        .select("l_orderkey", "l_linenumber", *_UNPIVOT_MEASURES)
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        list(_UNPIVOT_MEASURES),
        "measure",
        "val",
    )


@register(
    "q_string_agg",
    oracle="""
        SELECT n.n_name,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               string_agg(c.c_name, '|' ORDER BY c.c_name) AS names
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 9000
        GROUP BY n.n_name
    """,
    category=CAT,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): per nation, the '|'-joined
    sorted list of high-balance customer names. Spark has no ordered
    string_agg — the portable spelling is collect_list → array_sort →
    array_join, which is deterministic regardless of partition merge
    order (the sort happens after collection).

    Scale: the collected list is bounded by group size — fine for
    dimension-keyed groups; for unbounded groups cap with slice() after
    array_sort (top-N names) so no single group's string exceeds memory.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("names"),
        )
    )


_BAG_SQL = """
    SELECT o_custkey, o_orderstatus FROM orders
    WHERE o_orderpriority = '1-URGENT'
    {op} ALL
    SELECT o_custkey, o_orderstatus FROM orders
    WHERE o_totalprice > 250000
"""


def _bag_slices(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(custkey, status) projections — customers repeat across orders,
    so the slices are true BAGS and the ALL variants differ from the
    distinct forms (U3/U4 would collapse them)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey", "o_orderstatus"
    )
    b = o.filter(F.col("o_totalprice") > 250000).select(
        "o_custkey", "o_orderstatus"
    )
    return a, b


@register(
    "q_intersect_all", oracle=_BAG_SQL.format(op="INTERSECT"), category=CAT
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: INTERSECT ALL — bag semantics: each row appears
    min(count_a, count_b) times, the multiplicity the distinct form
    (U3) destroys. The SQL-standard way to reconcile event streams
    where duplicate rows are real occurrences, not noise.

    Scale: plans as a row-keyed aggregate of per-side counts (Spark:
    generate+min over a count join) — one shuffle on the projected
    row, same economics as the distinct form plus a counter column.
    """
    a, b = _bag_slices(spark, sf_dir)
    return a.intersectAll(b)


@register(
    "q_except_all", oracle=_BAG_SQL.format(op="EXCEPT"), category=CAT
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6: EXCEPT ALL — bag difference: each row survives
    max(count_a − count_b, 0) times. The multiplicity-aware "what's
    in the new batch beyond the old" question that anti-join (which
    is per-key, not per-occurrence) cannot answer.

    Scale: same single-shuffle count-merge plan as U5.
    """
    a, b = _bag_slices(spark, sf_dir)
    return a.exceptAll(b)
