"""TPC-H completion set: the classic decision-support shapes not yet
covered by q_agg_pricing_summary (Q1), q_join_star3/6 (Q3/Q5),
q_corr_subquery (Q17-shape on customers) and the olap.py trio
(Q8/Q18/Q12). With this module, every TPC-H query shape a user of a
classic OLAP engine would run has a named, oracle-checked analog —
adapted where the test schema lacks a table (no partsupp, no
commit/receipt dates; each docstring states the adaptation).

Determinism discipline (SURVEY.md §1.3): all money aggregates are
exact micro-unit BIGINT sums (`round(x·1e6)` per row, long addition),
unscaled and rounded once at the end; every comparison threshold is
either an exact long or a double computed by the identical expression
on both engines. No bare float SUMs cross the oracle boundary.

Scale notes (100 TB): each op names its one necessary fact shuffle;
every dimension side is broadcast (region→nation→supplier/customer
chains prune before touching the fact). The EXISTS/NOT-EXISTS pair in
q_waiting_suppliers is deliberately re-expressed as a per-order
windowed aggregate on the Spark side — one shuffle on orderkey instead
of two correlated self-joins — while the oracle keeps the textbook
correlated form; same semantics, engine-appropriate plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load

CAT = "olap"

# round(x·1e6) half-away as a codegen-friendly long (common.dsum's
# per-row kernel; spelled inline in SQL expr form for these ops).
_MICRO_REV = (
    "cast(round(l_extendedprice * (1 - l_discount) * 1000000) as bigint)"
)


@register(
    "q_revenue_uplift",
    oracle="""
        SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 1000000)
                             AS BIGINT)) AS BIGINT) AS uplift_micro,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    category=CAT,
)
def q_revenue_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL4 (TPC-H Q6 shape): revenue that would have been gained by
    eliminating mid-range discounts on small-quantity lines in one
    year — the purest scan→filter→agg query in the suite.

    Scale: this is the predicate-pushdown showcase — all three
    filters (shipdate range, discount range, quantity) reach the
    parquet scan as PushedFilters, the scan reads 4 columns, and the
    single global sum is a map-side-combined partial with a 1-row
    final exchange. At 100 TB with shipdate partitioning the date
    range prunes whole partitions before any task launches.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.expr(
                    "cast(round(l_extendedprice * l_discount * 1000000)"
                    " as bigint)"
                )
            )
            .cast("long")
            .alias("uplift_micro"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_volume_shipping",
    oracle="""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                   * 1000000) AS BIGINT)) AS BIGINT)
                   AS volume_micro
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    category=CAT,
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL5 (TPC-H Q7 shape): bilateral trade volume between two
    nations by ship year — the two nation joins role-play (one labels
    the customer side, one the supplier side) and the disjunctive
    pair filter keeps only the two directed flows.

    Scale: both nation filters are applied INSIDE the broadcast
    builds (customer keys of NATION_2∪NATION_1, supplier keys
    likewise), so the fact is filtered by two small broadcast hash
    joins before its single orders shuffle; the final (2×years)
    rollup map-side combines.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    pair = ["NATION_1", "NATION_2"]
    cust = (
        c.join(
            F.broadcast(n.filter(F.col("n_name").isin(pair))),
            c.c_nationkey == n.n_nationkey,
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    supp = (
        s.join(
            F.broadcast(n.filter(F.col("n_name").isin(pair))),
            s.s_nationkey == n.n_nationkey,
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    flat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return flat.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("yr"),
    ).agg(F.sum(F.expr(_MICRO_REV)).cast("long").alias("volume_micro"))


@register(
    "q_product_profit",
    oracle="""
        SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
               round(CAST(SUM(
                   CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                        AS BIGINT)
                   - CAST(round(p_retailprice * 0.8 * 1000000) AS BIGINT)
                     * CAST(l_quantity AS BIGINT)
               ) AS DOUBLE) / 1000000.0, 6) AS profit
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN part     ON l_partkey = p_partkey
        WHERE p_name LIKE '%gear%'
        GROUP BY 1, 2
    """,
    category=CAT,
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL6 (TPC-H Q9 shape, adapted — no partsupp table, so supply
    cost is proxied as 80% of p_retailprice): profit on one product
    family by supplier nation and order year.

    Determinism: profit accumulates as a difference of two exact
    micro-unit longs per row (revenue term and cost term each rounded
    to micros BEFORE the subtraction, so the sum is order-free),
    divided and rounded once.

    Scale: part (name-filtered) and supplier⋈nation broadcast; the
    only fact shuffle is the orders join for the year column; the
    (nation × year) rollup map-side combines. Same plan family as Q5
    with a part-side semi-filter.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    p = load(spark, sf_dir, "part")
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_name"
    )
    gear = p.filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    profit_micro = F.expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 1000000) as bigint)"
        " - cast(round(p_retailprice * 0.8 * 1000000) as bigint)"
        "   * cast(l_quantity as bigint)"
    )
    return (
        li.join(F.broadcast(gear), li.l_partkey == gear.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("long").alias("yr")
        )
        .agg(
            F.round(
                F.sum(profit_micro).cast("double") / 1000000.0, 6
            ).alias("profit")
        )
    )


@register(
    "q_returned_items",
    oracle="""
        WITH r AS (
            SELECT c_custkey, c_name, n_name,
                   round(c_acctbal, 6) AS c_acctbal,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 1000000) AS BIGINT)) AS BIGINT)
                       AS lost_rev_micro
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1996-07-01'
            GROUP BY 1, 2, 3, 4
        )
        SELECT * FROM r
        ORDER BY lost_rev_micro DESC, c_custkey ASC
        LIMIT 20
    """,
    category=CAT,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL7 (TPC-H Q10 shape): the 20 customers who returned the most
    revenue in a half-year window — the support-desk "who is most
    unhappy" ranking.

    Scale: returnflag + date filters reach the scans; customer⋈nation
    broadcasts; one fact shuffle (orders join), one per-customer
    rollup, and the top-20 is TakeOrderedAndProject on the exact
    micro-unit revenue with custkey tiebreak — no global sort.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cust = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "n_name", "c_acctbal"
    )
    flat = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate")
                 >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate")
                   < F.lit("1996-07-01").cast("timestamp"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
    )
    return (
        flat.groupBy(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("c_acctbal", 6).alias("c_acctbal"),
        )
        .agg(F.sum(F.expr(_MICRO_REV)).cast("long").alias("lost_rev_micro"))
        .orderBy(F.desc("lost_rev_micro"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_top_supplier",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 1000000) AS BIGINT)) AS BIGINT)
                       AS rev_micro
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name,
               CAST(rev_micro AS DOUBLE) / 1000000.0 AS total_rev
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_micro = (SELECT MAX(rev_micro) FROM rev)
    """,
    category=CAT,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL8 (TPC-H Q15 shape): the supplier(s) with the maximum
    quarterly revenue — the create-view-then-max idiom. Returns ALL
    argmax suppliers (ties included), like the original.

    Determinism: revenue is an exact micro-unit long, so the
    max-equality join is exact integer equality — no float-epsilon
    tie ambiguity.

    Scale: per-supplier rollup shuffles once on suppkey (|suppliers|
    output rows); the scalar max is a 1-row broadcast joined back —
    no collect, no second scan of the fact.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.expr(_MICRO_REV)).cast("long").alias("rev_micro"))
    )
    mx = rev.agg(F.max("rev_micro").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.rev_micro == mx.mx)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_micro").cast("double") / 1000000.0).alias(
                "total_rev"
            ),
        )
    )


@register(
    "q_promo_revenue_share",
    oracle="""
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(round(l_extendedprice * (1 - l_discount)
                                   * 1000000) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS promo_micro,
               CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                   * 1000000) AS BIGINT)) AS BIGINT)
                   AS total_micro,
               round(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(round(l_extendedprice * (1 - l_discount)
                                     * 1000000) AS BIGINT) ELSE 0 END)
                     / SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                      * 1000000) AS BIGINT)), 6)
                   AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    category=CAT,
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL9 (TPC-H Q14 shape): percent of one month's revenue that came
    from promotional parts — conditional share in a single aggregate
    pass over a broadcast part join.

    Scale: shipdate range prunes the fact scan; part broadcasts
    (only p_partkey + p_type survive column pruning); the whole query
    is one map-side-combined partial with a 1-row result — the
    conditional numerator and the denominator share the same pass.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = F.expr(_MICRO_REV)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    ).cast("long")
    total = F.sum(rev).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(
            F.broadcast(p.select("p_partkey", "p_type")),
            li.l_partkey == F.col("p_partkey"),
        )
        .agg(
            promo.alias("promo_micro"),
            total.alias("total_micro"),
            F.round(F.lit(100.0) * promo / total, 6).alias("promo_pct"),
        )
    )


@register(
    "q_priority_late_ship",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND date_diff('day', o_orderdate, l_shipdate) > 60)
        GROUP BY 1
    """,
    category=CAT,
)
def q_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL10 (TPC-H Q4 shape, adapted — no commit/receipt dates, so
    "late" is ship > 60 days after order): order count per priority
    among one quarter's orders that had at least one late line. The
    correlated EXISTS decorrelates to a left-semi join in both
    engines.

    Scale: date filter prunes orders first; the semi join shuffles on
    orderkey but carries only (orderkey, priority) on the probe side
    and deduplicates early (semi short-circuits on first match); the
    final 5-group count map-side combines.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    window_orders = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = window_orders.join(
        li,
        (window_orders.o_orderkey == li.l_orderkey)
        & (F.datediff(li.l_shipdate, window_orders.o_orderdate) > 60),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q_cust_order_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY 1
        )
        GROUP BY 1
    """,
    category=CAT,
)
def q_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL11 (TPC-H Q13 shape, adapted — the comment NOT-LIKE filter
    becomes a priority exclusion): distribution of customers by how
    many qualifying orders they placed, zero-order customers
    included via the outer join.

    Scale: the join-side filter lives in the JOIN condition (not
    WHERE), preserving outer semantics; the per-customer count
    shuffles on custkey, and the second-level distribution is a tiny
    (≤ max orders per customer) rollup. At 100 TB customer and orders
    co-bucket on custkey, making the outer join shuffle-free.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q_small_qty_revenue",
    oracle="""
        SELECT round(CAST(SUM(CAST(round(l_extendedprice * 1000000)
                                   AS BIGINT)) AS DOUBLE)
                     / 1000000.0 / 7.0, 6) AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    category=CAT,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL12 (TPC-H Q17 shape): revenue locked in small-quantity
    orders of one brand — the correlated per-part average threshold.
    Spark side decorrelates explicitly: per-part avg quantity as an
    aggregate, joined back, filter, sum.

    Determinism: quantities are integer-valued doubles, so
    AVG(l_quantity) is exact-integer-sum / count — bit-identical
    across engines and partition orders; the 0.5× threshold
    comparison is therefore stable.

    Scale: the per-part average is computed over the FULL lineitem
    (matching the correlated subquery's scope — not just the brand),
    one shuffle on partkey; the brand filter prunes the probe side
    via the broadcast part join before that shuffle's result joins
    back. Both engines turn the correlation into this same
    aggregate+join.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    brand = p.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    return (
        li.join(F.broadcast(brand), li.l_partkey == F.col("p_partkey"))
        .join(per_part_avg, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(
                    F.expr(
                        "cast(round(l_extendedprice * 1000000) as bigint)"
                    )
                ).cast("double")
                / 1000000.0
                / 7.0,
                6,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_disjunctive_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                   * 1000000) AS BIGINT)) AS BIGINT)
                   AS rev_micro,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
               AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
               AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
               AND p_size BETWEEN 1 AND 15)
    """,
    category=CAT,
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL13 (TPC-H Q19 shape): revenue over an OR-of-conjunctions
    predicate mixing fact columns (quantity) and dimension columns
    (brand, size) — the classic disjunctive-pushdown test.

    Scale: Catalyst extracts the common l_quantity BETWEEN 1 AND 30
    envelope... in practice the win is that the part side of each
    disjunct (brand+size) filters the BROADCAST build to three small
    key sets, and the residual OR evaluates inside the join stage —
    no fact shuffle at all. The quantity bounds are fact-side
    pushable per-disjunct envelope (1..30).
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
        li.l_partkey == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & q.between(1, 11)
         & sz.between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & q.between(10, 20)
           & sz.between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & q.between(20, 30)
           & sz.between(1, 15))
    )
    return joined.filter(cond).agg(
        F.sum(F.expr(_MICRO_REV)).cast("long").alias("rev_micro"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q_important_parts",
    oracle="""
        WITH v AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 1000000) AS BIGINT)) AS BIGINT)
                       AS value_micro
            FROM lineitem GROUP BY 1
        )
        SELECT l_partkey AS p_partkey, value_micro,
               round(CAST(value_micro AS DOUBLE)
                     / (SELECT CAST(SUM(value_micro) AS DOUBLE) FROM v),
                     6) AS share
        FROM v
        WHERE CAST(value_micro AS DOUBLE)
              > 0.0006 * (SELECT CAST(SUM(value_micro) AS DOUBLE) FROM v)
    """,
    category=CAT,
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL14 (TPC-H Q11 shape, adapted — no partsupp, so "stock value"
    is realized sales value per part): parts whose revenue exceeds a
    fixed fraction of total revenue — the HAVING-against-scalar-
    subquery idiom.

    Determinism: per-part values are exact micro-longs; the global
    total is the exact long sum; the 0.0006× threshold compares
    doubles derived identically on both sides.

    Scale: one partkey rollup shuffle; the grand total is a second
    tiny aggregate over the |parts|-row rollup (NOT a rescan of the
    fact), broadcast back as one row. The fraction threshold is
    scale-invariant — the same query text works at any SF.
    """
    li = load(spark, sf_dir, "lineitem")
    v = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(F.expr(_MICRO_REV)).cast("long").alias("value_micro")
    )
    tot = v.agg(F.sum("value_micro").cast("double").alias("total"))
    return (
        v.join(F.broadcast(tot))
        .filter(
            F.col("value_micro").cast("double") > 0.0006 * F.col("total")
        )
        .select(
            "p_partkey",
            "value_micro",
            F.round(
                F.col("value_micro").cast("double") / F.col("total"), 6
            ).alias("share"),
        )
    )


@register(
    "q_min_price_supplier",
    oracle="""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM(CAST(round(l_extendedprice * 1000000)
                                 AS BIGINT)) AS BIGINT) AS price_micro,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY 1, 2
        ),
        cand AS (
            SELECT p_partkey, p_brand, s_suppkey, s_name, n_name,
                   round(CAST(price_micro AS DOUBLE) / cnt / 1000000.0, 6)
                       AS avg_price,
                   rank() OVER (PARTITION BY p_partkey
                                ORDER BY CAST(price_micro AS DOUBLE) / cnt
                                         ASC, s_suppkey ASC) AS rk
            FROM ps
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
              AND r_name = 'ASIA'
        )
        SELECT p_partkey, p_brand, s_suppkey, s_name, n_name, avg_price
        FROM cand WHERE rk = 1
    """,
    category=CAT,
)
def q_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL15 (TPC-H Q2 shape, adapted — no partsupp, so the "supply
    cost" is the supplier's realized average sale price per part from
    lineitem): for each qualifying part, the cheapest regional
    supplier — the correlated-min idiom, expressed as a per-part rank
    with exact tie-breaks.

    Determinism: the rank orders by price_micro/cnt where both are
    exact longs — the double division of identical longs is
    bit-identical across engines — with suppkey as the total-order
    tiebreak; rank()=1 keeps genuine avg-price ties (like the
    original's min-equality), deterministically.

    Scale: the (part,supplier) rollup shuffles lineitem once; part
    filter and the region→nation→supplier chain broadcast and prune
    BEFORE the window, which partitions by partkey (thousands of
    small groups — no skew).
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.expr("cast(round(l_extendedprice * 1000000) as bigint)"))
        .cast("long")
        .alias("price_micro"),
        F.count(F.lit(1)).alias("cnt"),
    )
    parts = p.filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_brand")
    supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    cand = (
        ps.join(F.broadcast(parts), ps.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), ps.l_suppkey == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey").orderBy(
        (F.col("price_micro").cast("double") / F.col("cnt")).asc(),
        F.col("s_suppkey").asc(),
    )
    return (
        cand.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            "n_name",
            F.round(
                F.col("price_micro").cast("double")
                / F.col("cnt")
                / 1000000.0,
                6,
            ).alias("avg_price"),
        )
    )


@register(
    "q_parts_supplier_count",
    oracle="""
        SELECT p_brand, p_type,
               CAST(p_size // 10 AS BIGINT) AS size_bucket,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    category=CAT,
)
def q_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL16 (TPC-H Q16 shape, adapted — supplier diversity measured
    from realized lineitem shipments instead of partsupp listings,
    and the complaint-comment blacklist becomes a negative-balance
    blacklist): distinct supplier count per (brand, type,
    size-bucket).

    Scale: the blacklist (tiny) broadcasts as an anti join applied to
    the fact BEFORE the expensive distinct aggregation; part
    broadcasts; COUNT(DISTINCT) expands to the standard two-phase
    partial-distinct plan shuffled on the group keys — the 750-group
    result never skews.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(
            F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy(
            "p_brand",
            "p_type",
            (F.col("p_size") / 10).cast("int").cast("long")
            .alias("size_bucket"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_bulk_part_suppliers",
    oracle="""
        WITH q AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS total_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'blue%'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY 1
            HAVING SUM(CAST(l_quantity AS BIGINT)) > 100
        )
        SELECT s_suppkey, s_name, n_name, total_qty
        FROM q
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
    """,
    category=CAT,
)
def q_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL17 (TPC-H Q20 shape, adapted — availqty thresholds become
    realized shipped-quantity thresholds): suppliers who moved bulk
    volume (>100 units) of one part family in one year — the
    semi-join chain: part filter → fact window → per-supplier HAVING
    → supplier details.

    Determinism: quantities are integer-valued; the sum is an exact
    long, so the >100 HAVING boundary is exact.

    Scale: name-filtered part broadcasts; the date filter prunes the
    fact scan; one suppkey rollup shuffle, then the (tiny) qualifying
    set joins its broadcast dimensions. At real scale the HAVING
    happens before any supplier data is touched — the chain never
    materializes a wide row.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    blue = p.filter(F.col("p_name").like("blue%")).select("p_partkey")
    q = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(blue), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
             .alias("total_qty"))
        .filter(F.col("total_qty") > 100)
    )
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name", "n_name"
    )
    return q.join(F.broadcast(supp), q.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", "n_name", "total_qty"
    )


@register(
    "q_waiting_suppliers",
    oracle="""
        WITH g AS (
            SELECT l_orderkey, l_suppkey,
                   MAX(CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                                 > 90 THEN 1 ELSE 0 END) AS late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY 1, 2
        )
        SELECT l1.l_suppkey AS s_suppkey, s_name,
               COUNT(*) AS numwait
        FROM g l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.late = 1
          AND EXISTS (SELECT 1 FROM g l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM g l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late = 1)
        GROUP BY 1, 2
    """,
    category=CAT,
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL18 (TPC-H Q21 shape, adapted — "kept orders waiting" is
    ship > 90 days after order, at (order, supplier) grain): for each
    supplier, the number of finalized multi-supplier orders where it
    was the ONLY late supplier.

    The oracle keeps the textbook correlated EXISTS / NOT-EXISTS
    pair; the Spark plan re-expresses both correlations as ONE
    per-order set aggregation — |supplier set|>1 replaces EXISTS,
    |late-supplier set|==1 replaces NOT-EXISTS, and the qualifying
    supplier is that singleton set's element — because correlated
    self-joins would shuffle the fact three times for information one
    orderkey rollup already has. Semantics are identical; the plan is
    the one you'd want at 100 TB. (A windowed variant was measured
    first: the collect_set rollup is one exchange cheaper and skips
    the per-order sort — 1.35 s → below, same 1000 rows.)

    Scale: one orderkey rollup shuffle with map-side partial sets
    (≤ a handful of suppliers per order — sets stay tiny, no skew),
    one suppkey count rollup. Supplier names broadcast last.
    Round-4 sf1 audit: this is the floor for the shape — explicitly
    broadcasting the 750 k-row filtered orders (1.86 s) and a
    two-level (order, supplier) count rollup replacing the sets
    (1.80 s) both measured at/above the set rollup (1.77 s); the
    residual 2.5x vs DuckDB at sf1 is shuffle materialization of the
    one mandatory fact exchange, which real executor counts amortize.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    lines = li.join(
        o.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.when(F.datediff("l_shipdate", "o_orderdate") > 90, True)
        .otherwise(False)
        .alias("is_late"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.collect_set("l_suppkey").alias("supps"),
        F.collect_set(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("late_supps"),
    )
    waiting = per_order.filter(
        (F.size("supps") > 1) & (F.size("late_supps") == 1)
    ).select(F.element_at("late_supps", 1).alias("s_suppkey"))
    return (
        waiting.groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(
            F.broadcast(s.select("s_suppkey", "s_name")), "s_suppkey"
        )
        .select("s_suppkey", "s_name", "numwait")
    )


@register(
    "q_idle_rich_customers",
    oracle="""
        WITH thr AS (
            SELECT CAST(SUM(CAST(round(c_acctbal * 1000000) AS BIGINT))
                        AS DOUBLE) / 1000000.0 / COUNT(*) AS avg_bal
            FROM customer WHERE c_acctbal > 0
        )
        SELECT n_name, COUNT(*) AS numcust,
               round(CAST(SUM(CAST(round(c_acctbal * 1000000) AS BIGINT))
                          AS DOUBLE) / 1000000.0, 6) AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT avg_bal FROM thr)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY 1
    """,
    category=CAT,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OL19 (TPC-H Q22 shape, adapted — phone-prefix grouping becomes
    nation grouping, and "never ordered" becomes "no orders since
    2000" since every synthetic customer has old orders): wealthy
    customers gone quiet, counted per nation — the
    scalar-threshold + anti-join idiom.

    Determinism: the average-balance threshold is an exact-numerator
    mean (micro-long sum / count) so both engines compute the
    identical double; balance sums are exact micro-longs rounded
    once.

    Scale: the threshold is a 1-row broadcast (no collect); the
    anti join shuffles customers against the date-pruned orders
    projection (orderkey-free, two columns); nation broadcasts for
    the final ≤25-group rollup.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    thr = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(
                    F.expr("cast(round(c_acctbal * 1000000) as bigint)")
                ).cast("double")
                / 1000000.0
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(
                    F.expr("cast(round(c_acctbal * 1000000) as bigint)")
                ).cast("double")
                / 1000000.0,
                6,
            ).alias("total_bal"),
        )
    )
