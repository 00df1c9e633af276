"""Window-function operators W1–W8 (SURVEY.md §2.5).

Reference capability: per-image running accumulation in
benchmark/assess.py's score loop — generalized to ordered analytic
windows.

Scale notes: a window = one shuffle on partitionBy keys + per-
partition sort. Partition keys here are high-cardinality (customer,
user) so state per key is small; a window WITHOUT partitionBy is a
single-partition global sort — never used here except on already-
aggregated daily rows (W5: one row per day, bounded).
Frames are ALWAYS explicit (SURVEY §7): Spark defaults to RANGE
UNBOUNDED PRECEDING when orderBy is present, which silently changes
first/last semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load
from .common import DEC, dist_ntile, dist_running

CAT = "windows"


@register(
    "q_win_rank",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
               rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk,
               dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drk
        FROM orders
    """,
    category=CAT,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number/rank/dense_rank per customer by price.
    row_number's ordering carries the unique-orderkey tie-break;
    rank/dense_rank depend only on the order VALUES, so they are
    deterministic under ties without it."""
    o = load(spark, sf_dir, "orders")
    w_tb = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    w_val = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w_tb).alias("rn"),
        F.rank().over(w_val).alias("rk"),
        F.dense_rank().over(w_val).alias("drk"),
    )


@register(
    "q_win_topk_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey ASC) <= 3
    """,
    category=CAT,
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: top-3 orders per customer — rank-then-filter.

    Scale: this is the per-group top-k pattern; Spark pushes a
    per-partition k-heap (WindowGroupLimit since 3.5) so partitions
    never materialize the full sorted group.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "q_win_lag_lead",
    oracle="""
        SELECT event_id, user_id,
               CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS gap_us,
               lead(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    category=CAT,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: per-user inter-event gaps (lag) and next event type (lead).
    Microsecond integer arithmetic — no float drift possible."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_win_running",
    oracle=f"""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate ASC, o_orderkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS running_revenue
        FROM orders
    """,
    category=CAT,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: running revenue per customer over order date. DECIMAL
    accumulation inside the frame — the running sum is exact at every
    prefix, so engines can't drift."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_revenue"),
    )


@register(
    "q_win_moving_avg",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', o_orderdate) AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS rev,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(SUM(rev) OVER w AS DOUBLE) / SUM(n) OVER w AS avg_order_7d
        FROM daily
        WINDOW w AS (ORDER BY day ASC ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    category=CAT,
)
def q_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: 7-day moving average order value over the daily aggregate.
    The global window runs on ~2400 pre-aggregated daily rows, not on
    the fact table — the only acceptable use of an unpartitioned
    window at scale. Average = exact decimal sums ratio."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.orderBy(F.col("day").asc()).rowsBetween(-6, Window.currentRow)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.sum("rev").over(w).cast("double") / F.sum("n").over(w)).alias("avg_order_7d"),
    )


@register(
    "q_win_range_frame",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY epoch(o_orderdate) ASC
                          RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS rev_30d
        FROM orders
    """,
    category=CAT,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: 30-day RANGE frame per customer — frame membership by
    time-value distance (epoch seconds), not row position. All orders
    of the same customer on the same date share one frame, so ties
    need no break."""
    o = load(spark, sf_dir, "orders").withColumn(
        "od_sec", F.unix_timestamp("o_orderdate")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("od_sec").asc())
        .rangeBetween(-2592000, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("rev_30d"),
    )


@register(
    "q_win_ntile_pct",
    oracle="""
        SELECT o_orderkey,
               ntile(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile,
               percent_rank() OVER (ORDER BY o_totalprice ASC) AS pct_rank,
               cume_dist() OVER (ORDER BY o_totalprice ASC) AS cume
        FROM orders
    """,
    category=CAT,
)
def q_win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: quartiles + percent_rank + cume_dist of order value.
    ntile depends on row position (needs the unique tie-break);
    percent_rank/cume_dist depend only on values. Both are exact
    integer ratios — no rounding required.

    Scale: all three global window functions are computed WITHOUT an
    unpartitioned window (the |orders| frame would land on one task):
    ntile via `dist_ntile`, and percent_rank/cume_dist from the
    distinct-value running count (`dist_running` over |distinct
    prices| rows) joined back — rank = cum_le − ties + 1, so
    pct_rank = (cum_le − ties)/(N−1) and cume = cum_le/N, exactly the
    SQL semantics over ties."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    q = dist_ntile(
        o, [("o_totalprice", "asc"), ("o_orderkey", "asc")], "quartile", n=4
    )
    vals = o.groupBy("o_totalprice").agg(F.count(F.lit(1)).alias("c"))
    tot = vals.agg(F.sum("c").alias("nn"))
    vr = (
        dist_running(vals, [("o_totalprice", "asc")], {"le": "c"})
        .crossJoin(F.broadcast(tot))
        .select(
            "o_totalprice",
            F.when(
                F.col("nn") > 1,
                (F.col("le") - F.col("c")).cast("double") / (F.col("nn") - 1),
            )
            .otherwise(F.lit(0.0))
            .alias("pct_rank"),
            (F.col("le").cast("double") / F.col("nn")).alias("cume"),
        )
    )
    return q.join(vr, "o_totalprice").select(
        "o_orderkey", "quartile", "pct_rank", "cume"
    )


@register(
    "q_win_first_last",
    oracle="""
        SELECT user_id, day, first_val, last_val, n FROM (
            SELECT user_id,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   first_value(value) OVER w AS first_val,
                   last_value(value)  OVER w AS last_val,
                   COUNT(*) OVER w AS n,
                   row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                      ORDER BY ts ASC, event_id ASC) AS rn
            FROM events
            WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
                         ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ) WHERE rn = 1
    """,
    category=CAT,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: first/last event value per user-day, one row per group via
    rn=1. The first/last frame is explicitly UNBOUNDED-UNBOUNDED —
    the default frame would make last_value mean "current row"."""
    e = load(spark, sf_dir, "events").withColumn("day_ts", F.date_trunc("day", "ts"))
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = (
        Window.partitionBy("user_id", "day_ts")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_rn = Window.partitionBy("user_id", "day_ts").orderBy(*order)
    return (
        e.select(
            "user_id",
            F.date_format("day_ts", "yyyy-MM-dd").alias("day"),
            F.first("value").over(w).alias("first_val"),
            F.last("value").over(w).alias("last_val"),
            F.count(F.lit(1)).over(w).alias("n"),
            F.row_number().over(w_rn).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
