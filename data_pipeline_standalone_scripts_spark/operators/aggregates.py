"""Aggregation operators A1–A13 (SURVEY.md §2.4).

Reference capability: benchmark/assess.py's per-record metric
accumulation (SURVEY.md §2.12) — a Python list-append loop there, a
partial+final hash aggregate here (map-side combine, one shuffled row
per group).

Scale notes: groupBy on low-cardinality keys (returnflag×linestatus =
6 groups) is the best case — partial aggregation reduces 100 TB to
n_partitions×6 rows before the shuffle. High-cardinality groupBys
(per-customer) shuffle real volume; AQE coalesces post-shuffle
partitions. countDistinct rewrites to expand+two-phase agg —
approx_count_distinct (HLL sketch, mergeable) is the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load
from .common import davg, dsum, o_davg, o_dsum

CAT = "aggregates"


@register(
    "q_agg_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {o_dsum("l_quantity", "sum_qty")},
               {o_dsum("l_extendedprice", "sum_base_price")},
               {o_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
               {o_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
               {o_davg("l_quantity", "avg_qty")},
               {o_davg("l_extendedprice", "avg_price")},
               {o_davg("l_discount", "avg_disc")},
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    category=CAT,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: TPC-H Q1 pricing summary — 6 groups, 8 aggregates.

    Scale: the canonical map-side-combine aggregate; DECIMAL
    accumulation keeps the 8 sums bit-exact under any partitioning
    (common.py rationale).
    """
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
