"""Geospatial bucketing operators: nearest-hub assignment and
grid-cell spatial joins.

The test tables carry no coordinates, so each entity gets a
DETERMINISTIC synthetic position derived from its integer key by pure
modular arithmetic (exactly reproducible in both engines — the same
trick the test data itself uses for joinable key spaces). The
operators are therefore real spatial plans over synthetic geometry.

Float discipline: distances are squared-degree planar distances —
only IEEE multiply/add/subtract on identical expression trees, which
both engines evaluate bit-identically. Real haversine needs
sin/cos/asin, whose libm implementations differ by ulps between the
JVM and DuckDB's C runtime and CANNOT cross a value-hash boundary;
at 100 TB you'd compute haversine only INSIDE one engine (ranking is
ulp-insensitive in practice) — documented here, not hashed here.

Scale (100 TB):
- Nearest-hub is the canonical broadcast-argmin: the hub table is
  tiny (dimension-sized), so each partition scans its points once
  against the broadcast hubs and a map-side-combinable MIN(struct)
  picks the winner — no shuffle of the point set at all beyond the
  final per-point aggregate, which Catalyst collapses into the same
  stage because the grouping key is the point's own unique key.
- Grid-cell join is the standard spatial-bin equi-join: points
  shuffle once by cell id; within-cell pair work is quadratic per
  cell, so cell size (here 10°) is the knob that bounds skew — the
  same partition-size-vs-pair-count trade every spatial engine
  (GeoSpark/Sedona) tunes. A full neighbor search would replicate
  each point into its 3×3 cell neighborhood before the join (noted,
  out of this operator's declared same-cell contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

CAT = "geo"


def _lat(key: Column, mult: int) -> Column:
    return ((key * mult) % 18000).cast("double") / 100.0 - 90.0


def _lon(key: Column, mult: int) -> Column:
    return ((key * mult) % 36000).cast("double") / 100.0 - 180.0


def _o_lat(key: str, mult: int) -> str:
    return f"CAST(({key} * {mult}) % 18000 AS DOUBLE) / 100.0 - 90.0"


def _o_lon(key: str, mult: int) -> str:
    return f"CAST(({key} * {mult}) % 36000 AS DOUBLE) / 100.0 - 180.0"


@register(
    "q_geo_nearest_hub",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey,
                   {_o_lat('c_custkey', 37)} AS plat,
                   {_o_lon('c_custkey', 73)} AS plon
            FROM customer
        ), hubs AS (
            SELECT n_nationkey, n_name,
                   {_o_lat('n_nationkey', 97)} AS hlat,
                   {_o_lon('n_nationkey', 53)} AS hlon
            FROM nation
        ), scored AS (
            SELECT c_custkey,
                   (plat - hlat) * (plat - hlat)
                   + (plon - hlon) * (plon - hlon) AS d2,
                   n_nationkey, n_name
            FROM pts CROSS JOIN hubs
        )
        SELECT c_custkey,
               struct_extract(MIN({{'d': d2, 'k': n_nationkey, 'n': n_name}}),
                              'n') AS hub_name,
               struct_extract(MIN({{'d': d2, 'k': n_nationkey, 'n': n_name}}),
                              'd') AS nearest_d2
        FROM scored
        GROUP BY 1
    """,
    category=CAT,
)
def q_geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEO1: assign every customer to its nearest of 25 hubs.

    Hubs are the nation table with synthetic positions; each customer
    point scans the broadcast hub list and keeps the argmin by
    squared planar distance (ties — impossible here but guarded —
    break on hub key via lexicographic struct MIN).

    Plan: broadcast nested loop (25-row build side) + hash aggregate
    keyed c_custkey — the point table is scanned once, never
    shuffled with the full candidate fan-out (the ×25 blowup exists
    only inside the pre-aggregation stage, and partial MIN(struct)
    combines map-side before any exchange).
    """
    pts = load(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat(F.col("c_custkey"), 37).alias("plat"),
        _lon(F.col("c_custkey"), 73).alias("plon"),
    )
    hubs = load(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        _lat(F.col("n_nationkey"), 97).alias("hlat"),
        _lon(F.col("n_nationkey"), 53).alias("hlon"),
    )
    dlat = F.col("plat") - F.col("hlat")
    dlon = F.col("plon") - F.col("hlon")
    cand = pts.crossJoin(F.broadcast(hubs)).select(
        "c_custkey",
        F.struct(
            (dlat * dlat + dlon * dlon).alias("d"),
            F.col("n_nationkey").alias("k"),
            F.col("n_name").alias("n"),
        ).alias("pick"),
    )
    best = F.min("pick")
    return cand.groupBy("c_custkey").agg(
        best.getField("n").alias("hub_name"),
        best.getField("d").alias("nearest_d2"),
    )


@register(
    "q_geo_grid_join",
    oracle="""
        WITH cpts AS (
            SELECT c_custkey,
                   ((c_custkey * 37) % 18000) // 1000 AS cell_lat,
                   ((c_custkey * 73) % 36000) // 1000 AS cell_lon,
                   CAST((c_custkey * 37) % 18000 AS DOUBLE) / 100.0 AS plat,
                   CAST((c_custkey * 73) % 36000 AS DOUBLE) / 100.0 AS plon
            FROM customer
        ), spts AS (
            SELECT s_suppkey,
                   ((s_suppkey * 41) % 18000) // 1000 AS cell_lat,
                   ((s_suppkey * 79) % 36000) // 1000 AS cell_lon,
                   CAST((s_suppkey * 41) % 18000 AS DOUBLE) / 100.0 AS slat,
                   CAST((s_suppkey * 79) % 36000 AS DOUBLE) / 100.0 AS slon
            FROM supplier
        ), pairs AS (
            SELECT c.cell_lat, c.cell_lon,
                   (plat - slat) * (plat - slat)
                   + (plon - slon) * (plon - slon) AS d2
            FROM cpts c JOIN spts s
              ON c.cell_lat = s.cell_lat AND c.cell_lon = s.cell_lon
        )
        SELECT CAST(cell_lat AS BIGINT) AS cell_lat,
               CAST(cell_lon AS BIGINT) AS cell_lon,
               CAST(COUNT(*) AS BIGINT) AS n_cand_pairs,
               CAST(SUM(CASE WHEN d2 < 4.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_close_pairs,
               MIN(d2) AS min_d2
        FROM pairs
        GROUP BY pairs.cell_lat, pairs.cell_lon
    """,
    category=CAT,
)
def q_geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEO2: customer×supplier proximity pairs via 10° grid-cell
    bucketing (same-cell contract — the bin join every distributed
    spatial engine runs before exact geometry).

    Cell ids are integer arithmetic on the key (floor-division of the
    centidegree scaled position), so the join key is exact; the
    within-cell squared distance then counts close pairs (< 2°).

    Plan: equi-join on (cell_lat, cell_lon) — ONE shuffle each side
    keyed by cell, quadratic work confined inside cells, then a hash
    aggregate on the same cell key that reuses the join's
    partitioning (no second exchange).
    """
    c = load(spark, sf_dir, "customer").select(
        ((F.col("c_custkey") * 37) % 18000),
        ((F.col("c_custkey") * 73) % 36000),
    ).toDF("lat_c100", "lon_c100").select(
        F.expr("lat_c100 div 1000").alias("cell_lat"),
        F.expr("lon_c100 div 1000").alias("cell_lon"),
        (F.col("lat_c100").cast("double") / 100.0).alias("plat"),
        (F.col("lon_c100").cast("double") / 100.0).alias("plon"),
    )
    s = load(spark, sf_dir, "supplier").select(
        ((F.col("s_suppkey") * 41) % 18000),
        ((F.col("s_suppkey") * 79) % 36000),
    ).toDF("lat_c100", "lon_c100").select(
        F.expr("lat_c100 div 1000").alias("cell_lat"),
        F.expr("lon_c100 div 1000").alias("cell_lon"),
        (F.col("lat_c100").cast("double") / 100.0).alias("slat"),
        (F.col("lon_c100").cast("double") / 100.0).alias("slon"),
    )
    dlat = F.col("plat") - F.col("slat")
    dlon = F.col("plon") - F.col("slon")
    pairs = c.join(s, ["cell_lat", "cell_lon"]).select(
        "cell_lat", "cell_lon", (dlat * dlat + dlon * dlon).alias("d2")
    )
    return pairs.groupBy("cell_lat", "cell_lon").agg(
        F.count(F.lit(1)).alias("n_cand_pairs"),
        F.sum(F.when(F.col("d2") < 4.0, 1).otherwise(0))
        .cast("long")
        .alias("n_close_pairs"),
        F.min("d2").alias("min_d2"),
    )
