"""Closed-form model fitting as aggregation: OLS linear regression
from exact sufficient statistics.

"Training" an OLS model is ten sums — the moment matrix XᵀX and XᵀY —
followed by O(1) arithmetic on the driver side of the plan (still
inside SQL; nothing leaves the executors but ten numbers). That makes
regression a SINGLE map-side-combinable aggregation at any data size:
the canonical example of pushing an ML fit into the engine instead of
exporting data to a modeling stack.

Determinism: all moments accumulate as exact integers (features and
target micro-scaled the way operators/common.dsum does), so both
engines feed bit-identical integers into the one float solve at the
end; the float algebra is an identical expression sequence on both
sides, then r6. The Σy²-class moments exceed BIGINT at large row
counts, so they widen to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) —
the only dialect divergence in the shared SQL template below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import load, register_views

CAT = "mlfit"

# Shared Spark-SQL / DuckDB template. Integer feature space:
#   Q = 100·l_quantity, D = 100·l_discount, Y = 10000·revenue
# (quantities/discounts are 2-dp-quantized, revenue is an exact 4-dp
# product of two 2-dp values, so every round() recovers an exact
# integer). The fit runs in integer space; betas unscale at the end
# (Y = B0 + BQ·Q + BD·D  ⇒  y = B0/1e4 + (BQ/100)·q + (BD/100)·d).
# {wide} widens the three product-moments that can exceed BIGINT.
_LINREG_SQL = """
    WITH pts AS (
        SELECT CAST(round(l_quantity * 100) AS BIGINT) AS q,
               CAST(round(l_discount * 100) AS BIGINT) AS d,
               CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS y
        FROM lineitem
    ), m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(q) AS DOUBLE) AS sq,
               CAST(SUM(d) AS DOUBLE) AS sd,
               CAST(SUM(q * q) AS DOUBLE) AS sqq,
               CAST(SUM(d * d) AS DOUBLE) AS sdd,
               CAST(SUM(q * d) AS DOUBLE) AS sqd,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(q AS {wide}) * y) AS DOUBLE) AS sqy,
               CAST(SUM(CAST(d AS {wide}) * y) AS DOUBLE) AS sdy,
               CAST(SUM(CAST(y AS {wide}) * y) AS DOUBLE) AS syy
        FROM pts
    ), c AS (
        SELECT n,
               sqq - sq * sq / n AS cqq,
               sdd - sd * sd / n AS cdd,
               sqd - sq * sd / n AS cqd,
               sqy - sq * sy / n AS cqy,
               sdy - sd * sy / n AS cdy,
               syy - sy * sy / n AS cyy,
               sq / n AS mq, sd / n AS md, sy / n AS my
        FROM m
    ), beta AS (
        SELECT n, cyy, cqy, cdy, mq, md, my,
               (cqy * cdd - cdy * cqd) / (cqq * cdd - cqd * cqd) AS bq,
               (cdy * cqq - cqy * cqd) / (cqq * cdd - cqd * cqd) AS bd
        FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           round((my - bq * mq - bd * md) / 10000.0, 6) AS beta0,
           round(bq / 100.0, 6) AS beta_qty,
           round(bd / 100.0, 6) AS beta_disc,
           round((bq * cqy + bd * cdy) / cyy, 6) AS r2
    FROM beta
"""


@register(
    "q_linreg_fit",
    oracle=_LINREG_SQL.format(wide="HUGEINT"),
    category=CAT,
)
def q_linreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML1: OLS fit of revenue ~ quantity + discount over lineitem,
    entirely as one aggregation — returns intercept, coefficients and
    R² in original units.

    The normal equations are solved in closed form from ten exact
    integer moments (centered 2×2 cofactor solve); see module
    docstring for the scaling scheme. Integer-moment domain: Σ(q·y)
    stays under 2^63 through ~sf1 magnitudes; beyond that, widen the
    remaining moments exactly like the three already widened.

    Scale: one scan, one map-side-combined partial aggregate, ten
    numbers on the wire, O(1) finish. Nothing about the fit changes
    at 100 TB — this is why sufficient-statistics training belongs in
    the engine.
    """
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_LINREG_SQL.format(wide="DECIMAL(38,0)"))


# Same integer-moment construction, grouped: one model per key. The
# group column rides through the moment aggregation, so "train a model
# per segment" costs exactly one grouped aggregate — the million-
# micro-models pattern (per-SKU demand curves, per-tenant calibration)
# with no per-group scan or driver loop.
_LINREG_GROUP_SQL = """
    WITH pts AS (
        SELECT l_returnflag AS grp,
               CAST(round(l_quantity * 100) AS BIGINT) AS q,
               CAST(round(l_discount * 100) AS BIGINT) AS d,
               CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS y
        FROM lineitem
    ), m AS (
        SELECT grp,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(q) AS DOUBLE) AS sq,
               CAST(SUM(d) AS DOUBLE) AS sd,
               CAST(SUM(q * q) AS DOUBLE) AS sqq,
               CAST(SUM(d * d) AS DOUBLE) AS sdd,
               CAST(SUM(q * d) AS DOUBLE) AS sqd,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(q AS {wide}) * y) AS DOUBLE) AS sqy,
               CAST(SUM(CAST(d AS {wide}) * y) AS DOUBLE) AS sdy,
               CAST(SUM(CAST(y AS {wide}) * y) AS DOUBLE) AS syy
        FROM pts GROUP BY grp
    ), c AS (
        SELECT grp, n,
               sqq - sq * sq / n AS cqq,
               sdd - sd * sd / n AS cdd,
               sqd - sq * sd / n AS cqd,
               sqy - sq * sy / n AS cqy,
               sdy - sd * sy / n AS cdy,
               syy - sy * sy / n AS cyy,
               sq / n AS mq, sd / n AS md, sy / n AS my
        FROM m
    ), beta AS (
        SELECT grp, n, cyy, cqy, cdy, mq, md, my,
               (cqy * cdd - cdy * cqd) / (cqq * cdd - cqd * cqd) AS bq,
               (cdy * cqq - cqy * cqd) / (cqq * cdd - cqd * cqd) AS bd
        FROM c
    )
    SELECT grp AS l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           round((my - bq * mq - bd * md) / 10000.0, 6) AS beta0,
           round(bq / 100.0, 6) AS beta_qty,
           round(bd / 100.0, 6) AS beta_disc,
           round((bq * cqy + bd * cdy) / cyy, 6) AS r2
    FROM beta
"""


@register(
    "q_linreg_per_group",
    oracle=_LINREG_GROUP_SQL.format(wide="HUGEINT"),
    category=CAT,
)
def q_linreg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML2: one OLS model per return-flag segment, from the same exact
    sufficient statistics as ML1 — grouped, so training a model per
    key is a single grouped aggregate (the micro-models pattern:
    per-segment elasticities without a per-group scan or driver loop).

    Scale: identical to ML1 with the group key in the shuffle — the
    wire carries ten numbers per GROUP, and a million groups is an
    ordinary aggregation.
    """
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_LINREG_GROUP_SQL.format(wide="DECIMAL(38,0)"))
