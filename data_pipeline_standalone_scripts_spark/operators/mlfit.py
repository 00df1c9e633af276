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


@register(
    "q_calibration_bins",
    oracle="""
        WITH scored AS (
            SELECT round(-8.0 + 0.6 * ln(o_totalprice), 6) AS z,
                   round(1.0 / (1.0 + exp(-(-8.0 + 0.6 * ln(o_totalprice)))),
                         6) AS p,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                     AS hit
            FROM orders
        ),
        binned AS (
            SELECT CAST(floor(z / 0.5) AS BIGINT) AS z_bin, p, hit
            FROM scored
        )
        SELECT z_bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               round(CAST(SUM(CAST(round(p * 1000000) AS BIGINT)) AS DOUBLE)
                     / 1000000.0 / COUNT(*), 6) AS mean_predicted,
               round(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS observed_rate,
               CAST(SUM(hit) AS BIGINT) AS n_hits
        FROM binned
        GROUP BY z_bin
        ORDER BY z_bin
    """,
    category=CAT,
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML3: model-calibration table — bin a frozen logistic score
    (P[priority=URGENT] from log order value) by its logit and compare
    mean predicted probability against the observed rate per bin. The
    reliability-diagram backbone of any deployed classifier monitor:
    bins where mean_predicted and observed_rate diverge are where the
    model is miscalibrated.

    Determinism: binning happens on the ROUND(6) logit (so a 1-ulp
    libm exp/ln divergence cannot flip a bin assignment except at a
    measure-zero rounding edge), per-row probabilities are rounded
    before the micro-unit scaled-long mean, and observed rates are
    exact integer ratios.

    Scale: scan-side scoring (codegen ln/exp), one map-side-combined
    agg on ≤ ~10 logit bins. Calibration of a 100 TB scored corpus is
    exactly this one pass.
    """
    from pyspark.sql import functions as F

    o = load(spark, sf_dir, "orders")
    z_raw = F.lit(-8.0) + F.lit(0.6) * F.log(F.col("o_totalprice"))
    scored = o.select(
        F.round(z_raw, 6).alias("z"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z_raw)), 6).alias("p"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "hit"
        ),
    )
    binned = scored.select(
        F.floor(F.col("z") / 0.5).cast("long").alias("z_bin"), "p", "hit"
    )
    micro_p = (F.col("p") * 1_000_000 + F.lit(0.5)).cast("long")
    return (
        binned.groupBy("z_bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(micro_p).cast("double") / 1_000_000.0 / F.count(F.lit(1)),
                6,
            ).alias("mean_predicted"),
            F.round(
                F.sum("hit").cast("double") / F.count(F.lit(1)), 6
            ).alias("observed_rate"),
            F.sum("hit").cast("long").alias("n_hits"),
        )
        .orderBy("z_bin")
    )
