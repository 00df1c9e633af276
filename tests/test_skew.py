"""Salted-join correctness: identical multiset of output rows vs the
plain join, on data with a deliberately hot key (half the rows share
one key — the shape AQE's split can't fix when the hot key lands in
one task)."""

from pyspark.sql import functions as F

from data_pipeline_standalone_scripts_spark.functions.skew import salted_join


def _skewed_frames(spark):
    # 10_000 rows, key 0 owns half of them; dim has 100 keys
    large = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 7 % 1000).alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return large, small


def test_salted_join_matches_plain_inner(spark):
    large, small = _skewed_frames(spark)
    plain = sorted(
        map(tuple, large.join(small, "k").select("k", "payload", "name").collect())
    )
    salted = sorted(
        map(tuple, salted_join(large, small, "k").select("k", "payload", "name").collect())
    )
    assert salted == plain


def test_salted_join_scatters_hot_key(spark):
    """The hot key's rows must actually spread across salt buckets —
    otherwise the helper is a no-op that still passes the value test."""
    large, small = _skewed_frames(spark)
    salted = large.withColumn(
        "__salt",
        F.pmod(
            F.abs(F.hash(F.spark_partition_id(), F.monotonically_increasing_id())),
            F.lit(16),
        ),
    )
    buckets = (
        salted.filter(F.col("k") == 0).groupBy("__salt").count().collect()
    )
    assert len(buckets) == 16  # all salt buckets hit
    counts = [r["count"] for r in buckets]
    assert max(counts) < 2 * min(counts)  # roughly uniform scatter
