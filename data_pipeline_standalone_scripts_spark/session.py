"""SparkSession factory + per-session conf hardening.

The driver owns the SparkSession it passes into ``entry``/``queries()``;
we therefore split configuration in two tiers:

- build-time conf (master, memory, AQE) — only applied when *we* create
  the session (tests, bench);
- runtime conf (session timezone, ANSI) — safe to (re)apply on any
  session, which ``ensure_runtime_conf`` does idempotently. Correctness
  of timestamp queries vs the UTC-naive DuckDB oracle depends on the
  UTC pin (SURVEY.md §1.3.5).

Scale note (100 TB): nothing in this module assumes local mode; the
factory is only a convenience for single-node testing. On a real
cluster the session arrives from spark-submit with executor topology
already set, and only ``ensure_runtime_conf`` applies.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ensure_runtime_conf(spark: SparkSession) -> SparkSession:
    """Idempotent, runtime-settable conf required for oracle parity."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # AQE is default-on in Spark 4.x; assert rather than trust.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # events.parquet stores timestamp[ns], which the vectorized parquet
    # reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos as long and let
    # tables.load convert ns → µs explicitly — the same truncation
    # DuckDB applies internally (its TIMESTAMP is µs), so the two
    # engines see identical values (verified to the microsecond).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def get_spark(
    app_name: str = "dpss-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Local-mode session for tests/bench. local[N] = one JVM, N task
    threads; `spark.driver.memory` is the only memory knob that matters
    in local mode."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_runtime_conf(spark)
