"""Driver contract for the spark-graft builder (PySpark target).

Thin projection over ``data_pipeline_standalone_scripts_spark.registry``:
every operator from SURVEY.md §2 registers its Spark implementation and
DuckDB oracle SQL there in the same commit (build rule, SURVEY.md §7).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import data_pipeline_standalone_scripts_spark as engine  # noqa: E402


def _registry():
    engine.load_all_operators()
    from data_pipeline_standalone_scripts_spark import registry

    return registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q5-shape 6-way star join (SURVEY.md §7 M1) —
    ASIA revenue by nation on sf0.001."""
    reg = _registry()
    return reg.REGISTRY["q_join_star6"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry().queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return _registry().oracles()
