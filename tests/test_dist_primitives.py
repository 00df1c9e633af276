"""Property tests for the distributed order-statistics primitives
(operators/common.py, SURVEY §4.1): on arbitrary small frames their
results must equal the single-partition window semantics they replace
— rank, NTILE remainder arithmetic, inclusive/exclusive running sums,
NULL-preserving running max, and top-k rank — including the edge cases
a range shuffle makes interesting (ties on the range key, frames
smaller than the partition count, n < bucket count).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_standalone_scripts_spark.operators.common import (
    dist_ntile,
    dist_row_number,
    dist_running,
    topk_with_rank,
)

# small frames; values collide on purpose so range-boundary ties and
# NTILE remainders are exercised
frames = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-5, 5)),
    min_size=1,
    max_size=40,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    # unique id column makes every order_by a total order
    return spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v long"
    )


@given(rows=frames)
@settings(**_SETTINGS)
def test_dist_row_number_equals_window(spark, rows):
    df = _df(spark, rows)
    got = {
        r["id"]: r["rn"]
        for r in dist_row_number(
            df, [("k", "asc"), ("id", "asc")], "rn", parts=4
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k", "id"))
        ).collect()
    }
    assert got == want


@given(rows=frames, n=st.integers(2, 7))
@settings(**_SETTINGS)
def test_dist_ntile_equals_window(spark, rows, n):
    df = _df(spark, rows)
    got = {
        r["id"]: r["q"]
        for r in dist_ntile(
            df, [("v", "desc"), ("id", "asc")], "q", n=n, parts=4
        ).collect()
    }
    want = {
        r["id"]: r["q"]
        for r in df.withColumn(
            "q", F.ntile(n).over(Window.orderBy(F.desc("v"), F.asc("id")))
        ).collect()
    }
    assert got == want


@given(rows=frames, inclusive=st.booleans(), desc=st.booleans())
@settings(**_SETTINGS)
def test_dist_running_sum_and_max_equal_window(spark, rows, inclusive, desc):
    df = _df(spark, rows)
    kdir = "desc" if desc else "asc"
    got = {
        r["id"]: (r["s"], r["m"])
        for r in dist_running(
            df,
            [("k", kdir), ("id", "asc")],
            {"s": "v"},
            maxs={"m": "v"},
            parts=4,
            inclusive=inclusive,
        ).collect()
    }
    upper = Window.currentRow if inclusive else -1
    korder = F.desc("k") if desc else F.asc("k")
    w = Window.orderBy(korder, F.asc("id")).rowsBetween(
        Window.unboundedPreceding, upper
    )
    want = {
        r["id"]: (r["s"], r["m"])
        for r in df.withColumn(
            "s", F.coalesce(F.sum("v").over(w), F.lit(0))
        )
        .withColumn("m", F.max("v").over(w))
        .collect()
    }
    assert got == want  # max stays NULL on the exclusive first row


@given(rows=frames, k=st.integers(1, 10))
@settings(**_SETTINGS)
def test_topk_with_rank_equals_sorted_head(spark, rows, k):
    df = _df(spark, rows).select("id", "v")
    got = sorted(
        (r["rank"], r["id"], r["v"])
        for r in topk_with_rank(
            df, [("v", "desc"), ("id", "asc")], k, "rank"
        ).collect()
    )
    ordered = sorted(rows_with_id(rows), key=lambda t: (-t[1], t[0]))[:k]
    want = sorted((i + 1, rid, v) for i, (rid, v) in enumerate(ordered))
    assert got == want


def rows_with_id(rows):
    return [(i, v) for i, (_k, v) in enumerate(rows)]


def test_dist_ntile_smaller_than_buckets(spark):
    """n rows < n buckets: NTILE gives bucket i to rank i."""
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    got = {
        r["id"]: r["q"]
        for r in dist_ntile(df, [("v", "asc"), ("id", "asc")], "q", n=5).collect()
    }
    assert got == {1: 1, 2: 2}
