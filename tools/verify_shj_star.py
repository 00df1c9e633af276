"""Verify the size-dispatched SHJ hint on q3/q5 (round 7): at sf10 the
hinted plan must contain ShuffledHashJoin and no SortMergeJoin, produce
VALUES identical to the hint-off plan, and reproduce the measured win.

Usage: python -m tools.verify_shj_star [--sf DIR] [--runs 5]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.testdata_sf10")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    from data_pipeline_standalone_scripts_spark import load_all_operators
    from data_pipeline_standalone_scripts_spark.operators import joins
    from data_pipeline_standalone_scripts_spark.operators.common import (
        release_persists,
    )
    from data_pipeline_standalone_scripts_spark.registry import REGISTRY
    from data_pipeline_standalone_scripts_spark.session import get_spark

    spark = get_spark("verify-shj")
    spark.sparkContext.setLogLevel("ERROR")
    load_all_operators()

    # q5 keeps default SMJ (measured wash — see joins.py); only q3
    # carries the dispatch.
    for op in ("q_join_star3",):
        plan = plan_of(REGISTRY[op].fn(spark, args.sf))
        assert "ShuffledHashJoin" in plan, f"{op}: no SHJ in plan"
        assert "SortMergeJoin" not in plan, f"{op}: SMJ survived"
        hinted = REGISTRY[op].fn(spark, args.sf).toPandas()
        hinted = hinted.sort_values(by=list(hinted.columns)).reset_index(
            drop=True
        )
        saved = joins._SHJ_MIN_ORDERS_BYTES
        joins._SHJ_MIN_ORDERS_BYTES = 1 << 60  # hint off
        try:
            plain = (
                REGISTRY[op]
                .fn(spark, args.sf)
                .toPandas()
                .sort_values(by=list(hinted.columns))
                .reset_index(drop=True)
            )
        finally:
            joins._SHJ_MIN_ORDERS_BYTES = saved
        assert hinted.equals(plain), f"{op}: VALUES DIFFER hinted vs plain"
        print(json.dumps({"op": op, "plan_shj": True, "values_equal": True}))
        release_persists()

    for op in ("q_join_star3", "q_join_star6"):
        times = []
        for _ in range(args.runs):
            t0 = time.time()
            REGISTRY[op].fn(spark, args.sf).toPandas()
            times.append(round(time.time() - t0, 2))
            release_persists()
        print(
            json.dumps(
                {"op": op, "median": statistics.median(times), "runs": times}
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
