"""Interleaved hint-on/hint-off A/B for the q3/q5 SHJ dispatch —
run-by-run alternation in ONE session so epoch drift hits both arms.

Usage: python -m tools.ab_shj_star [--sf DIR] [--runs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    spark = get_spark("ab-shj")
    spark.sparkContext.setLogLevel("ERROR")
    load_all_operators()
    ops = ("q_join_star3", "q_join_star6")

    for op in ops:  # warm scans
        REGISTRY[op].fn(spark, args.sf).toPandas()
        release_persists()

    res = {op: {"shj": [], "smj": []} for op in ops}
    saved = joins._SHJ_MIN_ORDERS_BYTES
    for rnd in range(args.runs):
        # ABBA counterbalancing: alternate arm ORDER per round so
        # within-round warming bias cancels instead of accumulating on
        # whichever arm runs last (the flaw found in bench_join_conf).
        order = ("shj", "smj") if rnd % 2 == 0 else ("smj", "shj")
        for arm in order:
            joins._SHJ_MIN_ORDERS_BYTES = saved if arm == "shj" else (1 << 60)
            for op in ops:
                t0 = time.time()
                REGISTRY[op].fn(spark, args.sf).toPandas()
                res[op][arm].append(round(time.time() - t0, 2))
                release_persists()
    joins._SHJ_MIN_ORDERS_BYTES = saved

    for op in ops:
        print(
            json.dumps(
                {
                    "op": op,
                    "medians": {
                        a: round(statistics.median(r), 2)
                        for a, r in res[op].items()
                    },
                    "runs": res[op],
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
