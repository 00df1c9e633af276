"""RETRACTED METHODOLOGY — kept as a cautionary artifact. This harness
runs its conf variants in a FIXED order within each round, and on this
box the within-round warming trend systematically credits whichever
variant runs LAST (its original "SHJ halves q3 AND q5" readout did not
survive counterbalancing). Use tools/ab_shj_star.py (ABBA: arm order
alternates per round) for any strategy A/B; BASELINE.md round-7
addendum records both results side by side.

Original description: A/B broadcast-threshold / join-strategy
experiment for the shuffle-materialization perf-weak class
(BASELINE.md round-7: q3 3.19x, q5 3.62x at sf10).

Hypothesis: at sf10 the filtered fact sides (lineitem with
l_shipdate > cutoff in q3; date-filtered orders in q5) exceed the
default 10 MB spark.sql.autoBroadcastJoinThreshold, so the star joins
fall back to sort-merge with TWO large exchanges, while DuckDB builds
the same hash tables in-process. A 64 MB threshold is standard
practice on real clusters (a 64 MB broadcast is cheap next to
shuffling a fact table) and is SIZE-based, so it degrades gracefully:
at 100 TB the same sides exceed 64 MB and Spark falls back to SMJ
exactly as it should.

Protocol: ONE session, conf is flipped per run (both thresholds are
runtime-settable and read at planning time; each run builds a fresh
DataFrame via REGISTRY so it re-plans). Variants alternate
run-by-run so boot-epoch drift hits both equally. Median of N per
(op, variant) is printed as one JSON line per op.

Usage: python -m tools.bench_join_conf [--sf DIR] [--runs 5]
         [--ops q_join_star3,q_join_star6,...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "default_10m": {
        "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
        "spark.sql.join.preferSortMergeJoin": "true",
    },
    "bcast_64m": {
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.join.preferSortMergeJoin": "true",
    },
    "shj": {
        "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
        "spark.sql.join.preferSortMergeJoin": "false",
    },
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.testdata_sf10")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--ops", default="q_join_star3,q_join_star6,q_retention_cohort,q_funnel_conversion"
    )
    args = ap.parse_args()

    from data_pipeline_standalone_scripts_spark import load_all_operators
    from data_pipeline_standalone_scripts_spark.operators.common import (
        release_persists,
    )
    from data_pipeline_standalone_scripts_spark.registry import REGISTRY
    from data_pipeline_standalone_scripts_spark.session import get_spark

    spark = get_spark("join-conf-ab")
    spark.sparkContext.setLogLevel("ERROR")
    load_all_operators()
    ops = args.ops.split(",")

    # warm the scans once so run 1 of the first variant isn't paying IO
    for op in ops:
        REGISTRY[op].fn(spark, args.sf).toPandas()
        release_persists()

    results: dict[str, dict[str, list[float]]] = {
        op: {v: [] for v in VARIANTS} for op in ops
    }
    for run in range(args.runs):
        for variant, conf in VARIANTS.items():
            for k, v in conf.items():
                spark.conf.set(k, v)
            for op in ops:
                t0 = time.time()
                REGISTRY[op].fn(spark, args.sf).toPandas()
                results[op][variant].append(round(time.time() - t0, 2))
                release_persists()

    for op in ops:
        print(
            json.dumps(
                {
                    "op": op,
                    "sf": args.sf,
                    "medians": {
                        v: round(statistics.median(r), 2)
                        for v, r in results[op].items()
                    },
                    "runs": results[op],
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
