"""Per-query compute vs transfer profile (guide §1.4): for each
headline row, median wall of (a) the noop-sink write — computation
only — and (b) the bench-protocol toPandas, plus the result row count.
Splits "engine work" from "result materialization + Arrow transfer" so
optimization effort lands where the time actually goes.

Usage: python -m tools.profile_noop [row1,row2,...]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.operators.common import release_persists
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.session import get_spark


def main() -> None:
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    engine.load_all_operators()
    shuffle = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "8"))
    spark = get_spark("profile-noop", shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows = dict(bench.HEADLINE)
    if len(sys.argv) > 1:
        keep = set(sys.argv[1].split(","))
        rows = {k: v for k, v in rows.items() if k in keep}

    n_runs = int(os.environ.get("PROFILE_RUNS", "3"))
    out = {}
    for label, qname in rows.items():
        fn = REGISTRY[qname].fn
        spark.sparkContext.setJobDescription(f"profile: {label}")

        def clear() -> None:
            spark.catalog.clearCache()
            release_persists()

        # two warm-ups (bench protocol: C2 JIT finishes on the 2nd)
        fn(spark, sf_dir).toPandas(); clear()
        fn(spark, sf_dir).toPandas(); clear()
        noop, topd, nrows = [], [], 0
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop.append(time.perf_counter() - t0)
            clear()
            t0 = time.perf_counter()
            pdf = fn(spark, sf_dir).toPandas()
            topd.append(time.perf_counter() - t0)
            nrows = len(pdf)
            clear()
        out[label] = {
            "noop": round(statistics.median(noop), 4),
            "topandas": round(statistics.median(topd), 4),
            "rows": nrows,
        }
        print(label, out[label], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
