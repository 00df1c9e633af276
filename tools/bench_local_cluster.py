"""Executor-amortization measurement (VERDICT r06 "Next round #3").

Every residual >2x perf-weak row (q3/q5 star joins, interval coverage,
tumbling window) is attributed to local[32]'s serialized per-stage
scheduling + in-process shuffle floors "that real executor counts
amortize". This harness converts that claim into a measurement: it
runs the same registry ops under

  - ``local[32]``                 — one JVM, 32 task threads (the
                                    bench default), and
  - ``local-cluster[2,16,N]``     — Spark's pseudo-cluster master:
                                    2 REAL executor JVMs x 16 cores,
                                    real Netty shuffle between
                                    processes, real task serialization

in the SAME boot epoch. Each master runs in its own subprocess (a JVM
cannot change master in-process); within a subprocess the protocol is
bench.py's (warmup, then median of N toPandas-timed runs,
tracked-persist drain between runs).

What to expect: local-cluster pays MORE overhead per stage (IPC,
serialization, cross-process fetch) — the claim is NOT that 2x16 beats
1x32 on this box, but that the SHAPE holds: if the gap rows' wall
under local-cluster grows by roughly the per-stage fixed costs while
per-row work stays constant, the local-mode number is floor-dominated
as argued; if a row blows up superlinearly, its plan has a real
cross-executor problem (e.g. a shuffle whose volume local mode hides).

Usage:
    python -m tools.bench_local_cluster [--sf DIR] [--runs N]
    python -m tools.bench_local_cluster --single-master 'local[32]' ...
        (internal: one-master child mode, prints one JSON line)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = {
    "q3_star_join_topk": "q_join_star3",
    "q5_multiway": "q_join_star6",
    "events_interval_coverage": "q_interval_coverage",
    "events_tumbling_1h": "q_tumbling_window",
    # kernel (Arrow/Python-worker) class — round-7 extension: does the
    # mapInPandas fan-out amortize across real executor JVMs (each
    # executor runs its OWN Python worker pool) or pay extra IPC?
    "docs_wordcount": "q_explode",
    "docs_bm25_topk": "q_bm25_rank",
    "docs_boilerplate_5gram": "q_boilerplate_ngrams",
    # round-9 extension (VERDICT r08 #8): the r8/r9 rows — FITS
    # gen+parse kernel, the à-trous kernels (1-D and true 2-D), and
    # the rewritten single-scan funnel/retention shapes
    "media_fits_decode": "q_fits_decode",
    "emb_atrous_filter": "q_atrous_filter",
    "media_atrous2d": "q_atrous_2d",
    "events_funnel": "q_funnel_conversion",
    "events_retention_cohort": "q_retention_cohort",
}

MASTERS = ["local[32]", "local-cluster[2,16,49152]"]
# override with --masters 'local-cluster[4,8,16384];local[32]'


def run_single(master: str, sf_dir: str, runs: int, only: list[str]) -> None:
    from pyspark.sql import SparkSession

    import data_pipeline_standalone_scripts_spark as engine
    from data_pipeline_standalone_scripts_spark.operators.common import (
        release_persists,
    )
    from data_pipeline_standalone_scripts_spark.registry import REGISTRY
    from data_pipeline_standalone_scripts_spark.session import (
        ensure_runtime_conf,
    )

    engine.load_all_operators()
    builder = (
        SparkSession.builder.appName(f"lc-bench-{master}")
        .master(master)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master.startswith("local-cluster"):
        # tuple is [workers, coresPerWorker, memPerWorkerMB]; size the
        # executor JVM inside the worker grant with ~8% headroom
        nums = master[master.index("[") + 1: master.index("]")].split(",")
        worker_mb = int(nums[2])
        exec_mb = max(1024, worker_mb - max(1024, worker_mb // 12))
        builder = (
            builder.config("spark.executor.memory", f"{exec_mb}m")
            .config("spark.executor.cores", nums[1])
            .config("spark.driver.memory", "16g")
        )
    else:
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_runtime_conf(spark)

    results = {}
    names = only or list(OPS)
    for row in names:
        fn = REGISTRY[OPS[row]].fn
        fn(spark, sf_dir).toPandas()  # warmup (fresh plan each run below)
        release_persists()
        times = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).toPandas()
            times.append(time.time() - t0)
            release_persists()
        results[row] = {
            "median": round(statistics.median(times), 4),
            "runs": [round(t, 3) for t in times],
        }
    print(
        "RESULT " + json.dumps({"master": master, "sf": sf_dir, "rows": results}),
        flush=True,
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.testdata_sf10")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--only", default=None, help="comma-separated row names")
    ap.add_argument("--single-master", default=None)
    ap.add_argument("--masters", default=None, help="';'-separated master URLs")
    args = ap.parse_args()
    only = args.only.split(",") if args.only else []

    if args.single_master:
        run_single(args.single_master, args.sf, args.runs, only)
        return

    masters = args.masters.split(";") if args.masters else MASTERS
    for master in masters:
        cmd = [
            sys.executable,
            "-m",
            "tools.bench_local_cluster",
            "--single-master",
            master,
            "--sf",
            args.sf,
            "--runs",
            str(args.runs),
        ]
        if args.only:
            cmd += ["--only", args.only]
        proc = subprocess.run(
            cmd,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True,
            text=True,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[len("RESULT "):], flush=True)
                break
        else:
            print(
                json.dumps(
                    {
                        "master": master,
                        "error": proc.stderr.strip().splitlines()[-5:],
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
