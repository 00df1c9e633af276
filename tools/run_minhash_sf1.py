"""Complete q_minhash_lsh at sf1 on this box (VERDICT r05 #5).

SCALE.md round 5 measured the op shuffle-disk-bound at sf1: the
thin (band, pair) collision stream is ~830 M rows and its lz4 map
output + sorter spill needs ~100 GB where the box has 77 GB free —
two runs filled the disk. This harness applies the two provisioning
levers a cluster would tune, WITHOUT touching the operator's plan:

1. zstd shuffle/spill compression (`spark.io.compression.codec`):
   better ratio than lz4 on thin repetitive rows — this is exactly
   the "shuffle-tier provisioning" knob, set per-run because the
   codec is per-SparkContext (the shared session factory stays lz4;
   benches are unaffected).
2. A dedicated local-dir under the largest free mount plus disk
   polling every 5 s so a failed fit is MEASURED (peak GB), not just
   a dead JVM.

Prints one JSON line: rows, wall seconds, peak shuffle GB, codec.
Usage: python -m tools.run_minhash_sf1
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/tmp/minhash_sf1_shuffle"


def main() -> None:
    os.makedirs(SCRATCH, exist_ok=True)
    from pyspark.sql import SparkSession

    from data_pipeline_standalone_scripts_spark import load_all_operators
    from data_pipeline_standalone_scripts_spark.registry import REGISTRY
    from data_pipeline_standalone_scripts_spark.session import ensure_runtime_conf
    from data_pipeline_standalone_scripts_spark.operators.common import (
        release_persists,
    )

    spark = (
        SparkSession.builder.appName("minhash-sf1-zstd")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.io.compression.zstd.level", "3")
        .config("spark.local.dir", SCRATCH)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ensure_runtime_conf(spark)
    load_all_operators()

    sf1 = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".testdata_sf1",
    )

    peak = {"bytes": 0}
    stop = threading.Event()

    def poll() -> None:
        while not stop.is_set():
            total = 0
            for root, _dirs, files in os.walk(SCRATCH):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
            peak["bytes"] = max(peak["bytes"], total)
            time.sleep(5)

    t = threading.Thread(target=poll, daemon=True)
    t.start()
    t0 = time.time()
    err = None
    n = None
    fp = None
    try:
        # Round 7 (VERDICT r06 #6): reduce to the sf1_determinism
        # fingerprint — (count, low/high-30-bit residue sums of
        # per-row xxhash64) — instead of a bare count, so two
        # invocations of this harness pin VALUE determinism of the
        # pair set, not just its cardinality. Same single action,
        # same shuffle cost; nothing upstream of the final distinct
        # can be pruned by the agg.
        from tools.sf1_determinism import fingerprint

        fp = fingerprint(REGISTRY["q_minhash_lsh"].fn(spark, sf1))
        n = fp[0]
    except Exception as exc:  # noqa: BLE001 — record the failure mode
        err = f"{type(exc).__name__}: {exc}"[:300]
    wall = time.time() - t0
    stop.set()
    t.join(timeout=10)
    release_persists()
    print(
        json.dumps(
            {
                "op": "q_minhash_lsh",
                "sf": 1.0,
                "codec": "zstd",
                "rows": n,
                "hash_sum_lo": fp[1] if fp else None,
                "hash_sum_hi": fp[2] if fp else None,
                "wall_sec": round(wall, 1),
                "peak_shuffle_gb": round(peak["bytes"] / 1e9, 1),
                "error": err,
            }
        ),
        flush=True,
    )
    spark.stop()
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
