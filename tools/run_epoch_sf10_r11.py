"""Round-11 sf10 epoch rows (VERDICT r10 #6): q_pipeline_e2e and
q_warc_extract under the full epoch-noise protocol — fresh session,
one DISCLOSED first-touch warm-up per op (pays the 2.4 GB corpus read
+ worker spin-up; excluded from the cited median, stated as such),
then 5 timed invocations with 60 s cool-downs, box otherwise idle
(loadavg recorded around every invocation). Engine-only walls: the
SCALE.md tier for this family is the engine curve (the X63 oracle is
a parity-scale CTE, not a comparator).

    python -m tools.run_epoch_sf10_r11 [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.operators.common import (
    release_persists,
)
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.session import get_spark

OPS = ["q_warc_extract", "q_pipeline_e2e"]
N_RUNS = 5
COOLDOWN_S = 60


def loadavg() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError):
        return -1.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata_sf10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/epoch_sf10_r11.json"
    engine.load_all_operators()
    spark = get_spark("epoch_sf10_r11", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name in OPS:
        fn = REGISTRY[name].fn
        # disclosed first-touch warm-up (corpus read + worker spin-up)
        t0 = time.perf_counter()
        n_rows = len(fn(spark, sf_dir).toPandas())
        warm = time.perf_counter() - t0
        spark.catalog.clearCache()
        release_persists()
        runs, loads = [], []
        for _ in range(N_RUNS):
            time.sleep(COOLDOWN_S)
            loads.append(loadavg())
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            runs.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
            release_persists()
        out[name] = {
            "warmup_first_touch_s": round(warm, 2),
            "runs_s": runs,
            "loadavg_before_each": loads,
            "n_rows": n_rows,
        }
        print(name, out[name], flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("EPOCH_SF10_R11_DONE", out_path)


if __name__ == "__main__":
    main()
