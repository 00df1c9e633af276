"""DuckDB-side bench: warm median-of-5 of each BASELINE.md headline
row's ``oracle_sql()`` verbatim, on a given sf dir.

This is the comparator half of the same-epoch protocol (BASELINE.md
"Same-epoch comparison table"): absolute wall-clock on this box
drifts +/-50% per boot epoch for BOTH engines, so a meaningful ratio
requires measuring DuckDB and Spark in ONE epoch. Run this
back-to-back with bench.py and record both.

Usage:
    python -m tools.bench_oracle                       # sf0.1
    SPARK_GRAFT_SF_DIR=.testdata_sf1 python -m tools.bench_oracle

Prints one JSON line mirroring bench.py's shape:
  {"metric": "oracle_queries_median_wall", "value": N, "unit": "sec",
   "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.oracle import duckdb_connect
from data_pipeline_standalone_scripts_spark.registry import REGISTRY

from bench import HEADLINE, N_RUNS


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf(\d+(?:\.\d+)?)", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else 0.1
    engine.load_all_operators()
    con = duckdb_connect(sf_dir)
    only = {
        s for s in os.environ.get("SPARK_BENCH_ONLY", "").split(",") if s
    }
    rows = {k: v for k, v in HEADLINE.items() if not only or k in only}
    timings: dict[str, float] = {}
    for label, qname in rows.items():
        sql = REGISTRY[qname].oracle
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm-up (plan + buffer cache)
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        timings[label] = round(statistics.median(runs), 4)
    print(
        json.dumps(
            {
                "metric": "oracle_queries_median_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
