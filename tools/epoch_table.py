"""Assemble the same-epoch per-row comparison table from a directory
of bench.py / tools.bench_oracle logs (tools/run_epoch_tables.sh
output). Per-row value = median ACROSS invocations of each
invocation's median-of-5 (single sf10 invocations swing ±50%).

Usage: python -m tools.epoch_table /tmp/epoch_r7 sf1
       python -m tools.epoch_table /tmp/epoch_r7 sf10
Prints a markdown table plus the aggregate totals/ratio.
"""

from __future__ import annotations

import glob
import json
import re
import statistics
import sys


def collect(pattern: str) -> dict[str, list[float]]:
    rows: dict[str, list[float]] = {}
    for path in sorted(glob.glob(pattern)):
        txt = open(path).read()
        m = re.search(r'\{"metric.*', txt)
        if not m:
            print(f"WARN: no JSON in {path}", file=sys.stderr)
            continue
        d = json.loads(m.group(0))
        for k, v in d["queries"].items():
            rows.setdefault(k, []).append(v)
    return rows


def main() -> None:
    out_dir, tier = sys.argv[1], sys.argv[2]
    spark = collect(f"{out_dir}/spark_{tier}_*.log")
    duck = collect(f"{out_dir}/duck_{tier}_*.log")
    print(f"| row | DuckDB (s) | Spark (s) | ratio | spark runs | duck runs |")
    print("|---|---|---|---|---|---|")
    stot = dtot = 0.0
    weak = []
    for k in spark:
        sm = statistics.median(spark[k])
        dm = statistics.median(duck.get(k, [float("nan")]))
        stot += sm
        dtot += dm
        ratio = sm / dm if dm else float("nan")
        flag = " **" if (ratio > 2 and dm >= 0.25) else ""
        if ratio > 2 and dm >= 0.25:
            weak.append((k, round(ratio, 2)))
        print(
            f"| {k} | {dm:.2f} | {sm:.2f} | {ratio:.2f}x{flag} | "
            f"{[round(x, 2) for x in spark[k]]} | "
            f"{[round(x, 2) for x in duck.get(k, [])]} |"
        )
    print(
        f"\naggregate: Spark {stot:.2f} s vs DuckDB {dtot:.2f} s = "
        f"{stot / dtot:.2f}x"
    )
    print("rows >2x with DuckDB >=250ms:", weak)


if __name__ == "__main__":
    main()
