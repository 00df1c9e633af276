"""Local t2 replica CLI (SURVEY.md §5.2.2).

Usage:
    python -m tools.check_parity                 # all queries, sf0.01
    python -m tools.check_parity q_agg_pricing_summary --sf /root/testdata/sf0.001
    python -m tools.check_parity --category joins
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.oracle import check_query
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all registered)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--category", default=None)
    args = ap.parse_args()

    engine.load_all_operators()
    names = args.names or [
        n
        for n, q in REGISTRY.items()
        if args.category is None or q.category == args.category
    ]
    spark = get_spark("parity-check")
    failed = []
    for name in names:
        if name not in REGISTRY:
            print(f"[SKIP] {name}: not registered")
            failed.append(name)
            continue
        t0 = time.time()
        try:
            rep = check_query(name, spark, args.sf)
        except Exception as e:  # noqa: BLE001
            print(f"[ERROR] {name}: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        print(f"{rep}  ({time.time() - t0:.1f}s)")
        if not rep.ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
