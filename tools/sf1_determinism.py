"""Engine-only determinism sweep at sf1 for the near-dup family
(VERDICT r05 #8): the 11 ops excluded from sf1 oracle parity because
the DuckDB COMPARATOR goes superlinear there. Oracle parity at
sf0.001/0.01 already pins their values; what sf1 adds is evidence the
ENGINE is deterministic at scale (no partition-order or
AQE-replan-sensitive value drift — the class of bug the r03
spark_partition_id finding exposed).

Protocol: run each op TWICE (fresh plan each run, persists released
between), reduce each result to a Spark-side order-insensitive
fingerprint — (row_count, bounded residue sums of xxhash64(*cols)) —
and assert the two fingerprints match. The fingerprint never collects the
(up to tens of millions of) result rows to the driver, so the sweep
stays inside local-mode memory at any result size.

Ops that cannot complete at sf1 on this box are recorded as such
(q_minhash_lsh's ~100 GB shuffle appetite vs 77 GB free is measured
in SCALE.md), not silently skipped.

Usage: python -m tools.sf1_determinism [op ...]
Writes tools-local JSON to stdout, one line per op.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_standalone_scripts_spark import load_all_operators
from data_pipeline_standalone_scripts_spark.operators.common import (
    release_persists,
)
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.session import get_spark

SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".testdata_sf1"
)

# the 11 sf1-comparator-excluded ops (SURVEY round-5 note)
NEARDUP_FAMILY = [
    "q_jaccard_neardup",
    "q_shingle_jaccard",
    "q_ppjoin_neardup",
    "q_simhash_neardup",
    "q_cosine_neardup_pairs",
    "q_dedup_clusters",
    "q_pagerank_dups",
    "q_dedup_eval",
    "q_dedup_radius_sweep",
    "q_local_alignment",
    "q_minhash_lsh",  # last: known shuffle-disk-bound at sf1
]


def fingerprint(df) -> tuple[int, int, int]:
    """(count, sum of low-30-bit residues, sum of high-30-bit
    residues) of per-row xxhash64 over all columns — order-insensitive
    and computed entirely executor-side. Residue sums stay under 2^63
    up to ~8 B rows (ANSI mode forbids wrapping sums)."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    lo = F.pmod(h, F.lit(1 << 30))
    hi = F.pmod(F.shiftright(h, 32), F.lit(1 << 30))
    row = (
        df.select(lo.alias("lo"), hi.alias("hi"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("lo").alias("slo"),
            F.sum("hi").alias("shi"),
        )
        .collect()[0]
    )
    return (
        int(row["n"]),
        int(row["slo"] if row["slo"] is not None else 0),
        int(row["shi"] if row["shi"] is not None else 0),
    )


def main() -> None:
    names = sys.argv[1:] or NEARDUP_FAMILY
    spark = get_spark()
    load_all_operators()
    for name in names:
        rec: dict = {"op": name, "sf": 1.0}
        try:
            t0 = time.time()
            fp1 = fingerprint(REGISTRY[name].fn(spark, SF1_DIR))
            release_persists()
            spark.catalog.clearCache()
            t1 = time.time()
            fp2 = fingerprint(REGISTRY[name].fn(spark, SF1_DIR))
            release_persists()
            spark.catalog.clearCache()
            t2 = time.time()
            rec.update(
                rows=fp1[0],
                hash_sum_lo=fp1[1],
                hash_sum_hi=fp1[2],
                deterministic=(fp1 == fp2),
                run1_sec=round(t1 - t0, 1),
                run2_sec=round(t2 - t1, 1),
            )
            if fp1 != fp2:
                rec["fp2"] = {"rows": fp2[0], "lo": fp2[1], "hi": fp2[2]}
        except Exception as exc:  # record, don't die mid-sweep
            rec.update(error=f"{type(exc).__name__}: {exc}"[:300])
            traceback.print_exc(limit=2)
            release_persists()
            spark.catalog.clearCache()
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
