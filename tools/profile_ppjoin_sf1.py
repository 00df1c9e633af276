"""Profile where q_ppjoin_neardup's sf1 wall goes (VERDICT r06 #7).

The op exceeded the 25-min/run cap in the round-6 sf1 determinism
sweep. This harness times each plan stage separately and — before
attempting the prefix self-join at all — computes its EXACT output
cardinality from the prefix-token histogram (sum over tokens of
n·(n−1)/2), which costs one small shuffle instead of the join. That
number says whether the blowup is the posting join itself (hot
prefix tokens) or the downstream distinct/verify.

Runs under the zstd session recipe (tools/run_minhash_sf1.py) since
any sf1 candidate-stream materialization on this box wants it.

Usage: python -m tools.profile_ppjoin_sf1 [--sf DIR] [--skip-join]
Prints one JSON line per stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".testdata_sf1",
        ),
    )
    ap.add_argument("--skip-join", action="store_true")
    args = ap.parse_args()

    from data_pipeline_standalone_scripts_spark import load_all_operators
    from data_pipeline_standalone_scripts_spark.operators.common import (
        dist_row_number,
        release_persists,
    )
    from data_pipeline_standalone_scripts_spark.session import (
        ensure_runtime_conf,
    )

    spark = (
        SparkSession.builder.appName("ppjoin-profile")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.io.compression.zstd.level", "3")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_runtime_conf(spark)
    load_all_operators()

    from data_pipeline_standalone_scripts_spark.operators.llm import (
        _doc_tokens,
    )

    def stage(label, thunk):
        t0 = time.time()
        val = thunk()
        print(
            json.dumps(
                {"stage": label, "value": val, "sec": round(time.time() - t0, 1)}
            ),
            flush=True,
        )
        return val

    tok = _doc_tokens(spark, args.sf)
    stage("distinct_doc_tokens", lambda: tok.count())

    rank = dist_row_number(
        tok.groupBy("token").agg(F.count(F.lit(1)).alias("df")),
        [("df", "asc"), ("token", "asc")],
        "rk",
    ).select("token", "rk")
    stage("rank_rows", lambda: rank.count())
    release_persists()

    lists = (
        tok.join(F.broadcast(rank), "token")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", "token"))),
                lambda t: t["token"],
            ).alias("toks")
        )
        .select("doc_id", "toks", F.size("toks").alias("sz"))
        .withColumn(
            "plen",
            F.col("sz") - F.floor((4 * F.col("sz") + 4) / 5).cast("int") + 1,
        )
    )
    release_persists()

    prefix = lists.select(
        "doc_id", F.explode(F.slice("toks", 1, F.col("plen"))).alias("token")
    )
    stage("prefix_rows", lambda: prefix.count())
    release_persists()

    # exact self-join cardinality WITHOUT the join: sum n*(n-1)/2 over
    # the prefix-token histogram, plus the hottest posting lists
    hist = prefix.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    pairs_est = stage(
        "candidate_pairs_exact(sum n(n-1)/2)",
        lambda: int(
            hist.agg(
                F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long")
            ).collect()[0][0]
        ),
    )
    release_persists()
    stage(
        "hottest_prefix_postings_top10",
        lambda: [
            [r["n"]]
            for r in hist.orderBy(F.col("n").desc()).limit(10).collect()
        ],
    )
    release_persists()

    if args.skip_join or pairs_est > 5_000_000_000:
        print(
            json.dumps(
                {
                    "stage": "join_skipped",
                    "reason": f"candidate pairs {pairs_est:,}",
                }
            ),
            flush=True,
        )
        spark.stop()
        return

    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "token")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    stage("distinct_candidates", lambda: cand.distinct().count())
    release_persists()

    from data_pipeline_standalone_scripts_spark.registry import REGISTRY

    stage(
        "full_op_rows", lambda: REGISTRY["q_ppjoin_neardup"].fn(spark, args.sf).count()
    )
    release_persists()
    spark.stop()


if __name__ == "__main__":
    main()
