"""Show PPJoin's prefix filter DOES prune on a natural-vocabulary
corpus — the measured counterpart to the 31-token-fixture wall
(tools/profile_ppjoin_sf1.py, SCALE.md round-7).

The sf1 fixture draws 50 k docs from a 31-word vocabulary, where
rarest-first prefixes still post ~70% of the corpus and the exact
candidate mass is 4.05 B pairs. This harness synthesizes a corpus of
the SAME document count whose vocabulary is natural-sized (50 k
types, Zipf-ish rank-frequency via a deterministic hash draw), plants
a known fraction of true near-duplicates, and runs the identical
histogram pre-flight plus the full registry op:

- candidate mass should collapse by orders of magnitude (prefix
  tokens become genuinely rare), and
- the full exact join should complete in seconds at a doc count
  where the tiny-vocab fixture needs >25 minutes.

Determinism: all draws are xxhash64-based (no RNG state); the doc
builder is pure column algebra, so the corpus is reproducible
bit-for-bit.

Usage: python -m tools.bench_ppjoin_wide_vocab [--docs 50000]
Prints one JSON line per stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50000)
    ap.add_argument("--doc-len", type=int, default=60)
    ap.add_argument("--vocab", type=int, default=50000)
    ap.add_argument("--dup-frac", type=float, default=0.1)
    args = ap.parse_args()

    from data_pipeline_standalone_scripts_spark import load_all_operators
    from data_pipeline_standalone_scripts_spark.operators.common import (
        release_persists,
        tracked_persist,
    )
    from data_pipeline_standalone_scripts_spark.registry import REGISTRY
    from data_pipeline_standalone_scripts_spark.session import get_spark

    spark = get_spark("ppjoin-wide-vocab")
    spark.sparkContext.setLogLevel("ERROR")
    load_all_operators()

    n_dup = int(args.docs * args.dup_frac)
    # base docs: doc i's token j = "w" || (zipf-ish draw from hash(i,j)).
    # Rank draw: r = floor(vocab * (u^3)) squashes toward low ranks —
    # a heavy head + long tail like natural text, deterministic.
    base = (
        spark.range(args.docs)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "toks",
            F.transform(
                F.sequence(F.lit(0), F.lit(args.doc_len - 1)),
                lambda j: F.concat(
                    F.lit("w"),
                    (
                        F.floor(
                            F.lit(float(args.vocab))
                            * F.pow(
                                (
                                    F.pmod(
                                        F.xxhash64(F.col("doc_id"), j),
                                        F.lit(1 << 30),
                                    )
                                    / F.lit(float(1 << 30))
                                ),
                                F.lit(3.0),
                            )
                        )
                    ).cast("string"),
                ),
            ),
        )
    )
    # near-dups: docs [0, n_dup) get a twin at doc_id + docs with ~95%
    # of tokens kept (drop every 20th position) — Jaccard(sets) >= 0.8
    twins = (
        base.filter(F.col("doc_id") < n_dup)
        .select(
            (F.col("doc_id") + args.docs).alias("doc_id"),
            F.filter(
                F.col("toks"), lambda _t, i: F.pmod(i, F.lit(20)) != 0
            ).alias("toks"),
        )
    )
    docs = (
        base.unionByName(twins)
        .select(
            "doc_id",
            F.array_join("toks", " ").alias("text"),
            F.lit("en").alias("lang"),
            F.lit("synthetic").alias("source"),
            F.length(F.array_join("toks", " ")).alias("n_chars"),
        )
    )
    tmp = "/tmp/ppjoin_wide_vocab_sf"
    docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
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

    from data_pipeline_standalone_scripts_spark.operators.llm import (
        _doc_tokens,
    )
    from data_pipeline_standalone_scripts_spark.operators.common import (
        dist_row_number,
    )

    tok = tracked_persist(_doc_tokens(spark, tmp))
    stage("docs", lambda: args.docs + n_dup)
    stage("distinct_doc_tokens", lambda: tok.count())
    stage(
        "vocab",
        lambda: tok.select("token").distinct().count(),
    )

    lists = (
        tok.join(
            F.broadcast(
                dist_row_number(
                    tok.groupBy("token").agg(F.count(F.lit(1)).alias("df")),
                    [("df", "asc"), ("token", "asc")],
                    "rk",
                ).select("token", "rk")
            ),
            "token",
        )
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
    prefix = lists.select(
        "doc_id", F.explode(F.slice("toks", 1, F.col("plen"))).alias("token")
    )
    hist = prefix.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    stage(
        "candidate_pairs_exact(sum n(n-1)/2)",
        lambda: int(
            hist.agg(
                F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long")
            ).collect()[0][0]
        ),
    )
    stage(
        "hottest_prefix_postings_top5",
        lambda: [
            r["n"] for r in hist.orderBy(F.col("n").desc()).limit(5).collect()
        ],
    )
    release_persists()

    t0 = time.time()
    out = REGISTRY["q_ppjoin_neardup"].fn(spark, tmp)
    n_pairs = out.count()
    print(
        json.dumps(
            {
                "stage": "full_exact_ppjoin",
                "pairs": n_pairs,
                "planted_twins": n_dup,
                "sec": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )
    release_persists()
    spark.stop()


if __name__ == "__main__":
    main()
