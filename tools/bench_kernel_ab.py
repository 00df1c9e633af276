"""Same-epoch A/B: JVM explode forms vs Arrow partial-count kernels
(VERDICT r06 "Next round #2").

The round-6 kernel rewrites (q_explode / q_boilerplate_ngrams /
q_bm25_rank) are proven at sf10 (-41%/-46%/-12% same-epoch), but their
BENCH_r06 rows at sf0.1 moved +40-43% vs a +17% epoch median, leaving
open whether the Arrow round-trip LOSES at small batch sizes. This
harness times the retired JVM forms (reconstructed below, matching the
round-5 implementations the docstrings describe) against the shipped
kernels, interleaved J/K within each repetition so both forms share
every GC/IO condition, with bench.py's protocol (fresh plan per run,
toPandas-inclusive timing, tracked-persist drain).

Usage:
    python -m tools.bench_kernel_ab [--sf DIR] [--runs N]
Prints one JSON line per op: {"op", "sf", "jvm_median", "kernel_median",
"ratio", "jvm_runs", "kernel_runs"}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.operators.common import (
    release_persists,
)
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.session import get_spark
from data_pipeline_standalone_scripts_spark.tables import load

_NG = 5


def wordcount_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 q_explode: split + posexplode + Expand countDistinct."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("pos").cast("long").alias("min_pos"),
        )
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


def boilerplate_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 q_boilerplate_ngrams: transform/sequence shingle explode."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    t = d.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= _NG
    )
    grams = t.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks) - {_NG}),"
                f" i -> array_join(slice(toks, i + 1, {_NG}), ' '))"
            )
        ).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(20)
    )


def bm25_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 q_bm25_rank: two JVM passes (stats scan + explode-filter
    token scan), then the identical scoring tail."""
    from data_pipeline_standalone_scripts_spark.operators.llm import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        BM25_TOPK,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    srow = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("total_dl"),
    ).collect()[0]
    n_docs_total = int(srow["n"] or 0)
    total_dl = int(srow["total_dl"] or 1)
    toks = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    tf = (
        toks.filter(F.col("token").isin(list(BM25_QUERY)))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.lit(n_docs_total) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    score = (
        idf
        * F.col("tf")
        * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1
            * (
                1.0
                - BM25_B
                + BM25_B
                * (
                    F.col("dl").cast("double")
                    * F.lit(n_docs_total)
                    / F.lit(total_dl)
                )
            )
        )
    )
    micros = score * 1_000_000
    term = (
        micros + F.when(micros >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))
    ).cast("long")
    return (
        tf.join(F.broadcast(dfreq), "token")
        .select("doc_id", term.alias("m"))
        .groupBy("doc_id")
        .agg(F.sum("m").alias("msum"))
        .orderBy(F.col("msum").desc(), F.col("doc_id").asc())
        .limit(BM25_TOPK)
        .select(
            "doc_id",
            F.round(F.col("msum").cast("double") / 1_000_000.0, 6).alias(
                "bm25"
            ),
        )
    )


PAIRS = {
    "docs_wordcount": ("q_explode", wordcount_jvm),
    "docs_boilerplate_5gram": ("q_boilerplate_ngrams", boilerplate_jvm),
    "docs_bm25_topk": ("q_bm25_rank", bm25_jvm),
}


def _timed(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).toPandas()
    dt = time.time() - t0
    release_persists()
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--only", default=None, help="comma-separated row names")
    args = ap.parse_args()

    engine.load_all_operators()
    spark = get_spark("kernel-ab")
    rows = PAIRS
    if args.only:
        keep = set(args.only.split(","))
        rows = {k: v for k, v in PAIRS.items() if k in keep}

    for row, (reg_name, jvm_fn) in rows.items():
        kernel_fn = REGISTRY[reg_name].fn
        # sanity: both forms agree before timing
        jp = jvm_fn(spark, args.sf).toPandas()
        release_persists()
        kp = kernel_fn(spark, args.sf).toPandas()
        release_persists()
        same = jp.reset_index(drop=True).equals(kp.reset_index(drop=True))
        # warmup pair already done above; now interleave timed runs
        j_times, k_times = [], []
        for _ in range(args.runs):
            j_times.append(_timed(jvm_fn, spark, args.sf))
            k_times.append(_timed(kernel_fn, spark, args.sf))
        jm = statistics.median(j_times)
        km = statistics.median(k_times)
        print(
            json.dumps(
                {
                    "op": row,
                    "sf": args.sf,
                    "values_equal": bool(same),
                    "jvm_median": round(jm, 4),
                    "kernel_median": round(km, 4),
                    "kernel_vs_jvm": round(km / jm, 3) if jm else None,
                    "jvm_runs": [round(t, 3) for t in j_times],
                    "kernel_runs": [round(t, 3) for t in k_times],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
