"""VERDICT r12 "Next round #2": re-certify q_bm25_rank's arrow kernel
under the DRIVER protocol — fresh JVM per invocation, 2 warm-ups,
median of 5 toPandas-inclusive runs — because the r12 driver row went
0.83 → 1.30 s while the builder's in-session ABBA said arrow never
loses. One process = one variant = one cold JVM; alternate invocations
A/B/B/A from the shell to interleave epochs.

Usage:
    python -m tools.bench_bm25_recert --variant arrow|dict [--sf DIR]
Prints one JSON line: {"variant", "sf", "median", "runs", "loadavg"}.
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
    tracked_persist,
)
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.session import get_spark
from data_pipeline_standalone_scripts_spark.tables import load


def bm25_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r6–r11 mapInPandas dict/Counter kernel, verbatim from
    commit 824c25f^ — the candidate to revert to if arrow loses cold."""
    from data_pipeline_standalone_scripts_spark.operators.llm import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        BM25_TOPK,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    qset = set(BM25_QUERY)

    def tf_partials(batches):
        import pandas as pd

        for pdf in batches:
            ids, tks, tfs, dls = [], [], [], []
            n_docs = 0
            sum_dl = 0
            for doc_id, text in zip(
                pdf["doc_id"].tolist(), pdf["text"].tolist()
            ):
                if text is None:
                    n_docs += 1
                    continue
                toks = text.split(" ")
                n_docs += 1
                sum_dl += len(toks)
                cnt: dict = {}
                for tok in toks:
                    if tok in qset:
                        cnt[tok] = cnt.get(tok, 0) + 1
                for tok, tf_ in cnt.items():
                    ids.append(doc_id)
                    tks.append(tok)
                    tfs.append(tf_)
                    dls.append(len(toks))
            ids.append(-1)
            tks.append(None)
            tfs.append(n_docs)
            dls.append(sum_dl)
            yield pd.DataFrame(
                {"doc_id": ids, "token": tks, "tf": tfs, "dl": dls}
            )

    out = tracked_persist(
        d.mapInPandas(tf_partials, "doc_id long, token string, tf long, dl long")
    )
    srow = (
        out.filter(F.col("token").isNull())
        .agg(F.sum("tf").alias("n"), F.sum("dl").alias("total_dl"))
        .collect()[0]
    )
    n_docs_total = int(srow["n"] or 0)
    total_dl = int(srow["total_dl"] or 1)
    tf = out.filter(F.col("token").isNotNull())
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


def _loadavg() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError):
        return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=["arrow", "dict"], required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    engine.load_all_operators()
    # bench.py's SF-derived shuffle sizing
    import re

    m = re.search(r"sf(\d+(?:\.\d+)?)", os.path.basename(args.sf.rstrip("/")))
    sf = float(m.group(1)) if m else 0.1
    shuffle = int(os.environ.get("SPARK_GRAFT_SF_SHUFFLE", "0")) or max(
        8, min(32, int(80 * sf))
    )
    spark = get_spark("bm25-recert", shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    la = _loadavg()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    fn = REGISTRY["q_bm25_rank"].fn if args.variant == "arrow" else bm25_dict

    def drain() -> None:
        spark.catalog.clearCache()
        release_persists()

    # driver protocol: two warm-ups, then median of N timed runs
    fn(spark, args.sf).toPandas()
    drain()
    fn(spark, args.sf).toPandas()
    drain()
    runs = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        fn(spark, args.sf).toPandas()
        runs.append(time.perf_counter() - t0)
        drain()
    print(
        json.dumps(
            {
                "variant": args.variant,
                "sf": args.sf,
                "median": round(statistics.median(runs), 4),
                "runs": [round(x, 3) for x in runs],
                "loadavg": la,
            }
        )
    )


if __name__ == "__main__":
    main()
