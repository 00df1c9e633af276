"""Same-epoch ABBA: shipped pandas/Counter partial-count kernels vs
pyarrow-compute mapInArrow variants (VERDICT r11 #7 — "the one untried
lever ... skip the pandas materialization entirely").

The arrow variants run the tokenize/count work as vectorized
pyarrow.compute + Acero group_by kernels per batch instead of Python
loops over rows; the downstream Spark aggregation is identical, so the
query's answer is unchanged (asserted here row-for-row before timing).

Usage:
    python -m tools.bench_arrow_kernels [--sf DIR] [--runs N]
Prints one JSON line per op:
    {"op", "sf", "shipped_median", "arrow_median", "ratio", ...}
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

_NG = 5


# ---------------------------------------------------------------- explode
def explode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def token_partials(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column(1)
            split = pc.split_pattern(text, " ")
            flat = pc.list_flatten(split)
            if len(flat) == 0:
                continue
            parent = pc.list_parent_indices(split)
            offsets = np.asarray(split.offsets)
            pos = np.arange(len(flat), dtype=np.int64) - offsets.astype(
                np.int64
            )[np.asarray(parent)]
            t = pa.table(
                {"token": flat, "parent": parent, "pos": pa.array(pos)}
            )
            per_tok = t.group_by("token").aggregate(
                [("pos", "min"), ("token", "count")]
            )
            pairs = t.group_by(["token", "parent"]).aggregate([])
            per_doc = pairs.group_by("token").aggregate([("parent", "count")])
            out = per_tok.join(per_doc, "token")
            yield pa.record_batch(
                [
                    out["token"].combine_chunks(),
                    out["token_count"].cast(pa.int64()).combine_chunks(),
                    out["parent_count"].cast(pa.int64()).combine_chunks(),
                    out["pos_min"].cast(pa.int64()).combine_chunks(),
                ],
                names=["token", "n", "docs", "min_pos"],
            )

    partials = d.mapInArrow(
        token_partials, "token string, n long, docs long, min_pos long"
    )
    return (
        partials.groupBy("token")
        .agg(
            F.sum("n").alias("n"),
            F.sum("docs").alias("n_docs"),
            F.min("min_pos").cast("long").alias("min_pos"),
        )
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


# ---------------------------------------------------------- boilerplate
def boilerplate_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )

    def shingle_partials(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        empty = pa.record_batch(
            [
                pa.array([], pa.string()),
                pa.array([], pa.int64()),
                pa.array([], pa.int64()),
            ],
            names=["gram", "occ", "docs"],
        )
        for batch in batches:
            text = batch.column(1)
            split = pc.split_pattern(text, " ")
            flat = pc.list_flatten(split)
            n = len(flat)
            if n < _NG:
                continue
            parent = np.asarray(pc.list_parent_indices(split))
            valid = parent[: n - _NG + 1] == parent[_NG - 1 :]
            if not valid.any():
                continue
            shifted = [flat.slice(k, n - _NG + 1) for k in range(_NG)]
            grams = pc.binary_join_element_wise(*shifted, " ")
            gt = pa.table(
                {
                    "gram": grams.filter(pa.array(valid)),
                    "parent": pa.array(parent[: n - _NG + 1][valid]),
                }
            )
            per_g = gt.group_by("gram").aggregate([("gram", "count")])
            pairs = gt.group_by(["gram", "parent"]).aggregate([])
            per_d = pairs.group_by("gram").aggregate([("parent", "count")])
            out = per_g.join(per_d, "gram")
            yield pa.record_batch(
                [
                    out["gram"].combine_chunks(),
                    out["gram_count"].cast(pa.int64()).combine_chunks(),
                    out["parent_count"].cast(pa.int64()).combine_chunks(),
                ],
                names=["gram", "occ", "docs"],
            )
        yield empty

    partials = d.mapInArrow(shingle_partials, "gram string, occ long, docs long")
    return (
        partials.groupBy("gram")
        .agg(
            F.sum("occ").alias("n_occurrences"),
            F.sum("docs").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(20)
    )


# ----------------------------------------------------------------- bm25
def bm25_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_standalone_scripts_spark.operators.llm import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        BM25_TOPK,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    qterms = sorted(BM25_QUERY)

    def tf_partials(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        qarr = pa.array(qterms, pa.string())
        for batch in batches:
            doc_id = batch.column(0)
            text = batch.column(1)
            split = pc.split_pattern(text, " ")
            dl = pc.list_value_length(split)
            flat = pc.list_flatten(split)
            keep = pc.is_in(flat, value_set=qarr)
            t = pa.table(
                {
                    "parent": pc.list_parent_indices(split).filter(keep),
                    "token": flat.filter(keep),
                }
            )
            g = t.group_by(["parent", "token"]).aggregate([("token", "count")])
            par = g["parent"]
            n_docs = len(doc_id)
            sum_dl = pc.sum(dl).as_py() or 0
            yield pa.record_batch(
                [
                    pa.concat_arrays(
                        [
                            doc_id.take(par).combine_chunks(),
                            pa.array([-1], pa.int64()),
                        ]
                    ),
                    pa.concat_arrays(
                        [
                            g["token"].combine_chunks(),
                            pa.array([None], pa.string()),
                        ]
                    ),
                    pa.concat_arrays(
                        [
                            g["token_count"].cast(pa.int64()).combine_chunks(),
                            pa.array([n_docs], pa.int64()),
                        ]
                    ),
                    pa.concat_arrays(
                        [
                            dl.take(par).cast(pa.int64()).combine_chunks(),
                            pa.array([sum_dl], pa.int64()),
                        ]
                    ),
                ],
                names=["doc_id", "token", "tf", "dl"],
            )

    out = tracked_persist(
        d.mapInArrow(tf_partials, "doc_id long, token string, tf long, dl long")
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


PAIRS = {
    "q_explode": explode_arrow,
    "q_boilerplate_ngrams": boilerplate_arrow,
    "q_bm25_rank": bm25_arrow,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--ops", default=",".join(PAIRS))
    args = ap.parse_args()

    engine.load_all_operators()
    shuffle = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "0")) or 8
    spark = get_spark("arrow-kernel-ab", shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def drain() -> None:
        spark.catalog.clearCache()
        release_persists()

    for op in args.ops.split(","):
        shipped = REGISTRY[op].fn
        arrow = PAIRS[op]
        # equality first (sorted rows)
        a = shipped(spark, args.sf).toPandas()
        drain()
        b = arrow(spark, args.sf).toPandas()
        drain()
        cols = list(a.columns)
        a = a.sort_values(cols).reset_index(drop=True)
        b = b.sort_values(cols).reset_index(drop=True)[cols]
        assert a.equals(b), f"{op}: arrow variant changes the answer"

        def timed(fn):
            t0 = time.perf_counter()
            fn(spark, args.sf).toPandas()
            dt = time.perf_counter() - t0
            drain()
            return dt

        # warm both
        timed(shipped), timed(arrow), timed(shipped), timed(arrow)
        s_runs, a_runs = [], []
        for i in range(args.runs):
            if i % 2 == 0:  # ABBA interleave
                s_runs.append(timed(shipped))
                a_runs.append(timed(arrow))
            else:
                a_runs.append(timed(arrow))
                s_runs.append(timed(shipped))
        sm = statistics.median(s_runs)
        am = statistics.median(a_runs)
        print(
            json.dumps(
                {
                    "op": op,
                    "sf": args.sf,
                    "shipped_median": round(sm, 4),
                    "arrow_median": round(am, 4),
                    "ratio": round(am / sm, 3),
                    "shipped_runs": [round(x, 3) for x in s_runs],
                    "arrow_runs": [round(x, 3) for x in a_runs],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
