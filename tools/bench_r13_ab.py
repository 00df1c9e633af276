"""Round-13 same-epoch ABBA: shipped shapes vs restructured candidates
(VERDICT r12 "Next round #3" — job/pass-count attack on the multi-pass
rows, oracle-identical by construction and asserted row-for-row here
before any timing).

Candidates:

- q_power_iteration_pc → ``power_iteration_fused``: the r12 plan
  builds the ENTIRE Gram subtree twice (iteration 2's matvec re-plans
  iteration 1's g — plans/r12/q_power_iteration_pc_after.txt shows the
  MapInPandas X^T X + stats explode duplicated, 34 Exchange nodes,
  8 corpus-side scans) because each v_cur broadcast carries the whole
  lineage. The fused form computes ONE corpus pass (the X^T X kernel
  also emits per-batch column-sum and row-count partials, so the
  posexplode stats pass disappears too), merges partials with a single
  groupBy, and runs the mean-centering + both renormalized power steps
  inside one single-partition mapInPandas kernel over the d²-row
  Gram frame — numpy int64/float64 spelled operation-for-operation
  identically to the Column formulation (trunc half-away rounding,
  /1e10 → /nrm → *1e6 order), so every integer and double matches
  bit-for-bit (asserted below; oracle unchanged).

- q_ngram_lm_score → ``lm_score_model``: the r12 plan re-tokenizes the
  corpus FOUR times (big / uni / V broadcast builds + the score pass
  are four non-reusable subtrees — column pruning makes the exchanges
  non-identical, so ReuseExchange never fires). The model form derives
  c1 (prefix counts) and V (vocab size) from the bigram-count table
  itself via windows (vocab-bounded: partitionBy(w1) + whole-frame),
  precomputes each gram's micro-nat term m on the model table with the
  IDENTICAL float expression tree, and broadcasts just (g, m): two
  corpus passes total (fit + score), same per-position m values, same
  per-doc BIGINT sums.

Usage:
    python -m tools.bench_r13_ab [--sf DIR] [--runs N] [--ops a,b]
Prints one JSON line per op:
    {"op", "sf", "shipped_median", "candidate_median", "ratio", ...}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.operators.common import (
    release_persists,
)
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.session import get_spark
from data_pipeline_standalone_scripts_spark.tables import load


# ------------------------------------------------- power iteration (fused)
def power_iteration_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_standalone_scripts_spark.operators.clustering import (
        _quantize_micro,
    )
    from data_pipeline_standalone_scripts_spark.operators.llm import _vec_double

    emb = load(spark, sf_dir, "embeddings")
    vec = emb.select(_quantize_micro(_vec_double()).alias("x"))

    def partials(batches):
        # ONE corpus pass: exact int64 X^T X per Arrow batch PLUS the
        # per-batch column sums (j=0 rows) and row count (i=j=0 row) —
        # the stats the old posexplode pass produced, same integers.
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["x"].tolist(), dtype=np.int64)
            G = X.T @ X
            d = G.shape[0]
            ij = np.indices((d, d))
            i = np.concatenate(
                [
                    ij[0].ravel() + 1,
                    np.arange(1, d + 1),
                    np.array([0]),
                ]
            ).astype("int32")
            j = np.concatenate(
                [
                    ij[1].ravel() + 1,
                    np.zeros(d, dtype=np.int64),
                    np.array([0]),
                ]
            ).astype("int32")
            p = np.concatenate(
                [G.ravel(), X.sum(0), np.array([len(X)], dtype=np.int64)]
            )
            yield pd.DataFrame({"i": i, "j": j, "p": p})

    merged = (
        vec.mapInPandas(partials, schema="i int, j int, p long")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("p"))
        .coalesce(1)
    )

    def solve(batches):
        rows = [pdf for pdf in batches if len(pdf)]
        if not rows:
            return
        allp = pd.concat(rows, ignore_index=True)
        n = int(allp.loc[(allp["i"] == 0) & (allp["j"] == 0), "p"].iloc[0])
        sv_rows = allp[(allp["j"] == 0) & (allp["i"] > 0)]
        d = len(sv_rows)
        sv = np.zeros(d, dtype=np.int64)
        sv[sv_rows["i"].to_numpy() - 1] = sv_rows["p"].to_numpy()
        S = np.zeros((d, d), dtype=np.int64)
        g_rows = allp[(allp["i"] > 0) & (allp["j"] > 0)]
        S[g_rows["i"].to_numpy() - 1, g_rows["j"].to_numpy() - 1] = g_rows[
            "p"
        ].to_numpy()

        def half_away(q: np.ndarray) -> np.ndarray:
            return np.where(
                q >= 0, np.trunc(q + 0.5), np.trunc(q - 0.5)
            ).astype(np.int64)

        # identical op-for-op to the Column spelling in the shipped op:
        # mu = half_away(sv/n); G = S - mu_j*s_i - mu_i*s_j + n*mu_i*mu_j
        mu = half_away(sv.astype(np.float64) / n)
        G = (
            S
            - mu[None, :] * sv[:, None]
            - mu[:, None] * sv[None, :]
            + n * mu[:, None] * mu[None, :]
        )
        gu = half_away(G.astype(np.float64) / 100000)
        vq = np.zeros(d, dtype=np.int64)
        vq[0] = 1000000
        for _ in range(2):
            w = gu @ vq  # exact int64 (bounds: docstring of shipped op)
            u = half_away(w.astype(np.float64) / 10000000000)
            nrm = np.sqrt(float((u * u).sum()))
            vq = half_away(
                w.astype(np.float64) / 10000000000 / nrm * 1000000
            )
        yield pd.DataFrame(
            {
                "pos": np.arange(1, d + 1, dtype=np.int64),
                "loading": vq.astype(np.float64) / 1000000.0,
            }
        )

    return merged.mapInPandas(solve, schema="pos long, loading double")


# -------------------------------------------------- lm score (model bcast)
def lm_score_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_standalone_scripts_spark.operators.textpipe import (
        BIGRAM_ADD_K,
        HIGH_PPL_NLL,
    )

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    n = F.size("t")
    bg = (
        d.filter(n >= 2)
        .select(
            "doc_id",
            n.alias("n"),
            F.explode(F.sequence(F.lit(1), n - 1)).alias("p"),
            F.col("t"),
        )
        .select(
            "doc_id",
            "n",
            F.concat_ws(
                " ",
                F.element_at("t", F.col("p")),
                F.element_at("t", F.col("p") + 1),
            ).alias("g"),
        )
    )
    big = bg.groupBy("g").agg(F.count(F.lit(1)).alias("c2"))
    # c1 (prefix counts) and V (vocab size) via windows OVER the bigram
    # table itself — no self-join, so the corpus-explode subtree appears
    # exactly once under the broadcast build. g is the group key, hence
    # unique: "first g of its w1 partition" marks each distinct w1 once.
    w_w1 = Window.partitionBy("w1")
    w_all = Window.partitionBy()
    model = (
        big.withColumn("w1", F.substring_index("g", " ", 1))
        .withColumn("c1", F.sum("c2").over(w_w1))
        .withColumn("gmin", F.min("g").over(w_w1))
        .withColumn(
            "vv",
            F.sum(
                F.when(F.col("g") == F.col("gmin"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).over(w_all),
        )
    )
    nll = -F.log(
        (F.col("c2") + float(BIGRAM_ADD_K)) / (F.col("c1") + F.col("vv"))
    )
    micros = nll * 1_000_000
    m = (
        micros + F.when(micros >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))
    ).cast("long")
    avg = F.col("msum").cast("double") / 1_000_000.0 / (F.col("n") - 1)
    nb = F.col("n") - 1
    avg6 = F.expr(
        "CAST((msum * 2 + (n - 1)) DIV ((n - 1) * 2) AS DOUBLE) / 1000000.0"
    )
    return (
        bg.join(F.broadcast(model.select("g", m.alias("m"))), "g")
        .groupBy("doc_id", "n")
        .agg(F.sum("m").alias("msum"))
        .select(
            "doc_id",
            nb.cast("long").alias("n_bigrams"),
            avg6.alias("avg_nll"),
            (avg > HIGH_PPL_NLL).alias("high_perplexity"),
        )
    )


# ------------------------------------------------ winnow (arrow twin)
def winnow_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r12 #4 candidate: the explode + codegen gram-encode +
    trailing-min window + distinct, all inside one mapInArrow numpy
    kernel (per-doc sliding windows; per-doc uniqueness IS global
    uniqueness because each doc is one input row)."""
    from data_pipeline_standalone_scripts_spark.operators.textpipe import (
        K_GRAM,
        WINNOW_W,
    )

    d = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") >= K_GRAM)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", "text")
    )

    def kern(batches):
        import numpy as np
        import pyarrow as pa

        # big-endian byte powers: matches conv(hex(gram), 16, 10)
        P = (256 ** np.arange(K_GRAM - 1, -1, -1)).astype(np.int64)
        sw = np.lib.stride_tricks.sliding_window_view
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_i, out_f = [], []
            for did, txt in zip(ids, texts):
                b = np.frombuffer(txt.encode("ascii"), np.uint8).astype(
                    np.int64
                )
                n = len(b) - K_GRAM + 1
                gh = sw(b, K_GRAM) @ P
                wm = np.empty(n, dtype=np.int64)
                head = min(WINNOW_W - 1, n)
                wm[:head] = np.minimum.accumulate(gh[:head])
                if n >= WINNOW_W:
                    wm[WINNOW_W - 1 :] = sw(gh, WINNOW_W).min(axis=1)
                fps = np.unique(gh[gh == wm])
                out_i.append(np.full(len(fps), did, dtype=np.int64))
                out_f.append(fps)
            if not out_i:
                continue
            yield pa.record_batch(
                [
                    pa.array(np.concatenate(out_i)),
                    pa.array(np.concatenate(out_f)),
                ],
                names=["doc_id", "fingerprint"],
            )

    return d.mapInArrow(kern, "doc_id long, fingerprint long")


PAIRS = {
    "q_power_iteration_pc": power_iteration_fused,
    "q_ngram_lm_score": lm_score_model,
    "q_fingerprint_winnow": winnow_arrow,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--ops", default=",".join(PAIRS))
    args = ap.parse_args()

    engine.load_all_operators()
    shuffle = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "0")) or 8
    spark = get_spark("r13-ab", shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def drain() -> None:
        spark.catalog.clearCache()
        release_persists()

    for op in args.ops.split(","):
        shipped = REGISTRY[op].fn
        cand = PAIRS[op]
        a = shipped(spark, args.sf).toPandas()
        drain()
        b = cand(spark, args.sf).toPandas()
        drain()
        cols = list(a.columns)
        a = a.sort_values(cols).reset_index(drop=True)
        b = b.sort_values(cols).reset_index(drop=True)[cols]
        assert a.equals(b), f"{op}: candidate changes the answer"

        def timed(fn):
            t0 = time.perf_counter()
            fn(spark, args.sf).toPandas()
            dt = time.perf_counter() - t0
            drain()
            return dt

        timed(shipped), timed(cand), timed(shipped), timed(cand)
        s_runs, c_runs = [], []
        for i in range(args.runs):
            if i % 2 == 0:
                s_runs.append(timed(shipped))
                c_runs.append(timed(cand))
            else:
                c_runs.append(timed(cand))
                s_runs.append(timed(shipped))
        sm = statistics.median(s_runs)
        cm = statistics.median(c_runs)
        print(
            json.dumps(
                {
                    "op": op,
                    "sf": args.sf,
                    "shipped_median": round(sm, 4),
                    "candidate_median": round(cm, 4),
                    "ratio": round(cm / sm, 3),
                    "shipped_runs": [round(x, 3) for x in s_runs],
                    "candidate_runs": [round(x, 3) for x in c_runs],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
