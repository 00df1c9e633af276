"""Unsupervised embedding clustering — the semantic-grouping step a
training-data pipeline runs between near-dup removal and mixture
sampling (cluster the corpus, then budget documents per cluster).
Complements the supervised q_centroid_per_label and the ANN bucketing
(IVF/sign-LSH) in dedup_ext.py: those *use* fixed centers; this op
*finds* them.

Determinism across engines is the interesting problem for an
iterative float algorithm, and the solution here is full integer
arithmetic: embeddings quantize once to micro-unit longs, every
distance is an exact BIGINT Σ(Δ²) (order-free), and updated centroids
re-quantize to micro-longs via an identical double division +
half-away round on both engines. There is no accumulated float state
anywhere — iteration k's centroids are bit-identical integers in
Spark and DuckDB, so the final assignment and inertia hash-match
exactly. (The alternative — float centroids — drifts at the 1e-15
level per iteration and flips boundary points between engines.)

Scale (100 TB): centroids are k×dim longs — always broadcast; each
assignment pass is a narrow broadcast join + JVM codegen fold (no
shuffle of the vectors); each update pass shuffles (k × dim) partial
sums after map-side combine. Lloyd iterations are driver-side control
flow over DataFrames (like q_evolutionary_sweep's generations) — the
data never leaves the cluster, and the iteration count is fixed, not
convergence-polled (no collect in the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load
from .llm import _vec_double

CAT = "clustering"

_K = 8
_PASSES = 2  # assignment passes: init-centroid pass + one Lloyd update


def _half_away_long(q):
    """trunc(q ± 0.5) as long — the codegen-friendly half-away round
    shared with q_embed_quantize; matches DuckDB's trunc spelling."""
    return (
        q + F.when(q >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))
    ).cast("long")


def _quantize_micro(arr):
    """Element-wise round(x·1e6) half-away as long, inside codegen
    (the shift-then-truncate spelling from q_embed_quantize — F.round
    would route every element through BigDecimal)."""
    def q(t):
        v = t * 1_000_000
        return (
            v + F.when(v >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))
        ).cast("long")

    return F.transform(arr, q)


def _d2(a: str, b: str):
    """Exact squared L2 distance between two micro-long arrays as a
    BIGINT — a sequential JVM fold over exact integers, so the value
    is independent of both partitioning and engine."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda s, t: s + t,
    )


@register(
    "q_kmeans_embed",
    oracle=f"""
        WITH e AS (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) AS pos,
                   CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                        AS BIGINT) AS v
            FROM embeddings
        ),
        c0 AS (
            SELECT vec_id AS cid, pos, v AS c FROM e WHERE vec_id < {_K}
        ),
        a1 AS (
            SELECT vec_id, cid,
                   rank() OVER (PARTITION BY vec_id
                                ORDER BY SUM((v-c)*(v-c)) ASC, cid ASC)
                       AS rk
            FROM e JOIN c0 USING (pos)
            GROUP BY vec_id, cid
            QUALIFY rk = 1
        ),
        c1 AS (
            SELECT cid, pos,
                   CAST(CASE WHEN SUM(v) >= 0
                        THEN trunc(CAST(SUM(v) AS DOUBLE)/COUNT(*) + 0.5)
                        ELSE trunc(CAST(SUM(v) AS DOUBLE)/COUNT(*) - 0.5)
                        END AS BIGINT) AS c
            FROM a1 JOIN e USING (vec_id)
            GROUP BY cid, pos
        ),
        a2 AS (
            SELECT vec_id, cid, SUM((v-c)*(v-c)) AS d2,
                   rank() OVER (PARTITION BY vec_id
                                ORDER BY SUM((v-c)*(v-c)) ASC, cid ASC)
                       AS rk
            FROM e JOIN c1 USING (pos)
            GROUP BY vec_id, cid
            QUALIFY rk = 1
        )
        SELECT cid AS cluster_id, COUNT(*) AS n_members,
               CAST(SUM(d2) AS BIGINT) AS inertia_micro2,
               round(sqrt(CAST(SUM(d2) AS DOUBLE) / 1e12 / COUNT(*)), 6)
                   AS rms_dist
        FROM a2 GROUP BY 1
    """,
    category=CAT,
)
def q_kmeans_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM1: k-means over the embedding corpus (k=8, 2 assignment
    passes, deterministic init = the k lowest vec_ids), reported as
    per-cluster size + exact integer inertia + RMS distance. The
    corpus-curation clustering step: cluster sizes drive per-topic
    sampling budgets, inertia tracks clustering quality over
    re-crawls.

    The oracle spells the identical algorithm in long form (unnest +
    integer sums are order-free, so DuckDB's join order can't change
    the answer); the Spark side keeps vectors as arrays and folds
    distances in codegen. Both quantize updated centroids through the
    same double-division + half-away round, so centroid integers —
    and therefore every subsequent assignment — are bit-identical.

    Scale: see module docstring — broadcast centroids, shuffle only
    (k × dim) partial sums per update; fixed iteration count keeps
    the driver loop collect-free.
    """
    e = load(spark, sf_dir, "embeddings")
    vec = e.select("vec_id", _quantize_micro(_vec_double()).alias("xq"))
    cent = vec.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("xq").alias("cq")
    )

    assigned = None
    for _ in range(_PASSES):
        if assigned is not None:
            # Lloyd update: per-(cluster, position) exact mean,
            # re-quantized to micro-longs, reassembled into arrays.
            ex = assigned.select(
                "cid", F.posexplode("xq").alias("pos", "v")
            )
            cm = ex.groupBy("cid", "pos").agg(
                F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
            )
            q = F.col("s").cast("double") / F.col("n")
            c = (
                q + F.when(q >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))
            ).cast("long")
            cent = (
                cm.select("cid", "pos", c.alias("c"))
                .groupBy("cid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "c"))),
                        lambda t: t["c"],
                    ).alias("cq")
                )
            )
        scored = vec.crossJoin(F.broadcast(cent)).select(
            "vec_id", "xq", "cid", _d2("xq", "cq").alias("d2")
        )
        assigned = (
            scored.groupBy("vec_id")
            .agg(
                F.min(F.struct("d2", "cid")).alias("m"),
                F.any_value("xq").alias("xq"),
            )
            .select(
                "vec_id",
                "xq",
                F.col("m.cid").alias("cid"),
                F.col("m.d2").alias("d2"),
            )
        )

    return assigned.groupBy(
        F.col("cid").cast("long").alias("cluster_id")
    ).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("d2").cast("long").alias("inertia_micro2"),
        F.round(
            F.sqrt(F.sum("d2").cast("double") / 1e12 / F.count(F.lit(1))),
            6,
        ).alias("rms_dist"),
    )


_ORACLE_HALF = (
    "CAST(CASE WHEN {q} >= 0 THEN trunc(({q}) + 0.5) "
    "ELSE trunc(({q}) - 0.5) END AS BIGINT)"
)


def _o_half(q: str) -> str:
    return _ORACLE_HALF.format(q=q)


_PC_STEP = """
w{n} AS (
    SELECT g.i AS pos, SUM(g.gu * v{p}.vq) AS w
    FROM g JOIN v{p} ON g.j = v{p}.pos GROUP BY 1
),
n{n} AS (
    SELECT sqrt(CAST(SUM(u * u) AS DOUBLE)) AS nrm FROM (
        SELECT {uhalf} AS u FROM w{n})
),
v{n} AS (
    SELECT pos, {vhalf} AS vq FROM w{n}
)"""


def _pc_step(n: int) -> str:
    return _PC_STEP.format(
        n=n,
        p=n - 1,
        uhalf=_o_half("CAST(w AS DOUBLE) / 10000000000"),
        vhalf=_o_half(
            "CAST(w AS DOUBLE) / 10000000000"
            f" / (SELECT nrm FROM n{n}) * 1000000"
        ),
    )


@register(
    "q_power_iteration_pc",
    oracle=f"""
        WITH e AS (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) AS pos,
                   CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                        AS BIGINT) AS v
            FROM embeddings
        ),
        m AS (
            SELECT pos,
                   {_o_half("CAST(SUM(v) AS DOUBLE)/COUNT(*)")} AS mu
            FROM e GROUP BY pos
        ),
        c AS (SELECT vec_id, pos, v - mu AS x FROM e JOIN m USING (pos)),
        g AS (
            SELECT a.pos AS i, b.pos AS j,
                   {_o_half("CAST(SUM(a.x*b.x) AS DOUBLE)/100000")} AS gu
            FROM c a JOIN c b USING (vec_id)
            GROUP BY 1, 2
        ),
        v0 AS (
            SELECT i AS pos,
                   CASE WHEN i = 1 THEN 1000000 ELSE 0 END AS vq
            FROM (SELECT DISTINCT i FROM g)
        ),{_pc_step(1)},{_pc_step(2)}
        SELECT CAST(pos AS BIGINT) AS pos,
               CAST(vq AS DOUBLE) / 1000000.0 AS loading
        FROM v2
    """,
    category=CAT,
)
def q_power_iteration_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM2: top principal component of the embedding corpus via two
    fixed power-method iterations over the exact integer Gram matrix
    of mean-centered micro-quantized vectors — in-engine iterative
    linear algebra with bit-identical cross-engine results.

    Pipeline: quantize → exact integer means → centered long form →
    Gram G[i,j] = Σ x_i·x_j (exact BIGINT; requantized by 1e5 to keep
    the matvec in long range) → v₀ = e₁ → two (matvec, renormalize,
    requantize) steps. Every float division/sqrt consumes only exact
    integers, so both engines produce identical doubles and identical
    re-quantized integers each iteration — no accumulated drift, the
    failure mode that makes iterative float algorithms un-oracle-able.

    Overflow headroom (documented bounds): |x|≤6e5 ⇒ |G|≤n·3.6e11
    (1.8e16 at SF 1), |G/1e5|≤1.8e11, matvec ≤ ‖G row‖·‖v‖ ≤ 1.4e18 —
    6× under int64; norms via /1e10 requantized squares (≤1.3e18).

    Scale: the Gram build is the real cost — O(n·d²) rows through one
    vec_id-co-partitioned self-join into a d²-group aggregate (4096
    groups; map-side combines). Each iteration is a d²-row broadcast
    matvec — driver-side loop, no collect, fixed iteration count.
    """
    emb = load(spark, sf_dir, "embeddings")
    e = (
        emb.select(
            "vec_id",
            F.posexplode(_quantize_micro(_vec_double())).alias("pos0", "v"),
        )
        .select("vec_id", (F.col("pos0") + 1).alias("pos"), "v")
    )
    m = e.groupBy("pos").agg(
        _half_away_long(
            F.sum("v").cast("double") / F.count(F.lit(1))
        ).alias("mu")
    )
    c = e.join(F.broadcast(m), "pos").select(
        "vec_id", "pos", (F.col("v") - F.col("mu")).alias("x")
    )
    a = c.alias("a")
    b = c.alias("b")
    g = (
        a.join(b, "vec_id")
        .groupBy(F.col("a.pos").alias("i"), F.col("b.pos").alias("j"))
        .agg(
            _half_away_long(
                F.sum(F.col("a.x") * F.col("b.x")).cast("double") / 100000
            ).alias("gu")
        )
    )
    v_cur = g.select("i").distinct().select(
        F.col("i").alias("pos"),
        F.when(F.col("i") == 1, F.lit(1000000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("vq"),
    )
    for _ in range(2):
        w = (
            g.join(F.broadcast(v_cur), g.j == v_cur.pos)
            .groupBy("i")
            .agg(F.sum(F.col("gu") * F.col("vq")).alias("w"))
            .select(F.col("i").alias("pos"), "w")
        )
        u = _half_away_long(F.col("w").cast("double") / 10000000000)
        nrm = w.select(u.alias("u")).agg(
            F.sqrt(F.sum(F.col("u") * F.col("u")).cast("double")).alias(
                "nrm"
            )
        )
        v_cur = w.join(F.broadcast(nrm)).select(
            "pos",
            _half_away_long(
                F.col("w").cast("double")
                / 10000000000
                / F.col("nrm")
                * 1000000
            ).alias("vq"),
        )
    return v_cur.select(
        F.col("pos").cast("long").alias("pos"),
        (F.col("vq").cast("double") / 1000000.0).alias("loading"),
    )
