"""Materialize an sf10 dataset (10x sf1 = 100x sf0.1) for the
floor-amortization bench.

BASELINE.md's round-4 sf1 table closed the algorithmic rows, but a
cluster of rows (q1/q3/q5, tumbling, wordcount, knn, quantize,
retention, funnel, q6, bm25, media) still graded against sub-150 ms
DuckDB baselines — at sf1 BOTH engines are inside their fixed floors
there. sf10 is the next rung: lineitem 60 M rows, events 10 M.

Same union-replicate scheme as tools/make_sf1 (dense re-keyed
replicas; each replica self-contained so join selectivity and group
sizes scale exactly 10x), applied to the SF1 output. Round 5:
documents get a per-replica vocab permutation and embeddings a
per-replica signed dimension permutation, exactly as in make_sf1 —
the earlier id-only re-key replicated text verbatim and vectors
identically across replicas, which made every near-dup detector's
pair output quadratic BY CONSTRUCTION and gave every vector 9 exact
clones. With the transforms, near-dup pair counts and vector
neighborhoods scale linearly, so the sf10 rung can grade the dedup
and embedding families too (their DuckDB comparator is still
superlinear — engine-only curves live in SCALE.md).

Run AFTER tools/make_sf1:
    python -m tools.make_sf1 && python -m tools.make_sf10
Output: /root/repo/.testdata_sf10/ (gitignored, ~2.5 GB).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".testdata_sf1")
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".testdata_sf10")
REPLICAS = 10

KEYED = {
    "customer": (["c_custkey"], {}),
    "supplier": (["s_suppkey"], {}),
    "part": (["p_partkey"], {}),
    "orders": (["o_orderkey"], {"o_custkey": "customer"}),
    "lineitem": ([], {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"}),
    "events": (["event_id"], {}),
}
USER_CARD = 15000  # events.user_id cardinality at sf1
SEED = 42


def _src(t: str) -> str:
    """sf1 tables are directories of part files (make_sf1) — glob them."""
    p = f"{SRC}/{t}.parquet"
    return f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    counts = {
        t: con.sql(f"select count(*) from {_src(t)}").fetchone()[0]
        for t in KEYED
    }
    for t in ("region", "nation"):
        con.sql(f"copy (select * from {_src(t)}) to '{DST}/{t}.parquet' (format parquet)")
        print(t, "copied")
    for t, (own_keys, fks) in KEYED.items():
        cols = [r[0] for r in con.sql(f"describe select * from {_src(t)}").fetchall()]
        parts = []
        for i in range(REPLICAS):
            sel = []
            for c in cols:
                if c in own_keys:
                    sel.append(f"{c} + {i * counts[t]} as {c}")
                elif c in fks:
                    sel.append(f"{c} + {i * counts[fks[c]]} as {c}")
                elif t == "events" and c == "user_id":
                    sel.append(f"user_id + {i * USER_CARD} as user_id")
                elif c == "c_name":
                    # same name-follows-key rule as make_sf1 (replicated
                    # name strings make name-content ops quadratic)
                    sel.append(
                        f"'Customer#' || lpad(cast(c_custkey + {i * counts[t]} "
                        "as varchar), 9, '0') as c_name"
                    )
                elif c == "s_name":
                    sel.append(
                        f"'Supplier#' || lpad(cast(s_suppkey + {i * counts[t]} "
                        "as varchar), 9, '0') as s_name"
                    )
                elif c == "p_name" and i > 0:
                    # second-level token suffix on top of sf1's, with an
                    # 'x' separator so it can never collide with sf1's
                    # bare-digit suffix: sf1 replica j's token 'adjj' must
                    # not equal sf10 replica i's 'adj' + suffix. A bare
                    # digit suffix ('adj'+str(i)) DID collide — sf1
                    # replica 0 tokens are unsuffixed, so 'adj'+i ==
                    # sf1-replica-i's 'adji' kept verbatim by sf10
                    # replica 0, giving each part ~9 cross-replica name
                    # clones (fixture artifact). 'adjxi' is outside the
                    # digit alphabet, so no concatenation ambiguity.
                    sel.append(
                        f"regexp_replace(p_name, '(\\S+)', '\\1x{i}', 'g') "
                        "as p_name"
                    )
                else:
                    sel.append(c)
            parts.append(f"select {', '.join(sel)} from {_src(t)}")
        # one part file per replica inside a directory (see make_sf1)
        tdir = f"{DST}/{t}.parquet"
        # replace any prior layout wholesale: a single-file table
        # OR a directory with stale part files from a previous run
        # (if REPLICAS shrinks or part naming changes, leftovers
        # would silently merge into the table for both engines)
        if os.path.isfile(tdir):
            os.remove(tdir)
        elif os.path.isdir(tdir):
            shutil.rmtree(tdir)
        os.makedirs(tdir, exist_ok=True)
        for i, p in enumerate(parts):
            con.sql(
                f"copy ({p}) to '{tdir}/part-{i:02d}.parquet' "
                "(format parquet, row_group_size 1048576)"
            )
        print(t, con.sql(f"select count(*) from read_parquet('{tdir}/*.parquet')").fetchone()[0], "rows")

    # documents / embeddings: same structure-preserving per-replica
    # transforms as make_sf1 (round 5 — previously this pass re-keyed
    # ids only, which replicated TEXT VERBATIM and VECTORS IDENTICALLY
    # across the 10 sf10 replicas: every near-dup detector's pair
    # output then grows quadratically by construction and every vector
    # gains 9 exact clones — fixture artifacts, not engine behavior).
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tools.make_sf1 import _vocab_sub

    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    n_docs = len(docs)
    ddir = f"{DST}/documents.parquet"
    # replace any prior layout wholesale: a single-file table
    # OR a directory with stale part files from a previous run
    # (if REPLICAS shrinks or part naming changes, leftovers
    # would silently merge into the table for both engines)
    if os.path.isfile(ddir):
        os.remove(ddir)
    elif os.path.isdir(ddir):
        shutil.rmtree(ddir)
    os.makedirs(ddir, exist_ok=True)
    for i in range(REPLICAS):
        rep = docs.copy()
        rep["doc_id"] = rep["doc_id"] + i * n_docs
        if i > 0:
            rng = np.random.default_rng([SEED, 3, i])
            rep["text"] = _vocab_sub(rep["text"].tolist(), rng)
            rep["n_chars"] = rep["text"].str.len().astype(docs["n_chars"].dtype)
        pq.write_table(
            pa.Table.from_pandas(rep, preserve_index=False),
            f"{ddir}/part-{i:02d}.parquet",
            row_group_size=8192,
        )
    print("documents", n_docs * REPLICAS, "rows")

    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    n_vec = len(emb)
    mat = np.stack(emb["embedding"].to_numpy())
    dim = mat.shape[1]
    edir = f"{DST}/embeddings.parquet"
    # replace any prior layout wholesale: a single-file table
    # OR a directory with stale part files from a previous run
    # (if REPLICAS shrinks or part naming changes, leftovers
    # would silently merge into the table for both engines)
    if os.path.isfile(edir):
        os.remove(edir)
    elif os.path.isdir(edir):
        shutil.rmtree(edir)
    os.makedirs(edir, exist_ok=True)
    for i in range(REPLICAS):
        rep = emb.copy()
        rep["vec_id"] = rep["vec_id"] + i * n_vec
        if i > 0:
            rng = np.random.default_rng([SEED, 4, i])
            perm = rng.permutation(dim)
            signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            rep["embedding"] = list(mat[:, perm] * signs)
        pq.write_table(
            pa.Table.from_pandas(rep, preserve_index=False),
            f"{edir}/part-{i:02d}.parquet",
            row_group_size=4096,
        )
    print("embeddings", n_vec * REPLICAS, "rows")
    print("done ->", DST)


if __name__ == "__main__":
    sys.exit(main())
