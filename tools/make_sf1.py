"""Materialize an sf1 dataset (10x sf0.1) for the same-epoch bench.

VERDICT r03 "Next round #2": every sf0.1 bench row is dominated by
Spark-local's ~0.3 s per-job floor (22 of 24 >2x rows sit on DuckDB
baselines under 150 ms), so the 2x letter currently grades job
scheduling, not algorithms. A 10x dataset amortizes the floors and
makes the ratio mean something.

/root/testdata is read-only, so sf1 lands INSIDE the repo at
``.testdata_sf1/`` (gitignored — ~200 MB of parquet; regenerate with
``python -m tools.make_sf1``). Deterministic: numpy seeded per table
and replica, no wall-clock anywhere.

Replication scheme (union-replicate with re-keyed ids, 10 replicas):

- ``region``/``nation``: copied as-is (fixed dimensions — TPC-H keeps
  them constant across SF, and inflating them would change every
  broadcast-join plan shape).
- ``customer supplier part orders lineitem events``: replica ``i``
  shifts every key column by ``i * <table row count>`` (dense
  re-keying keeps key ranges contiguous so range partitioning and
  zonemap behavior stay realistic). Foreign keys shift by the parent
  table's offset, so each replica is a self-contained star — join
  selectivities, per-key group sizes and skew shape are EXACTLY those
  of sf0.1, scaled 10x in volume.
- ``documents``: replica ``i`` additionally applies a seeded
  permutation of the per-language token vocabulary (word -> word,
  whitespace untouched). Within a replica every doc gets the same
  substitution, so the planted near-dup clusters survive verbatim
  (same Jaccard / SimHash structure as sf0.1); across replicas the
  shingle sets share nothing, so LSH buckets don't collect 10 copies
  of every doc — naive text replication would make in-bucket
  verification ~45x per cluster instead of 10x and misrepresent how
  the dedup ops scale. Token counts, doc lengths, TTR and Zipf mass
  are preserved exactly (frequencies are permuted across words).
- ``embeddings``: replica ``i`` applies a seeded signed permutation
  of the 64 dimensions (x -> sign * x[perm]) — an orthogonal
  transform, so within-replica norms, dot products, cosine geometry,
  kNN graphs and kmeans structure are EXACTLY preserved, while
  cross-replica cosines decorrelate (no 10 identical copies of every
  vector landing in one IVF/LSH bucket).

Scale note (100 TB): this tool itself is a test fixture — at real
scale the data already exists; nothing here runs on the cluster.

Name strings (fixed round 5; round-4 artifact): c_name/s_name are
regenerated from the shifted key ('Customer#' || lpad(key)); p_name
tokens get a per-replica suffix, which preserves within-replica
blocking structure and pairwise edit distances (aligned identical
insertions) while guaranteeing zero cross-replica token matches — so
name-content ops (q_fuzzy_name_match) stay linear at sf1.
"""

from __future__ import annotations

import os
import shutil
import re
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".testdata_sf1")
REPLICAS = 10
SEED = 42

# table -> (row-count offset base, key columns shifted by OWN offset,
#           fk column -> parent table)
KEYED = {
    "customer": (["c_custkey"], {}),
    "supplier": (["s_suppkey"], {}),
    "part": (["p_partkey"], {}),
    "orders": (["o_orderkey"], {"o_custkey": "customer"}),
    "lineitem": ([], {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"}),
    "events": (["event_id"], {}),  # user_id handled via USER_CARD below
}
USER_CARD = 1500  # events.user_id is 0..1499 at sf0.1 (not a table)

_WORD = re.compile(r"\S+")


def _vocab_sub(texts: list[str], rng: np.random.Generator) -> list[str]:
    """Apply one seeded vocabulary permutation to every text."""
    vocab = sorted({w for t in texts for w in _WORD.findall(t)})
    perm = rng.permutation(len(vocab))
    sub = {w: vocab[p] for w, p in zip(vocab, perm)}
    return [_WORD.sub(lambda m: sub[m.group(0)], t) for t in texts]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    counts = {
        t: con.sql(f"select count(*) from '{SRC}/{t}.parquet'").fetchone()[0]
        for t in KEYED
    }

    for t in ("region", "nation"):
        con.sql(f"copy (select * from '{SRC}/{t}.parquet') to '{DST}/{t}.parquet' (format parquet)")
        print(t, "copied")

    for t, (own_keys, fks) in KEYED.items():
        cols = [r[0] for r in con.sql(f"describe select * from '{SRC}/{t}.parquet'").fetchall()]
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
                    # name follows the shifted key (round-4 artifact fix:
                    # replicas shared name strings, making name-content
                    # ops quadratic across replicas)
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
                    # suffix every token with the replica index: within a
                    # replica the token-equality blocking structure and
                    # pairwise edit distances are preserved (both members
                    # of a pair get identical aligned insertions), across
                    # replicas no token ever matches, so neither fuzzy
                    # candidates nor matches form cross-replica
                    sel.append(
                        f"regexp_replace(p_name, '(\\S+)', '\\1{i}', 'g') "
                        "as p_name"
                    )
                else:
                    sel.append(c)
            parts.append(f"select {', '.join(sel)} from '{SRC}/{t}.parquet'")
        # One part FILE per replica inside a <table>.parquet DIRECTORY:
        # the realistic layout (a 100 TB table is thousands of files,
        # never one) — both engines scan the parts in parallel instead
        # of single-tasking a monolithic file. Spark reads the dir
        # natively; the DuckDB oracle globs it (oracle.duckdb_connect).
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
                "(format parquet, row_group_size 262144)"
            )
        print(t, con.sql(f"select count(*) from read_parquet('{tdir}/*.parquet')").fetchone()[0], "rows")

    # documents: pandas path (regex substitution)
    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    n_docs = len(docs)
    out = []
    for i in range(REPLICAS):
        rep = docs.copy()
        rep["doc_id"] = rep["doc_id"] + i * n_docs
        if i > 0:
            rng = np.random.default_rng([SEED, 1, i])
            # ONE permutation over the whole replica's vocabulary: the
            # planted near-dup clusters cross language labels (441
            # prefix-sharing docs at sf0.1, only 126 same-lang), so a
            # per-language permutation would break 2/3 of them.
            # Grouped lang ops use the stored label and are unaffected;
            # only detected-language stats shift, which no bench row
            # measures.
            rep["text"] = _vocab_sub(rep["text"].tolist(), rng)
            rep["n_chars"] = rep["text"].str.len().astype(docs["n_chars"].dtype)
        out.append(rep)
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
    for i, rep in enumerate(out):
        pq.write_table(
            pa.Table.from_pandas(rep, preserve_index=False),
            f"{ddir}/part-{i:02d}.parquet",
            row_group_size=8192,
        )
    print("documents", n_docs * REPLICAS, "rows")

    # embeddings: signed dimension permutation per replica
    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    n_vec = len(emb)
    mat = np.stack(emb["embedding"].to_numpy())  # (n, 64) float32
    dim = mat.shape[1]
    out = []
    for i in range(REPLICAS):
        rep = emb.copy()
        rep["vec_id"] = rep["vec_id"] + i * n_vec
        if i > 0:
            rng = np.random.default_rng([SEED, 2, i])
            perm = rng.permutation(dim)
            signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            rep["embedding"] = list(mat[:, perm] * signs)
        out.append(rep)
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
    for i, rep in enumerate(out):
        pq.write_table(
            pa.Table.from_pandas(rep, preserve_index=False),
            f"{edir}/part-{i:02d}.parquet",
            row_group_size=4096,
        )
    print("embeddings", n_vec * REPLICAS, "rows")
    print("done ->", DST)


if __name__ == "__main__":
    sys.exit(main())
