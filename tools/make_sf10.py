"""Materialize an sf10 dataset (10x sf1 = 100x sf0.1) for the
floor-amortization bench.

BASELINE.md's round-4 sf1 table closed the algorithmic rows, but a
cluster of rows (q1/q3/q5, tumbling, wordcount, knn, quantize,
retention, funnel, q6, bm25, media) still graded against sub-150 ms
DuckDB baselines — at sf1 BOTH engines are inside their fixed floors
there. sf10 is the next rung: lineitem 60 M rows, events 10 M.

Same union-replicate scheme as tools/make_sf1 (dense re-keyed
replicas; each replica self-contained so join selectivity and group
sizes scale exactly 10x), applied to the SF1 output — documents and
embeddings inherit sf1's per-replica vocab permutation / orthogonal
transform, and this pass re-keys ids only (text dedup ops are NOT
bench targets at sf10; the simhash/winnow class is excluded from the
sf10 row set precisely because its DuckDB side goes superlinear).

Run AFTER tools/make_sf1:
    python -m tools.make_sf1 && python -m tools.make_sf10
Output: /root/repo/.testdata_sf10/ (gitignored, ~2.5 GB).
"""

from __future__ import annotations

import os
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
    "documents": (["doc_id"], {}),
    "embeddings": (["vec_id"], {}),
}
USER_CARD = 15000  # events.user_id cardinality at sf1


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
                    # second-level token suffix on top of sf1's (tokens
                    # end 'adjN ringN' -> 'adjNM ringNM')
                    sel.append(
                        f"regexp_replace(p_name, '(\\S+)', '\\1{i}', 'g') "
                        "as p_name"
                    )
                else:
                    sel.append(c)
            parts.append(f"select {', '.join(sel)} from {_src(t)}")
        # one part file per replica inside a directory (see make_sf1)
        tdir = f"{DST}/{t}.parquet"
        if os.path.isfile(tdir):
            os.remove(tdir)
        os.makedirs(tdir, exist_ok=True)
        for i, p in enumerate(parts):
            con.sql(
                f"copy ({p}) to '{tdir}/part-{i:02d}.parquet' "
                "(format parquet, row_group_size 1048576)"
            )
        print(t, con.sql(f"select count(*) from read_parquet('{tdir}/*.parquet')").fetchone()[0], "rows")
    print("done ->", DST)


if __name__ == "__main__":
    sys.exit(main())
