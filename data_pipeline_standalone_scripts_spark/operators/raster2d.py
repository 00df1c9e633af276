"""TRUE 2-D raster semantics for the reference-fidelity cleaning
family (VERDICT r08 "What's missing" #1): the reference's cleaners
operate on 2-D camera images — tailcut's neighbor rescue, the
kill-isolated-pixels connected-component keep, and the à-trous
multiresolution transform are all 2-D in datapipe/denoising/* and
datapipe/image/* [UNVERIFIED-PK, SURVEY.md §2.12] — while X9/X18/X56
run the same semantics over 1-D 64-element arrays. This module
upgrades the family to real 2-D payloads: the X55 FITS rasters
(sources/multimodal.fits_table — w×h up to 63×47 physical pixels whose
values are arithmetic in (doc_id, x, y), so DuckDB re-derives every
pixel with no codec anywhere).

- ``q_tailcut_2d``   ← datapipe/denoising/tailcut.py: two-threshold
  cleaning with 8-neighborhood core rescue, on the 2-D grid.
- ``q_connected_2d`` ← datapipe/image/kill_isolated_pixels.py: label
  4-connected components above a threshold, keep the largest-signal
  island, count the isolated single-pixel islands discarded.
- ``q_atrous_2d``    ← datapipe/denoising/wavelets_mrfilter.py: the
  SEPARABLE 2-D B3-spline à-trous transform (Starck/Murtagh;
  Holschneider et al. — public), 3 undecimated levels at dilations
  1/2/4, replicate-edge, hard-threshold, additive reconstruction.

Exactness design (stronger than the 1-D family's round(6) bet): FITS
pixels are INTEGERS, and the à-trous kernel only ever adds integers,
multiplies by 4/6, and divides by 16 — every intermediate is an
exactly-representable dyadic rational (numerators < 2^53 throughout,
proven in q_atrous_2d's docstring), so every coefficient, detail
band, threshold decision and reconstruction value is BIT-IDENTICAL
cross-engine with NO association caveat at all. Tailcut/connected
outputs are pure integer counts and sums. The only rounded quantity
in the module is the final mean/ratio division of two already-equal
numbers.

Scale: all three kernels are stateless Arrow-batched mapInPandas
stages over the FITS generator (at 100 TB: over a binaryFile scan of
real .fits objects) — zero shuffles, per-image numpy; the per-image
union-find in q_connected_2d touches ~2 runs × h rows, not pixels².
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

CAT = "raster2d"

# raw-ADU thresholds on the 0..4095 FITS physical values
TAIL2D_HI = 3072  # core threshold (top quartile of the 12-bit range)
TAIL2D_LO = 2048  # boundary threshold (top half)
CC2D_T = 3584  # island membership threshold (top eighth)
ATROUS2D_LEVELS = 3
ATROUS2D_T = 8.0  # hard-threshold on detail coefficients, raw ADU
# X69 noise-model mode: per-scale threshold = K × MAD(|w_j|). The
# INTEGER K keeps the rule exact in dyadic space — the usual Gaussian
# consistency constant (σ ≈ MAD/0.6745) is absorbed into K (3×MAD ≈
# 2.02σ) rather than multiplied in as an inexact float, so every
# threshold decision stays bit-identical cross-engine.
ATROUS_KSIGMA_K = 3

_PX_CTE = """
    dims AS (
        SELECT doc_id, 32 + n_chars % 32 AS w, 24 + doc_id % 24 AS h
        FROM documents
    ), xs AS (
        SELECT doc_id, w, h, unnest(range(w)) AS x FROM dims
    ), pxy AS (
        SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM xs
    ), px AS (
        SELECT doc_id, w, h, x, y,
               (3 * x + 17 * y + 11 * doc_id) % 4096 AS v
        FROM pxy
    )"""


def _nb8_core_sql() -> str:
    """OR over the 8 neighbors of (in-bounds AND neighbor-value >= HI),
    with the neighbor value re-derived arithmetically — no join."""
    terms = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            terms.append(
                f"(x + ({dx}) >= 0 AND x + ({dx}) < w"
                f" AND y + ({dy}) >= 0 AND y + ({dy}) < h"
                f" AND (3 * (x + ({dx})) + 17 * (y + ({dy}))"
                f" + 11 * doc_id) % 4096 >= {TAIL2D_HI})"
            )
    return "(" + " OR ".join(terms) + ")"


def _shift2d(m, dy: int, dx: int):
    """m shifted so out[y, x] = m[y+dy, x+dx], False/0 out of bounds."""
    import numpy as np

    h, w = m.shape
    out = np.zeros_like(m)
    ys0, ys1 = max(0, -dy), min(h, h - dy)
    xs0, xs1 = max(0, -dx), min(w, w - dx)
    if ys0 < ys1 and xs0 < xs1:
        out[ys0:ys1, xs0:xs1] = m[ys0 + dy : ys1 + dy, xs0 + dx : xs1 + dx]
    return out


@register(
    "q_tailcut_2d",
    oracle=f"""
        WITH {_PX_CTE}, flags AS (
            SELECT doc_id, v,
                   v >= {TAIL2D_HI} AS core,
                   v >= {TAIL2D_LO} AS boundary,
                   {_nb8_core_sql()} AS nb_core
            FROM px
        ), agg AS (
            SELECT doc_id AS media_id,
                   CAST(COUNT(*) FILTER (WHERE core) AS BIGINT) AS n_core,
                   CAST(COUNT(*) FILTER (WHERE boundary AND NOT core
                                           AND nb_core) AS BIGINT)
                       AS n_rescued,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN v ELSE 0 END) AS BIGINT) AS kept_sum
            FROM flags
            GROUP BY doc_id
        )
        SELECT media_id, n_core, n_rescued,
               n_core + n_rescued AS n_kept,
               kept_sum,
               ROUND(CAST(kept_sum AS DOUBLE)
                     / nullif(n_core + n_rescued, 0), 6) AS kept_mean
        FROM agg
    """,
    category=CAT,
)
def q_tailcut_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X58: TRUE 2-D tailcut cleaning over real FITS rasters
    (reference: datapipe/denoising/tailcut.py [UNVERIFIED-PK] — two
    thresholds with neighbor rescue on the camera image; X9 is the
    1-D analog of the same semantics). A pixel survives if it passes
    the core threshold, or passes the boundary threshold AND touches
    a core pixel in its 8-neighborhood (the reference's CTA cameras
    are hexagonal; on the square test grid we take the standard
    8-neighborhood and say so). Per image: core count, rescued count,
    kept count/sum/mean.

    Correctness: the Spark side PARSES the FITS payload and runs the
    mask arithmetic in numpy; the DuckDB oracle re-derives every pixel
    AND every neighbor arithmetically from documents — all outputs are
    integer-exact (the mean divides two already-identical numbers).

    Scale: stateless Arrow-batched mapInPandas over the FITS scan,
    zero shuffles; the 8 shifted-mask ORs are O(pixels) per image.
    """
    import numpy as np

    from ..sources.multimodal import fits_parse, fits_table

    def clean(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "n_core", "n_rescued", "kept_sum")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                _, phys = fits_parse(bytes(p))
                v = phys.astype(np.int64)
                core = v >= TAIL2D_HI
                boundary = v >= TAIL2D_LO
                nb_core = np.zeros_like(core)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            continue
                        nb_core |= _shift2d(core, dy, dx)
                rescued = boundary & ~core & nb_core
                kept = core | rescued
                rows["media_id"].append(mid)
                rows["n_core"].append(int(core.sum()))
                rows["n_rescued"].append(int(rescued.sum()))
                rows["kept_sum"].append(int(v[kept].sum()))
            yield pd.DataFrame(rows)

    out = fits_table(spark, sf_dir).mapInPandas(
        clean,
        schema="media_id bigint, n_core bigint, n_rescued bigint, kept_sum bigint",
    )
    n_kept = F.col("n_core") + F.col("n_rescued")
    return out.select(
        "media_id",
        "n_core",
        "n_rescued",
        n_kept.alias("n_kept"),
        "kept_sum",
        F.round(
            F.col("kept_sum").cast("double")
            / F.when(n_kept > 0, n_kept).otherwise(F.lit(None)),
            6,
        ).alias("kept_mean"),
    )


def tailcut_masks(v, nb_idx, hi: int, lo: int):
    """(core, rescued) boolean masks of the two-threshold rescue rule
    over an INDEX-MAPPED neighbor list — THE single copy of the
    kept-set semantics every hex op builds on (r11 review #3: the
    tailcut/hillas/pipeline kernels must share one implementation so
    a rule change cannot desync the fused op from its stages)."""
    import numpy as np

    core = v >= hi
    nbc = np.zeros(v.shape[0], dtype=bool)
    for k in range(nb_idx.shape[1]):
        idx = nb_idx[:, k]
        valid = idx >= 0
        nbc[valid] |= core[idx[valid]]
    rescued = (v >= lo) & ~core & nbc
    return core, rescued


def tailcut_adjacency(v, nb_idx, hi: int, lo: int):
    """Tailcut over an INDEX-MAPPED neighbor list: v is the flat pixel
    vector in pix_id order, nb_idx an (npix, k) adjacency table with
    -1 for absent neighbors. Returns (n_core, n_rescued, kept_sum).
    Geometry-agnostic — the hex camera feeds its 6-neighbor table,
    and a degenerate 8-neighbor rectangular table reproduces X58's
    array-shift kernel exactly (pytest pins the equivalence)."""
    core, rescued = tailcut_masks(v, nb_idx, hi, lo)
    kept = core | rescued
    return int(core.sum()), int(rescued.sum()), int(v[kept].sum())


_HEX_DIRS = ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1))
# Hex pixel-value multipliers are defined in sources/multimodal.py —
# NEXT TO THE PAYLOAD WRITER — and imported here, so the four hex
# oracles below and the writer can never drift (r11 review #1; the
# modulus-wrap sizing argument lives with the definition). Re-exported
# under the same names for the tests and SURVEY references.
from ..sources.multimodal import HEX_MQ, HEX_MR  # noqa: E402

# hex pixel CTE shared by every hex-camera oracle (X68 tailcut, X70
# connected components): ring column is cam_r because DuckDB
# identifiers are case-insensitive — naming it R would capture the
# axial coordinate r.
_HEX_PX_CTE = f"""hdims AS (
            SELECT doc_id, 10 + doc_id % 6 AS cam_r FROM documents
        ), hrs AS (
            SELECT doc_id, cam_r,
                   unnest(range(-cam_r, cam_r + 1)) AS r
            FROM hdims
        ), hqr AS (
            SELECT doc_id, cam_r, r,
                   unnest(range(GREATEST(-cam_r, -r - cam_r),
                                LEAST(cam_r, -r + cam_r) + 1)) AS q
            FROM hrs
        ), px AS (
            SELECT doc_id, cam_r, q, r,
                   ({HEX_MQ} * (q + cam_r) + {HEX_MR} * (r + cam_r)
                    + 11 * doc_id) % 4096 AS v
            FROM hqr
        )"""


def _hex_nb_core_sql() -> str:
    """OR over the 6 axial-direction hex neighbors of (in-camera AND
    neighbor-value >= HI), neighbor value re-derived arithmetically —
    the _nb8_core_sql pattern on the hexagonal grid, no join."""
    terms = []
    for dq, dr in _HEX_DIRS:
        terms.append(
            f"(abs(q + ({dq})) <= cam_r AND abs(r + ({dr})) <= cam_r"
            f" AND abs(q + r + ({dq + dr})) <= cam_r"
            f" AND ({HEX_MQ} * (q + ({dq}) + cam_r)"
            f" + {HEX_MR} * (r + ({dr}) + cam_r)"
            f" + 11 * doc_id) % 4096 >= {TAIL2D_HI})"
        )
    return "(" + " OR ".join(terms) + ")"


@register(
    "q_tailcut_hex",
    oracle=f"""
        WITH {_HEX_PX_CTE}, flags AS (
            SELECT doc_id, v,
                   v >= {TAIL2D_HI} AS core,
                   v >= {TAIL2D_LO} AS boundary,
                   {_hex_nb_core_sql()} AS nb_core
            FROM px
        ), agg AS (
            SELECT doc_id AS media_id,
                   CAST(COUNT(*) AS BIGINT) AS n_pix,
                   CAST(COUNT(*) FILTER (WHERE core) AS BIGINT) AS n_core,
                   CAST(COUNT(*) FILTER (WHERE boundary AND NOT core
                                           AND nb_core) AS BIGINT)
                       AS n_rescued,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN v ELSE 0 END) AS BIGINT) AS kept_sum
            FROM flags
            GROUP BY doc_id
        )
        SELECT media_id, n_pix, n_core, n_rescued,
               n_core + n_rescued AS n_kept,
               kept_sum,
               ROUND(CAST(kept_sum AS DOUBLE)
                     / nullif(n_core + n_rescued, 0), 6) AS kept_mean
        FROM agg
    """,
    category=CAT,
)
def q_tailcut_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X68: tailcut cleaning on the reference's NATIVE camera geometry
    — hexagonal pixel grids (VERDICT r10 "What's missing" #1). The
    reference's CTA cameras are hexagonal and its geometry_converter
    modules (datapipe/io/geometry_converter* [UNVERIFIED-PK]) mediate
    between camera geometry and the cleaners; every other raster op
    here assumes a rectangular grid with 4/8-neighborhoods. This op
    runs the X58 two-threshold rescue rule over a ring-R axial hex
    camera (public hex-grid math), with neighbors resolved through a
    BROADCAST ADJACENCY TABLE (sc.broadcast of hex_geometry's
    index-mapped neighbor lists, one per camera size) instead of
    array shifts — the geometry-agnostic formulation
    (tailcut_adjacency) that a real camera-geometry port drops into.
    A degenerate rectangular adjacency reproduces X58 exactly
    (pytest pins it).

    Correctness: the Spark side PARSES the HEX1 payload and walks the
    adjacency table; the DuckDB oracle re-derives every pixel and
    every axial neighbor arithmetically (membership |q|,|r|,|q+r| <=
    R) — all outputs integer-exact; kept_mean divides two
    already-identical numbers.

    Scale: stateless Arrow-batched mapInPandas over the camera scan,
    zero shuffles; the adjacency tables are a few KB per camera size,
    broadcast once — exactly how a production geometry table ships.
    """
    import numpy as np

    from ..sources.multimodal import (
        hex_geometry_tables,
        hexcam_parse,
        hexcam_table,
    )

    badj = spark.sparkContext.broadcast(hex_geometry_tables())

    def clean(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_id", "n_pix", "n_core", "n_rescued", "kept_sum")
        for pdf in batches:
            rows = {k: [] for k in cols}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                R, v = hexcam_parse(bytes(p))
                nb_idx = badj.value[R][0]
                n_core, n_rescued, kept_sum = tailcut_adjacency(
                    v, nb_idx, TAIL2D_HI, TAIL2D_LO
                )
                rows["media_id"].append(mid)
                rows["n_pix"].append(len(v))
                rows["n_core"].append(n_core)
                rows["n_rescued"].append(n_rescued)
                rows["kept_sum"].append(kept_sum)
            yield pd.DataFrame(rows, columns=list(cols))

    out = hexcam_table(spark, sf_dir).mapInPandas(
        clean,
        schema="media_id bigint, n_pix bigint, n_core bigint, "
        "n_rescued bigint, kept_sum bigint",
    )
    n_kept = F.col("n_core") + F.col("n_rescued")
    return out.select(
        "media_id",
        "n_pix",
        "n_core",
        "n_rescued",
        n_kept.alias("n_kept"),
        "kept_sum",
        F.round(
            F.col("kept_sum").cast("double")
            / F.when(n_kept > 0, n_kept).otherwise(F.lit(None)),
            6,
        ).alias("kept_mean"),
    )


@register(
    "q_connected_2d",
    oracle=f"""
        WITH RECURSIVE {_PX_CTE}, above AS (
            SELECT doc_id, x, y, v FROM px WHERE v >= {CC2D_T}
        ), runs0 AS (
            SELECT doc_id, y, x, v,
                   x - row_number() OVER (PARTITION BY doc_id, y
                                          ORDER BY x) AS grp
            FROM above
        ), nodes AS (
            SELECT doc_id, y, grp,
                   MIN(x) AS x0, MAX(x) AS x1,
                   CAST(COUNT(*) AS BIGINT) AS sz,
                   CAST(SUM(v) AS BIGINT) AS sig,
                   CAST(row_number() OVER (PARTITION BY doc_id
                                           ORDER BY y, MIN(x)) AS BIGINT)
                       AS rid
            FROM runs0
            GROUP BY doc_id, y, grp
        ), sym AS (
            SELECT a.doc_id, a.rid AS src, b.rid AS dst
            FROM nodes a JOIN nodes b
              ON a.doc_id = b.doc_id AND abs(a.y - b.y) = 1
             AND a.x0 <= b.x1 AND b.x0 <= a.x1
        ), reach AS (
            SELECT doc_id, rid AS run, rid AS lab FROM nodes
            UNION
            SELECT s.doc_id, s.dst AS run, r.lab
            FROM reach r JOIN sym s
              ON r.doc_id = s.doc_id AND r.run = s.src
        ), labels AS (
            SELECT doc_id, run, MIN(lab) AS comp FROM reach
            GROUP BY doc_id, run
        ), islands AS (
            SELECT n.doc_id, l.comp,
                   CAST(SUM(n.sz) AS BIGINT) AS island_size,
                   CAST(SUM(n.sig) AS BIGINT) AS island_sig,
                   MIN(n.y * 64 + n.x0) AS first_px
            FROM nodes n JOIN labels l
              ON n.doc_id = l.doc_id AND n.rid = l.run
            GROUP BY n.doc_id, l.comp
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY island_sig DESC,
                                                  first_px ASC) AS rk
            FROM islands
        )
        SELECT doc_id AS media_id,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(CASE WHEN island_size = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_isolated,
               CAST(SUM(island_size) AS BIGINT) AS n_above,
               CAST(MAX(CASE WHEN rk = 1 THEN island_size END) AS BIGINT)
                   AS kept_size,
               CAST(MAX(CASE WHEN rk = 1 THEN island_sig END) AS BIGINT)
                   AS kept_sum
        FROM ranked
        GROUP BY doc_id
    """,
    category=CAT,
)
def q_connected_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X59: TRUE 2-D connected-component cleaning over real FITS
    rasters (reference: datapipe/image/kill_isolated_pixels.py
    [UNVERIFIED-PK] — scipy.ndimage.label on the thresholded camera
    image, keep the biggest cluster; X18 is the 1-D islands analog).
    Threshold at {CC2D_T}, label 4-connected components, keep the
    island with the largest total signal (ties: smallest first-pixel
    in row-major order), report islands/isolated-pixel counts and the
    kept island's size and signal. Images with NO pixel above the
    threshold emit no row (matching the oracle's empty group).

    Spark side: per-image union-find over horizontal RUNS (≤2 runs
    per row on this raster family, so ~h·2 nodes, not w·h) inside a
    stateless Arrow-batched kernel. Oracle side: the same run
    decomposition via gaps-and-islands, run adjacency as an interval-
    overlap self-join on consecutive rows, and component labels as
    min-label transitive closure via a RECURSIVE CTE (UNION-distinct
    bounds the closure at Σ component_size² run pairs — a few
    thousand per image). All outputs integer-exact.

    Scale: zero shuffles on the Spark side (per-image work is local
    to the scan); at 100 TB this is the classic embarrassingly
    parallel cleaning pass; only the oracle pays the closure, and
    only at parity-check scale.
    """
    import numpy as np

    from ..sources.multimodal import fits_parse, fits_table

    def clean(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "media_id",
                    "n_islands",
                    "n_isolated",
                    "n_above",
                    "kept_size",
                    "kept_sum",
                )
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                _, phys = fits_parse(bytes(p))
                v = phys.astype(np.int64)
                mask = v >= CC2D_T
                if not mask.any():
                    continue
                # union-find over horizontal runs (4-connectivity)
                parent: list[int] = []

                def find(i: int) -> int:
                    while parent[i] != i:
                        parent[i] = parent[parent[i]]
                        i = parent[i]
                    return i

                def union(a: int, b: int) -> None:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)

                runs: list[tuple[int, int, int, int, int]] = []  # y,x0,x1,sz,sig
                prev_row: list[int] = []  # run ids in row y-1
                h, _ = mask.shape
                for y in range(h):
                    idx = np.flatnonzero(mask[y])
                    cur: list[int] = []
                    if len(idx):
                        # split idx into maximal consecutive runs
                        brk = np.flatnonzero(np.diff(idx) > 1)
                        starts = np.concatenate(([0], brk + 1))
                        ends = np.concatenate((brk, [len(idx) - 1]))
                        for s, e in zip(starts, ends):
                            x0, x1 = int(idx[s]), int(idx[e])
                            rid = len(runs)
                            parent.append(rid)
                            sig = int(v[y, x0 : x1 + 1].sum())
                            runs.append((y, x0, x1, x1 - x0 + 1, sig))
                            for pid in prev_row:
                                py, px0, px1 = runs[pid][0], runs[pid][1], runs[pid][2]
                                if px0 <= x1 and x0 <= px1:
                                    union(rid, pid)
                            cur.append(rid)
                    prev_row = cur
                comps: dict[int, list[int]] = {}
                for rid, (y, x0, x1, sz, sig) in enumerate(runs):
                    root = find(rid)
                    st = comps.setdefault(root, [0, 0, 1 << 30])
                    st[0] += sz
                    st[1] += sig
                    st[2] = min(st[2], y * 64 + x0)
                islands = sorted(comps.values(), key=lambda s: (-s[1], s[2]))
                rows["media_id"].append(mid)
                rows["n_islands"].append(len(islands))
                rows["n_isolated"].append(sum(1 for s in islands if s[0] == 1))
                rows["n_above"].append(int(mask.sum()))
                rows["kept_size"].append(islands[0][0])
                rows["kept_sum"].append(islands[0][1])
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_islands",
                    "n_isolated",
                    "n_above",
                    "kept_size",
                    "kept_sum",
                ],
            )

    return fits_table(spark, sf_dir).mapInPandas(
        clean,
        schema="media_id bigint, n_islands bigint, n_isolated bigint, "
        "n_above bigint, kept_size bigint, kept_sum bigint",
    )


def connected_adjacency(v, nb_idx, thresh: int, order_key):
    """Connected components over an INDEX-MAPPED neighbor list: v is
    the flat pixel vector, nb_idx an (npix, k) adjacency table with
    -1 for absent neighbors, order_key an int64 per-pixel tie-break
    key (row-major linear id on rect grids, (r,q)-encoded on hex).
    Union-find over the above-``thresh`` nodes; returns
    (n_islands, n_isolated, n_above, kept_size, kept_sum) for the
    largest-total-signal island (ties: smallest order_key), or None
    when no pixel passes. Geometry-agnostic — the hex camera feeds
    its 6-neighbor table, and a 4-neighbor rectangular table
    reproduces X59's run-based union-find exactly (pytest pins the
    equivalence across all images)."""
    import numpy as np

    mask = v >= thresh
    nodes = np.flatnonzero(mask)
    if len(nodes) == 0:
        return None
    pos = np.full(len(v), -1, np.int64)
    pos[nodes] = np.arange(len(nodes))
    parent = list(range(len(nodes)))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for ni, oi in enumerate(nodes):
        for j in nb_idx[oi]:
            if j >= 0 and mask[j] and j < oi:
                ra, rb = find(ni), find(int(pos[j]))
                if ra != rb:
                    parent[rb] = ra
    comps: dict[int, list[int]] = {}
    for ni, oi in enumerate(nodes):
        st = comps.setdefault(find(ni), [0, 0, 1 << 62])
        st[0] += 1
        st[1] += int(v[oi])
        st[2] = min(st[2], int(order_key[oi]))
    islands = sorted(comps.values(), key=lambda s: (-s[1], s[2]))
    return (
        len(islands),
        sum(1 for s in islands if s[0] == 1),
        int(mask.sum()),
        islands[0][0],
        islands[0][1],
    )


@register(
    "q_connected_hex",
    oracle=f"""
        WITH RECURSIVE {_HEX_PX_CTE}, above AS (
            SELECT doc_id, cam_r, q, r, v FROM px WHERE v >= {CC2D_T}
        ), runs0 AS (
            SELECT doc_id, cam_r, r, q, v,
                   q - row_number() OVER (PARTITION BY doc_id, r
                                          ORDER BY q) AS grp
            FROM above
        ), nodes AS (
            SELECT doc_id, cam_r, r, grp,
                   MIN(q) AS q0, MAX(q) AS q1,
                   CAST(COUNT(*) AS BIGINT) AS sz,
                   CAST(SUM(v) AS BIGINT) AS sig,
                   CAST(row_number() OVER (PARTITION BY doc_id
                                           ORDER BY r, MIN(q)) AS BIGINT)
                       AS rid
            FROM runs0
            GROUP BY doc_id, cam_r, r, grp
        ), sym AS (
            -- hex 6-adjacency between consecutive rows: pixel (q,r)
            -- touches (q,r+1) and (q-1,r+1), so run A (row r) links
            -- run B (row r+1) iff B.q0 <= A.q1 AND B.q1 >= A.q0 - 1;
            -- the r-1 direction is the mirror of the same condition
            SELECT a.doc_id, a.rid AS src, b.rid AS dst
            FROM nodes a JOIN nodes b
              ON a.doc_id = b.doc_id
             AND ((b.r = a.r + 1 AND b.q0 <= a.q1 AND b.q1 >= a.q0 - 1)
                  OR (b.r = a.r - 1 AND a.q0 <= b.q1 AND a.q1 >= b.q0 - 1))
        ), reach AS (
            SELECT doc_id, rid AS run, rid AS lab FROM nodes
            UNION
            SELECT s.doc_id, s.dst AS run, r.lab
            FROM reach r JOIN sym s
              ON r.doc_id = s.doc_id AND r.run = s.src
        ), labels AS (
            SELECT doc_id, run, MIN(lab) AS comp FROM reach
            GROUP BY doc_id, run
        ), islands AS (
            SELECT n.doc_id, l.comp,
                   CAST(SUM(n.sz) AS BIGINT) AS island_size,
                   CAST(SUM(n.sig) AS BIGINT) AS island_sig,
                   MIN((n.r + n.cam_r) * 4096 + (n.q0 + n.cam_r))
                       AS first_px
            FROM nodes n JOIN labels l
              ON n.doc_id = l.doc_id AND n.rid = l.run
            GROUP BY n.doc_id, l.comp
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY island_sig DESC,
                                                  first_px ASC) AS rk
            FROM islands
        )
        SELECT doc_id AS media_id,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(CASE WHEN island_size = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_isolated,
               CAST(SUM(island_size) AS BIGINT) AS n_above,
               CAST(MAX(CASE WHEN rk = 1 THEN island_size END) AS BIGINT)
                   AS kept_size,
               CAST(MAX(CASE WHEN rk = 1 THEN island_sig END) AS BIGINT)
                   AS kept_sum
        FROM ranked
        GROUP BY doc_id
    """,
    category=CAT,
)
def q_connected_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X70: isolated-island removal on the NATIVE camera geometry —
    kill_isolated_pixels over the hexagonal pixel grid (r11; completes
    the X68 pairing: the reference chains tailcut AND the island keep
    on the same camera image, so the hex surface needs both).
    Threshold at {CC2D_T}, label components over the 6-neighbor axial
    adjacency, keep the island with the largest total signal (ties:
    smallest (r, q) first-pixel), report island/isolated counts and
    the kept island's size and signal — X59's report on X68's
    geometry. Images with no pixel above the threshold emit no row.

    Spark side: the geometry-agnostic union-find
    (``connected_adjacency``) over the SAME broadcast adjacency
    tables X68 ships — a 4-neighbor rectangular table reproduces
    X59's run-based kernel exactly (pytest pins all 500 images
    equal). Oracle side: the X59 recursive run-graph closure adapted
    to hex row adjacency — runs of consecutive q within each r-row,
    linked iff B.q0 <= A.q1 AND B.q1 >= A.q0 - 1 (the axial-shear
    interval overlap), min-label closure in a RECURSIVE CTE. All
    outputs integer-exact.

    Scale: stateless Arrow-batched mapInPandas over the camera scan,
    zero shuffles; the union-find touches above-threshold nodes (~1/8
    of pixels at this threshold), per image, in Python-speed but
    C-bounded counts. Only the oracle pays the closure, at parity
    scale.
    """
    import numpy as np

    from ..sources.multimodal import (
        hex_geometry_tables,
        hexcam_parse,
        hexcam_table,
    )

    badj = spark.sparkContext.broadcast(hex_geometry_tables())

    def clean(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "media_id",
            "n_islands",
            "n_isolated",
            "n_above",
            "kept_size",
            "kept_sum",
        )
        for pdf in batches:
            rows = {k: [] for k in cols}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                R, v = hexcam_parse(bytes(p))
                nb_idx, _, _, key = badj.value[R]
                got = connected_adjacency(v, nb_idx, CC2D_T, key)
                if got is None:
                    continue
                rows["media_id"].append(mid)
                for c, val in zip(cols[1:], got):
                    rows[c].append(val)
            yield pd.DataFrame(rows, columns=list(cols))

    return hexcam_table(spark, sf_dir).mapInPandas(
        clean,
        schema="media_id bigint, n_islands bigint, n_isolated bigint, "
        "n_above bigint, kept_size bigint, kept_sum bigint",
    )


def _hex_ellipse_sql(src: str, carry: tuple[str, ...] = ()) -> str:
    """Oracle-side axial→cartesian + covariance/eigen chain over
    ``src`` (must expose doc_id, n_kept, s0, sq, sr, sqq, srr, sqr
    plus ``carry``); yields doc_id, n_kept, s0, carry…, cx, cy, vxx,
    vyy, vxy, rr. ONE copy of the SQL expression tree shared by the
    X71/X72 oracles, mirroring _hex_ellipse_exprs term for term —
    the bit-identity bet requires the fused and staged ops to stay
    textually synchronized, so there is exactly one text (r11 review
    #4)."""
    c = "".join(f"{x}, " for x in carry)
    return f"""(
            SELECT *,
                   sqrt((vxx - vyy) * (vxx - vyy) + 4 * vxy * vxy) AS rr
            FROM (
                SELECT doc_id, n_kept, s0, {c}cx, cy,
                       msxx / s0d - cx * cx AS vxx,
                       msyy / s0d - cy * cy AS vyy,
                       msxy / s0d - cx * cy AS vxy
                FROM (
                    SELECT *,
                           msx / s0d AS cx,
                           msy / s0d AS cy
                    FROM (
                        SELECT doc_id, n_kept, s0, {c}
                               CAST(s0 AS DOUBLE) AS s0d,
                               CAST(sq AS DOUBLE)
                                   + CAST(sr AS DOUBLE) / 2 AS msx,
                               (sqrt(3) / 2) * CAST(sr AS DOUBLE) AS msy,
                               CAST(sqq AS DOUBLE) + CAST(sqr AS DOUBLE)
                                   + CAST(srr AS DOUBLE) / 4 AS msxx,
                               (sqrt(3) / 2) * (CAST(sqr AS DOUBLE)
                                   + CAST(srr AS DOUBLE) / 2) AS msxy,
                               0.75 * CAST(srr AS DOUBLE) AS msyy
                        FROM {src}
                    )
                )
            )
        )"""


def _hex_ellipse_exprs() -> dict:
    """Spark-side twin of _hex_ellipse_sql: the axial→cartesian change
    of basis (x = q + r/2, y = (√3/2)·r at unit pitch) and the
    covariance/eigen terms as column expressions over the integer
    moment columns sq…sqr, s0. Shared by q_hillas_hex and
    q_pipeline_hex so the fused op's ellipse is the staged op's
    ellipse by construction."""
    sqd = F.col("sq").cast("double")
    srd = F.col("sr").cast("double")
    sqqd = F.col("sqq").cast("double")
    srrd = F.col("srr").cast("double")
    sqrd = F.col("sqr").cast("double")
    half_r3 = F.sqrt(F.lit(3.0)) / 2
    sx = sqd + srd / 2
    sy = half_r3 * srd
    sxx = sqqd + sqrd + srrd / 4
    sxy = half_r3 * (sqrd + srrd / 2)
    syy = F.lit(0.75) * srrd
    s0d = F.col("s0").cast("double")
    cx = sx / s0d
    cy = sy / s0d
    vxx = sxx / s0d - cx * cx
    vyy = syy / s0d - cy * cy
    vxy = sxy / s0d - cx * cy
    rr = F.sqrt((vxx - vyy) * (vxx - vyy) + 4 * vxy * vxy)
    return {
        "cog_x": F.round(cx, 6),
        "cog_y": F.round(cy, 6),
        "length": F.round(F.sqrt((vxx + vyy + rr) / 2), 6),
        "width": F.round(
            F.sqrt(F.greatest((vxx + vyy - rr) / 2, F.lit(0.0))), 6
        ),
        "psi": F.round(F.atan2(2 * vxy, vxx - vyy) / 2, 6),
    }


@register(
    "q_hillas_hex",
    oracle=f"""
        WITH {_HEX_PX_CTE}, flags AS (
            SELECT doc_id, cam_r, q, r, v,
                   v >= {TAIL2D_HI} AS core,
                   v >= {TAIL2D_LO} AS boundary,
                   {_hex_nb_core_sql()} AS nb_core
            FROM px
        ), kept AS (
            SELECT doc_id, q, r, v
            FROM flags
            WHERE core OR (boundary AND nb_core)
        ), sums AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(v) AS BIGINT) AS s0,
                   CAST(SUM(q * v) AS BIGINT) AS sq,
                   CAST(SUM(r * v) AS BIGINT) AS sr,
                   CAST(SUM(q * q * v) AS BIGINT) AS sqq,
                   CAST(SUM(r * r * v) AS BIGINT) AS srr,
                   CAST(SUM(q * r * v) AS BIGINT) AS sqr
            FROM kept
            GROUP BY doc_id
        )
        SELECT doc_id AS media_id, n_kept, s0 AS size,
               ROUND(cx, 6) AS cog_x,
               ROUND(cy, 6) AS cog_y,
               ROUND(sqrt((vxx + vyy + rr) / 2), 6) AS length,
               ROUND(sqrt(GREATEST((vxx + vyy - rr) / 2, 0.0)), 6) AS width,
               ROUND(atan2(2 * vxy, vxx - vyy) / 2, 6) AS psi
        FROM {_hex_ellipse_sql("(SELECT * FROM sums WHERE n_kept >= 3)")}
    """,
    category=CAT,
)
def q_hillas_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X71: Hillas ellipse on the HEX-cleaned camera image (r11 —
    the feature-extraction step in the reference's native geometry:
    hillas_parameters runs on the cleaned CAMERA image, whose pixels
    sit on a hex lattice; X62 is the rectangular twin). Pixels kept
    by X68's tailcut rule are weighted by signal; moments accumulate
    in AXIAL (q, r) coordinates as exact integers, then one linear
    change of basis maps them to physical camera coordinates
    (x = q + r/2, y = (√3/2)·r — the standard axial→cartesian map at
    unit pitch): Sx = Sq + Sr/2, Sy = (√3/2)Sr, Sxx = Sqq + Sqr +
    Srr/4, Sxy = (√3/2)(Sqr + Srr/2), Syy = ¾Srr. CoG, covariance
    eigen-decomposition, length/width/psi follow exactly as in X62.
    Images with fewer than 3 kept pixels are dropped.

    Determinism: the kernel emits ONLY exact integer axial moment
    sums (|q|,|r| ≤ 15, v ≤ 4095, npix ≤ 721 → |Sqq| < 2^30); the
    cartesian conversion and the ellipse are the IDENTICAL float
    expression tree on both engines from identical BIGINTs — √3 and
    sqrt are correctly-rounded IEEE on both, atan2's last-ulp libm
    latitude absorbed by round(6), width's tiny-negative eigenvalue
    guarded with GREATEST(·, 0) on both sides (the X62 bet, with one
    extra exactly-mirrored linear layer).

    Scale: moments reduce INSIDE the stateless Arrow kernel (one row
    per image, zero shuffles); the change of basis + ellipse is a
    codegen scalar pass; the adjacency tables broadcast once.
    """
    import numpy as np

    from ..sources.multimodal import (
        hex_geometry_tables,
        hexcam_parse,
        hexcam_table,
    )

    bgeo = spark.sparkContext.broadcast(hex_geometry_tables())

    def moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "n_kept", "s0", "sq", "sr", "sqq", "srr", "sqr"]
        for pdf in batches:
            rows = {k: [] for k in cols}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                R, v = hexcam_parse(bytes(p))
                nb_idx, qs, rs, _ = bgeo.value[R]
                core, rescued = tailcut_masks(v, nb_idx, TAIL2D_HI, TAIL2D_LO)
                kept = core | rescued
                n_kept = int(kept.sum())
                if n_kept < 3:
                    continue
                kv = np.where(kept, v, 0)
                rows["media_id"].append(mid)
                rows["n_kept"].append(n_kept)
                rows["s0"].append(int(kv.sum()))
                rows["sq"].append(int((qs * kv).sum()))
                rows["sr"].append(int((rs * kv).sum()))
                rows["sqq"].append(int((qs * qs * kv).sum()))
                rows["srr"].append(int((rs * rs * kv).sum()))
                rows["sqr"].append(int((qs * rs * kv).sum()))
            yield pd.DataFrame(rows, columns=cols)

    sums = hexcam_table(spark, sf_dir).mapInPandas(
        moments,
        schema="media_id bigint, n_kept bigint, s0 bigint, sq bigint, "
        "sr bigint, sqq bigint, srr bigint, sqr bigint",
    )
    e = _hex_ellipse_exprs()
    return sums.select(
        "media_id",
        "n_kept",
        F.col("s0").alias("size"),
        e["cog_x"].alias("cog_x"),
        e["cog_y"].alias("cog_y"),
        e["length"].alias("length"),
        e["width"].alias("width"),
        e["psi"].alias("psi"),
    )


def _conv_pass_sql(
    prev: str, name: str, src: str, out: str, d: int, part: str, ordc: str,
    carry: tuple[str, ...],
) -> str:
    """One 1-D B3-spline à-trous pass at dilation ``d`` along ``ordc``
    within (doc_id, ``part``) as a window CTE: taps [1,4,6,4,1]/16,
    replicate-edge via COALESCE(lag/lead, first/last_value) — lag(k)
    is NULL exactly when the clamped index would be 0, and
    first_value IS the value at index 0 (same for lead/last). The
    numpy kernel's parenthesization is mirrored, though with integer
    pixels every intermediate is an exact dyadic rational so the
    values are order-free anyway (module docstring)."""
    lagf = lambda k: f"COALESCE(lag({src}, {k}) OVER w, first_value({src}) OVER w)"  # noqa: E731
    leadf = lambda k: f"COALESCE(lead({src}, {k}) OVER w, last_value({src}) OVER wf)"  # noqa: E731
    expr = (
        f"(((({lagf(2 * d)} + 4 * {lagf(d)}) + 6 * {src})"
        f" + 4 * {leadf(d)}) + {leadf(2 * d)}) / 16"
    )
    carry_cols = ("".join(c + ", " for c in carry))
    return f"""
{name} AS MATERIALIZED (
    SELECT doc_id, x, y, {carry_cols}{expr} AS {out}
    FROM {prev}
    WINDOW w AS (PARTITION BY doc_id, {part} ORDER BY {ordc}),
           wf AS (PARTITION BY doc_id, {part} ORDER BY {ordc}
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING)
)"""


def _atrous2d_kept(band: str) -> str:
    return f"CASE WHEN abs({band}) < {ATROUS2D_T} THEN 0.0 ELSE {band} END"


# px → detail bands (w1/w2/w3 + residual c3): the shared 6-pass
# window-CTE chain used by BOTH à-trous oracles (fixed-threshold X60
# and the k·MAD noise-model X69) — one definition, no drift.
_ATROUS2D_BANDS_CTE = f"""p0 AS MATERIALIZED (
        SELECT doc_id, x, y, CAST(v AS DOUBLE) AS c0 FROM px
    ),{_conv_pass_sql('p0', 'h1', 'c0', 'ch', 1, 'y', 'x', ('c0',))},{_conv_pass_sql('h1', 'v1', 'ch', 'c1', 1, 'x', 'y', ('c0',))},{_conv_pass_sql('v1', 'h2', 'c1', 'ch', 2, 'y', 'x', ('c0', 'c1'))},{_conv_pass_sql('h2', 'v2', 'ch', 'c2', 2, 'x', 'y', ('c0', 'c1'))},{_conv_pass_sql('v2', 'h3', 'c2', 'ch', 4, 'y', 'x', ('c0', 'c1', 'c2'))},{_conv_pass_sql('h3', 'v3', 'ch', 'c3', 4, 'x', 'y', ('c0', 'c1', 'c2'))},
    bands AS (
        SELECT doc_id, c0,
               c0 - c1 AS w1, c1 - c2 AS w2, c2 - c3 AS w3, c3
        FROM v3
    )"""


_ATROUS2D_ORACLE = f"""
    WITH {_PX_CTE}, {_ATROUS2D_BANDS_CTE}, rec AS (
        SELECT doc_id, c0,
               (CASE WHEN abs(w1) < {ATROUS2D_T} THEN 1 ELSE 0 END
                + CASE WHEN abs(w2) < {ATROUS2D_T} THEN 1 ELSE 0 END
                + CASE WHEN abs(w3) < {ATROUS2D_T} THEN 1 ELSE 0 END) AS nz,
               ((c3 + {_atrous2d_kept('w1')})
                  + {_atrous2d_kept('w2')})
                  + {_atrous2d_kept('w3')} AS r
        FROM bands
    ), agg AS (
        SELECT doc_id AS media_id,
               CAST(COUNT(*) AS BIGINT) AS n_pixels,
               CAST(SUM(CAST(c0 * c0 AS BIGINT)) AS BIGINT) AS energy_in,
               CAST(SUM(CAST(round((r * r) * 1000000) AS BIGINT)) AS BIGINT)
                   AS eout_micro,
               CAST(SUM(nz) AS BIGINT) AS n_zeroed
        FROM rec
        GROUP BY doc_id
    )
    SELECT media_id, n_pixels, energy_in,
           CAST(eout_micro AS DOUBLE) / 1000000.0 AS energy_out,
           n_zeroed,
           ROUND((CAST(eout_micro AS DOUBLE) / 1000000.0)
                 / CAST(energy_in AS DOUBLE), 6) AS energy_ratio
    FROM agg
"""


def _b3_smooth2d(c, d: int):
    """Separable 2-D B3-spline à-trous smoothing at dilation d:
    horizontal then vertical [1,4,6,4,1]/16 with replicate edges.
    Exact on integer-seeded rasters (every intermediate is a dyadic
    rational with numerator < 2^53)."""
    import numpy as np

    def sh(m, off: int, axis: int):
        n = m.shape[axis]
        idx = np.clip(np.arange(n) + off, 0, n - 1)
        return np.take(m, idx, axis=axis)

    hp = (
        (((sh(c, -2 * d, 1) + 4 * sh(c, -d, 1)) + 6 * c) + 4 * sh(c, d, 1))
        + sh(c, 2 * d, 1)
    ) / 16
    return (
        (((sh(hp, -2 * d, 0) + 4 * sh(hp, -d, 0)) + 6 * hp) + 4 * sh(hp, d, 0))
        + sh(hp, 2 * d, 0)
    ) / 16


@register("q_atrous_2d", oracle=_ATROUS2D_ORACLE, category=CAT)
def q_atrous_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X60: TRUE 2-D à-trous wavelet filtering over real FITS rasters —
    the reference's flagship cleaner in its native dimensionality
    (datapipe/denoising/wavelets_mrfilter.py shells out to Sparse2D
    ``mr_filter`` on the 2-D camera image [UNVERIFIED-PK]; the
    algorithm is public — Starck/Murtagh, Holschneider et al.; X56 is
    the 1-D analog). Three undecimated SEPARABLE B3-spline smoothing
    levels ([1,4,6,4,1]/16 horizontally then vertically) at dilations
    1/2/4 with replicate edges, detail bands w_j = c_{{j-1}} - c_j,
    hard threshold at {ATROUS2D_T} ADU, additive reconstruction
    c_3 + Σ w'_j. Per image: pixel count, input energy, reconstructed
    energy, zeroed-coefficient count, energy ratio.

    Exactness (stronger than X56's round(6) association bet): FITS
    pixels are integers 0..4095 and the kernel only adds, multiplies
    by 4/6, and divides by 16 — every coefficient is an exactly-
    representable dyadic rational (worst numerator ≈ 4095·2^24·16 <
    2^53), so c_j, w_j, every threshold decision and r are BIT-
    IDENTICAL cross-engine and even parenthesization-independent.
    energy_in is an exact BIGINT of c0². energy_out uses the
    dsum/o_dsum micro-unit discipline (common.py): r² is the product
    of identical doubles, its micro-rounding is identical, and the
    int64 sum is order-free — zero nondeterminism end to end.

    On the raster family the smoothed image is locally exact (B3
    reproduces the locally-LINEAR 3x+17y ramp), so the detail bands
    are exactly 0 away from the mod-4096 wrap seams — the threshold
    keeps precisely the seam/edge structure, which is the shape of
    the reference's signal-vs-noise separation.

    Scale: stateless Arrow-batched mapInPandas over the FITS scan,
    zero shuffles; 6 dilated separable passes of C-speed numpy per
    image. The oracle pays 6 window passes over the pixel grain, only
    at parity scale.
    """
    import numpy as np

    from ..sources.multimodal import fits_parse, fits_table

    def filt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "media_id",
                    "n_pixels",
                    "energy_in",
                    "eout_micro",
                    "n_zeroed",
                )
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                _, phys = fits_parse(bytes(p))
                c0 = phys  # float64, exact integers
                levels = [c0]
                c = c0
                for j in range(ATROUS2D_LEVELS):
                    c = _b3_smooth2d(c, 1 << j)
                    levels.append(c)
                n_zeroed = 0
                r = levels[-1]
                for j in range(ATROUS2D_LEVELS):
                    w = levels[j] - levels[j + 1]
                    mask = np.abs(w) < ATROUS2D_T
                    n_zeroed += int(mask.sum())
                    r = r + np.where(mask, 0.0, w)
                vi = c0.astype(np.int64)
                r2 = r * r
                eout_micro = int(np.floor(r2 * 1e6 + 0.5).astype(np.int64).sum())
                rows["media_id"].append(mid)
                rows["n_pixels"].append(c0.size)
                rows["energy_in"].append(int((vi * vi).sum()))
                rows["eout_micro"].append(eout_micro)
                rows["n_zeroed"].append(n_zeroed)
            yield pd.DataFrame(rows)

    out = fits_table(spark, sf_dir).mapInPandas(
        filt,
        schema="media_id bigint, n_pixels bigint, energy_in bigint, "
        "eout_micro bigint, n_zeroed bigint",
    )
    energy_out = F.col("eout_micro").cast("double") / 1_000_000.0
    return out.select(
        "media_id",
        "n_pixels",
        "energy_in",
        energy_out.alias("energy_out"),
        "n_zeroed",
        F.round(energy_out / F.col("energy_in").cast("double"), 6).alias(
            "energy_ratio"
        ),
    )


def _ksigma_kept(band: str, mad: str) -> str:
    return (
        f"CASE WHEN abs({band}) < {ATROUS_KSIGMA_K} * {mad}"
        f" THEN 0.0 ELSE {band} END"
    )


_ATROUS_KSIGMA_ORACLE = f"""
    WITH {_PX_CTE}, {_ATROUS2D_BANDS_CTE}, mads AS (
        SELECT doc_id,
               median(abs(w1)) AS mad1,
               median(abs(w2)) AS mad2,
               median(abs(w3)) AS mad3
        FROM bands
        GROUP BY doc_id
    ), rec AS (
        SELECT b.doc_id, b.c0, m.mad1, m.mad2, m.mad3,
               (CASE WHEN abs(b.w1) < {ATROUS_KSIGMA_K} * m.mad1
                     THEN 1 ELSE 0 END
                + CASE WHEN abs(b.w2) < {ATROUS_KSIGMA_K} * m.mad2
                       THEN 1 ELSE 0 END
                + CASE WHEN abs(b.w3) < {ATROUS_KSIGMA_K} * m.mad3
                       THEN 1 ELSE 0 END) AS nz,
               ((b.c3 + {_ksigma_kept('b.w1', 'm.mad1')})
                  + {_ksigma_kept('b.w2', 'm.mad2')})
                  + {_ksigma_kept('b.w3', 'm.mad3')} AS r
        FROM bands b JOIN mads m USING (doc_id)
    ), agg AS (
        SELECT doc_id AS media_id,
               CAST(COUNT(*) AS BIGINT) AS n_pixels,
               MAX(mad1) AS mad1, MAX(mad2) AS mad2, MAX(mad3) AS mad3,
               CAST(SUM(CAST(c0 * c0 AS BIGINT)) AS BIGINT) AS energy_in,
               CAST(SUM(CAST(round((r * r) * 1000000) AS BIGINT)) AS BIGINT)
                   AS eout_micro,
               CAST(SUM(nz) AS BIGINT) AS n_zeroed
        FROM rec
        GROUP BY doc_id
    )
    SELECT media_id, n_pixels, mad1, mad2, mad3, energy_in,
           CAST(eout_micro AS DOUBLE) / 1000000.0 AS energy_out,
           n_zeroed,
           ROUND((CAST(eout_micro AS DOUBLE) / 1000000.0)
                 / CAST(energy_in AS DOUBLE), 6) AS energy_ratio
    FROM agg
"""


@register("q_atrous_ksigma", oracle=_ATROUS_KSIGMA_ORACLE, category=CAT)
def q_atrous_ksigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X69: à-trous filtering with the reference's DEFAULT noise-model
    thresholding — k·σ PER SCALE, estimated from the data — closing
    VERDICT r10 "What's missing" #2. mr_filter's standard mode
    thresholds each wavelet band w_j at k times a per-scale noise σ_j
    estimate rather than a fixed ADU constant (datapipe/denoising/
    wavelets_mrfilter.py [UNVERIFIED-PK]; the estimator family — MAD
    of the detail coefficients — is the public Starck/Murtagh robust
    noise model, Donoho/Johnstone's MAD rule). Here σ_j is the per-
    image, per-scale median(|w_j|), and the threshold is
    {ATROUS_KSIGMA_K}·MAD_j — the integer k ABSORBS the Gaussian
    consistency constant (MAD/0.6745): multiplying the inexact float
    in would break the module's dyadic-exactness contract for zero
    semantic gain. X60 is the fixed-threshold twin; MT9 ranks both.

    Exactness: every |w_j| is a dyadic rational (module docstring);
    the median of n of them is either one of them (n odd) or the mean
    of two (n even) — numerator < 2^38 over denominator 2^25, exactly
    representable — and {ATROUS_KSIGMA_K}·MAD_j keeps the form, so
    every threshold decision, zeroed count and reconstruction value is
    BIT-IDENTICAL cross-engine, even at the |w_j| = k·MAD_j boundary.
    numpy's even-n median averages the two middle values exactly as
    DuckDB's quantile_cont(0.5) interpolation does — both exact on
    dyadic inputs, so there is no estimator-formulation caveat.

    Per image: pixel count, the three MAD estimates (the σ ladder the
    reference prints in verbose mode), input/output energy, zeroed
    count, energy ratio — X60's report plus the noise model.

    Scale: identical shape to X60 — stateless Arrow-batched
    mapInPandas over the FITS scan, zero shuffles; the extra work is
    three numpy medians per image. The oracle pays one extra
    median-aggregate CTE at parity scale only.
    """
    import numpy as np

    from ..sources.multimodal import fits_parse, fits_table

    def filt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = (
                "media_id",
                "n_pixels",
                "mad1",
                "mad2",
                "mad3",
                "energy_in",
                "eout_micro",
                "n_zeroed",
            )
            rows = {k: [] for k in cols}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                _, phys = fits_parse(bytes(p))
                c0 = phys  # float64, exact integers
                levels = [c0]
                c = c0
                for j in range(ATROUS2D_LEVELS):
                    c = _b3_smooth2d(c, 1 << j)
                    levels.append(c)
                n_zeroed = 0
                r = levels[-1]
                mads = []
                for j in range(ATROUS2D_LEVELS):
                    w = levels[j] - levels[j + 1]
                    mad = float(np.median(np.abs(w)))
                    mads.append(mad)
                    mask = np.abs(w) < ATROUS_KSIGMA_K * mad
                    n_zeroed += int(mask.sum())
                    r = r + np.where(mask, 0.0, w)
                vi = c0.astype(np.int64)
                r2 = r * r
                eout_micro = int(np.floor(r2 * 1e6 + 0.5).astype(np.int64).sum())
                rows["media_id"].append(mid)
                rows["n_pixels"].append(c0.size)
                rows["mad1"].append(mads[0])
                rows["mad2"].append(mads[1])
                rows["mad3"].append(mads[2])
                rows["energy_in"].append(int((vi * vi).sum()))
                rows["eout_micro"].append(eout_micro)
                rows["n_zeroed"].append(n_zeroed)
            yield pd.DataFrame(rows, columns=list(cols))

    out = fits_table(spark, sf_dir).mapInPandas(
        filt,
        schema="media_id bigint, n_pixels bigint, mad1 double, mad2 double, "
        "mad3 double, energy_in bigint, eout_micro bigint, n_zeroed bigint",
    )
    energy_out = F.col("eout_micro").cast("double") / 1_000_000.0
    return out.select(
        "media_id",
        "n_pixels",
        "mad1",
        "mad2",
        "mad3",
        "energy_in",
        energy_out.alias("energy_out"),
        "n_zeroed",
        F.round(energy_out / F.col("energy_in").cast("double"), 6).alias(
            "energy_ratio"
        ),
    )


@register(
    "q_pipeline_e2e",
    oracle=f"""
        WITH {_PX_CTE}, flags AS (
            SELECT doc_id, x, y, v,
                   v >= {TAIL2D_HI} AS core,
                   v >= {TAIL2D_LO} AS boundary,
                   {_nb8_core_sql()} AS nb_core
            FROM px
        ), sums AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_pixels,
                   CAST(SUM(v * v) AS BIGINT) AS e_in,
                   CAST(COUNT(*) FILTER (WHERE core) AS BIGINT) AS n_core,
                   CAST(COUNT(*) FILTER (WHERE boundary AND NOT core
                                           AND nb_core) AS BIGINT)
                       AS n_rescued,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN v ELSE 0 END) AS BIGINT) AS s0,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN x * v ELSE 0 END) AS BIGINT) AS sx,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN y * v ELSE 0 END) AS BIGINT) AS sy,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN x * x * v ELSE 0 END) AS BIGINT) AS sxx,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN y * y * v ELSE 0 END) AS BIGINT) AS syy,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN x * y * v ELSE 0 END) AS BIGINT) AS sxy,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN v * v ELSE 0 END) AS BIGINT) AS e_kept
            FROM flags
            GROUP BY doc_id
        ), feats AS (
            SELECT *,
                   n_core + n_rescued AS n_kept,
                   CAST(sx AS DOUBLE) / s0 AS cx,
                   CAST(sy AS DOUBLE) / s0 AS cy,
                   CAST(round(CAST(e_in - e_kept AS DOUBLE) * 1000000
                              / n_pixels) AS BIGINT) AS mse_micro,
                   CAST(round(CAST(e_kept AS DOUBLE) * 1000000
                              / e_in) AS BIGINT) AS energy_ppm
            FROM sums
            WHERE n_core + n_rescued >= 3
        ), ellipse AS (
            SELECT *,
                   sqrt((vxx - vyy) * (vxx - vyy) + 4 * vxy * vxy) AS rr
            FROM (
                SELECT *,
                       CAST(sxx AS DOUBLE) / s0 - cx * cx AS vxx,
                       CAST(syy AS DOUBLE) / s0 - cy * cy AS vyy,
                       CAST(sxy AS DOUBLE) / s0 - cx * cy AS vxy
                FROM feats
            )
        )
        SELECT doc_id AS media_id, n_pixels, n_core, n_rescued, n_kept,
               s0 AS size,
               ROUND(cx, 6) AS cog_x,
               ROUND(cy, 6) AS cog_y,
               ROUND(sqrt((vxx + vyy + rr) / 2), 6) AS length,
               ROUND(sqrt(GREATEST((vxx + vyy - rr) / 2, 0.0)), 6) AS width,
               ROUND(atan2(2 * vxy, vxx - vyy) / 2, 6) AS psi,
               ROUND(CAST(e_in - e_kept AS DOUBLE) / n_pixels, 6) AS mse,
               ROUND(CAST(e_kept AS DOUBLE) / e_in, 6) AS energy_ratio,
               '{{"media_id":' || doc_id || ',"n_kept":' || n_kept
                   || ',"size":' || s0
                   || ',"mse_micro":' || mse_micro
                   || ',"energy_ppm":' || energy_ppm || '}}' AS score_json
        FROM ellipse
    """,
    category=CAT,
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X63: the COMPOSED end-to-end reference pipeline as ONE query
    (VERDICT r09 missing #1 — the reference's actual CLI run chains
    load FITS → clean → Hillas features → assess → JSON score sink in
    a single pass per image; datapipe's per-algorithm entry scripts
    [UNVERIFIED-PK, SURVEY §2.12 CLI row]). Stages, all fused:

      1. FITS scan+parse   (X55's path: fits_table → fits_parse)
      2. tailcut-2D clean  (X58's rule: core ≥ {TAIL2D_HI}, boundary
                            ≥ {TAIL2D_LO} rescued by an 8-neighbor core)
      3. Hillas-2D features (X62's weighted-moment ellipse of the
                            CLEANED image: cog, length, width, psi)
      4. assess metrics    (MT9's shape against the original image:
                            MSE of the cleaned image = Σ_dropped v²/n,
                            kept-energy ratio — both exact integer
                            ratios here, no float reduction at all)
      5. JSON score sink   (MT8's score-file shape: one JSON document
                            per image, built from INTEGER fields only
                            so the string is byte-identical cross-
                            engine — no float formatting anywhere)

    Images with <3 kept pixels are dropped (no ellipse — X62's rule).

    Determinism: the kernel emits ONLY exact integer sums (counts,
    moment sums ≤ 2^48, energies ≤ 2^36); every float is evaluated
    from identical BIGINTs with the identical expression tree on both
    engines (the X62 bet: sqrt correctly-rounded, atan2 absorbed by
    round(6)); the JSON string contains integers only.

    Scale: this is the one-pass shape a 100 TB survey run wants — a
    single stateless Arrow-batched kernel per image (zero shuffles,
    one scan), then a codegen scalar pass for ellipse/score math. The
    reference runs 5 separate per-image Python stages with temp FITS
    files between them; here stage boundaries are column expressions.
    """
    import numpy as np

    from ..sources.multimodal import fits_parse, fits_table

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "n_pixels", "e_in", "n_core", "n_rescued",
            "s0", "sx", "sy", "sxx", "syy", "sxy", "e_kept",
        ]
        for pdf in batches:
            rows = {k: [] for k in cols}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                _, phys = fits_parse(bytes(p))
                v = phys.astype(np.int64)
                core = v >= TAIL2D_HI
                boundary = v >= TAIL2D_LO
                nb_core = np.zeros_like(core)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            continue
                        nb_core |= _shift2d(core, dy, dx)
                rescued = boundary & ~core & nb_core
                kept = core | rescued
                n_kept = int(kept.sum())
                if n_kept < 3:
                    continue
                h, w = v.shape
                xs = np.arange(w, dtype=np.int64)[None, :]
                ys = np.arange(h, dtype=np.int64)[:, None]
                kv = np.where(kept, v, 0)
                rows["media_id"].append(mid)
                rows["n_pixels"].append(v.size)
                rows["e_in"].append(int((v * v).sum()))
                rows["n_core"].append(int(core.sum()))
                rows["n_rescued"].append(int(rescued.sum()))
                rows["s0"].append(int(kv.sum()))
                rows["sx"].append(int((xs * kv).sum()))
                rows["sy"].append(int((ys * kv).sum()))
                rows["sxx"].append(int((xs * xs * kv).sum()))
                rows["syy"].append(int((ys * ys * kv).sum()))
                rows["sxy"].append(int((xs * ys * kv).sum()))
                rows["e_kept"].append(int((kv * kv).sum()))
            yield pd.DataFrame(rows, columns=cols)

    sums = fits_table(spark, sf_dir).mapInPandas(
        kernel,
        schema="media_id bigint, n_pixels bigint, e_in bigint, "
        "n_core bigint, n_rescued bigint, s0 bigint, sx bigint, "
        "sy bigint, sxx bigint, syy bigint, sxy bigint, e_kept bigint",
    )
    n_kept = (F.col("n_core") + F.col("n_rescued")).alias("n_kept")
    s0d = F.col("s0").cast("double")
    cx = F.col("sx").cast("double") / s0d
    cy = F.col("sy").cast("double") / s0d
    vxx = F.col("sxx").cast("double") / s0d - cx * cx
    vyy = F.col("syy").cast("double") / s0d - cy * cy
    vxy = F.col("sxy").cast("double") / s0d - cx * cy
    rr = F.sqrt((vxx - vyy) * (vxx - vyy) + 4 * vxy * vxy)
    dropped = (F.col("e_in") - F.col("e_kept")).cast("double")
    mse_micro = F.round(dropped * 1_000_000 / F.col("n_pixels")).cast("long")
    energy_ppm = F.round(
        F.col("e_kept").cast("double") * 1_000_000 / F.col("e_in")
    ).cast("long")
    return sums.select(
        "media_id",
        "n_pixels",
        "n_core",
        "n_rescued",
        n_kept,
        F.col("s0").alias("size"),
        F.round(cx, 6).alias("cog_x"),
        F.round(cy, 6).alias("cog_y"),
        F.round(F.sqrt((vxx + vyy + rr) / 2), 6).alias("length"),
        F.round(F.sqrt(F.greatest((vxx + vyy - rr) / 2, F.lit(0.0))), 6).alias(
            "width"
        ),
        F.round(F.atan2(2 * vxy, vxx - vyy) / 2, 6).alias("psi"),
        F.round(dropped / F.col("n_pixels"), 6).alias("mse"),
        F.round(F.col("e_kept").cast("double") / F.col("e_in"), 6).alias(
            "energy_ratio"
        ),
        F.concat(
            F.lit('{"media_id":'),
            F.col("media_id").cast("string"),
            F.lit(',"n_kept":'),
            (F.col("n_core") + F.col("n_rescued")).cast("string"),
            F.lit(',"size":'),
            F.col("s0").cast("string"),
            F.lit(',"mse_micro":'),
            mse_micro.cast("string"),
            F.lit(',"energy_ppm":'),
            energy_ppm.cast("string"),
            F.lit("}"),
        ).alias("score_json"),
    )


@register(
    "q_pipeline_hex",
    oracle=f"""
        WITH {_HEX_PX_CTE}, flags AS (
            SELECT doc_id, cam_r, q, r, v,
                   v >= {TAIL2D_HI} AS core,
                   v >= {TAIL2D_LO} AS boundary,
                   {_hex_nb_core_sql()} AS nb_core
            FROM px
        ), sums AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_pix,
                   CAST(SUM(v * v) AS BIGINT) AS e_in,
                   CAST(COUNT(*) FILTER (WHERE core) AS BIGINT) AS n_core,
                   CAST(COUNT(*) FILTER (WHERE boundary AND NOT core
                                           AND nb_core) AS BIGINT)
                       AS n_rescued,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN v ELSE 0 END) AS BIGINT) AS s0,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN q * v ELSE 0 END) AS BIGINT) AS sq,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN r * v ELSE 0 END) AS BIGINT) AS sr,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN q * q * v ELSE 0 END) AS BIGINT)
                       AS sqq,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN r * r * v ELSE 0 END) AS BIGINT)
                       AS srr,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN q * r * v ELSE 0 END) AS BIGINT)
                       AS sqr,
                   CAST(SUM(CASE WHEN core OR (boundary AND nb_core)
                                 THEN v * v ELSE 0 END) AS BIGINT) AS e_kept
            FROM flags
            GROUP BY doc_id
        ), feats AS (
            SELECT *,
                   n_core + n_rescued AS n_kept,
                   CAST(round(CAST(e_in - e_kept AS DOUBLE) * 1000000
                              / n_pix) AS BIGINT) AS mse_micro,
                   CAST(round(CAST(e_kept AS DOUBLE) * 1000000
                              / e_in) AS BIGINT) AS energy_ppm
            FROM sums
            WHERE n_core + n_rescued >= 3
        ), cart AS (
            SELECT *,
                   CAST(s0 AS DOUBLE) AS s0d,
                   CAST(sq AS DOUBLE) + CAST(sr AS DOUBLE) / 2 AS msx,
                   (sqrt(3) / 2) * CAST(sr AS DOUBLE) AS msy,
                   CAST(sqq AS DOUBLE) + CAST(sqr AS DOUBLE)
                       + CAST(srr AS DOUBLE) / 4 AS msxx,
                   (sqrt(3) / 2) * (CAST(sqr AS DOUBLE)
                       + CAST(srr AS DOUBLE) / 2) AS msxy,
                   0.75 * CAST(srr AS DOUBLE) AS msyy
            FROM feats
        ), ellipse AS (
            SELECT *,
                   sqrt((vxx - vyy) * (vxx - vyy) + 4 * vxy * vxy) AS rr
            FROM (
                SELECT *,
                       msxx / s0d - cx * cx AS vxx,
                       msyy / s0d - cy * cy AS vyy,
                       msxy / s0d - cx * cy AS vxy
                FROM (
                    SELECT *,
                           msx / s0d AS cx,
                           msy / s0d AS cy
                    FROM cart
                )
            )
        )
        SELECT doc_id AS media_id, n_pix, n_core, n_rescued, n_kept,
               s0 AS size,
               ROUND(cx, 6) AS cog_x,
               ROUND(cy, 6) AS cog_y,
               ROUND(sqrt((vxx + vyy + rr) / 2), 6) AS length,
               ROUND(sqrt(GREATEST((vxx + vyy - rr) / 2, 0.0)), 6) AS width,
               ROUND(atan2(2 * vxy, vxx - vyy) / 2, 6) AS psi,
               ROUND(CAST(e_in - e_kept AS DOUBLE) / n_pix, 6) AS mse,
               ROUND(CAST(e_kept AS DOUBLE) / e_in, 6) AS energy_ratio,
               '{{"media_id":' || doc_id || ',"n_kept":' || n_kept
                   || ',"size":' || s0
                   || ',"mse_micro":' || mse_micro
                   || ',"energy_ppm":' || energy_ppm || '}}' AS score_json
        FROM {_hex_ellipse_sql("feats", ("n_pix", "n_core", "n_rescued",
                                         "e_in", "e_kept", "mse_micro",
                                         "energy_ppm"))}
    """,
    category=CAT,
)
def q_pipeline_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X72: the COMPOSED reference run on the NATIVE camera geometry —
    X63's fused load→clean→Hillas→assess→JSON-score pass, but over
    hex cameras end to end (r11; the reference's CLI runs on hex
    camera data, so the truest composed-fidelity op is this one):
    HEX1 scan+parse → X68's tailcut over the broadcast adjacency →
    X71's axial integer moments + change of basis → assess
    (dropped-energy MSE, kept-energy ratio — exact integer ratios) →
    MT8-shape JSON score document built from INTEGER fields only.
    Images with <3 kept pixels are dropped.

    Determinism: the kernel emits ONLY exact integer sums (counts,
    axial moments < 2^30, energies < 2^34); every float is evaluated
    from identical BIGINTs with the identical expression tree on both
    engines (the X62/X71 bet); the JSON string contains integers
    only, so it is byte-identical cross-engine.

    Scale: one stateless Arrow kernel per image (zero shuffles, one
    scan), codegen scalar pass for basis change + ellipse + score —
    the X63 shape with the geometry table broadcast once.
    """
    import numpy as np

    from ..sources.multimodal import (
        hex_geometry_tables,
        hexcam_parse,
        hexcam_table,
    )

    bgeo = spark.sparkContext.broadcast(hex_geometry_tables())

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "n_pix", "e_in", "n_core", "n_rescued",
            "s0", "sq", "sr", "sqq", "srr", "sqr", "e_kept",
        ]
        for pdf in batches:
            rows = {k: [] for k in cols}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                R, v = hexcam_parse(bytes(p))
                nb_idx, qs, rs, _ = bgeo.value[R]
                core, rescued = tailcut_masks(v, nb_idx, TAIL2D_HI, TAIL2D_LO)
                kept = core | rescued
                if int(kept.sum()) < 3:
                    continue
                kv = np.where(kept, v, 0)
                rows["media_id"].append(mid)
                rows["n_pix"].append(len(v))
                rows["e_in"].append(int((v * v).sum()))
                rows["n_core"].append(int(core.sum()))
                rows["n_rescued"].append(int(rescued.sum()))
                rows["s0"].append(int(kv.sum()))
                rows["sq"].append(int((qs * kv).sum()))
                rows["sr"].append(int((rs * kv).sum()))
                rows["sqq"].append(int((qs * qs * kv).sum()))
                rows["srr"].append(int((rs * rs * kv).sum()))
                rows["sqr"].append(int((qs * rs * kv).sum()))
                rows["e_kept"].append(int((kv * kv).sum()))
            yield pd.DataFrame(rows, columns=cols)

    sums = hexcam_table(spark, sf_dir).mapInPandas(
        kernel,
        schema="media_id bigint, n_pix bigint, e_in bigint, "
        "n_core bigint, n_rescued bigint, s0 bigint, sq bigint, "
        "sr bigint, sqq bigint, srr bigint, sqr bigint, e_kept bigint",
    )
    e = _hex_ellipse_exprs()
    dropped = (F.col("e_in") - F.col("e_kept")).cast("double")
    mse_micro = F.round(dropped * 1_000_000 / F.col("n_pix")).cast("long")
    energy_ppm = F.round(
        F.col("e_kept").cast("double") * 1_000_000 / F.col("e_in")
    ).cast("long")
    return sums.select(
        "media_id",
        "n_pix",
        "n_core",
        "n_rescued",
        (F.col("n_core") + F.col("n_rescued")).alias("n_kept"),
        F.col("s0").alias("size"),
        e["cog_x"].alias("cog_x"),
        e["cog_y"].alias("cog_y"),
        e["length"].alias("length"),
        e["width"].alias("width"),
        e["psi"].alias("psi"),
        F.round(dropped / F.col("n_pix"), 6).alias("mse"),
        F.round(F.col("e_kept").cast("double") / F.col("e_in"), 6).alias(
            "energy_ratio"
        ),
        F.concat(
            F.lit('{"media_id":'),
            F.col("media_id").cast("string"),
            F.lit(',"n_kept":'),
            (F.col("n_core") + F.col("n_rescued")).cast("string"),
            F.lit(',"size":'),
            F.col("s0").cast("string"),
            F.lit(',"mse_micro":'),
            mse_micro.cast("string"),
            F.lit(',"energy_ppm":'),
            energy_ppm.cast("string"),
            F.lit("}"),
        ).alias("score_json"),
    )


_HILLAS_SUMS = """
        kept AS (
            SELECT doc_id, x, y, v
            FROM flags
            WHERE core OR (boundary AND nb_core)
        ), sums AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(v) AS BIGINT) AS s0,
                   CAST(SUM(x * v) AS BIGINT) AS sx,
                   CAST(SUM(y * v) AS BIGINT) AS sy,
                   CAST(SUM(x * x * v) AS BIGINT) AS sxx,
                   CAST(SUM(y * y * v) AS BIGINT) AS syy,
                   CAST(SUM(x * y * v) AS BIGINT) AS sxy
            FROM kept
            GROUP BY doc_id
        )"""


@register(
    "q_hillas_2d",
    oracle=f"""
        WITH {_PX_CTE}, flags AS (
            SELECT doc_id, x, y, v,
                   v >= {TAIL2D_HI} AS core,
                   v >= {TAIL2D_LO} AS boundary,
                   {_nb8_core_sql()} AS nb_core
            FROM px
        ),{_HILLAS_SUMS}
        SELECT doc_id AS media_id, n_kept, s0 AS size,
               ROUND(cx, 6) AS cog_x,
               ROUND(cy, 6) AS cog_y,
               ROUND(sqrt((vxx + vyy + rr) / 2), 6) AS length,
               ROUND(sqrt(GREATEST((vxx + vyy - rr) / 2, 0.0)), 6) AS width,
               ROUND(atan2(2 * vxy, vxx - vyy) / 2, 6) AS psi
        FROM (
            SELECT *,
                   sqrt((vxx - vyy) * (vxx - vyy) + 4 * vxy * vxy) AS rr
            FROM (
                SELECT doc_id, n_kept, s0, cx, cy,
                       CAST(sxx AS DOUBLE) / s0 - cx * cx AS vxx,
                       CAST(syy AS DOUBLE) / s0 - cy * cy AS vyy,
                       CAST(sxy AS DOUBLE) / s0 - cx * cy AS vxy
                FROM (
                    SELECT *,
                           CAST(sx AS DOUBLE) / s0 AS cx,
                           CAST(sy AS DOUBLE) / s0 AS cy
                    FROM sums
                )
            )
        )
        WHERE n_kept >= 3
    """,
    category=CAT,
)
def q_hillas_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X62: Hillas ellipse parameters on the TAILCUT-CLEANED 2-D image
    — the reference's core feature extraction (datapipe/image/
    hillas_parameters.py computes the weighted-moment ellipse of the
    cleaned camera image [UNVERIFIED-PK]; the Hillas parametrization
    itself is public — Hillas 1985, ICRC; X10 was the 1-D moments
    analog). Pixels kept by X58's tailcut rule (core OR rescued
    boundary) are weighted by their signal: center of gravity, then
    the covariance eigen-decomposition gives length (major axis RMS),
    width (minor), and orientation psi = atan2(2·vxy, vxx−vyy)/2.
    Images with fewer than 3 kept pixels are dropped (no ellipse).

    Determinism: the kernel outputs ONLY exact integer moment sums
    (S0, Sx, Sy, Sxx, Syy, Sxy — all BIGINT: v ≤ 4095, x,y < 64, so
    Σx²v < 2^48); every float expression is then evaluated from
    identical BIGINTs with the identical expression tree on both
    engines — sqrt is correctly rounded IEEE on both, atan2's
    last-ulp libm latitude is absorbed by round(6) (the stddev/corr
    bet class). width guards the eigenvalue's tiny-negative float
    case with GREATEST(·, 0) on both sides.

    Scale: the moments reduce INSIDE the stateless Arrow kernel (one
    output row per image, zero shuffles); the ellipse math is a
    codegen scalar pass. This is the classic cleaned-image →
    feature-vector step a 100 TB survey pipeline runs after X58/X60.
    """
    import numpy as np

    from ..sources.multimodal import fits_parse, fits_table

    def moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in ("media_id", "n_kept", "s0", "sx", "sy", "sxx", "syy", "sxy")
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                _, phys = fits_parse(bytes(p))
                v = phys.astype(np.int64)
                core = v >= TAIL2D_HI
                boundary = v >= TAIL2D_LO
                nb_core = np.zeros_like(core)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            continue
                        nb_core |= _shift2d(core, dy, dx)
                kept = core | (boundary & nb_core)
                n_kept = int(kept.sum())
                if n_kept < 3:
                    continue
                h, w = v.shape
                xs = np.arange(w, dtype=np.int64)[None, :]
                ys = np.arange(h, dtype=np.int64)[:, None]
                kv = np.where(kept, v, 0)
                rows["media_id"].append(mid)
                rows["n_kept"].append(n_kept)
                rows["s0"].append(int(kv.sum()))
                rows["sx"].append(int((xs * kv).sum()))
                rows["sy"].append(int((ys * kv).sum()))
                rows["sxx"].append(int((xs * xs * kv).sum()))
                rows["syy"].append(int((ys * ys * kv).sum()))
                rows["sxy"].append(int((xs * ys * kv).sum()))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_kept", "s0", "sx", "sy", "sxx", "syy", "sxy"],
            )

    sums = fits_table(spark, sf_dir).mapInPandas(
        moments,
        schema="media_id bigint, n_kept bigint, s0 bigint, sx bigint, "
        "sy bigint, sxx bigint, syy bigint, sxy bigint",
    )
    s0d = F.col("s0").cast("double")
    cx = F.col("sx").cast("double") / s0d
    cy = F.col("sy").cast("double") / s0d
    vxx = F.col("sxx").cast("double") / s0d - cx * cx
    vyy = F.col("syy").cast("double") / s0d - cy * cy
    vxy = F.col("sxy").cast("double") / s0d - cx * cy
    rr = F.sqrt((vxx - vyy) * (vxx - vyy) + 4 * vxy * vxy)
    return sums.select(
        "media_id",
        "n_kept",
        F.col("s0").alias("size"),
        F.round(cx, 6).alias("cog_x"),
        F.round(cy, 6).alias("cog_y"),
        F.round(F.sqrt((vxx + vyy + rr) / 2), 6).alias("length"),
        F.round(F.sqrt(F.greatest((vxx + vyy - rr) / 2, F.lit(0.0))), 6).alias(
            "width"
        ),
        F.round(F.atan2(2 * vxy, vxx - vyy) / 2, 6).alias("psi"),
    )
