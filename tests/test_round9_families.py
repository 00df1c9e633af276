"""Invariant tests for the round-9 additions — the TRUE 2-D raster
cleaning family (tailcut / connected-components / à-trous over real
FITS rasters), the FITS write side, the cleaner-assessment battery,
and the configurable DP seed — structural and semantic properties
parity alone doesn't state (SURVEY.md §5.2).
"""

import numpy as np
import pytest

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.operators.raster2d import (
    ATROUS2D_T,
    CC2D_T,
    TAIL2D_HI,
    TAIL2D_LO,
    _b3_smooth2d,
)
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.sources.multimodal import (
    _fits_card_value,
    fits_encode,
    fits_parse,
    fits_table,
)

engine.load_all_operators()


def _raster(doc_id: int, n_chars: int) -> np.ndarray:
    w = 32 + n_chars % 32
    h = 24 + doc_id % 24
    return (
        3 * np.arange(w, dtype=np.int64)[None, :]
        + 17 * np.arange(h, dtype=np.int64)[:, None]
        + 11 * doc_id
    ) % 4096


# --- FITS card-value parsing (ADVICE r08 #3) -------------------------------


def test_fits_card_value_quoted_string_with_slash():
    """A quoted string containing ' / ' must survive intact — the old
    split-first parser truncated it."""
    assert _fits_card_value("'NGC 1275 / A426'   / object name") == "'NGC 1275 / A426'"
    assert _fits_card_value("          'DOC123'") == "'DOC123'"
    # escaped quote inside the string, then a comment
    assert _fits_card_value("'O''NEILL / B'      / observer") == "'O''NEILL / B'"
    # non-string values split at the first '/', not just ' / '
    assert _fits_card_value("               32768/ unsigned") == "32768"
    assert _fits_card_value("                   T / conforms") == "T"


def test_fits_parse_honors_quoted_object_card():
    card = lambda k, v: f"{k:<8}= {v:>20}".ljust(80).encode()  # noqa: E731
    hdr_bytes = (
        card("SIMPLE", "T")
        + card("BITPIX", "8")
        + card("NAXIS", "1")
        + card("NAXIS1", "2")
        + f"{'OBJECT':<8}= 'A / B''C'           / tricky".ljust(80).encode()
        + b"END".ljust(80)
    )
    hdr_bytes += b" " * (-len(hdr_bytes) % 2880)
    payload = hdr_bytes + bytes([7, 9]) + b"\x00" * 2878
    hdr, arr = fits_parse(payload)
    assert hdr["OBJECT"] == "'A / B''C'"
    assert arr.tolist() == [7.0, 9.0]


# --- FITS write side (X61) --------------------------------------------------


def test_fits_encode_roundtrip(spark, sf_small):
    """parse -> encode -> parse is the identity on header fields and
    physical pixels, and the re-encoded file is standards-blocked."""
    rows = fits_table(spark, sf_small).limit(8).collect()
    assert rows
    for r in rows:
        p = bytes(r.payload)
        hdr, phys = fits_parse(p)
        p2 = fits_encode(hdr, phys)
        assert len(p2) % 2880 == 0
        assert len(p2) == len(p)
        hdr2, phys2 = fits_parse(p2)
        assert hdr2 == hdr
        assert np.array_equal(phys2, phys)


def test_fits_roundtrip_op_all_green(spark, sf_small):
    out = REGISTRY["q_fits_roundtrip"].fn(spark, sf_small).collect()
    assert len(out) > 0
    for r in out:
        assert r.header_equal == 1 and r.pixels_equal == 1
        assert r.n_bytes_in == r.n_bytes_out


# --- 2-D tailcut (X58) ------------------------------------------------------


def _naive_tailcut(v: np.ndarray):
    h, w = v.shape
    n_core = n_rescued = kept_sum = 0
    for y in range(h):
        for x in range(w):
            core = v[y, x] >= TAIL2D_HI
            nb = any(
                0 <= y + dy < h and 0 <= x + dx < w and v[y + dy, x + dx] >= TAIL2D_HI
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
                if (dy, dx) != (0, 0)
            )
            rescued = (not core) and v[y, x] >= TAIL2D_LO and nb
            if core:
                n_core += 1
            if rescued:
                n_rescued += 1
            if core or rescued:
                kept_sum += int(v[y, x])
    return n_core, n_rescued, kept_sum


def test_tailcut_2d_matches_naive(spark, sf_small):
    got = {
        r.media_id: r
        for r in REGISTRY["q_tailcut_2d"].fn(spark, sf_small).collect()
    }
    assert len(got) == 500
    for mid in sorted(got)[:5]:
        r = got[mid]
        v = _raster(mid, _NCHARS[mid])
        n_core, n_rescued, kept_sum = _naive_tailcut(v)
        assert (r.n_core, r.n_rescued, r.kept_sum) == (n_core, n_rescued, kept_sum)
        assert r.n_kept == n_core + n_rescued


# --- 2-D connected components (X59) ----------------------------------------


def _naive_cc(v: np.ndarray):
    """4-connected flood fill, deliberately a DIFFERENT algorithm from
    the operator's run-grain union-find."""
    h, w = v.shape
    mask = v >= CC2D_T
    seen = np.zeros_like(mask)
    islands = []
    for y in range(h):
        for x in range(w):
            if mask[y, x] and not seen[y, x]:
                stack, px = [(y, x)], []
                seen[y, x] = True
                while stack:
                    cy, cx = stack.pop()
                    px.append((cy, cx))
                    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                        ny, nx = cy + dy, cx + dx
                        if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and not seen[ny, nx]:
                            seen[ny, nx] = True
                            stack.append((ny, nx))
                islands.append(
                    (
                        len(px),
                        int(sum(v[p] for p in px)),
                        min(p[0] * 64 + p[1] for p in px),
                    )
                )
    islands.sort(key=lambda s: (-s[1], s[2]))
    return islands


def test_connected_2d_matches_flood_fill(spark, sf_small):
    got = {
        r.media_id: r
        for r in REGISTRY["q_connected_2d"].fn(spark, sf_small).collect()
    }
    assert got
    for mid in sorted(got)[:5]:
        r = got[mid]
        islands = _naive_cc(_raster(mid, _NCHARS[mid]))
        assert r.n_islands == len(islands)
        assert r.n_isolated == sum(1 for s in islands if s[0] == 1)
        assert r.n_above == sum(s[0] for s in islands)
        assert (r.kept_size, r.kept_sum) == (islands[0][0], islands[0][1])


# --- 2-D à-trous (X60) ------------------------------------------------------


def _naive_b3_2d(c: np.ndarray, d: int) -> np.ndarray:
    """Explicit-loop separable B3 pass — the slow reference the
    vectorized kernel must match BIT-FOR-BIT (dyadic exactness)."""
    h, w = c.shape
    taps = [(-2, 1.0), (-1, 4.0), (0, 6.0), (1, 4.0), (2, 1.0)]
    hp = np.zeros_like(c)
    for y in range(h):
        for x in range(w):
            acc = 0.0
            for k, t in taps:
                acc += t * c[y, min(max(x + k * d, 0), w - 1)]
            hp[y, x] = acc / 16
    out = np.zeros_like(c)
    for y in range(h):
        for x in range(w):
            acc = 0.0
            for k, t in taps:
                acc += t * hp[min(max(y + k * d, 0), h - 1), x]
            out[y, x] = acc / 16
    return out


def test_b3_smooth2d_matches_loops():
    v = _raster(7, 13).astype(np.float64)
    for d in (1, 2, 4):
        assert np.array_equal(_b3_smooth2d(v, d), _naive_b3_2d(v, d))


def test_atrous_2d_semantics(spark, sf_small):
    rows = REGISTRY["q_atrous_2d"].fn(spark, sf_small).collect()
    assert len(rows) == 500
    for r in rows[:20]:
        # energy_in is the exact integer Σv² of the arithmetic raster
        assert r.energy_in > 0 and r.n_pixels >= 32 * 24
        assert 0 <= r.n_zeroed <= 3 * r.n_pixels
        assert r.energy_ratio == pytest.approx(
            r.energy_out / r.energy_in, abs=1e-6
        )
    # the B3 kernel reproduces the locally-linear ramp exactly, so most
    # coefficients are zeroed (details are exactly 0 away from seams)
    mean_zeroed = sum(r.n_zeroed / (3 * r.n_pixels) for r in rows) / len(rows)
    assert mean_zeroed > 0.5


# --- Hillas ellipse on the cleaned image (X62) -------------------------------


def test_hillas_2d_matches_naive(spark, sf_small):
    import math

    got = {
        r.media_id: r for r in REGISTRY["q_hillas_2d"].fn(spark, sf_small).collect()
    }
    assert got
    checked = 0
    for mid in sorted(got):
        if checked >= 5:
            break
        r = got[mid]
        v = _raster(mid, _NCHARS[mid])
        h, w = v.shape
        # naive kept-set + scalar moment loop (different code path)
        pts = []
        for y in range(h):
            for x in range(w):
                core = v[y, x] >= TAIL2D_HI
                nb = any(
                    0 <= y + dy < h
                    and 0 <= x + dx < w
                    and v[y + dy, x + dx] >= TAIL2D_HI
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                    if (dy, dx) != (0, 0)
                )
                if core or (v[y, x] >= TAIL2D_LO and nb):
                    pts.append((x, y, int(v[y, x])))
        assert len(pts) >= 3
        s0 = sum(p[2] for p in pts)
        cx = sum(p[0] * p[2] for p in pts) / s0
        cy = sum(p[1] * p[2] for p in pts) / s0
        vxx = sum(p[0] * p[0] * p[2] for p in pts) / s0 - cx * cx
        vyy = sum(p[1] * p[1] * p[2] for p in pts) / s0 - cy * cy
        vxy = sum(p[0] * p[1] * p[2] for p in pts) / s0 - cx * cy
        rr = math.sqrt((vxx - vyy) ** 2 + 4 * vxy * vxy)
        assert r.n_kept == len(pts) and r.size == s0
        assert r.cog_x == pytest.approx(cx, abs=1e-6)
        assert r.cog_y == pytest.approx(cy, abs=1e-6)
        assert r.length == pytest.approx(math.sqrt((vxx + vyy + rr) / 2), abs=1e-6)
        assert r.width == pytest.approx(
            math.sqrt(max((vxx + vyy - rr) / 2, 0.0)), abs=1e-6
        )
        assert r.psi == pytest.approx(math.atan2(2 * vxy, vxx - vyy) / 2, abs=1e-6)
        assert r.length >= r.width >= 0
        checked += 1
    assert checked == 5


# --- cleaner assessment (MT9) -----------------------------------------------


def test_cleaner_assess_shape(spark, sf_small):
    rows = sorted(
        REGISTRY["q_cleaner_assess"].fn(spark, sf_small).collect(),
        key=lambda r: r.cleaner,
    )
    assert [r.cleaner for r in rows] == ["atrous", "atrous_ksigma", "haar"]
    assert sorted(r.rnk for r in rows) == [1, 2, 3]
    for r in rows:
        assert r.mean_mse >= 0 and r.mean_nrmse >= 0 and r.mean_energy_err >= 0
    # the rank follows the MSE ordering
    best = min(rows, key=lambda r: (r.mean_mse, r.cleaner))
    assert best.rnk == 1


# --- DP seed from conf (VERDICT r08 #6) -------------------------------------


def test_dp_counts_seed_injection(spark, sf_small):
    from data_pipeline_standalone_scripts_spark.operators.textclean import (
        DP_SEED_CONF,
    )

    fn = REGISTRY["q_dp_counts"].fn
    base = {(r.event_type, r.day): r.noisy_n for r in fn(spark, sf_small).collect()}
    try:
        spark.conf.set(DP_SEED_CONF, "a-secret-release-seed")
        secret = {
            (r.event_type, r.day): r.noisy_n for r in fn(spark, sf_small).collect()
        }
        # same seed again -> reproducible
        secret2 = {
            (r.event_type, r.day): r.noisy_n for r in fn(spark, sf_small).collect()
        }
    finally:
        spark.conf.unset(DP_SEED_CONF)
    assert set(base) == set(secret)
    assert secret == secret2
    assert any(base[k] != secret[k] for k in base), "seed must change the noise"
    base2 = {(r.event_type, r.day): r.noisy_n for r in fn(spark, sf_small).collect()}
    assert base2 == base


# --- shared fixture: doc_id -> n_chars map ----------------------------------


@pytest.fixture(scope="module", autouse=True)
def _load_nchars(spark, sf_small):
    global _NCHARS
    from data_pipeline_standalone_scripts_spark.tables import load

    _NCHARS = {
        r.doc_id: r.n_chars
        for r in load(spark, sf_small, "documents").select("doc_id", "n_chars").collect()
    }
    yield
