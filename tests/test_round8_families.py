"""Invariant tests for the round-8 additions (FITS ingestion, à-trous
wavelet filtering) — structural and semantic properties parity alone
doesn't state (SURVEY.md §5.2).
"""

import numpy as np

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.sources.multimodal import (
    FITS_BLOCK,
    FITS_BZERO,
    fits_parse,
    fits_table,
)

engine.load_all_operators()


def test_fits_payloads_are_standards_blocked(spark, sf_small):
    """Every generated FITS file must be 2880-blocked, start with the
    SIMPLE card, and parse back to the arithmetic raster — the
    astropy-free parser IS the hand check the format contract needs."""
    rows = fits_table(spark, sf_small).limit(20).collect()
    assert rows
    for r in rows:
        p = bytes(r.payload)
        assert len(p) % FITS_BLOCK == 0
        assert p[:8] == b"SIMPLE  "
        hdr, phys = fits_parse(p)
        doc_id = int(r.media_id)
        h, w = phys.shape
        assert int(hdr["NAXIS1"]) == w and int(hdr["NAXIS2"]) == h
        assert hdr["OBJECT"].strip("' ") == f"DOC{doc_id}"
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        want = (3 * x + 17 * y + 11 * doc_id) % 4096
        assert (phys == want).all(), f"pixel mismatch doc {doc_id}"


def test_fits_parse_rejects_malformed():
    """Structural violations raise instead of guessing."""
    import pytest

    with pytest.raises(ValueError, match="blocked"):
        fits_parse(b"SIMPLE  =                    T" + b" " * 50)
    blank = (b"X" * 80) * 36  # blocked but no END card
    with pytest.raises(ValueError):
        fits_parse(blank)


def test_fits_bzero_roundtrip():
    """The unsigned-short convention is real: stored int16 raw plus
    BZERO reproduces physical counts > 32767 would clip without it."""
    card = lambda k, v: f"{k:<8}= {v:>20}".ljust(80).encode()
    hdr = (
        card("SIMPLE", "T")
        + card("BITPIX", "16")
        + card("NAXIS", "2")
        + card("NAXIS1", "2")
        + card("NAXIS2", "1")
        + card("BZERO", str(FITS_BZERO))
        + b"END".ljust(80)
    )
    hdr += b" " * (-len(hdr) % FITS_BLOCK)
    raw = np.array([[0 - FITS_BZERO, 4095 - FITS_BZERO]], dtype=">i2").tobytes()
    raw += b"\x00" * (-len(raw) % FITS_BLOCK)
    _, phys = fits_parse(hdr + raw)
    assert phys.tolist() == [[0.0, 4095.0]]


def test_atrous_additive_reconstruction_is_lossless_unthresholded(spark, sf_small):
    """w_j = c_{j-1} - c_j telescopes: c_J + Σ w_j reproduces the
    input to float round-off even though B3-spline smoothing is not
    orthonormal — the property that makes the à-trous decomposition a
    valid filtering basis. Recomputed here in pure numpy against the
    raw embeddings (threshold 0 ⇒ nothing dropped)."""
    from data_pipeline_standalone_scripts_spark.tables import load

    emb = np.stack(
        [
            np.asarray(r.embedding, dtype=np.float64)
            for r in load(spark, sf_small, "embeddings").limit(50).collect()
        ]
    )
    n = emb.shape[1]

    def smooth(c, d):
        idx = lambda off: np.clip(np.arange(n) + off, 0, n - 1)
        return (
            (((c[:, idx(-2 * d)] + 4 * c[:, idx(-d)]) + 6 * c)
             + 4 * c[:, idx(d)])
            + c[:, idx(2 * d)]
        ) / 16

    c0 = emb
    c1 = smooth(c0, 1)
    c2 = smooth(c1, 2)
    c3 = smooth(c2, 4)
    recon = c3 + (c0 - c1) + (c1 - c2) + (c2 - c3)
    assert np.abs(recon - emb).max() < 1e-12


def test_atrous_output_invariants(spark, sf_small):
    """Energy in/out non-negative, n_zeroed within [0, 3*64], and the
    run is bit-deterministic across invocations."""
    a = sorted(map(tuple, REGISTRY["q_atrous_filter"].fn(spark, sf_small).collect()))
    b = sorted(map(tuple, REGISTRY["q_atrous_filter"].fn(spark, sf_small).collect()))
    assert a == b
    for _, _, ein, eout, nz in a:
        assert ein >= 0 and eout >= 0
        assert 0 <= nz <= 3 * 64


def test_domain_reweight_invariants(spark, sf_small):
    """Weights renormalize to ~1e6 every step (off by at most K/2
    micro from per-domain rounding), step 0 is uniform, and a domain
    with above-average loss never loses weight on the step where it
    is above average (multiplicative-weights direction)."""
    rows = REGISTRY["q_domain_reweight"].fn(spark, sf_small).collect()
    by_step = {}
    for r in rows:
        by_step.setdefault(r.step, []).append(r)
    assert set(by_step) == {0, 1, 2, 3}
    k = len(by_step[0])
    for step, rs in by_step.items():
        assert len(rs) == k
        assert abs(sum(r.weight_micro for r in rs) - 1_000_000) <= k
    w0 = {r.source: r.weight_micro for r in by_step[0]}
    assert len(set(w0.values())) == 1  # uniform start
    # direction check on step 1: loss above the UNIFORM average ⇒
    # weight did not decrease
    losses = {r.source: r.loss_micro for r in by_step[0]}
    avg = sum(losses.values()) / k
    w1 = {r.source: r.weight_micro for r in by_step[1]}
    for s_ in losses:
        if losses[s_] > avg + 1:
            assert w1[s_] >= w0[s_], (s_, losses[s_], avg)
        elif losses[s_] < avg - 1:
            assert w1[s_] <= w0[s_], (s_, losses[s_], avg)


def test_fits_roundtrip_property():
    """Hypothesis: any (w, h, bitpix, bzero, pixels) encodes to a
    2880-blocked file our parser inverts exactly — pure-Python, no
    Spark session, so the search is cheap and wide."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    dt_by_bitpix = {8: ">u1", 16: ">i2", 32: ">i4", -32: ">f4", -64: ">f8"}
    lim = {8: (0, 255), 16: (-(1 << 15), (1 << 15) - 1),
           32: (-(1 << 31), (1 << 31) - 1)}

    def card(k, v):
        return f"{k:<8}= {v:>20}".ljust(80).encode()

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 16),
        bitpix=st.sampled_from([8, 16, 32, -64]),
        bzero=st.sampled_from([0, 32768]),
        seed=st.integers(0, 2**31),
    )
    def prop(w, h, bitpix, bzero, seed):
        rng = np.random.RandomState(seed % (2**32 - 1))
        if bitpix == -64:
            raw = rng.uniform(-1e3, 1e3, size=(h, w))
        else:
            lo, hi = lim[bitpix]
            raw = rng.randint(lo, hi, size=(h, w))
        arr = raw.astype(dt_by_bitpix[bitpix])
        hdr = (
            card("SIMPLE", "T")
            + card("BITPIX", str(bitpix))
            + card("NAXIS", "2")
            + card("NAXIS1", str(w))
            + card("NAXIS2", str(h))
            + card("BZERO", str(bzero))
            + b"END".ljust(80)
        )
        hdr += b" " * (-len(hdr) % FITS_BLOCK)
        data = arr.tobytes()
        data += b"\x00" * (-len(data) % FITS_BLOCK)
        got_hdr, phys = fits_parse(hdr + data)
        assert int(got_hdr["BITPIX"]) == bitpix
        assert phys.shape == (h, w)
        want = arr.astype(np.float64) + bzero
        assert (phys == want).all()

    prop()


def test_fits_binaryfile_scan_path(spark, sf_small, tmp_path):
    """The 100 TB deployment claim, exercised: write real .fits files
    to disk, read them back through Spark's binaryFile source, decode
    with the SAME fits_parse kernel, and match the generator-path
    statistics row-for-row."""
    from pyspark.sql import functions as F

    rows = fits_table(spark, sf_small).limit(10).collect()
    for r in rows:
        (tmp_path / f"{int(r.media_id)}.fits").write_bytes(bytes(r.payload))
    scanned = (
        spark.read.format("binaryFile")
        .load(str(tmp_path) + "/*.fits")
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.fits$", 1)
            .cast("long")
            .alias("media_id"),
            F.col("content"),
        )
        .collect()
    )
    assert len(scanned) == len(rows)
    want = {
        int(r.media_id): fits_parse(bytes(r.payload))[1].sum() for r in rows
    }
    for s in scanned:
        _, phys = fits_parse(bytes(s.content))
        assert phys.sum() == want[int(s.media_id)]
