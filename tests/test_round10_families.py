"""Invariant tests for the round-10 additions — the composed
end-to-end reference pipeline (FITS → tailcut → Hillas → assess →
score sink), the SAES / differential-evolution specific sweeps, the
at-scale fallback guards (minhash verify join, BPE coalesce), and the
ADVICE r09 hardening of fits_encode — structural and semantic
properties parity alone doesn't state (SURVEY.md §5.2).
"""

import numpy as np
import pytest

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.sources.multimodal import (
    fits_encode,
    fits_parse,
)

engine.load_all_operators()

SF = "/root/testdata/sf0.001"


# --- fits_encode hardening (ADVICE r09 #2) ----------------------------------


def _mk_hdr(w: int = 4, h: int = 3) -> dict:
    return {
        "SIMPLE": "T",
        "BITPIX": "16",
        "NAXIS": "2",
        "NAXIS1": str(w),
        "NAXIS2": str(h),
        "BZERO": "32768",
        "BSCALE": "1",
        "OBJECT": "'DOC1'",
    }


def test_fits_encode_rejects_overlong_card():
    """A value that formats past 80 chars must raise, not silently
    truncate (the old .ljust(80)[:80] corrupted it)."""
    hdr = _mk_hdr()
    hdr["OBJECT"] = "'" + "X" * 75 + "'"  # 8+2+77 > 80
    phys = np.zeros((3, 4))
    with pytest.raises(ValueError, match="card"):
        fits_encode(hdr, phys)


def test_fits_encode_left_justifies_quoted_strings():
    """FITS fixed-format: a character string opens with its quote at
    column 11 (index 10), left-justified — not right-justified to
    column 30."""
    hdr = _mk_hdr()
    payload = fits_encode(hdr, np.zeros((3, 4)))
    cards = [payload[i : i + 80].decode("ascii") for i in range(0, 2880, 80)]
    obj = next(c for c in cards if c.startswith("OBJECT"))
    assert obj[10] == "'", obj  # quote at column 11
    # and non-string values still right-justify to column 30
    bp = next(c for c in cards if c.startswith("BITPIX"))
    assert bp[:30].endswith("16") and bp[10] == " ", bp


def test_fits_encode_roundtrip_after_justify_change():
    """parse∘encode∘parse stays the identity on header fields and
    physical pixels after the justification change."""
    hdr = _mk_hdr()
    phys = (np.arange(12, dtype=np.float64)).reshape(3, 4)
    p = fits_encode(hdr, phys)
    hdr2, phys2 = fits_parse(p)
    assert hdr2 == hdr
    assert np.array_equal(phys, phys2)
