"""Pin the legacy-sweep hyperparameters to the reference scripts
(VERDICT r3: the r3 sweep ran SISR with sigma0=5/hidden=300 and the CT LR
table for siren/mfn — config drift that made the sweep deltas
uninterpretable).  These tests parse the reference scripts' own literal
tables so any future drift in either encoding is caught."""
import re

import pytest

from wire_tpu.apps import sweep

REF = "/root/reference"


def _ref_lr_table(script):
    """Extract the per-nonlin learning-rate dict literal from a reference
    script (the only {'wire': 5e-3, ...}-shaped dict each script has)."""
    with open(f"{REF}/{script}") as f:
        text = f.read()
    pat = re.compile(r"['\"](wire|siren|mfn|relu|posenc|gauss)['\"]\s*:\s*"
                     r"([0-9.e-]+)\s*,?")
    out = {}
    # scan dict-shaped regions: take the FIRST occurrence of each name
    # inside the learning-rate dict (each script defines exactly one)
    for m in pat.finditer(text):
        name, val = m.group(1), float(m.group(2))
        if name not in out:
            out[name] = val
    assert len(out) == 6, f"failed to parse LR table from {script}: {out}"
    return out


def test_denoise_lrs_match_reference():
    assert sweep._DENOISE_LR == _ref_lr_table("wire_image_denoise.py")


def test_ct_lrs_match_reference():
    assert sweep._CT_LR == _ref_lr_table("wire_ct.py")


def test_sisr_lrs_match_reference():
    assert sweep._SISR_LR == _ref_lr_table("wire_SISR.py")


def _ref_scalar(script, name):
    with open(f"{REF}/{script}") as f:
        text = f.read()
    m = re.search(rf"^\s*{name}\s*=\s*([0-9.e-]+)", text, re.M)
    assert m, f"{name} not found in {script}"
    return float(m.group(1))


def test_sisr_build_matches_reference_constants():
    """wire_SISR.py:49-56: omega0=8, sigma0=9, hidden_features=256."""
    assert _ref_scalar("wire_SISR.py", "omega0") == 8.0
    assert _ref_scalar("wire_SISR.py", "sigma0") == 9.0
    assert _ref_scalar("wire_SISR.py", "hidden_features") == 256
    m = sweep._build("wire", "sisr", 128, 128, tau=1e2)
    assert m.spec.first_omega0 == 8.0
    assert m.spec.scale == 9.0
    assert m.spec.hidden_features == 256


def test_ct_build_matches_reference_constants():
    """wire_ct.py:47-53,80-85,103: omega0=3 (siren 12), sigma0=12,
    hidden=300, posenc sidelength=nmeas."""
    assert _ref_scalar("wire_ct.py", "omega0") == 3.0
    assert _ref_scalar("wire_ct.py", "sigma0") == 12.0
    assert _ref_scalar("wire_ct.py", "hidden_features") == 300
    m = sweep._build("wire", "ct", 256, 256, tau=1e2, out_features=1)
    assert m.spec.first_omega0 == 3.0 and m.spec.scale == 12.0
    assert m.spec.hidden_features == 300
    m = sweep._build("siren", "ct", 256, 256, tau=1e2, out_features=1)
    assert m.spec.first_omega0 == 12.0
    m = sweep._build("posenc", "ct", 256, 256, tau=1e2, out_features=1,
                     posenc_sidelength=100)
    assert m.spec.sidelength == 100 and m.spec.pos_encode


def test_denoise_build_matches_reference_constants():
    """wire_image_denoise.py:41-48,86: omega0=7, sigma0=4 (wire 6),
    hidden=300."""
    m = sweep._build("gauss", "denoise", 256, 256, tau=3e1)
    assert m.spec.first_omega0 == 7.0 and m.spec.scale == 4.0
    assert m.spec.hidden_features == 300
    m = sweep._build("wire", "denoise", 256, 256, tau=3e1)
    assert m.spec.scale == 6.0
    # posenc sidelength = max(H,W)/3 when tau < 100
    m = sweep._build("posenc", "denoise", 256, 384, tau=3e1)
    assert m.spec.sidelength == 128
