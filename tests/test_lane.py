"""TPU lane-efficiency guidance (VERDICT r3 #6): waste computation,
lane-native snapping, the get_inr warning, and the named presets."""
import numpy as np
import pytest

from wire_tpu.nn import registry as R
from wire_tpu.nn import get_inr


def test_hidden_gemm_width_rules():
    assert R.hidden_gemm_width("wire", 300) == 212    # int(300/sqrt 2)
    assert R.hidden_gemm_width("wire2d", 300) == 150  # wire2d.py:92
    assert R.hidden_gemm_width("siren", 300) == 300
    assert R.hidden_gemm_width("mfn", 256) == 256


def test_lane_waste_values():
    # wire2d hf=300: h=150 pads to 256 lanes -> 1-(150/256)^2 ~ 65.7%
    assert R.lane_waste("wire2d", 300) == pytest.approx(0.6566, abs=1e-3)
    # wire hf=300: h=212 pads to 256 -> 31.4%
    assert R.lane_waste("wire", 300) == pytest.approx(0.3142, abs=1e-3)
    # lane-native configs waste nothing
    assert R.lane_waste("wire", 363) == 0.0
    assert R.lane_waste("wire2d", 256) == 0.0
    assert R.lane_waste("siren", 384) == 0.0


def test_lane_native_hidden_snap():
    # the measured presets (PERF.md): wire 300 -> 363 (h=256),
    # wire2d 300 -> 512 (h=256, upward snap), siren 300 -> 384
    assert R.lane_native_hidden("wire", 300) == 363
    assert R.lane_native_hidden("wire2d", 300) == 512
    assert R.lane_native_hidden("siren", 300) == 384
    # already lane-exact: unchanged
    assert R.lane_native_hidden("wire", 363) == 363
    assert R.lane_native_hidden("wire2d", 256) == 256


def test_lane_native_presets_are_lane_exact():
    for nonlin, kw in R.LANE_NATIVE.items():
        assert R.lane_waste(nonlin, kw["hidden_features"]) == 0.0


def test_get_inr_lane_native_kwarg():
    m = get_inr("wire", in_features=2, out_features=3, hidden_features=300,
                hidden_layers=2, first_omega0=7.0, hidden_omega0=7.0,
                scale=6.0, lane_native=True)
    assert m.spec.hidden_features == 363
    m = get_inr("wire2d", in_features=2, out_features=3,
                hidden_features=256, hidden_layers=2, first_omega0=7.0,
                hidden_omega0=7.0, scale=6.0, lane_native=True)
    assert m.spec.hidden_features == 256  # already exact


def test_lane_warning_emitted_once(capsys, monkeypatch):
    monkeypatch.delenv("WIRE_TPU_NO_LANE_WARN", raising=False)
    R._WARNED_LANE.discard(("wire2d", 300))
    get_inr("wire2d", in_features=2, out_features=3, hidden_features=300,
            hidden_layers=1, first_omega0=7.0, hidden_omega0=7.0, scale=6.0)
    out = capsys.readouterr().out
    assert "lane padding" in out and "512" in out
    get_inr("wire2d", in_features=2, out_features=3, hidden_features=300,
            hidden_layers=1, first_omega0=7.0, hidden_omega0=7.0, scale=6.0)
    assert "lane padding" not in capsys.readouterr().out  # once per config


def test_lane_warning_skips_tiny_models(capsys):
    R._WARNED_LANE.clear()
    get_inr("wire", in_features=2, out_features=3, hidden_features=32,
            hidden_layers=1, first_omega0=7.0, hidden_omega0=7.0, scale=6.0)
    assert "lane padding" not in capsys.readouterr().out
