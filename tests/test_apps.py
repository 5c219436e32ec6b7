"""End-to-end app smoke+convergence tests at tiny sizes: every task driver
runs, converges, and writes the reference's artifact set."""
import os

import numpy as np
import pytest

from wire_tpu.train import presets


@pytest.fixture
def tiny_preset(monkeypatch):
    """Register a tiny preset so app runs finish in seconds."""
    presets.ENTRIES["testtiny"] = dict(
        nonlin="bspline_form", scale=2.0, scale_tensor=(1.0, 4.0),
        scaled_hidden_features=32, learning_rate=1e-2, hidden_features=48,
        niters=100, maxpoints=4096, down_scale=2, added_noise=False)
    yield "testtiny"
    presets.ENTRIES.pop("testtiny", None)


@pytest.fixture
def tiny_hier_preset():
    presets.ENTRIES["testhier"] = dict(
        nonlin="bspline_mscale_hier", scale=2.0, scale_tensor=(1.0, 4.0),
        scaled_hidden_features=32, learning_rate=(1e-2, 5e-3),
        hidden_features=32, niters=60, maxpoints=4096, added_noise=False)
    yield "testhier"
    presets.ENTRIES.pop("testhier", None)


def _small_image(tmp_path, n=64):
    import matplotlib.pyplot as plt
    from wire_tpu.signals import image as I
    im = I.synthetic_image(n, n, 3, seed=0)
    p = str(tmp_path / "img.png")
    plt.imsave(p, im)
    return p


def test_denoise_app(tiny_preset, tmp_path):
    from wire_tpu.apps import denoise
    out = denoise.run(tiny_preset, image=_small_image(tmp_path),
                      results_dir=str(tmp_path / "res"))
    assert out["psnr"] > 15.0
    p = out["path"]
    for f in ("info.mat", "metrics.mat", "metrics_table.md",
              "Output_img.png"):
        assert os.path.exists(os.path.join(p, f)), f


def test_denoise_app_hier_lr_groups(tiny_hier_preset, tmp_path):
    from wire_tpu.apps import denoise
    out = denoise.run(tiny_hier_preset, image=_small_image(tmp_path),
                      results_dir=str(tmp_path / "res"))
    assert np.isfinite(out["psnr"])


def test_ct_app(tiny_preset, tmp_path):
    from wire_tpu.apps import ct
    out = ct.run(tiny_preset, image=_small_image(tmp_path),
                 results_dir=str(tmp_path / "res"), nmeas=30)
    assert out["psnr"] > 10.0
    assert 0.0 < out["ssim"] <= 1.0


def test_sisr_app(tiny_preset, tmp_path):
    from wire_tpu.apps import sisr
    out = sisr.run(tiny_preset, image=_small_image(tmp_path, 96),
                   results_dir=str(tmp_path / "res"))
    assert out["mse_db"] > 10.0
    assert os.path.exists(os.path.join(out["path"], "MSE_plot.png"))


def test_multi_sr_app(tmp_path):
    from wire_tpu.apps import multi_sr
    out = multi_sr.run("wire", results_dir=str(tmp_path / "res"),
                       scale_sr=2, niters=150, size=64,
                       hidden_features=64, omega0=7.0, sigma0=4.0)
    assert np.isfinite(out["psnr"])
    assert out["psnr"] > 12.0


def test_multi_sr_estimated_registration(tmp_path):
    from wire_tpu.apps import multi_sr
    out = multi_sr.run("gauss", results_dir=str(tmp_path / "res"),
                       scale_sr=2, niters=60, size=64, hidden_features=48,
                       use_gt_registration=False)
    assert np.isfinite(out["psnr"])


def test_sweep_denoise(tmp_path):
    # the legacy wire_*.py outer-loop counterpart: two nonlins, tiny image
    from wire_tpu.apps import sweep
    res = sweep.sweep_denoise(image=_small_image(tmp_path, 48),
                              results_dir=str(tmp_path / "res"),
                              niters=40, nonlins=["wire", "gauss"], size=48)
    assert set(res) == {"wire", "gauss"}
    for r in res.values():
        assert np.isfinite(r["Best PSNR"])
        assert r["Expected PSNR"] > 0 and "PSNR Difference" in r
    for f in ("denoise_sweep_info.mat", "denoise_sweep_metrics.mat",
              "denoise_sweep_table.md"):
        assert os.path.exists(os.path.join(tmp_path, "res", f)), f


def test_sweep_ct_cli(tmp_path):
    # exercise the argparse entry too (wire_ct.py's loop shape)
    from wire_tpu.apps import sweep
    sweep.main(["ct", "--image", _small_image(tmp_path, 32),
                "--results_dir", str(tmp_path / "res"),
                "--niters", "10", "--nonlins", "gauss"])
    assert os.path.exists(os.path.join(tmp_path, "res", "ct_sweep_table.md"))


def test_occupancy_app(tmp_path):
    # gauss converges within a smoke-test budget; wire at the reference's
    # occupancy hyperparameters (omega 20, sigma 10) needs the reference's
    # ~134K optimizer steps and is covered by the full-scale benchmark runs
    from wire_tpu.apps import occupancy
    out = occupancy.run("gauss", results_dir=str(tmp_path / "res"),
                        niters=150, size=32, maxpoints=32768)
    assert out["iou"] > 0.5, out["iou"]
    assert os.path.exists(out["mesh"])


def test_sisr_app_mesh(tiny_preset, tmp_path):
    """apps/sisr --mesh: sharded operator fit (3-channel field) matches
    the single-device run's metrics."""
    from wire_tpu.apps import sisr
    from wire_tpu.dist import make_mesh
    img = _small_image(tmp_path)
    out1 = sisr.run(tiny_preset, image=img,
                    results_dir=str(tmp_path / "res1"))
    out8 = sisr.run(tiny_preset, image=img,
                    results_dir=str(tmp_path / "res8"), mesh=make_mesh(8))
    assert abs(out8["mse_db"] - out1["mse_db"]) < 0.05
    assert abs(out8["ssim"] - out1["ssim"]) < 0.005


def test_ct_app_mesh(tiny_preset, tmp_path):
    """apps/ct --mesh: the sharded operator fit must match the
    single-device run's metrics (same deterministic trajectory)."""
    from wire_tpu.apps import ct
    from wire_tpu.dist import make_mesh
    img = _small_image(tmp_path)
    out1 = ct.run(tiny_preset, image=img,
                  results_dir=str(tmp_path / "res1"), nmeas=30)
    out8 = ct.run(tiny_preset, image=img,
                  results_dir=str(tmp_path / "res8"), nmeas=30,
                  mesh=make_mesh(8))
    assert abs(out8["psnr"] - out1["psnr"]) < 0.05
    assert abs(out8["ssim"] - out1["ssim"]) < 0.005


def test_sweep_denoise_seeds_batched():
    """The --seeds batched multi-fit surface (VERDICT r4 #6): M seeds of
    one family in one program; per-seed PSNRs finite and within the
    family's normal range on the tiny stand-in."""
    from wire_tpu.apps.sweep import sweep_denoise_seeds
    out = sweep_denoise_seeds("wire", 2, size=32, downscale=1, niters=20)
    assert len(out["psnrs"]) == 2
    assert all(np.isfinite(p) and p > 5 for p in out["psnrs"])
    assert out["recs"].shape[0] == 2


def test_sweep_operator_seeds_batched():
    """The --seeds surface for the operator tasks (fit_operator_many):
    M seeds of one family in one program for CT and SISR."""
    from wire_tpu.apps.sweep import sweep_ct_seeds, sweep_sisr_seeds
    out = sweep_ct_seeds("gauss", 2, size=32, nmeas=10, niters=15)
    assert len(out["psnrs"]) == 2
    assert all(np.isfinite(p) for p in out["psnrs"])
    assert out["recs"].shape[0] == 2
    out = sweep_sisr_seeds("gauss", 2, size=96, scale=2, niters=15)
    assert len(out["mse_db"]) == 2
    assert all(np.isfinite(p) for p in out["mse_db"])
    assert out["recs"].shape[0] == 2
