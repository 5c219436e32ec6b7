"""Checkpointing (npz + orbax), profiling counters, scaling harness."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wire_tpu.nn import get_inr
from wire_tpu.train import artifacts as A


def _params():
    model = get_inr("bspline_mscale_hier", in_features=2, out_features=1,
                    hidden_features=16, hidden_layers=2, scale=2.0,
                    scale_tensor=(1.0, 4.0))
    return model, model.init(jax.random.key(0))


def test_npz_checkpoint_roundtrip(tmp_path):
    model, params = _params()
    p = str(tmp_path / "ckpt.npz")
    A.save_params(p, params)
    restored = A.load_params(p, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_checkpoint_roundtrip(tmp_path):
    model, params = _params()
    p = str(tmp_path / "orbax_ckpt")
    A.save_checkpoint_orbax(p, params)
    restored = A.load_checkpoint_orbax(p, like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_make_unique(tmp_path):
    name = A.make_unique("run", str(tmp_path))
    assert name == "run_1"
    os.makedirs(tmp_path / "run_1")
    assert A.make_unique("run", str(tmp_path)) == "run_2"
    assert A.make_unique("run_7", str(tmp_path)) == "run_8"


def test_throughput_counter():
    from wire_tpu.train.profiling import Throughput
    t = Throughput()
    t.add(1000)
    assert t.coords_per_s > 0


def test_scaling_harness_runs():
    from wire_tpu.dist.scaling import efficiency_table, measure_scaling
    from wire_tpu.signals import coords as C, image as I
    from wire_tpu.train.trainer import FitConfig
    H = W = 16
    im = I.synthetic_image(H, W, 3, seed=0)
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=32, hidden_layers=1, first_omega0=7.0,
                    hidden_omega0=7.0, scale=4.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=3, maxpoints=H * W)
    res = measure_scaling(model, params, C.grid2d(H, W), im.reshape(-1, 3),
                          cfg, device_counts=[1, 4], repeats=1)
    rows = efficiency_table(res)
    assert len(rows) == 2 and all(r[1] > 0 for r in rows)
