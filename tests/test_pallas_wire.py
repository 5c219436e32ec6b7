"""Fused Pallas WIRE kernel vs the jnp reference path (interpret mode on
CPU): forward, parameter gradients, coordinate gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wire_tpu.nn import get_inr
from wire_tpu.ops.pallas.wire_mlp import wire_mlp_fused


@pytest.mark.parametrize("n,h,layers,out", [(600, 45, 2, 3), (512, 64, 1, 1),
                                            (100, 212, 2, 3)])
def test_fused_forward_matches_jnp(n, h, layers, out):
    model = get_inr("wire", in_features=2, out_features=out,
                    hidden_features=int(h * np.sqrt(2)) + 1,
                    hidden_layers=layers, first_omega0=7.0,
                    hidden_omega0=7.0, scale=4.0)
    assert model.spec is not None
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    ref = model.apply(params, coords)
    fused = wire_mlp_fused(params, coords, model.spec, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=5e-6)


def test_fused_grads_match_jnp():
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=64, hidden_layers=2, first_omega0=7.0,
                    hidden_omega0=7.0, scale=4.0)
    params = model.init(jax.random.key(1))
    rng = np.random.default_rng(1)
    coords = jnp.asarray(rng.uniform(-1, 1, (700, 2)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (700, 3)).astype(np.float32))

    def loss_ref(p, c):
        return jnp.mean((model.apply(p, c) - target) ** 2)

    def loss_fused(p, c):
        return jnp.mean((wire_mlp_fused(p, c, model.spec, interpret=True)
                         - target) ** 2)

    (gr_p, gr_c) = jax.grad(loss_ref, argnums=(0, 1))(params, coords)
    (gf_p, gf_c) = jax.grad(loss_fused, argnums=(0, 1))(params, coords)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(gr_p)[0][0:99],
                   key=str),
            sorted(jax.tree_util.tree_flatten_with_path(gf_p)[0][0:99],
                   key=str)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-6, err_msg=str(ka))
    np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gr_c),
                               rtol=1e-4, atol=1e-6)


def test_gemm_precision_highest_matches_jnp():
    """gemm_precision='highest' (true f32 multi-pass matmuls) matches the
    jnp reference path tightly, forward and gradient; the plumbing is the
    same one that selects the MXU default path on TPU."""
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=64, hidden_layers=2, first_omega0=7.0,
                    hidden_omega0=7.0, scale=4.0)
    params = model.init(jax.random.key(3))
    rng = np.random.default_rng(3)
    coords = jnp.asarray(rng.uniform(-1, 1, (600, 2)).astype(np.float32))
    ref = model.apply(params, coords)
    spec_hi = model.spec.replace(gemm_precision="highest")
    fused = wire_mlp_fused(params, coords, spec_hi, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=5e-6)

    target = jnp.asarray(rng.uniform(0, 1, (600, 3)).astype(np.float32))

    def loss_hi(p):
        return jnp.mean((wire_mlp_fused(p, coords, spec_hi, interpret=True)
                         - target) ** 2)

    def loss_ref(p):
        return jnp.mean((model.apply(p, coords) - target) ** 2)

    g_hi = jax.grad(loss_hi)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_hi)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)


def test_fused_handles_unaligned_batch():
    model = get_inr("wire", in_features=3, out_features=1,
                    hidden_features=40, hidden_layers=2, first_omega0=5.0,
                    hidden_omega0=5.0, scale=3.0)
    params = model.init(jax.random.key(2))
    rng = np.random.default_rng(2)
    coords = jnp.asarray(rng.uniform(-1, 1, (777, 3)).astype(np.float32))
    ref = model.apply(params, coords)
    fused = wire_mlp_fused(params, coords, model.spec, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=5e-6)


def test_fast_sincos_accuracy():
    """fast_sincos (shared Cody-Waite pi/2 reduction + cephes minimax
    polys) must match numpy float64 sin/cos to f32 rounding over the
    whole Gabor-phase range — every kernel family consumes it (r4)."""
    from wire_tpu.ops.pallas.wire_mlp import fast_sincos
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.uniform(-8000, 8000, 100000),
        rng.uniform(-4, 4, 10000),
        np.array([0.0, np.pi / 2, -np.pi / 2, np.pi, 1e-20, -0.0]),
    ]).astype(np.float32)
    s, c = fast_sincos(jnp.asarray(x))
    x64 = x.astype(np.float64)
    assert np.abs(np.asarray(s) - np.sin(x64)).max() < 2e-7
    assert np.abs(np.asarray(c) - np.cos(x64)).max() < 2e-7


@pytest.mark.parametrize("n", [256, 512, 513])
def test_fused_vjp_tile_boundaries(n):
    """The r4 pipelined backward runs a phantom step at each end of the
    grid (step 0 consumes zeroed scratch against a REAL clamped g block;
    the final step refetches the last tile).  Pin grads at single-tile,
    exactly-one-tile, and one-row-over sizes against autodiff of the jnp
    path."""
    model = get_inr("wire", in_features=2, out_features=2,
                    hidden_features=48, hidden_layers=1, first_omega0=5.0,
                    hidden_omega0=5.0, scale=3.0)
    params = model.init(jax.random.key(2))
    rng = np.random.default_rng(2)
    coords = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))

    def loss_ref(p):
        return jnp.mean((model.apply(p, coords) - tgt) ** 2)

    def loss_fused(p):
        return jnp.mean((wire_mlp_fused(p, coords, model.spec,
                                        interpret=True) - tgt) ** 2)

    gr = jax.grad(loss_ref)(params)
    gf = jax.grad(loss_fused)(params)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(gr)[0], key=str),
            sorted(jax.tree_util.tree_flatten_with_path(gf)[0], key=str)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6, err_msg=str(ka))
