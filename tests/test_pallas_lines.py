"""Pallas line-sampler kernel (ops/pallas/line_sample.py) vs the XLA
gather/scatter fallback — the hot ops of the fourier Radon path.

Runs the kernel in interpret mode on CPU (f32 matmuls), where it must match
the dense fallback to float tolerance; the TPU accuracy budget (bf16 MXU
operands, ~1e-3 rel) is covered by the end-to-end fourier-vs-rotate test in
test_signals_ops.py and by tools/exp_radon.py measurements.
"""
import importlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wire_tpu.ops.pallas import line_sample as LS

R = importlib.import_module("wire_tpu.operators.radon")


def _positions(P, A, K, rng):
    th = np.deg2rad(np.linspace(0, 180, A, endpoint=False))
    k_idx = np.arange(K, dtype=np.float32)
    gy = k_idx[None, :] * np.sin(th)[:, None] + P // 2
    gx = k_idx[None, :] * np.cos(th)[:, None] + P // 2
    return (jnp.asarray(gy, jnp.float32), jnp.asarray(gx, jnp.float32))


@pytest.fixture(scope="module")
def planes():
    rng = np.random.RandomState(3)
    P = 256
    ph = P + LS.HALO_PAD
    fre = jnp.asarray(rng.randn(ph, ph).astype(np.float32))
    fim = jnp.asarray(rng.randn(ph, ph).astype(np.float32))
    return P, fre, fim, rng


def test_gather_matches_xla_fallback(planes):
    P, fre, fim, rng = planes
    gy, gx = _positions(P, 13, P // 2 + 1, rng)
    sre_k, sim_k = LS.sample_lines(fre, fim, gy, gx, True)
    sre_x, sim_x = LS.sample_lines_xla(fre, fim, gy, gx)
    np.testing.assert_allclose(np.asarray(sre_k), np.asarray(sre_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sim_k), np.asarray(sim_x),
                               atol=1e-5)


def test_scatter_adjoint_matches_autodiff_of_fallback(planes):
    P, fre, fim, rng = planes
    A, K = 7, P // 2 + 1
    gy, gx = _positions(P, A, K, rng)
    cot = (jnp.asarray(rng.randn(A, K).astype(np.float32)),
           jnp.asarray(rng.randn(A, K).astype(np.float32)))
    _, vjp_k = jax.vjp(lambda a, b: LS.sample_lines(a, b, gy, gx, True),
                       fre, fim)
    _, vjp_x = jax.vjp(lambda a, b: LS.sample_lines_xla(a, b, gy, gx),
                       fre, fim)
    gk = vjp_k(cot)
    gx_ = vjp_x(cot)
    for a, b in zip(gk, gx_):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fourier_radon_interpret_sampler_matches_xla():
    rng = np.random.RandomState(0)
    H = W = 48
    A = 9
    img = jnp.asarray(rng.rand(H, W).astype(np.float32))
    angles = jnp.asarray(np.linspace(0, 180, A, endpoint=False,
                                     dtype=np.float32))
    s_x = np.asarray(R._radon_fourier(img, angles, sampler="xla"))
    s_i = np.asarray(R._radon_fourier(img, angles, sampler="interpret"))
    np.testing.assert_allclose(s_i, s_x, atol=1e-4)

    def loss(im, sampler):
        return jnp.sum(R._radon_fourier(im, angles, sampler=sampler) ** 2)
    g_x = np.asarray(jax.grad(lambda im: loss(im, "xla"))(img))
    g_i = np.asarray(jax.grad(lambda im: loss(im, "interpret"))(img))
    rel = np.linalg.norm(g_i - g_x) / np.linalg.norm(g_x)
    assert rel < 1e-5, rel


def test_unaligned_angle_and_k_counts(planes):
    """A and K not multiples of the tile sizes (k padding path)."""
    P, fre, fim, rng = planes
    gy, gx = _positions(P, 5, 77, rng)
    sre_k, sim_k = LS.sample_lines(fre, fim, gy, gx, True)
    sre_x, sim_x = LS.sample_lines_xla(fre, fim, gy, gx)
    assert sre_k.shape == (5, 77)
    np.testing.assert_allclose(np.asarray(sre_k), np.asarray(sre_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sim_k), np.asarray(sim_x),
                               atol=1e-5)
