"""rotate_project kernel (ops/pallas/rotsum.py): exact-f32 parity with the
reference-semantics rotate-then-sum operator, forward and adjoint, in
interpret mode on CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wire_tpu.ops.resample import rotate
from wire_tpu.ops.pallas.rotsum import rotate_project


def _rotsum_oracle(img, angles):
    img = jnp.asarray(img)
    return jax.vmap(lambda a: jnp.sum(rotate(img, a), axis=0))(
        jnp.asarray(angles))


@pytest.mark.parametrize("S", [32, 96, 256])
def test_forward_matches_rotate(S):
    rng = np.random.RandomState(0)
    img = rng.rand(S, S).astype(np.float32)
    angles = np.array([0.0, 7.3, 44.9, 45.1, 90.0, 121.7, 180.0, -13.4],
                      np.float32)
    ref = np.asarray(_rotsum_oracle(img, angles))
    out = np.asarray(rotate_project(jnp.asarray(img), angles,
                                    interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5 * S)


def test_rot90_is_lattice_exact():
    # the pre-rotation identity the kernel relies on
    img = np.random.RandomState(1).rand(64, 64).astype(np.float32)
    for k in range(4):
        np.testing.assert_allclose(np.asarray(rotate(img, 90.0 * k)),
                                   np.rot90(img, k), atol=1e-5)


def test_adjoint_matches_vjp():
    S = 64
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(S, S).astype(np.float32))
    angles = np.array([3.0, 50.0, 90.0, 170.0], np.float32)
    cot = jnp.asarray(rng.rand(len(angles), S).astype(np.float32))

    _, vjp_k = jax.vjp(lambda im: rotate_project(im, angles, True), img)
    _, vjp_o = jax.vjp(lambda im: _rotsum_oracle(im, angles), img)
    gk = np.asarray(vjp_k(cot)[0])
    go = np.asarray(vjp_o(cot)[0])
    np.testing.assert_allclose(gk, go, rtol=2e-5, atol=2e-4)


def test_angle_grad_raises_loudly():
    """Differentiating (or jit-tracing) through the ANGLE argument must be a
    loud error, not a silent zero cotangent (VERDICT r4 #4); rotate_xla is
    the angle-differentiable path."""
    from wire_tpu.operators.radon import radon
    S = 32
    img = jnp.asarray(np.random.RandomState(4).rand(S, S).astype(np.float32))
    angles = jnp.asarray([10.0, 40.0], dtype=jnp.float32)
    with pytest.raises(ValueError, match="rotate_xla"):
        jax.grad(lambda a: rotate_project(img, a, True).sum())(angles)
    with pytest.raises(ValueError, match="rotate_xla"):
        jax.jit(lambda a: rotate_project(img, a, True))(angles)
    # concrete angles still work under jit/grad w.r.t. the image ...
    out = jax.jit(lambda im: rotate_project(im, angles, True))(img)
    assert out.shape == (2, S)
    g = jax.grad(lambda im: rotate_project(im, angles, True).sum())(img)
    assert np.isfinite(np.asarray(g)).all()
    # ... and the XLA oracle path differentiates through angles for real
    ga = jax.grad(lambda a: radon(img, a, method="rotate_xla").sum())(angles)
    assert np.asarray(jnp.abs(ga)).max() > 0


def test_dot_product_adjoint_identity():
    # <A x, y> == <x, A^T y> ties fwd and bwd kernels to each other
    S = 48
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(S, S).astype(np.float32))
    angles = np.array([-30.0, 12.0, 88.0], np.float32)
    y = jnp.asarray(rng.rand(len(angles), S).astype(np.float32))
    ax = rotate_project(x, angles, True)
    _, vjp = jax.vjp(lambda im: rotate_project(im, angles, True), x)
    aty = vjp(y)[0]
    lhs = float(jnp.vdot(ax, y))
    rhs = float(jnp.vdot(x, aty))
    assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0)
