"""One-pass fused wire2d train-step kernel (ops/pallas/wire2d_step.py) vs
autodiff of the jnp wire2d path, interpret mode on CPU (VERDICT r2 #6)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wire_tpu.nn import get_inr
from wire_tpu.ops.pallas.wire2d_step import wire2d_step_fused


def _setup(n=700, hf=128, layers=2, out=3, seed=0):
    model = get_inr("wire2d", in_features=2, out_features=out,
                    hidden_features=hf, hidden_layers=layers,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    params = model.init(jax.random.key(seed))
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (n, out)).astype(np.float32))
    return model, params, coords, target


def _ref_step(model, params, coords, target, nvalid=None, denom=None):
    from wire_tpu.nn.models import wire2d_apply
    spec = dataclasses.replace(model.spec, fused="never")
    n, c = target.shape
    dn = float(n * c) if denom is None else denom

    def loss_fn(p):
        pred = wire2d_apply(p, coords, spec)
        err = pred - target
        if nvalid is not None:
            err = err * (jnp.arange(n)[:, None] < nvalid)
        return jnp.sum(err * err) / dn, pred

    (_, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return pred, grads


def _assert_tree_close(got, want, rtol=2e-4, atol=1e-6):
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(want)[0], key=str),
            sorted(jax.tree_util.tree_flatten_with_path(got)[0], key=str)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=rtol,
                                   atol=atol, err_msg=str(ka))


@pytest.mark.parametrize("n,hf,layers,out",
                         [(700, 128, 2, 3), (512, 128, 1, 1),
                          (100, 300, 2, 3)])
def test_wire2d_step_matches_autodiff(n, hf, layers, out):
    model, params, coords, target = _setup(n, hf, layers, out)
    pred_ref, g_ref = _ref_step(model, params, coords, target)
    pred, g = wire2d_step_fused(params, coords, target, model.spec,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_ref),
                               rtol=2e-4, atol=1e-5)
    _assert_tree_close(g, g_ref)


def test_wire2d_step_masks_tail_sentinels():
    model, params, coords, target = _setup(600, 128, 2, 3)
    nvalid, denom = 450, 450 * 3.0
    pred_ref, g_ref = _ref_step(model, params, coords, target,
                                nvalid=nvalid, denom=denom)
    pred, g = wire2d_step_fused(params, coords, target, model.spec,
                                nvalid=nvalid, denom=denom, interpret=True)
    _assert_tree_close(g, g_ref)


def test_wire2d_step_metric_sums():
    model, params, coords, target = _setup(300, 128, 1, 3)
    gt = target + 0.25
    pred, g, (sse_t, sse_g) = wire2d_step_fused(
        params, coords, target, model.spec, gt=gt, want_metrics=True,
        interpret=True)
    pred = np.asarray(pred)
    np.testing.assert_allclose(float(sse_t),
                               np.sum((pred - np.asarray(target)) ** 2),
                               rtol=1e-4)
    np.testing.assert_allclose(float(sse_g),
                               np.sum((pred - np.asarray(gt)) ** 2),
                               rtol=1e-4)


def test_wire2d_trains_through_step_grads():
    """The registry dispatch: fused='always' routes wire2d training through
    the step kernel (interpret on CPU) and the fit converges."""
    from wire_tpu.signals import coords as C, image as I
    from wire_tpu.train.trainer import FitConfig, fit_pointwise
    H = W = 24
    im = I.synthetic_image(H, W, 3, seed=0)
    model = get_inr("wire2d", in_features=2, out_features=3,
                    hidden_features=64, hidden_layers=1, first_omega0=5.0,
                    hidden_omega0=5.0, scale=4.0, fused="always")
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=30, maxpoints=H * W)
    res = fit_pointwise(model, params, C.grid2d(H, W), im.reshape(-1, 3),
                        cfg, gt=im.reshape(-1, 3), donate=False)
    assert res.mse_gt[-1] < res.mse_gt[0] * 0.5


@pytest.mark.parametrize("n", [512, 700, 1100])
def test_wire2d_pair_vjp_matches_autodiff(n):
    """The r5 apply pair (fused fwd + recompute-backward with external
    cotangent, incl. dcoords) must match XLA autodiff of the jnp path —
    including across tile boundaries (n=700, 1100 straddle the 512-row
    tiles; VERDICT r4 #3)."""
    from wire_tpu.ops.pallas.wire2d_step import wire2d_mlp_fused
    model, params, coords, target = _setup(n=n, hf=96)

    spec_ref = dataclasses.replace(model.spec, fused="never")

    def loss_ref(p, c):
        from wire_tpu.nn.models import wire2d_apply
        return jnp.mean((wire2d_apply(p, c, spec_ref) - target) ** 2)

    def loss_fused(p, c):
        return jnp.mean((wire2d_mlp_fused(p, c, model.spec, interpret=True)
                         - target) ** 2)

    y_ref = wire2d_mlp_fused(params, coords, model.spec, interpret=True)
    from wire_tpu.nn.models import wire2d_apply
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(wire2d_apply(params, coords, spec_ref)),
        rtol=2e-4, atol=1e-5)

    (gr_p, gr_c) = jax.grad(loss_ref, argnums=(0, 1))(params, coords)
    (gf_p, gf_c) = jax.grad(loss_fused, argnums=(0, 1))(params, coords)
    _assert_tree_close(gf_p, gr_p, rtol=3e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gr_c),
                               rtol=3e-4, atol=2e-6)
