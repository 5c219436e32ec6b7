"""One-pass fused MFN train-step kernel (ops/pallas/mfn_step.py) vs
autodiff of the jnp MFN path, interpret mode on CPU."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wire_tpu.nn import get_inr
from wire_tpu.ops.pallas.mfn_step import mfn_step_fused


def _setup(n=700, hf=128, layers=2, out=3, seed=0):
    model = get_inr("mfn", in_features=2, out_features=out,
                    hidden_features=hf, hidden_layers=layers)
    params = model.init(jax.random.key(seed))
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (n, out)).astype(np.float32))
    return model, params, coords, target


def _ref_step(model, params, coords, target, nvalid=None, denom=None):
    from wire_tpu.nn.models import mfn_apply
    spec = dataclasses.replace(model.spec, fused="never")
    n, c = target.shape
    dn = float(n * c) if denom is None else denom

    def loss_fn(p):
        pred = mfn_apply(p, coords, spec)
        err = pred - target
        if nvalid is not None:
            err = err * (jnp.arange(n)[:, None] < nvalid)
        return jnp.sum(err * err) / dn, pred

    (_, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return pred, grads


def _assert_tree_close(got, want, rtol=3e-4, atol=2e-6):
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(want)[0], key=str),
            sorted(jax.tree_util.tree_flatten_with_path(got)[0], key=str)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=rtol,
                                   atol=atol, err_msg=str(ka))


@pytest.mark.parametrize("n,hf,layers,out",
                         [(700, 128, 2, 3), (512, 64, 1, 1),
                          (300, 256, 3, 3)])
def test_mfn_step_matches_autodiff(n, hf, layers, out):
    model, params, coords, target = _setup(n, hf, layers, out)
    pred_ref, g_ref = _ref_step(model, params, coords, target)
    pred, g = mfn_step_fused(params, coords, target, model.spec,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_ref),
                               rtol=2e-4, atol=1e-5)
    _assert_tree_close(g, g_ref)


def test_mfn_step_masks_tail_sentinels():
    model, params, coords, target = _setup(600, 128, 2, 3)
    nvalid, denom = 450, 450 * 3.0
    _, g_ref = _ref_step(model, params, coords, target, nvalid=nvalid,
                         denom=denom)
    _, g = mfn_step_fused(params, coords, target, model.spec,
                          nvalid=nvalid, denom=denom, interpret=True)
    _assert_tree_close(g, g_ref)


def test_mfn_step_metric_sums():
    model, params, coords, target = _setup(300, 64, 1, 3)
    gt = target + 0.25
    pred, g, (sse_t, sse_g) = mfn_step_fused(
        params, coords, target, model.spec, gt=gt, want_metrics=True,
        interpret=True)
    pred = np.asarray(pred)
    np.testing.assert_allclose(float(sse_t),
                               np.sum((pred - np.asarray(target)) ** 2),
                               rtol=1e-4)
    np.testing.assert_allclose(float(sse_g),
                               np.sum((pred - np.asarray(gt)) ** 2),
                               rtol=1e-4)


def test_mfn_trains_through_step_grads():
    from wire_tpu.signals import coords as C, image as I
    from wire_tpu.train.trainer import FitConfig, fit_pointwise
    H = W = 24
    im = I.synthetic_image(H, W, 3, seed=0)
    model = get_inr("mfn", in_features=2, out_features=3,
                    hidden_features=64, hidden_layers=1, fused="always")
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=1e-2, niters=30, maxpoints=H * W)
    res = fit_pointwise(model, params, C.grid2d(H, W), im.reshape(-1, 3),
                        cfg, gt=im.reshape(-1, 3), donate=False)
    assert res.mse_gt[-1] < res.mse_gt[0] * 0.7


@pytest.mark.parametrize("n", [700, 1024])
def test_mfn_pair_vjp_matches_autodiff(n):
    """The r4 apply pair (fwd kernel + recompute-backward with external
    cotangent, incl. dcoords) must match XLA autodiff of the jnp path."""
    from wire_tpu.ops.pallas.mfn_step import mfn_mlp_fused
    model = get_inr("mfn", in_features=2, out_features=3,
                    hidden_features=48, hidden_layers=2, scale=64.0)
    params = model.init(jax.random.key(3))
    rng = np.random.default_rng(3)
    coords = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))

    spec = model.spec.replace(fused="never")

    def loss_ref(p, c):
        from wire_tpu.nn.models import mfn_apply
        return jnp.mean((mfn_apply(p, c, spec) - tgt) ** 2)

    def loss_fused(p, c):
        return jnp.mean((mfn_mlp_fused(p, c, model.spec, interpret=True)
                         - tgt) ** 2)

    (gr_p, gr_c) = jax.grad(loss_ref, argnums=(0, 1))(params, coords)
    (gf_p, gf_c) = jax.grad(loss_fused, argnums=(0, 1))(params, coords)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(gr_p)[0], key=str),
            sorted(jax.tree_util.tree_flatten_with_path(gf_p)[0], key=str)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=1e-6, err_msg=str(ka))
    np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gr_c),
                               rtol=2e-4, atol=1e-6)


def test_fused_accuracy_at_extreme_phase():
    """ADVICE r4: the MFN filter phase q = c@w + b is unbounded in
    principle; fast_sincos is exact only for |q| < ~2^13.  Scale the filter
    weights until max|q| ~ 8e3 (far beyond any reachable init/training
    state — see the call-site note in mfn_step.py) and pin fused-vs-jnp
    forward agreement there."""
    model = get_inr("mfn", in_features=2, out_features=3,
                    hidden_features=64, hidden_layers=2)
    params = model.init(jax.random.key(7))
    rng = np.random.default_rng(7)
    coords = jnp.asarray(rng.uniform(-1, 1, (512, 2)).astype(np.float32))

    # scale every filter's linear weight so the worst-case phase magnitude
    # sits just under the fast_sincos exactness bound
    scaled = {k: dict(v) for k, v in params.items()}
    qmax = 0.0
    for k in scaled:
        if k.startswith("gabor_"):
            w = np.asarray(scaled[k]["w"])
            cur = float(np.abs(np.asarray(coords) @ w).max())
            f = 8000.0 / max(cur, 1e-9)
            scaled[k]["w"] = jnp.asarray(w * f)
            qmax = max(qmax, float(np.abs(np.asarray(coords)
                                          @ np.asarray(scaled[k]["w"])).max()))
    assert qmax > 7e3  # the test is vacuous if the phases stayed small

    from wire_tpu.nn.models import mfn_apply
    spec_ref = model.spec.replace(fused="never")
    y_ref = np.asarray(mfn_apply(scaled, coords, spec_ref))
    from wire_tpu.ops.pallas.mfn_step import mfn_mlp_fused
    y = np.asarray(mfn_mlp_fused(scaled, coords, model.spec, interpret=True))
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
