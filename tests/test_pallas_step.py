"""One-pass fused train-step kernel (ops/pallas/wire_step.py) vs autodiff
of the jnp WIRE path (interpret mode on CPU): predictions, parameter
gradients, tail-padding masks, and the trainer integration contract."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wire_tpu.nn import get_inr
from wire_tpu.ops.pallas.wire_step import wire_step_fused


def _setup(n=700, h=64, layers=2, out=3, seed=0):
    model = get_inr("wire", in_features=2, out_features=out,
                    hidden_features=int(h * np.sqrt(2)) + 1,
                    hidden_layers=layers, first_omega0=7.0,
                    hidden_omega0=7.0, scale=8.0)
    params = model.init(jax.random.key(seed))
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (n, out)).astype(np.float32))
    return model, params, coords, target


def _ref_step(model, params, coords, target, nvalid=None, denom=None):
    spec = dataclasses.replace(model.spec, fused="never")
    n, c = target.shape
    dn = float(n * c) if denom is None else denom

    def loss_fn(p):
        from wire_tpu.nn.models import wire_apply
        pred = wire_apply(p, coords, spec)
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


@pytest.mark.parametrize("n,h,layers,out", [(700, 64, 2, 3), (512, 64, 1, 1),
                                            (100, 212, 2, 3)])
def test_step_matches_autodiff(n, h, layers, out):
    model, params, coords, target = _setup(n, h, layers, out)
    pred_ref, g_ref = _ref_step(model, params, coords, target)
    pred, g = wire_step_fused(params, coords, target, model.spec,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_ref),
                               rtol=2e-5, atol=5e-6)
    _assert_tree_close(g, g_ref)


def test_step_tail_mask_and_denom():
    """Sentinel rows past nvalid contribute exactly zero gradient, and a
    traced nvalid/denom (the trainer's chunk-scan case) is honored."""
    model, params, coords, target = _setup(n=640)
    nvalid, denom = 500, 500 * 3.0
    pred_ref, g_ref = _ref_step(model, params, coords, target, nvalid, denom)
    pred, g = jax.jit(lambda p, c, t, nv, dn: wire_step_fused(
        p, c, t, model.spec, nvalid=nv, denom=dn, interpret=True))(
            params, coords, target, jnp.asarray(nvalid),
            jnp.asarray(denom, jnp.float32))
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_ref),
                               rtol=2e-5, atol=5e-6)
    _assert_tree_close(g, g_ref)

    # garbage in the masked tail must not leak into the gradients
    t2 = target.at[nvalid:].set(1e6)
    c2 = coords.at[nvalid:].set(0.123)
    _, g2 = wire_step_fused(params, c2, t2, model.spec,
                            nvalid=jnp.asarray(nvalid),
                            denom=jnp.asarray(denom, jnp.float32),
                            interpret=True)
    _assert_tree_close(g2, g_ref)


def test_step_grads_method_dispatch():
    """INR.step_grads: fused='always' runs the kernel (interpret off-TPU),
    the default CPU path falls back to autodiff — both agree."""
    model, params, coords, target = _setup(n=300)
    pred_fb, g_fb = model.step_grads(params, coords, target)

    fused_model = get_inr("wire", in_features=2, out_features=3,
                          hidden_features=model.spec.hidden_features,
                          hidden_layers=2, first_omega0=7.0,
                          hidden_omega0=7.0, scale=8.0, fused="always")
    pred_k, g_k = fused_model.step_grads(params, coords, target)
    np.testing.assert_allclose(np.asarray(pred_k), np.asarray(pred_fb),
                               rtol=2e-5, atol=5e-6)
    _assert_tree_close(g_k, g_fb)


# ---------------------------------------------------------------------------
# Real-family one-pass step kernel (ops/pallas/real_mlp.py:real_step_fused)
# ---------------------------------------------------------------------------

_REAL_CASES = [
    ("siren", dict(first_omega0=7.0, hidden_omega0=7.0)),
    ("gauss", dict(scale=8.0)),
    ("relu", {}),
    ("posenc", dict(sidelength=64)),
    ("bspline_form", dict(scale=3.0)),
    ("bspline_cubic", dict(scale=3.0)),
    ("bspline_srelu", dict(scale=3.0)),
    ("bspline_mscale_repIN",
     dict(in_features=8, scale=3.0, scale_tensor=(1.0, 2.0))),
    ("bspline_mscale_HL",
     dict(scale=3.0, scale_tensor=(1.0, 4.0), scaled_hidden_features=384,
          base_split=256)),
]


@pytest.mark.parametrize("name,kw", _REAL_CASES,
                         ids=[c[0] for c in _REAL_CASES])
def test_real_step_matches_autodiff(name, kw):
    kw = dict(kw)
    kw.setdefault("in_features", 2)
    base = dict(out_features=3, hidden_features=64, hidden_layers=2)
    m_fb = get_inr(name, fused="never", **base, **kw)
    m_k = get_inr(name, fused="always", **base, **kw)
    params = m_fb.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (700, 2)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (700, 3)).astype(np.float32))
    for nv, dn in [(None, None), (600, 600 * 3.0)]:
        p_fb, g_fb = m_fb.step_grads(params, coords, target,
                                     nvalid=nv, denom=dn)
        p_k, g_k = m_k.step_grads(params, coords, target,
                                  nvalid=nv, denom=dn)
        np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_fb),
                                   rtol=2e-4, atol=1e-5)
        _assert_tree_close(g_k, g_fb, rtol=3e-4, atol=1e-5)


def test_mscale_hl_detach_split_uses_fallback():
    """detach_split (the reference-compat stop-gradient mode) is not
    fusable; step_grads must return the autodiff fallback bitwise."""
    kw = dict(in_features=2, out_features=3, hidden_features=64,
              hidden_layers=2, scale=3.0, scale_tensor=(1.0, 4.0),
              scaled_hidden_features=384, base_split=256, detach_split=True)
    m_fb = get_inr("bspline_mscale_HL", fused="never", **kw)
    m_k = get_inr("bspline_mscale_HL", fused="always", **kw)
    params = m_fb.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (300, 2)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (300, 3)).astype(np.float32))
    p_fb, g_fb = m_fb.step_grads(params, coords, target)
    p_k, g_k = m_k.step_grads(params, coords, target)
    np.testing.assert_array_equal(np.asarray(p_k), np.asarray(p_fb))
    for a, b in zip(jax.tree.leaves(g_fb), jax.tree.leaves(g_k)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


# ---------------------------------------------------------------------------
# In-kernel epoch metrics (want_metrics=True): masked squared-error sums vs
# the fitting target and the clean gt, accumulated inside the step kernels.
# ---------------------------------------------------------------------------

def _ref_sums(pred, target, gt, nvalid):
    pred = np.asarray(pred)
    m = (np.arange(pred.shape[0])[:, None] < nvalid)
    et = (pred - np.asarray(target)) * m
    eg = (pred - np.asarray(gt)) * m
    return float(np.sum(et * et)), float(np.sum(eg * eg))


@pytest.mark.parametrize("fam,kw", [
    ("wire", dict(first_omega0=7.0, hidden_omega0=7.0, scale=8.0)),
    ("gauss", dict(scale=8.0)),
    ("siren", dict(first_omega0=7.0, hidden_omega0=7.0)),
], ids=["wire", "gauss", "siren"])
def test_step_metrics_sums(fam, kw):
    """want_metrics sums match a direct masked computation, and the extra
    outputs leave predictions/grads untouched — kernel (fused='always',
    interpret) and autodiff fallback both."""
    rng = np.random.default_rng(1)
    coords = jnp.asarray(rng.uniform(-1, 1, (640, 2)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (640, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (640, 3)).astype(np.float32))
    for fused in ("always", "never"):
        m = get_inr(fam, in_features=2, out_features=3, hidden_features=64,
                    hidden_layers=2, fused=fused, **kw)
        params = m.init(jax.random.key(0))
        for nv in (None, 500):
            dn = None if nv is None else nv * 3.0
            pred0, g0 = m.step_grads(params, coords, target,
                                     nvalid=nv, denom=dn)
            pred, g, (st, sg) = m.step_grads(params, coords, target,
                                             nvalid=nv, denom=dn, gt=gt,
                                             want_metrics=True)
            np.testing.assert_array_equal(np.asarray(pred),
                                          np.asarray(pred0))
            for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g)):
                np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
            rt, rg = _ref_sums(pred, target, gt,
                               640 if nv is None else nv)
            np.testing.assert_allclose(float(st), rt, rtol=1e-5)
            np.testing.assert_allclose(float(sg), rg, rtol=1e-5)
            # gt defaults to target
            _, _, (st2, sg2) = m.step_grads(params, coords, target,
                                            nvalid=nv, denom=dn,
                                            want_metrics=True)
            np.testing.assert_allclose(float(st2), float(sg2), rtol=0)


def test_trainer_metrics_match_rec_reduction():
    """fit_pointwise epoch metric histories from the in-kernel sums match
    the autodiff path's XLA-side sums, full-batch and chunked — gradient
    and metric parity across the whole fit."""
    from wire_tpu.train.trainer import FitConfig, fit_pointwise
    from wire_tpu.signals import coords as C

    rng = np.random.default_rng(0)
    H = W = 24
    gt = rng.uniform(0, 1, (H * W, 2)).astype(np.float32)
    noisy = gt + rng.normal(0, 0.05, gt.shape).astype(np.float32)
    grid = C.grid2d(H, W)

    for mp in (H * W, 200):
        m = get_inr("gauss", in_features=2, out_features=2,
                    hidden_features=32, hidden_layers=1, scale=8.0,
                    fused="always")
        cfg = FitConfig(learning_rate=5e-3, niters=8, maxpoints=mp)
        params = m.init(jax.random.key(0))
        r_sum = fit_pointwise(m, params, grid, noisy, cfg, gt=gt,
                              donate=False)
        m_fb = get_inr("gauss", in_features=2, out_features=2,
                       hidden_features=32, hidden_layers=1, scale=8.0,
                       fused="never")
        r_rec = fit_pointwise(m_fb, params, grid, noisy, cfg, gt=gt,
                              donate=False)
        np.testing.assert_allclose(r_sum.mse_gt, r_rec.mse_gt,
                                   rtol=2e-4, atol=1e-7)
        np.testing.assert_allclose(r_sum.mse_noisy, r_rec.mse_noisy,
                                   rtol=2e-4, atol=1e-7)
