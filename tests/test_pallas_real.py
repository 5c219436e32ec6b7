"""Fused real-MLP Pallas kernel (interpret mode) vs the jnp reference path
for every covered family: forward + parameter/coordinate gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wire_tpu.nn import get_inr

FAMILIES = [
    ("siren", dict(first_omega0=30.0, hidden_omega0=30.0)),
    ("gauss", dict(scale=8.0)),
    ("relu", dict()),
    ("bspline_form", dict(scale=3.0, first_omega0=-0.2, hidden_omega0=-0.2)),
    ("bspline_cubic", dict(scale=2.0, first_omega0=-0.2,
                           hidden_omega0=-0.2)),
    ("bspline_srelu", dict(scale=2.0, first_omega0=-0.2,
                           hidden_omega0=-0.2)),
    ("bspline_mscale_repIN", dict(scale=2.0, scale_tensor=(1.0, 4.0),
                                  scaled_hidden_features=8,
                                  in_features=2 * 2 * 8)),
    ("bspline_mscale_HL", dict(scale=2.0, scale_tensor=(1.0, 4.0),
                               scaled_hidden_features=300, base_split=256)),
]


def _models(nonlin, kw):
    base = dict(in_features=2, hidden_features=50, hidden_layers=2,
                out_features=3)
    base.update(kw)
    ref = get_inr(nonlin, fused="never", **base)
    fused = get_inr(nonlin, fused="always", **base)
    params = ref.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (700, 2)).astype(np.float32))
    return ref, fused, params, coords


@pytest.mark.parametrize("nonlin,kw", FAMILIES, ids=[f[0] for f in FAMILIES])
def test_fused_forward(nonlin, kw):
    ref, fused, params, coords = _models(nonlin, kw)
    a = np.asarray(ref.apply(params, coords))
    b = np.asarray(fused.apply(params, coords))
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("nonlin,kw", FAMILIES, ids=[f[0] for f in FAMILIES])
def test_fused_grads(nonlin, kw):
    ref, fused, params, coords = _models(nonlin, kw)
    target = jnp.zeros((coords.shape[0], 3))

    def loss(model):
        def f(p, c):
            return jnp.mean((model.apply(p, c) - target) ** 2)
        return f

    gp_ref, gc_ref = jax.grad(loss(ref), argnums=(0, 1))(params, coords)
    gp_f, gc_f = jax.grad(loss(fused), argnums=(0, 1))(params, coords)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(gp_ref)[0],
            jax.tree_util.tree_flatten_with_path(gp_f)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=2e-5,
                                   err_msg=f"{nonlin} {jax.tree_util.keystr(kp)}")
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_mscale2_matches_jnp():
    base = dict(in_features=2, hidden_features=40, hidden_layers=2,
                out_features=3, scale=2.0, scale_tensor=(0.5, 4.0))
    ref = get_inr("bspline_mscale_2", fused="never", **base)
    fused = get_inr("bspline_mscale_2", fused="always", **base)
    params = ref.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (600, 2)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(fused.apply(params, coords)),
                               np.asarray(ref.apply(params, coords)),
                               rtol=2e-5, atol=1e-5)
    target = jnp.zeros((600, 3))
    gr = jax.grad(lambda p: jnp.mean((ref.apply(p, coords) - target) ** 2))(
        params)
    gf = jax.grad(lambda p: jnp.mean((fused.apply(p, coords) - target) ** 2))(
        params)
    for (kp, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(gr)[0],
                               jax.tree_util.tree_flatten_with_path(gf)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=2e-5,
                                   err_msg=jax.tree_util.keystr(kp))


def test_fused_mscale_hier_matches_jnp():
    """The whole hierarchical model canonicalized as ONE chain with
    identity-lane carries (models._canon_mscale_hier) must reproduce the
    stagewise jnp path: forward + native-param gradients."""
    base = dict(in_features=2, hidden_features=40, hidden_layers=2,
                out_features=3, scale=2.0, scale_tensor=(2.0, 7.0, 5.0))
    ref = get_inr("bspline_mscale_hier", fused="never", **base)
    fused = get_inr("bspline_mscale_hier", fused="always", **base)
    params = ref.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (600, 2)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(fused.apply(params, coords)),
                               np.asarray(ref.apply(params, coords)),
                               rtol=2e-5, atol=1e-5)
    target = jnp.zeros((600, 3))
    gr = jax.grad(lambda p: jnp.mean((ref.apply(p, coords) - target) ** 2))(
        params)
    gf = jax.grad(lambda p: jnp.mean((fused.apply(p, coords) - target) ** 2))(
        params)
    for (kp, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(gr)[0],
                               jax.tree_util.tree_flatten_with_path(gf)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=2e-5,
                                   err_msg=jax.tree_util.keystr(kp))


@pytest.mark.parametrize("nonlin,kw", [
    ("bspline_mscale_2", dict(scale=2.0, scale_tensor=(0.5, 4.0))),
    ("bspline_mscale_hier", dict(scale=2.0, scale_tensor=(2.0, 7.0))),
], ids=["mscale2", "mscale_hier"])
def test_mscale_step_grads_match_autodiff(nonlin, kw):
    """STEP_REGISTRY coverage for mscale_2/hier (VERDICT round 1 #5): the
    registered step must equal autodiff of the reference jnp apply,
    including the masked-row contract and in-step metric sums."""
    base = dict(in_features=2, hidden_features=40, hidden_layers=2,
                out_features=3)
    base.update(kw)
    ref = get_inr(nonlin, fused="never", **base)
    fused = get_inr(nonlin, fused="always", **base)
    assert fused._step is not None
    params = ref.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    n, nvalid = 600, 543
    coords = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    target = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    gt = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    denom = float(nvalid * 3)

    pred_f, grads_f, sums_f = fused.step_grads(
        params, coords, target, nvalid=jnp.int32(nvalid), denom=denom,
        gt=gt, want_metrics=True)
    pred_r, grads_r, sums_r = ref.step_grads(
        params, coords, target, nvalid=jnp.int32(nvalid), denom=denom,
        gt=gt, want_metrics=True)
    np.testing.assert_allclose(np.asarray(pred_f), np.asarray(pred_r),
                               rtol=2e-5, atol=1e-5)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(grads_r)[0],
            jax.tree_util.tree_flatten_with_path(grads_f)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=2e-5,
                                   err_msg=f"{nonlin} {jax.tree_util.keystr(kp)}")
    np.testing.assert_allclose(np.asarray(sums_f), np.asarray(sums_r),
                               rtol=2e-4)


def test_mscale1_step_matches_autodiff():
    """mscale_1 one-pass step via the canonical identity-first-layer chain
    (scales folded into stacked first-layer weights) vs XLA autodiff."""
    import dataclasses
    from wire_tpu.nn import get_inr
    from wire_tpu.nn.models import mscale1_apply, mscale1_step

    model = get_inr("bspline_mscale_1", in_features=2, out_features=3,
                    hidden_features=96, scaled_hidden_features=32,
                    hidden_layers=3, scale=6.0, scale_tensor=(1.0, 4.0),
                    fused="always")
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (300, 2)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (300, 3)).astype(np.float32))

    spec_ref = dataclasses.replace(model.spec, fused="never")

    def loss_fn(p):
        pred = mscale1_apply(p, coords, spec_ref)
        return jnp.mean((pred - target) ** 2), pred

    (_, pred_ref), g_ref = jax.value_and_grad(loss_fn, has_aux=True)(params)
    out = mscale1_step(params, coords, target, model.spec)
    assert out is not None
    pred, g = out
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_ref),
                               rtol=2e-4, atol=1e-5)
    for (kp, a), (_, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(g)[0], key=str),
            sorted(jax.tree_util.tree_flatten_with_path(g_ref)[0], key=str)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6, err_msg=str(kp))


def test_knots_step_matches_autodiff():
    """bspline_knots trains through the shared step kernel: the De Boor
    basis on the family's fixed knot vector IS the quadratic-spline bump
    (alpha=1, beta=b canon)."""
    import dataclasses
    from wire_tpu.nn import get_inr
    from wire_tpu.nn.models import bspline_knots_apply, bspline_knots_step

    model = get_inr("bspline_knots", in_features=2, out_features=3,
                    hidden_features=64, hidden_layers=2, fused="always")
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (300, 2)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (300, 3)).astype(np.float32))
    spec_ref = dataclasses.replace(model.spec, fused="never")

    def loss_fn(p):
        pred = bspline_knots_apply(p, coords, spec_ref)
        return jnp.mean((pred - target) ** 2), pred

    (_, pred_ref), g_ref = jax.value_and_grad(loss_fn, has_aux=True)(params)
    out = bspline_knots_step(params, coords, target, model.spec)
    assert out is not None
    pred, g = out
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_ref),
                               rtol=2e-4, atol=1e-5)
    for (kp, a), (_, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(g)[0], key=str),
            sorted(jax.tree_util.tree_flatten_with_path(g_ref)[0], key=str)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6, err_msg=str(kp))


@pytest.mark.parametrize("n,ns", [(600, 2), (1100, 3)])
def test_mscale2_onepass_step_matches_autodiff(n, ns):
    """The r5 ONE-PASS mscale_2 step kernel (trunks + freq_combine combiner
    + loss-grad + backward in a single pallas_call, VERDICT r4 #2) must
    match autodiff of the jnp path: pred, every native grad (incl. the
    combiner's freq_mlp), metric sums, and tail-sentinel masking."""
    import dataclasses
    from wire_tpu.nn.models import mscale2_step, mscale2_apply
    scale_tensor = (0.5, 4.0, 9.0)[:ns]
    model = get_inr("bspline_mscale_2", in_features=2, hidden_features=40,
                    hidden_layers=2, out_features=3, scale=2.0,
                    scale_tensor=scale_tensor, fused="always")
    params = model.init(jax.random.key(1))
    rng = np.random.default_rng(1)
    coords = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    gtv = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    nvalid, denom = n - 37, float((n - 37) * 3)

    spec_ref = dataclasses.replace(model.spec, fused="never")

    def loss_fn(p):
        pred = mscale2_apply(p, coords, spec_ref)
        err = (pred - target) * (jnp.arange(n)[:, None] < nvalid)
        return jnp.sum(err * err) / denom, pred

    (_, pred_ref), g_ref = jax.value_and_grad(loss_fn, has_aux=True)(params)

    out = mscale2_step(params, coords, target, model.spec, nvalid=nvalid,
                       denom=denom, gt=gtv, want_metrics=True)
    assert out is not None
    pred, g, (sse_t, sse_g) = out
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_ref),
                               rtol=2e-4, atol=1e-5)
    for (kp, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(g_ref)[0],
                               jax.tree_util.tree_flatten_with_path(g)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-4,
                                   atol=2e-5,
                                   err_msg=jax.tree_util.keystr(kp))
    m = (np.arange(n)[:, None] < nvalid)
    np.testing.assert_allclose(
        float(sse_t), float(np.sum((m * (np.asarray(pred_ref) - target)) ** 2)),
        rtol=1e-4)
    np.testing.assert_allclose(
        float(sse_g), float(np.sum((m * (np.asarray(pred_ref) - gtv)) ** 2)),
        rtol=1e-4)
