"""Forward + input-gradient parity of every wire_tpu model family against the
reference PyTorch implementations (weights copied across, same inputs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wire_tpu.nn import get_inr

from . import torch_bridge as tb

# (nonlin, extra-kwargs, needs detach compat)
CASES = [
    ("wire", dict(first_omega0=7.0, hidden_omega0=7.0, scale=8.0), {}),
    # real cos*gauss Gabor (wire.py:6-42); moderate sigma keeps the gauss
    # term out of denormal range (same reasoning as wire2d below)
    ("realgabor", dict(first_omega0=7.0, hidden_omega0=7.0, scale=2.0), {}),
    # moderate scale/omega: the reference defaults (10/10) drive most 2D-Gabor
    # activations into denormal range where relative comparison is vacuous
    ("wire2d", dict(first_omega0=4.0, hidden_omega0=4.0, scale=1.5), {}),
    ("siren", dict(first_omega0=30.0, hidden_omega0=30.0, scale=10.0), {}),
    ("gauss", dict(first_omega0=30.0, hidden_omega0=30.0, scale=10.0), {}),
    ("relu", dict(first_omega0=30.0, hidden_omega0=30.0, scale=10.0), {}),
    ("posenc", dict(first_omega0=30.0, hidden_omega0=30.0, scale=10.0,
                    pos_encode=True, sidelength=128), {}),
    ("mfn", dict(), {}),
    ("bspline_form", dict(first_omega0=-0.2, hidden_omega0=-0.2, scale=9.0),
     {}),
    ("bspline_cubic", dict(first_omega0=-0.2, hidden_omega0=-0.2, scale=9.0),
     {}),
    ("bspline_mscale_1", dict(first_omega0=-0.2, hidden_omega0=-0.2,
                              scale=2.0, scale_tensor=(1.0, 4.0),
                              scaled_hidden_features=48), {}),
    ("bspline_mscale_repIN", dict(first_omega0=-0.2, hidden_omega0=-0.2,
                                  scale=2.0, scale_tensor=(1.0, 4.0),
                                  scaled_hidden_features=8,
                                  in_features=2 * 2 * 8), {}),
    ("bspline_mscale_HL", dict(first_omega0=-0.2, hidden_omega0=-0.2,
                               scale=2.0, scale_tensor=(1.0, 4.0),
                               scaled_hidden_features=300,
                               detach_split=True), {}),
    ("bspline_mscale_2", dict(first_omega0=-0.2, hidden_omega0=-0.2,
                              scale=2.0, scale_tensor=(0.5, 4.0)), {}),
    ("bspline_mscale_hier", dict(first_omega0=-0.2, hidden_omega0=-0.2,
                                 scale=2.0, scale_tensor=(0.5, 4.0)), {}),
    ("bspline_knots", dict(first_omega0=-0.2, hidden_omega0=-0.2,
                           scale=0.5), {}),
    ("bspline_srelu", dict(first_omega0=-0.2, hidden_omega0=-0.2,
                           scale=2.0), {}),
    # the reference sig forward picks ONE sigmoid branch from the sign of the
    # first sample's first coordinate and applies it to the whole batch
    # (bspline_sig.py:32-37); ours selects per element (the intended
    # behavior).  With all first coordinates positive both agree exactly, so
    # parity is tested on that domain.
    ("bspline_sig", dict(first_omega0=-0.2, hidden_omega0=-0.2,
                         scale=2.0), {"positive_first": True}),
]

HID = 64
LAYERS = 2


def _coords(n=257, d=2, positive_first=False):
    rng = np.random.default_rng(3)
    c = rng.uniform(-1, 1, size=(1, n, d)).astype(np.float32)
    if positive_first:
        c[..., 0] = np.abs(c[..., 0])
    return c


@pytest.mark.parametrize("nonlin,kw,opt", CASES, ids=[c[0] for c in CASES])
def test_forward_parity(nonlin, kw, opt):
    base = dict(in_features=2, hidden_features=HID, hidden_layers=LAYERS,
                out_features=3)
    base.update(kw)
    ref = tb.make_ref_model(nonlin, **base)
    params = tb.params_from_ref(nonlin, ref, LAYERS)
    model = get_inr(nonlin, **base)
    coords = _coords(d=base["in_features"] if nonlin not in
                     ("bspline_mscale_repIN",) else 2,
                     positive_first=opt.get("positive_first", False))
    y_ref = tb.torch_forward(ref, coords)
    y = np.asarray(model.apply(jax.tree.map(jnp.asarray, params),
                               jnp.asarray(coords)))
    # wire2d's exp(-sigma^2(|lin|^2+|orth|^2)) amplifies f32 matmul
    # summation-order jitter multiplicatively (rel err ~ 2 sigma^2 |lin| dz),
    # which makes a tight elementwise rtol flaky under varying XLA CPU
    # thread scheduling wherever the output is near zero (observed: a few
    # elements ~1e-2 off by ~4e-4 abs).  Outputs are O(1), so atol=1e-3 is
    # still a tight bound on the output scale while absorbing the jitter;
    # everything else stays at the tight bound.  realgabor shares the
    # mechanism — cos(omega lin) * exp(-(scale orth)^2) multiplies two
    # independent matmul outputs through an exponential (observed under
    # host contention: ~30% of elements off by up to 4.4e-4 abs, zero in
    # an idle run).
    loose = nonlin in ("wire2d", "realgabor")
    rtol, atol = (2e-3, 1e-3) if loose else (2e-4, 2e-5)
    np.testing.assert_allclose(y, y_ref.reshape(y.shape), rtol=rtol,
                               atol=atol)
    if loose:
        # the loose elementwise bound above absorbs jittery near-zero
        # elements; keep sensitivity to SYSTEMATIC deviation (ADVICE
        # round 1).  wire2d's jitter hits only a few elements, so 99%
        # must still sit at the tight elementwise bound; realgabor's is
        # broader but unbiased, so bound the relative Frobenius error
        # (a formula/parameter bug moves it by orders of magnitude).
        yr = y_ref.reshape(y.shape)
        err = np.abs(y - yr)
        if nonlin == "wire2d":
            tight = 2e-4 * np.abs(yr) + 2e-5
            assert np.mean(err <= tight) >= 0.99, (
                f"wire2d: {100 * np.mean(err > tight):.2f}% of elements "
                "exceed the tight bound — systematic deviation, not jitter")
        else:
            rel_l2 = np.linalg.norm(err) / np.linalg.norm(yr)
            assert rel_l2 <= 5e-4, (
                f"realgabor: relative L2 error {rel_l2:.2e} — systematic "
                "deviation, not summation-order jitter")


@pytest.mark.parametrize("nonlin,kw,opt", CASES, ids=[c[0] for c in CASES])
def test_coord_grad_parity(nonlin, kw, opt):
    if nonlin == "posenc":
        pytest.skip("posenc: reference positional encoding not differentiable"
                    " wrt coords in a comparable way (concat order identical;"
                    " forward parity covers it)")
    base = dict(in_features=2, hidden_features=HID, hidden_layers=LAYERS,
                out_features=3)
    base.update(kw)
    ref = tb.make_ref_model(nonlin, **base)
    params = tb.params_from_ref(nonlin, ref, LAYERS)
    model = get_inr(nonlin, **base)
    coords = _coords(n=65, d=base["in_features"] if nonlin not in
                     ("bspline_mscale_repIN",) else 2,
                     positive_first=opt.get("positive_first", False))
    jparams = jax.tree.map(jnp.asarray, params)

    def f(c):
        return jnp.sum(model.apply(jparams, c))

    g = np.asarray(jax.grad(f)(jnp.asarray(coords)))
    if nonlin == "bspline_mscale_HL":
        # With the reference's detach compat flag the only path to coords is
        # stop-gradiented (torch x.grad is None); ours must be exactly zero,
        # and nonzero once the defect fix is active.
        assert np.all(g == 0)
        model2 = get_inr(nonlin, **{**base, "detach_split": False})
        g2 = np.asarray(jax.grad(
            lambda c: jnp.sum(model2.apply(jparams, c)))(jnp.asarray(coords)))
        assert np.any(g2 != 0)
        return
    y_ref, g_ref = tb.torch_forward_and_coord_grad(ref, coords)
    # atol accommodates f32 cancellation across the shifted relu^2/relu^3
    # B-spline terms at large sigma
    np.testing.assert_allclose(g, g_ref.reshape(g.shape), rtol=5e-4,
                               atol=2e-4)


def test_wire_param_count_matches_reference():
    """91,587 params for the WIRE denoise config
    (multiscale_results/denoise/T30.0_SNR2/Final/Agg_results.md)."""
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=300, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    params = model.init(jax.random.key(0))
    # complex params count 2 reals each; torch counts complex elements once,
    # so compare against torch's count * 2 for complex leaves. Simplest:
    # compare with the reference torch model directly.
    ref = tb.make_ref_model("wire", in_features=2, out_features=3,
                            hidden_features=300, hidden_layers=2,
                            first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    n_torch = 0
    for p in ref.parameters():
        if p.requires_grad:
            mult = 2 if p.is_complex() else 1
            n_torch += p.numel() * mult
    # our count excludes the (non-trainable) omega/sigma scalars that torch
    # registers as parameters with requires_grad=False
    assert model.num_params(params) == n_torch
