"""Metric tests: PSNR formula parity with the reference, SSIM vs an
independent numpy oracle implementing skimage's algorithm, MS-SSIM sanity,
IoU non-mutation."""
import numpy as np
from scipy.ndimage import uniform_filter

import jax.numpy as jnp

from wire_tpu.train import metrics as M
from wire_tpu.signals import image as I


def _ssim_numpy(x, y, data_range=1.0, win=7):
    """Direct transcription of skimage.metrics.structural_similarity for
    float 2D inputs with default settings (independent oracle)."""
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win ** 2
    cov_norm = NP / (NP - 1)
    ux = uniform_filter(x, win)
    uy = uniform_filter(y, win)
    uxx = uniform_filter(x * x, win)
    uyy = uniform_filter(y * y, win)
    uxy = uniform_filter(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    pad = win // 2
    return S[pad:-pad, pad:-pad].mean()


def test_psnr_matches_reference_formula():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (32, 32)).astype(np.float64)
    xhat = x + rng.normal(0, 0.1, x.shape)
    err = x - xhat
    ref = 10 * np.log10(np.max(x) / np.mean(err ** 2))
    assert abs(float(M.psnr_ref(x, xhat)) - ref) < 1e-4


def test_rsnr_matches_reference_formula():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (16, 16))
    xhat = x + rng.normal(0, 0.05, x.shape)
    ref = 20 * np.log10(np.linalg.norm(x.ravel())
                        / np.linalg.norm((x - xhat).ravel()))
    assert abs(float(M.rsnr(x, xhat)) - ref) < 1e-4


def test_ssim_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    x = I.synthetic_image(64, 64, 1)[..., 0]
    y = np.clip(x + rng.normal(0, 0.05, x.shape).astype(np.float32), 0, 1)
    ref = _ssim_numpy(x.astype(np.float64), y.astype(np.float64))
    mine = float(M.ssim(x, y, data_range=1.0))
    assert abs(mine - ref) < 1e-4


def test_ssim_multichannel_and_identity():
    x = I.synthetic_image(48, 48, 3)
    assert abs(float(M.ssim(x, x)) - 1.0) < 1e-6
    y = np.clip(x + 0.1 * np.sin(10 * x), 0, 1)
    per_chan = np.mean([_ssim_numpy(x[..., c].astype(np.float64),
                                    y[..., c].astype(np.float64))
                        for c in range(3)])
    assert abs(float(M.ssim(x, y)) - per_chan) < 1e-4


def test_ms_ssim_properties():
    x = I.synthetic_image(192, 192, 3)
    assert abs(float(M.ms_ssim(x, x)) - 1.0) < 1e-5
    rng = np.random.default_rng(0)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
    v = float(M.ms_ssim(x, y))
    assert 0.3 < v < 1.0
    # more noise -> lower score
    y2 = np.clip(x + rng.normal(0, 0.3, x.shape).astype(np.float32), 0, 1)
    assert float(M.ms_ssim(x, y2)) < v


def test_iou_matches_and_does_not_mutate():
    rng = np.random.default_rng(0)
    preds = rng.uniform(0, 1, (10, 10, 10)).astype(np.float32)
    gt = (rng.uniform(0, 1, (10, 10, 10)) > 0.5).astype(np.float32)
    preds_copy = preds.copy()
    thres = 0.5
    pb = preds >= thres
    ref = np.logical_and(pb, gt).sum() / np.logical_or(pb, gt).sum()
    assert abs(float(M.iou(preds, gt, thres)) - ref) < 1e-6
    np.testing.assert_array_equal(preds, preds_copy)  # no in-place mutation


def test_total_variation_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 8, 9)).astype(np.float32)
    t = torch.tensor(x)
    dx = t[:, :, 1:, :] - t[:, :, :-1, :]
    dy = t[:, :, :, 1:] - t[:, :, :, :-1]
    ref = (dx.abs().sum() + dy.abs().sum()).item()
    assert abs(float(M.total_variation(jnp.asarray(x))) - ref) < 1e-4


def test_ssim_large_magnitude_inputs():
    """f32 (co)variance cancellation: a divergent reconstruction with values
    far outside [0,1] must still give SSIM in [-1, 1] matching a float64
    oracle (observed SSIM=1.14 before the centered-moment fix)."""
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (48, 48)).astype(np.float32)
    y = (x + 20.0 + 0.5 * rng.standard_normal((48, 48))).astype(np.float32)

    def oracle(a, b, data_range=1.0, win=7):
        from scipy.ndimage import uniform_filter
        a = a.astype(np.float64); b = b.astype(np.float64)
        K1, K2 = 0.01, 0.03
        C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
        NP = win ** 2
        cov_norm = NP / (NP - 1.0)
        ua, ub = uniform_filter(a, win), uniform_filter(b, win)
        va = cov_norm * (uniform_filter(a * a, win) - ua * ua)
        vb = cov_norm * (uniform_filter(b * b, win) - ub * ub)
        vab = cov_norm * (uniform_filter(a * b, win) - ua * ub)
        S = ((2 * ua * ub + C1) * (2 * vab + C2)
             / ((ua ** 2 + ub ** 2 + C1) * (va + vb + C2)))
        pad = win // 2
        return float(np.mean(S[pad:-pad, pad:-pad]))

    for a, b in [(x, y), (y, y * 1.01), (x, x + 0.1)]:
        got = float(M.ssim(a, b))
        want = oracle(a, b)
        assert -1.0 <= got <= 1.0
        np.testing.assert_allclose(got, want, atol=2e-3)
    g = float(M.ssim_gaussian(y, y * 1.01))
    assert -1.0 <= g <= 1.0


def test_ssim_smooth_image_no_overshoot():
    """f32 E[x^2]-mu^2 cancellation made SSIM exceed 1 on smooth
    reconstructions (r4 sweep: posenc SISR 'SSIM 1.172'); the metric now
    computes in float64 on host.  Pin <= 1 and oracle agreement on a
    smooth pair handed over as float32."""
    yy, xx = np.mgrid[0:96, 0:96].astype(np.float32) / 96.0
    x = 0.4 + 0.5 * xx + 0.1 * yy
    rng = np.random.default_rng(3)
    y = (x + rng.normal(0, 1e-3, x.shape)).astype(np.float32)
    mine = float(M.ssim(x, y, data_range=1.0))
    ref = _ssim_numpy(x.astype(np.float64), y.astype(np.float64))
    assert mine <= 1.0 + 1e-9
    assert abs(mine - ref) < 1e-6
