"""Quality metrics.

PSNR deliberately reproduces the reference's *nonstandard* formula
``10*log10(max(x)/MSE)`` (utils.py:67-82) so parity numbers are comparable —
for [0,1] images with max=1 it coincides with -10*log10(MSE), the form the
scripts also log inline (wire_image_denoise.py:167).  ``psnr_standard`` is
the textbook version.

SSIM follows skimage's structural_similarity defaults (7x7 uniform window,
K1=0.01, K2=0.03, unbiased covariance, border crop of win//2, channel mean) —
the function the reference calls in wire_ct.py:156.  MS-SSIM follows
pytorch_msssim's defaults (11-tap Gaussian sigma 1.5, 5 scales with the
standard weights, 2x avg-pool between scales) as used in wire_SISR.py:169-172.

IoU matches volutils.get_IoU (volutils.py:74-91) *without* its in-place
mutation of the predictions (SURVEY.md §2.6).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# PSNR family
# ---------------------------------------------------------------------------

def psnr_ref(x, xhat):
    """Reference formula: 10*log10(max(x)/mean((x-xhat)^2)) (utils.py:67-82)."""
    x = jnp.asarray(x)
    xhat = jnp.asarray(xhat)
    mse = jnp.mean((x - xhat) ** 2)
    return 10.0 * jnp.log10(jnp.max(x) / mse)


def psnr_standard(x, xhat, data_range=1.0):
    mse = jnp.mean((jnp.asarray(x) - jnp.asarray(xhat)) ** 2)
    return 20.0 * jnp.log10(data_range) - 10.0 * jnp.log10(mse)


def mse_db(mse):
    """-10*log10(MSE), the scripts' inline 'PSNR'/'MSE dB'
    (wire_image_denoise.py:167, bspline_SISR.py 'Best MSE')."""
    return -10.0 * jnp.log10(mse)


def rsnr(x, xhat):
    """20*log10(||x|| / ||x-xhat||) (utils.py:49-64)."""
    x = jnp.asarray(x)
    xn = jnp.linalg.norm(x.reshape(-1))
    en = jnp.linalg.norm((x - jnp.asarray(xhat)).reshape(-1))
    return 20.0 * jnp.log10(xn / en)


# ---------------------------------------------------------------------------
# SSIM (skimage-compatible) and MS-SSIM (pytorch_msssim-compatible)
# ---------------------------------------------------------------------------

def _np_uniform_filter(img, size):
    """float64 separable uniform filter — same interior values as
    scipy.ndimage.uniform_filter (the filter skimage uses); the zero-padded
    border is cropped by the SSIM win//2 crop anyway."""
    pad = size // 2
    k = np.ones((size,), np.float64) / size
    out = img
    for axis in range(img.ndim):
        out = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), axis, out)
    return out, pad


def _ssim_single(x, y, data_range, win_size):
    # Host-side numpy in float64: E[x^2]-mu^2 cancels catastrophically in
    # f32 for smooth regions whose local mean dominates the local variance
    # (smooth posenc/gauss reconstructions produced SSIM > 1), and every
    # call site is a post-fit host metric — skimage itself computes in f64.
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size ** x.ndim
    cov_norm = NP / (NP - 1.0)

    ux, pad = _np_uniform_filter(x, win_size)
    uy, _ = _np_uniform_filter(y, win_size)
    uxx, _ = _np_uniform_filter(x * x, win_size)
    uyy, _ = _np_uniform_filter(y * y, win_size)
    uxy, _ = _np_uniform_filter(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux * ux + uy * uy + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    # skimage crops a win//2 border before averaging
    sl = tuple(slice(pad, s - pad) for s in S.shape)
    return float(np.mean(S[sl]))


def ssim(x, y, data_range=1.0, win_size=7):
    """skimage.metrics.structural_similarity-compatible SSIM (float64,
    host-side numpy — see _ssim_single).

    HOST-ONLY, not jit-compatible (ADVICE r4): takes concrete arrays and
    returns a Python float — np.asarray on a tracer raises.  The r4
    cancellation fix (E[x^2]-mu^2 in f32 loses all significance on smooth
    reconstructions, results_tpu_r4/NOTES.md) moved it to host f64
    deliberately; every call site is a post-fit metric.  For an in-graph
    differentiable SSIM use ``ssim_gaussian``/``ms_ssim`` below (jnp,
    pytorch_msssim-convention Gaussian window — NOT the skimage number).

    2D arrays, or 3D with the last axis as channels (channel-mean, matching
    multichannel=True)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if x.ndim == 2:
        return _ssim_single(x, y, data_range, win_size)
    vals = [
        _ssim_single(x[..., c], y[..., c], data_range, win_size)
        for c in range(x.shape[-1])
    ]
    return float(np.mean(vals))


def _gaussian_kernel1d(size=11, sigma=1.5, dtype=jnp.float32):
    half = (size - 1) / 2.0
    coords = jnp.arange(size, dtype=dtype) - half
    g = jnp.exp(-(coords ** 2) / (2 * sigma * sigma))
    return g / jnp.sum(g)


def _gauss_filter_nchw(img, k):
    """Separable valid-mode Gaussian filter over H,W of (N,C,H,W)."""
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    dn = ("NCHW", "OIHW", "NCHW")
    C = img.shape[1]
    out = jax.lax.conv_general_dilated(
        img, jnp.tile(kh, (C, 1, 1, 1)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=C)
    out = jax.lax.conv_general_dilated(
        out, jnp.tile(kw, (C, 1, 1, 1)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=C)
    return out


def _ssim_gauss(x, y, data_range, k):
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    mx = _gauss_filter_nchw(x, k)
    my = _gauss_filter_nchw(y, k)
    # centered second moments (see _ssim_single)
    cx, cy = jnp.mean(x), jnp.mean(y)
    xs, ys = x - cx, y - cy
    mxs, mys = mx - cx, my - cy
    mxx = _gauss_filter_nchw(xs * xs, k)
    myy = _gauss_filter_nchw(ys * ys, k)
    mxy = _gauss_filter_nchw(xs * ys, k)
    vx = mxx - mxs * mxs
    vy = myy - mys * mys
    vxy = mxy - mxs * mys
    cs = (2 * vxy + C2) / (vx + vy + C2)
    ssim_map = ((2 * mx * my + C1) / (mx * mx + my * my + C1)) * cs
    return jnp.mean(ssim_map), jnp.mean(cs)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ssim_gaussian(x, y, data_range=1.0, win_size=11, sigma=1.5):
    """Gaussian-window SSIM on (H, W, C) or (H, W) images — pytorch_msssim's
    ``ssim(..., size_average=True)`` as called at wire_SISR.py:169."""
    x4 = _to_nchw(x)
    y4 = _to_nchw(y)
    k = _gaussian_kernel1d(win_size, sigma, x4.dtype)
    s, _ = _ssim_gauss(x4, y4, data_range, k)
    return s


def ms_ssim(x, y, data_range=1.0, win_size=11, sigma=1.5,
            weights=_MSSSIM_WEIGHTS):
    """Multi-scale SSIM (pytorch_msssim defaults)."""
    x4 = _to_nchw(x)
    y4 = _to_nchw(y)
    k = _gaussian_kernel1d(win_size, sigma, x4.dtype)
    mcs = []
    for i, w in enumerate(weights):
        s, cs = _ssim_gauss(x4, y4, data_range, k)
        if i < len(weights) - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            pad_h = x4.shape[2] % 2
            pad_w = x4.shape[3] % 2
            x4 = jax.lax.reduce_window(
                x4, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2),
                [(0, 0), (0, 0), (0, pad_h), (0, pad_w)]) / 4.0
            y4 = jax.lax.reduce_window(
                y4, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2),
                [(0, 0), (0, 0), (0, pad_h), (0, pad_w)]) / 4.0
    vals = jnp.stack(mcs + [jnp.maximum(s, 0.0)])
    w = jnp.asarray(weights, vals.dtype)
    return jnp.prod(vals ** w)


def _to_nchw(x):
    x = jnp.asarray(x)
    if x.ndim == 2:
        return x[None, None]
    if x.ndim == 3:
        return jnp.transpose(x, (2, 0, 1))[None]
    return x


# ---------------------------------------------------------------------------
# IoU / TV
# ---------------------------------------------------------------------------

def iou(preds, gt, thres=None):
    """volutils.get_IoU semantics without mutating the caller's array
    (volutils.py:74-91)."""
    preds = jnp.asarray(preds)
    gt = jnp.asarray(gt)
    if thres is not None:
        preds = jnp.where(preds >= thres, 1.0, 0.0)
    inter = jnp.sum(jnp.logical_and(preds != 0, gt != 0))
    union = jnp.sum(jnp.logical_or(preds != 0, gt != 0))
    return inter / union


def total_variation(image_nchw):
    """Anisotropic TV: sum |dx| + sum |dy| on (N, C, H, W)
    (utils.py:360-369)."""
    dx = image_nchw[:, :, 1:, :] - image_nchw[:, :, :-1, :]
    dy = image_nchw[:, :, :, 1:] - image_nchw[:, :, :, :-1]
    return jnp.sum(jnp.abs(dx)) + jnp.sum(jnp.abs(dy))


def count_parameters(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
