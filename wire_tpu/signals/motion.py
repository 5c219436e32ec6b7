"""Multi-frame super-resolution data pipeline: synthetic shifted/rotated
burst generation, Euclidean transforms, registration, and frame datasets.

Host-side counterpart of the reference's motion module (modules/motion.py):
- ``euclidean_matrix``     getEuclidianMatrix (motion.py:95-102)
- ``make_burst``           get_imstack semantics (motion.py:264-320): random
                           Euclidean warps of a HR image, per-frame warped
                           coordinate grids in [-1, 1]
- ``downsample_burst``     per-frame area downsample (wire_multi_sr.py:83-88)
- ``register_burst``       intensity-based ECC rigid registration replacing
                           pystackreg (motion.py:401-429) — cv2.findTransformECC
                           here, with the C++ fallback in wire_tpu.native
- ``FrameDataset``         ImageSRDataset equivalent (motion.py:22-76):
                           per-frame (coords, pixels, mask) arrays
"""
from __future__ import annotations

import dataclasses

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def euclidean_matrix(theta, shift):
    """2x3 rigid transform (motion.py:95-102)."""
    return np.array([[np.cos(theta), -np.sin(theta), shift[0]],
                     [np.sin(theta), np.cos(theta), shift[1]]])


def make_burst(im, shift_max=10, theta_max=np.pi / 12, nframes=5, rng=None,
               scale=1):
    """Generate ``nframes`` randomly shifted/rotated copies of ``im`` plus
    the per-frame warped coordinate grids (get_imstack, motion.py:264-320).

    Returns (imstack (n,Hl,Wl,3), Xstack (n,Hl,Wl), Ystack, mats (n,2,3)) with
    X/Y normalized to [-1, 1]; frame 0 is identity.
    """
    rng = np.random if rng is None else rng
    H, W, _ = im.shape
    shifts = rng.randint(-shift_max, shift_max, size=[nframes, 2])
    thetas = (2 * rng.rand(nframes) - 1) * theta_max
    shifts[0, :] = 0
    thetas[0] = 0

    Y, X = np.mgrid[:H, :W]
    ones = np.ones((H * W, 1))
    coords = np.hstack((X.reshape(-1, 1), Y.reshape(-1, 1), ones))

    Hl, Wl = int(H / scale), int(W / scale)
    imstack = np.zeros((nframes, Hl, Wl, 3), np.float32)
    Xstack = np.zeros((nframes, Hl, Wl), np.float32)
    Ystack = np.zeros_like(Xstack)
    mats = np.zeros((nframes, 2, 3))

    for idx in range(nframes):
        mat = euclidean_matrix(thetas[idx], shifts[idx])
        mats[idx] = mat
        cn = coords @ mat.T
        Xn = cn[:, 0].reshape(H, W).astype(np.float32)
        Yn = cn[:, 1].reshape(H, W).astype(np.float32)
        if scale != 1:
            Xn = cv2.resize(Xn, (Wl, Hl), interpolation=cv2.INTER_LINEAR)
            Yn = cv2.resize(Yn, (Wl, Hl), interpolation=cv2.INTER_LINEAR)
        imstack[idx] = _remap(im, Xn, Yn)
        Xstack[idx] = 2 * Xn / W - 1
        Ystack[idx] = 2 * Yn / H - 1
    return imstack, Xstack, Ystack, mats


def _remap(im, Xn, Yn):
    if cv2 is not None:
        return cv2.remap(im, Xn, Yn, cv2.INTER_LINEAR)
    # numpy bilinear fallback with zero border
    H, W = im.shape[:2]
    x0 = np.floor(Xn).astype(int)
    y0 = np.floor(Yn).astype(int)
    wx = (Xn - x0)[..., None]
    wy = (Yn - y0)[..., None]

    def tap(yy, xx):
        inb = ((xx >= 0) & (xx < W) & (yy >= 0) & (yy < H))[..., None]
        v = im[np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)]
        return np.where(inb, v, 0.0)

    top = tap(y0, x0) * (1 - wx) + tap(y0, x0 + 1) * wx
    bot = tap(y0 + 1, x0) * (1 - wx) + tap(y0 + 1, x0 + 1) * wx
    return (top * (1 - wy) + bot * wy).astype(im.dtype)


def downsample_burst(imstack_hr, scale):
    """Per-frame INTER_AREA downsample (wire_multi_sr.py:83-88)."""
    n, H, W, c = imstack_hr.shape
    out = np.zeros((n, H // scale, W // scale, c), np.float32)
    for i in range(n):
        if cv2 is not None:
            out[i] = cv2.resize(imstack_hr[i], None, fx=1 / scale,
                                fy=1 / scale, interpolation=cv2.INTER_AREA)
        else:
            out[i] = imstack_hr[i][:H // scale * scale, :W // scale * scale]\
                .reshape(H // scale, scale, W // scale, scale, c).mean((1, 3))
    return out


def register_burst(imstack, full_size):
    """Estimate rigid transforms of each frame against frame 0 by ECC
    intensity alignment (replaces pystackreg, motion.py:401-429 /
    register_stack_ecc motion.py:575-642) and derive warped HR coordinate
    grids in [-1, 1].

    imstack: (n, H, W) or (n, H, W, C) grayscale-able stack (LR frames);
    full_size: (H_hr, W_hr) of the target HR grid.
    Returns (Xstack, Ystack, ok_mask, mats).
    """
    if cv2 is None:
        raise RuntimeError("register_burst needs cv2 (or use "
                           "wire_tpu.native.registration)")
    n = imstack.shape[0]
    Hf, Wf = full_size
    Hl, Wl = imstack.shape[1], imstack.shape[2]
    sy, sx = Hf / Hl, Wf / Wl
    if imstack.ndim == 4:
        gray = imstack.mean(-1).astype(np.float32)
    else:
        gray = imstack.astype(np.float32)
    Y, X = np.mgrid[:Hf, :Wf]
    ones = np.ones((Hf * Wf, 1))
    coords = np.hstack((X.reshape(-1, 1), Y.reshape(-1, 1), ones))
    Xstack = np.zeros((n, Hf, Wf), np.float32)
    Ystack = np.zeros_like(Xstack)
    ok = np.ones(n, np.float32)
    mats = np.zeros((n, 2, 3), np.float32)
    criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-6)
    for i in range(n):
        warp = np.eye(2, 3, dtype=np.float32)
        if i > 0:
            try:
                _, warp = cv2.findTransformECC(gray[0], gray[i], warp,
                                               cv2.MOTION_EUCLIDEAN,
                                               criteria, None, 1)
            except cv2.error:
                ok[i] = 0.0
        # lift the LR-frame transform to HR pixel units
        mat = warp.copy()
        mat[0, 2] *= sx
        mat[1, 2] *= sy
        mats[i] = mat
        cn = coords @ mat.T
        Xstack[i] = cn[:, 0].reshape(Hf, Wf)
        Ystack[i] = cn[:, 1].reshape(Hf, Wf)
    Xstack = 2 * Xstack / Wf - 1
    Ystack = 2 * Ystack / Hf - 1
    return Xstack, Ystack, ok, mats


@dataclasses.dataclass
class FrameDataset:
    """Per-frame (coords, pixels, mask) arrays (ImageSRDataset semantics,
    motion.py:22-76) as dense jnp-able ndarrays:

    coords: (n, H*W, 2) warped HR grids; pixels: (n, Hl*Wl, C) LR frames;
    masks: (n, Hl*Wl, C) validity masks.
    """
    coords: np.ndarray
    pixels: np.ndarray
    masks: np.ndarray

    @classmethod
    def build(cls, imstack_lr, Xstack, Ystack, masks=None):
        n, Hl, Wl, c = imstack_lr.shape
        coords = np.stack([Xstack, Ystack], axis=-1).reshape(n, -1, 2)
        pixels = imstack_lr.reshape(n, -1, c)
        if masks is None:
            masks = np.ones_like(pixels)
        else:
            masks = masks.reshape(n, -1, c)
        return cls(coords.astype(np.float32), pixels.astype(np.float32),
                   masks.astype(np.float32))
