"""Differentiable resampling primitives: bilinear gather-sampling, image
rotation, grid_sample, and area pooling.

The rotation reproduces the kornia/OpenCV convention the reference's Radon
operator relies on (lin_inverse.py:33 uses kornia.geometry.rotate, which is
documented to match ``cv2.getRotationMatrix2D`` + ``warpAffine``): rotation
by ``angle`` degrees about the pixel center ((W-1)/2, (H-1)/2), bilinear
interpolation, zero padding.  Differentiable w.r.t. the image by
construction (gather + lerp).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def bilinear_sample(img, xs, ys):
    """Sample ``img`` (H, W) or (H, W, C) at float pixel coords (xs, ys)
    (arbitrary matching shapes), bilinear with zero padding outside."""
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        v = img[yi_c, xi_c]
        if img.ndim == 3:
            inb = inb[..., None]
        return jnp.where(inb, v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    if img.ndim == 3:
        wx = wx[..., None]
        wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def rotate(img, angle_degrees):
    """Rotate (H, W[, C]) image by ``angle_degrees`` (OpenCV/kornia sign
    convention: positive = counter-clockwise on screen) about the pixel
    center, bilinear, zero padding."""
    H, W = img.shape[0], img.shape[1]
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    t = jnp.deg2rad(jnp.asarray(angle_degrees, jnp.float32))
    cos, sin = jnp.cos(t), jnp.sin(t)
    ys, xs = jnp.mgrid[0:H, 0:W]
    xs = xs.astype(jnp.float32) - cx
    ys = ys.astype(jnp.float32) - cy
    # dst(x,y) = src(R^{-1}(x,y)); cv2's y axis points down so CCW on screen
    # is the matrix below (matches getRotationMatrix2D + warpAffine).
    sx = cos * xs - sin * ys + cx
    sy = sin * xs + cos * ys + cy
    return bilinear_sample(img, sx, sy)


def rotate_stack(img, angles_degrees):
    """vmap of rotate over a vector of angles: (H, W) -> (nangles, H, W)."""
    return jax.vmap(lambda a: rotate(img, a))(jnp.asarray(angles_degrees))


def grid_sample(img, grid, align_corners=True):
    """torch.nn.functional.grid_sample equivalent for one image.

    img: (H, W[, C]); grid: (..., 2) normalized coords in [-1, 1], last dim
    (x, y); bilinear, zeros padding."""
    H, W = img.shape[0], img.shape[1]
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        xs = (gx + 1) * (W - 1) / 2
        ys = (gy + 1) * (H - 1) / 2
    else:
        xs = ((gx + 1) * W - 1) / 2
        ys = ((gy + 1) * H - 1) / 2
    return bilinear_sample(img, xs, ys)


def avg_pool2d(img_nchw, k):
    """AvgPool2d(k) with stride=k (wire_SISR.py:185) — exact reshape-mean,
    requires H, W divisible by k."""
    N, C, H, W = img_nchw.shape
    x = img_nchw.reshape(N, C, H // k, k, W // k, k)
    return x.mean(axis=(3, 5))


def area_downsample_hwc(img_hwc, k):
    """Box-average downsample for (H, W, C) by integer factor k."""
    H, W = img_hwc.shape[0], img_hwc.shape[1]
    x = img_hwc.reshape(H // k, k, W // k, k, -1)
    out = x.mean(axis=(1, 3))
    return out.reshape(H // k, W // k, *img_hwc.shape[2:])
