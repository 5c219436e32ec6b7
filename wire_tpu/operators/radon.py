"""Differentiable Radon transform, two implementations:

- ``method='rotate'``: exact reproduction of the reference operator
  (lin_inverse.py:19-40): per-angle bilinear rotation (kornia/OpenCV
  convention, zero padding) then row sum.  Gather-based — precise, fast on
  CPU, but TPU gathers make it ~2.7ms/angle.

- ``method='shear'`` (default on TPU): FFT three-shear rotation.  Each
  rotation is decomposed into a 90-degree-multiple pre-rotation (exact
  transpose/flip) plus a residual in [-45, 45] degrees applied as three
  per-row/column fractional translations, each a Fourier phase multiply —
  no gathers at all, ~65x faster on TPU.  The image is zero-padded 2x so
  nothing wraps.  Interpolation is periodic-sinc rather than bilinear:
  for signals supported inside the inscribed circle (the standard CT
  assumption; the reference's chest phantom) the two agree to interpolation
  error; parity tests use 'rotate'.

Both are linear in the image, so gradients are exact by construction.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from wire_tpu.ops.resample import rotate


def radon(img, angles_degrees, *, method="auto", checkpoint=True):
    """img: (H, W) image; angles: (nangles,) degrees.
    Returns (nangles, W) sinogram = sum over rows of each rotated image."""
    if method == "auto":
        method = "shear" if jax.default_backend() == "tpu" else "rotate"
    if method == "rotate":
        def project(angle):
            return jnp.sum(rotate(img, angle), axis=0)
        if checkpoint:
            project = jax.checkpoint(project)
        return jax.vmap(project)(jnp.asarray(angles_degrees))
    if method == "shear":
        return _radon_shear(img, jnp.asarray(angles_degrees))
    raise ValueError(method)


def radon_batch(imgs, angles_degrees, **kw):
    """(nimg, H, W) -> (nimg, nangles, W), matching lin_inverse.radon's
    batched output layout."""
    return jax.vmap(lambda im: radon(im, angles_degrees, **kw))(imgs)


# ---------------------------------------------------------------------------
# FFT three-shear path
# ---------------------------------------------------------------------------

def _fft_size(minimum):
    """Smallest 2^a*3^b size >= minimum (FFT-friendly)."""
    best = 1 << (int(minimum) - 1).bit_length()
    p3 = 1
    while p3 < best:
        p2 = 1
        while p2 * p3 < minimum:
            p2 *= 2
        best = min(best, p2 * p3)
        p3 *= 3
    return best


def _shear_x_from_rfft(F, ty, P):
    """Per-row fractional translate given the row rfft: out[y, x] =
    in[y, x - ty[y]]."""
    k = jnp.fft.rfftfreq(P).astype(ty.dtype)
    phase = jnp.exp(-2j * jnp.pi * k[None, :] * ty[:, None])
    return jnp.fft.irfft(F * phase, n=P, axis=1).astype(ty.dtype)


def _shear_x(im, ty):
    return _shear_x_from_rfft(jnp.fft.rfft(im, axis=1), ty, im.shape[1])


def _shear_y(im, tx):
    F = jnp.fft.rfft(im, axis=0)
    k = jnp.fft.rfftfreq(im.shape[0]).astype(im.dtype)
    phase = jnp.exp(-2j * jnp.pi * k[:, None] * tx[None, :])
    return jnp.fft.irfft(F * phase, n=im.shape[0], axis=0).astype(im.dtype)


def _radon_shear(img, angles_degrees):
    H, W = img.shape
    S = max(H, W)
    # pad to a centered square with margin so shears never wrap (rotated
    # content stays within a sqrt(2)*S/2-radius disk; intermediate shear
    # states stay within ~0.78*S half-extent)
    P = _fft_size(int(np.ceil(1.6 * S)) + 2)
    py0 = (P - H) // 2
    px0 = (P - W) // 2
    pad = jnp.zeros((P, P), img.dtype)
    pad = pad.at[py0:py0 + H, px0:px0 + W].set(img)
    cy = (P - 1) / 2.0
    yy = jnp.arange(P, dtype=img.dtype) - cy
    xx = jnp.arange(P, dtype=img.dtype) - cy

    theta = jnp.deg2rad(angles_degrees.astype(img.dtype))
    # positive screen-CCW rotation of the image corresponds to the rotate()
    # convention; decompose theta = 90*k + phi with phi in [-45, 45]
    k = jnp.clip(jnp.round(theta / (jnp.pi / 2)).astype(jnp.int32), 0, 2)
    phi = theta - k.astype(img.dtype) * (jnp.pi / 2)

    # three 90-degree pre-rotations (exact); their row-ffts are shared by
    # every angle with the same k
    variants = jnp.stack([pad, jnp.rot90(pad, 1), jnp.rot90(pad, 2)])
    F1 = jnp.fft.rfft(variants, axis=2)

    def project(k_i, phi_i):
        # inverse-warp shears implementing dst(x,y)=src(R(phi)(x,y)):
        # R(phi) = Shx(a) Shy(b) Shx(a), a = tan(phi/2), b = -sin(phi)
        a = jnp.tan(phi_i / 2)
        b = -jnp.sin(phi_i)
        im1 = _shear_x_from_rfft(F1[k_i], a * yy, P)
        im2 = _shear_y(im1, b * xx)
        im3 = _shear_x(im2, a * yy)
        return jnp.sum(im3, axis=0)

    sino = jax.vmap(project)(k, phi)
    return sino[:, px0:px0 + W]
