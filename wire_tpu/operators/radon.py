"""Differentiable Radon transform.

Reproduces the reference operator (lin_inverse.py:19-40): rotate the image by
every measurement angle (kornia/OpenCV convention, bilinear, zero padding)
and sum over rows, yielding a (nangles, W) sinogram.  Here the per-angle
rotation+reduction is a vmapped gather+lerp, fused by XLA; gradients flow to
the image by construction.

``jax.checkpoint`` wraps the per-angle body so the backward pass recomputes
rotations instead of storing nangles full-size intermediates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from wire_tpu.ops.resample import rotate


def radon(img, angles_degrees, *, checkpoint=True):
    """img: (H, W) image; angles: (nangles,) degrees.
    Returns (nangles, W) sinogram = sum over rows of each rotated image."""

    def project(angle):
        return jnp.sum(rotate(img, angle), axis=0)

    if checkpoint:
        project = jax.checkpoint(project)
    return jax.vmap(project)(jnp.asarray(angles_degrees))


def radon_batch(imgs, angles_degrees, **kw):
    """(nimg, H, W) -> (nimg, nangles, W), matching lin_inverse.radon's
    batched output layout."""
    return jax.vmap(lambda im: radon(im, angles_degrees, **kw))(imgs)
