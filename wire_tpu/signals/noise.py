"""Sensor noise model: Poisson photon noise at integration time tau plus
Gaussian readout noise, with the reference's signed-Poisson trick for
non-positive intensities (utils.py:85-112 ``measure``).

Both a host (numpy) and an on-device (jax.random) implementation are
provided; the numpy one mirrors the reference's call pattern for artifact
parity, the jax one serves jit-able synthetic pipelines.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def measure_np(x, noise_snr=40, tau=100, rng=None):
    """Reference-parity host noise model (utils.py:85-112).

    noise_snr is the readout noise *sigma in electrons* (despite the name),
    tau the photon integration time.
    """
    rng = np.random if rng is None else rng
    x = np.asarray(x)
    noise = rng.randn(x.size).reshape(x.shape) * noise_snr
    if tau != float("inf"):
        xm = x * tau
        out = np.empty_like(xm)
        pos = x > 0
        out[pos] = rng.poisson(xm[pos])
        out[~pos] = -rng.poisson(-xm[~pos])
        out = (out + noise) / tau
    else:
        out = x + noise
    return out.astype(x.dtype, copy=False)


def measure(key, x, noise_snr=40, tau=100):
    """On-device equivalent using jax.random (same law, different stream)."""
    kn, kp = jax.random.split(key)
    noise = jax.random.normal(kn, x.shape, x.dtype) * noise_snr
    if tau == float("inf"):
        return x + noise
    lam = jnp.abs(x) * tau
    pois = jax.random.poisson(kp, lam, x.shape).astype(x.dtype)
    signed = jnp.where(x > 0, pois, -pois)
    return (signed + noise) / tau


def salt_and_pepper_np(image, salt_prob, pepper_prob, rng=None):
    """utils.py:114-129 semantics (mask over leading 2 dims)."""
    rng = np.random if rng is None else rng
    out = np.copy(image)
    salt = rng.random(image.shape[:2]) < salt_prob
    pepper = rng.random(image.shape[:2]) < pepper_prob
    out[salt] = 255
    out[pepper] = 0
    return out
