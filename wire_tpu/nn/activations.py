"""INR activation family, as pure jnp functions.

Complex quantities are explicit ``(re, im)`` pairs of real float arrays so
every matmul runs on the MXU and the transcendentals vectorize on the VPU —
no jnp.complex64 anywhere on the compute path.

Reference behavior being matched (file:line cites are into /root/reference):
- complex Gabor  exp(1j*omega*z - |sigma*z|^2)        modules/wire.py:88-93
- 2D Gabor       exp(1j*omega*lin)*exp(-s^2(|lin|^2+|orth|^2))  modules/wire2d.py:56-67
- sine           sin(omega * Wx)                       modules/siren.py:48-49
- gauss          exp(-(scale*Wx)^2)                    modules/gauss.py:27-28
- quadratic B-spline (4-term relu^2 form)              modules/bspline_form.py:38-49
- cubic B-spline (5-term relu^3 form)                  modules/bspline_cubic.py:41-52
- srelu / sigmoid / De Boor B-spline approximations    modules/bspline_imp/*
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Complex Gabor (WIRE)
# ---------------------------------------------------------------------------

def complex_gabor(zr, zi, omega0, sigma0):
    """exp(1j*omega0*z - |sigma0*z|^2) for z = zr + 1j*zi.

    = exp(-omega0*zi - sigma0^2*(zr^2+zi^2)) * (cos(omega0*zr) + 1j sin(...)).
    Returns (re, im).
    """
    mag = jnp.exp(-omega0 * zi - (sigma0 * sigma0) * (zr * zr + zi * zi))
    phase = omega0 * zr
    return mag * jnp.cos(phase), mag * jnp.sin(phase)


def complex_gabor_real_input(z, omega0, sigma0):
    """Same activation with a real-valued pre-activation (first WIRE layer)."""
    mag = jnp.exp(-(sigma0 * sigma0) * (z * z))
    phase = omega0 * z
    return mag * jnp.cos(phase), mag * jnp.sin(phase)


def complex_gabor2d(lin_r, lin_i, orth_r, orth_i, omega0, sigma0):
    """WIRE-2D activation: exp(1j*omega0*lin) * exp(-sigma0^2(|lin|^2+|orth|^2)).

    exp(1j*omega0*lin) for complex lin contributes magnitude exp(-omega0*lin_i).
    """
    arg = lin_r * lin_r + lin_i * lin_i + orth_r * orth_r + orth_i * orth_i
    mag = jnp.exp(-omega0 * lin_i - (sigma0 * sigma0) * arg)
    phase = omega0 * lin_r
    return mag * jnp.cos(phase), mag * jnp.sin(phase)


# ---------------------------------------------------------------------------
# Real activations
# ---------------------------------------------------------------------------

def sine(z, omega0):
    return jnp.sin(omega0 * z)


def gauss(z, scale):
    s = scale * z
    return jnp.exp(-(s * s))


def relu(z):
    return jax.nn.relu(z)


def _qrelu(x):
    r = jax.nn.relu(x)
    return r * r


def _crelu(x):
    r = jax.nn.relu(x)
    return r * r * r


def bspline_quadratic(z):
    """Quadratic B-spline basis from 4 shifted relu^2 terms
    (modules/bspline_form.py:41-49). Input is the already-scaled argument."""
    return (0.5 * _qrelu(z + 1.5)
            - 1.5 * _qrelu(z + 0.5)
            + 1.5 * _qrelu(z - 0.5)
            - 0.5 * _qrelu(z - 1.5))


def bspline_cubic(z):
    """Cubic B-spline basis from 5 shifted relu^3 terms
    (modules/bspline_cubic.py:44-52)."""
    return ((1.0 / 6.0) * _crelu(z + 2.0)
            - (2.0 / 3.0) * _crelu(z + 1.0)
            + _crelu(z)
            - (2.0 / 3.0) * _crelu(z - 1.0)
            + (1.0 / 6.0) * _crelu(z - 2.0))


def bspline_srelu(z, sigma0):
    """(relu(-(sigma0*z - 1)) * relu(sigma0*z))^2
    (modules/bspline_imp/bspline_srelu.py:29-32)."""
    s = sigma0 * z
    v = jax.nn.relu(1.0 - s) * jax.nn.relu(s)
    return v * v


def bspline_sigmoid(z, first_coord_negative, omega0, sigma0):
    """Sigmoid-pair B-spline bump (modules/bspline_imp/bspline_sig.py:31-37),
    implemented *as intended*: the reference branches per-element in Python on
    the sign of the first input coordinate; here the branch is a vectorized
    select over the batch.

    first_coord_negative: boolean array broadcastable against z's batch dims.
    """
    scale_in = sigma0 * z
    shift = sigma0 * omega0
    neg = jax.nn.sigmoid(scale_in - shift)      # 1/(1+exp(-s*z + s*w))
    pos = jax.nn.sigmoid(-scale_in - shift)     # 1/(1+exp( s*z + s*w))
    return jnp.where(first_coord_negative, neg, pos)


def bspline_deboor(z, knots, degree=2):
    """Quadratic B-spline basis N_{i,k} evaluated by the De Boor recursion on a
    fixed knot vector (modules/bspline_imp/bspline_knots.py:28-63).  The
    recursion is unrolled statically (degree is a Python int)."""
    knots = jnp.asarray(knots, dtype=z.dtype)

    def basis(i, k):
        if k == 0:
            return jnp.where((knots[i] <= z) & (z < knots[i + 1]), 1.0, 0.0)
        d1 = knots[i + k] - knots[i]
        d2 = knots[i + k + 1] - knots[i + 1]
        t1 = jnp.where(d1 != 0, (z - knots[i]) / jnp.where(d1 != 0, d1, 1.0), 0.0)
        t2 = jnp.where(d2 != 0, (knots[i + k + 1] - z) / jnp.where(d2 != 0, d2, 1.0), 0.0)
        return t1 * basis(i, k - 1) + t2 * basis(i + 1, k - 1)

    return basis(2, degree)


def posenc(coords, num_frequencies, in_features):
    """NeRF-style positional encoding (modules/relu.py:62-74): for each
    frequency i and input channel j append sin(2^i*pi*c_j), cos(2^i*pi*c_j),
    preserving the reference's interleaving order."""
    parts = [coords]
    for i in range(num_frequencies):
        for j in range(in_features):
            c = coords[..., j:j + 1]
            parts.append(jnp.sin((2.0 ** i) * jnp.pi * c))
            parts.append(jnp.cos((2.0 ** i) * jnp.pi * c))
    return jnp.concatenate(parts, axis=-1)
