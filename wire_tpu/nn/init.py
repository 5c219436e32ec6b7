"""Parameter initializers.

Matches the initialization *distributions* the reference PyTorch models use
(``torch.nn.Linear`` default = Kaiming-uniform with a=sqrt(5), i.e.
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias; SIREN's custom uniform
scheme; MFN's Gabor-filter init).  Weights are stored transposed relative to
torch — shape ``(in, out)`` — so the forward pass is a plain ``x @ w`` that maps
directly onto the MXU.

Reference behavior: torch Linear default init (used throughout the reference
model zoo, e.g. modules/wire.py:83, modules/bspline_form.py:26); SIREN init
modules/siren.py:39-46,78-81; MFN init modules/mfn.py:12-19.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_params(key, in_features, out_features, *, bias=True,
                  w_bound=None, b_bound=None, dtype=jnp.float32):
    """torch.nn.Linear-style params: w ~ U(-1/sqrt(in), 1/sqrt(in)), same for b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_features)
    w = uniform(kw, (in_features, out_features),
                bound if w_bound is None else w_bound, dtype)
    p = {"w": w}
    if bias:
        p["b"] = uniform(kb, (out_features,),
                         bound if b_bound is None else b_bound, dtype)
    return p


def complex_linear_params(key, in_features, out_features, *, bias=True,
                          dtype=jnp.float32):
    """Complex linear stored as (re, im) real pairs.

    torch initializes cfloat Linears by filling real and imaginary parts
    independently from the same uniform law, with fan_in counted in complex
    elements (modules/wire.py:83-86) — mirrored here.
    """
    kr, ki = jax.random.split(key)
    pr = linear_params(kr, in_features, out_features, bias=bias, dtype=dtype)
    pi = linear_params(ki, in_features, out_features, bias=bias, dtype=dtype)
    p = {"wr": pr["w"], "wi": pi["w"]}
    if bias:
        p["br"] = pr["b"]
        p["bi"] = pi["b"]
    return p


def siren_linear_params(key, in_features, out_features, *, is_first, omega0,
                        bias=True, dtype=jnp.float32):
    """SIREN init (modules/siren.py:39-46): first U(-1/in, 1/in), hidden
    U(-sqrt(6/in)/omega0, +...); bias keeps the torch default bound."""
    kw, kb = jax.random.split(key)
    if is_first:
        w_bound = 1.0 / in_features
    else:
        w_bound = np.sqrt(6.0 / in_features) / omega0
    w = uniform(kw, (in_features, out_features), w_bound, dtype)
    p = {"w": w}
    if bias:
        p["b"] = uniform(kb, (out_features,), 1.0 / np.sqrt(in_features), dtype)
    return p


def siren_final_linear_params(key, in_features, out_features, *, omega0,
                              dtype=jnp.float32):
    """Final SIREN linear (modules/siren.py:78-81): U(-sqrt(6/h)/omega0, ...)."""
    kw, kb = jax.random.split(key)
    bound = np.sqrt(6.0 / in_features) / max(omega0, 1e-12)
    return {
        "w": uniform(kw, (in_features, out_features), bound, dtype),
        "b": uniform(kb, (out_features,), 1.0 / np.sqrt(in_features), dtype),
    }


def mfn_gabor_params(key, in_features, out_features, alpha, beta=1.0,
                     dtype=jnp.float32):
    """MFN Gabor filter params (modules/mfn.py:12-19): mu ~ U(-1,1),
    gamma ~ Gamma(alpha, beta), linear weight scaled by 128*sqrt(gamma),
    bias ~ U(-pi, pi)."""
    kmu, kg, kw, kb = jax.random.split(key, 4)
    mu = jax.random.uniform(kmu, (out_features, in_features), dtype,
                            minval=-1.0, maxval=1.0)
    gamma = jax.random.gamma(kg, alpha, (out_features,), dtype) / beta
    bound = 1.0 / np.sqrt(in_features)
    w = uniform(kw, (in_features, out_features), bound, dtype)
    w = w * 128.0 * jnp.sqrt(gamma)[None, :]
    b = jax.random.uniform(kb, (out_features,), dtype,
                           minval=-np.pi, maxval=np.pi)
    return {"mu": mu, "gamma": gamma, "w": w, "b": b}
