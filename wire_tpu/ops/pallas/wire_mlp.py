"""Fused Pallas TPU kernel for the WIRE complex-Gabor MLP.

The whole forward pass (real first layer -> complex Gabor activation ->
hidden_layers x (complex GEMM + Gabor) -> final complex GEMM, real part) runs
in ONE kernel per coordinate tile: weights live in VMEM for the duration,
activations never round-trip to HBM, complex math is explicit (re, im) f32
pairs on the MXU, and the transcendentals (exp/cos/sin) fuse on the VPU.

The custom VJP recomputes the forward inside the backward kernel (the
activations are cheaper to recompute than to store: one extra MXU pass vs
~N*h*4B*layers of HBM residual traffic) and accumulates weight gradients
across the sequential TPU grid into revisited output blocks.

This replaces the per-op XLA path of modules/wire.py:88-93's hottest stack
(SURVEY.md §3.5): a 3-4 deep chain of (complex GEMM + transcendental
activation) per training step.

Semantics match wire_tpu.nn.models.wire_apply exactly (same params pytree);
`wire_mlp` dispatches to the fused kernel on TPU and the jnp reference
elsewhere.
"""
from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pad_params(params, hidden_layers, hp, op):
    """Zero-pad weights to lane-aligned shapes. Padded activation lanes do
    produce nonzero Gabor values (exp(0)=1), but every consumer weight row in
    the padding region is zero, so outputs and weight-grad slices stay
    exact."""
    d = params["first"]["w"].shape[0]
    out = {
        "w1": jnp.pad(params["first"]["w"], ((0, 0), (0, hp - params["first"]["w"].shape[1]))),
        "b1": jnp.pad(params["first"]["b"], (0, hp - params["first"]["b"].shape[0]))[None, :],
    }
    h = params["first"]["w"].shape[1]
    for i in range(hidden_layers):
        p = params[f"hidden_{i}"]
        for nm in ("wr", "wi"):
            out[f"h{i}{nm}"] = jnp.pad(p[nm], ((0, hp - h), (0, hp - h)))
        for nm in ("br", "bi"):
            out[f"h{i}{nm}"] = jnp.pad(p[nm], (0, hp - h))[None, :]
    f = params["final"]
    o = f["br"].shape[0]
    out["fwr"] = jnp.pad(f["wr"], ((0, hp - h), (0, op - o)))
    out["fwi"] = jnp.pad(f["wi"], ((0, hp - h), (0, op - o)))
    out["fbr"] = jnp.pad(f["br"], (0, op - o))[None, :]
    return out, d, h, o


def _gabor_first(z, omega0, sigma0):
    m = jnp.exp(-(sigma0 * sigma0) * (z * z))
    ph = omega0 * z
    return m * jnp.cos(ph), m * jnp.sin(ph)


def _gabor(zr, zi, omega0, sigma0):
    m = jnp.exp(-omega0 * zi - (sigma0 * sigma0) * (zr * zr + zi * zi))
    ph = omega0 * zr
    return m * jnp.cos(ph), m * jnp.sin(ph)


def _make_dot(precision):
    """MXU dot accumulating in f32.  precision='default' uses the MXU's
    native path (on TPU this truncates f32 inputs to bf16 — XLA's default
    matmul precision; measured bitwise-identical to an explicit bf16 cast on
    v5e); 'highest' forces full-f32 multi-pass matmuls for exact f32
    semantics (CPU-parity debugging, slower on TPU)."""
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)

    def _dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=prec)

    def _dot_tn(a, b):
        # a.T @ b without materializing the transpose: contract dim 0 of
        # both operands (the MXU consumes this directly)
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    def _dot_nt(a, b):
        # a @ b.T: contract dim 1 of both operands
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
    return _dot, _dot_tn, _dot_nt


def _forward_tile(c, w, L, omega0, sigma0, first_omega0, _dot):
    """Shared forward recurrence on one coordinate tile.  Stores ONLY the
    pre-activations (z1, then (zr, zi) per hidden layer): the backward
    recomputes the Gabor factors per layer on the VPU, which measures free
    (the kernel is MXU-bound) and keeps the live VMEM set small enough for
    large coordinate tiles."""
    z1 = _dot(c, w["w1"]) + w["b1"]
    ar, ai = _gabor_first(z1, first_omega0, sigma0)
    acts = [z1]
    for i in range(L):
        zr = _dot(ar, w[f"h{i}wr"]) - _dot(ai, w[f"h{i}wi"]) + w[f"h{i}br"]
        zi = _dot(ar, w[f"h{i}wi"]) + _dot(ai, w[f"h{i}wr"]) + w[f"h{i}bi"]
        ar, ai = _gabor(zr, zi, omega0, sigma0)
        acts.append((zr, zi))
    yr = _dot(ar, w["fwr"]) - _dot(ai, w["fwi"]) + w["fbr"]
    return acts, yr


def _make_fwd_kernel(L, omega0, sigma0, first_omega0, names, precision):
    _dot, _, _ = _make_dot(precision)

    def kernel(*refs):
        c_ref = refs[0]
        w = {nm: refs[1 + k] for k, nm in enumerate(names)}
        out_ref = refs[1 + len(names)]
        wv = {nm: w[nm][:] for nm in names}
        _, yr = _forward_tile(c_ref[:], wv, L, omega0, sigma0, first_omega0,
                              _dot)
        out_ref[:] = yr
    return kernel


def _make_bwd_kernel(L, omega0, sigma0, first_omega0, names, precision):
    """Recompute forward, backprop, accumulate weight grads across the
    sequential grid; also emits dcoords."""
    _dot, _dot_tn, _dot_nt = _make_dot(precision)

    def kernel(*refs):
        c_ref = refs[0]
        g_ref = refs[1]
        w = {nm: refs[2 + k][:] for k, nm in enumerate(names)}
        outs = refs[2 + len(names):]
        # outputs: dcoords tile + one accumulator per weight name
        dc_ref = outs[0]
        dacc = {nm: outs[1 + k] for k, nm in enumerate(names)}
        i = pl.program_id(0)

        c = c_ref[:]
        acts, _ = _forward_tile(c, w, L, omega0, sigma0, first_omega0, _dot)
        g = g_ref[:]

        def acc(nm, val):
            @pl.when(i == 0)
            def _():
                dacc[nm][:] = val

            @pl.when(i != 0)
            def _():
                dacc[nm][:] += val

        s2 = sigma0 * sigma0
        z1 = acts[0]

        def factors(li):
            """Gabor factors of layer li's activation (0 = first layer)."""
            if li == 0:
                m = jnp.exp(-s2 * (z1 * z1))
                ph = first_omega0 * z1
            else:
                zr, zi = acts[li]
                m = jnp.exp(-omega0 * zi - s2 * (zr * zr + zi * zi))
                ph = omega0 * zr
            return m, jnp.cos(ph), jnp.sin(ph)

        # final layer: yr = ar@fwr - ai@fwi + fbr
        m, cos, sin = factors(L)
        ar, ai = m * cos, m * sin
        acc("fwr", _dot_tn(ar, g))
        acc("fwi", -_dot_tn(ai, g))
        acc("fbr", jnp.sum(g, axis=0, keepdims=True))
        dar = _dot_nt(g, w["fwr"])
        dai = -_dot_nt(g, w["fwi"])

        for li in range(L - 1, -1, -1):
            # a = m * (cos ph, sin ph), m = exp(-w*zi - s2(zr^2+zi^2)),
            # ph = w*zr
            zr, zi = acts[li + 1]
            m, cos, sin = factors(li + 1)
            dm = dar * cos + dai * sin
            dph = m * (-dar * sin + dai * cos)
            dzr = dm * (-2.0 * s2 * zr) * m + omega0 * dph
            dzi = dm * (-omega0 - 2.0 * s2 * zi) * m
            # z = a_prev (complex) @ W (complex) + b
            pm, pcos, psin = factors(li)
            par, pai = pm * pcos, pm * psin
            acc(f"h{li}wr", _dot_tn(par, dzr) + _dot_tn(pai, dzi))
            acc(f"h{li}wi", _dot_tn(par, dzi) - _dot_tn(pai, dzr))
            acc(f"h{li}br", jnp.sum(dzr, axis=0, keepdims=True))
            acc(f"h{li}bi", jnp.sum(dzi, axis=0, keepdims=True))
            dar = (_dot_nt(dzr, w[f"h{li}wr"]) + _dot_nt(dzi, w[f"h{li}wi"]))
            dai = (-_dot_nt(dzr, w[f"h{li}wi"]) + _dot_nt(dzi, w[f"h{li}wr"]))

        # first layer: z1 real; a = (exp(-s2 z^2) cos(w0 z),
        #                            exp(-s2 z^2) sin(w0 z))
        m, cos, sin = factors(0)
        dz = (dar * (m * (-2.0 * s2 * z1) * cos - m * first_omega0 * sin)
              + dai * (m * (-2.0 * s2 * z1) * sin + m * first_omega0 * cos))
        acc("w1", _dot_tn(c, dz))
        acc("b1", jnp.sum(dz, axis=0, keepdims=True))
        dc_ref[:] = _dot_nt(dz, w["w1"])

    return kernel


@functools.lru_cache(maxsize=32)
def _programs(L, omega0, sigma0, first_omega0, d, h, o, tile_n, n_tiles,
              interpret, precision="default"):
    hp = _round_up(h, 128)
    op = _round_up(max(o, 1), 128)
    names = ["w1", "b1"]
    for i in range(L):
        names += [f"h{i}wr", f"h{i}wi", f"h{i}br", f"h{i}bi"]
    names += ["fwr", "fwi", "fbr"]

    shapes = {"w1": (d, hp), "b1": (1, hp), "fwr": (hp, op),
              "fwi": (hp, op), "fbr": (1, op)}
    for i in range(L):
        shapes[f"h{i}wr"] = (hp, hp)
        shapes[f"h{i}wi"] = (hp, hp)
        shapes[f"h{i}br"] = (1, hp)
        shapes[f"h{i}bi"] = (1, hp)

    def wspec(nm):
        s = shapes[nm]
        zeros = (0,) * len(s)
        return pl.BlockSpec(s, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    fwd = pl.pallas_call(
        _make_fwd_kernel(L, omega0, sigma0, first_omega0, names, precision),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + [wspec(nm) for nm in names],
        out_specs=pl.BlockSpec((tile_n, op), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_n, op), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    bwd = pl.pallas_call(
        _make_bwd_kernel(L, omega0, sigma0, first_omega0, names, precision),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_n, op), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + [wspec(nm) for nm in names],
        out_specs=[pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)]
                  + [wspec(nm) for nm in names],
        out_shape=[jax.ShapeDtypeStruct((n_tiles * tile_n, d), jnp.float32)]
                  + [jax.ShapeDtypeStruct(shapes[nm], jnp.float32)
                     for nm in names],
        interpret=interpret,
        # the weight-grad accumulators are revisited every grid step, so the
        # grid is sequential ("arbitrary"); raise the scoped-VMEM cap to
        # allow large coordinate tiles (v5e has 128MiB VMEM)
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return fwd, bwd, names, hp, op


TILE_N = 512


def _flatten_for_kernel(params, L, hp, op):
    padded, d, h, o = _pad_params(params, L, hp, op)
    return padded, d, h, o


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _wire_fused(params, coords, L, omega0, sigma0, first_omega0, interpret,
                precision):
    out, _ = _wire_fused_fwd(params, coords, L, omega0, sigma0,
                             first_omega0, interpret, precision)
    return out


def _wire_fused_fwd(params, coords, L, omega0, sigma0, first_omega0,
                    interpret, precision):
    n, d = coords.shape
    h = params["first"]["w"].shape[1]
    o = params["final"]["br"].shape[0]
    hp = _round_up(h, 128)
    op = _round_up(max(o, 1), 128)
    n_pad = _round_up(n, TILE_N)
    n_tiles = n_pad // TILE_N
    fwd, _, names, hp, op = _programs(L, float(omega0), float(sigma0),
                                      float(first_omega0), d, h, o, TILE_N,
                                      n_tiles, interpret, precision)
    padded, _, _, _ = _pad_params(params, L, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    out = fwd(cpad, *[padded[nm] for nm in names])
    return out[:n, :o], (params, coords)


def _wire_fused_bwd(L, omega0, sigma0, first_omega0, interpret, precision,
                    res, g):
    params, coords = res
    n, d = coords.shape
    h = params["first"]["w"].shape[1]
    o = params["final"]["br"].shape[0]
    hp = _round_up(h, 128)
    op = _round_up(max(o, 1), 128)
    n_pad = _round_up(n, TILE_N)
    n_tiles = n_pad // TILE_N
    _, bwd, names, hp, op = _programs(L, float(omega0), float(sigma0),
                                      float(first_omega0), d, h, o, TILE_N,
                                      n_tiles, interpret, precision)
    padded, _, _, _ = _pad_params(params, L, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    gpad = jnp.pad(g, ((0, n_pad - n), (0, op - o)))
    outs = bwd(cpad, gpad, *[padded[nm] for nm in names])
    dc = outs[0][:n]
    dw = {nm: outs[1 + k] for k, nm in enumerate(names)}
    dparams = {
        "first": {"w": dw["w1"][:, :h], "b": dw["b1"][0, :h]},
        "final": {"wr": dw["fwr"][:h, :o], "wi": dw["fwi"][:h, :o],
                  "br": dw["fbr"][0, :o],
                  "bi": jnp.zeros_like(params["final"]["bi"])},
    }
    for i in range(L):
        dparams[f"hidden_{i}"] = {
            "wr": dw[f"h{i}wr"][:h, :h], "wi": dw[f"h{i}wi"][:h, :h],
            "br": dw[f"h{i}br"][0, :h], "bi": dw[f"h{i}bi"][0, :h]}
    return dparams, dc


_wire_fused.defvjp(_wire_fused_fwd, _wire_fused_bwd)


def wire_mlp_fused(params, coords, spec, interpret=False):
    """Fused WIRE forward with custom fused VJP. coords (..., d) -> (..., o).

    Note: yi (the imaginary output) is discarded by the model, so
    dfinal.bi == 0 and dfinal.wi carries only the -ai^T g term — identical
    to autodiff of the jnp path."""
    lead = coords.shape[:-1]
    c2 = coords.reshape(-1, coords.shape[-1])
    out = _wire_fused(params, c2, spec.hidden_layers, float(spec.hidden_omega0),
                      float(spec.scale), float(spec.first_omega0), interpret,
                      getattr(spec, "gemm_precision", "default"))
    return out.reshape(*lead, out.shape[-1])
