#!/usr/bin/env python
"""Experiment: stacked complex GEMMs for the fused WIRE kernel.

A complex matmul (ar+i*ai)@(wr+i*wi) is four h x h real GEMMs. Stacking
A=[ar|ai] (N,2h) against W=[[wr,wi],[-wi,wr]] (2h,2h) computes the same
thing in ONE GEMM with doubled M/K — same MACs, bigger MXU tiles, one
instruction stream stall instead of four.

Validates vs the jnp reference path and times fwd / fwd+bwd on TPU.
"""
import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def _round_up(x, m):
    return (x + m - 1) // m * m


def _gabor_first(z, omega0, sigma0):
    m = jnp.exp(-(sigma0 * sigma0) * (z * z))
    ph = omega0 * z
    return m * jnp.cos(ph), m * jnp.sin(ph)


def _gabor(zr, zi, omega0, sigma0):
    m = jnp.exp(-omega0 * zi - (sigma0 * sigma0) * (zr * zr + zi * zi))
    ph = omega0 * zr
    return m * jnp.cos(ph), m * jnp.sin(ph)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pad_params_stacked(params, L, hp, op):
    """Stacked padded weights: per hidden layer one (2hp,2hp) block matrix
    [[wr, wi], [-wi, wr]]; final (2hp, op) [fwr; -fwi]."""
    h = params["first"]["w"].shape[1]
    d = params["first"]["w"].shape[0]
    o = params["final"]["br"].shape[0]
    out = {
        "w1": jnp.pad(params["first"]["w"], ((0, 0), (0, hp - h))),
        "b1": jnp.pad(params["first"]["b"], (0, hp - h))[None, :],
    }
    for i in range(L):
        p = params[f"hidden_{i}"]
        wr = jnp.pad(p["wr"], ((0, hp - h), (0, hp - h)))
        wi = jnp.pad(p["wi"], ((0, hp - h), (0, hp - h)))
        out[f"h{i}W"] = jnp.concatenate(
            [jnp.concatenate([wr, wi], axis=1),
             jnp.concatenate([-wi, wr], axis=1)], axis=0)
        out[f"h{i}B"] = jnp.concatenate(
            [jnp.pad(p["br"], (0, hp - h)),
             jnp.pad(p["bi"], (0, hp - h))])[None, :]
    f = params["final"]
    fwr = jnp.pad(f["wr"], ((0, hp - h), (0, op - o)))
    fwi = jnp.pad(f["wi"], ((0, hp - h), (0, op - o)))
    out["fW"] = jnp.concatenate([fwr, -fwi], axis=0)
    out["fb"] = jnp.pad(f["br"], (0, op - o))[None, :]
    return out, d, h, o


def _forward_tile(c, w, L, omega0, sigma0, first_omega0, hp):
    z1 = _dot(c, w["w1"]) + w["b1"]
    ar, ai = _gabor_first(z1, first_omega0, sigma0)
    a = jnp.concatenate([ar, ai], axis=1)
    acts = [z1]
    for i in range(L):
        z = _dot(a, w[f"h{i}W"]) + w[f"h{i}B"]
        zr, zi = z[:, :hp], z[:, hp:]
        ar, ai = _gabor(zr, zi, omega0, sigma0)
        a = jnp.concatenate([ar, ai], axis=1)
        acts.append(z)
    yr = _dot(a, w["fW"]) + w["fb"]
    return acts, yr


def _make_fwd_kernel(L, omega0, sigma0, first_omega0, names, hp):
    def kernel(*refs):
        c_ref = refs[0]
        w = {nm: refs[1 + k][:] for k, nm in enumerate(names)}
        out_ref = refs[1 + len(names)]
        _, yr = _forward_tile(c_ref[:], w, L, omega0, sigma0, first_omega0,
                              hp)
        out_ref[:] = yr
    return kernel


def _make_bwd_kernel(L, omega0, sigma0, first_omega0, names, hp):
    def kernel(*refs):
        c_ref = refs[0]
        g_ref = refs[1]
        w = {nm: refs[2 + k][:] for k, nm in enumerate(names)}
        outs = refs[2 + len(names):]
        dc_ref = outs[0]
        dacc = {nm: outs[1 + k] for k, nm in enumerate(names)}
        i = pl.program_id(0)

        c = c_ref[:]
        acts, _ = _forward_tile(c, w, L, omega0, sigma0, first_omega0, hp)
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
            if li == 0:
                m = jnp.exp(-s2 * (z1 * z1))
                ph = first_omega0 * z1
            else:
                z = acts[li]
                zr, zi = z[:, :hp], z[:, hp:]
                m = jnp.exp(-omega0 * zi - s2 * (zr * zr + zi * zi))
                ph = omega0 * zr
            return m, jnp.cos(ph), jnp.sin(ph)

        m, cos, sin = factors(L)
        aL = jnp.concatenate([m * cos, m * sin], axis=1)
        acc("fW", _dot_tn(aL, g))
        acc("fb", jnp.sum(g, axis=0, keepdims=True))
        da = _dot_nt(g, w["fW"])

        for li in range(L - 1, -1, -1):
            z = acts[li + 1]
            zr, zi = z[:, :hp], z[:, hp:]
            m, cos, sin = factors(li + 1)
            dar, dai = da[:, :hp], da[:, hp:]
            dm = dar * cos + dai * sin
            dph = m * (-dar * sin + dai * cos)
            dzr = dm * (-2.0 * s2 * zr) * m + omega0 * dph
            dzi = dm * (-omega0 - 2.0 * s2 * zi) * m
            dz = jnp.concatenate([dzr, dzi], axis=1)
            pm, pcos, psin = factors(li)
            ap = jnp.concatenate([pm * pcos, pm * psin], axis=1)
            acc(f"h{li}W", _dot_tn(ap, dz))
            acc(f"h{li}B", jnp.sum(dz, axis=0, keepdims=True))
            da = _dot_nt(dz, w[f"h{li}W"])

        m, cos, sin = factors(0)
        dar, dai = da[:, :hp], da[:, hp:]
        dz = (dar * (m * (-2.0 * s2 * z1) * cos - m * first_omega0 * sin)
              + dai * (m * (-2.0 * s2 * z1) * sin + m * first_omega0 * cos))
        acc("w1", _dot_tn(c, dz))
        acc("b1", jnp.sum(dz, axis=0, keepdims=True))
        dc_ref[:] = _dot_nt(dz, w["w1"])

    return kernel


TILE_N = 512


@functools.lru_cache(maxsize=8)
def _programs(L, omega0, sigma0, first_omega0, d, h, o, tile_n, n_tiles):
    hp = _round_up(h, 128)
    op = _round_up(max(o, 1), 128)
    names = ["w1", "b1"]
    for i in range(L):
        names += [f"h{i}W", f"h{i}B"]
    names += ["fW", "fb"]
    shapes = {"w1": (d, hp), "b1": (1, hp), "fW": (2 * hp, op),
              "fb": (1, op)}
    for i in range(L):
        shapes[f"h{i}W"] = (2 * hp, 2 * hp)
        shapes[f"h{i}B"] = (1, 2 * hp)

    def wspec(nm):
        s = shapes[nm]
        zeros = (0,) * len(s)
        return pl.BlockSpec(s, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    cp = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                              vmem_limit_bytes=100 * 1024 * 1024)
    fwd = pl.pallas_call(
        _make_fwd_kernel(L, omega0, sigma0, first_omega0, names, hp),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + [wspec(nm) for nm in names],
        out_specs=pl.BlockSpec((tile_n, op), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_n, op), jnp.float32),
        compiler_params=cp,
    )
    bwd = pl.pallas_call(
        _make_bwd_kernel(L, omega0, sigma0, first_omega0, names, hp),
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
        compiler_params=cp,
    )
    return fwd, bwd, names, hp, op


def stacked_fwd(params, coords, L, omega0, sigma0, first_omega0):
    n, d = coords.shape
    h = params["first"]["w"].shape[1]
    o = params["final"]["br"].shape[0]
    hp = _round_up(h, 128)
    op = _round_up(max(o, 1), 128)
    n_pad = _round_up(n, TILE_N)
    fwd, _, names, hp, op = _programs(L, omega0, sigma0, first_omega0, d, h,
                                      o, TILE_N, n_pad // TILE_N)
    padded, _, _, _ = _pad_params_stacked(params, L, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    out = fwd(cpad, *[padded[nm] for nm in names])
    return out[:n, :o]


def stacked_bwd(params, coords, g, L, omega0, sigma0, first_omega0):
    n, d = coords.shape
    h = params["first"]["w"].shape[1]
    o = params["final"]["br"].shape[0]
    hp = _round_up(h, 128)
    op = _round_up(max(o, 1), 128)
    n_pad = _round_up(n, TILE_N)
    _, bwd, names, hp, op = _programs(L, omega0, sigma0, first_omega0, d, h,
                                      o, TILE_N, n_pad // TILE_N)
    padded, _, _, _ = _pad_params_stacked(params, L, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    gpad = jnp.pad(g, ((0, n_pad - n), (0, op - o)))
    outs = bwd(cpad, gpad, *[padded[nm] for nm in names])
    dc = outs[0][:n]
    dw = {nm: outs[1 + k] for k, nm in enumerate(names)}
    dparams = {
        "first": {"w": dw["w1"][:, :h], "b": dw["b1"][0, :h]},
        "final": {"wr": dw["fW"][:h, :o], "wi": -dw["fW"][hp:hp + h, :o],
                  "br": dw["fb"][0, :o],
                  "bi": jnp.zeros_like(params["final"]["bi"])},
    }
    # NOTE on fW grad: fW rows [0:hp]=fwr, [hp:]=-fwi, so dfwi = -G[hp:].
    for i in range(L):
        G = dw[f"h{i}W"]
        dwr = G[:h, :h] + G[hp:hp + h, hp:hp + h]
        dwi = G[:h, hp:hp + h] - G[hp:hp + h, :h]
        B = dw[f"h{i}B"][0]
        dparams[f"hidden_{i}"] = {"wr": dwr, "wi": dwi,
                                  "br": B[:h], "bi": B[hp:hp + h]}
    return dparams, dc


def timed(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    from wire_tpu.nn import get_inr
    import dataclasses

    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=300, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    # force jnp path for the oracle
    spec_ref = dataclasses.replace(model.spec, fused="never")
    params = model.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (N, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))

    L, w0, s0, fw0 = 2, 7.0, 8.0, 7.0

    from wire_tpu.nn.models import wire_apply

    # ---- correctness vs jnp path (on TPU both use bf16 MXU default) ----
    y_ref = jax.jit(lambda p, c: wire_apply(p, c, spec_ref))(params, coords)
    y_st = jax.jit(lambda p, c: stacked_fwd(p, c, L, w0, s0, fw0))(
        params, coords)
    fwd_rel = float(jnp.linalg.norm(y_st - y_ref) /
                    (jnp.linalg.norm(y_ref) + 1e-12))

    def loss_ref(p, c, t):
        y = wire_apply(p, c, spec_ref)
        return jnp.mean((y - t) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(params, coords, tgt)

    def loss_st_grads(p, c, t):
        y = stacked_fwd(p, c, L, w0, s0, fw0)
        gy = 2.0 * (y - t) / (y.shape[0] * y.shape[1])
        return stacked_bwd(p, c, gy, L, w0, s0, fw0)[0]

    g_st = jax.jit(loss_st_grads)(params, coords, tgt)
    rels = {}
    for k in g_ref:
        for kk in g_ref[k]:
            a, b = g_ref[k][kk], g_st[k][kk]
            rels[f"{k}.{kk}"] = float(
                jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-12))
    grad_rel = max(rels.values())

    # ---- timing ----
    fwd_ms = timed(jax.jit(lambda p, c: stacked_fwd(p, c, L, w0, s0, fw0)),
                   params, coords)

    def full_bwd(p, c, t):
        y = stacked_fwd(p, c, L, w0, s0, fw0)
        gy = 2.0 * (y - t) / (y.shape[0] * y.shape[1])
        return stacked_bwd(p, c, gy, L, w0, s0, fw0)

    step_ms = timed(jax.jit(full_bwd), params, coords, tgt)
    print(json.dumps({"N": N, "fwd_rel": fwd_rel, "grad_rel_max": grad_rel,
                      "fwd_ms": round(fwd_ms, 3),
                      "step_ms": round(step_ms, 3)}))


if __name__ == "__main__":
    main()
