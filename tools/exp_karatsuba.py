#!/usr/bin/env python
"""Experiment: Karatsuba 3-multiplication complex products in the one-pass
WIRE train-step kernel.

The stacked layout in ops/pallas/wire_step.py computes each complex matmul
as ONE big real contraction with 4 h x h GEMMs' worth of MACs.  Gauss's
3-multiplication trick computes (ar + i*ai)(wr + i*wi) from three h x h
products instead:

    t1 = ar@wr;  t2 = ai@wi;  t3 = (ar+ai)@(wr+wi)
    real = t1 - t2;   imag = t3 - t1 - t2

The same structure applies to the backward data-grad (against (wr - wi))
and to the complex weight-grad, so each hidden layer's train-step MACs
drop from 12 to 9 h x h GEMMs (25%) at the cost of a few VPU adds.

Numerics note: t3 - t1 - t2 cancels; with bf16 MXU operands this can lose
~1 bit vs the 4-GEMM form.  The script reports rel-L2 against the f32
"highest" oracle for both kernels so the loss is quantified.

Usage: python tools/exp_karatsuba.py [N] [tile]
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

from wire_tpu.ops.pallas.wire_mlp import _make_dot, _round_up  # noqa: E402


def _pad_params_kara(params, L, hp, op):
    """Per hidden layer: wr, wi, ws=wr+wi, wd=wr-wi, each (hp,hp) padded.
    Final layer kept as separate fwr/fwi (hp, op)."""
    h = params["first"]["w"].shape[1]
    out = {
        "w1": jnp.pad(params["first"]["w"], ((0, 0), (0, hp - h))),
        "b1": jnp.pad(params["first"]["b"], (0, hp - h))[None, :],
    }
    for i in range(L):
        p = params[f"hidden_{i}"]
        wr = jnp.pad(p["wr"], ((0, hp - h), (0, hp - h)))
        wi = jnp.pad(p["wi"], ((0, hp - h), (0, hp - h)))
        out[f"h{i}wr"] = wr
        out[f"h{i}wi"] = wi
        out[f"h{i}ws"] = wr + wi
        out[f"h{i}wd"] = wr - wi
        out[f"h{i}br"] = jnp.pad(p["br"], (0, hp - h))[None, :]
        out[f"h{i}bi"] = jnp.pad(p["bi"], (0, hp - h))[None, :]
    f = params["final"]
    o = f["br"].shape[0]
    out["fwr"] = jnp.pad(f["wr"], ((0, hp - h), (0, op - o)))
    out["fwi"] = jnp.pad(f["wi"], ((0, hp - h), (0, op - o)))
    out["fb"] = jnp.pad(f["br"], (0, op - o))[None, :]
    return out


def _make_kara_kernel(L, omega0, sigma0, first_omega0, names, precision,
                      tile_n, hp):
    _dot, _dot_tn, _dot_nt = _make_dot(precision)
    s2 = sigma0 * sigma0

    def kernel(*refs):
        c_ref, t_ref, nv_ref, invd_ref = refs[:4]
        w = {nm: refs[4 + k][:] for k, nm in enumerate(names)}
        outs = refs[4 + len(names):]
        y_ref = outs[0]
        # grad accumulators: one per *model* grad, combined in-kernel
        gnames = _grad_names(L)
        dacc = {nm: outs[1 + k] for k, nm in enumerate(gnames)}
        i = pl.program_id(0)

        # ---- forward ----
        c = c_ref[:]
        z1 = _dot(c, w["w1"]) + w["b1"]
        m0 = jnp.exp(-s2 * (z1 * z1))
        cos0, sin0 = jnp.cos(first_omega0 * z1), jnp.sin(first_omega0 * z1)
        ar, ai = m0 * cos0, m0 * sin0
        live = []
        for li in range(L):
            t1 = _dot(ar, w[f"h{li}wr"])
            t2 = _dot(ai, w[f"h{li}wi"])
            t3 = _dot(ar + ai, w[f"h{li}ws"])
            zr = t1 - t2 + w[f"h{li}br"]
            zi = t3 - t1 - t2 + w[f"h{li}bi"]
            m = jnp.exp(-omega0 * zi - s2 * (zr * zr + zi * zi))
            cos, sin = jnp.cos(omega0 * zr), jnp.sin(omega0 * zr)
            live.append((ar, ai, zr, zi, m, cos, sin))
            ar, ai = m * cos, m * sin
        y = _dot(ar, w["fwr"]) - _dot(ai, w["fwi"]) + w["fb"]
        y_ref[:] = y

        # ---- loss grad ----
        rows = i * tile_n + jax.lax.broadcasted_iota(jnp.int32,
                                                     (tile_n, 1), 0)
        mask = (rows < nv_ref[0, 0]).astype(y.dtype)
        g = (2.0 * invd_ref[0, 0]) * mask * (y - t_ref[:])

        def acc(nm, val):
            @pl.when(i == 0)
            def _():
                dacc[nm][:] = val

            @pl.when(i != 0)
            def _():
                dacc[nm][:] += val

        # ---- backward ----
        acc("fwr", _dot_tn(ar, g))
        acc("fwi", -_dot_tn(ai, g))
        acc("fb", jnp.sum(g, axis=0, keepdims=True))
        dar, dai = _dot_nt(g, w["fwr"]), -_dot_nt(g, w["fwi"])

        for li in range(L - 1, -1, -1):
            ar_in, ai_in, zr, zi, m, cos, sin = live[li]
            dm = dar * cos + dai * sin
            dph = m * (-dar * sin + dai * cos)
            dzr = dm * (-2.0 * s2 * zr) * m + omega0 * dph
            dzi = dm * (-omega0 - 2.0 * s2 * zi) * m
            sdz = dzr + dzi
            # weight grad: dwr = A + B, dwi = C - A + B
            A = _dot_tn(ar_in, dzr)
            B = _dot_tn(ai_in, dzi)
            Cm = _dot_tn(ar_in - ai_in, sdz)
            acc(f"h{li}wr", A + B)
            acc(f"h{li}wi", Cm - A + B)
            acc(f"h{li}br", jnp.sum(dzr, axis=0, keepdims=True))
            acc(f"h{li}bi", jnp.sum(dzi, axis=0, keepdims=True))
            # data grad: dar = D + E, dai = F - D + E
            D = _dot_nt(dzr, w[f"h{li}wr"])
            E = _dot_nt(dzi, w[f"h{li}wi"])
            F = _dot_nt(sdz, w[f"h{li}wd"])
            dar, dai = D + E, F - D + E

        dz1 = (dar * (m0 * (-2.0 * s2 * z1) * cos0 - m0 * first_omega0 * sin0)
               + dai * (m0 * (-2.0 * s2 * z1) * sin0
                        + m0 * first_omega0 * cos0))
        acc("w1", _dot_tn(c, dz1))
        acc("b1", jnp.sum(dz1, axis=0, keepdims=True))

    return kernel


def _grad_names(L):
    names = ["w1", "b1"]
    for i in range(L):
        names += [f"h{i}wr", f"h{i}wi", f"h{i}br", f"h{i}bi"]
    names += ["fwr", "fwi", "fb"]
    return names


def _weight_names(L):
    names = ["w1", "b1"]
    for i in range(L):
        names += [f"h{i}wr", f"h{i}wi", f"h{i}ws", f"h{i}wd",
                  f"h{i}br", f"h{i}bi"]
    names += ["fwr", "fwi", "fb"]
    return names


@functools.lru_cache(maxsize=16)
def _kara_program(L, omega0, sigma0, first_omega0, d, h, o, tile_n, n_tiles,
                  precision="default", interpret=False):
    hp = _round_up(h, 128)
    op = _round_up(max(o, 1), 128)
    wnames = _weight_names(L)
    gnames = _grad_names(L)
    wshapes = {"w1": (d, hp), "b1": (1, hp), "fwr": (hp, op),
               "fwi": (hp, op), "fb": (1, op)}
    for i in range(L):
        for nm in ("wr", "wi", "ws", "wd"):
            wshapes[f"h{i}{nm}"] = (hp, hp)
        wshapes[f"h{i}br"] = (1, hp)
        wshapes[f"h{i}bi"] = (1, hp)

    def wspec(nm):
        s = wshapes[nm]
        zeros = (0,) * len(s)
        return pl.BlockSpec(s, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    step = pl.pallas_call(
        _make_kara_kernel(L, omega0, sigma0, first_omega0, wnames, precision,
                          tile_n, hp),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_n, op), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  sspec(), sspec()]
                 + [wspec(nm) for nm in wnames],
        out_specs=[pl.BlockSpec((tile_n, op), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)]
                  + [wspec(nm) for nm in gnames],
        out_shape=[jax.ShapeDtypeStruct((n_tiles * tile_n, op), jnp.float32)]
                  + [jax.ShapeDtypeStruct(wshapes[nm], jnp.float32)
                     for nm in gnames],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return step, wnames, gnames, hp, op


def kara_step(params, coords, target, L, omega0, sigma0, first_omega0,
              tile_n, precision="default", interpret=False):
    n, d = coords.shape
    h = params["first"]["w"].shape[1]
    o = params["final"]["br"].shape[0]
    n_pad = _round_up(n, tile_n)
    step, wnames, gnames, hp, op = _kara_program(
        L, omega0, sigma0, first_omega0, d, h, o, tile_n, n_pad // tile_n,
        precision, interpret)
    padded = _pad_params_kara(params, L, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    tpad = jnp.pad(target, ((0, n_pad - n), (0, op - o)))
    nv = jnp.full((1, 1), n, jnp.int32)
    invd = jnp.full((1, 1), 1.0 / (n * o), jnp.float32)
    outs = step(cpad, tpad, nv, invd, *[padded[nm] for nm in wnames])
    pred = outs[0][:n, :o]
    dw = {nm: outs[1 + k] for k, nm in enumerate(gnames)}
    dparams = {
        "first": {"w": dw["w1"][:, :h], "b": dw["b1"][0, :h]},
        "final": {"wr": dw["fwr"][:h, :o], "wi": dw["fwi"][:h, :o],
                  "br": dw["fb"][0, :o],
                  "bi": jnp.zeros_like(params["final"]["bi"])},
    }
    for i in range(L):
        dparams[f"hidden_{i}"] = {
            "wr": dw[f"h{i}wr"][:h, :h], "wi": dw[f"h{i}wi"][:h, :h],
            "br": dw[f"h{i}br"][0, :h], "bi": dw[f"h{i}bi"][0, :h]}
    return pred, dparams


def timed(fn, *args, reps=7):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def rel(a, b):
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-12))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    import dataclasses
    from wire_tpu.nn import get_inr
    from wire_tpu.ops.pallas.wire_step import wire_step_fused

    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=300, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    params = model.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (N, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    L, w0, s0, fw0 = 2, 7.0, 8.0, 7.0
    spec = model.spec

    cur = jax.jit(lambda p, c, t: wire_step_fused(p, c, t, spec))
    kar = jax.jit(lambda p, c, t: kara_step(p, c, t, L, w0, s0, fw0, tile))

    # f32 oracle: autodiff of the jnp path at highest precision
    from wire_tpu.nn.models import wire_apply
    spec_hi = dataclasses.replace(model.spec, fused="never",
                                  gemm_precision="highest")

    def loss_hi(p, c, t):
        y = wire_apply(p, c, spec_hi)
        return jnp.sum((y - t) ** 2) / (c.shape[0] * 3)

    g_hi = jax.jit(jax.grad(loss_hi))(params, coords, tgt)

    y_cur, g_cur = cur(params, coords, tgt)
    y_kar, g_kar = kar(params, coords, tgt)

    def maxrel(g):
        out = {}
        for k in g_hi:
            for kk in g_hi[k]:
                if kk == "bi" and k == "final":
                    continue
                out[f"{k}.{kk}"] = rel(g[k][kk], g_hi[k][kk])
        return max(out.values()), out

    cur_max, _ = maxrel(g_cur)
    kar_max, kar_all = maxrel(g_kar)

    # Scan K steps with data dependence so tunnel dispatch overhead
    # amortizes and XLA can't hoist the body.
    K = 50

    def chain(step_fn):
        def body(p, _):
            _, dp = step_fn(p, coords, tgt)
            return jax.tree.map(lambda a, b: a - 1e-9 * b, p, dp), None

        def run(p):
            out, _ = jax.lax.scan(body, p, None, length=K)
            return out

        return jax.jit(run)

    cur_sc = chain(lambda p, c, t: wire_step_fused(p, c, t, spec))
    kar_sc = chain(lambda p, c, t: kara_step(p, c, t, L, w0, s0, fw0, tile))
    cur_ms = timed(cur_sc, params) / K
    kar_ms = timed(kar_sc, params) / K
    print(json.dumps({
        "N": N, "tile": tile,
        "cur_step_ms": round(cur_ms, 3), "kara_step_ms": round(kar_ms, 3),
        "speedup": round(cur_ms / kar_ms, 3),
        "pred_rel_kara_vs_cur": rel(y_kar, y_cur),
        "grad_relmax_cur_vs_f32": round(cur_max, 5),
        "grad_relmax_kara_vs_f32": round(kar_max, 5),
    }))


if __name__ == "__main__":
    main()
