#!/usr/bin/env python
"""Experiment: region-free gradient accumulation in the one-pass step kernel.

Hypothesis: the 12 `pl.when`-guarded accumulator writes per grid step in
wire_step.py each open an scf region between GEMMs, and region boundaries
are scheduling barriers — the Mosaic scheduler cannot interleave MXU work
across them, which would explain why both interleaving experiments
(N_STREAMS, tools/exp_pipestep.py) measured neutral while the straight-line
chain microbench (tools/exp_chain.py) shows dual chains run ~3x faster than
one dependent chain.

Variant here: accumulate into VMEM scratch with UNCONDITIONAL `+=` (zeroed
under one pl.when at grid step 0, copied to the output refs under one
pl.when at the last step) — two region boundaries per step instead of 12,
and none between the hot GEMMs.  Also builds the cross-tile pipelined
variant (exp_pipestep.py) on top of region-free accumulation.

Times fused (current), fused+scratch-acc, pipe+scratch-acc in a 50-step
data-dependent scan and checks gradient parity.
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

from wire_tpu.ops.pallas.wire_mlp import _make_dot, _round_up
from wire_tpu.ops.pallas.wire_step import (_pad_params_stacked,
                                           _unstack_grads, wire_step_fused)

TILE_N = 1024


def _shapes_names(L, d, hp, op):
    names = ["w1", "b1"]
    for i in range(L):
        names += [f"h{i}W", f"h{i}B"]
    names += ["fW", "fb"]
    shapes = {"w1": (d, hp), "b1": (1, hp), "fW": (2 * hp, op),
              "fb": (1, op)}
    for i in range(L):
        shapes[f"h{i}W"] = (2 * hp, 2 * hp)
        shapes[f"h{i}B"] = (1, 2 * hp)
    return names, shapes


def _make_scratchacc_kernel(L, omega0, sigma0, first_omega0, names,
                            precision, tile_n, hp, n_tiles, pipe,
                            streams=1):
    _dot, _dot_tn, _dot_nt = _make_dot(precision)
    s2 = sigma0 * sigma0
    S = streams
    rows_per = tile_n // S

    def kernel(*refs):
        c_ref, t_ref, nv_ref, invd_ref = refs[:4]
        w = {nm: refs[4 + k][:] for k, nm in enumerate(names)}
        k0 = 4 + len(names)
        y_ref = refs[k0]
        dout = {nm: refs[k0 + 1 + k] for k, nm in enumerate(names)}
        sk = k0 + 1 + len(names)
        dacc = {nm: refs[sk + k] for k, nm in enumerate(names)}
        scratch = refs[sk + len(names):]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _zero():
            for nm in names:
                dacc[nm][:] = jnp.zeros_like(dacc[nm])
            if pipe:
                for ref in scratch:
                    ref[1] = jnp.zeros_like(ref[1])

        def acc(nm, val):
            dacc[nm][:] += val

        if not pipe and S > 1:
            # ---- region-free + stage-interleaved row-group streams ----
            def rows_of(ref, s):
                return ref[pl.ds(s * rows_per, rows_per), :]

            c = [rows_of(c_ref, s) for s in range(S)]
            z1 = [_dot(c[s], w["w1"]) + w["b1"] for s in range(S)]
            a = []
            for s in range(S):
                m0 = jnp.exp(-s2 * (z1[s] * z1[s]))
                a.append(jnp.concatenate(
                    [m0 * jnp.cos(first_omega0 * z1[s]),
                     m0 * jnp.sin(first_omega0 * z1[s])], axis=1))
            live = []
            for li in range(L):
                z = [_dot(a[s], w[f"h{li}W"]) + w[f"h{li}B"]
                     for s in range(S)]
                lay, nxt = [], []
                for s in range(S):
                    zr, zi = z[s][:, :hp], z[s][:, hp:]
                    m = jnp.exp(-omega0 * zi - s2 * (zr * zr + zi * zi))
                    lay.append((a[s], zr, zi))
                    nxt.append(jnp.concatenate(
                        [m * jnp.cos(omega0 * zr),
                         m * jnp.sin(omega0 * zr)], axis=1))
                live.append(lay)
                a = nxt
            y = [_dot(a[s], w["fW"]) + w["fb"] for s in range(S)]
            g = []
            for s in range(S):
                y_ref[pl.ds(s * rows_per, rows_per), :] = y[s]
                rows = (i * tile_n + s * rows_per
                        + jax.lax.broadcasted_iota(jnp.int32,
                                                   (rows_per, 1), 0))
                mask = (rows < nv_ref[0, 0]).astype(y[s].dtype)
                g.append((2.0 * invd_ref[0, 0]) * mask
                         * (y[s] - rows_of(t_ref, s)))

            def accsum(parts):
                out = parts[0]
                for p in parts[1:]:
                    out = out + p
                return out

            acc("fW", accsum([_dot_tn(a[s], g[s]) for s in range(S)]))
            acc("fb", accsum([jnp.sum(g[s], axis=0, keepdims=True)
                              for s in range(S)]))
            da = [_dot_nt(g[s], w["fW"]) for s in range(S)]
            a_out = a
            for li in range(L - 1, -1, -1):
                dz = []
                for s in range(S):
                    a_in, zr, zi = live[li][s]
                    ar, ai = a_out[s][:, :hp], a_out[s][:, hp:]
                    dar, dai = da[s][:, :hp], da[s][:, hp:]
                    t1 = dar * ar + dai * ai
                    t2 = dai * ar - dar * ai
                    dzr = (-2.0 * s2) * zr * t1 + omega0 * t2
                    dzi = (-omega0 - (2.0 * s2) * zi) * t1
                    dz.append(jnp.concatenate([dzr, dzi], axis=1))
                acc(f"h{li}W", accsum([_dot_tn(live[li][s][0], dz[s])
                                       for s in range(S)]))
                acc(f"h{li}B", accsum([jnp.sum(dz[s], axis=0,
                                               keepdims=True)
                                       for s in range(S)]))
                da = [_dot_nt(dz[s], w[f"h{li}W"]) for s in range(S)]
                a_out = [live[li][s][0] for s in range(S)]
            dz1 = []
            for s in range(S):
                ar, ai = a_out[s][:, :hp], a_out[s][:, hp:]
                dar, dai = da[s][:, :hp], da[s][:, hp:]
                t1 = dar * ar + dai * ai
                t2 = dai * ar - dar * ai
                dz1.append((-2.0 * s2) * z1[s] * t1 + first_omega0 * t2)
            acc("w1", accsum([_dot_tn(c[s], dz1[s]) for s in range(S)]))
            acc("b1", accsum([jnp.sum(dz1[s], axis=0, keepdims=True)
                              for s in range(S)]))

            @pl.when(i == n_tiles - 1)
            def _flush2():
                for nm in names:
                    dout[nm][:] = dacc[nm][:]
            return

        if not pipe:
            # ---- current structure, scratch accumulation ----
            c = c_ref[:]
            z1 = _dot(c, w["w1"]) + w["b1"]
            m0 = jnp.exp(-s2 * (z1 * z1))
            a = jnp.concatenate([m0 * jnp.cos(first_omega0 * z1),
                                 m0 * jnp.sin(first_omega0 * z1)], axis=1)
            live = []
            for li in range(L):
                z = _dot(a, w[f"h{li}W"]) + w[f"h{li}B"]
                zr, zi = z[:, :hp], z[:, hp:]
                m = jnp.exp(-omega0 * zi - s2 * (zr * zr + zi * zi))
                live.append((a, zr, zi))
                a = jnp.concatenate([m * jnp.cos(omega0 * zr),
                                     m * jnp.sin(omega0 * zr)], axis=1)
            y = _dot(a, w["fW"]) + w["fb"]
            y_ref[:] = y
            rows = (i * tile_n
                    + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0))
            mask = (rows < nv_ref[0, 0]).astype(y.dtype)
            g = (2.0 * invd_ref[0, 0]) * mask * (y - t_ref[:])

            acc("fW", _dot_tn(a, g))
            acc("fb", jnp.sum(g, axis=0, keepdims=True))
            da = _dot_nt(g, w["fW"])
            a_out = a
            for li in range(L - 1, -1, -1):
                a_in, zr, zi = live[li]
                ar, ai = a_out[:, :hp], a_out[:, hp:]
                dar, dai = da[:, :hp], da[:, hp:]
                t1 = dar * ar + dai * ai
                t2 = dai * ar - dar * ai
                dzr = (-2.0 * s2) * zr * t1 + omega0 * t2
                dzi = (-omega0 - (2.0 * s2) * zi) * t1
                dz = jnp.concatenate([dzr, dzi], axis=1)
                acc(f"h{li}W", _dot_tn(a_in, dz))
                acc(f"h{li}B", jnp.sum(dz, axis=0, keepdims=True))
                da = _dot_nt(dz, w[f"h{li}W"])
                a_out = a_in
            ar, ai = a_out[:, :hp], a_out[:, hp:]
            dar, dai = da[:, :hp], da[:, hp:]
            t1 = dar * ar + dai * ai
            t2 = dai * ar - dar * ai
            dz1 = (-2.0 * s2) * z1 * t1 + first_omega0 * t2
            acc("w1", _dot_tn(c, dz1))
            acc("b1", jnp.sum(dz1, axis=0, keepdims=True))

            @pl.when(i == n_tiles - 1)
            def _flush():
                for nm in names:
                    dout[nm][:] = dacc[nm][:]
            return

        # ---- pipelined: fwd(tile i) interleaved with bwd(tile i-1) ----
        sc_c, sc_z1 = scratch[0], scratch[1]
        sc_layer = [(scratch[2 + 3 * li], scratch[3 + 3 * li],
                     scratch[4 + 3 * li]) for li in range(L)]
        sc_afin, sc_g = scratch[2 + 3 * L], scratch[3 + 3 * L]
        sf = jax.lax.rem(i, 2)
        sb = jax.lax.rem(i + 1, 2)
        # slot 1 was zeroed at i == 0, so the phantom bwd accumulates zeros

        c = c_ref[:]
        sc_c[sf] = c
        z1 = _dot(c, w["w1"]) + w["b1"]

        g_b = sc_g[sb]
        afin_b = sc_afin[sb]
        acc("fW", _dot_tn(afin_b, g_b))
        da = _dot_nt(g_b, w["fW"])

        sc_z1[sf] = z1
        m0 = jnp.exp(-s2 * (z1 * z1))
        a = jnp.concatenate([m0 * jnp.cos(first_omega0 * z1),
                             m0 * jnp.sin(first_omega0 * z1)], axis=1)
        acc("fb", jnp.sum(g_b, axis=0, keepdims=True))

        a_out_b = afin_b
        for li in range(L):
            sc_layer[li][0][sf] = a
            z = _dot(a, w[f"h{li}W"]) + w[f"h{li}B"]

            bj = L - 1 - li
            a_in_b = sc_layer[bj][0][sb]
            zr_b = sc_layer[bj][1][sb]
            zi_b = sc_layer[bj][2][sb]
            ar_b, ai_b = a_out_b[:, :hp], a_out_b[:, hp:]
            dar, dai = da[:, :hp], da[:, hp:]
            t1 = dar * ar_b + dai * ai_b
            t2 = dai * ar_b - dar * ai_b
            dzr = (-2.0 * s2) * zr_b * t1 + omega0 * t2
            dzi = (-omega0 - (2.0 * s2) * zi_b) * t1
            dz = jnp.concatenate([dzr, dzi], axis=1)

            zr, zi = z[:, :hp], z[:, hp:]
            sc_layer[li][1][sf] = zr
            sc_layer[li][2][sf] = zi

            acc(f"h{bj}W", _dot_tn(a_in_b, dz))
            m = jnp.exp(-omega0 * zi - s2 * (zr * zr + zi * zi))
            acc(f"h{bj}B", jnp.sum(dz, axis=0, keepdims=True))
            da = _dot_nt(dz, w[f"h{bj}W"])
            a = jnp.concatenate([m * jnp.cos(omega0 * zr),
                                 m * jnp.sin(omega0 * zr)], axis=1)
            a_out_b = a_in_b

        sc_afin[sf] = a
        y = _dot(a, w["fW"]) + w["fb"]
        y_ref[:] = y

        z1_b = sc_z1[sb]
        ar_b, ai_b = a_out_b[:, :hp], a_out_b[:, hp:]
        dar, dai = da[:, :hp], da[:, hp:]
        t1 = dar * ar_b + dai * ai_b
        t2 = dai * ar_b - dar * ai_b
        dz1 = (-2.0 * s2) * z1_b * t1 + first_omega0 * t2
        acc("w1", _dot_tn(sc_c[sb], dz1))
        acc("b1", jnp.sum(dz1, axis=0, keepdims=True))

        tile = jnp.minimum(i, n_tiles - 1)
        rows = (tile * tile_n
                + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0))
        mask = (rows < nv_ref[0, 0]).astype(y.dtype)
        sc_g[sf] = (2.0 * invd_ref[0, 0]) * mask * (y - t_ref[:])

        @pl.when(i == n_tiles)
        def _flush():
            for nm in names:
                dout[nm][:] = dacc[nm][:]

    return kernel


@functools.lru_cache(maxsize=16)
def _program(L, omega0, sigma0, first_omega0, d, h, o, tile_n, n_tiles,
             precision, pipe, streams=1):
    hp = _round_up(h, 128)
    op = _round_up(max(o, 1), 128)
    names, shapes = _shapes_names(L, d, hp, op)

    def wspec(nm):
        s = shapes[nm]
        zeros = (0,) * len(s)
        return pl.BlockSpec(s, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    if pipe:
        def imap(i):
            return (jnp.minimum(i, n_tiles - 1), 0)
        grid = (n_tiles + 1,)
    else:
        def imap(i):
            return (i, 0)
        grid = (n_tiles,)

    scratch = [pltpu.VMEM(shapes[nm], jnp.float32) for nm in names]
    if pipe:
        scratch += [pltpu.VMEM((2, tile_n, d), jnp.float32),
                    pltpu.VMEM((2, tile_n, hp), jnp.float32)]
        for _ in range(L):
            scratch += [pltpu.VMEM((2, tile_n, 2 * hp), jnp.float32),
                        pltpu.VMEM((2, tile_n, hp), jnp.float32),
                        pltpu.VMEM((2, tile_n, hp), jnp.float32)]
        scratch += [pltpu.VMEM((2, tile_n, 2 * hp), jnp.float32),
                    pltpu.VMEM((2, tile_n, op), jnp.float32)]

    step = pl.pallas_call(
        _make_scratchacc_kernel(L, omega0, sigma0, first_omega0, names,
                                precision, tile_n, hp, n_tiles, pipe,
                                streams),
        grid=grid,
        in_specs=[pl.BlockSpec((tile_n, d), imap, memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_n, op), imap, memory_space=pltpu.VMEM),
                  sspec(), sspec()]
                 + [wspec(nm) for nm in names],
        out_specs=[pl.BlockSpec((tile_n, op), imap,
                                memory_space=pltpu.VMEM)]
                  + [wspec(nm) for nm in names],
        out_shape=[jax.ShapeDtypeStruct((n_tiles * tile_n, op), jnp.float32)]
                  + [jax.ShapeDtypeStruct(shapes[nm], jnp.float32)
                     for nm in names],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    return step, names, hp, op


def step_variant(params, coords, target, spec, *, pipe, streams=1):
    n, d = coords.shape
    h = params["first"]["w"].shape[1]
    o = params["final"]["br"].shape[0]
    L = spec.hidden_layers
    n_pad = _round_up(n, TILE_N)
    n_tiles = n_pad // TILE_N
    step, names, hp, op = _program(
        L, float(spec.hidden_omega0), float(spec.scale),
        float(spec.first_omega0), d, h, o, TILE_N, n_tiles,
        getattr(spec, "gemm_precision", "default"), pipe, streams)
    padded, _, _, _ = _pad_params_stacked(params, L, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    tpad = jnp.pad(target, ((0, n_pad - n), (0, op - o)))
    nv = jnp.full((1, 1), n, jnp.int32)
    invd = jnp.full((1, 1), 1.0 / (n * o), jnp.float32)
    outs = step(cpad, tpad, nv, invd, *[padded[nm] for nm in names])
    pred = outs[0][:n, :o]
    dw = {nm: outs[1 + k] for k, nm in enumerate(names)}
    return pred, _unstack_grads(dw, params, L, h, hp, o)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    which = sys.argv[3:] or ["fused", "sacc", "pipe"]

    from wire_tpu.nn import get_inr
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=300, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    spec = model.spec
    params = model.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (N, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))

    fns = {"fused": wire_step_fused,
           "sacc": functools.partial(step_variant, pipe=False),
           "sacc2": functools.partial(step_variant, pipe=False, streams=2),
           "pipe": functools.partial(step_variant, pipe=True)}

    ref = None
    for name in which:
        fn = fns[name]
        j = jax.jit(lambda p, fn=fn: fn(p, coords, tgt, spec))
        y, g = j(params)
        y = np.asarray(y)
        gl = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(g)])
        if ref is None:
            ref = (y, gl)
        rel = float(np.linalg.norm(gl - ref[1]) /
                    (np.linalg.norm(ref[1]) + 1e-30))

        def scan(p0, fn=fn):
            def body(p, _):
                pred, gg = fn(p, coords, tgt, spec)
                return (jax.tree.map(lambda a, b: a - 1e-6 * b, p, gg),
                        jnp.sum(pred[:1]))
            return jax.lax.scan(body, p0, None, length=K)

        r = jax.jit(scan)
        out = r(params)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = r(params)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"kernel": name, "rel_g_vs_first": rel,
                          "step_ms": round(best / K * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
