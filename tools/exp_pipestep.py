#!/usr/bin/env python
"""Experiment: cross-tile software pipelining for the one-pass WIRE
train-step kernel.

The current kernel (ops/pallas/wire_step.py) runs each coordinate tile's
forward then backward serially inside one grid step; the serially-dependent
GEMM chain stalls the MXU between layers (~37% of bf16 peak).  The chain
microbench (tools/exp_chain.py, this chip) shows TWO independent dependent
chains recover the independent-GEMM rate (chain1 1.01ms -> chain2 0.713ms
at equal MACs), so this prototype restructures the grid:

    grid step i:  forward(tile i)   [stores live activations to VMEM
                                     scratch slot i%2 + in-kernel loss grad]
                  backward(tile i-1) [reads scratch slot (i-1)%2]

with grid = n_tiles + 1.  The fwd and bwd instruction streams are
independent (different tiles), hand-interleaved in program order so the
Mosaic scheduler can fill each chain's dependency stalls with the other's
GEMMs.  Edge steps waste one phantom fwd (i = n_tiles, recomputes the last
tile; identical output rewrite) and one phantom bwd (i = 0, consumes
uninitialized scratch; its accumulator writes are suppressed).

Checks gradient parity vs wire_step_fused, then times both in a 50-step
data-dependent scan at the headline config (65536 coords, WIRE-300).
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


def _make_pipe_kernel(L, omega0, sigma0, first_omega0, names, precision,
                      tile_n, hp, op, n_tiles):
    _dot, _dot_tn, _dot_nt = _make_dot(precision)
    s2 = sigma0 * sigma0

    def kernel(*refs):
        c_ref, t_ref, nv_ref, invd_ref = refs[:4]
        w = {nm: refs[4 + k][:] for k, nm in enumerate(names)}
        outs = refs[4 + len(names):4 + len(names) + 1 + len(names)]
        y_ref = outs[0]
        dacc = {nm: outs[1 + k] for k, nm in enumerate(names)}
        scratch = refs[4 + len(names) + 1 + len(names):]
        # scratch layout: c, z1, (a_in, zr, zi) x L, a_fin, g
        sc_c, sc_z1 = scratch[0], scratch[1]
        sc_layer = [(scratch[2 + 3 * li], scratch[3 + 3 * li],
                     scratch[4 + 3 * li]) for li in range(L)]
        sc_afin, sc_g = scratch[2 + 3 * L], scratch[3 + 3 * L]

        i = pl.program_id(0)
        sf = jax.lax.rem(i, 2)              # fwd writes slot i%2
        sb = jax.lax.rem(i + 1, 2)          # bwd reads slot (i-1)%2

        # ---------------- interleaved fwd(tile i) / bwd(tile i-1) ----------
        # Forward chain (serially dependent) zipped with the backward chain
        # (independent of it) so the scheduler always has a second stream.
        c = c_ref[:]
        sc_c[sf] = c
        z1 = _dot(c, w["w1"]) + w["b1"]

        # bwd stage 1: final-layer grads from scratch
        g_b = sc_g[sb]
        afin_b = sc_afin[sb]
        dfW = _dot_tn(afin_b, g_b)
        da = _dot_nt(g_b, w["fW"])

        sc_z1[sf] = z1
        m0 = jnp.exp(-s2 * (z1 * z1))
        a = jnp.concatenate([m0 * jnp.cos(first_omega0 * z1),
                             m0 * jnp.sin(first_omega0 * z1)], axis=1)
        dfb = jnp.sum(g_b, axis=0, keepdims=True)

        def acc(nm, val):
            @pl.when(i == 1)
            def _():
                dacc[nm][:] = val

            @pl.when(i > 1)
            def _():
                dacc[nm][:] += val

        acc("fW", dfW)
        acc("fb", dfb)

        # hidden layers: fwd layer li zipped with bwd layer (L-1-li)
        a_out_b = afin_b
        for li in range(L):
            sc_layer[li][0][sf] = a
            z = _dot(a, w[f"h{li}W"]) + w[f"h{li}B"]

            # bwd for hidden layer bj = L-1-li of the previous tile
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

        # fwd epilogue: final layer + in-kernel loss grad
        sc_afin[sf] = a
        y = _dot(a, w["fW"]) + w["fb"]
        y_ref[:] = y

        # bwd epilogue: first layer of the previous tile
        z1_b = sc_z1[sb]
        ar_b, ai_b = a_out_b[:, :hp], a_out_b[:, hp:]
        dar, dai = da[:, :hp], da[:, hp:]
        t1 = dar * ar_b + dai * ai_b
        t2 = dai * ar_b - dar * ai_b
        dz1 = (-2.0 * s2) * z1_b * t1 + first_omega0 * t2
        acc("w1", _dot_tn(sc_c[sb], dz1))
        acc("b1", jnp.sum(dz1, axis=0, keepdims=True))

        # loss grad for THIS tile (fwd side), stored for step i+1
        tile = jnp.minimum(i, n_tiles - 1)
        rows = (tile * tile_n
                + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0))
        mask = (rows < nv_ref[0, 0]).astype(y.dtype)
        sc_g[sf] = (2.0 * invd_ref[0, 0]) * mask * (y - t_ref[:])

    return kernel


@functools.lru_cache(maxsize=16)
def _pipe_program(L, omega0, sigma0, first_omega0, d, h, o, tile_n, n_tiles,
                  precision="default"):
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

    def sspec():
        return pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    # clamped tile index: step n_tiles re-fetches (and re-renders) the last
    # tile; its fwd results are identical so the y rewrite is harmless
    def clamp(i):
        return (jnp.minimum(i, n_tiles - 1), 0)

    scratch = [pltpu.VMEM((2, tile_n, d), jnp.float32),      # c
               pltpu.VMEM((2, tile_n, hp), jnp.float32)]     # z1
    for _ in range(L):
        scratch += [pltpu.VMEM((2, tile_n, 2 * hp), jnp.float32),  # a_in
                    pltpu.VMEM((2, tile_n, hp), jnp.float32),      # zr
                    pltpu.VMEM((2, tile_n, hp), jnp.float32)]      # zi
    scratch += [pltpu.VMEM((2, tile_n, 2 * hp), jnp.float32),      # a_fin
                pltpu.VMEM((2, tile_n, op), jnp.float32)]          # g

    step = pl.pallas_call(
        _make_pipe_kernel(L, omega0, sigma0, first_omega0, names, precision,
                          tile_n, hp, op, n_tiles),
        grid=(n_tiles + 1,),
        in_specs=[pl.BlockSpec((tile_n, d), clamp, memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_n, op), clamp,
                               memory_space=pltpu.VMEM),
                  sspec(), sspec()]
                 + [wspec(nm) for nm in names],
        out_specs=[pl.BlockSpec((tile_n, op), clamp,
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


def wire_step_pipe(params, coords, target, spec, *, nvalid=None, denom=None):
    n, d = coords.shape
    h = params["first"]["w"].shape[1]
    o = params["final"]["br"].shape[0]
    L = spec.hidden_layers
    n_pad = _round_up(n, TILE_N)
    n_tiles = n_pad // TILE_N
    step, names, hp, op = _pipe_program(
        L, float(spec.hidden_omega0), float(spec.scale),
        float(spec.first_omega0), d, h, o, TILE_N, n_tiles,
        getattr(spec, "gemm_precision", "default"))
    padded, _, _, _ = _pad_params_stacked(params, L, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    tpad = jnp.pad(target, ((0, n_pad - n), (0, op - o)))
    nv = jnp.full((1, 1), n, jnp.int32) if nvalid is None else \
        jnp.asarray(nvalid, jnp.int32).reshape(1, 1)
    dn = jnp.asarray(float(n * o) if denom is None else denom,
                     jnp.float32).reshape(1, 1)
    invd = 1.0 / dn
    outs = step(cpad, tpad, nv, invd, *[padded[nm] for nm in names])
    pred = outs[0][:n, :o]
    dw = {nm: outs[1 + k] for k, nm in enumerate(names)}
    return pred, _unstack_grads(dw, params, L, h, hp, o)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from wire_tpu.nn import get_inr
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=300, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    spec = model.spec
    params = model.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (N, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))

    # ---- parity ----
    pj = jax.jit(lambda p: wire_step_pipe(p, coords, tgt, spec))
    fj = jax.jit(lambda p: wire_step_fused(p, coords, tgt, spec))
    yp, gp = pj(params)
    yf, gf = fj(params)
    yp, yf = np.asarray(yp), np.asarray(yf)
    rel_y = float(np.linalg.norm(yp - yf) / (np.linalg.norm(yf) + 1e-30))
    rels = {}
    for k in gf:
        for kk in gf[k]:
            a = np.asarray(gp[k][kk]).ravel()
            b = np.asarray(gf[k][kk]).ravel()
            rels[f"{k}.{kk}"] = float(
                np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))
    print(json.dumps({"rel_y": rel_y, "max_rel_g": max(rels.values()),
                      "worst": max(rels, key=rels.get)}), flush=True)

    # ---- scan timing ----
    def scan_of(stepfn):
        def body(p, _):
            pred, g = stepfn(p, coords, tgt, spec)
            p2 = jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
            return p2, jnp.sum(pred[:1])

        def run(p):
            return jax.lax.scan(body, p, None, length=K)

        return jax.jit(run)

    for name, fn in (("fused", wire_step_fused), ("pipe", wire_step_pipe)):
        r = scan_of(fn)
        out = r(params)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = r(params)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"kernel": name, "N": N, "K": K,
                          "step_ms": round(best / K * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
