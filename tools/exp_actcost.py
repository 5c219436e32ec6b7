#!/usr/bin/env python
"""Decompose the one-pass WIRE step kernel's time into MXU vs VPU budget.

Times three kernels with IDENTICAL GEMM dataflow (stacked complex layout,
same shapes, same accumulators) at the headline config, differing only in
the activation elementwise work:

  gabor     exp/cos/sin forward + activation-form backward (the real kernel)
  cheap     polynomial stand-ins (same op count shape, no transcendentals)
  identity  a = z passthrough (no elementwise at all)

If identity ~= gabor, the kernel is MXU/DMA-bound and VPU work is free; the
gap gabor-vs-identity is the ceiling for any transcendental optimization.

Usage: python tools/exp_actcost.py [N] [reps]
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
from wire_tpu.ops.pallas.wire_step import (_pad_params_stacked,  # noqa: E402
                                           TILE_N)


def _make_variant_kernel(L, omega0, sigma0, first_omega0, names, tile_n, hp,
                         flavor):
    _dot, _dot_tn, _dot_nt = _make_dot("default")
    s2 = sigma0 * sigma0

    def act_first(z1):
        if flavor == "identity":
            return jnp.concatenate([z1, z1], axis=1)
        if flavor == "cheap":
            m0 = 1.0 - s2 * (z1 * z1)
            return jnp.concatenate([m0 * z1, m0 * (1.0 - z1)], axis=1)
        m0 = jnp.exp(-s2 * (z1 * z1))
        return jnp.concatenate([m0 * jnp.cos(first_omega0 * z1),
                                m0 * jnp.sin(first_omega0 * z1)], axis=1)

    def act_hidden(zr, zi):
        if flavor == "identity":
            return jnp.concatenate([zr, zi], axis=1)
        if flavor == "cheap":
            m = 1.0 - omega0 * zi - s2 * (zr * zr + zi * zi)
            return jnp.concatenate([m * zr, m * zi], axis=1)
        m = jnp.exp(-omega0 * zi - s2 * (zr * zr + zi * zi))
        return jnp.concatenate([m * jnp.cos(omega0 * zr),
                                m * jnp.sin(omega0 * zr)], axis=1)

    def bwd_hidden(a_out, da, zr, zi):
        if flavor == "identity":
            return da
        ar, ai = a_out[:, :hp], a_out[:, hp:]
        dar, dai = da[:, :hp], da[:, hp:]
        t1 = dar * ar + dai * ai
        t2 = dai * ar - dar * ai
        dzr = (-2.0 * s2) * zr * t1 + omega0 * t2
        dzi = (-omega0 - (2.0 * s2) * zi) * t1
        return jnp.concatenate([dzr, dzi], axis=1)

    def bwd_first(a_out, da, z1):
        if flavor == "identity":
            return da[:, :hp] + da[:, hp:]
        ar, ai = a_out[:, :hp], a_out[:, hp:]
        dar, dai = da[:, :hp], da[:, hp:]
        t1 = dar * ar + dai * ai
        t2 = dai * ar - dar * ai
        return (-2.0 * s2) * z1 * t1 + first_omega0 * t2

    def kernel(*refs):
        c_ref, t_ref, nv_ref, invd_ref = refs[:4]
        w = {nm: refs[4 + k][:] for k, nm in enumerate(names)}
        outs = refs[4 + len(names):]
        y_ref = outs[0]
        dacc = {nm: outs[1 + k] for k, nm in enumerate(names)}
        i = pl.program_id(0)

        c = c_ref[:]
        z1 = _dot(c, w["w1"]) + w["b1"]
        a = act_first(z1)
        live = []
        for li in range(L):
            z = _dot(a, w[f"h{li}W"]) + w[f"h{li}B"]
            zr, zi = z[:, :hp], z[:, hp:]
            live.append((a, zr, zi))
            a = act_hidden(zr, zi)
        y = _dot(a, w["fW"]) + w["fb"]
        y_ref[:] = y

        rows = (i * tile_n
                + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0))
        mask = (rows < nv_ref[0, 0]).astype(y.dtype)
        g = (2.0 * invd_ref[0, 0]) * mask * (y - t_ref[:])

        def acc(nm, val):
            @pl.when(i == 0)
            def _():
                dacc[nm][:] = val

            @pl.when(i != 0)
            def _():
                dacc[nm][:] += val

        acc("fW", _dot_tn(a, g))
        acc("fb", jnp.sum(g, axis=0, keepdims=True))
        da = _dot_nt(g, w["fW"])
        a_out = a
        for li in range(L - 1, -1, -1):
            a_in, zr, zi = live[li]
            dz = bwd_hidden(a_out, da, zr, zi)
            acc(f"h{li}W", _dot_tn(a_in, dz))
            acc(f"h{li}B", jnp.sum(dz, axis=0, keepdims=True))
            da = _dot_nt(dz, w[f"h{li}W"])
            a_out = a_in
        dz1 = bwd_first(a_out, da, z1)
        acc("w1", _dot_tn(c, dz1))
        acc("b1", jnp.sum(dz1, axis=0, keepdims=True))

    return kernel


@functools.lru_cache(maxsize=16)
def _variant_program(L, omega0, sigma0, first_omega0, d, h, o, tile_n,
                     n_tiles, flavor):
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

    step = pl.pallas_call(
        _make_variant_kernel(L, omega0, sigma0, first_omega0, names, tile_n,
                             hp, flavor),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_n, op), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  sspec(), sspec()]
                 + [wspec(nm) for nm in names],
        out_specs=[pl.BlockSpec((tile_n, op), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)]
                  + [wspec(nm) for nm in names],
        out_shape=[jax.ShapeDtypeStruct((n_tiles * tile_n, op), jnp.float32)]
                  + [jax.ShapeDtypeStruct(shapes[nm], jnp.float32)
                     for nm in names],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return step, names


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


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    from wire_tpu.nn import get_inr
    from wire_tpu.ops.pallas.wire_step import wire_step_fused

    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=300, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    params = model.init(jax.random.key(0))
    spec = model.spec
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (N, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))

    real_step = jax.jit(
        lambda p, c, t: wire_step_fused(p, c, t, spec))
    res = {"N": N, "tile": TILE_N,
           "real_ms": round(timed(real_step, params, coords, tgt,
                                  reps=reps), 3)}

    L, h, o, d = 2, params["first"]["w"].shape[1], 3, 2
    n_pad = _round_up(N, TILE_N)
    n_tiles = n_pad // TILE_N
    for flavor in ("gabor", "cheap", "identity"):
        step, names = _variant_program(
            L, float(spec.hidden_omega0), float(spec.scale),
            float(spec.first_omega0), d, h, o, TILE_N, n_tiles, flavor)
        hp = _round_up(h, 128)
        op = _round_up(o, 128)
        padded, _, _, _ = _pad_params_stacked(params, L, hp, op)
        cpad = jnp.pad(coords, ((0, n_pad - N), (0, 0)))
        tpad = jnp.pad(tgt, ((0, n_pad - N), (0, op - o)))
        nv = jnp.full((1, 1), N, jnp.int32)
        invd = jnp.full((1, 1), 1.0 / (N * o), jnp.float32)

        def run(c, t, nv, invd, *ws, _step=step):
            return _step(c, t, nv, invd, *ws)

        f = jax.jit(run)
        res[f"{flavor}_ms"] = round(
            timed(f, cpad, tpad, nv, invd, *[padded[nm] for nm in names],
                  reps=reps), 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
