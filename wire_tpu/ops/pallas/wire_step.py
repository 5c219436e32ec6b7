"""One-pass fused TRAIN-STEP Pallas kernel for the WIRE complex-Gabor MLP.

The separate fwd/bwd kernel pair in wire_mlp.py pays the forward twice per
training step: once to produce predictions and once recomputed inside the
backward (the custom-VJP residual strategy).  A training step, however, is
a single fusable computation:

    y = f(params, coords);  dL/dy = 2·mask·(y - target)/denom;  dparams

so this kernel does all three in ONE Pallas call per coordinate tile: the
forward's pre-activations stay live in VMEM when the backward starts (no
recompute, no HBM residual traffic), the MSE loss-gradient is computed
in-kernel from the target tile, and weight gradients accumulate across the
sequential grid.  dcoords is not emitted (training never uses it), which
also drops the first-layer data-grad GEMM.

Complex GEMMs use the STACKED layout: a complex matmul
(ar + i·ai) @ (wr + i·wi) is four (h, h) real GEMMs, but stacking
A = [ar | ai] (n, 2h) against W = [[wr, wi], [-wi, wr]] (2h, 2h) computes
the same MACs in ONE MXU contraction with doubled M/K — fewer, larger
GEMMs keep the systolic array pipeline full (measured ~3% over the
4-GEMM form, on top of the ~25% FLOP cut from skipping the recompute).

Loss semantics (matching train/trainer.py's chunk_loss exactly):

    loss = sum_{rows < nvalid} (y - t)^2 / denom

with the invalid (permutation-padding sentinel) rows contiguous at the
tail — the trainer constructs them that way (perm padding appends
sentinels, so they land at the end of the last chunk).

This is the hot path of the reference's training loops
(wire_image_denoise.py:142-178, SURVEY.md §3.1): one full fwd+bwd over a
65K-coordinate minibatch of a 3-layer complex-Gabor MLP per step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wire_tpu.ops.pallas.wire_mlp import (_gabor, _gabor_first, _make_dot,
                                          _round_up)

# Coordinate rows per grid step.  Swept on v5e at the headline config
# (65536 coords, h=212->256): 256/512/1024/2048 -> 15.8/18.2/19.0/17.3
# Mcoords/s; 4096 exceeds the raised VMEM cap.
TILE_N = 1024

# Independent row-group streams per tile.  The layer chain is serially
# dependent (GEMM -> VPU transcendentals -> GEMM); processing S independent
# row groups stage-interleaved gives the Mosaic scheduler independent MXU
# and VPU work to overlap, hiding the dependency stalls that cap the
# single-stream kernel at ~37% of MXU peak.
N_STREAMS = 1


def _pad_params_stacked(params, L, hp, op):
    """Stacked, lane-padded weights.

    Per hidden layer one (2hp, 2hp) block matrix [[wr, wi], [-wi, wr]] so
    [ar|ai] @ W = [ar@wr - ai@wi | ar@wi + ai@wr]; the final layer keeps
    only the real output: fW = [fwr; -fwi] (2hp, op).  Zero padding is
    exact for the same reason as wire_mlp._pad_params: padded activation
    lanes meet zero consumer-weight rows.
    """
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
    out["fW"] = jnp.concatenate(
        [jnp.pad(f["wr"], ((0, hp - h), (0, op - o))),
         jnp.pad(-f["wi"], ((0, hp - h), (0, op - o)))], axis=0)
    out["fb"] = jnp.pad(f["br"], (0, op - o))[None, :]
    return out, d, h, o


def _unstack_grads(dw, params, L, h, hp, o):
    """Map stacked-layout weight grads back to the params pytree.

    For G = d(loss)/d(h{i}W): W's four blocks alias wr (twice) and ±wi, so
    dwr = G[:h,:h] + G[hp:hp+h, hp:hp+h] and dwi = G[:h, hp:] - G[hp:, :h].
    fW rows [0:hp] = fwr and [hp:] = -fwi, so dfwi = -G[hp:].  dfinal.bi=0
    because the model discards the imaginary output (wire.py:164-165).
    """
    dparams = {
        "first": {"w": dw["w1"][:, :h], "b": dw["b1"][0, :h]},
        "final": {"wr": dw["fW"][:h, :o],
                  "wi": -dw["fW"][hp:hp + h, :o],
                  "br": dw["fb"][0, :o],
                  "bi": jnp.zeros_like(params["final"]["bi"])},
    }
    for i in range(L):
        G = dw[f"h{i}W"]
        B = dw[f"h{i}B"][0]
        dparams[f"hidden_{i}"] = {
            "wr": G[:h, :h] + G[hp:hp + h, hp:hp + h],
            "wi": G[:h, hp:hp + h] - G[hp:hp + h, :h],
            "br": B[:h], "bi": B[hp:hp + h]}
    return dparams


def _make_step_kernel(L, omega0, sigma0, first_omega0, names, precision,
                      tile_n, hp, streams=1):
    _dot, _dot_tn, _dot_nt = _make_dot(precision)
    s2 = sigma0 * sigma0
    S = streams
    rows_per = tile_n // S

    def kernel(*refs):
        c_ref, t_ref, nv_ref, invd_ref = refs[:4]
        w = {nm: refs[4 + k][:] for k, nm in enumerate(names)}
        outs = refs[4 + len(names):]
        y_ref = outs[0]
        dacc = {nm: outs[1 + k] for k, nm in enumerate(names)}
        i = pl.program_id(0)

        def rows_of(ref, s):
            return ref[pl.ds(s * rows_per, rows_per), :]

        # ---- forward, keeping (input activation, pre-activation) live ----
        # Each stage loops over the S independent row-group streams before
        # advancing, so stream s+1's GEMM can occupy the MXU while stream
        # s's transcendentals run on the VPU.
        c = [rows_of(c_ref, s) for s in range(S)]
        z1 = [_dot(c[s], w["w1"]) + w["b1"] for s in range(S)]
        a = []
        for s in range(S):
            m0 = jnp.exp(-s2 * (z1[s] * z1[s]))
            a.append(jnp.concatenate(
                [m0 * jnp.cos(first_omega0 * z1[s]),
                 m0 * jnp.sin(first_omega0 * z1[s])], axis=1))
        live = []      # per hidden layer, per stream: (a_in, zr, zi); the
        # gabor factors are NOT stored — the backward recovers (ar, ai)
        # from the next layer's a_in, so each layer keeps 3 arrays live
        # instead of 6 and the reverse sweep needs no transcendentals.
        for li in range(L):
            z = [_dot(a[s], w[f"h{li}W"]) + w[f"h{li}B"] for s in range(S)]
            lay = []
            nxt = []
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
        for s in range(S):
            y_ref[pl.ds(s * rows_per, rows_per), :] = y[s]

        # ---- in-kernel MSE loss-gradient ---------------------------------
        # rows >= nvalid are permutation-padding sentinels (always tail-
        # contiguous); their gradient contribution must be exactly zero.
        g = []
        for s in range(S):
            rows = (i * tile_n + s * rows_per
                    + jax.lax.broadcasted_iota(jnp.int32, (rows_per, 1), 0))
            mask = (rows < nv_ref[0, 0]).astype(y[s].dtype)
            g.append((2.0 * invd_ref[0, 0]) * mask * (y[s] - rows_of(t_ref, s)))

        # ---- backward on the live activations ----------------------------
        def acc(nm, val):
            @pl.when(i == 0)
            def _():
                dacc[nm][:] = val

            @pl.when(i != 0)
            def _():
                dacc[nm][:] += val

        def accsum(parts):
            out = parts[0]
            for p in parts[1:]:
                out = out + p
            return out

        acc("fW", accsum([_dot_tn(a[s], g[s]) for s in range(S)]))
        acc("fb", accsum([jnp.sum(g[s], axis=0, keepdims=True)
                          for s in range(S)]))
        da = [_dot_nt(g[s], w["fW"]) for s in range(S)]

        # Gabor backward in activation form: with (ar, ai) the layer's own
        # output activation (= the NEXT layer's a_in, so it's already live)
        # and dL/d(ar,ai) = (dar, dai),
        #   t1 = dar*ar + dai*ai        (= dm·m, the modulus channel)
        #   t2 = dai*ar - dar*ai        (= m·dphase, the phase channel)
        #   dzr = -2σ²·zr·t1 + ω₀·t2
        #   dzi = (-ω₀ - 2σ²·zi)·t1
        # — algebraically identical to the m/cos/sin form but ~25% fewer
        # VPU ops and no transcendentals in the reverse sweep.
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
            acc(f"h{li}B", accsum([jnp.sum(dz[s], axis=0, keepdims=True)
                                   for s in range(S)]))
            da = [_dot_nt(dz[s], w[f"h{li}W"]) for s in range(S)]
            a_out = [live[li][s][0] for s in range(S)]

        dz1 = []
        for s in range(S):
            # a_out is now the first-layer activation (m0·cos0 | m0·sin0)
            ar, ai = a_out[s][:, :hp], a_out[s][:, hp:]
            dar, dai = da[s][:, :hp], da[s][:, hp:]
            t1 = dar * ar + dai * ai
            t2 = dai * ar - dar * ai
            dz1.append((-2.0 * s2) * z1[s] * t1 + first_omega0 * t2)
        acc("w1", accsum([_dot_tn(c[s], dz1[s]) for s in range(S)]))
        acc("b1", accsum([jnp.sum(dz1[s], axis=0, keepdims=True)
                          for s in range(S)]))
        # no dcoords: training never differentiates w.r.t. the grid

    return kernel


@functools.lru_cache(maxsize=32)
def _step_program(L, omega0, sigma0, first_omega0, d, h, o, tile_n, n_tiles,
                  interpret, precision="default", streams=1):
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
        _make_step_kernel(L, omega0, sigma0, first_omega0, names, precision,
                          tile_n, hp, streams=streams),
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
        interpret=interpret,
        # weight-grad accumulators are revisited every grid step -> the grid
        # must execute sequentially ("arbitrary")
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return step, names, hp, op


def wire_step_fused(params, coords, target, spec, *, nvalid=None,
                    denom=None, interpret=False):
    """One fused train step: returns (pred, dparams) for

        loss = sum_{rows < nvalid} (pred - target)^2 / denom

    coords (n, d), target (n, c).  nvalid defaults to n, denom to n*c
    (plain mean-MSE).  Both may be traced scalars (the trainer's chunk
    scan passes a data-dependent nvalid).  pred is returned for ALL rows
    (sentinel rows render coords as given; callers drop them).
    """
    n, d = coords.shape
    h = params["first"]["w"].shape[1]
    o = params["final"]["br"].shape[0]
    L = spec.hidden_layers
    n_pad = _round_up(n, TILE_N)
    n_tiles = n_pad // TILE_N
    streams = N_STREAMS if TILE_N % max(N_STREAMS, 1) == 0 else 1
    step, names, hp, op = _step_program(
        L, float(spec.hidden_omega0), float(spec.scale),
        float(spec.first_omega0), d, h, o, TILE_N, n_tiles, interpret,
        getattr(spec, "gemm_precision", "default"), streams)
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
