"""One-pass fused TRAIN-STEP Pallas kernel for the WIRE complex-Gabor MLP,
cross-tile software-pipelined.

The separate fwd/bwd kernel pair in wire_mlp.py pays the forward twice per
training step: once to produce predictions and once recomputed inside the
backward (the custom-VJP residual strategy).  A training step, however, is
a single fusable computation:

    y = f(params, coords);  dL/dy = 2·mask·(y - target)/denom;  dparams

so this kernel does all three in ONE Pallas call: forward, in-kernel MSE
loss-gradient, and backward, with weight gradients accumulated across the
sequential grid.  dcoords is not emitted (training never uses it), which
also drops the first-layer data-grad GEMM.

Two scheduling facts (measured on v5e, tools/exp_chain.py + exp_accvar.py)
shape the structure:

1. **Region boundaries are scheduling barriers.**  `pl.when`-guarded
   accumulator writes interleaved with the GEMMs stop the Mosaic scheduler
   from overlapping MXU work across them.  Weight grads therefore
   accumulate into VMEM *scratch* with unconditional `+=` (zeroed once at
   grid step 0, flushed to the outputs once at the last step) — the hot
   body has no control flow at all.

2. **A dependent GEMM chain stalls the MXU; two independent chains run at
   ~the independent-GEMM rate** (chain microbench: 1 chain 1.01ms, 2
   chains 0.713ms at equal MACs).  The grid is therefore software-
   pipelined across coordinate tiles:

       grid step i:  forward(tile i)    + loss-grad, live activations
                                          -> VMEM scratch slot i%2
                     backward(tile i-1) <- scratch slot (i-1)%2

   with grid = n_tiles + 1; the fwd and bwd instruction streams touch
   different tiles, so they are hand-interleaved in program order and the
   scheduler fills each chain's dependency stalls with the other's work.
   Step 0's phantom backward consumes zeroed scratch (accumulates exact
   zeros); step n_tiles' phantom forward recomputes the last tile (its
   y-block rewrite is identical).  Net win vs the serial one-pass kernel
   (same-session head-to-head): ~7% (3.02 -> 2.81 ms at the 65536-coord
   WIRE-300 headline config; real families 1.04 -> 0.95 ms); gradients
   bitwise-identical.

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

from wire_tpu.ops.pallas.wire_mlp import (_make_dot, _round_up,
                                           fast_sincos)

# Coordinate rows per grid step.  Two sweeps on v5e at the headline config
# (65536 coords, h=212->256):
#   serial one-pass kernel: 256/512/1024/2048 -> 15.8/18.2/19.0/17.3
#     Mcoords/s (4096 exceeds the raised VMEM cap) -> 1024 won;
#   cross-tile PIPELINED kernel (tools/exp_tilesweep_pipe.py, best-of-4
#     50-step scans, reproduced twice): 256/512/1024/2048 ->
#     2.831/2.743/2.823/3.27 ms -> 512 wins by ~3%.  More, shorter tiles
#     give the two interleaved chains more overlap windows; "wider M per
#     grid step" (PERF.md's earlier headroom guess) measured WORSE.
TILE_N = 512


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
                      tile_n, hp, n_tiles, metrics):
    _dot, _dot_tn, _dot_nt = _make_dot(precision)
    s2 = sigma0 * sigma0

    def kernel(*refs):
        if metrics:
            c_ref, t_ref, gt_ref, nv_ref, invd_ref = refs[:5]
            refs = refs[5:]
        else:
            c_ref, t_ref, nv_ref, invd_ref = refs[:4]
            gt_ref = None
            refs = refs[4:]
        w = {nm: refs[k][:] for k, nm in enumerate(names)}
        refs = refs[len(names):]
        y_ref = refs[0]
        refs = refs[1:]
        m_ref = None
        if metrics:
            m_ref, refs = refs[0], refs[1:]
        dout = {nm: refs[k] for k, nm in enumerate(names)}
        refs = refs[len(names):]
        dacc = {nm: refs[k] for k, nm in enumerate(names)}
        refs = refs[len(names):]
        sc_m = None
        if metrics:
            sc_m, refs = refs[0], refs[1:]
        live = refs
        # live-activation scratch, 2 slots each: c, z1, (a_in, zr, zi) x L,
        # a_fin, g
        sc_c, sc_z1 = live[0], live[1]
        sc_layer = [(live[2 + 3 * li], live[3 + 3 * li], live[4 + 3 * li])
                    for li in range(L)]
        sc_afin, sc_g = live[2 + 3 * L], live[3 + 3 * L]

        i = pl.program_id(0)
        sf = jax.lax.rem(i, 2)       # fwd writes slot i%2
        sb = jax.lax.rem(i + 1, 2)   # bwd reads slot (i-1)%2

        @pl.when(i == 0)
        def _zero():
            for nm in names:
                dacc[nm][:] = jnp.zeros_like(dacc[nm])
            if metrics:
                sc_m[:] = jnp.zeros_like(sc_m)
            # slot 1 feeds step 0's phantom backward: zeros in -> exact
            # zeros accumulated
            for ref in live:
                ref[1] = jnp.zeros_like(ref[1])

        def acc(nm, val):
            # unconditional VMEM accumulate: no control-flow region, so the
            # scheduler can interleave MXU work across it
            dacc[nm][:] += val

        # ---- fwd(tile i) hand-interleaved with bwd(tile i-1) -------------
        c = c_ref[:]
        sc_c[sf] = c
        z1 = _dot(c, w["w1"]) + w["b1"]

        g_b = sc_g[sb]
        afin_b = sc_afin[sb]
        acc("fW", _dot_tn(afin_b, g_b))
        da = _dot_nt(g_b, w["fW"])

        sc_z1[sf] = z1
        m0 = jnp.exp(-s2 * (z1 * z1))
        sn1, cs1 = fast_sincos(first_omega0 * z1)
        a = jnp.concatenate([m0 * cs1, m0 * sn1], axis=1)
        acc("fb", jnp.sum(g_b, axis=0, keepdims=True))

        # Gabor backward in activation form: with (ar, ai) the layer's own
        # output activation (stored as the NEXT layer's a_in) and
        # dL/d(ar,ai) = (dar, dai),
        #   t1 = dar*ar + dai*ai        (= dm·m, the modulus channel)
        #   t2 = dai*ar - dar*ai        (= m·dphase, the phase channel)
        #   dzr = -2σ²·zr·t1 + ω₀·t2
        #   dzi = (-ω₀ - 2σ²·zi)·t1
        # — algebraically identical to the m/cos/sin form but ~25% fewer
        # VPU ops and no transcendentals in the reverse sweep.
        a_out_b = afin_b
        for li in range(L):
            # fwd hidden layer li of tile i ...
            sc_layer[li][0][sf] = a
            z = _dot(a, w[f"h{li}W"]) + w[f"h{li}B"]

            # ... zipped with bwd hidden layer L-1-li of tile i-1
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
            snl, csl = fast_sincos(omega0 * zr)
            a = jnp.concatenate([m * csl, m * snl], axis=1)
            a_out_b = a_in_b

        # fwd epilogue: final layer of tile i
        sc_afin[sf] = a
        y = _dot(a, w["fW"]) + w["fb"]
        y_ref[:] = y

        # bwd epilogue: first layer of tile i-1
        z1_b = sc_z1[sb]
        ar_b, ai_b = a_out_b[:, :hp], a_out_b[:, hp:]
        dar, dai = da[:, :hp], da[:, hp:]
        t1 = dar * ar_b + dai * ai_b
        t2 = dai * ar_b - dar * ai_b
        dz1 = (-2.0 * s2) * z1_b * t1 + first_omega0 * t2
        acc("w1", _dot_tn(sc_c[sb], dz1))
        acc("b1", jnp.sum(dz1, axis=0, keepdims=True))
        # no dcoords: training never differentiates w.r.t. the grid

        # ---- in-kernel MSE loss-gradient for tile i (consumed at i+1) ----
        # rows >= nvalid are permutation-padding sentinels (always tail-
        # contiguous); their gradient contribution must be exactly zero.
        tile = jnp.minimum(i, n_tiles - 1)
        rows = (tile * tile_n
                + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0))
        mask = (rows < nv_ref[0, 0]).astype(y.dtype)
        err_t = mask * (y - t_ref[:])
        sc_g[sf] = (2.0 * invd_ref[0, 0]) * err_t

        if metrics:
            # per-lane masked squared-error sums, accumulated across tiles
            # (row 0 vs the fitting target, row 1 vs the clean gt) — the
            # trainer's epoch metrics without any XLA-side reduction over
            # the reconstruction buffer.  The phantom step (i == n_tiles)
            # refetches tile n_tiles-1, so its contribution is weighted to
            # exactly zero (a scalar multiply, not a pl.when region — those
            # are scheduling barriers).
            w_live = (i < n_tiles).astype(y.dtype)
            err_g = mask * (y - gt_ref[:])
            sc_m[0:1] += w_live * jnp.sum(err_t * err_t, axis=0,
                                          keepdims=True)
            sc_m[1:2] += w_live * jnp.sum(err_g * err_g, axis=0,
                                          keepdims=True)

        @pl.when(i == n_tiles)
        def _flush():
            for nm in names:
                dout[nm][:] = dacc[nm][:]
            if metrics:
                m_ref[:] = sc_m[:]

    return kernel


@functools.lru_cache(maxsize=32)
def _step_program(L, omega0, sigma0, first_omega0, d, h, o, tile_n, n_tiles,
                  interpret, precision="default", metrics=False):
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

    # clamped tile index: the final grid step (i == n_tiles) re-fetches the
    # last tile and rewrites its (identical) y block while running the real
    # last backward
    def imap(i):
        return (jnp.minimum(i, n_tiles - 1), 0)

    scratch = [pltpu.VMEM(shapes[nm], jnp.float32) for nm in names]
    if metrics:
        scratch += [pltpu.VMEM((2, op), jnp.float32)]          # metric sums
    scratch += [pltpu.VMEM((2, tile_n, d), jnp.float32),       # c
                pltpu.VMEM((2, tile_n, hp), jnp.float32)]      # z1
    for _ in range(L):
        scratch += [pltpu.VMEM((2, tile_n, 2 * hp), jnp.float32),  # a_in
                    pltpu.VMEM((2, tile_n, hp), jnp.float32),      # zr
                    pltpu.VMEM((2, tile_n, hp), jnp.float32)]      # zi
    scratch += [pltpu.VMEM((2, tile_n, 2 * hp), jnp.float32),      # a_fin
                pltpu.VMEM((2, tile_n, op), jnp.float32)]          # g

    tspec = pl.BlockSpec((tile_n, op), imap, memory_space=pltpu.VMEM)
    mspec = [pl.BlockSpec((2, op), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)] if metrics else []
    mshape = [jax.ShapeDtypeStruct((2, op), jnp.float32)] if metrics else []
    step = pl.pallas_call(
        _make_step_kernel(L, omega0, sigma0, first_omega0, names, precision,
                          tile_n, hp, n_tiles, metrics),
        grid=(n_tiles + 1,),
        in_specs=[pl.BlockSpec((tile_n, d), imap, memory_space=pltpu.VMEM),
                  tspec] + ([tspec] if metrics else [])
                 + [sspec(), sspec()]
                 + [wspec(nm) for nm in names],
        out_specs=[pl.BlockSpec((tile_n, op), imap,
                                memory_space=pltpu.VMEM)]
                  + mspec
                  + [wspec(nm) for nm in names],
        out_shape=[jax.ShapeDtypeStruct((n_tiles * tile_n, op), jnp.float32)]
                  + mshape
                  + [jax.ShapeDtypeStruct(shapes[nm], jnp.float32)
                     for nm in names],
        scratch_shapes=scratch,
        interpret=interpret,
        # weight-grad accumulators and live-activation slots persist across
        # grid steps -> the grid must execute sequentially ("arbitrary")
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    return step, names, hp, op


def wire_step_fused(params, coords, target, spec, *, nvalid=None,
                    denom=None, gt=None, want_metrics=False,
                    interpret=False):
    """One fused train step: returns (pred, dparams) for

        loss = sum_{rows < nvalid} (pred - target)^2 / denom

    coords (n, d), target (n, c).  nvalid defaults to n, denom to n*c
    (plain mean-MSE).  Both may be traced scalars (the trainer's chunk
    scan passes a data-dependent nvalid).  pred is returned for ALL rows
    (sentinel rows render coords as given; callers drop them).

    want_metrics=True additionally returns the in-kernel accumulated
    masked squared-error sums ``(sse_target, sse_gt)`` (scalars; gt
    defaults to target) as a third element — the trainer's per-epoch
    metrics with no XLA-side reduction over the prediction buffer.
    """
    n, d = coords.shape
    h = params["first"]["w"].shape[1]
    o = params["final"]["br"].shape[0]
    L = spec.hidden_layers
    n_pad = _round_up(n, TILE_N)
    n_tiles = n_pad // TILE_N
    step, names, hp, op = _step_program(
        L, float(spec.hidden_omega0), float(spec.scale),
        float(spec.first_omega0), d, h, o, TILE_N, n_tiles, interpret,
        getattr(spec, "gemm_precision", "default"), want_metrics)
    padded, _, _, _ = _pad_params_stacked(params, L, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    tpad = jnp.pad(target, ((0, n_pad - n), (0, op - o)))
    nv = jnp.full((1, 1), n, jnp.int32) if nvalid is None else \
        jnp.asarray(nvalid, jnp.int32).reshape(1, 1)
    dn = jnp.asarray(float(n * o) if denom is None else denom,
                     jnp.float32).reshape(1, 1)
    invd = 1.0 / dn
    args = [cpad, tpad]
    if want_metrics:
        gt_arr = target if gt is None else gt
        args.append(jnp.pad(gt_arr, ((0, n_pad - n), (0, op - o))))
    outs = step(*args, nv, invd, *[padded[nm] for nm in names])
    pred = outs[0][:n, :o]
    k0 = 1
    sums = None
    if want_metrics:
        m = outs[1]
        sums = (jnp.sum(m[0]), jnp.sum(m[1]))
        k0 = 2
    dw = {nm: outs[k0 + k] for k, nm in enumerate(names)}
    dparams = _unstack_grads(dw, params, L, h, hp, o)
    if want_metrics:
        return pred, dparams, sums
    return pred, dparams
