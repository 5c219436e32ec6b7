"""One-pass fused TRAIN-STEP Pallas kernel for bspline_mscale_2
(VERDICT r4 #2): forward of ALL per-scale trunks + the freq_combine
combiner + MSE loss-gradient + full backward in a SINGLE pallas_call.

The r4 path ran TWO kernels (the M-stacked fused apply + its custom-VJP
backward) with the combiner and loss in XLA between them, because the
freq_combine combiner (bspline_mscale_2.py:78-92) mixes the per-scale row
blocks of the same coordinate — a layout problem, not a fundamental one:
per COORDINATE the combiner is row-local once the scales live side by side.
This kernel keeps each scale's trunk as its own chain INSIDE one grid step
(the ns chains are independent, so the scheduler fills each chain's GEMM
dependency stalls with the others' — the same effect wire_mlp.py buys with
two half-tile chains), and expresses the combiner's first GEMM

    cat = [y_1 | ... | y_ns] (n, ns*o)  @  F0 (ns*o, 128)

as  sum_s  y_s (n, op) @ F0_s (op, 128)  with F0's row blocks zero-padded
o -> op: bitwise the same contraction, but no sub-128-lane slicing (Mosaic
lane slices must be 128-aligned; o is 1 or 3 here).  The combiner's hidden
width is exactly 128 (bspline_mscale_2.py:84) — lane-native by luck.

The trunk layers consume the same canonical (w, alpha, beta) form as
real_mlp.py with the per-scale activation prescale gamma_s = 1/s applied
in-kernel (v = gamma_s * (alpha*z + beta), matching _bspline_layer's
'divide' mode); trunk grads flow back to native params via jax.vjp through
the canonicalization, combiner grads map directly.  Since forward and
backward share one grid step, the per-layer (z, a, dB(v)) stay live as
kernel values — no cross-step scratch slots, no phantom step; weight-grad
accumulators persist in VMEM scratch across the sequential grid and flush
at the last tile.  Loss semantics match the trainer's chunk_loss:
loss = sum_{rows < nvalid} (pred - t)^2 / denom, padding rows at the tail.

Registry shapes (train/presets.py): hf=256 (wp=256), 2-3 scales, o in
{1, 3} — ns * (L=3) live activation sets at TILE 512 stay ~10 MB of VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wire_tpu.ops.pallas.real_mlp import _basis_pair, _round_up
from wire_tpu.ops.pallas.wire_mlp import _make_dot

# r5 on-chip sweep at the registry shape (hf=256, L=3, ns=3, 65536 coords):
# tile 256/512/1024/2048 -> 0.96/0.96/0.94/0.95 ms per step
TILE_N = 1024


def _make_kernel(L, ns, kinds, gammas, tile_n, n_tiles, metrics, precision):
    _dot, _dot_tn, _dot_nt = _make_dot(precision)

    def kernel(*refs):
        if metrics:
            c_ref, t_ref, gt_ref, nv_ref, invd_ref = refs[:5]
            refs = refs[5:]
        else:
            c_ref, t_ref, nv_ref, invd_ref = refs[:4]
            gt_ref = None
            refs = refs[4:]
        ws = [refs[3 * i][:] for i in range(L)]
        alphas = [refs[1 + 3 * i][:] for i in range(L)]
        betas = [refs[2 + 3 * i][:] for i in range(L)]
        refs = refs[3 * L:]
        wf, bf = refs[0][:], refs[1][:]
        F0, f0, F1, f1 = refs[2][:], refs[3][:], refs[4][:], refs[5][:]
        refs = refs[6:]
        y_ref = refs[0]
        refs = refs[1:]
        m_ref = None
        if metrics:
            m_ref, refs = refs[0], refs[1:]
        n_acc = 3 * L + 6
        douts = refs[:n_acc]
        daccs = refs[n_acc:2 * n_acc]
        sc_m = refs[2 * n_acc] if metrics else None

        op = wf.shape[1]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _zero():
            for ref in daccs:
                ref[:] = jnp.zeros_like(ref)
            if metrics:
                sc_m[:] = jnp.zeros_like(sc_m)

        def acc(k, val):
            daccs[k][:] += val

        # ---- forward: ns independent trunk chains + combiner -------------
        c = c_ref[:]
        acts = []            # per scale: list of (z, a_prev, dBv)
        ys = []
        u0 = f0
        for s in range(ns):
            g = gammas[s]
            a = c
            lay = []
            for li in range(L):
                z = _dot(a, ws[li])
                v = g * (alphas[li] * z + betas[li])
                a_new, dBv = _basis_pair(kinds[li])(v)
                lay.append((z, a, dBv))
                a = a_new
            y_s = _dot(a, wf) + bf
            lay.append((None, a, None))      # final layer input
            acts.append(lay)
            ys.append(y_s)
            u0 = u0 + _dot(y_s, F0[s * op:(s + 1) * op])
        u = jnp.maximum(u0, 0.0)
        y = _dot(u, F1) + f1
        y_ref[:] = y

        # ---- in-kernel MSE loss-gradient ---------------------------------
        rows = (i * tile_n
                + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0))
        mask = (rows < nv_ref[0, 0]).astype(y.dtype)
        err_t = mask * (y - t_ref[:])
        e = (2.0 * invd_ref[0, 0]) * err_t

        if metrics:
            err_g = mask * (y - gt_ref[:])
            sc_m[0:1] += jnp.sum(err_t * err_t, axis=0, keepdims=True)
            sc_m[1:2] += jnp.sum(err_g * err_g, axis=0, keepdims=True)

        # ---- backward ----------------------------------------------------
        # accumulator order: [W x L][alpha x L][beta x L][wf][bf][F0][f0]
        # [F1][f1]
        kW, kal, kbe = 0, L, 2 * L
        kwf, kbf, kF0, kf0, kF1, kf1 = (3 * L, 3 * L + 1, 3 * L + 2,
                                        3 * L + 3, 3 * L + 4, 3 * L + 5)
        acc(kF1, _dot_tn(u, e))
        acc(kf1, jnp.sum(e, axis=0, keepdims=True))
        du = _dot_nt(e, F1) * (u0 > 0.0).astype(y.dtype)
        acc(kf0, jnp.sum(du, axis=0, keepdims=True))
        for s in range(ns):
            g = gammas[s]
            daccs[kF0][s * op:(s + 1) * op] += _dot_tn(ys[s], du)
            dy_s = _dot_nt(du, F0[s * op:(s + 1) * op])
            a_last = acts[s][L][1]
            acc(kwf, _dot_tn(a_last, dy_s))
            acc(kbf, jnp.sum(dy_s, axis=0, keepdims=True))
            da = _dot_nt(dy_s, wf)
            for li in range(L - 1, -1, -1):
                z, a_prev, dBv = acts[s][li]
                # v = g*(alpha*z + beta): g distributes onto dz/dal/dbe
                dv = g * (dBv * da)
                dz = alphas[li] * dv
                acc(kal + li, jnp.sum(z * dv, axis=0, keepdims=True))
                acc(kbe + li, jnp.sum(dv, axis=0, keepdims=True))
                acc(kW + li, _dot_tn(a_prev, dz))
                if li > 0:
                    da = _dot_nt(dz, ws[li])

        @pl.when(i == n_tiles - 1)
        def _flush():
            for dref, sref in zip(douts, daccs):
                dref[:] = sref[:]
            if metrics:
                m_ref[:] = sc_m[:]

    return kernel


@functools.lru_cache(maxsize=16)
def _program(kinds, gammas, widths, out_dim, n_tiles, interpret, metrics,
             tile_n, precision="default"):
    L = len(kinds)
    ns = len(gammas)
    d = widths[0]
    wp = [_round_up(w, 128) for w in widths[1:]]
    op = _round_up(max(out_dim, 1), 128)

    w_shapes = []
    for i in range(L):
        w_shapes.append((d if i == 0 else wp[i - 1], wp[i]))

    def fullspec(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    tspec = pl.BlockSpec((tile_n, op), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM), tspec]
    if metrics:
        in_specs.append(tspec)
    in_specs += [sspec(), sspec()]
    for i in range(L):
        in_specs += [fullspec(w_shapes[i]), fullspec((1, wp[i])),
                     fullspec((1, wp[i]))]
    comb_shapes = [(wp[-1], op), (1, op),            # wf, bf
                   (ns * op, 128), (1, 128),         # F0, f0
                   (128, op), (1, op)]               # F1, f1
    in_specs += [fullspec(s) for s in comb_shapes]

    acc_shapes = (w_shapes + [(1, w) for w in wp] + [(1, w) for w in wp]
                  + comb_shapes)
    out_specs = [tspec]
    out_shapes = [jax.ShapeDtypeStruct((n_tiles * tile_n, op), jnp.float32)]
    if metrics:
        out_specs.append(pl.BlockSpec((2, op), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((2, op), jnp.float32))
    for s in acc_shapes:
        out_specs.append(fullspec(s))
        out_shapes.append(jax.ShapeDtypeStruct(s, jnp.float32))

    scratch = [pltpu.VMEM(s, jnp.float32) for s in acc_shapes]
    if metrics:
        scratch.append(pltpu.VMEM((2, op), jnp.float32))

    step = pl.pallas_call(
        _make_kernel(L, ns, kinds, gammas, tile_n, n_tiles, metrics,
                     precision),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        # grad accumulators persist across grid steps: sequential grid
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    return step, wp, op


def mscale2_step_fused(canon, combiner, coords, target, kinds, inv_scales,
                       *, nvalid=None, denom=None, gt=None,
                       want_metrics=False, interpret=False,
                       precision="default"):
    """One fused mscale_2 train step.  canon: the shared-trunk canonical
    params (real_mlp.py form); combiner: {'freq_0': {w (ns*o, 128), b},
    'freq_1': {w (128, o), b}}; inv_scales: static tuple of 1/s per scale.
    Returns (pred, dcanon, dcombiner[, metric sums]) for
    loss = sum_{rows < nvalid}(pred - t)^2 / denom."""
    from wire_tpu.ops.pallas.real_mlp import _pad_canonical
    n, d = coords.shape
    L = len(kinds)
    ns = len(inv_scales)
    widths = (d,) + tuple(l["w"].shape[1] for l in canon["layers"])
    out_dim = canon["final"]["b"].shape[-1]
    n_pad = _round_up(n, TILE_N)
    n_tiles = n_pad // TILE_N
    step, wp, op = _program(tuple(kinds), tuple(float(g) for g in inv_scales),
                            widths, out_dim, n_tiles, interpret,
                            want_metrics, TILE_N, precision)
    padded, wfp, bfp = _pad_canonical(canon, wp, op)
    # combiner: pad F0's per-scale row blocks o -> op (zero rows — exact)
    F0 = combiner["freq_0"]["w"].reshape(ns, out_dim, 128)
    F0p = jnp.pad(F0, ((0, 0), (0, op - out_dim), (0, 0))).reshape(
        ns * op, 128)
    f0 = combiner["freq_0"]["b"].reshape(1, 128)
    F1p = jnp.pad(combiner["freq_1"]["w"], ((0, 0), (0, op - out_dim)))
    f1p = jnp.pad(combiner["freq_1"]["b"].reshape(1, -1),
                  ((0, 0), (0, op - out_dim)))

    nv = jnp.full((1, 1), n, jnp.int32) if nvalid is None else \
        jnp.asarray(nvalid, jnp.int32).reshape(1, 1)
    dn = jnp.asarray(float(n * out_dim) if denom is None else denom,
                     jnp.float32).reshape(1, 1)
    args = [jnp.pad(coords, ((0, n_pad - n), (0, 0))),
            jnp.pad(target, ((0, n_pad - n), (0, op - out_dim)))]
    if want_metrics:
        gt_arr = target if gt is None else gt
        args.append(jnp.pad(gt_arr, ((0, n_pad - n), (0, op - out_dim))))
    args += [nv, 1.0 / dn]
    for Wp, al, be in padded:
        args += [Wp, al, be]
    args += [wfp, bfp, F0p, f0, F1p, f1p]
    outs = step(*args)
    pred = outs[0][:n, :out_dim]
    k0 = 1
    sums = None
    if want_metrics:
        m = outs[1]
        sums = (jnp.sum(m[0]), jnp.sum(m[1]))
        k0 = 2
    dlayers = []
    for i in range(L):
        win, wout = canon["layers"][i]["w"].shape
        dlayers.append({
            "w": outs[k0 + i][:win, :wout],
            "alpha": outs[k0 + L + i][0, :wout].reshape(
                canon["layers"][i]["alpha"].shape),
            "beta": outs[k0 + 2 * L + i][0, :wout].reshape(
                canon["layers"][i]["beta"].shape),
        })
    h, o = canon["final"]["w"].shape
    dcanon = {
        "layers": dlayers,
        "final": {"w": outs[k0 + 3 * L][:h, :o],
                  "b": outs[k0 + 3 * L + 1][0, :o].reshape(
                      canon["final"]["b"].shape)},
    }
    dF0p = outs[k0 + 3 * L + 2].reshape(ns, op, 128)[:, :out_dim, :]
    dcombiner = {
        "freq_0": {"w": dF0p.reshape(ns * out_dim, 128),
                   "b": outs[k0 + 3 * L + 3].reshape(
                       combiner["freq_0"]["b"].shape)},
        "freq_1": {"w": outs[k0 + 3 * L + 4][:, :out_dim],
                   "b": outs[k0 + 3 * L + 5][0, :out_dim].reshape(
                       combiner["freq_1"]["b"].shape)},
    }
    if want_metrics:
        return pred, dcanon, dcombiner, sums
    return pred, dcanon, dcombiner
