"""Fused Pallas TPU kernel for the real-valued INR families.

One kernel covers siren, gauss, relu, and the whole B-spline family
(quadratic/cubic/srelu + the multiscale first-layer variants): every layer
is canonicalized to

    z = a_prev @ W          (MXU)
    v = alpha * z + beta    (per-lane affine folding the family's
                             scale/omega/bias conventions)
    a = B(v)                (VPU basis: qspline/cspline/sin/gauss/relu/
                             srelu/identity)

with a plain final linear.  Like the WIRE kernel (wire_mlp.py), the whole
forward runs per coordinate tile with weights resident in VMEM, and the
custom VJP recomputes activations in the backward kernel, accumulating
weight/alpha/beta gradients across the sequential grid.

Folding table (reference conventions, SURVEY.md §2.1):
  bspline 'divide'  B(z/s):       alpha=1/s,  beta=b/s      (bspline_form.py:44)
  bspline 'pre'     B(W(sx)+b):   alpha=s,    beta=b        (bspline_cubic.py:45)
  bspline 'post'    B(s(Wx+b)):   alpha=s,    beta=s*b      (bspline_mscale_repIN.py:41)
  sine    sin(w(Wx+b)):           alpha=w,    beta=w*b      (siren.py:48)
  gauss   exp(-(s(Wx+b))^2):      alpha=s,    beta=s*b      (gauss.py:28)
  relu:                           alpha=1,    beta=b
  srelu   (r(1-v)r(v))^2, v=s*z:  alpha=s,    beta=s*b      (bspline_srelu.py:32)
  mscale_HL first layer: per-lane alpha=1/s_band             (bspline_mscale_HL.py:85-97)
  mscale_1 first layer: identity basis over [s_k * x] @ W    (bspline_mscale_1.py:80)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _r(x):
    return jnp.maximum(x, 0.0)


def _basis(kind):
    if kind == "qspline":
        def B(v):
            return (0.5 * _r(v + 1.5) ** 2 - 1.5 * _r(v + 0.5) ** 2
                    + 1.5 * _r(v - 0.5) ** 2 - 0.5 * _r(v - 1.5) ** 2)

        def dB(v):
            return (_r(v + 1.5) - 3.0 * _r(v + 0.5)
                    + 3.0 * _r(v - 0.5) - _r(v - 1.5))
        return B, dB
    if kind == "cspline":
        def B(v):
            return ((1 / 6) * _r(v + 2) ** 3 - (2 / 3) * _r(v + 1) ** 3
                    + _r(v) ** 3 - (2 / 3) * _r(v - 1) ** 3
                    + (1 / 6) * _r(v - 2) ** 3)

        def dB(v):
            return (0.5 * _r(v + 2) ** 2 - 2.0 * _r(v + 1) ** 2
                    + 3.0 * _r(v) ** 2 - 2.0 * _r(v - 1) ** 2
                    + 0.5 * _r(v - 2) ** 2)
        return B, dB
    if kind == "sine":
        # fast_sincos shares one range reduction for both polynomials;
        # jnp.sin/jnp.cos each lower to a much longer libcall in Mosaic
        # (measured ~3.6 ms per pass at 512^2 x 256 lanes, PERF.md r4)
        from wire_tpu.ops.pallas.wire_mlp import fast_sincos
        return (lambda v: fast_sincos(v)[0]), (lambda v: fast_sincos(v)[1])
    if kind == "gauss":
        def B(v):
            return jnp.exp(-v * v)

        def dB(v):
            return -2.0 * v * jnp.exp(-v * v)
        return B, dB
    if kind == "relu":
        def B(v):
            return jnp.maximum(v, 0.0)

        def dB(v):
            return (v > 0).astype(v.dtype)
        return B, dB
    if kind == "srelu":
        def B(v):
            g = _r(1.0 - v) * _r(v)
            return g * g

        def dB(v):
            g = _r(1.0 - v) * _r(v)
            return 2.0 * g * (_r(1.0 - v) * (v > 0)
                              - (v < 1.0) * _r(v)).astype(v.dtype)
        return B, dB
    if kind == "identity":
        def B(v):
            return v

        def dB(v):
            return jnp.ones_like(v)
        return B, dB
    raise ValueError(kind)


def _basis_any(kind):
    """Basis for a layer kind that is either one name (all lanes) or a tuple
    of ``(name, width)`` segments applied to contiguous lane ranges — the
    mechanism that lets one canonical chain carry heterogeneous lanes (e.g.
    mscale_hier: B-spline trunk lanes + identity lanes ferrying the raw
    coords and the per-stage head accumulator, models._canon_mscale_hier).
    Lanes beyond the segments' total width (padding) produce zeros."""
    if isinstance(kind, str):
        return _basis(kind)
    segs = tuple(kind)

    def _masked(v, fns):
        w = v.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        out = jnp.zeros_like(v)
        lo = 0
        for (name, seg_w), f in zip(segs, fns):
            m = ((lane >= lo) & (lane < lo + seg_w)).astype(v.dtype)
            out = out + m * f(v)
            lo += seg_w
        return out

    Bs = [_basis(name)[0] for name, _ in segs]
    dBs = [_basis(name)[1] for name, _ in segs]

    def B(v):
        return _masked(v, Bs)

    def dB(v):
        return _masked(v, dBs)
    return B, dB


def _gamma_of(i, row_gamma):
    """Per-tile activation prescale: with coordinates stacked per scale
    along M (mscale_2's per-scale trunk passes, bspline_mscale_2.py:159-172),
    every tile belongs to exactly one scale block and its gamma is a scalar
    selected from the static scale tuple by the grid index."""
    gammas, tiles_per_block = row_gamma
    blk = i // tiles_per_block
    g = jnp.float32(0)
    for k, gv in enumerate(gammas):
        g = jnp.where(blk == k, jnp.float32(gv), g)
    return g


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    # a.T @ b without materializing the transpose (contract dim 0 of both)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    # a @ b.T (contract dim 1 of both)
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _basis_pair(kind):
    """One evaluator returning (B(v), dB(v)) together, sharing work where
    the basis allows (ADVICE r4: the sine basis' fast_sincos computes both
    polynomials off ONE Cody-Waite reduction — evaluating B and dB through
    separate lambdas on the same input relied on Mosaic CSE to avoid doing
    the reduction twice)."""
    if kind == "sine":
        from wire_tpu.ops.pallas.wire_mlp import fast_sincos
        return fast_sincos  # (sin, cos) == (B, dB)
    B, dB = _basis_any(kind)
    return lambda v: (B(v), dB(v))


def _fwd_recurrence(c, ws, alphas, betas, wf, bf, kinds, gamma=None,
                    want_dB=False):
    """Forward chain.  acts entries are (z, a) — or (z, a, dBv) under
    want_dB, for backward kernels that need dB on the SAME pre-activations
    (one _basis_pair evaluation instead of separate B/dB calls)."""
    a = c
    acts = []
    for W, al, be, kind in zip(ws, alphas, betas, kinds):
        z = _dot(a, W)
        v = al * z + be
        if gamma is not None:
            v = gamma * v
        if want_dB:
            a, dBv = _basis_pair(kind)(v)
            acts.append((z, a, dBv))
        else:
            a = _basis_any(kind)[0](v)
            acts.append((z, a))
    y = _dot(a, wf) + bf
    return acts, y


def _make_fwd_kernel(L, kinds, row_gamma=None):
    def kernel(*refs):
        c_ref = refs[0]
        ws = [refs[1 + 3 * i][:] for i in range(L)]
        alphas = [refs[2 + 3 * i][:] for i in range(L)]
        betas = [refs[3 + 3 * i][:] for i in range(L)]
        wf = refs[1 + 3 * L][:]
        bf = refs[2 + 3 * L][:]
        out_ref = refs[3 + 3 * L]
        gamma = (None if row_gamma is None
                 else _gamma_of(pl.program_id(0), row_gamma))
        _, y = _fwd_recurrence(c_ref[:], ws, alphas, betas, wf, bf, kinds,
                               gamma)
        out_ref[:] = y
    return kernel


def _make_bwd_kernel(L, kinds, row_gamma=None):
    def kernel(*refs):
        c_ref = refs[0]
        g_ref = refs[1]
        ws = [refs[2 + 3 * i][:] for i in range(L)]
        alphas = [refs[3 + 3 * i][:] for i in range(L)]
        betas = [refs[4 + 3 * i][:] for i in range(L)]
        wf = refs[2 + 3 * L][:]
        outs = refs[4 + 3 * L:]
        dc_ref = outs[0]
        dws = outs[1:1 + L]
        dals = outs[1 + L:1 + 2 * L]
        dbes = outs[1 + 2 * L:1 + 3 * L]
        dwf_ref = outs[1 + 3 * L]
        dbf_ref = outs[2 + 3 * L]
        i = pl.program_id(0)
        gamma = None if row_gamma is None else _gamma_of(i, row_gamma)

        def acc(ref, val):
            @pl.when(i == 0)
            def _():
                ref[:] = val

            @pl.when(i != 0)
            def _():
                ref[:] += val

        c = c_ref[:]
        acts, _ = _fwd_recurrence(c, ws, alphas, betas,
                                  wf, refs[3 + 3 * L][:], kinds, gamma,
                                  want_dB=True)
        g = g_ref[:]
        a_last = acts[-1][1]
        acc(dwf_ref, _dot_tn(a_last, g))
        acc(dbf_ref, jnp.sum(g, axis=0, keepdims=True))
        da = _dot_nt(g, wf)
        for li in range(L - 1, -1, -1):
            z, _, dBv = acts[li]
            dv = dBv * da
            # v = gamma*(alpha*z + beta): the gamma factor distributes onto
            # dz, dalpha and dbeta alike
            if gamma is not None:
                dv = gamma * dv
            dz = alphas[li] * dv
            acc(dals[li], jnp.sum(z * dv, axis=0, keepdims=True))
            acc(dbes[li], jnp.sum(dv, axis=0, keepdims=True))
            a_prev = c if li == 0 else acts[li - 1][1]
            acc(dws[li], _dot_tn(a_prev, dz))
            da = _dot_nt(dz, ws[li])
        dc_ref[:] = da
    return kernel


TILE_N = 512


@functools.lru_cache(maxsize=64)
def _programs(kinds, widths, out_dim, n_tiles, interpret, row_gamma=None):
    L = len(kinds)
    d = widths[0]
    wp = [_round_up(w, 128) for w in widths[1:]]
    dp = d  # input feature dim stays exact (may be 2, 3, or wide for repIN)
    op = _round_up(max(out_dim, 1), 128)

    w_shapes = []
    ins = [dp] + wp[:-1]
    for i in range(L):
        w_shapes.append((ins[i] if i == 0 else wp[i - 1], wp[i]))
    f_shape = (wp[-1], op)

    def fullspec(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((TILE_N, dp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for i in range(L):
        in_specs += [fullspec(w_shapes[i]), fullspec((1, wp[i])),
                     fullspec((1, wp[i]))]
    in_specs += [fullspec(f_shape), fullspec((1, op))]

    fwd = pl.pallas_call(
        _make_fwd_kernel(L, kinds, row_gamma),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_N, op), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_N, op), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    out_specs = [pl.BlockSpec((TILE_N, dp), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((n_tiles * TILE_N, dp), jnp.float32)]
    for i in range(L):
        out_specs.append(fullspec(w_shapes[i]))
        out_shapes.append(jax.ShapeDtypeStruct(w_shapes[i], jnp.float32))
    for i in range(L):
        out_specs.append(fullspec((1, wp[i])))
        out_shapes.append(jax.ShapeDtypeStruct((1, wp[i]), jnp.float32))
    for i in range(L):
        out_specs.append(fullspec((1, wp[i])))
        out_shapes.append(jax.ShapeDtypeStruct((1, wp[i]), jnp.float32))
    out_specs += [fullspec(f_shape), fullspec((1, op))]
    out_shapes += [jax.ShapeDtypeStruct(f_shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, op), jnp.float32)]

    bwd = pl.pallas_call(
        _make_bwd_kernel(L, kinds, row_gamma),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((TILE_N, dp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE_N, op), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + in_specs[1:],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        # grad accumulators revisit output blocks every grid step: the grid
        # must execute sequentially
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return fwd, bwd, wp, op


def _pad_canonical(canon, wp, op):
    """Zero-pad canonical layer params to aligned shapes."""
    L = len(canon["layers"])
    padded = []
    for i, lay in enumerate(canon["layers"]):
        W = lay["w"]
        win, wout = W.shape
        win_p = W.shape[0] if i == 0 else wp[i - 1]
        Wp = jnp.pad(W, ((0, win_p - win), (0, wp[i] - wout)))
        al = jnp.pad(lay["alpha"].reshape(1, -1), ((0, 0), (0, wp[i] - wout)))
        be = jnp.pad(lay["beta"].reshape(1, -1), ((0, 0), (0, wp[i] - wout)))
        padded.append((Wp, al, be))
    wf = canon["final"]["w"]
    h, o = wf.shape
    wfp = jnp.pad(wf, ((0, wp[-1] - h), (0, op - o)))
    bfp = jnp.pad(canon["final"]["b"].reshape(1, -1), ((0, 0), (0, op - o)))
    return padded, wfp, bfp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def real_mlp_fused(canon, coords, kinds, interpret=False, row_gamma=None):
    """canon: {'layers': [{'w','alpha','beta'}...], 'final': {'w','b'}};
    coords (N, d); kinds: tuple of basis names per layer (each entry a name
    or a ``((name, width), ...)`` lane-segment tuple, see _basis_any).
    row_gamma: optional ``(gammas, tiles_per_block)`` per-tile activation
    prescale for scale-stacked inputs (see real_mlp_fused_scales).
    Differentiable in canon and coords (gradients flow back through the
    jnp-side canonicalization to the family's native params)."""
    out, _ = _fwd(canon, coords, kinds, interpret, row_gamma)
    return out


def _fwd(canon, coords, kinds, interpret, row_gamma=None):
    n, d = coords.shape
    widths = (d,) + tuple(l["w"].shape[1] for l in canon["layers"])
    out_dim = canon["final"]["b"].shape[-1]
    n_pad = _round_up(n, TILE_N)
    fwd, _, wp, op = _programs(tuple(kinds), widths, out_dim,
                               n_pad // TILE_N, interpret, row_gamma)
    padded, wfp, bfp = _pad_canonical(canon, wp, op)
    args = [jnp.pad(coords, ((0, n_pad - n), (0, 0)))]
    for Wp, al, be in padded:
        args += [Wp, al, be]
    args += [wfp, bfp]
    out = fwd(*args)
    return out[:n, :out_dim], (canon, coords)


def _bwd(kinds, interpret, row_gamma, res, g):
    canon, coords = res
    n, d = coords.shape
    widths = (d,) + tuple(l["w"].shape[1] for l in canon["layers"])
    out_dim = canon["final"]["b"].shape[-1]
    n_pad = _round_up(n, TILE_N)
    _, bwd, wp, op = _programs(tuple(kinds), widths, out_dim,
                               n_pad // TILE_N, interpret, row_gamma)
    padded, wfp, bfp = _pad_canonical(canon, wp, op)
    args = [jnp.pad(coords, ((0, n_pad - n), (0, 0))),
            jnp.pad(g, ((0, n_pad - n), (0, op - out_dim)))]
    for Wp, al, be in padded:
        args += [Wp, al, be]
    args += [wfp, bfp]
    outs = bwd(*args)
    L = len(kinds)
    dc = outs[0][:n]
    dlayers = []
    for i in range(L):
        win, wout = canon["layers"][i]["w"].shape
        dlayers.append({
            "w": outs[1 + i][:win, :wout],
            "alpha": outs[1 + L + i][0, :wout].reshape(
                canon["layers"][i]["alpha"].shape),
            "beta": outs[1 + 2 * L + i][0, :wout].reshape(
                canon["layers"][i]["beta"].shape),
        })
    h, o = canon["final"]["w"].shape
    dcanon = {
        "layers": dlayers,
        "final": {"w": outs[1 + 3 * L][:h, :o],
                  "b": outs[2 + 3 * L][0, :o].reshape(
                      canon["final"]["b"].shape)},
    }
    return dcanon, dc


real_mlp_fused.defvjp(_fwd, _bwd)


def real_mlp_fused_scales(canon, coords, kinds, inv_scales, interpret=False):
    """Run the SAME canonical trunk at several activation scales in ONE
    kernel invocation — the mscale_2 per-scale passes
    (bspline_mscale_2.py:159-172) stacked along M instead of looped in
    Python (VERDICT round 1 #5).

    Each scale's coordinate block is padded to a tile multiple and the
    blocks are concatenated along rows; every tile then belongs to exactly
    one scale, and the kernel selects that block's gamma = 1/s from the
    static tuple by grid index (no extra tensor input).  The activation
    becomes B(gamma * (alpha*z + beta)) with shared (W, alpha, beta) —
    for mscale_2, alpha=1 / beta=b gives B((z + b)/s) per block.

    Returns (n_scales, N, out).  Differentiable: the pad/tile are jnp ops
    (coordinate grads sum over blocks), shared-weight grads accumulate
    across all blocks inside the backward kernel."""
    n, d = coords.shape
    n_pad = _round_up(n, TILE_N)
    S = len(inv_scales)
    X = jnp.tile(jnp.pad(coords, ((0, n_pad - n), (0, 0))), (S, 1))
    row_gamma = (tuple(float(g) for g in inv_scales), n_pad // TILE_N)
    out = real_mlp_fused(canon, X, tuple(kinds), interpret, row_gamma)
    return out.reshape(S, n_pad, out.shape[-1])[:, :n, :]


# ===========================================================================
# One-pass fused TRAIN-STEP kernel (the real-family analogue of
# ops/pallas/wire_step.py): forward, in-kernel MSE loss-gradient, and
# backward in a single Pallas call, cross-tile software-pipelined:
#
#     grid step i:  forward(tile i)    -> live (z, a) to scratch slot i%2
#                   backward(tile i-1) <- scratch slot (i-1)%2
#
# with grid = n_tiles + 1.  Weight grads accumulate into VMEM scratch with
# UNCONDITIONAL `+=` (zeroed at step 0, flushed at the last step): pl.when
# regions between GEMMs are scheduling barriers, and the fwd/bwd streams
# touch different tiles so the scheduler fills one chain's dependency
# stalls with the other's GEMMs (see wire_step.py and tools/exp_accvar.py
# for the measurements).  dcoords is not emitted (training never uses it).
# Loss semantics match the trainer's chunk_loss:
#     loss = sum_{rows < nvalid} (y - t)^2 / denom
# with invalid (permutation-padding) rows contiguous at the tail.
# ===========================================================================

def _make_step_kernel(L, kinds, tile_n, n_tiles, metrics):
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
        wf = refs[3 * L][:]
        bf = refs[1 + 3 * L][:]
        refs = refs[2 + 3 * L:]
        y_ref = refs[0]
        refs = refs[1:]
        m_ref = None
        if metrics:
            m_ref, refs = refs[0], refs[1:]
        douts = refs[:3 * L + 2]
        daccs = refs[3 * L + 2:2 * (3 * L + 2)]
        refs = refs[2 * (3 * L + 2):]
        sc_m = None
        if metrics:
            sc_m, refs = refs[0], refs[1:]
        dws = daccs[0:L]
        dals = daccs[L:2 * L]
        dbes = daccs[2 * L:3 * L]
        dwf_ref = daccs[3 * L]
        dbf_ref = daccs[3 * L + 1]
        live = refs
        sc_c = live[0]
        sc_z = live[1:1 + L]
        sc_a = live[1 + L:1 + 2 * L]
        sc_g = live[1 + 2 * L]

        i = pl.program_id(0)
        sf = jax.lax.rem(i, 2)       # fwd writes slot i%2
        sb = jax.lax.rem(i + 1, 2)   # bwd reads slot (i-1)%2

        @pl.when(i == 0)
        def _zero():
            for ref in daccs:
                ref[:] = jnp.zeros_like(ref)
            if metrics:
                sc_m[:] = jnp.zeros_like(sc_m)
            # slot 1 feeds step 0's phantom backward: zeros in -> exact
            # zeros accumulated
            for ref in live:
                ref[1] = jnp.zeros_like(ref[1])

        def acc(ref, val):
            # unconditional VMEM accumulate: no control-flow region in the
            # hot body
            ref[:] += val

        # ---- fwd(tile i) hand-interleaved with bwd(tile i-1) -------------
        c = c_ref[:]
        sc_c[sf] = c

        g_b = sc_g[sb]
        a_last_b = sc_a[L - 1][sb]
        acc(dwf_ref, _dot_tn(a_last_b, g_b))
        da = _dot_nt(g_b, wf)
        acc(dbf_ref, jnp.sum(g_b, axis=0, keepdims=True))

        a = c
        for li in range(L):
            # fwd layer li of tile i ...
            B, _ = _basis_any(kinds[li])
            z = _dot(a, ws[li])
            sc_z[li][sf] = z

            # ... zipped with bwd layer L-1-li of tile i-1
            bj = L - 1 - li
            z_b = sc_z[bj][sb]
            _, dB = _basis_any(kinds[bj])
            v_b = alphas[bj] * z_b + betas[bj]
            dv = dB(v_b) * da
            dz = alphas[bj] * dv

            v = alphas[li] * z + betas[li]
            a = B(v)
            sc_a[li][sf] = a

            acc(dals[bj], jnp.sum(z_b * dv, axis=0, keepdims=True))
            acc(dbes[bj], jnp.sum(dv, axis=0, keepdims=True))
            a_prev_b = sc_c[sb] if bj == 0 else sc_a[bj - 1][sb]
            acc(dws[bj], _dot_tn(a_prev_b, dz))
            if bj > 0:
                da = _dot_nt(dz, ws[bj])
        # no dcoords: the first-layer data-grad GEMM is skipped entirely

        # fwd epilogue: final layer + in-kernel loss grad for tile i
        y = _dot(a, wf) + bf
        y_ref[:] = y
        tile = jnp.minimum(i, n_tiles - 1)
        rows = (tile * tile_n
                + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0))
        mask = (rows < nv_ref[0, 0]).astype(y.dtype)
        err_t = mask * (y - t_ref[:])
        sc_g[sf] = (2.0 * invd_ref[0, 0]) * err_t

        if metrics:
            # masked squared-error sums vs target (row 0) and gt (row 1);
            # the phantom step's recomputed tile is weighted to zero (a
            # scalar multiply, not a pl.when region — those are barriers)
            w_live = (i < n_tiles).astype(y.dtype)
            err_g = mask * (y - gt_ref[:])
            sc_m[0:1] += w_live * jnp.sum(err_t * err_t, axis=0,
                                          keepdims=True)
            sc_m[1:2] += w_live * jnp.sum(err_g * err_g, axis=0,
                                          keepdims=True)

        @pl.when(i == n_tiles)
        def _flush():
            for dref, sref in zip(douts, daccs):
                dref[:] = sref[:]
            if metrics:
                m_ref[:] = sc_m[:]
    return kernel


# Coordinate rows per grid step for the step kernel (the fwd/bwd pair above
# keeps TILE_N=512; the step kernel's larger live set still fits — same
# sweep shape as wire_step.py, 1024 measured best at the headline config).
STEP_TILE_N = 1024


@functools.lru_cache(maxsize=64)
def _step_programs(kinds, widths, out_dim, n_tiles, interpret,
                   metrics=False, tile_n=None):
    # tile_n is part of the cache key: keying on n_tiles alone would reuse
    # a program built for a different STEP_TILE_N when both yield the same
    # tile count (ADVICE.md round 1).
    assert tile_n is not None
    L = len(kinds)
    d = widths[0]
    wp = [_round_up(w, 128) for w in widths[1:]]
    op = _round_up(max(out_dim, 1), 128)

    w_shapes = []
    for i in range(L):
        w_shapes.append((d if i == 0 else wp[i - 1], wp[i]))
    f_shape = (wp[-1], op)

    def fullspec(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    # clamped tile index: the final grid step (i == n_tiles) re-fetches the
    # last tile and rewrites its (identical) y block while running the real
    # last backward
    def imap(i):
        return (jnp.minimum(i, n_tiles - 1), 0)

    tspec = pl.BlockSpec((tile_n, op), imap, memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((tile_n, d), imap,
                             memory_space=pltpu.VMEM),
                tspec]
    if metrics:
        in_specs.append(tspec)
    in_specs += [sspec(), sspec()]
    for i in range(L):
        in_specs += [fullspec(w_shapes[i]), fullspec((1, wp[i])),
                     fullspec((1, wp[i]))]
    in_specs += [fullspec(f_shape), fullspec((1, op))]

    out_specs = [pl.BlockSpec((tile_n, op), imap,
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((n_tiles * tile_n, op),
                                       jnp.float32)]
    if metrics:
        out_specs.append(pl.BlockSpec((2, op), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((2, op), jnp.float32))
    acc_shapes = []
    for i in range(L):
        acc_shapes.append(w_shapes[i])
    for i in range(L):
        acc_shapes.append((1, wp[i]))
    for i in range(L):
        acc_shapes.append((1, wp[i]))
    acc_shapes += [f_shape, (1, op)]
    for s in acc_shapes:
        out_specs.append(fullspec(s))
        out_shapes.append(jax.ShapeDtypeStruct(s, jnp.float32))

    # scratch: gradient accumulators + double-buffered live activations
    scratch = [pltpu.VMEM(s, jnp.float32) for s in acc_shapes]
    if metrics:
        scratch.append(pltpu.VMEM((2, op), jnp.float32))  # metric sums
    scratch.append(pltpu.VMEM((2, tile_n, d), jnp.float32))   # c
    for i in range(L):
        scratch.append(pltpu.VMEM((2, tile_n, wp[i]), jnp.float32))
    for i in range(L):
        scratch.append(pltpu.VMEM((2, tile_n, wp[i]), jnp.float32))
    scratch.append(pltpu.VMEM((2, tile_n, op), jnp.float32))  # g

    step = pl.pallas_call(
        _make_step_kernel(L, kinds, tile_n, n_tiles, metrics),
        grid=(n_tiles + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        # grad accumulators and live-activation slots persist across grid
        # steps: the grid must execute sequentially
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    return step, wp, op


def real_step_fused(canon, coords, target, kinds, *, nvalid=None,
                    denom=None, gt=None, want_metrics=False,
                    interpret=False):
    """One fused train step over the canonical real MLP: returns
    (pred, dcanon) for loss = sum_{rows<nvalid}(pred-t)^2 / denom.
    dcanon mirrors canon's structure, so callers recover native-family
    param grads with jax.vjp through their canonicalization.

    want_metrics=True appends the in-kernel masked squared-error sums
    ``(sse_target, sse_gt)`` (gt defaults to target) — see
    wire_step.wire_step_fused."""
    n, d = coords.shape
    L = len(kinds)
    widths = (d,) + tuple(l["w"].shape[1] for l in canon["layers"])
    out_dim = canon["final"]["b"].shape[-1]
    tile_n = STEP_TILE_N
    n_pad = _round_up(n, tile_n)
    step, wp, op = _step_programs(tuple(kinds), widths, out_dim,
                                  n_pad // tile_n, interpret,
                                  want_metrics, tile_n=tile_n)
    padded, wfp, bfp = _pad_canonical(canon, wp, op)
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
    args += [wfp, bfp]
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
                  "b": outs[k0 + 1 + 3 * L][0, :o].reshape(
                      canon["final"]["b"].shape)},
    }
    if want_metrics:
        return pred, dcanon, sums
    return pred, dcanon
