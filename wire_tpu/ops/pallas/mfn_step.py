"""One-pass fused TRAIN-STEP Pallas kernel for the Gabor-MFN family
(modules/mfn.py) — forward, in-kernel MSE loss-gradient, and backward in
one pallas_call, completing fused train paths for all six paper-headline
families (wire/wire2d/siren/gauss/relu+posenc/mfn).

The MFN recursion (mfn.py:46-53):

    g_i(x) = exp(-gamma_i/2 ||x - mu_i||^2) * sin(x w_i + b_i)
    z_0 = g_0(x);   z_{i+1} = (z_i W_i + c_i) .* g_{i+1}(x);   y = z_k W_f

differs from the other families: every layer re-reads the COORDS through
its own Gabor filter.  The filters are d-contraction GEMMs (d = 2..3) —
cheap; the z-chain linears carry the MXU work.  This kernel is the SERIAL
one-pass form (fwd and bwd of the same coordinate tile in one grid step,
so activations live as in-body SSA values with no double-buffer scratch;
weight grads accumulate across tiles in VMEM scratch with unconditional
+=, zeroed at step 0 and flushed at the last step — the wire_step.py
facts).  Cross-tile software pipelining is not applied here: the VPU-heavy
filter math already interleaves with the chain GEMMs inside one body.

Filter backward, with E = exp(-gamma/2 n), S = sin(q), C = cos(q),
q = x w + b, n = ||x - mu||^2, dg the output cotangent:

    dq     = dg E C              -> dw = x^T dq,  db = colsum(dq)
    dn     = -(gamma/2) dg E S
    dgamma = -1/2 colsum(dg E S n)
    dmu    = 2 colsum(dn)^T * mu - 2 dn^T x

Exactness vs XLA autodiff of mfn_apply is pinned in interpret mode
(tests/test_pallas_mfn.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wire_tpu.ops.pallas.wire_mlp import (_make_dot, _round_up,
                                           fast_sincos)

TILE_N = 1024


def _pad_params(params, k, d, hp, op):
    h = params["gabor_0"]["b"].shape[0]
    o = params["final"]["b"].shape[0]
    out = {}
    for i in range(k):
        g = params[f"gabor_{i}"]
        out[f"f{i}w"] = jnp.pad(g["w"], ((0, 0), (0, hp - h)))
        out[f"f{i}b"] = jnp.pad(g["b"], (0, hp - h))[None, :]
        out[f"f{i}mu"] = jnp.pad(g["mu"], ((0, hp - h), (0, 0)))
        out[f"f{i}g"] = jnp.pad(g["gamma"], (0, hp - h))[None, :]
    for i in range(k - 1):
        p = params[f"linear_{i}"]
        out[f"l{i}W"] = jnp.pad(p["w"], ((0, hp - h), (0, hp - h)))
        out[f"l{i}B"] = jnp.pad(p["b"], (0, hp - h))[None, :]
    f = params["final"]
    out["fW"] = jnp.pad(f["w"], ((0, hp - h), (0, op - o)))
    out["fb"] = jnp.pad(f["b"], (0, op - o))[None, :]
    return out


def _unpad_grads(dw, params, k, h, o):
    dparams = {"final": {"w": dw["fW"][:h, :o], "b": dw["fb"][0, :o]}}
    for i in range(k):
        dparams[f"gabor_{i}"] = {
            "w": dw[f"f{i}w"][:, :h], "b": dw[f"f{i}b"][0, :h],
            "mu": dw[f"f{i}mu"][:h, :], "gamma": dw[f"f{i}g"][0, :h]}
    for i in range(k - 1):
        dparams[f"linear_{i}"] = {"w": dw[f"l{i}W"][:h, :h],
                                  "b": dw[f"l{i}B"][0, :h]}
    return dparams


def _mfn_forward(c, w, k, _dot, _dot_nt):
    """Shared forward recurrence: returns (zs, ls, E, S, Cq, Nm)."""
    c2 = jnp.sum(c * c, axis=1, keepdims=True)         # (n, 1)
    E, S, Cq, Nm = [], [], [], []

    def filt(j):
        q = _dot(c, w[f"f{j}w"]) + w[f"f{j}b"]
        mu = w[f"f{j}mu"]
        mu2 = jnp.sum(mu * mu, axis=1)[None, :]
        nm_ = c2 + mu2 - 2.0 * _dot_nt(c, mu)          # c @ mu^T
        e = jnp.exp(-0.5 * w[f"f{j}g"] * nm_)
        E.append(e)
        # fast_sincos is exact to f32 rounding for |q| < ~2^13 (wire_mlp.py).
        # The filter phase q = c@w + b is unbounded in principle, but at the
        # reference init (w ~ U * 128*sqrt(gamma), gamma ~ Gamma(6/k),
        # mfn.py:12-19, |c| <= sqrt(2)) |q| <~ 181*sqrt(gamma) + pi — inside
        # the bound up to gamma ~ 2000, astronomically far into the Gamma
        # tail; training perturbs weights by O(lr) and does not escape it.
        # tests/test_pallas_mfn.py::test_fused_accuracy_at_extreme_phase
        # pins agreement with the jnp oracle at |q| ~ 8000 (ADVICE r4).
        snq, csq = fast_sincos(q)
        S.append(snq)
        Cq.append(csq)
        Nm.append(nm_)
        return e * S[-1]

    zs = [filt(0)]                                      # z_0 = g_0
    ls = [None]
    for j in range(1, k):
        l = _dot(zs[-1], w[f"l{j - 1}W"]) + w[f"l{j - 1}B"]
        g = filt(j)
        ls.append(l)
        zs.append(l * g)
    return zs, ls, E, S, Cq, Nm


def _mfn_backward(c, w, k, gy, zs, ls, E, S, Cq, Nm, acc,
                  _dot, _dot_tn, _dot_nt, want_dc=False):
    """Shared backward sweep: accumulates weight grads via ``acc`` and
    (optionally) returns dcoords.  Filter backward per the module
    docstring; the coords cotangent adds, per filter j,
    dq_j @ w_j^T + 2 rowsum(dn_j) * c - 2 dn_j @ mu_j."""
    dc = jnp.zeros_like(c) if want_dc else None

    def filt_grads(j, dg):
        nonlocal dc
        es = dg * E[j]
        dq = es * Cq[j]
        acc(f"f{j}w", _dot_tn(c, dq))
        acc(f"f{j}b", jnp.sum(dq, axis=0, keepdims=True))
        ges = es * S[j]                                 # dg E S
        acc(f"f{j}g", -0.5 * jnp.sum(ges * Nm[j], axis=0,
                                     keepdims=True))
        dn = (-0.5 * w[f"f{j}g"]) * ges
        col = jnp.sum(dn, axis=0, keepdims=True)        # (1, hp)
        mu = w[f"f{j}mu"]
        acc(f"f{j}mu",
            2.0 * jnp.transpose(col) * mu - 2.0 * _dot_tn(dn, c))
        if want_dc:
            dc = (dc + _dot_nt(dq, w[f"f{j}w"])
                  + 2.0 * jnp.sum(dn, axis=1, keepdims=True) * c
                  - 2.0 * _dot(dn, mu))

    acc("fW", _dot_tn(zs[-1], gy))
    acc("fb", jnp.sum(gy, axis=0, keepdims=True))
    dz = _dot_nt(gy, w["fW"])
    for j in range(k - 1, 0, -1):
        g = E[j] * S[j]
        dl = dz * g
        filt_grads(j, dz * ls[j])
        acc(f"l{j - 1}W", _dot_tn(zs[j - 1], dl))
        acc(f"l{j - 1}B", jnp.sum(dl, axis=0, keepdims=True))
        dz = _dot_nt(dl, w[f"l{j - 1}W"])
    filt_grads(0, dz)
    return dc


def _make_step_kernel(k, names, precision, tile_n, n_tiles, metrics):
    _dot, _dot_tn, _dot_nt = _make_dot(precision)

    def kernel(*refs):
        if metrics:
            c_ref, t_ref, gt_ref, nv_ref, invd_ref = refs[:5]
            refs = refs[5:]
        else:
            c_ref, t_ref, nv_ref, invd_ref = refs[:4]
            gt_ref = None
            refs = refs[4:]
        w = {nm: refs[j][:] for j, nm in enumerate(names)}
        refs = refs[len(names):]
        y_ref = refs[0]
        refs = refs[1:]
        m_ref = None
        if metrics:
            m_ref, refs = refs[0], refs[1:]
        dout = {nm: refs[j] for j, nm in enumerate(names)}
        refs = refs[len(names):]
        dacc = {nm: refs[j] for j, nm in enumerate(names)}
        refs = refs[len(names):]
        sc_m = refs[0] if metrics else None

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _zero():
            for nm in names:
                dacc[nm][:] = jnp.zeros_like(dacc[nm])
            if metrics:
                sc_m[:] = jnp.zeros_like(sc_m)

        def acc(nm, val):
            dacc[nm][:] += val

        # ---- forward --------------------------------------------------
        c = c_ref[:]
        zs, ls, E, S, Cq, Nm = _mfn_forward(c, w, k, _dot, _dot_nt)
        y = _dot(zs[-1], w["fW"]) + w["fb"]
        y_ref[:] = y

        # ---- in-kernel loss gradient ----------------------------------
        rows = (i * tile_n
                + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0))
        mask = (rows < nv_ref[0, 0]).astype(y.dtype)
        err_t = mask * (y - t_ref[:])
        gy = (2.0 * invd_ref[0, 0]) * err_t

        if metrics:
            err_g = mask * (y - gt_ref[:])
            sc_m[0:1] += jnp.sum(err_t * err_t, axis=0, keepdims=True)
            sc_m[1:2] += jnp.sum(err_g * err_g, axis=0, keepdims=True)

        # ---- backward -------------------------------------------------
        _mfn_backward(c, w, k, gy, zs, ls, E, S, Cq, Nm, acc,
                      _dot, _dot_tn, _dot_nt)

        @pl.when(i == n_tiles - 1)
        def _flush():
            for nm in names:
                dout[nm][:] = dacc[nm][:]
            if metrics:
                m_ref[:] = sc_m[:]

    return kernel


def _make_fwd_kernel(k, names, precision):
    _dot, _dot_tn, _dot_nt = _make_dot(precision)

    def kernel(*refs):
        c_ref = refs[0]
        w = {nm: refs[1 + j][:] for j, nm in enumerate(names)}
        out_ref = refs[1 + len(names)]
        zs, _, _, _, _, _ = _mfn_forward(c_ref[:], w, k, _dot, _dot_nt)
        out_ref[:] = _dot(zs[-1], w["fW"]) + w["fb"]
    return kernel


def _make_bwd_kernel(k, names, precision, n_tiles):
    """Recompute forward + backward with the caller-supplied cotangent;
    emits dcoords blocks and accumulated weight grads (the operator-fit
    VJP — serial form like the step kernel, no pipelining needed: the
    VPU-heavy filter math interleaves with the chain GEMMs in-body)."""
    _dot, _dot_tn, _dot_nt = _make_dot(precision)

    def kernel(*refs):
        c_ref, g_ref = refs[0], refs[1]
        w = {nm: refs[2 + j][:] for j, nm in enumerate(names)}
        outs = refs[2 + len(names):]
        dc_ref = outs[0]
        dout = {nm: outs[1 + j] for j, nm in enumerate(names)}
        dacc = {nm: outs[1 + len(names) + j]
                for j, nm in enumerate(names)}
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _zero():
            for nm in names:
                dacc[nm][:] = jnp.zeros_like(dacc[nm])

        def acc(nm, val):
            dacc[nm][:] += val

        c = c_ref[:]
        zs, ls, E, S, Cq, Nm = _mfn_forward(c, w, k, _dot, _dot_nt)
        dc = _mfn_backward(c, w, k, g_ref[:], zs, ls, E, S, Cq, Nm, acc,
                           _dot, _dot_tn, _dot_nt, want_dc=True)
        dc_ref[:] = dc

        @pl.when(i == n_tiles - 1)
        def _flush():
            for nm in names:
                dout[nm][:] = dacc[nm][:]
    return kernel


@functools.lru_cache(maxsize=16)
def _pair_programs(k, d, h, o, tile_n, n_tiles, interpret,
                   precision="default"):
    hp = _round_up(h, 128)
    op = _round_up(max(o, 1), 128)
    names, shapes = _names_shapes(k, d, hp, op)

    def wspec(nm):
        s = shapes[nm]
        zeros = (0,) * len(s)
        return pl.BlockSpec(s, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    def imap(i):
        return (i, 0)

    fwd = pl.pallas_call(
        _make_fwd_kernel(k, names, precision),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_n, d), imap, memory_space=pltpu.VMEM)]
                 + [wspec(nm) for nm in names],
        out_specs=pl.BlockSpec((tile_n, op), imap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_n, op), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    bwd = pl.pallas_call(
        _make_bwd_kernel(k, names, precision, n_tiles),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_n, d), imap, memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_n, op), imap,
                               memory_space=pltpu.VMEM)]
                 + [wspec(nm) for nm in names],
        out_specs=[pl.BlockSpec((tile_n, d), imap,
                                memory_space=pltpu.VMEM)]
                  + [wspec(nm) for nm in names],
        out_shape=[jax.ShapeDtypeStruct((n_tiles * tile_n, d), jnp.float32)]
                  + [jax.ShapeDtypeStruct(shapes[nm], jnp.float32)
                     for nm in names],
        scratch_shapes=[pltpu.VMEM(shapes[nm], jnp.float32)
                        for nm in names],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    return fwd, bwd, names, hp, op


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _mfn_fused(params, coords, k, interpret, precision):
    out, _ = _mfn_fused_fwd(params, coords, k, interpret, precision)
    return out


def _mfn_fused_fwd(params, coords, k, interpret, precision):
    n, d = coords.shape
    h = params["gabor_0"]["b"].shape[0]
    o = params["final"]["b"].shape[0]
    n_pad = _round_up(n, TILE_N)
    n_tiles = n_pad // TILE_N
    fwd, _, names, hp, op = _pair_programs(k, d, h, o, TILE_N, n_tiles,
                                           interpret, precision)
    padded = _pad_params(params, k, d, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    out = fwd(cpad, *[padded[nm] for nm in names])
    return out[:n, :o], (params, coords)


def _mfn_fused_bwd(k, interpret, precision, res, g):
    params, coords = res
    n, d = coords.shape
    h = params["gabor_0"]["b"].shape[0]
    o = params["final"]["b"].shape[0]
    n_pad = _round_up(n, TILE_N)
    n_tiles = n_pad // TILE_N
    _, bwd, names, hp, op = _pair_programs(k, d, h, o, TILE_N, n_tiles,
                                           interpret, precision)
    padded = _pad_params(params, k, d, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    # zero-padded cotangent rows make every padding-row contribution zero
    gpad = jnp.pad(g, ((0, n_pad - n), (0, op - o)))
    outs = bwd(cpad, gpad, *[padded[nm] for nm in names])
    dc = outs[0][:n]
    dw = {nm: outs[1 + j] for j, nm in enumerate(names)}
    return _unpad_grads(dw, params, k, h, o), dc


_mfn_fused.defvjp(_mfn_fused_fwd, _mfn_fused_bwd)


def mfn_mlp_fused(params, coords, spec, interpret=False):
    """Fused MFN forward with custom fused VJP (the operator-fit /
    rendering model path; wire_mlp.wire_mlp_fused's contract)."""
    lead = coords.shape[:-1]
    c2 = coords.reshape(-1, coords.shape[-1])
    out = _mfn_fused(params, c2, spec.hidden_layers + 1, interpret,
                     getattr(spec, "gemm_precision", "default"))
    return out.reshape(*lead, out.shape[-1])


def _names_shapes(k, d, hp, op):
    names = []
    shapes = {}
    for i in range(k):
        names += [f"f{i}w", f"f{i}b", f"f{i}mu", f"f{i}g"]
        shapes.update({f"f{i}w": (d, hp), f"f{i}b": (1, hp),
                       f"f{i}mu": (hp, d), f"f{i}g": (1, hp)})
    for i in range(k - 1):
        names += [f"l{i}W", f"l{i}B"]
        shapes.update({f"l{i}W": (hp, hp), f"l{i}B": (1, hp)})
    names += ["fW", "fb"]
    shapes.update({"fW": (hp, op), "fb": (1, op)})
    return names, shapes


@functools.lru_cache(maxsize=16)
def _step_program(k, d, h, o, tile_n, n_tiles, interpret,
                  precision="default", metrics=False):
    hp = _round_up(h, 128)
    op = _round_up(max(o, 1), 128)
    names, shapes = _names_shapes(k, d, hp, op)

    def wspec(nm):
        s = shapes[nm]
        zeros = (0,) * len(s)
        return pl.BlockSpec(s, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    def imap(i):
        return (i, 0)

    scratch = [pltpu.VMEM(shapes[nm], jnp.float32) for nm in names]
    if metrics:
        scratch += [pltpu.VMEM((2, op), jnp.float32)]

    tspec = pl.BlockSpec((tile_n, op), imap, memory_space=pltpu.VMEM)
    mspec = [pl.BlockSpec((2, op), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)] if metrics else []
    mshape = [jax.ShapeDtypeStruct((2, op), jnp.float32)] if metrics else []
    step = pl.pallas_call(
        _make_step_kernel(k, names, precision, tile_n, n_tiles, metrics),
        grid=(n_tiles,),
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
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    return step, names, hp, op


def mfn_step_fused(params, coords, target, spec, *, nvalid=None,
                   denom=None, gt=None, want_metrics=False,
                   interpret=False):
    """One fused MFN train step: (pred, dparams[, metric sums]) — the
    wire_step_fused contract for the Gabor-MFN family."""
    n, d = coords.shape
    h = params["gabor_0"]["b"].shape[0]
    o = params["final"]["b"].shape[0]
    k = spec.hidden_layers + 1
    n_pad = _round_up(n, TILE_N)
    n_tiles = n_pad // TILE_N
    step, names, hp, op = _step_program(
        k, d, h, o, TILE_N, n_tiles, interpret,
        getattr(spec, "gemm_precision", "default"), want_metrics)
    padded = _pad_params(params, k, d, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    tpad = jnp.pad(target, ((0, n_pad - n), (0, op - o)))
    nv = jnp.full((1, 1), n, jnp.int32) if nvalid is None else \
        jnp.asarray(nvalid, jnp.int32).reshape(1, 1)
    dn_ = jnp.asarray(float(n * o) if denom is None else denom,
                      jnp.float32).reshape(1, 1)
    invd = 1.0 / dn_
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
    dw = {nm: outs[k0 + j] for j, nm in enumerate(names)}
    dparams = _unpad_grads(dw, params, k, h, o)
    if want_metrics:
        return pred, dparams, sums
    return pred, dparams
