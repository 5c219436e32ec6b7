"""Fused Pallas TPU kernels for the WIRE complex-Gabor MLP apply path:
a forward kernel and a recompute-backward kernel wired as a custom VJP.

This is the model path for OPERATOR fits (CT/SISR/multi-SR render the
field then differentiate through radon/downsample — the pointwise-MSE
one-pass step kernel in wire_step.py cannot absorb a global operator) and
for plain evaluation/rendering.  Round 4 rebuilt both kernels on the step
kernel's machinery after profiling showed the original 4-GEMM pair ran at
~10% MXU utilization (8.2 ms forward at 512^2 coords vs a 0.8 ms
roofline; the full CT chain spent 20 of 23 ms in the model):

- **Stacked complex GEMMs** (wire_step.py): a complex matmul as ONE
  (n, 2hp) @ (2hp, 2hp) real contraction instead of four (n, hp) GEMMs —
  fewer, larger MXU ops keep the systolic pipeline full.
- **Forward**: each grid step runs TWO independent half-tile chains,
  hand-interleaved per layer — a single forward is a dependent GEMM
  chain that stalls the MXU (chain microbench, wire_step.py: 1 chain
  1.01 ms vs 2 chains 0.713 ms at equal MACs); the second chain fills
  the stalls.
- **Backward**: recomputes the forward (cheaper than storing
  activations: one extra MXU pass vs ~N*h*4B*layers of HBM residual
  traffic) and is cross-tile software-pipelined exactly like
  wire_step.py: grid step i recomputes tile i's activations into VMEM
  scratch slot i%2 while backpropagating tile i-1 from slot (i-1)%2,
  consuming the caller-supplied output cotangent block g[i-1].  Weight
  grads accumulate in VMEM scratch (no control flow in the hot body)
  and flush at the final (phantom-forward) step.  Step 0's phantom
  backward reads zeroed scratch activations, so every accumulated term
  is exactly zero even though its g block is real data.

Semantics match wire_tpu.nn.models.wire_apply exactly (same params
pytree, same discarded imaginary output -> dfinal.bi = 0); `wire_mlp_fused`
dispatches here on TPU and models.py keeps the jnp reference elsewhere.
Replaces the per-op XLA path of modules/wire.py:88-93's hottest stack
(SURVEY.md §3.5).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _make_dot(precision):
    """MXU dot accumulating in f32.  precision='default' uses the MXU's
    native path (on TPU this truncates f32 inputs to bf16 — XLA's default
    matmul precision; measured bitwise-identical to an explicit bf16 cast on
    v5e); 'highest' forces full-f32 multi-pass matmuls for exact f32
    semantics (CPU-parity debugging, slower on TPU)."""
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)

    def _dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=prec)

    def _dot_tn(a, b):
        # a.T @ b without materializing the transpose: contract dim 0 of
        # both operands (the MXU consumes this directly)
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    def _dot_nt(a, b):
        # a @ b.T: contract dim 1 of both operands
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
    return _dot, _dot_tn, _dot_nt


TILE_N = 512


# Measured on v5e (512^2-coord WIRE-300 forward, PERF.md round 4): exp is
# effectively free (hardware EUP — stubbing it changed nothing) but EACH
# jnp.sin/jnp.cos lowers to a range-reduced polynomial that cost ~3.6 ms
# per pass at this size, so the Gabor phase pair dominated the forward
# kernel (8.1 ms vs 3.7 with the pair stubbed).  fast_sincos computes BOTH
# from ONE Cody-Waite reduction with short minimax polynomials (cephes
# sinf/cosf coefficients, exact to f32 rounding for |x| < ~2^13 — Gabor
# phases are omega0 * preactivation, well inside).
# pi/2 split into three exactly-representable f32 parts (2x the cephes
# pi/4 triple; the power-of-two scaling is exact)
_DP1, _DP2, _DP3 = 1.5703125, 4.837512969970703125e-4, 7.54978995489188216e-8
_S1, _S2, _S3 = -1.6666654611e-1, 8.3321608736e-3, -1.9515295891e-4
_C2, _C3, _C4 = 4.166664568298827e-2, -1.388731625493765e-3, 2.443315711809948e-5


def fast_sincos(x):
    """(sin x, cos x) from one shared range reduction, f32."""
    q = jnp.floor(x * (2.0 / jnp.pi) + 0.5)
    r = ((x - q * _DP1) - q * _DP2) - q * _DP3
    z = r * r
    sp = r * (1.0 + z * (_S1 + z * (_S2 + z * _S3)))
    cp = 1.0 + z * (-0.5 + z * (_C2 + z * (_C3 + z * _C4)))
    k = q - 4.0 * jnp.floor(q * 0.25)
    m1 = (k == 1.0).astype(x.dtype)
    m2 = (k == 2.0).astype(x.dtype)
    m3 = (k == 3.0).astype(x.dtype)
    swap = m1 + m3
    s = sp + swap * (cp - sp)
    c = cp + swap * (sp - cp)
    return (1.0 - 2.0 * (m2 + m3)) * s, (1.0 - 2.0 * (m1 + m2)) * c


def _gabor_first_stacked(z1, first_omega0, s2):
    m = jnp.exp(-s2 * (z1 * z1))
    sn, cs = fast_sincos(first_omega0 * z1)
    return jnp.concatenate([m * cs, m * sn], axis=1)


def _gabor_stacked(z, omega0, s2, hp):
    zr, zi = z[:, :hp], z[:, hp:]
    m = jnp.exp(-omega0 * zi - s2 * (zr * zr + zi * zi))
    sn, cs = fast_sincos(omega0 * zr)
    return jnp.concatenate([m * cs, m * sn], axis=1)


def _make_fwd_kernel(L, omega0, sigma0, first_omega0, names, precision, hp):
    _dot, _, _ = _make_dot(precision)
    s2 = sigma0 * sigma0
    half = TILE_N // 2

    def kernel(*refs):
        c_ref = refs[0]
        w = {nm: refs[1 + k][:] for k, nm in enumerate(names)}
        out_ref = refs[1 + len(names)]
        c = c_ref[:]
        # two independent half-tile chains, ops interleaved per stage so
        # the scheduler fills each chain's dependency stalls with the other
        za = _dot(c[:half], w["w1"]) + w["b1"]
        zb = _dot(c[half:], w["w1"]) + w["b1"]
        aa = _gabor_first_stacked(za, first_omega0, s2)
        ab = _gabor_first_stacked(zb, first_omega0, s2)
        for li in range(L):
            za = _dot(aa, w[f"h{li}W"]) + w[f"h{li}B"]
            zb = _dot(ab, w[f"h{li}W"]) + w[f"h{li}B"]
            aa = _gabor_stacked(za, omega0, s2, hp)
            ab = _gabor_stacked(zb, omega0, s2, hp)
        ya = _dot(aa, w["fW"]) + w["fb"]
        yb = _dot(ab, w["fW"]) + w["fb"]
        out_ref[:] = jnp.concatenate([ya, yb], axis=0)
    return kernel


def _make_bwd_kernel(L, omega0, sigma0, first_omega0, names, precision,
                     tile_n, hp, n_tiles):
    """Recompute-forward(tile i) pipelined against backward(tile i-1) with
    the caller-supplied cotangent; emits dcoords blocks and accumulated
    weight grads.  Structure and invariants mirror wire_step.py's
    _make_step_kernel (see its scheduling notes)."""
    _dot, _dot_tn, _dot_nt = _make_dot(precision)
    s2 = sigma0 * sigma0

    def kernel(*refs):
        c_ref, g_ref = refs[0], refs[1]
        w = {nm: refs[2 + k][:] for k, nm in enumerate(names)}
        outs = refs[2 + len(names):]
        dc_ref = outs[0]
        dout = {nm: outs[1 + k] for k, nm in enumerate(names)}
        rest = outs[1 + len(names):]
        dacc = {nm: rest[k] for k, nm in enumerate(names)}
        live = rest[len(names):]
        # live-activation scratch, 2 slots each: c, z1, (a_in, zr, zi) x L,
        # a_fin
        sc_c, sc_z1 = live[0], live[1]
        sc_layer = [(live[2 + 3 * li], live[3 + 3 * li], live[4 + 3 * li])
                    for li in range(L)]
        sc_afin = live[2 + 3 * L]

        i = pl.program_id(0)
        sf = jax.lax.rem(i, 2)       # fwd writes slot i%2
        sb = jax.lax.rem(i + 1, 2)   # bwd reads slot (i-1)%2

        @pl.when(i == 0)
        def _zero():
            for nm in names:
                dacc[nm][:] = jnp.zeros_like(dacc[nm])
            # slot 1 feeds step 0's phantom backward: zeroed activations
            # make every accumulated term exactly zero (g is real data, but
            # each product carries an a/z/c factor from the zero slot)
            for ref in live:
                ref[1] = jnp.zeros_like(ref[1])

        def acc(nm, val):
            # unconditional VMEM accumulate: no control-flow region, so the
            # scheduler can interleave MXU work across it
            dacc[nm][:] += val

        # ---- fwd-recompute(tile i) interleaved with bwd(tile i-1) --------
        c = c_ref[:]
        sc_c[sf] = c
        z1 = _dot(c, w["w1"]) + w["b1"]

        # cotangent block of tile i-1; the index map clamps step 0 onto
        # tile 0's REAL data, and unlike the activation terms (zeroed via
        # slot 1) the fb accumulation sums g directly — weight the block to
        # exactly zero on the phantom step (a scalar multiply, not a
        # pl.when region: those are scheduling barriers)
        g_b = (i > 0).astype(jnp.float32) * g_ref[:]
        afin_b = sc_afin[sb]
        acc("fW", _dot_tn(afin_b, g_b))
        da = _dot_nt(g_b, w["fW"])

        sc_z1[sf] = z1
        a = _gabor_first_stacked(z1, first_omega0, s2)
        acc("fb", jnp.sum(g_b, axis=0, keepdims=True))

        # Gabor backward in activation form (see wire_step.py): with
        # (ar, ai) the layer's own output activation and (dar, dai) its
        # cotangent, t1 = dar*ar + dai*ai, t2 = dai*ar - dar*ai,
        # dzr = -2s^2 zr t1 + w0 t2, dzi = (-w0 - 2s^2 zi) t1.
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
            sn, cs = fast_sincos(omega0 * zr)
            a = jnp.concatenate([m * cs, m * sn], axis=1)
            a_out_b = a_in_b

        # fwd epilogue: stash the final activation (the recompute needs no
        # final GEMM — only the activations feed the backward)
        sc_afin[sf] = a

        # bwd epilogue: first layer of tile i-1, dcoords out
        z1_b = sc_z1[sb]
        ar_b, ai_b = a_out_b[:, :hp], a_out_b[:, hp:]
        dar, dai = da[:, :hp], da[:, hp:]
        t1 = dar * ar_b + dai * ai_b
        t2 = dai * ar_b - dar * ai_b
        dz1 = (-2.0 * s2) * z1_b * t1 + first_omega0 * t2
        acc("w1", _dot_tn(sc_c[sb], dz1))
        acc("b1", jnp.sum(dz1, axis=0, keepdims=True))
        dc_ref[:] = _dot_nt(dz1, w["w1"])

        @pl.when(i == n_tiles)
        def _flush():
            for nm in names:
                dout[nm][:] = dacc[nm][:]

    return kernel


@functools.lru_cache(maxsize=32)
def _programs(L, omega0, sigma0, first_omega0, d, h, o, tile_n, n_tiles,
              interpret, precision="default"):
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

    fwd = pl.pallas_call(
        _make_fwd_kernel(L, omega0, sigma0, first_omega0, names, precision,
                         hp),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + [wspec(nm) for nm in names],
        out_specs=pl.BlockSpec((tile_n, op), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_n, op), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    # backward: tile i's c/g-of-previous maps — grid step i fetches coord
    # tile min(i, n-1) (the final phantom step refetches the last tile) and
    # cotangent/dcoords tile clip(i-1, 0, n-1) (step 0's phantom backward
    # writes an all-zero dc block to tile 0; step 1 overwrites it)
    def imap_cur(i):
        return (jnp.minimum(i, n_tiles - 1), 0)

    def imap_prev(i):
        return (jnp.clip(i - 1, 0, n_tiles - 1), 0)

    scratch = [pltpu.VMEM(shapes[nm], jnp.float32) for nm in names]
    scratch += [pltpu.VMEM((2, tile_n, d), jnp.float32),       # c
                pltpu.VMEM((2, tile_n, hp), jnp.float32)]      # z1
    for _ in range(L):
        scratch += [pltpu.VMEM((2, tile_n, 2 * hp), jnp.float32),  # a_in
                    pltpu.VMEM((2, tile_n, hp), jnp.float32),      # zr
                    pltpu.VMEM((2, tile_n, hp), jnp.float32)]      # zi
    scratch += [pltpu.VMEM((2, tile_n, 2 * hp), jnp.float32)]      # a_fin

    bwd = pl.pallas_call(
        _make_bwd_kernel(L, omega0, sigma0, first_omega0, names, precision,
                         tile_n, hp, n_tiles),
        grid=(n_tiles + 1,),
        in_specs=[pl.BlockSpec((tile_n, d), imap_cur,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_n, op), imap_prev,
                               memory_space=pltpu.VMEM)]
                 + [wspec(nm) for nm in names],
        out_specs=[pl.BlockSpec((tile_n, d), imap_prev,
                                memory_space=pltpu.VMEM)]
                  + [wspec(nm) for nm in names],
        out_shape=[jax.ShapeDtypeStruct((n_tiles * tile_n, d), jnp.float32)]
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
    return fwd, bwd, names, hp, op


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _wire_fused(params, coords, L, omega0, sigma0, first_omega0, interpret,
                precision):
    out, _ = _wire_fused_fwd(params, coords, L, omega0, sigma0,
                             first_omega0, interpret, precision)
    return out


def _wire_fused_fwd(params, coords, L, omega0, sigma0, first_omega0,
                    interpret, precision):
    from wire_tpu.ops.pallas.wire_step import _pad_params_stacked
    n, d = coords.shape
    h = params["first"]["w"].shape[1]
    o = params["final"]["br"].shape[0]
    n_pad = _round_up(n, TILE_N)
    n_tiles = n_pad // TILE_N
    fwd, _, names, hp, op = _programs(L, float(omega0), float(sigma0),
                                      float(first_omega0), d, h, o, TILE_N,
                                      n_tiles, interpret, precision)
    padded, _, _, _ = _pad_params_stacked(params, L, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    out = fwd(cpad, *[padded[nm] for nm in names])
    return out[:n, :o], (params, coords)


def _wire_fused_bwd(L, omega0, sigma0, first_omega0, interpret, precision,
                    res, g):
    from wire_tpu.ops.pallas.wire_step import (_pad_params_stacked,
                                               _unstack_grads)
    params, coords = res
    n, d = coords.shape
    h = params["first"]["w"].shape[1]
    o = params["final"]["br"].shape[0]
    n_pad = _round_up(n, TILE_N)
    n_tiles = n_pad // TILE_N
    _, bwd, names, hp, op = _programs(L, float(omega0), float(sigma0),
                                      float(first_omega0), d, h, o, TILE_N,
                                      n_tiles, interpret, precision)
    padded, _, _, _ = _pad_params_stacked(params, L, hp, op)
    cpad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    gpad = jnp.pad(g, ((0, n_pad - n), (0, op - o)))
    outs = bwd(cpad, gpad, *[padded[nm] for nm in names])
    dc = outs[0][:n]
    dw = {nm: outs[1 + k] for k, nm in enumerate(names)}
    dparams = _unstack_grads(dw, params, L, h, hp, o)
    return dparams, dc


_wire_fused.defvjp(_wire_fused_fwd, _wire_fused_bwd)


def wire_mlp_fused(params, coords, spec, interpret=False):
    """Fused WIRE forward with custom fused VJP. coords (..., d) -> (..., o).

    Note: yi (the imaginary output) is discarded by the model, so
    dfinal.bi == 0 and dfinal.wi carries only the -ai^T g term — identical
    to autodiff of the jnp path."""
    lead = coords.shape[:-1]
    c2 = coords.reshape(-1, coords.shape[-1])
    out = _wire_fused(params, c2, spec.hidden_layers, float(spec.hidden_omega0),
                      float(spec.scale), float(spec.first_omega0), interpret,
                      getattr(spec, "gemm_precision", "default"))
    return out.reshape(*lead, out.shape[-1])
