"""Pallas TPU kernel: bilinear rotate-and-row-sum — the REFERENCE-EXACT
spatial Radon forward operator, with a fused adjoint kernel.

The reference's CT operator (lin_inverse.py:19-40) is per-angle bilinear
rotation (kornia convention) followed by a row sum.  ``method='rotate'``
reproduces it with XLA gathers at ~2.7 ms/angle on v5e (492 ms/iter fwd+bwd
at 512^2 x 100 angles); the fast 'fourier'/'shear' paths are a DIFFERENT
interpolation model and lose ~6 dB when fitting a rotate-generated sinogram
(VERDICT r2 missing #1, PERF.md).  This kernel computes the rotate-model
line integrals directly:

    sino[a, x] = sum_t  img_bilinear( R_phi . (x - c, t - c) + c )

without materializing any rotated image.  Structure:

- each angle theta is split as theta = 90 k + phi, |phi| <= 45 deg; the
  90 k part is a lattice-exact rot90 of the image (square images: bilinear
  rotation by 90 k permutes pixels), applied on the XLA side into a stack
  of zero-padded (P, P) variant planes that sit VMEM-resident.  The
  residual |sin phi| <= 0.707 bounds the kernel's block spans.
- grid = (angle, x-tile of 128, as two 64-wide subtiles); each subtile
  loops over the integration rows in chunks of 32: the 2048 samples of
  one (32-row, 64-column) chunk span <= 67 rows and <= 72 cols of the
  plane, so each iteration dynamic-slices one (BR, BC) = (88, 256)
  block and applies the bilinear weights as a one-hot MXU contraction
  (cols) + select-lanes multiply (rows) for all 2048 samples at once —
  the kernel is VPU-bound on selector construction, so samples per
  selector build is the number that matters (PERF.md round 3).
- the adjoint kernel runs the same selection transposed, accumulating
  read-modify-write into the variant planes under a sequential grid; the
  XLA side folds the planes back with the inverse rot90s.  Both directions
  are exact adjoints of each other by construction.

Matmul operands ride the MXU at DEFAULT precision (bf16 truncation on
v5e); accumulation f32.  Exact-f32 parity with `sum(rotate(img, a), 0)` is
pinned in interpret mode (tests/test_pallas_rotsum.py); on-device the bf16
one-hot adds ~1e-3 relative — an order below the fit-relevant scales.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_X = 128   # output columns per grid step (two 64-wide subtiles)
SUB_X = 64     # columns per subtile (block-span unit)
CHUNK_T = 32   # integration rows per selector build (swept on v5e:
               # 4/8/16/32/64/128 -> 72/44/32/26.7/27.3/37 ms fwd+bwd at
               # 512^2 x 100 angles — loop/slice amortization beats the
               # slightly larger per-sample selector area up to 32)
LANES = SUB_X * CHUNK_T   # samples per one-hot build/matmul
BR = 88        # block rows: max(63 sin + 31 cos) + taps + 8-align slack
BC = 256       # block cols: 63 + 0.707*31 + taps + 128-align slack


def _plane_size(S):
    """Padded plane side: all residual-rotation samples of an (S, S) image
    about its center stay within radius S/sqrt(2) of the center; pad so
    floor+1 taps and 128-aligned BC-wide block slices stay in bounds."""
    need = int(np.ceil(1.415 * S)) + 6
    P = -(-need // 128) * 128
    return max(P, BC, 2 * BR)


def _selectors(sy, sx, rs, cs, br, bc):
    """One-hot bilinear selection matrices for a chunk of samples.

    sy, sx: (N,) float plane coords.  Returns rowsel (br, N), colsel
    (bc, N).  Built arithmetically as the linear hat max(0, 1 - |i - u|),
    which equals the two-tap floor/ceil weights exactly and costs ~3 VPU
    ops/entry vs ~5 for the compare/select form — the kernel is VPU-bound
    on exactly this construction (PERF.md round 3)."""
    uy = (sy - rs.astype(jnp.float32))[None, :]
    ux = (sx - cs.astype(jnp.float32))[None, :]
    iy = jax.lax.broadcasted_iota(jnp.int32, (br, sy.shape[0]), 0).astype(
        jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (bc, sy.shape[0]), 0).astype(
        jnp.float32)
    rowsel = jnp.maximum(0.0, 1.0 - jnp.abs(iy - uy))
    colsel = jnp.maximum(0.0, 1.0 - jnp.abs(ix - ux))
    return rowsel, colsel


def _positions(cphi, sphi, xs, t, c, off):
    """Plane coords of the samples of output columns ``xs`` at integration
    row ``t`` (rotate() convention: src = R^{-1} dst about center c)."""
    xr = xs - c
    yr = t - c
    sx = cphi * xr - sphi * yr + c + off
    sy = sphi * xr + cphi * yr + c + off
    return sy, sx


def _block_starts(sy, sx, P):
    ry = jnp.floor(jnp.min(sy)).astype(jnp.int32)
    rx = jnp.floor(jnp.min(sx)).astype(jnp.int32)
    rs = pl.multiple_of(jnp.clip((ry // 8) * 8, 0, P - BR), 8)
    cs = pl.multiple_of(jnp.clip((rx // 128) * 128, 0, P - BC), 128)
    return rs, cs


def _fwd_kernel(S, cphi_ref, sphi_ref, kidx_ref, var_ref, out_ref):
    P = var_ref.shape[1]
    a = pl.program_id(0)
    xt = pl.program_id(1)
    cphi = cphi_ref[a]
    sphi = sphi_ref[a]
    kv = kidx_ref[a]
    c = (S - 1) / 2.0
    off = (P - S) // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)[0]
    tloc = (lane // SUB_X).astype(jnp.float32)
    xloc = (lane % SUB_X).astype(jnp.float32)
    n_chunks = -(-S // CHUNK_T)
    # fold matrix: out column x accumulates its CHUNK_T sample copies
    fold = (jax.lax.broadcasted_iota(jnp.int32, (LANES, SUB_X), 0)
            % SUB_X
            == jax.lax.broadcasted_iota(jnp.int32, (LANES, SUB_X), 1)
            ).astype(jnp.float32)

    halves = []
    for sub in range(TILE_X // SUB_X):
        # clamp pad lanes (x >= S) onto the last column; output is cropped
        xs = jnp.minimum(xloc + xt * TILE_X + sub * SUB_X, S - 1.0)

        def body(tc, acc, xs=xs):
            traw = tc * CHUNK_T + tloc
            t = jnp.minimum(traw, S - 1.0)
            tlive = (traw <= S - 1.0).astype(jnp.float32)
            sy, sx = _positions(cphi, sphi, xs, t, c, off)
            rs, cs = _block_starts(sy, sx, P)
            rowsel, colsel = _selectors(sy, sx, rs, cs, BR, BC)
            blk = var_ref[kv, pl.ds(rs, BR), pl.ds(cs, BC)]
            prod = jnp.dot(blk, colsel,
                           preferred_element_type=jnp.float32)
            return acc + tlive * jnp.sum(prod * rowsel, axis=0)

        acc = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros((LANES,), jnp.float32))
        halves.append(jnp.dot(acc[None, :], fold,
                              preferred_element_type=jnp.float32)[0])
    out_ref[0, 0, :] = jnp.concatenate(halves, axis=-1)


def _bwd_kernel(S, cphi_ref, sphi_ref, kidx_ref, cot_ref, oplanes_ref):
    P = oplanes_ref.shape[1]
    a = pl.program_id(0)
    xt = pl.program_id(1)

    @pl.when(jnp.logical_and(a == 0, xt == 0))
    def _():
        oplanes_ref[:] = jnp.zeros(oplanes_ref.shape, oplanes_ref.dtype)

    cphi = cphi_ref[a]
    sphi = sphi_ref[a]
    kv = kidx_ref[a]
    c = (S - 1) / 2.0
    off = (P - S) // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)[0]
    tloc = (lane // SUB_X).astype(jnp.float32)
    xloc = (lane % SUB_X).astype(jnp.float32)
    n_chunks = -(-S // CHUNK_T)
    xs0 = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_X), 1)[0].astype(
        jnp.float32)
    # pad lanes alias the last column; zero their cotangent instead
    valid = (xs0 + xt * TILE_X <= S - 1.0).astype(jnp.float32)
    cot_t = cot_ref[0, 0, :] * valid

    for sub in range(TILE_X // SUB_X):
        xs = jnp.minimum(xloc + xt * TILE_X + sub * SUB_X, S - 1.0)
        # expand matrix: cot column sub*SUB_X + (n % SUB_X) to sample lane
        # n — selection by matmul (a 64-offset lane slice lowers to an
        # unsupported gather in Mosaic)
        expand = (jax.lax.broadcasted_iota(jnp.int32, (TILE_X, LANES), 0)
                  == sub * SUB_X
                  + jax.lax.broadcasted_iota(jnp.int32, (TILE_X, LANES), 1)
                  % SUB_X).astype(jnp.float32)
        cot512 = jnp.dot(cot_t[None, :], expand,
                         preferred_element_type=jnp.float32)[0]

        def body(tc, _, xs=xs, cot512=cot512):
            traw = tc * CHUNK_T + tloc
            t = jnp.minimum(traw, S - 1.0)
            tlive = (traw <= S - 1.0).astype(jnp.float32)
            sy, sx = _positions(cphi, sphi, xs, t, c, off)
            rs, cs = _block_starts(sy, sx, P)
            rowsel, colsel = _selectors(sy, sx, rs, cs, BR, BC)
            # adjoint of out[n] = sum_{r,c} blk[r,c] colsel[c,n] rowsel[r,n]
            tmp = rowsel * (tlive * cot512)[None, :]          # (BR, N)
            add = jax.lax.dot_general(tmp, colsel,
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            oplanes_ref[kv, pl.ds(rs, BR), pl.ds(cs, BC)] += add
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.lru_cache(maxsize=8)
def _programs(A, S, P, interpret):
    n_xt = -(-S // TILE_X)
    grid = (A, n_xt)
    # per-angle scalars (cos phi, sin phi, variant index) ride as scalar-
    # prefetch args: full (A,) arrays in SMEM, indexed by program_id
    planes = pl.BlockSpec((4, P, P), lambda a, t, *_: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    sino = pl.BlockSpec((1, 1, TILE_X), lambda a, t, *_: (a, 0, t),
                        memory_space=pltpu.VMEM)
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=110 * 1024 * 1024)
    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, S),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[planes],
            out_specs=sino),
        out_shape=jax.ShapeDtypeStruct((A, 1, n_xt * TILE_X), jnp.float32),
        interpret=interpret,
        compiler_params=params,
    )
    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, S),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[sino],
            out_specs=planes),
        out_shape=jax.ShapeDtypeStruct((4, P, P), jnp.float32),
        interpret=interpret,
        compiler_params=params,
    )
    return fwd, bwd


def _angle_parts(angles_degrees):
    """theta = 90 k + phi with k in {0..3} (mod 360), |phi| <= 45 deg."""
    theta = jnp.asarray(angles_degrees, jnp.float32)
    k = jnp.round(theta / 90.0).astype(jnp.int32)
    phi = jnp.deg2rad(theta - k.astype(jnp.float32) * 90.0)
    return jnp.cos(phi), jnp.sin(phi), (k % 4).astype(jnp.int32)


def _variant_planes(img, P):
    """Stack of the four lattice-exact 90-degree pre-rotations, zero-padded
    into (4, P, P) planes.  rotate(img, 90) == rot90(img, 1) exactly for
    square images (verified in tests), so rotate(img, 90k + phi) ==
    rotate(rot90(img, k), phi)."""
    S = img.shape[0]
    o = (P - S) // 2
    vs = jnp.stack([img, jnp.rot90(img, 1), jnp.rot90(img, 2),
                    jnp.rot90(img, 3)])
    return jnp.zeros((4, P, P), img.dtype).at[:, o:o + S, o:o + S].set(vs)


def _fold_variants(planes, S):
    """Adjoint of _variant_planes: crop each plane and un-rotate."""
    P = planes.shape[1]
    o = (P - S) // 2
    crop = planes[:, o:o + S, o:o + S]
    return (crop[0] + jnp.rot90(crop[1], -1) + jnp.rot90(crop[2], -2)
            + jnp.rot90(crop[3], -3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rotate_project(img, angles_degrees, interpret=False):
    """(S, S) image, (A,) angles in degrees -> (A, S) sinogram, exactly
    the reference operator ``sum_y rotate(img, angle)[y]``
    (lin_inverse.py:19-40 semantics).  Differentiable in ``img`` via the
    fused adjoint kernel; the ANGLES are treated as constants (their
    cotangent is zero — matching the reference protocol, which never
    optimizes projection angles; use method='rotate_xla' if an angle
    gradient is ever needed)."""
    out, _ = _rp_fwd(img, angles_degrees, interpret)
    return out


def _rp_fwd(img, angles_degrees, interpret):
    S = img.shape[0]
    assert img.shape[0] == img.shape[1], "rotate_project needs square"
    A = np.shape(angles_degrees)[0]
    P = _plane_size(S)
    cphi, sphi, kidx = _angle_parts(angles_degrees)
    planes = _variant_planes(img.astype(jnp.float32), P)
    fwd, _ = _programs(A, S, P, interpret)
    sino = fwd(cphi, sphi, kidx, planes)
    return sino[:, 0, :S], (cphi, sphi, kidx, (A, S, P))


def _rp_bwd(interpret, res, cot):
    cphi, sphi, kidx, (A, S, P) = res
    n_xt = -(-S // TILE_X)
    cot_p = jnp.pad(cot, ((0, 0), (0, n_xt * TILE_X - S)))
    _, bwd = _programs(A, S, P, interpret)
    planes_bar = bwd(cphi, sphi, kidx, cot_p[:, None, :])
    return _fold_variants(planes_bar, S), jnp.zeros_like(cphi)


rotate_project.defvjp(_rp_fwd, _rp_bwd)
