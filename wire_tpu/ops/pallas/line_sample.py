"""Pallas TPU kernel: bilinear sampling of a 2D spectrum along radial lines,
with a fused adjoint (scatter) kernel — the hot ops of the projection-slice
Radon transform (operators/radon.py `_radon_fourier`).

Why a kernel: XLA lowers the (A, K)-point bilinear gather from the (P, P)
spectrum to a generic gather (~9.7 ms at 512^2 x 100 angles on v5e) and its
adjoint to a generic scatter-add (~46 ms) — together ~95% of the operator's
fwd+bwd time, with the FFTs at ~2 ms each.  The line structure makes both
local: a tile of T consecutive k-samples of one angle's central slice spans
at most T+2 rows and T+2 columns of the spectrum.  So each grid step
dynamic-slices one (BR, BC) block out of the VMEM-resident spectrum planes
and performs the bilinear selection as two one-hot contractions on the MXU:

    cols:  (BR, BC) @ (BC, T)  with colsel[x, j] = (1-wx_j)[x==x0_j]
                                                 + wx_j [x==x1_j]
    rows:  sum over BR of prod * rowsel,  rowsel[y, j] analogous

The adjoint runs the same selection transposed and accumulates blocks into
the output planes with read-modify-write under a sequential grid.

Layout contract (established by the caller, operators/radon.py):
- the spectrum is fftshift-ed so line coordinates are contiguous (no mod-P
  wrap), then halo-padded on the high side to (P + HALO_PAD) per axis with
  2 periodic rows/columns (positions can reach exactly P and P+1 when a
  sample lands on the Nyquist row/column);
- positions gy/gx are float grid coordinates in that frame, one row per
  angle, padded along k to a multiple of T by repeating the last column
  (the adjoint zero-pads the cotangent instead, so padded lanes contribute
  nothing).

Matmul operands ride the MXU at DEFAULT precision (bf16 truncation on v5e,
like every other kernel here); accumulation is f32.  The interpolation
noise this adds (~4e-3 relative) is an order below the fourier method's
bilinear interpolation error (~2e-2 vs the rotate oracle).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_K = 128      # k-samples per grid step (lane width)
BR = 144          # block rows: T+2 span + 8-alignment slack, multiple of 8
BC = 384          # block cols: T+2 span + 128-alignment slack, mult. of 128
HALO_PAD = 128    # high-side padding of the spectrum planes (>= 2 used)


def _blocks(ph):
    """Effective block dims: full plane width/height when the plane is
    smaller than the standard block (tiny-image case)."""
    return min(BR, ph), min(BC, ph)


def _starts(gy, gx, ph):
    """Aligned block starts covering this tile's samples (scalars)."""
    br, bc = _blocks(ph)
    ry = jnp.floor(jnp.min(gy)).astype(jnp.int32)
    rx = jnp.floor(jnp.min(gx)).astype(jnp.int32)
    rs = pl.multiple_of(jnp.clip((ry // 8) * 8, 0, ph - br), 8)
    cs = pl.multiple_of(jnp.clip((rx // 128) * 128, 0, ph - bc), 128)
    return rs, cs


def _selectors(gy, gx, rs, cs, br, bc):
    """One-hot bilinear selection matrices for a tile.

    Returns colsel (BC, T) and rowsel (BR, T); both have column sums equal
    to 1 for in-block samples (the two taps' weights sum to 1)."""
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    wy = (gy - y0)[None, :]
    wx = (gx - x0)[None, :]
    ly = (y0.astype(jnp.int32) - rs)[None, :]
    lx = (x0.astype(jnp.int32) - cs)[None, :]
    ix = jax.lax.broadcasted_iota(jnp.int32, (bc, gy.shape[0]), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (br, gy.shape[0]), 0)
    colsel = (jnp.where(ix == lx, 1.0 - wx, 0.0)
              + jnp.where(ix == lx + 1, wx, 0.0))
    rowsel = (jnp.where(iy == ly, 1.0 - wy, 0.0)
              + jnp.where(iy == ly + 1, wy, 0.0))
    return colsel, rowsel


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _gather_kernel(gy_ref, gx_ref, fre_ref, fim_ref, ore_ref, oim_ref):
    ph = fre_ref.shape[0]
    gy = gy_ref[0, 0, :]
    gx = gx_ref[0, 0, :]
    br, bc = _blocks(ph)
    rs, cs = _starts(gy, gx, ph)
    colsel, rowsel = _selectors(gy, gx, rs, cs, br, bc)
    blk_re = fre_ref[pl.ds(rs, br), pl.ds(cs, bc)]
    blk_im = fim_ref[pl.ds(rs, br), pl.ds(cs, bc)]
    ore_ref[0, 0, :] = jnp.sum(_dot(blk_re, colsel) * rowsel, axis=0)
    oim_ref[0, 0, :] = jnp.sum(_dot(blk_im, colsel) * rowsel, axis=0)


def _scatter_kernel(gy_ref, gx_ref, sre_ref, sim_ref, ore_ref, oim_ref):
    a = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(jnp.logical_and(a == 0, t == 0))
    def _():
        ore_ref[:] = jnp.zeros(ore_ref.shape, ore_ref.dtype)
        oim_ref[:] = jnp.zeros(oim_ref.shape, oim_ref.dtype)

    ph = ore_ref.shape[0]
    gy = gy_ref[0, 0, :]
    gx = gx_ref[0, 0, :]
    br, bc = _blocks(ph)
    rs, cs = _starts(gy, gx, ph)
    colsel, rowsel = _selectors(gy, gx, rs, cs, br, bc)
    # adjoint of out[j] = sum_{y,x} F[y,x] colsel[x,j] rowsel[y,j]:
    # Fbar[y,x] += sum_j rowsel[y,j] sbar[j] colsel[x,j]
    tmp_re = rowsel * sre_ref[0, 0, :][None, :]         # (BR, T)
    tmp_im = rowsel * sim_ref[0, 0, :][None, :]
    add_re = jax.lax.dot_general(tmp_re, colsel, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    add_im = jax.lax.dot_general(tmp_im, colsel, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    ore_ref[pl.ds(rs, br), pl.ds(cs, bc)] += add_re
    oim_ref[pl.ds(rs, br), pl.ds(cs, bc)] += add_im


@functools.lru_cache(maxsize=16)
def _programs(a_pad, k_pad, ph, interpret):
    nk = k_pad // TILE_K
    grid = (a_pad, nk)
    # positions/samples travel as (A, 1, K) so the block's trailing two dims
    # (1, TILE_K) satisfy the (8, 128) tiling rule via dim equality
    pos_spec = pl.BlockSpec((1, 1, TILE_K), lambda a, t: (a, 0, t),
                            memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((ph, ph), lambda a, t: (0, 0),
                              memory_space=pltpu.VMEM)
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=110 * 1024 * 1024)
    gather = pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[pos_spec, pos_spec, plane_spec, plane_spec],
        out_specs=[pos_spec, pos_spec],
        out_shape=[jax.ShapeDtypeStruct((a_pad, 1, k_pad), jnp.float32)] * 2,
        interpret=interpret,
        compiler_params=params,
    )
    scatter = pl.pallas_call(
        _scatter_kernel,
        grid=grid,
        in_specs=[pos_spec, pos_spec, pos_spec, pos_spec],
        out_specs=[plane_spec, plane_spec],
        out_shape=[jax.ShapeDtypeStruct((ph, ph), jnp.float32)] * 2,
        interpret=interpret,
        compiler_params=params,
    )
    return gather, scatter


def _pad_positions(gy, gx):
    """Pad (A, K) position arrays along k to a TILE_K multiple by repeating
    the final column (keeps padded samples in-block; the adjoint zero-pads
    the cotangent so they contribute nothing)."""
    a, k = gy.shape
    k_pad = -(-k // TILE_K) * TILE_K
    if k_pad != k:
        gy = jnp.concatenate([gy, jnp.tile(gy[:, -1:], (1, k_pad - k))], 1)
        gx = jnp.concatenate([gx, jnp.tile(gx[:, -1:], (1, k_pad - k))], 1)
    return gy, gx


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def sample_lines(fre, fim, gy, gx, interpret=False):
    """Bilinear samples of the (Ph, Ph) planes at float positions (gy, gx),
    shaped (A, K) -> (A, K) re/im parts.  Positions must satisfy
    0 <= floor(g) and floor(g)+1 <= Ph-1 (the caller's halo guarantees it).
    Differentiable in (fre, fim) via the fused scatter adjoint."""
    out, _ = _sample_lines_fwd(fre, fim, gy, gx, interpret)
    return out


def _sample_lines_fwd(fre, fim, gy, gx, interpret):
    a, k = gy.shape
    ph = fre.shape[0]
    gyp, gxp = _pad_positions(gy, gx)
    k_pad = gyp.shape[1]
    gather, _ = _programs(a, k_pad, ph, interpret)
    sre, sim = gather(gyp[:, None, :], gxp[:, None, :], fre, fim)
    return (sre[:, 0, :k], sim[:, 0, :k]), (gyp, gxp, (a, k, ph))


def _sample_lines_bwd(interpret, res, cot):
    gyp, gxp, (a, k, ph) = res
    gre, gim = cot
    k_pad = gyp.shape[1]
    gre = jnp.pad(gre, ((0, 0), (0, k_pad - k)))
    gim = jnp.pad(gim, ((0, 0), (0, k_pad - k)))
    _, scatter = _programs(a, k_pad, ph, interpret)
    fre_bar, fim_bar = scatter(gyp[:, None, :], gxp[:, None, :],
                               gre[:, None, :], gim[:, None, :])
    return fre_bar, fim_bar, jnp.zeros_like(gyp[:, :k]), \
        jnp.zeros_like(gxp[:, :k])


sample_lines.defvjp(_sample_lines_fwd, _sample_lines_bwd)


def sample_lines_xla(fre, fim, gy, gx):
    """XLA gather fallback / correctness oracle (same contract)."""
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    wy = gy - y0
    wx = gx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def bil(f):
        v00 = f[y0, x0]
        v01 = f[y0, x0 + 1]
        v10 = f[y0 + 1, x0]
        v11 = f[y0 + 1, x0 + 1]
        return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
                + wy * ((1 - wx) * v10 + wx * v11))
    return bil(fre), bil(fim)
