"""Coordinate grids in [-1, 1].

Matches the reference's layouts exactly:
- 2D (utils.py:163-176 / script-local meshgrids, e.g.
  bspline_image_denoise.py:71-76): ``X, Y = meshgrid(linspace(W), linspace(H))``
  with 'xy' indexing, flattened row-major and stacked (x, y) — x varies
  fastest along W.
- 3D (utils.py:168-175): ``np.meshgrid(x_W, y_H, z_T)`` default 'xy' indexing,
  giving (H, W, T)-shaped grids.
"""
from __future__ import annotations

import dataclasses as _dataclasses

import numpy as np
import jax.numpy as jnp


def grid2d(H, W, dtype=np.float32):
    """(H*W, 2) coords, x fastest, matching utils.get_coords 2D."""
    x = np.linspace(-1, 1, W, dtype=dtype)
    y = np.linspace(-1, 1, H, dtype=dtype)
    X, Y = np.meshgrid(x, y)
    return np.stack([X.ravel(), Y.ravel()], axis=-1)


def grid3d(H, W, T, dtype=np.float32):
    """(H*W*T, 3) coords matching utils.get_coords 3D (utils.py:171-175):
    ``np.meshgrid(linspace(W), linspace(H), linspace(T))`` 'xy' indexing,
    output shape (H, W, T), so x samples the W axis and y the H axis —
    also for non-cubic volumes (ADVICE r2: an earlier version swapped the
    x/y sample counts, identical only for H == W)."""
    x = np.linspace(-1, 1, W, dtype=dtype)
    y = np.linspace(-1, 1, H, dtype=dtype)
    z = np.linspace(-1, 1, T, dtype=dtype)
    X, Y, Z = np.meshgrid(x, y, z)
    return np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)


def get_coords(H, W, T=None, dtype=np.float32):
    """utils.get_coords-compatible entry point."""
    if T is None:
        return grid2d(H, W, dtype)
    return grid3d(H, W, T, dtype)


def grid_rows(H, W, T, lo, hi, dtype=np.float32):
    """Rows [lo, hi) of ``grid3d(H, W, T)`` computed directly from flat
    indices — the per-host feeding primitive for multi-host fits: no host
    ever materializes the full 134M-point coordinate array
    (wire_occupancy.py:72 at 512^3; SURVEY.md §7 hard part 4).

    grid3d uses np.meshgrid(x_W, y_H, z_T) with 'xy' indexing, whose output
    shape is (H, W, T): flat index n = i*(W*T) + j*T + k with coords
    (x_W[j], y_H[i], z_T[k]).
    """
    n = np.arange(lo, hi, dtype=np.int64)
    x = np.linspace(-1, 1, W, dtype=dtype)
    y = np.linspace(-1, 1, H, dtype=dtype)
    z = np.linspace(-1, 1, T, dtype=dtype)
    i = n // (W * T)
    j = (n // T) % W
    k = n % T
    return np.stack([x[j], y[i], z[k]], axis=-1)


@_dataclasses.dataclass(frozen=True)
class GridSpec:
    """Implicit coordinate grid: the (npoints, d) array of ``get_coords``
    described by its shape only, with rows computed ON DEVICE from flat
    indices (integer div/mod + multiply — pure VPU arithmetic).

    Why: the chunked fitting protocol gathers ``coords[perm_chunk]`` every
    chunk; at the occupancy scale (512^3 = 134M rows, wire_occupancy.py:72)
    that is a 1.6 GB HBM-resident table and ~200 MB/epoch of random-access
    gather traffic — and TPU random gathers are slow.  A grid row is a
    closed-form function of its index, so passing ``GridSpec`` to
    ``fit_pointwise`` instead of the materialized array deletes both.

    Row values match ``get_coords`` to f32 rounding — host linspace
    multiplies in f64 then casts while on-device arithmetic is f32, so
    interior values can differ by a few ulp at the [-1, 1] scale
    (endpoints exact by construction); tests pin max |delta| <= 2 ulp(1.0)
    (test_signals_ops.py::test_gridspec_rows_ulp_bound).
    """
    H: int
    W: int
    T: int | None = None

    @property
    def npoints(self):
        return self.H * self.W * (self.T or 1)

    @property
    def in_features(self):
        return 2 if self.T is None else 3

    @property
    def shape(self):
        return (self.npoints, self.in_features)

    def rows(self, idx):
        """(n,) int array (traced ok) -> (n, d) coordinate rows."""
        idx = jnp.asarray(idx)

        def axis(j, num):
            # linspace(-1, 1, num)[j] with exact endpoints; a size-1 axis
            # is [-1.0] (np.linspace convention), not +1
            step = jnp.float32(2.0 / max(num - 1, 1))
            v = jnp.float32(-1.0) + j.astype(jnp.float32) * step
            if num == 1:
                return jnp.full_like(v, -1.0)
            return jnp.where(j == num - 1, jnp.float32(1.0), v)

        if self.T is None:
            # grid2d: n = r*W + c -> (x[c], y[r])
            r = idx // self.W
            c = idx % self.W
            return jnp.stack([axis(c, self.W), axis(r, self.H)], axis=-1)
        # grid3d ('xy' meshgrid, see grid_rows): n = i*(W*T) + j*T + k
        # -> (x_W[j], y_H[i], z_T[k])
        H, W, T = self.H, self.W, self.T
        i = idx // (W * T)
        j = (idx // T) % W
        k = idx % T
        return jnp.stack([axis(j, W), axis(i, H), axis(k, T)], axis=-1)

    def materialize(self):
        """The full host-side array (= get_coords(H, W, T))."""
        return get_coords(self.H, self.W, self.T)


def jgrid2d(H, W, dtype=jnp.float32):
    """On-device 2D grid (same layout as grid2d)."""
    x = jnp.linspace(-1, 1, W, dtype=dtype)
    y = jnp.linspace(-1, 1, H, dtype=dtype)
    X, Y = jnp.meshgrid(x, y)
    return jnp.stack([X.ravel(), Y.ravel()], axis=-1)
