"""Multi-host execution plumbing (SURVEY.md §7.5).

The framework's parallelism is coordinate-axis data parallelism over a 1-D
mesh; on a pod slice that mesh spans every device of every process, and the
pieces here make that work without any host materializing global data:

- :func:`initialize` — `jax.distributed.initialize` entry, no-op for the
  common single-process case (one chip / CPU tests), so drivers can call it
  unconditionally.
- :func:`make_global_mesh` — mesh over `jax.devices()`, which across
  processes enumerates the full slice (ICI within a host, DCN across —
  JAX routes collectives automatically).
- :func:`feed_rows` — per-host shard feeding via
  `jax.make_array_from_process_local_data`: each process computes ONLY the
  rows its addressable devices own (e.g. `signals.coords.grid_rows` slices
  of a 512^3 = 134M-point grid) and the pieces assemble into one global
  sharded array with no broadcast (SURVEY.md §7 hard part 4).

Determinism across hosts comes from the sharded fitter itself: each device
folds the global seed with its mesh index (dist/fitter.py:86-88), so the
permutation streams are a pure function of (seed, device index) — no
host-0 coordination.  The whole path EXECUTES multi-process in CI:
tests/test_multiprocess.py spawns a real 2-process CPU cluster
(`jax.distributed.initialize` over localhost, Gloo collectives, 4 virtual
devices per process), feeds per-process rows, runs both sharded-fitter
modes, and asserts the trajectories equal the single-process 8-device run.
Real TPU pod slices swap Gloo for ICI/DCN with no code change.
"""
from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, **kw):
    """Join (or skip joining) a multi-process JAX runtime.

    Returns True if `jax.distributed.initialize` was called.  With no
    explicit arguments and no cluster environment (JAX_COORDINATOR_ADDRESS
    / TPU pod metadata consumed by jax.distributed's auto-detection), this
    is a no-op so single-chip and CPU runs need no special-casing.
    """
    explicit = (coordinator_address is not None
                or num_processes not in (None, 0, 1)
                or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not explicit:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)
    return True


def make_global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every process in the runtime."""
    return Mesh(np.array(jax.devices()), (axis,))


def local_row_range(mesh: Mesh, global_n: int, axis: str | None = None):
    """[lo, hi) rows of a row-sharded (global_n, ...) array owned by THIS
    process's addressable devices.  For a 1-D mesh the devices of one
    process own a contiguous range."""
    axis = mesh.axis_names[0] if axis is None else axis
    sharding = NamedSharding(mesh, P(axis))
    idx_map = sharding.addressable_devices_indices_map((global_n,))
    starts, stops = [], []
    for sl, in idx_map.values():
        starts.append(0 if sl.start is None else sl.start)
        stops.append(global_n if sl.stop is None else sl.stop)
    lo, hi = min(starts), max(stops)
    if hi - lo != sum(b - a for a, b in zip(starts, stops)):
        raise ValueError("process-local shards are not contiguous; "
                         "use a process-major 1-D mesh")
    return lo, hi


def feed_rows(mesh: Mesh, row_fn, global_n: int, axis: str | None = None):
    """Build a row-sharded global array, feeding each process only its own
    rows.

    row_fn(lo, hi) -> np.ndarray of shape (hi-lo, ...): called exactly once
    with this process's range.  Returns a global jax.Array sharded over the
    mesh axis — directly consumable by the sharded fitters (their
    device_put with the same sharding is a no-op).
    """
    axis = mesh.axis_names[0] if axis is None else axis
    sharding = NamedSharding(mesh, P(axis))
    lo, hi = local_row_range(mesh, global_n, axis)
    local = np.asarray(row_fn(lo, hi))
    if local.shape[0] != hi - lo:
        raise ValueError(f"row_fn returned {local.shape[0]} rows for range "
                         f"[{lo}, {hi})")
    return jax.make_array_from_process_local_data(
        sharding, local, (global_n,) + local.shape[1:])
