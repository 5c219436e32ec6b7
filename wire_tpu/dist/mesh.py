"""Device-mesh construction for coordinate-parallel INR fitting.

The reference is strictly single-GPU (SURVEY.md §2.5); its only batch axes
are coordinates/frames/angles.  The TPU design shards the coordinate axis
over a 1-D 'data' mesh (ICI within a slice, DCN across slices handled by JAX
automatically), replicating the tiny (~100-300K param) network and psum-ing
gradients.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data"):
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
