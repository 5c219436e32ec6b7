"""3D occupancy / volume utilities — the rebuild of modules/volutils.py.

- ``march_and_save``: occupancy -> mesh via the C++ marching cubes
  (volutils.py:413-438), with the reference's optional binarize+Gaussian
  smoothing step (mcubes.smooth equivalent: filter the ±0.5-shifted binary
  volume and extract the 0 level set).
- ``export_mesh``: batched INR probing over a query cube then marching cubes
  (volutils.py:94-142).
- ``block_partition``: fold a point set into (nchunks, npoints, 3) blocks —
  the BlockPCDDataset role (volutils.py:162-382), the natural unit for
  sharding large volumes across hosts.
- ``load_volume_mat`` + bbox crop (wire_occupancy.py:53-62 semantics).

IoU lives in wire_tpu.train.metrics (non-mutating, SURVEY.md §2.6).
"""
from __future__ import annotations

import numpy as np


def march_and_save(occupancy, mcubes_thres, savename, smoothen=False):
    from wire_tpu import native
    occ = np.asarray(occupancy, np.float32)
    if smoothen:
        from scipy import ndimage
        binary = (occ >= mcubes_thres).astype(np.float32)
        occ = ndimage.gaussian_filter(binary - 0.5, sigma=1.0)
        mcubes_thres = 0.0
    verts, faces = native.marching_cubes(occ, mcubes_thres)
    native.export_mesh(verts, faces, savename)
    return verts, faces


def export_mesh_from_model(model, params, cube_res, batchsize, savename,
                           thres=0.005, sigmoid=True):
    """Probe an INR over a cube_res^3 grid in batches and export the
    iso-surface (volutils.py:94-142)."""
    import jax
    import jax.numpy as jnp
    from wire_tpu.signals.coords import grid3d

    coords = grid3d(cube_res, cube_res, cube_res)
    occ = np.zeros((cube_res ** 3,), np.float32)
    apply_fn = jax.jit(model.apply)
    for b in range(0, coords.shape[0], batchsize):
        out = apply_fn(params, jnp.asarray(coords[b:b + batchsize]))
        if sigmoid:
            out = jax.nn.sigmoid(out)
        occ[b:b + batchsize] = np.asarray(out).ravel()
    occ = occ.reshape(cube_res, cube_res, cube_res)
    march_and_save(occ, thres, savename)
    return occ


def block_partition(points, npoints_per_block):
    """Fold (N, 3) points into (nblocks, npoints_per_block, 3), padding the
    tail by repeating the final point (fold semantics of BlockPCDDataset,
    volutils.py:299-326)."""
    pts = np.asarray(points)
    n = pts.shape[0]
    nblocks = (n + npoints_per_block - 1) // npoints_per_block
    pad = nblocks * npoints_per_block - n
    if pad:
        pts = np.concatenate([pts, np.repeat(pts[-1:], pad, 0)], 0)
    return pts.reshape(nblocks, npoints_per_block, pts.shape[-1]), n


def load_volume_mat(path, key="hypercube", scale=1.0, crop_occupancy=True):
    """Load a volume from .mat, zoom, and crop to the tightest bounding box
    of >0.99 voxels (wire_occupancy.py:53-62)."""
    from scipy import io, ndimage
    im = io.loadmat(path)[key].astype(np.float32)
    im = im / im.max()
    if scale != 1.0:
        im = ndimage.zoom(im, [scale, scale, scale], order=0)
    if crop_occupancy:
        im = bbox_crop(im)
    return im


def bbox_crop(vol, thresh=0.99):
    hidx, widx, tidx = np.where(vol > thresh)
    return vol[hidx.min():hidx.max(), widx.min():widx.max(),
               tidx.min():tidx.max()]
