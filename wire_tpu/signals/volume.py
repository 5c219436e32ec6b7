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


def jitter_volume(volume, max_shift, rng=None):
    """Uniformly jitter the sample positions of a binary volume via
    nearest-neighbor resampling at perturbed coordinates, then re-binarize
    (volutils.add_noise, volutils.py:16-53)."""
    from scipy.interpolate import RegularGridInterpolator as rgi
    rng = np.random if rng is None else rng
    H, W, T = volume.shape
    x = np.linspace(-1, 1, H)
    y = np.linspace(-1, 1, W)
    z = np.linspace(-1, 1, T)
    X, Y, Z = np.meshgrid(x, y, z)
    Xn = np.clip(X + (2 * rng.rand(H, W, T) - 1) * max_shift / H, -1, 1)
    Yn = np.clip(Y + (2 * rng.rand(H, W, T) - 1) * max_shift / W, -1, 1)
    Zn = np.clip(Z + (2 * rng.rand(H, W, T) - 1) * max_shift / T, -1, 1)
    func = rgi((x, y, z), volume, method="nearest")
    coords = np.stack([Xn.ravel(), Yn.ravel(), Zn.ravel()], axis=-1)
    noisy = func(coords).reshape(H, W, T).astype(np.float32)
    noisy = np.transpose(noisy, [1, 0, 2])
    return (noisy > 0.5).astype(np.float32)


def iou_batched(preds, gt, thres=None, maxpoints=2 ** 24):
    """Chunked IoU for volumes too large for one reduction
    (volutils.get_IoU_batch, volutils.py:56-72) — non-mutating."""
    from wire_tpu.train import metrics as M
    import jax.numpy as jnp
    preds = np.asarray(preds).ravel()
    gt = np.asarray(gt).ravel()
    inter = 0
    union = 0
    for b in range(0, preds.size, maxpoints):
        p = preds[b:b + maxpoints]
        g = gt[b:b + maxpoints]
        if thres is not None:
            p = (p >= thres).astype(np.float32)
        inter += np.logical_and(p != 0, g != 0).sum()
        union += np.logical_or(p != 0, g != 0).sum()
    return inter / union


def occupancy_cube_from_coords(coords, preds, sidelength, cube_res,
                               display_occupancy=None):
    """Scatter predicted occupancies into a dense cube by voxel index
    (volutils.get_occupancy_cube, volutils.py:385-411)."""
    coords = np.asarray(coords).reshape(-1, 3)
    voxel_idx = np.floor((coords + 1.0) / 2.0 * sidelength).astype(np.int32)
    voxel_idx = np.clip(voxel_idx, 0, cube_res - 1)
    if display_occupancy is None:
        display_occupancy = -np.ones((cube_res, cube_res, cube_res),
                                     np.float32)
    else:
        display_occupancy[...] = -1
    p = np.asarray(preds).reshape(-1)
    display_occupancy[voxel_idx[:, 0], voxel_idx[:, 1], voxel_idx[:, 2]] = p
    return display_occupancy


def unfold_blocks(blocks, true_n):
    """Inverse of block_partition: (nblocks, npts, d) -> (true_n, d)."""
    flat = np.asarray(blocks).reshape(-1, blocks.shape[-1])
    return flat[:true_n]


def downsample_blocks(blocks, factor):
    """Keep every ``factor``-th point per block (BlockPCDDataset.downsample
    role, volutils.py:330-360)."""
    return np.asarray(blocks)[:, ::factor, :]


def get_query_coords(minlim, maxlim, cube_res, npoints_per_block):
    """Regular query grid for blockwise implicit-model probing, folded into
    (nblocks, npts, 3) chunks (volutils.get_query_coords, volutils.py:145-159)."""
    x = np.linspace(minlim[0], maxlim[0], cube_res)
    y = np.linspace(minlim[1], maxlim[1], cube_res)
    z = np.linspace(minlim[2], maxlim[2], cube_res)
    X, Y, Z = np.meshgrid(x, y, z)
    coords = np.stack([X.ravel(), Y.ravel(), Z.ravel()],
                      axis=-1).astype(np.float32)
    return block_partition(coords, npoints_per_block)


def cuboid_data(origin, size=(1, 1, 1)):
    """Face meshes of an axis-aligned cuboid for matplotlib surface plots
    (volutils.cuboid_data, volutils.py:441-464)."""
    o = origin
    l, w, h = size
    eps = 0.01
    l, w, h = l - eps, w - eps, h - eps
    x = [[o[0], o[0] + l, o[0] + l, o[0], o[0]]] * 4
    y = [[o[1], o[1], o[1] + w, o[1] + w, o[1]],
         [o[1], o[1], o[1] + w, o[1] + w, o[1]],
         [o[1], o[1], o[1], o[1], o[1]],
         [o[1] + w, o[1] + w, o[1] + w, o[1] + w, o[1] + w]]
    z = [[o[2]] * 5,
         [o[2] + h] * 5,
         [o[2], o[2], o[2] + h, o[2] + h, o[2]],
         [o[2], o[2], o[2] + h, o[2] + h, o[2]]]
    return np.array(x), np.array(y), np.array(z)


def plot_cube_at(pos=(0, 0, 0), size=(1, 1, 1), color="b", edgecolor="k",
                 alpha=1.0, ax=None, **kwargs):
    """Render one cuboid on a 3D matplotlib axis (volutils.plotCubeAt,
    volutils.py:467-487)."""
    if ax is None:
        return
    X, Y, Z = cuboid_data(pos, size)
    ax.plot_surface(X, Y, Z, color=color, rstride=1, cstride=1, alpha=alpha,
                    edgecolors=edgecolor, linewidth=0.1, **kwargs)
