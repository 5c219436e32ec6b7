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


class BlockPointCloud:
    """Chunked spatial representation of a 3D point cloud — the
    BlockPCDDataset role (volutils.py:162-382), vectorized.

    Each axis of the point cloud's bounding box is divided into 2^depth
    cells; points are bucketed by cell.  The folded form is a static-shape
    (ncells, npoints, 3) array — the natural unit for blockwise INR
    evaluation and for sharding volumes across a device mesh.  The reference
    builds this with per-point Python loops and dict-of-lists chunks
    (volutils.py:222-229); here bucketing is one argsort and all per-cell
    operations are vectorized, so 100M-point clouds are practical.

    sdf: optional (N, 1) values carried alongside the points (default 1,
    volutils.py:179-182).  "Occupied" cells are those holding >=1 point
    (the reference's prune(), volutils.py:233-234).
    """

    def __init__(self, xyz, sdf=None, depth=4):
        xyz = np.asarray(xyz, np.float32)
        self.xyz = xyz
        self.depth = int(depth)
        self.sdf = (np.ones((xyz.shape[0], 1), np.float32) if sdf is None
                    else np.asarray(sdf, np.float32).reshape(-1, 1))
        self.minvals = xyz.min(0)
        self.maxvals = xyz.max(0) + 1e-6
        self._build()

    # -- construction ------------------------------------------------------
    def _build(self):
        nb = 2 ** self.depth
        self.nblocks = nb
        delta = (self.maxvals - self.minvals) / nb
        self.delta = delta
        cell = np.floor((self.xyz - self.minvals) / delta).astype(np.int64)
        cell = np.clip(cell, 0, nb - 1)
        # cell index ordering matches the reference's mgrid hstack
        # (volutils.py:214-224): idx = x*nb^2 + y*nb + z
        flat = (cell[:, 0] * nb + cell[:, 1]) * nb + cell[:, 2]
        order = np.argsort(flat, kind="stable")
        self._order = order
        self._sorted_xyz = self.xyz[order]
        self._sorted_sdf = self.sdf[order]
        self.counts = np.bincount(flat, minlength=nb ** 3)
        self._starts = np.concatenate([[0], np.cumsum(self.counts)[:-1]])
        self.occupied = self.counts > 0
        # per-cell sampling limits (volutils.py:218-219)
        idx = np.arange(nb ** 3)
        all_idx = np.stack([idx // (nb * nb), (idx // nb) % nb, idx % nb],
                           axis=-1)
        self.minlim = (all_idx * delta + self.minvals).astype(np.float32)
        self.maxlim = ((all_idx + 1) * delta + self.minvals).astype(
            np.float32)

    # -- reference-API queries --------------------------------------------
    def maxpoints(self):
        return int(self.counts.max())

    def minpoints(self, occupied_only=False):
        c = self.counts[self.occupied] if occupied_only else self.counts
        return int(c.min()) if c.size else 0

    def nchunks(self, occupied_only=True):
        return int(self.occupied.sum()) if occupied_only else self.nblocks ** 3

    def flatten(self):
        """All points concatenated in cell order (volutils.py:248-261)."""
        return self._sorted_xyz.copy()

    # -- fold / fill -------------------------------------------------------
    def fill(self, rng=None, occupied_only=False):
        """Folded (ncells, maxpoints, 3) + (ncells, maxpoints, 1) arrays with
        every cell padded to ``maxpoints()`` by uniform-random points inside
        the cell carrying sdf=0 (fill + fold, volutils.py:263-326).  The
        reference mutates dict-of-lists; here the fold is built directly."""
        rng = np.random if rng is None else rng
        mp = self.maxpoints()
        nc = self.nblocks ** 3
        xyz = rng.rand(nc, mp, 3).astype(np.float32)
        xyz = self.minlim[:, None, :] + self.delta[None, None, :] * xyz
        sdf = np.zeros((nc, mp, 1), np.float32)
        slot = np.arange(mp)[None, :]
        has = slot < self.counts[:, None]                   # (nc, mp)
        src = np.clip(self._starts[:, None] + slot, 0,
                      max(len(self._sorted_xyz) - 1, 0))
        if len(self._sorted_xyz):
            xyz[has] = self._sorted_xyz[src[has]]
            sdf[has] = self._sorted_sdf[src[has]]
        if occupied_only:
            return xyz[self.occupied], sdf[self.occupied]
        return xyz, sdf

    def fold(self, occupied_only=False):
        """(ncells, npoints, 3)/(ncells, npoints, 1) when every folded cell
        holds the same number of points (volutils.py:299-326 — 'call fill()
        before folding'); uniform grids satisfy this by construction."""
        counts = self.counts[self.occupied] if occupied_only else self.counts
        if counts.size and (counts != counts[0]).any():
            raise ValueError(
                "fold() needs uniform per-cell counts; use fill()")
        return self.fill(occupied_only=occupied_only)

    def refill(self, folded_xyz, folded_sdf, key):
        """Functionally resample coordinates whose sdf is zero to fresh
        uniform positions inside their cell (volutils.py:287-297) — a jittable
        update for on-device importance refresh between epochs."""
        import jax
        import jax.numpy as jnp
        u = jax.random.uniform(key, folded_xyz.shape)
        newpts = (jnp.asarray(self.minlim)[:, None, :]
                  + jnp.asarray(self.delta)[None, None, :] * u)
        return folded_sdf * folded_xyz + (1.0 - folded_sdf) * newpts

    def unfold(self, sdfs, cubesize):
        """Reassemble per-cell value grids into a dense cube
        (volutils.py:328-354, including its per-block and final transposes),
        as one reshape/transpose instead of a per-key loop."""
        nb = self.nblocks
        bs = cubesize // nb
        blocks = np.asarray(sdfs).reshape(nb, nb, nb, bs, bs, bs)
        blocks = np.transpose(blocks, (0, 1, 2, 4, 3, 5))   # per-block [1,0,2]
        cube = np.transpose(blocks, (0, 3, 1, 4, 2, 5)).reshape(
            cubesize, cubesize, cubesize)
        return np.transpose(cube, (1, 0, 2))                # final transpose

    def downsample(self, ndepths=1, targetdepth=None):
        """Collapse each occupied cell to its centroid, then re-bucket at a
        shallower depth (volutils.py:356-382).  Returns a new
        BlockPointCloud."""
        if ndepths == 0 and targetdepth is None:
            return self
        pts = self.xyz
        depth = self.depth
        for i in range(ndepths):
            bpc = BlockPointCloud(pts, depth=depth)
            sums = np.zeros((bpc.nblocks ** 3, 3), np.float64)
            nb = bpc.nblocks
            cell = np.clip(np.floor((pts - bpc.minvals) / bpc.delta), 0,
                           nb - 1).astype(np.int64)
            flat = (cell[:, 0] * nb + cell[:, 1]) * nb + cell[:, 2]
            np.add.at(sums, flat, pts)
            occ = bpc.counts > 0
            pts = (sums[occ] / bpc.counts[occ][:, None]).astype(np.float32)
            depth -= 1
        return BlockPointCloud(
            pts, depth=depth if targetdepth is None else targetdepth)


def block_query_coords(minlim, maxlim, cube_res, depth):
    """Regular query grid folded into spatial blocks for blockwise implicit
    probing — the reference's get_query_coords (volutils.py:145-159): builds
    the xy-indexed meshgrid, buckets it at 2^depth per axis, and returns the
    folded chunks plus the container (for unfold())."""
    x = np.linspace(minlim[0], maxlim[0], cube_res)
    y = np.linspace(minlim[1], maxlim[1], cube_res)
    z = np.linspace(minlim[2], maxlim[2], cube_res)
    X, Y, Z = np.meshgrid(x, y, z)
    coords = np.stack([X.ravel(), Y.ravel(), Z.ravel()],
                      axis=-1).astype(np.float32)
    ds = BlockPointCloud(coords, depth=depth)
    chunks, _ = ds.fold()
    return chunks, ds


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
