"""3D occupancy fitting driver — the rebuild of wire_occupancy.py: fit an
INR to a binary occupancy volume, report IoU per epoch, export a marching-
cubes mesh of the best reconstruction.

Loop semantics (wire_occupancy.py:107-201): 3 hidden layers, 300 wide,
batches of 2e5 random voxels per epoch over the full permutation, 0.2-decay
schedule, per-epoch thresholded IoU, best tracked by train loss, final .dae
export (smoothened marching cubes).

This is the scale driver (SURVEY.md §3.4): at 512^3 the coordinate set is
~134M points — pass ``mesh`` to shard it over devices.
"""
from __future__ import annotations

import argparse
import functools
import os

import numpy as np
import jax

from wire_tpu.nn import get_inr
from wire_tpu.signals import coords as C, image as I, volume as V
from wire_tpu.train import artifacts as A, metrics as M
from wire_tpu.train.trainer import FitConfig, fit_pointwise


_LR = {"wire": 5e-3, "siren": 2e-3, "mfn": 5e-2, "relu": 1e-3,
       "posenc": 1e-3, "gauss": 2e-3}


@functools.lru_cache(maxsize=None)
def _iou_sums(thres):
    """Per-shard thresholded intersection/union counts for the sharded
    fitter's psum'd epoch metrics (volutils.get_I_and_U semantics, without
    the in-place mutation).  lru_cached so the closure identity is stable
    across fits (it keys the dist program cache)."""
    import jax.numpy as jnp

    def sums(rec_local, tgt_local):
        p = jnp.where(rec_local >= thres, 1.0, 0.0)
        inter = jnp.sum(jnp.logical_and(p != 0, tgt_local != 0)
                        .astype(jnp.float32))
        union = jnp.sum(jnp.logical_or(p != 0, tgt_local != 0)
                        .astype(jnp.float32))
        return inter, union

    return sums


@functools.lru_cache(maxsize=None)
def _iou_metric(thres):
    """Two-arg per-epoch IoU for fit_pointwise's epoch_metric: (rec,
    target) both arrive as program arguments.  lru_cached for a stable
    closure identity (keys the trainer program cache)."""

    def metric(rec, tgt):
        return M.iou(rec, tgt, thres)

    return metric


def run(nonlin="wire", *, volume_mat=None, results_dir="results", seed=0,
        niters=200, size=64, scale=1.0, maxpoints=int(2e5),
        hidden_layers=3, hidden_features=300, mcubes_thres=0.5, mesh=None,
        scan_segment=None, checkpoint_path=None, checkpoint_every=1,
        lr_decay=0.2, block_perm=0):
    A.log(f"Running {nonlin} occupancy")
    if volume_mat:
        im = V.load_volume_mat(volume_mat, scale=scale)
    else:
        im = I.synthetic_volume(size, seed=seed)
    H, W, T = im.shape
    A.log(f"volume shape {im.shape}")
    npoints = H * W * T
    maxpoints = min(npoints, maxpoints)

    # per-nonlin hyperparameters (wire_occupancy.py:85-97)
    omega0, sigma0 = 10.0, 40.0
    if nonlin == "wire":
        omega0, sigma0 = 20.0, 10.0
    elif nonlin == "siren":
        omega0 = 40.0
    elif nonlin == "gauss":
        sigma0 = 30.0
    pos_encode = False
    model_nonlin = nonlin
    if nonlin == "posenc":
        model_nonlin, pos_encode = "relu", True

    if mesh is not None:
        # per-host shard feeding: each process computes only the coordinate
        # rows its devices own — no host materializes the full grid
        # (dist/multihost.py; 512^3 = 134M points, wire_occupancy.py:72)
        from wire_tpu.dist import multihost as MH
        flat = im.reshape(-1, 1)
        coords = MH.feed_rows(
            mesh, lambda lo, hi: C.grid_rows(H, W, T, lo, hi), npoints)
        target = MH.feed_rows(mesh, lambda lo, hi: flat[lo:hi], npoints)
    else:
        # implicit grid: chunk coords are computed on device from permuted
        # indices — no (H*W*T, 3) table in HBM (1.6 GB at 512^3) and no
        # per-chunk random gather of it (signals.coords.GridSpec)
        coords = C.GridSpec(H, W, T)
        target = im.reshape(-1, 1)
    model = get_inr(model_nonlin, in_features=3, out_features=1,
                    hidden_features=hidden_features,
                    hidden_layers=hidden_layers, first_omega0=omega0,
                    hidden_omega0=omega0, scale=sigma0,
                    pos_encode=pos_encode, sidelength=max(H, W, T))
    params = model.init(jax.random.key(seed))
    nparams = model.num_params(params)

    # lr_decay=0.2 is the reference schedule (wire_occupancy.py:122);
    # at 512^3 the long high-LR phase caps IoU at ~0.986 and lr_decay=0.008
    # reaches 0.9965 (PERF.md round 3, tools/run_occ512_tuned.py)
    # block_perm=512: permute contiguous 512-point blocks instead of
    # points — 1.9x end-to-end at IoU parity on the volume protocol
    # (results_tpu_r5/occupancy/blockperm_256.json; composition deviation
    # documented on FitConfig).  Off by default for reference composition.
    fit_cfg = FitConfig(learning_rate=_LR.get(nonlin, 5e-3), niters=niters,
                        maxpoints=maxpoints, lr_decay=lr_decay, seed=seed,
                        block_perm=block_perm)
    if scan_segment is not None:
        # big volumes: keep each device program under the remote-backend
        # execution deadline (~1s/epoch at 256^3)
        import dataclasses
        fit_cfg = dataclasses.replace(fit_cfg, scan_segment=scan_segment)
    ckpt = None
    if checkpoint_path:
        from wire_tpu.train.trainer import CheckpointSpec
        # at 512^3 each save round-trips the ~0.5 GB rec buffers through
        # the tunnel: space saves out for big volumes via checkpoint_every
        ckpt = CheckpointSpec(path=checkpoint_path, every=checkpoint_every)
    # target stays a HOST array here: the fitter makes the single device
    # transfer itself, the epoch metric receives it as a program ARGUMENT
    # (a closure over a 0.5 GB device array would embed it as a
    # compile-time constant and blow the tunnel's compile-request cap,
    # HTTP 413), and the checkpoint fingerprint can digest its CONTENT
    # (device arrays are digested by shape only).

    if mesh is not None:
        from wire_tpu.dist import fit_pointwise_sharded
        # per-epoch IoU survives the mesh: each device contributes its
        # shard's thresholded intersection/union counts, psum'd in-program
        # (the reference reports IoU per epoch, wire_occupancy.py:160-163)
        res = fit_pointwise_sharded(model, params, coords, target, fit_cfg,
                                    mesh, track="noisy",
                                    epoch_sums=_iou_sums(mcubes_thres))
        inter, union = res.time_array
        iou_hist = np.asarray(inter, np.float64) / np.maximum(
            np.asarray(union, np.float64), 1.0)
    else:
        res = fit_pointwise(model, params, coords, target, fit_cfg,
                            track="noisy",
                            epoch_metric=_iou_metric(mcubes_thres),
                            checkpoint=ckpt)
        iou_hist = res.time_array

    best = res.best_rec.reshape(H, W, T)
    # final metrics in numpy: on tunneled backends every distinct eager
    # device op costs a remote-compile round trip (CLAUDE.md), and these
    # reductions are host-cheap even at 512^3
    bt = np.where(best >= mcubes_thres, 1.0, 0.0)
    inter = np.count_nonzero(np.logical_and(bt != 0, im != 0))
    union = np.count_nonzero(np.logical_or(bt != 0, im != 0))
    best_iou = inter / max(union, 1)
    psnr = float(10.0 * np.log10(im.max()
                                 / np.mean((im - best) ** 2)))
    A.log(f"IoU: {best_iou}")
    A.log(f"Best PSNR: {psnr} dB")
    A.log(f"Total parameters: {nparams / 1e6} million")

    outdir = os.path.join(results_dir, "occupancy")
    os.makedirs(outdir, exist_ok=True)
    A.save_mat(os.path.join(outdir, f"{nonlin}.mat"), {
        "mse_array": res.mse_noisy,
        "iou_array": np.asarray(iou_hist),
        "nparams": nparams,
        "Best PSNR": psnr,
        "Best IoU": best_iou,
        "Total time": res.wall_time_s / 60,
    })
    mesh_path = os.path.join(outdir, f"{nonlin}.dae")
    V.march_and_save(best, mcubes_thres, mesh_path, smoothen=True)
    return {"iou": best_iou, "psnr": psnr, "mesh": mesh_path, "result": res}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nonlin", default="wire")
    p.add_argument("--volume_mat", default=None)
    p.add_argument("--results_dir", default="results")
    p.add_argument("--niters", type=int, default=200)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", type=int, default=0)
    p.add_argument("--lr_decay", type=float, default=0.2,
                   help="LR decay factor over niters (reference: 0.2; "
                        "0.008 sharpens large-volume boundaries, PERF.md)")
    p.add_argument("--block_perm", type=int, default=0,
                   help="permute contiguous N-point blocks instead of "
                        "points (512 recommended: ~1.9x at IoU parity; "
                        "0 = reference per-point composition)")
    a = p.parse_args(argv)
    from wire_tpu.apps.common import mesh_from_arg
    run(a.nonlin, volume_mat=a.volume_mat, results_dir=a.results_dir,
        niters=a.niters, size=a.size, seed=a.seed,
        mesh=mesh_from_arg(a.mesh), lr_decay=a.lr_decay,
        block_perm=a.block_perm)


if __name__ == "__main__":
    main()
