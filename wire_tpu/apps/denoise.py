"""Image denoising / representation driver — the rebuild of
bspline_image_denoise.py (and bspline_img_representation.py via
--task representation): fit an INR to a noisy image, track best-vs-clean,
write the reference's artifact set.

Loop semantics (bspline_image_denoise.py:61-193): image ÷2 INTER_AREA,
photon+readout noise, per-epoch permutation batches of maxpoints, Adam with
LR scaled by min(1, maxpoints/npoints) and 0.1^(t/niters) decay per epoch,
best image by MSE vs clean GT.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import jax

from wire_tpu.signals import coords as C, image as I, noise as N
from wire_tpu.train import artifacts as A, metrics as M
from wire_tpu.train.presets import get_config
from wire_tpu.train.trainer import FitConfig, fit_pointwise
from wire_tpu.apps import common


def run(config_name, *, image=None, results_dir="results",
        task="denoise", seed=0, reference_compat=False, mesh=None):
    cfg = get_config(config_name)
    A.log(f"Starting image {task} experiment ({config_name})")

    omega0 = cfg.omega0 if cfg.omega0 is not None else 7.0
    im = common.load_image(image, channels=3, seed=seed)
    im = I.resize_area(im, 0.5)  # ÷2 (bspline_image_denoise.py:65)
    H, W, _ = im.shape
    rng = np.random.RandomState(seed)
    im_noisy = N.measure_np(im, cfg.noise_snr, cfg.tau, rng=rng).astype(
        np.float32)

    coords = C.grid2d(H, W)
    gt = im.reshape(-1, 3)
    gt_noisy = im_noisy.reshape(-1, 3)

    model = common.build_model(cfg, in_features=2, out_features=3,
                               omega0=omega0, sidelength=H,
                               reference_compat=reference_compat)
    params = model.init(jax.random.key(seed))
    nparams = model.num_params(params)
    A.log(f"Non-linearity: {cfg.nonlin}, LR: {cfg.learning_rate}, "
          f"Scale: {cfg.scale}, params: {nparams}")

    fit_cfg = FitConfig(learning_rate=cfg.learning_rate, niters=cfg.niters,
                        maxpoints=cfg.maxpoints, scale_lr_by_batch=True,
                        seed=seed)
    tvw = cfg.lambda_tv if cfg.tvl else 0.0
    if mesh is not None:
        from wire_tpu.dist import fit_pointwise_sharded
        res = fit_pointwise_sharded(model, params, coords, gt_noisy,
                                    fit_cfg, mesh, gt=gt, track="gt")
    else:
        res = fit_pointwise(model, params, coords, gt_noisy, fit_cfg, gt=gt,
                            track="gt", tv_weight=tvw, image_shape=(H, W, 3))

    best_img = res.best_rec.reshape(H, W, 3)
    psnr = float(M.psnr_ref(im, best_img))
    A.log(f"Best PSNR for {cfg.nonlin}: {psnr}")

    task_dir = os.path.join(task, f"T{cfg.tau}_SNR{cfg.noise_snr}")
    mdict = {
        "Scale": cfg.scale,
        "Learning rate": np.asarray(cfg.learning_rate),
        "rec": best_img,
        "gt": im,
        "im_noisy": im_noisy,
        "mse_noisy_array": res.mse_noisy,
        "mse_array": res.mse_gt,
        "time_array": np.full_like(res.mse_gt, res.wall_time_s),
    }
    metrics = {
        "Scale": cfg.scale,
        "Scale tensor": np.asarray(cfg.scale_tensor),
        "Tau": cfg.tau,
        "Noise SNR": cfg.noise_snr,
        "Learning Rate": np.asarray(cfg.learning_rate),
        "Number of parameters": nparams,
        "Best PSNR": psnr,
    }
    path = common.write_run_artifacts(results_dir, task_dir, cfg.name,
                                      mdict, metrics)
    A.log(f"Image {task} experiment completed -> {path}")
    return {"psnr": psnr, "path": path, "result": res}


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--task", default="denoise",
                   choices=["denoise", "representation"])
    a = p.parse_args(argv)
    run(a.config_name, image=a.image, results_dir=a.results_dir,
        task=a.task, seed=a.seed, reference_compat=a.reference_compat)


if __name__ == "__main__":
    main()
