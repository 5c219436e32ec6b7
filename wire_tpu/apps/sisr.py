"""Single-image super-resolution driver — the rebuild of bspline_SISR.py:
fit an INR whose box-downsampled render matches the LR image.

Loop semantics (bspline_SISR.py:44-205): image ÷3, crop to a multiple of the
downscale, LR by INTER_AREA (optionally noised), loss =
MSE(AvgPool2d(render_HR), LR), LambdaLR 0.2^(t/niters), best by HR MSE vs GT,
reports -10*log10(best MSE) and SSIM.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from wire_tpu.operators.forward import DownsampleOp, sisr_op
from wire_tpu.signals import coords as C, image as I, noise as N
from wire_tpu.train import artifacts as A, metrics as M
from wire_tpu.train.presets import get_config
from wire_tpu.train.trainer import FitConfig, fit_operator
from wire_tpu.apps import common


def run(config_name, *, image=None, results_dir="results", seed=0,
        reference_compat=False, mesh=None):
    cfg = get_config(config_name)
    A.log(f"Starting SISR experiment ({config_name})")
    scale = cfg.down_scale or 4
    omega0 = cfg.omega0 if cfg.omega0 is not None else 8.0

    im = common.load_image(image, channels=3, seed=seed)
    im = I.resize_area(im, 1 / 3)  # bspline_SISR.py:72-77
    H, W, _ = im.shape
    im = im[:scale * (H // scale), :scale * (W // scale), :]
    H, W, _ = im.shape
    im_lr = I.resize_area(im, 1 / scale)
    rng = np.random.RandomState(seed)
    if cfg.added_noise:
        im_lr = N.measure_np(im_lr, cfg.noise_snr, cfg.tau,
                             rng=rng).astype(np.float32)
    im_bi = I.resize_linear(im_lr, scale)

    coords = C.grid2d(H, W)
    model = common.build_model(cfg, in_features=2, out_features=3,
                               omega0=omega0, sidelength=H,
                               reference_compat=reference_compat)
    params = model.init(jax.random.key(seed))

    fit_cfg = FitConfig(learning_rate=cfg.learning_rate, niters=cfg.niters,
                        maxpoints=cfg.maxpoints, lr_decay=0.2, seed=seed)
    op = DownsampleOp(scale)
    if mesh is not None:
        from wire_tpu.dist import fit_operator_sharded
        res = fit_operator_sharded(model, params, coords, im_lr, op,
                                   fit_cfg, mesh, gt_field=im,
                                   field_shape=(H, W, 3), track="gt")
    else:
        res = fit_operator(model, params, coords, im_lr, op, fit_cfg,
                           gt_field=im, field_shape=(H, W, 3), track="gt")

    best = res.best_rec
    best_mse = float(res.best_mse)
    mse_db = float(-10 * np.log10(best_mse))
    ssim = float(M.ssim(im, best, data_range=1.0))
    msssim = float(M.ms_ssim(im, best)) if min(H, W) >= 176 else None
    A.log(f"Best MSE: {mse_db}")
    A.log(f"Best SSIM: {ssim}")

    mdict = {
        "Scale": cfg.scale,
        "rec": best,
        "gt": im,
        "rec_bi": im_bi,
        "mse_array": res.mse_gt,
        "ssim_array": res.mse_gt,  # reference stores mse under both keys
    }
    metrics = {
        "Scale": cfg.scale,
        "Scale Tensor": np.asarray(cfg.scale_tensor),
        "Downscale": scale,
        "Learning rate": np.asarray(cfg.learning_rate),
        "Best MSE": mse_db,
        "Best SSIM": ssim,
    }
    path = common.write_run_artifacts(results_dir, f"sisr/DS_{scale}",
                                      cfg.name, mdict, metrics)
    # error-map image (bspline_SISR.py MSE_plot)
    import matplotlib.pyplot as plt
    plt.imsave(os.path.join(path, "MSE_plot.png"),
               np.clip(np.abs(im - best), 0, 1), vmin=0.0, vmax=0.1)
    A.log(f"Finished SISR experiment -> {path}")
    return {"mse_db": mse_db, "ssim": ssim, "ms_ssim": msssim, "path": path,
            "result": res}


def main(argv=None):
    p = common.base_parser(__doc__)
    a = p.parse_args(argv)
    run(a.config_name, image=a.image, results_dir=a.results_dir,
        seed=a.seed, reference_compat=a.reference_compat,
        mesh=common.mesh_from_arg(a.mesh))


if __name__ == "__main__":
    main()
