"""CT reconstruction driver — the rebuild of bspline_ct.py: fit an INR to a
100-angle sinogram through the differentiable Radon operator.

Loop semantics (bspline_ct.py:63-168): chest image ÷2, sinogram =
radon(image, linspace(0,180,100)) with optional sensor noise, full-grid
render -> radon -> MSE per iteration, scheduler per iteration, best image by
MSE vs clean GT, PSNR + SSIM reported.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from wire_tpu.operators.radon import RadonOp, radon
from wire_tpu.signals import coords as C, image as I, noise as N
from wire_tpu.train import artifacts as A, metrics as M
from wire_tpu.train.presets import get_config
from wire_tpu.train.trainer import FitConfig, fit_operator
from wire_tpu.apps import common


def run(config_name, *, image=None, results_dir="results", seed=0,
        nmeas=100, reference_compat=False, mesh=None,
        radon_method="auto"):
    cfg = get_config(config_name)
    A.log(f"Starting CT experiment ({config_name})")

    omega0 = cfg.omega0 if cfg.omega0 is not None else 3.0
    img = common.load_image(image, channels=1, seed=seed)
    if img.ndim == 3:
        img = img[..., 1]
    img = I.normalize(img, True)
    img = I.resize_area(img, 0.5).astype(np.float32)  # bspline_ct.py:71-75
    H, W = img.shape

    thetas = np.linspace(0, 180, nmeas, dtype=np.float32)
    # jit: eager complex FFT ops are unimplemented on some TPU backends
    sinogram = np.asarray(jax.jit(
        lambda x: radon(x, jnp.asarray(thetas),
                        method=radon_method))(jnp.asarray(img)))
    rng = np.random.RandomState(seed)
    if cfg.added_noise:
        sinogram = N.measure_np(sinogram, cfg.noise_snr, cfg.tau,
                                rng=rng).astype(np.float32)

    coords = C.grid2d(H, W)
    model = common.build_model(cfg, in_features=2, out_features=1,
                               omega0=omega0, hidden_features=300,
                               sidelength=nmeas,
                               reference_compat=reference_compat)
    params = model.init(jax.random.key(seed))
    A.log(f"Non-linearity: {cfg.nonlin}, LR: {cfg.learning_rate}, "
          f"Scale: {cfg.scale}")

    fit_cfg = FitConfig(learning_rate=cfg.learning_rate, niters=cfg.niters,
                        maxpoints=cfg.maxpoints, seed=seed)
    jthetas = jnp.asarray(thetas)
    # radon_method='rotate' selects the reference-exact bilinear-rotate
    # semantics (Pallas rotate-project kernel on TPU) — use it when a
    # sinogram's provenance is the kornia operator or real measurements of
    # known rotate-model geometry; 'auto' (default) is the self-consistent
    # fast protocol exactly like the reference's (wire_ct.py:100-106).
    op = RadonOp(jthetas, method=radon_method)
    if mesh is not None:
        from wire_tpu.dist import fit_operator_sharded
        res = fit_operator_sharded(model, params, coords, sinogram, op,
                                   fit_cfg, mesh, gt_field=img,
                                   field_shape=(H, W), track="gt")
    else:
        res = fit_operator(model, params, coords, sinogram, op, fit_cfg,
                           gt_field=img, field_shape=(H, W), track="gt")

    best = res.best_rec
    psnr = float(M.psnr_ref(img, best))
    ssim = float(M.ssim(img, best, data_range=1.0))
    A.log(f"Best PSNR: {psnr}")
    A.log(f"Best SSIM: {ssim}")

    mdict = {
        "Scale": cfg.scale,
        "rec": best,
        "loss_array": res.mse_gt,
        "sinogram": sinogram,
        "gt": img,
    }
    metrics = {
        "Scale": cfg.scale,
        "Scale Tensor": np.asarray(cfg.scale_tensor),
        "Learning Rate": np.asarray(cfg.learning_rate),
        "Best PSNR": psnr,
        "Best SSIM": ssim,
    }
    path = common.write_run_artifacts(results_dir, "ct", cfg.name, mdict,
                                      metrics)
    A.log(f"CT experiment completed -> {path}")
    return {"psnr": psnr, "ssim": ssim, "path": path, "result": res}


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--radon_method", default="auto",
                   choices=["auto", "rotate", "rotate_xla", "fourier",
                            "shear"],
                   help="'rotate' = reference-exact bilinear semantics "
                        "(Pallas kernel on TPU); 'auto' = fast "
                        "self-consistent protocol")
    a = p.parse_args(argv)
    run(a.config_name, image=a.image, results_dir=a.results_dir,
        seed=a.seed, reference_compat=a.reference_compat,
        mesh=common.mesh_from_arg(a.mesh), radon_method=a.radon_method)


if __name__ == "__main__":
    main()
