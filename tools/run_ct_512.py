#!/usr/bin/env python
"""CT at the reference's full protocol on TPU (VERDICT round 1 #8):
512^2 image, 100 angles, 5000 iterations, WIRE-300 — wire_ct.py /
bspline_ct.py's loop with the Pallas line-sampler Radon (the fourier path)
as the forward operator.

Two parts:
  full   — the 512^2 x 100-angle x 5000-iter fit (fourier/Pallas operator)
  oracle — operator cross-check at the same protocol but fewer iters:
           fourier-fit vs rotate-oracle-fit PSNR/SSIM at equal iterations
           (the rotate operator reproduces kornia exactly but costs
           ~100x more per iteration on TPU, PERF.md)

The sinogram is always generated with the ROTATE oracle, so both fits
reconstruct from identical measurements.  Results + JSON summary under
results_tpu_r2/ct.  Usage: python tools/run_ct_512.py [full|oracle|both]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fit_once(img, thetas, niters, method, *, scan_segment=250,
             checkpoint_path=None):
    import jax
    import jax.numpy as jnp
    from wire_tpu.nn import get_inr
    from wire_tpu.operators.radon import RadonOp, radon
    from wire_tpu.signals import coords as C
    from wire_tpu.train.trainer import (CheckpointSpec, FitConfig,
                                        fit_operator)

    H, W = img.shape
    # sinogram from the rotate oracle (kornia-exact, lin_inverse.py:19-40)
    sino = np.asarray(jax.jit(
        lambda x: radon(x, jnp.asarray(thetas), method="rotate"))(
            jnp.asarray(img)))
    model = get_inr("wire", in_features=2, out_features=1,
                    hidden_features=300, hidden_layers=2,
                    first_omega0=10.0, hidden_omega0=10.0, scale=10.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=niters,
                    scan_segment=scan_segment)
    ckpt = CheckpointSpec(path=checkpoint_path) if checkpoint_path else None
    op = RadonOp(thetas, method=method)
    res = fit_operator(model, params, C.grid2d(H, W), sino, op, cfg,
                       gt_field=img, field_shape=(H, W), track="gt",
                       checkpoint=ckpt)
    from wire_tpu.train import metrics as M
    best = res.best_rec
    psnr = float(10.0 * np.log10(img.max() / np.mean((img - best) ** 2)))
    ssim = float(M.ssim(img, best, data_range=1.0))
    return {"method": method, "niters": niters, "psnr_db": round(psnr, 3),
            "ssim": round(ssim, 4),
            "fit_wall_s": round(res.wall_time_s, 1),
            "ms_per_iter": round(res.wall_time_s / niters * 1e3, 2)}, res


def main():
    part = sys.argv[1] if len(sys.argv) > 1 else "both"
    from wire_tpu.apps import common
    from wire_tpu.signals import image as I

    outdir = os.path.join("results_tpu_r2", "ct")
    os.makedirs(outdir, exist_ok=True)
    summary = {}

    if part in ("full", "both"):
        img = common.load_image(None, channels=1, seed=0)
        img = I.normalize(img, True).astype(np.float32)  # 512^2 procedural
        thetas = np.linspace(0, 180, 100, dtype=np.float32)
        t0 = time.time()
        s, res = fit_once(img, thetas, 5000, "fourier",
                          checkpoint_path="/tmp/ct512.ckpt")
        s["total_wall_s"] = round(time.time() - t0, 1)
        summary["full_512_fourier"] = s
        np.savez(os.path.join(outdir, "full_512.npz"), rec=res.best_rec,
                 gt=img, loss=res.mse_noisy, tracked=res.mse_gt)
        print(json.dumps(s), flush=True)

    if part in ("oracle", "both"):
        img = common.load_image(None, channels=1, seed=0)
        img = I.normalize(img, True).astype(np.float32)
        img = I.resize_area(img, 0.5).astype(np.float32)  # 256^2
        thetas = np.linspace(0, 180, 100, dtype=np.float32)
        iters = 600
        sf, _ = fit_once(img, thetas, iters, "fourier")
        sr, _ = fit_once(img, thetas, iters, "rotate", scan_segment=50)
        summary["oracle_256_fourier"] = sf
        summary["oracle_256_rotate"] = sr
        print(json.dumps({"fourier": sf, "rotate": sr}), flush=True)

    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
