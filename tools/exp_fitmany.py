#!/usr/bin/env python
"""Measure the batched multi-fit wall-time cut (VERDICT r4 #6): M seeds of
the WIRE denoise fit, serial fit_pointwise vs ONE vmapped
fit_pointwise_many program, at the protocol size (256^2, 2000 epochs) and
at a small size (96^2) where per-program overhead dominates.

Usage: exp_fitmany.py [M] [niters]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_case(H, M, niters):
    import jax
    import jax.numpy as jnp
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C, image as I, noise as N
    from wire_tpu.train.trainer import (FitConfig, fit_pointwise,
                                        fit_pointwise_many)
    import dataclasses

    im = I.synthetic_image(H, H, 3, seed=0)
    rng = np.random.RandomState(0)
    noisy = N.measure_np(im, 2, 30.0, rng=rng).astype(np.float32)
    target = noisy.reshape(-1, 3)
    gt = im.reshape(-1, 3)
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=300, hidden_layers=2, first_omega0=7.0,
                    hidden_omega0=7.0, scale=8.0)
    cfg = FitConfig(learning_rate=5e-3, niters=niters, maxpoints=H * H,
                    scale_lr_by_batch=True)
    keys = jax.random.split(jax.random.key(0), M)
    pstack = jax.vmap(lambda k: model._init(k, model.spec))(keys)
    grid = C.grid2d(H, H)

    # warm both programs
    fit_pointwise_many(model, pstack, grid, target, cfg, gt=gt, track="gt")
    p0 = jax.tree.map(lambda x: x[0], pstack)
    fit_pointwise(model, p0, grid, target, cfg, gt=gt, donate=False)

    t0 = time.time()
    res_m = fit_pointwise_many(model, pstack, grid, target, cfg, gt=gt,
                               track="gt")
    batched_s = time.time() - t0

    t0 = time.time()
    psnrs = []
    for r in range(M):
        pr = jax.tree.map(lambda x, r=r: x[r], pstack)
        res1 = fit_pointwise(model, pr, grid, target,
                             dataclasses.replace(cfg, seed=r), gt=gt,
                             donate=False)
        psnrs.append(float(-10 * np.log10(res1.best_mse)))
    serial_s = time.time() - t0
    pm = [float(-10 * np.log10(res_m.best_mse[r])) for r in range(M)]
    return {"H": H, "M": M, "niters": niters,
            "serial_s": round(serial_s, 2), "batched_s": round(batched_s, 2),
            "speedup": round(serial_s / batched_s, 2),
            "psnr_batched": [round(p, 2) for p in pm],
            "psnr_serial": [round(p, 2) for p in psnrs]}


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    niters = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    out = {}
    for H in (256, 96):
        out[f"H{H}"] = run_case(H, M, niters)
        print(json.dumps(out[f"H{H}"]), flush=True)
    os.makedirs("results_tpu_r5", exist_ok=True)
    with open("results_tpu_r5/fitmany.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
