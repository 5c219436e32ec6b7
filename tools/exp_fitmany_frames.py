#!/usr/bin/env python
"""Measure the batched multi-fit wall-time cut for the FRAMES fitter:
M seeds of a multi-frame SR fit (wire_multi_sr.py loop shape), serial
fit_frames vs ONE vmapped fit_frames_many program, at a mid size (256^2
HR / 2x / 8 frames) and a small size (96^2) where per-program overhead
dominates.  Methodology matches tools/exp_fitmany.py (warm both programs,
then time second runs; serial loop re-keys cfg.seed per replica).

Usage: exp_fitmany_frames.py [M] [niters]
"""
import dataclasses
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
    from wire_tpu.signals import coords as C, image as I
    from wire_tpu.train.trainer import FitConfig, fit_frames, fit_frames_many

    scale = 2
    nframes, bs = 8, 4
    im = I.synthetic_image(H, H, 3, seed=0)
    lr = im.reshape(H // scale, scale, H // scale, scale, 3).mean((1, 3))
    base = C.grid2d(H, H)
    # small per-frame coordinate jitter stands in for the registered warp
    rng = np.random.RandomState(0)
    shifts = (rng.rand(nframes, 1, 2).astype(np.float32) - 0.5) * (2.0 / H)
    fc = (np.stack([base] * nframes) + shifts).astype(np.float32)
    fp = np.stack([lr.reshape(-1, 3)] * nframes).astype(np.float32)
    fm = np.ones_like(fp)
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=300, hidden_layers=2, first_omega0=7.0,
                    hidden_omega0=7.0, scale=8.0)
    cfg = FitConfig(learning_rate=5e-3, niters=niters)
    keys = jax.random.split(jax.random.key(0), M)
    pstack = jax.vmap(lambda k: model._init(k, model.spec))(keys)
    kw = dict(hr_shape=(H, H, 3), scale=scale, batch_size=bs)

    # warm both programs
    fit_frames_many(model, pstack, fc, fp, fm, cfg, **kw)
    p0 = jax.tree.map(lambda x: x[0], pstack)
    fit_frames(model, p0, fc, fp, fm, cfg, donate=False, **kw)

    t0 = time.time()
    res_m = fit_frames_many(model, pstack, fc, fp, fm, cfg, **kw)
    batched_s = time.time() - t0

    t0 = time.time()
    losses = []
    for r in range(M):
        pr = jax.tree.map(lambda x, r=r: x[r], pstack)
        res1 = fit_frames(model, pr, fc, fp, fm,
                          dataclasses.replace(cfg, seed=r), donate=False,
                          **kw)
        losses.append(float(res1.best_mse))
    serial_s = time.time() - t0
    lm = [float(np.asarray(res_m.best_mse)[r]) for r in range(M)]
    return {"H": H, "M": M, "niters": niters, "nframes": nframes,
            "serial_s": round(serial_s, 2), "batched_s": round(batched_s, 2),
            "speedup": round(serial_s / batched_s, 2),
            "best_loss_batched": [round(v, 7) for v in lm],
            "best_loss_serial": [round(v, 7) for v in losses]}


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    niters = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    out = {}
    for H in (256, 96):
        out[f"H{H}"] = run_case(H, M, niters)
        print(json.dumps(out[f"H{H}"]), flush=True)
    os.makedirs("results_tpu_r5", exist_ok=True)
    with open("results_tpu_r5/fitmany_frames.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
