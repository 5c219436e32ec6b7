#!/usr/bin/env python
"""Headline benchmark: training throughput (coords/s) of the flagship WIRE
complex-Gabor INR at the reference's denoise size (300 hidden, 2 hidden
layers, 65536-coordinate batches — wire_image_denoise.py's configuration,
BASELINE.md north star).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "coords/s", "vs_baseline": N,
   "ms_per_step": N, "pct_mxu_peak": N, "wall_s": N, "psnr_db": N}

vs_baseline compares against the reference implementation (PyTorch, identical
model/loop) measured on this host's CPU: 6.31e3 coords/s (2-vCPU torch-cpu,
measured 2026-08-17; the reference's own GPU numbers don't exist — SURVEY.md
§6 "throughput baselines must be measured fresh").  Because that baseline is
a CPU strawman, the JSON also reports absolute ms/step and %-of-MXU-peak so
the number is judgeable on its own.  Set BENCH_BASELINE to override.

Budget discipline (VERDICT.md round-1 weak #1): ONE warmup fit (pays the
program compile/load through the tunnel) + ONE timed fit.  All fit-setup
work is folded into cached jitted programs (trainer._fit_setup,
INR.init) because on the tunneled backend every distinct eager op costs a
~10s remote-compile round trip.
"""
import json
import os
import sys
import time

import numpy as np

TORCH_CPU_BASELINE_COORDS_PER_S = float(
    os.environ.get("BENCH_BASELINE", 6.31e3))

# FLOPs the one-pass fused train step moves per 65536-coord batch (stacked
# complex GEMMs: fwd + dz chain + weight grads, no recompute, no dcoords) —
# see PERF.md "Roofline".  v5e bf16 MXU peak is ~197 TF/s.
STEP_GFLOP = 232.0
V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    t00 = time.time()
    import jax
    # co-register a cpu backend next to the accelerator: model init and all
    # fit setup then compile/run on the host (trainer._host_setup_device),
    # so the tunneled backend sees exactly ONE program — the fit scan.
    try:
        plats = os.environ.get("JAX_PLATFORMS", "")
        if plats and "cpu" not in plats:
            jax.config.update("jax_platforms", plats + ",cpu")
    except Exception:
        pass
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C, image as I, noise as N
    from wire_tpu.train.trainer import FitConfig, fit_pointwise

    H = W = 256
    # 2000 epochs = the reference denoise config's niters
    # (wire_image_denoise.py / the CONFIGS presets); divisible by
    # scan_segment=250 so the whole fit reuses ONE device program.
    niters = int(os.environ.get("BENCH_EPOCHS", 2000))
    im = I.synthetic_image(H, W, 3, seed=0)
    rng = np.random.RandomState(0)
    im_noisy = N.measure_np(im, noise_snr=2, tau=30.0, rng=rng).astype(
        np.float32)
    coords = C.grid2d(H, W)
    target = im_noisy.reshape(-1, 3)
    gt = im.reshape(-1, 3)

    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=300, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    cfg = FitConfig(learning_rate=5e-3, niters=niters, maxpoints=H * W,
                    scale_lr_by_batch=True)

    # warmup: compiles + loads the fit program; the timed fit reuses it
    params = model.init(jax.random.key(0))
    fit_pointwise(model, params, coords, target, cfg, gt=gt, donate=False)
    setup_s = time.time() - t00

    params = model.init(jax.random.key(0))
    res = fit_pointwise(model, params, coords, target, cfg, gt=gt,
                        donate=False)
    wall = res.wall_time_s

    npoints = H * W
    coords_per_s = niters * npoints / wall
    ms_per_step = wall / niters * 1e3
    # GFLOP per ms == TFLOP/s
    pct_peak = (STEP_GFLOP / ms_per_step) / V5E_BF16_PEAK_TFLOPS
    rec = res.best_rec.reshape(H, W, 3)
    # reference PSNR formula (utils.py:67-82), on host
    psnr = float(10.0 * np.log10(im.max() / np.mean((im - rec) ** 2)))
    print(f"backend={jax.default_backend()} wall={wall:.2f}s "
          f"(setup+warmup {setup_s:.1f}s) epochs={niters} "
          f"psnr_vs_clean={psnr:.2f}dB", file=sys.stderr)
    # quality floor (VERDICT r2 weak #4, tightened per r4 weak #6): a
    # numerics regression in the fused step kernel must fail the bench, not
    # ship a fast wrong number.  The synthetic-target fit lands at ~25.46 dB
    # with measured session drift of +-0.03 dB (results_tpu_r4/NOTES.md);
    # 25 dB leaves ~0.45 dB slack while catching any real regression.
    # Explicit raise (not assert): the guard must survive python -O, and the
    # perf line above prints first so a failure still reports its context.
    if not psnr > 25.0:
        raise SystemExit(f"bench PSNR floor violated: {psnr:.2f} dB <= 25")
    print(json.dumps({
        "metric": "wire300_denoise_train_coords_per_s",
        "value": round(coords_per_s, 1),
        "unit": "coords/s",
        "vs_baseline": round(coords_per_s / TORCH_CPU_BASELINE_COORDS_PER_S,
                             2),
        "ms_per_step": round(ms_per_step, 3),
        "pct_mxu_peak": round(100.0 * pct_peak, 1),
        "wall_s": round(wall, 2),
        "psnr_db": round(psnr, 2),
    }))


if __name__ == "__main__":
    main()
