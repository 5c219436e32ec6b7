#!/usr/bin/env python
"""Root-cause the 512^3 reference-schedule IoU plateau (VERDICT r3 #5).

The reference schedule (lr 5e-3, 0.2^(t/200), wire_occupancy.py:122-128)
plateaus at IoU ~0.986 at 512^3 while the same config with lr_decay=0.008
reaches 0.9965 (PERF.md round 3).  Two candidate causes were never
separated:

  (a) bf16 MXU truncation (v5e default precision) limiting attainable
      boundary sharpness, vs
  (b) high-LR bouncing — the schedule spends ~150 epochs above half the
      initial LR, and the short low-LR tail can't converge the boundary
      shell.

Experiments (each writes one JSON under results_tpu_r4/occupancy):

  precision  256^3, reference schedule, gemm_precision="highest"
             (true f32 GEMMs) vs the measured bf16 0.9947.  If f32 lands
             at ~the same IoU, precision is ruled out.
  bounce     512^3 two-phase: 30 epochs mimicking the reference
             schedule's own first 30 epochs (lr_decay 0.2^(30/200) over
             30 epochs, so lr(t) matches the protocol), then 20 epochs
             FROZEN at the reference schedule's FINAL LR (5e-3*0.2=1e-3).
             If IoU jumps from the ~0.986 plateau toward ~0.995+ at the
             reference's own terminal LR, the plateau is attributable to
             the schedule (too little time at low LR), not capacity or
             precision.

Usage: python tools/exp_occ_rootcause.py {precision,bounce}
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "results_tpu_r4", "occupancy")


def _setup(size, gemm_precision="default"):
    import jax
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C, image as I
    im = I.synthetic_volume(size, seed=0)
    target = im.reshape(-1, 1)
    spec = C.GridSpec(size, size, size)
    model = get_inr("wire", in_features=3, out_features=1,
                    hidden_features=300, hidden_layers=3,
                    first_omega0=20.0, hidden_omega0=20.0, scale=10.0,
                    gemm_precision=gemm_precision)
    params = model.init(jax.random.key(0))
    return im, target, spec, model, params


def _best_iou(res, im, size):
    best = np.asarray(res.best_rec).reshape(size, size, size)
    bt = np.where(best >= 0.5, 1.0, 0.0)
    inter = np.count_nonzero(np.logical_and(bt != 0, im != 0))
    union = np.count_nonzero(np.logical_or(bt != 0, im != 0))
    return inter / max(union, 1)


def run_precision(size=256, niters=200):
    from wire_tpu.train.trainer import FitConfig, fit_pointwise
    from wire_tpu.apps.occupancy import _iou_metric
    t0 = time.time()
    im, target, spec, model, params = _setup(size, "highest")
    cfg = FitConfig(learning_rate=5e-3, niters=niters, maxpoints=int(2e5),
                    lr_decay=0.2, seed=0,
                    scan_segment=2 if size >= 256 else None)
    res = fit_pointwise(model, params, spec, target, cfg, track="noisy",
                        epoch_metric=_iou_metric(0.5))
    iou = np.asarray(res.time_array)
    out = {"exp": "precision", "size": size, "niters": niters,
           "lr_decay": 0.2, "gemm_precision": "highest",
           "best_iou": _best_iou(res, im, size),
           "iou_max_epoch": float(iou.max()),
           "iou_final_epoch": float(iou[-1]),
           "bf16_reference_iou": 0.9947,  # results_tpu_r2 measured
           "fit_wall_s": round(res.wall_time_s, 1),
           "total_wall_s": round(time.time() - t0, 1)}
    _write(out, f"rootcause_precision_{size}.json")


def run_bounce(size=512, phase1=30, phase2=20, phase3=15):
    """Measured r4 result (rootcause_bounce_512.json): phase 2 at the
    reference's TERMINAL LR (1e-3) converges to ~0.987 — the same plateau
    the full 200-epoch reference schedule reaches — so the plateau is the
    schedule's LR FLOOR, not insufficient time at it.  Phase 3 freezes at
    the tuned schedule's terminal LR (5e-3 * 0.008 = 4e-5) from the
    phase-2 params: an IoU jump toward ~0.995+ pins the attribution."""
    from wire_tpu.train.trainer import FitConfig, fit_pointwise
    from wire_tpu.apps.occupancy import _iou_metric
    t0 = time.time()
    im, target, spec, model, params = _setup(size)
    # phase 1: the reference schedule's own first `phase1` epochs —
    # lr(t) = 5e-3 * 0.2^(t/200) == lr_decay (0.2^(phase1/200)) over phase1
    cfg1 = FitConfig(learning_rate=5e-3, niters=phase1,
                     maxpoints=int(2e5), lr_decay=0.2 ** (phase1 / 200),
                     seed=0, scan_segment=2)
    res1 = fit_pointwise(model, params, spec, target, cfg1, track="noisy",
                         epoch_metric=_iou_metric(0.5))
    iou1 = np.asarray(res1.time_array)
    # phase 2: FROZEN at the reference schedule's terminal LR (1e-3)
    cfg2 = FitConfig(learning_rate=5e-3 * 0.2, niters=phase2,
                     maxpoints=int(2e5), lr_decay=1.0, seed=1,
                     scan_segment=2)
    res2 = fit_pointwise(model, res1.params, spec, target, cfg2,
                         track="noisy", epoch_metric=_iou_metric(0.5))
    iou2 = np.asarray(res2.time_array)
    # phase 3: FROZEN at the tuned schedule's terminal LR (4e-5)
    cfg3 = FitConfig(learning_rate=5e-3 * 0.008, niters=phase3,
                     maxpoints=int(2e5), lr_decay=1.0, seed=2,
                     scan_segment=2)
    res3 = fit_pointwise(model, res2.params, spec, target, cfg3,
                         track="noisy", epoch_metric=_iou_metric(0.5))
    iou3 = np.asarray(res3.time_array)
    out = {"exp": "bounce", "size": size,
           "phase1_epochs": phase1, "phase2_epochs": phase2,
           "phase3_epochs": phase3,
           "phase2_lr": 5e-3 * 0.2, "phase3_lr": 5e-3 * 0.008,
           "iou_phase1": iou1.tolist(),
           "iou_phase2": iou2.tolist(),
           "iou_phase3": iou3.tolist(),
           "phase1_final_iou": float(iou1[-1]),
           "phase1_max_iou": float(iou1.max()),
           "phase2_final_iou": float(iou2[-1]),
           "phase2_max_iou": float(iou2.max()),
           "phase3_final_iou": float(iou3[-1]),
           "phase3_max_iou": float(iou3.max()),
           "phase3_best_iou": _best_iou(res3, im, size),
           "plateau_reference_iou": 0.9862,  # full ref-schedule run (r2)
           "fit_wall_s": round(res1.wall_time_s + res2.wall_time_s
                               + res3.wall_time_s, 1),
           "total_wall_s": round(time.time() - t0, 1)}
    _write(out, f"rootcause_bounce_{size}.json")


def _write(out, name):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, list)}))
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    {"precision": run_precision, "bounce": run_bounce}[sys.argv[1]]()
