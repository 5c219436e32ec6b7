#!/usr/bin/env python
"""512^3 occupancy block-perm Pareto sweep point: same tuned protocol as
run_occ512_blockperm128.py (200 epochs, lr_decay=0.008, 2e5-point chunks)
with block_perm taken from argv — fills the IoU/throughput Pareto curve
between the measured bp=512 (12.3M coords/s, IoU 0.99645) and bp=128
(17.5M, 0.99598) points.

Usage: python tools/run_occ512_blockperm_n.py 256
Writes results_tpu_r5/occupancy/summary_512_blockperm{N}.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    bp = int(sys.argv[1])
    import jax
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C, image as I
    from wire_tpu.train.trainer import (CheckpointSpec, FitConfig,
                                        fit_pointwise)
    from wire_tpu.apps.occupancy import _iou_metric

    size, niters = 512, 200
    t0 = time.time()
    im = I.synthetic_volume(size, seed=0)
    target = im.reshape(-1, 1)
    spec = C.GridSpec(size, size, size)
    model = get_inr("wire", in_features=3, out_features=1,
                    hidden_features=300, hidden_layers=3,
                    first_omega0=20.0, hidden_omega0=20.0, scale=10.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=niters, maxpoints=int(2e5),
                    lr_decay=0.008, seed=0, scan_segment=2, block_perm=bp)
    res = fit_pointwise(model, params, spec, target, cfg, track="noisy",
                        epoch_metric=_iou_metric(0.5),
                        checkpoint=CheckpointSpec(f"/tmp/occ512bp{bp}.ckpt",
                                                  every=10))
    iou = np.asarray(res.time_array)
    best = np.asarray(res.best_rec).reshape(size, size, size)
    bt = np.where(best >= 0.5, 1.0, 0.0)
    inter = np.count_nonzero(np.logical_and(bt != 0, im != 0))
    union = np.count_nonzero(np.logical_or(bt != 0, im != 0))
    best_iou = inter / max(union, 1)
    psnr = float(10.0 * np.log10(im.max() / np.mean((im - best) ** 2)))
    out = {"size": size, "niters": niters, "npoints": size ** 3,
           "lr_decay": 0.008, "block_perm": bp, "best_iou": best_iou,
           "iou_final_epoch": float(iou[-1]),
           "iou_max_epoch": float(iou.max()),
           "psnr_db": round(psnr, 3),
           "fit_wall_s": round(res.wall_time_s, 1),
           "coords_per_s": round(niters * size ** 3 / res.wall_time_s, 1),
           "total_wall_s": round(time.time() - t0, 1)}
    os.makedirs("results_tpu_r5/occupancy", exist_ok=True)
    path = f"results_tpu_r5/occupancy/summary_512_blockperm{bp}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    np.save(f"results_tpu_r5/occupancy/iou_hist_512_blockperm{bp}.npy", iou)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
