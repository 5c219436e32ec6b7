#!/usr/bin/env python
"""Quality + throughput validation of FitConfig.block_perm at the
occupancy protocol (VERDICT r4 #5): run the SAME tuned-schedule fit with
per-point permutation (the reference composition) and with 512-point
block permutation, compare best IoU and coords/s.

Usage: exp_occ_blockperm.py [size] [niters] [out_json]
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    niters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    out_path = (sys.argv[3] if len(sys.argv) > 3
                else f"results_tpu_r5/occupancy/blockperm_{size}.json")
    import jax
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C, image as I
    from wire_tpu.train.trainer import FitConfig, fit_pointwise
    from wire_tpu.apps.occupancy import _iou_metric

    im = I.synthetic_volume(size, seed=0)
    target = im.reshape(-1, 1)
    spec = C.GridSpec(size, size, size)
    model = get_inr("wire", in_features=3, out_features=1,
                    hidden_features=300, hidden_layers=3,
                    first_omega0=20.0, hidden_omega0=20.0, scale=10.0)
    base = FitConfig(learning_rate=5e-3, niters=niters, maxpoints=int(2e5),
                     lr_decay=0.008, seed=0,
                     scan_segment=2 if size >= 512 else 20)
    out = {"size": size, "niters": niters}
    for tag, bp in (("blockperm", 512), ("pointperm", 0)):
        cfg = dataclasses.replace(base, block_perm=bp)
        params = model.init(jax.random.key(0))
        res = fit_pointwise(model, params, spec, target, cfg,
                            track="noisy", epoch_metric=_iou_metric(0.5),
                            donate=False)
        iou = np.asarray(res.time_array)
        best = np.asarray(res.best_rec).reshape(size, size, size)
        bt = np.where(best >= 0.5, 1.0, 0.0)
        inter = np.count_nonzero(np.logical_and(bt != 0, im != 0))
        union = np.count_nonzero(np.logical_or(bt != 0, im != 0))
        out[tag] = {
            "best_iou": inter / max(union, 1),
            "iou_max_epoch": float(iou.max()),
            "fit_wall_s": round(res.wall_time_s, 1),
            "coords_per_s": round(niters * size ** 3 / res.wall_time_s, 1),
        }
        print(tag, json.dumps(out[tag]), flush=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
