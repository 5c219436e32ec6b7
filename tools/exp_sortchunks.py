#!/usr/bin/env python
"""Measure FitConfig.sort_chunks at the occupancy chunk protocol: 256^3
volume, 2e5-point chunks, GridSpec coordinates, N epochs with and without
within-chunk index sorting.  Sorting leaves chunk membership (the
trajectory) unchanged but makes the target gather and rec scatter
near-sequential — the chunk protocol's measured bottleneck is random
HBM access, not the step kernel (PERF.md).

Usage: python tools/exp_sortchunks.py [size] [niters]
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
    niters = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    import jax
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C, image as I
    from wire_tpu.train.trainer import FitConfig, fit_pointwise

    im = I.synthetic_volume(size, seed=0)
    H, W, T = im.shape
    target = im.reshape(-1, 1)
    model = get_inr("wire", in_features=3, out_features=1,
                    hidden_features=300, hidden_layers=3,
                    first_omega0=20.0, hidden_omega0=20.0, scale=10.0)
    base = FitConfig(learning_rate=5e-3, niters=niters,
                     maxpoints=int(2e5), lr_decay=0.2, scan_segment=20)
    for sort in (False, True):
        cfg = dataclasses.replace(base, sort_chunks=sort)
        params = model.init(jax.random.key(0))
        # warm the program (compile+load), then time a fresh fit
        fit_pointwise(model, params, C.GridSpec(H, W, T), target, cfg,
                      track="noisy", donate=False)
        params = model.init(jax.random.key(0))
        t0 = time.time()
        res = fit_pointwise(model, params, C.GridSpec(H, W, T), target,
                            cfg, track="noisy", donate=False)
        wall = res.wall_time_s
        print(json.dumps({
            "sort_chunks": sort, "size": size, "niters": niters,
            "fit_wall_s": round(wall, 1),
            "s_per_epoch": round(wall / niters, 3),
            "coords_per_s": round(niters * H * W * T / wall, 1),
            "final_mse": float(res.mse_noisy[-1]),
        }), flush=True)


if __name__ == "__main__":
    main()
