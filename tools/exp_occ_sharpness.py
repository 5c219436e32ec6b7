#!/usr/bin/env python
"""512^3 occupancy IoU vs (omega0, sigma0) probe (VERDICT r2 #4 follow-up).

At the reference hyperparameters (wire: omega0=20, sigma0=10,
wire_occupancy.py:90) the 512^3 synthetic-volume fit converges to IoU
~0.986 within ~5 epochs and plateaus — the deficit is boundary-transition
width, which scales LINEARLY with resolution for a fixed-bandwidth model
(misclassified shell voxels = transition width x surface area), matching
the 256^3 result (0.9947 at the same settings).  This probes sharper
configurations with short fits (IoU convergence is fast) to pick a 512^3
configuration for the full 200-epoch protocol.

Usage: python tools/exp_occ_sharpness.py [size] [niters] [seg]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C, image as I
    from wire_tpu.train.trainer import FitConfig, fit_pointwise
    from wire_tpu.apps.occupancy import _iou_metric

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    niters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    seg = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    t0 = time.time()
    im = I.synthetic_volume(size, seed=0)
    print(json.dumps({"volume_built_s": round(time.time() - t0, 1)}),
          flush=True)
    target = im.reshape(-1, 1)
    spec = C.GridSpec(size, size, size)

    for omega0, sigma0 in ((20.0, 10.0), (30.0, 10.0), (40.0, 10.0),
                           (30.0, 20.0)):
        model = get_inr("wire", in_features=3, out_features=1,
                        hidden_features=300, hidden_layers=3,
                        first_omega0=omega0, hidden_omega0=omega0,
                        scale=sigma0)
        params = model.init(jax.random.key(0))
        cfg = FitConfig(learning_rate=5e-3, niters=niters,
                        maxpoints=int(2e5), lr_decay=0.2, seed=0,
                        scan_segment=seg)
        res = fit_pointwise(model, params, spec, target, cfg,
                            track="noisy", epoch_metric=_iou_metric(0.5),
                            donate=False)
        iou = np.asarray(res.time_array)
        print(json.dumps({"omega0": omega0, "sigma0": sigma0,
                          "iou_last": float(iou[-1]),
                          "iou_max": float(iou.max()),
                          "iou_hist_tail": [round(float(v), 5)
                                            for v in iou[-5:]],
                          "fit_wall_s": round(res.wall_time_s, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
