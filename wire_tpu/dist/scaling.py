"""Scaling-efficiency harness: measure fit throughput on 1..N-device meshes
and report efficiency vs linear scaling (the north-star ">=85% coords/s
scaling to 2 hosts", BASELINE.md).

On a real pod slice this measures ICI scaling; under
``--xla_force_host_platform_device_count`` it validates the machinery
(virtual CPU devices share cores, so efficiency numbers are not meaningful
there — only correctness and the harness itself).
"""
from __future__ import annotations

import numpy as np
import jax

from wire_tpu.dist.fitter import fit_pointwise_sharded
from wire_tpu.dist.mesh import make_mesh
from wire_tpu.train.trainer import FitConfig, fit_pointwise


def measure_scaling(model, params, coords, target, cfg: FitConfig,
                    device_counts=None, repeats=2):
    """Returns {ndev: coords_per_s}; ndev=1 uses the single-device trainer."""
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]
    results = {}
    npoints = coords.shape[0]
    for nd in device_counts:
        best = 0.0
        for _ in range(repeats):
            p = jax.tree.map(jax.numpy.copy, params)
            if nd == 1:
                res = fit_pointwise(model, p, coords, target, cfg,
                                    track="noisy", donate=False)
            else:
                mesh = make_mesh(nd)
                res = fit_pointwise_sharded(model, p, coords, target, cfg,
                                            mesh, track="noisy",
                                            donate=False)
            cps = cfg.niters * npoints / res.wall_time_s
            best = max(best, cps)
        results[nd] = best
    return results


def efficiency_table(results):
    base = results.get(1)
    rows = []
    for nd, cps in sorted(results.items()):
        eff = cps / (base * nd) if base else float("nan")
        rows.append((nd, cps, eff))
    return rows


def main(argv=None):
    import argparse
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C, image as I

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--niters", type=int, default=100)
    p.add_argument("--hidden", type=int, default=300)
    a = p.parse_args(argv)

    H = W = a.size
    im = I.synthetic_image(H, W, 3, seed=0)
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=a.hidden, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=a.niters, maxpoints=H * W)
    res = measure_scaling(model, params, C.grid2d(H, W), im.reshape(-1, 3),
                          cfg)
    print(f"{'devices':>8} {'coords/s':>14} {'efficiency':>11}")
    for nd, cps, eff in efficiency_table(res):
        print(f"{nd:>8} {cps:>14.3e} {eff:>10.1%}")


if __name__ == "__main__":
    main()
