#!/usr/bin/env python
"""Experiment (VERDICT r2 #5): the h=212 -> 256 lane-padding waste in the
WIRE step kernel.

True lane-exactness is impossible on the MXU — 212 lanes pad to 2x128
inside Mosaic whether we pad explicitly or not, and the packed [ar|ai]
form (424 -> 512) lands on exactly the same tiles.  The available lever is
a lane-NATIVE width: hidden_features=363 gives h = int(363/sqrt(2)) = 256,
so every MAC the MXU executes is a real model MAC.  This measures, on the
idle chip:

  - ms/step of the fused one-pass kernel at hf=300 (h=212, the reference
    headline config) vs hf=363 (h=256 lane-native), 65536 coords,
    50-step scans;
  - the bench-protocol denoise PSNR for both (2000 epochs, synthetic
    parrot stand-in) — capacity is not equal (h=256 has ~45% more hidden
    params), so this reports what the padding budget buys when spent on
    real width instead of zeros.

Also times the wire2d fused step at its headline config (hf=300 -> h=150
complex) for PERF.md.

Usage: python tools/exp_width256.py [N] [K] [fit_epochs]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from wire_tpu.nn import get_inr


def time_scan(stepfn, params, coords, tgt, spec, K, reps=4):
    def body(p, _):
        pred, g = stepfn(p, coords, tgt, spec)[:2]
        p2 = jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
        return p2, jnp.sum(pred[:1])

    run = jax.jit(lambda p: jax.lax.scan(body, p, None, length=K))
    out = run(params)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(params)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def gflop_wire_step(n, h, L, d=2, o=3):
    """Useful FLOPs of the one-pass step (fwd + dz chain + weight grads,
    no recompute, no dcoords), complex MACs = 4 real MACs."""
    first = n * d * h * 2            # real->complex? first layer is real W
    hidden = L * n * h * h * 4 * 2
    final = n * h * o * 4 * 2
    # bwd: dW per layer (same MACs as fwd GEMM) + da chain
    return (3 * (first + hidden + final)) / 1e9


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    fit_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (N, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))

    out = {"N": N, "K": K}
    from wire_tpu.nn.models import wire_step, wire2d_step
    for hf, tag in ((300, "hf300_h212"), (363, "hf363_h256")):
        model = get_inr("wire", in_features=2, out_features=3,
                        hidden_features=hf, hidden_layers=2,
                        first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
        params = model.init(jax.random.key(0))
        h = params["first"]["w"].shape[1]
        ms = time_scan(wire_step, params, coords, tgt, model.spec, K)
        out[tag] = {"h": h, "ms_per_step": round(ms, 3),
                    "nparams": int(model.num_params(params))}
        print(json.dumps({tag: out[tag]}), flush=True)

    m2 = get_inr("wire2d", in_features=2, out_features=3,
                 hidden_features=300, hidden_layers=2, first_omega0=7.0,
                 hidden_omega0=7.0, scale=8.0)
    p2 = m2.init(jax.random.key(0))
    ms2 = time_scan(wire2d_step, p2, coords, tgt, m2.spec, K)
    out["wire2d_hf300"] = {"h": p2["first_lin"]["w"].shape[1],
                           "ms_per_step": round(ms2, 3),
                           "nparams": int(m2.num_params(p2))}
    print(json.dumps({"wire2d_hf300": out["wire2d_hf300"]}), flush=True)

    # bench-protocol PSNR at both widths
    if fit_epochs > 0:
        from wire_tpu.signals import coords as C, image as I, noise as Noi
        from wire_tpu.train.trainer import FitConfig, fit_pointwise
        H = W = 256
        im = I.synthetic_image(H, W, 3, seed=0)
        im_noisy = Noi.measure_np(im, noise_snr=2, tau=30.0,
                                  rng=np.random.RandomState(0)).astype(
                                      np.float32)
        grid = C.grid2d(H, W)
        target = im_noisy.reshape(-1, 3)
        gt = im.reshape(-1, 3)
        for hf, tag in ((300, "hf300_h212"), (363, "hf363_h256")):
            model = get_inr("wire", in_features=2, out_features=3,
                            hidden_features=hf, hidden_layers=2,
                            first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
            cfg = FitConfig(learning_rate=5e-3, niters=fit_epochs,
                            maxpoints=H * W, scale_lr_by_batch=True)
            params = model.init(jax.random.key(0))
            res = fit_pointwise(model, params, grid, target, cfg, gt=gt,
                                donate=False)
            rec = res.best_rec.reshape(H, W, 3)
            psnr = float(10 * np.log10(im.max()
                                       / np.mean((im - rec) ** 2)))
            out[tag]["psnr_db"] = round(psnr, 2)
            out[tag]["fit_wall_s"] = round(res.wall_time_s, 2)
            print(json.dumps({tag: out[tag]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
