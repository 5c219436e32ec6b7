#!/usr/bin/env python
"""Decompose the full-batch denoise epoch: step kernel vs Adam vs
metrics/best-tracking.

bench.py (WIRE-300, 65536 coords, full-batch) runs ~3.6 ms/epoch while the
isolated step kernel runs ~2.8 ms.  This times a scan of progressively
larger epoch bodies to locate the remaining ~0.8 ms:

    step      : model.step_grads + trivial param update (data dependence)
    step+adam : + optax Adam + LambdaLR-style schedule (trainer's tx)
    full      : + rec/metrics reductions + best tracking (epoch_body clone)
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")

from wire_tpu.nn import get_inr
from wire_tpu.train.trainer import FitConfig, make_optimizer

N, K = 65536, 50


def timeit(run, *args):
    out = run(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = run(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    model = get_inr("wire", in_features=2, out_features=1,
                    hidden_features=300, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    params = model.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (N, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (N, 1)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (N, 1)).astype(np.float32))

    cfg = FitConfig(niters=K)
    tx = make_optimizer(cfg, None, npoints=N, nchunks=1)
    opt0 = tx.init(params)

    # ---- step only ----
    def body0(p, _):
        pred, g = model.step_grads(p, coords, tgt)
        p2 = jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
        return p2, jnp.sum(pred[:1])

    r0 = jax.jit(lambda p: jax.lax.scan(body0, p, None, length=K))
    ms0 = timeit(r0, params)
    print(json.dumps({"variant": "step", "ms": round(ms0, 3)}), flush=True)

    # ---- step + adam ----
    def body1(carry, _):
        p, o = carry
        pred, g = model.step_grads(p, coords, tgt)
        up, o = tx.update(g, o, p)
        p = optax.apply_updates(p, up)
        return (p, o), jnp.sum(pred[:1])

    r1 = jax.jit(lambda p, o: jax.lax.scan(body1, (p, o), None, length=K))
    ms1 = timeit(r1, params, opt0)
    print(json.dumps({"variant": "step+adam", "ms": round(ms1, 3)}),
          flush=True)

    # ---- full epoch body (trainer clone) ----
    def body2(carry, _):
        p, o, rec, best_mse, best_rec, best_p = carry
        pred, g = model.step_grads(p, coords, tgt)
        up, o = tx.update(g, o, p)
        p = optax.apply_updates(p, up)
        rec = pred
        mse_noisy = jnp.mean((tgt - rec) ** 2)
        mse_gt = jnp.mean((gt - rec) ** 2)
        is_best = mse_gt < best_mse
        best_mse = jnp.where(is_best, mse_gt, best_mse)
        best_rec = jnp.where(is_best, rec, best_rec)
        best_p = jax.tree.map(lambda b, q: jnp.where(is_best, q, b),
                              best_p, p)
        return (p, o, rec, best_mse, best_rec, best_p), (mse_gt, mse_noisy)

    carry0 = (params, opt0, jnp.zeros_like(tgt), jnp.inf,
              jnp.zeros_like(tgt), params)
    r2 = jax.jit(lambda c: jax.lax.scan(body2, c, None, length=K))
    ms2 = timeit(r2, carry0)
    print(json.dumps({"variant": "full", "ms": round(ms2, 3)}), flush=True)
    print(json.dumps({"adam_ms": round(ms1 - ms0, 3),
                      "metrics_best_ms": round(ms2 - ms1, 3)}), flush=True)


if __name__ == "__main__":
    main()
