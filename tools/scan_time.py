#!/usr/bin/env python
"""Scan-amortized kernel timing: current fused WIRE kernel vs the stacked
complex-GEMM experiment (tools/exp_stacked.py).

Single pallas_call timings are useless when the tunnel adds ~40ms per
dispatch, so each variant runs K train-ish steps inside ONE jitted
lax.scan with data dependence (params updated by a tiny SGD step), and we
report per-step ms = total / K.

Usage: python tools/scan_time.py [N] [K]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timed_total(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from wire_tpu.nn import get_inr
    from wire_tpu.ops.pallas.wire_mlp import wire_mlp_fused
    from tools.exp_stacked import stacked_fwd, stacked_bwd

    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=300, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    spec = model.spec
    params = model.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (N, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    L, w0, s0, fw0 = 2, 7.0, 8.0, 7.0
    lr = 1e-4

    def scan_current(p0):
        def step(p, _):
            def loss(p):
                y = wire_mlp_fused(p, coords, spec)
                return jnp.mean((y - tgt) ** 2)
            l, g = jax.value_and_grad(loss)(p)
            p = jax.tree.map(lambda a, b: a - lr * b, p, g)
            return p, l
        _, ls = jax.lax.scan(step, p0, None, length=K)
        return ls

    def scan_stacked(p0):
        def step(p, _):
            y = stacked_fwd(p, coords, L, w0, s0, fw0)
            l = jnp.mean((y - tgt) ** 2)
            gy = 2.0 * (y - tgt) / (y.shape[0] * y.shape[1])
            g, _ = stacked_bwd(p, coords, gy, L, w0, s0, fw0)
            p = jax.tree.map(lambda a, b: a - lr * b, p, g)
            return p, l
        _, ls = jax.lax.scan(step, p0, None, length=K)
        return ls

    cur = timed_total(jax.jit(scan_current), params)
    stk = timed_total(jax.jit(scan_stacked), params)
    print(json.dumps({"N": N, "K": K,
                      "current_step_ms": round(cur / K, 3),
                      "stacked_step_ms": round(stk / K, 3)}))


if __name__ == "__main__":
    main()
