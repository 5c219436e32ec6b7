#!/usr/bin/env python
"""Time the fused WIRE kernel (fwd and fwd+bwd) on the real TPU.

Usage: python tools/ktime.py [N] [reps]
Prints JSON: {"fwd_ms": ..., "step_ms": ...}

Timing rule from CLAUDE.md: block_until_ready may not wait across the
axon tunnel — force a tiny device->host transfer after each call.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=5):
    # warmup (compile + executable load)
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sys.path.insert(0, "/root/repo")
    from wire_tpu.nn import get_inr
    from wire_tpu.ops.pallas.wire_mlp import wire_mlp_fused

    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=300, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    params = model.init(jax.random.key(0))
    coords = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (N, 2)).astype(np.float32))
    tgt = jnp.asarray(
        np.random.RandomState(1).uniform(0, 1, (N, 3)).astype(np.float32))

    spec = model.spec

    fwd = jax.jit(lambda p, c: wire_mlp_fused(p, c, spec))

    def loss(p, c, t):
        y = wire_mlp_fused(p, c, spec)
        return jnp.mean((y - t) ** 2)

    step = jax.jit(jax.grad(loss))

    fwd_ms = timed(fwd, params, coords, reps=reps)
    step_ms = timed(step, params, coords, tgt, reps=reps)
    print(json.dumps({"N": N, "fwd_ms": round(fwd_ms, 3),
                      "step_ms": round(step_ms, 3)}))


if __name__ == "__main__":
    main()
