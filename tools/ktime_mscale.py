#!/usr/bin/env python
"""Time the mscale_2 / mscale_hier TRAIN STEPS on the real TPU: the fused
registry path (STEP_REGISTRY — stacked-scales kernel for mscale_2, one-pass
canonicalized-chain kernel for hier) vs the XLA-autodiff fallback the
families used in round 1 (VERDICT round 1 #5: "step-time measured and
recorded in PERF.md").

Config: the registry's denoise shape — 300 hidden, 2 hidden layers,
scale_tensor (1/9, 4) (e.g. Mscale2_ST2/MscaleHier_ST4 presets),
65536-coordinate batches.

Usage: python tools/ktime_mscale.py [N] [reps]
Prints one JSON line per (family, path).
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed_scan(model, params, coords, tgt, K=50, reps=4):
    """Per-step ms of a K-step data-dependent scan over step_grads —
    single-call timing through the tunnel is load/latency-dominated and
    unreliable (CLAUDE.md); scans amortize it (exp_tilesweep_pipe.py)."""

    def body(p, _):
        pred, g = model.step_grads(p, coords, tgt)[:2]
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


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sys.path.insert(0, "/root/repo")
    from wire_tpu.nn import get_inr
    from wire_tpu.nn.models import INR

    coords = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (N, 2)).astype(np.float32))
    tgt = jnp.asarray(
        np.random.RandomState(1).uniform(0, 1, (N, 3)).astype(np.float32))

    for nonlin in ("bspline_mscale_2", "bspline_mscale_hier"):
        model = get_inr(nonlin, in_features=2, out_features=3,
                        hidden_features=300, hidden_layers=2,
                        scale_tensor=(1.0 / 9.0, 4.0))
        params = model.init(jax.random.key(0))
        fallback = INR(model.spec, model._init, model._apply, None)

        # three paths: registry step (fused kernels), autodiff over the
        # (still kernel-dispatching) apply, and the pure-XLA jnp path
        # (fused='never') — the round-1 baseline for these families
        jnp_model = get_inr(nonlin, in_features=2, out_features=3,
                            hidden_features=300, hidden_layers=2,
                            scale_tensor=(1.0 / 9.0, 4.0), fused="never")
        jnp_model = INR(jnp_model.spec, jnp_model._init, jnp_model._apply,
                        None)
        jparams = jnp_model.init(jax.random.key(0))
        ms_f = timed_scan(model, params, coords, tgt, reps=reps)
        ms_a = timed_scan(fallback, params, coords, tgt, reps=reps)
        ms_j = timed_scan(jnp_model, jparams, coords, tgt, reps=reps)
        print(json.dumps({"family": nonlin, "n": N,
                          "fused_step_ms": round(ms_f, 3),
                          "autodiff_fused_apply_ms": round(ms_a, 3),
                          "xla_jnp_step_ms": round(ms_j, 3),
                          "speedup_vs_jnp": round(ms_j / ms_f, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
