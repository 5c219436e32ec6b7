#!/usr/bin/env python
"""Experiment: stage-interleaved row-group streams in the one-pass WIRE
train-step kernel (ops/pallas/wire_step.py).

The layer chain is serially dependent (GEMM -> VPU transcendentals -> GEMM),
which stalls the MXU while the VPU works.  Splitting each coordinate tile
into S independent row groups and looping over them at every stage gives the
Mosaic scheduler independent MXU/VPU work to overlap.

Sweeps (TILE_N, N_STREAMS) on the real TPU in a 50-step data-dependent scan
(data dependence keeps XLA from hoisting the body), checks gradient parity
vs the single-stream kernel, and prints one JSON line per combo.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from wire_tpu.nn import get_inr
import wire_tpu.ops.pallas.wire_step as WS

STEPS = 50


def build(params, coords, tgt, spec):
    def body(p, _):
        pred, g = WS.wire_step_fused(p, coords, tgt, spec)
        # data dependence: fold a grad-scaled nudge back into the params
        p2 = jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
        return p2, jnp.sum(pred[:1])

    def run(p):
        return jax.lax.scan(body, p, None, length=STEPS)

    return jax.jit(run)


def timed(fn, *args, reps=4):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / STEPS


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    combos = [(1024, 1), (1024, 2), (1024, 4), (2048, 2), (2048, 4),
              (512, 2), (4096, 4)]
    if len(sys.argv) > 2:
        combos = [tuple(map(int, c.split("x"))) for c in sys.argv[2].split(",")]

    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=300, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    params = model.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (N, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    spec = model.spec

    # reference grads from the current single-stream kernel
    WS.TILE_N, WS.N_STREAMS = 1024, 1
    _, g_ref = jax.jit(lambda p: WS.wire_step_fused(p, coords, tgt, spec))(
        params)
    g_ref = jax.tree.map(np.asarray, g_ref)

    for tile, streams in combos:
        WS.TILE_N, WS.N_STREAMS = tile, streams
        try:
            _, g = jax.jit(
                lambda p: WS.wire_step_fused(p, coords, tgt, spec))(params)
            rel = max(float(np.linalg.norm(np.asarray(b) - a)
                            / (np.linalg.norm(a) + 1e-12))
                      for a, b in zip(jax.tree.leaves(g_ref),
                                      jax.tree.leaves(g)))
            ms = timed(build(params, coords, tgt, spec), params)
            print(json.dumps({"tile": tile, "streams": streams,
                              "step_ms": round(ms, 3),
                              "grad_rel_max": rel}), flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survives OOM combos
            print(json.dumps({"tile": tile, "streams": streams,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
