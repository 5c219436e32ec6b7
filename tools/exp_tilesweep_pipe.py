#!/usr/bin/env python
"""Experiment: coordinate-tile sweep for the PIPELINED one-pass step kernel.

The TILE_N=1024 default came from a sweep of the SERIAL one-pass kernel
(256/512/1024/2048 -> 15.8/18.2/19.0/17.3 Mcoords/s).  The cross-tile
software pipelining changed the economics: each grid step now runs two
independent GEMM chains (fwd tile i + bwd tile i-1), so a wider M per chain
may pipeline differently, and VMEM live-set doubles (2 slots).  PERF.md's
measured headroom note says the lever is "bigger effective GEMMs (wider M
per grid step)" — this measures exactly that, on the real chip, for both
the WIRE and the real-family step kernels.

Usage: python tools/exp_tilesweep_pipe.py [N] [K]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import wire_tpu.ops.pallas.wire_step as ws
import wire_tpu.ops.pallas.real_mlp as rm
from wire_tpu.nn import get_inr


def time_scan(stepfn, params, coords, tgt, spec, K):
    def body(p, _):
        pred, g = stepfn(p, coords, tgt, spec)[:2]
        p2 = jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
        return p2, jnp.sum(pred[:1])

    run = jax.jit(lambda p: jax.lax.scan(body, p, None, length=K))
    out = run(params)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = run(params)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    tiles = [int(t) for t in sys.argv[3].split(",")] if len(sys.argv) > 3 \
        else [512, 1024, 2048]

    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (N, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))

    wire = get_inr("wire", in_features=2, out_features=3,
                   hidden_features=300, hidden_layers=2,
                   first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    wparams = wire.init(jax.random.key(0))

    hl = get_inr("bspline_mscale_HL", in_features=2, out_features=3,
                 hidden_features=512, hidden_layers=2,
                 scaled_hidden_features=256, scale=1.0,
                 scale_tensor=[1.0, 9.0])
    hparams = hl.init(jax.random.key(0))

    # restore the true module defaults afterwards, whatever they are
    # (ADVICE.md round 1: hardcoding 1024 here left stale state once the
    # shipped default moved to 512)
    orig_ws, orig_rm = ws.TILE_N, rm.STEP_TILE_N
    try:
        for t in tiles:
            ws.TILE_N = t
            sec = time_scan(ws.wire_step_fused, wparams, coords, tgt,
                            wire.spec, K)
            print(json.dumps({"kernel": "wire_step", "tile": t, "N": N,
                              "step_ms": round(sec * 1e3, 3),
                              "Mcoords_s": round(N / sec / 1e6, 2)}),
                  flush=True)

        for t in tiles:
            rm.STEP_TILE_N = t
            sec = time_scan(
                lambda p, c, g, s: hl.step_grads(p, c, g),
                hparams, coords, tgt, None, K)
            print(json.dumps({"kernel": "real_step[mscale_HL]", "tile": t,
                              "N": N, "step_ms": round(sec * 1e3, 3),
                              "Mcoords_s": round(N / sec / 1e6, 2)}),
                  flush=True)
    finally:
        ws.TILE_N, rm.STEP_TILE_N = orig_ws, orig_rm


if __name__ == "__main__":
    main()
