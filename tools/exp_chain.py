#!/usr/bin/env python
"""Scan-amortized GEMM-chain roofline at the step kernel's shapes.

Question: the one-pass step kernel sustains ~72 TF/s (~37% of v5e bf16
peak).  Is the ceiling the serially-dependent GEMM chain itself, and does
giving the scheduler TWO independent chains (the cross-tile
fwd(i+1)/bwd(i) pipelining idea) raise it?

Each case is one pallas kernel doing REPS (1024, 512) @ (512, 512)
contractions, wrapped in a K-step lax.scan with data dependence through
the weight so XLA can't hoist it; per-call tunnel latency (~22ms) is
amortized.  Cases:

  chain1      one dependent chain (x <- gabor-less: x@w scaled)
  chain1_vpu  one dependent chain with exp/cos/sin between GEMMs
  chain2      TWO independent dependent chains, stage-interleaved
  chain2_vpu  same with transcendentals
  indep       all REPS GEMMs independent (pure MXU ceiling)

Prints one JSON line per case with per-scan-step ms and achieved TF/s.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K = 1024, 512
REPS = 48
SCAN = 40


def make_kernel(mode):
    def body(a_ref, w_ref, o_ref):
        w = w_ref[:]
        scale = jnp.float32(1.0 / K)

        def step(x):
            return jnp.dot(x, w, preferred_element_type=jnp.float32) * scale

        def vpu(z):
            m = jnp.exp(-0.1 * z * z)
            return m * jnp.cos(7.0 * z)

        if mode == "indep":
            acc = jnp.zeros((M, K), jnp.float32)
            a = a_ref[:]
            for i in range(REPS):
                acc += jnp.dot(a + jnp.float32(i), w,
                               preferred_element_type=jnp.float32)
            o_ref[:] = acc * scale
        elif mode in ("chain1", "chain1_vpu"):
            x = a_ref[:]
            for _ in range(REPS):
                x = step(x)
                if mode == "chain1_vpu":
                    x = vpu(x)
            o_ref[:] = x
        elif mode in ("chain2", "chain2_vpu"):
            x = a_ref[pl.ds(0, M // 2), :]
            y = a_ref[pl.ds(M // 2, M // 2), :]
            for _ in range(REPS):
                x = step(x)
                y = step(y)
                if mode == "chain2_vpu":
                    x = vpu(x)
                    y = vpu(y)
            o_ref[pl.ds(0, M // 2), :] = x
            o_ref[pl.ds(M // 2, M // 2), :] = y
        elif mode in ("chain4", "chain4_vpu"):
            q = M // 4
            xs = [a_ref[pl.ds(k * q, q), :] for k in range(4)]
            for _ in range(REPS):
                xs = [step(x) for x in xs]
                if mode == "chain4_vpu":
                    xs = [vpu(x) for x in xs]
            for k in range(4):
                o_ref[pl.ds(k * q, q), :] = xs[k]
        return

    return body


def run_case(mode):
    a = jnp.asarray(np.random.RandomState(0).randn(M, K), jnp.float32)
    w = jnp.asarray(np.random.RandomState(1).randn(K, K) / np.sqrt(K),
                    jnp.float32)
    f = pl.pallas_call(
        make_kernel(mode),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def scan(w0):
        def stp(wc, _):
            out = f(a, wc)
            # data dependence: fold the output back into the weight
            wc = wc + out[:K, :] * 1e-12
            return wc, out[0, 0]
        _, ys = jax.lax.scan(stp, w0, None, length=SCAN)
        return ys[-1]

    g = jax.jit(scan)
    float(g(w))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(g(w))
        best = min(best, time.perf_counter() - t0)
    per = best / SCAN
    # chain2 halves M per GEMM but runs two chains: same total MACs
    flops = 2 * M * K * K * REPS
    print(json.dumps({"mode": mode, "step_ms": round(per * 1e3, 3),
                      "tf_s": round(flops / per / 1e12, 1)}), flush=True)


def main():
    modes = sys.argv[1:] or ["indep", "chain1", "chain1_vpu", "chain2",
                             "chain2_vpu", "chain4", "chain4_vpu"]
    for mode in modes:
        run_case(mode)


if __name__ == "__main__":
    main()
