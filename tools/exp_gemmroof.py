#!/usr/bin/env python
"""Microbenchmark: what GEMM rate can one pallas kernel actually sustain on
this chip, at the step kernel's shapes?

Times a kernel that runs REPS x (1024, 512) @ (512, 512) contractions,
varying:
  - dep:   each GEMM consumes the previous result (the layer-chain shape)
  - indep: GEMMs over distinct operands (pipeline-friendly)
  - vpu:   dependent GEMMs with exp/cos/sin between them (the real kernel)
  - dtype: operands stored f32 vs bf16 (accumulation always f32)

Prints one JSON line per case with achieved TF/s.
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
REPS = 64


def make_kernel(mode, dtype):
    def kernel(a_ref, w_ref, o_ref):
        a = a_ref[:]
        w = w_ref[:]
        acc = jnp.zeros((M, K), jnp.float32)
        if mode == "dep":
            x = a
            for _ in range(REPS):
                x = jnp.dot(x, w, preferred_element_type=jnp.float32)
                x = (x * (1.0 / K)).astype(dtype)
            acc = x.astype(jnp.float32)
        elif mode == "indep":
            for i in range(REPS):
                acc += jnp.dot(a + jnp.float32(i).astype(dtype), w,
                               preferred_element_type=jnp.float32)
        elif mode == "vpu":
            x = a
            for _ in range(REPS):
                z = jnp.dot(x, w, preferred_element_type=jnp.float32)
                z = z * (1.0 / K)
                m = jnp.exp(-0.1 * z * z)
                x = (m * jnp.cos(7.0 * z)).astype(dtype)
            acc = x.astype(jnp.float32)
        o_ref[:] = acc

    return kernel


def run_case(mode, dtype_name):
    dtype = jnp.float32 if dtype_name == "f32" else jnp.bfloat16
    a = jnp.asarray(np.random.RandomState(0).randn(M, K), dtype)
    w = jnp.asarray(np.random.RandomState(1).randn(K, K) / np.sqrt(K), dtype)
    f = pl.pallas_call(
        make_kernel(mode, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    g = jax.jit(lambda a, w: f(a, w)[0, 0])   # scalar out: tunnel transfers
    float(g(a, w))                            # must stay tiny when timing
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(g(a, w))
        best = min(best, time.perf_counter() - t0)
    flops = 2 * M * K * K * REPS
    print(json.dumps({"mode": mode, "dtype": dtype_name,
                      "ms": round(best * 1e3, 3),
                      "tf_s": round(flops / best / 1e12, 1)}), flush=True)


def main():
    for mode in ("indep", "dep", "vpu"):
        for dt in ("f32", "bf16"):
            run_case(mode, dt)


if __name__ == "__main__":
    main()
