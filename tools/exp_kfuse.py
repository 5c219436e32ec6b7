#!/usr/bin/env python
"""K-dimension fusion levers for the one-pass step kernel (VERDICT round 1
#6: "fusing the two hidden-layer GEMMs' K-dimension in the pipelined
kernel").

The pipelined step kernel's GEMM granularity is (tile, 512) @ (512, 512)
(stacked-complex hidden layers at hp=256) and its weight-grad GEMMs are
(512, tile) @ (tile, 512) with K = tile = 512.  PERF.md's roofline says the
limiter is chain latency at that granularity.  Two places K can actually
grow without changing the math:

  wg512 / wg1024 / wg2048   weight-grad-shaped GEMMs, (512, K) @ (K, 512):
                            batching the per-tile dW accumulation over 2 or
                            4 tiles trades 2x/4x fewer GEMMs for 2x/4x
                            larger K.  All REPS outputs independent,
                            accumulated — exactly the dacc[...] += pattern.
  chainK512 / chainK1024    a DEPENDENT chain whose links have K=512 vs
                            K=1024 at equal MACs/link count economics:
                            link = x(M,K)@(K,512), output re-widened by
                            concat for K=1024.  Quantifies whether a wider
                            contraction hides chain latency (the "only a
                            wider network would change it" claim).

Each case runs inside ONE pallas kernel wrapped in a data-dependent
lax.scan (tunnel latency amortized; XLA can't hoist).  Prints one JSON
line per case: per-scan-step ms and achieved TF/s at equal total MACs.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H2 = 512          # stacked 2*hp
MACS = 48 * 512 * 512 * 512   # per kernel call, all cases equal
SCAN = 40


def make_kernel(mode):
    if mode.startswith("wg"):
        K = int(mode[2:])
        reps = MACS // (512 * K * 512)

        def body(a_ref, d_ref, o_ref):
            acc = jnp.zeros((H2, H2), jnp.float32)
            for i in range(reps):
                a = a_ref[pl.ds(0, K), :] + jnp.float32(i)
                d = d_ref[pl.ds(0, K), :]
                acc += jax.lax.dot_general(
                    a, d, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[:] = acc
        return body, (2048, H2), (2048, H2), (H2, H2)

    if mode.startswith("chainK"):
        K = int(mode[6:])
        M = 512
        reps = MACS // (M * K * 512)

        def body(a_ref, w_ref, o_ref):
            w = w_ref[pl.ds(0, K), :]
            scale = jnp.float32(1.0 / K)
            x = a_ref[:, pl.ds(0, K)]
            for _ in range(reps):
                y = jnp.dot(x, w, preferred_element_type=jnp.float32) * scale
                x = jnp.concatenate([y] * (K // 512), axis=1) \
                    if K > 512 else y
            o_ref[:] = x[:, :512]
        return body, (M, K), (2048, H2), (M, 512)

    raise ValueError(mode)


def run_case(mode):
    body, ashape, wshape, oshape = make_kernel(mode)
    a = jnp.asarray(np.random.RandomState(0).randn(*ashape), jnp.float32)
    w = jnp.asarray(np.random.RandomState(1).randn(*wshape)
                    / np.sqrt(wshape[0]), jnp.float32)
    f = pl.pallas_call(
        body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def scan(w0):
        def stp(wc, _):
            out = f(a, wc)
            wc = wc.at[:oshape[0], :oshape[1]].add(out * 1e-12)
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
    print(json.dumps({"mode": mode, "step_ms": round(per * 1e3, 3),
                      "tf_s": round(2 * MACS / per / 1e12, 1)}), flush=True)


def main():
    modes = sys.argv[1:] or ["wg512", "wg1024", "wg2048",
                             "chainK512", "chainK1024"]
    for mode in modes:
        run_case(mode)


if __name__ == "__main__":
    main()
