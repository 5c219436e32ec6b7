#!/usr/bin/env python
"""Time the Radon operator paths on the real TPU at the reference's CT
scale (512^2 image, 100 angles): rotate_xla (gather oracle), the Pallas
rotate-project kernel (reference-exact bilinear semantics), and fourier
(projection-slice).  fwd and fwd+bwd, via data-dependent scans (CLAUDE.md:
single calls through the tunnel are latency-dominated).

Usage: python tools/ktime_rotsum.py [S] [nangles] [K] [skip_xla]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import importlib
R = importlib.import_module('wire_tpu.operators.radon')


def time_scan(fn, x, K, reps=3):
    def body(c, _):
        out = fn(c)
        # data dependence: fold a scalar back into the carry
        return c + 1e-12 * jnp.sum(out), jnp.float32(0)

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=K)[0])
    out = run(x)
    np.asarray(out).ravel()[:1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x)
        np.asarray(out).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    A = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    skip_xla = len(sys.argv) > 4 and sys.argv[4] == "1"
    angles = np.linspace(0, 180, A, dtype=np.float32)
    img = jnp.asarray(np.random.RandomState(0).rand(S, S).astype(np.float32))
    sino0 = jnp.asarray(
        np.random.RandomState(1).rand(A, S).astype(np.float32))

    out = {"S": S, "A": A, "K": K}
    methods = ["rotate_pallas", "fourier"] + ([] if skip_xla
                                              else ["rotate_xla"])
    for m in methods:
        fwd = lambda im: R.radon(im, angles, method=m)          # noqa: E731

        def loss(im):
            s = R.radon(im, angles, method=m)
            return jnp.sum((s - sino0) ** 2)

        step = jax.grad(loss)
        out[f"{m}_fwd_ms"] = round(time_scan(fwd, img, K), 3)
        out[f"{m}_fwdbwd_ms"] = round(time_scan(step, img, K), 3)
        print(json.dumps(out), flush=True)

    # numerical agreement of the kernel with the oracle on-device (bf16
    # one-hot noise)
    if not skip_xla:
        a = np.asarray(jax.jit(
            lambda im: R.radon(im, angles, method="rotate_pallas"))(img))
        b = np.asarray(jax.jit(
            lambda im: R.radon(im, angles, method="rotate_xla"))(img))
        out["rel_l2_vs_oracle"] = float(np.linalg.norm(a - b)
                                        / np.linalg.norm(b))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
