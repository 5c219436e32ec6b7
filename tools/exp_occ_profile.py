#!/usr/bin/env python
"""Decompose the occupancy chunk protocol's cost (VERDICT r4 #5): at the
256^3 protocol shape, time scan variants that add one piece at a time:

  A kernel-only:   fixed contiguous chunk, no gather/scatter/permutation
  B +seq-gather:   per-chunk dynamic-slice of target/gt (contiguous rows)
  C +rand-gather:  random per-point permutation gather (the protocol's)
  D +scatter:      C plus rec.at[idx].set  (the full protocol physics)
  E +sorted:       D with within-chunk sorted indices (sort_chunks)
  F +blockperm:    D with BLOCK-permuted indices (contiguous 512-row blocks
                   permuted instead of points; gather/scatter ride wide
                   rows) — the candidate mitigation

Each variant runs K chunks inside one jitted lax.scan (tunnel-safe
timing), carrying params/opt/rec state.  Usage: exp_occ_profile.py [size] [K]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    import jax
    import jax.numpy as jnp
    import optax
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C, image as I

    im = I.synthetic_volume(size, seed=0)
    npoints = size ** 3
    target = jnp.asarray(im.reshape(-1, 1))
    grid = C.GridSpec(size, size, size)
    mp = int(2e5)
    model = get_inr("wire", in_features=3, out_features=1,
                    hidden_features=300, hidden_layers=3,
                    first_omega0=20.0, hidden_omega0=20.0, scale=10.0)
    params = model.init(jax.random.key(0))
    tx = optax.adam(5e-3)
    opt0 = tx.init(params)
    BS = 512
    nblocks = npoints // BS
    bpc = mp // BS          # blocks per chunk

    def step_update(params, opt_state, coords_rows, tgt_rows):
        pred, grads = model.step_grads(params, coords_rows, tgt_rows)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, pred

    def variant(kind):
        def scan_fn(params, opt0, key):
            rec = jnp.zeros((npoints, 1), jnp.float32)

            def body(carry, k):
                params, opt, rec, key = carry
                key, sub = jax.random.split(key)
                if kind in ("A", "B"):
                    start = (k * mp) % (npoints - mp)
                    idx = start + jnp.arange(mp)
                elif kind == "F":
                    blk = jax.random.randint(sub, (bpc,), 0, nblocks)
                    idx = (blk[:, None] * BS + jnp.arange(BS)[None]).reshape(-1)
                else:
                    idx = jax.random.randint(sub, (mp,), 0, npoints)
                    if kind == "E":
                        idx = jnp.sort(idx)
                if kind == "A":
                    rows = grid.rows(idx)
                    t = jax.lax.dynamic_slice(target, (0, 0), (mp, 1))
                elif kind == "F":
                    rows = grid.rows(idx)
                    t = target.reshape(nblocks, BS)[blk].reshape(bpc * BS, 1)
                else:
                    rows = grid.rows(idx)
                    t = target[idx]
                params, opt, pred = step_update(params, opt, rows, t)
                if kind == "D" or kind == "E":
                    rec = rec.at[idx].set(pred, mode="drop")
                elif kind == "F":
                    rec = rec.reshape(nblocks, BS).at[blk].set(
                        pred.reshape(bpc, BS)).reshape(npoints, 1)
                return (params, opt, rec, key), jnp.sum(pred)
            (params, _, rec, _), s = jax.lax.scan(
                body, (params, opt0, rec, key), jnp.arange(K))
            return s
        return jax.jit(scan_fn)

    out = {}
    for kind in "ABCDEF":
        f = variant(kind)
        r = f(params, opt0, jax.random.key(1))
        np.asarray(r).ravel()[:1]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(params, opt0, jax.random.key(1))
            np.asarray(r).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        out[kind] = round(best * 1e3 / K, 2)
        print(f"variant {kind}: {out[kind]} ms/chunk", flush=True)
    out["coords_per_s_D"] = round(mp / (out["D"] * 1e-3), 0)
    out["coords_per_s_F"] = round(bpc * BS / (out["F"] * 1e-3), 0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
