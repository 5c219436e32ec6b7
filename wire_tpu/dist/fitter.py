"""Mesh-sharded pointwise INR fitting.

Coordinates/targets are sharded along axis 0 over the mesh's 'data' axis;
parameters and optimizer state are replicated.  Each device draws its own
permutation of its local shard (deterministic fold of the global seed by
device index — no host-0 broadcast of a global index array, SURVEY.md §7
hard part 4), computes local-mean gradients, and the gradients are
``pmean``-ed over ICI before a replicated Adam update — the wire_tpu "DP".

Semantics note: minibatch *composition* differs from the single-device
trainer (local per-device permutations instead of one global permutation);
with equal shard sizes the gradient of the global batch mean equals the
pmean of local means, so full-batch steps are exactly equivalent (tested in
tests/test_dist.py), and stochastic steps are statistically equivalent.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wire_tpu.train.trainer import (FitConfig, FitResult, make_optimizer,
                                    track_best, _PROGRAMS)


def fit_pointwise_sharded(model, params, coords, target, cfg: FitConfig,
                          mesh: Mesh, *, gt=None, track="gt", donate=True,
                          global_perm=False):
    """Sharded counterpart of train.trainer.fit_pointwise.

    Requires npoints divisible by the mesh size (pad upstream if needed) —
    shards must be equal for pmean-of-means to equal the global mean.

    global_perm=False (default, scalable): coords/target are sharded over
    the mesh and each device permutes its local shard — no global index
    array anywhere.  Minibatch composition differs from the single-device
    trainer (statistically equivalent; exactly equivalent for full batches).

    global_perm=True (exact): coords/target are REPLICATED, every device
    draws the SAME epoch permutation from the same key stream as
    train.trainer.fit_pointwise and takes its slice of each global chunk, so
    minibatch composition — and hence the whole optimization trajectory —
    matches the single-device trainer to float-reduction order.  Gradients
    combine by psum of partial sums over the global valid count; the
    reconstruction buffer merges by a psum of disjoint scatters per chunk
    (one buffer-sized collective per chunk: use for image-scale signals, not
    volumes).
    """
    if global_perm:
        return _fit_global_perm(model, params, coords, target, cfg, mesh,
                                gt=gt, track=track, donate=donate)
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    npoints = coords.shape[0]
    if npoints % ndev:
        raise ValueError(f"npoints={npoints} not divisible by mesh size "
                         f"{ndev}; pad the coordinate set")
    local_n = npoints // ndev
    mp_local = min(max(cfg.maxpoints // ndev, 1), local_n)
    nchunks = (local_n + mp_local - 1) // mp_local
    npad = nchunks * mp_local - local_n

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    coords = jax.device_put(jnp.asarray(coords), shard)
    target = jax.device_put(jnp.asarray(target), shard)
    gt_arr = target if gt is None else jax.device_put(jnp.asarray(gt), shard)
    params = jax.device_put(params, repl)

    seg = min(cfg.niters, max(cfg.scan_segment, 1))
    cache_key = (model, cfg, seg, mesh, npoints, coords.shape[-1],
                 target.shape[-1], track, donate)
    tx = make_optimizer(cfg, params, npoints=npoints, nchunks=nchunks)

    def epoch_body_local(carry, _, *, lc, lt, lgt):
        """Runs per device under shard_map: lc/lt (local_n, ...)."""
        params, opt_state, rec, key, best_mse, best_rec, best_params = carry
        key, sub = jax.random.split(key)
        dev = jax.lax.axis_index(axis)
        sub = jax.random.fold_in(sub, dev)
        perm = jax.random.permutation(sub, local_n)
        if npad:
            perm = jnp.concatenate(
                [perm, jnp.full((npad,), local_n, perm.dtype)])
        perm = perm.reshape(nchunks, mp_local)

        def chunk_body(inner, idx):
            params, opt_state, rec = inner
            # local masked mean; with equal shards and no remainder this is
            # the per-device contribution to the global batch mean.  Sentinel
            # (== local_n) indices are tail-contiguous by construction of
            # perm above, as step_grads requires.
            nvalid = jnp.sum(idx < local_n)
            safe = jnp.minimum(idx, local_n - 1)
            denom = nvalid.astype(jnp.float32) * lt.shape[-1]
            pred, grads, csums = model.step_grads(
                params, lc[safe], lt[safe], nvalid=nvalid, denom=denom,
                gt=lgt[safe], want_metrics=True)
            grads = jax.lax.pmean(grads, axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            rec = rec.at[idx].set(pred, mode="drop")
            return (params, opt_state, rec), csums

        (params, opt_state, rec), chunk_sums = jax.lax.scan(
            chunk_body, (params, opt_state, rec), perm)

        # every local point is predicted exactly once per epoch, so the
        # accumulated masked sums equal the rec-buffer reductions (the
        # sums come from inside the fused step kernel where one exists)
        inv = 1.0 / (local_n * lt.shape[-1])
        mse_noisy = jax.lax.pmean(jnp.sum(chunk_sums[0]) * inv, axis)
        mse_gt = jax.lax.pmean(jnp.sum(chunk_sums[1]) * inv, axis)
        tracked = mse_gt if track == "gt" else mse_noisy
        # tracked is pmean'd -> is_best is uniform across devices, so the
        # cond branches identically everywhere
        is_best = tracked < best_mse
        best_mse = jnp.where(is_best, tracked, best_mse)
        best_rec, best_params = track_best(
            is_best, (rec, params), (best_rec, best_params))
        return ((params, opt_state, rec, key, best_mse, best_rec,
                 best_params), (mse_gt, mse_noisy))

    pspec_carry = (P(), P(), P(axis), P(), P(), P(axis), P())
    return _drive(model, cfg, mesh, cache_key, pspec_carry,
                  epoch_body_local, coords, target, gt_arr, params, tx,
                  donate, shard)


def _fit_global_perm(model, params, coords, target, cfg: FitConfig,
                     mesh: Mesh, *, gt, track, donate):
    """Exact-composition sharded fit: replicated data, one shared epoch
    permutation (the single-device trainer's key stream), each device takes
    its slice of every global chunk.  Gradient = psum of partial sums over
    the global valid count; reconstruction merges disjoint scatters by psum.
    Trajectory matches train.trainer.fit_pointwise to reduction order."""
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    npoints = coords.shape[0]
    mp = min(cfg.maxpoints, npoints)
    nchunks = (npoints + mp - 1) // mp
    npad = nchunks * mp - npoints
    if mp % ndev:
        raise ValueError(f"chunk size {mp} not divisible by mesh size "
                         f"{ndev}; adjust maxpoints")
    mp_local = mp // ndev

    repl = NamedSharding(mesh, P())
    coords = jax.device_put(jnp.asarray(coords), repl)
    target = jax.device_put(jnp.asarray(target), repl)
    gt_arr = target if gt is None else jax.device_put(jnp.asarray(gt), repl)
    params = jax.device_put(params, repl)

    seg = min(cfg.niters, max(cfg.scan_segment, 1))
    cache_key = (model, cfg, seg, mesh, npoints, coords.shape[-1],
                 target.shape[-1], track, donate, "global_perm")
    tx = make_optimizer(cfg, params, npoints=npoints, nchunks=nchunks)

    def epoch_body(carry, _, *, lc, lt, lgt):
        params, opt_state, rec, key, best_mse, best_rec, best_params = carry
        key, sub = jax.random.split(key)           # same stream as trainer
        perm = jax.random.permutation(sub, npoints)
        if npad:
            perm = jnp.concatenate(
                [perm, jnp.full((npad,), npoints, perm.dtype)])
        perm = perm.reshape(nchunks, ndev, mp_local)
        dev = jax.lax.axis_index(axis)

        def chunk_body(inner, idx_all):
            params, opt_state, rec = inner
            idx = jax.lax.dynamic_index_in_dim(idx_all, dev, 0,
                                               keepdims=False)
            # partial of the GLOBAL chunk masked mean; psum(grads) completes
            # the sum — identical value to the single-device chunk loss.
            # Sentinels sit at the global permutation's tail, so each
            # device's slice keeps them tail-contiguous (step_grads' mask
            # contract).
            nvalid = jnp.sum(idx < npoints)
            safe = jnp.minimum(idx, npoints - 1)
            cnt = jax.lax.psum(nvalid.astype(jnp.float32), axis)
            pred, grads, csums = model.step_grads(
                params, lc[safe], lt[safe], nvalid=nvalid,
                denom=cnt * lt.shape[-1], gt=lgt[safe], want_metrics=True)
            grads = jax.lax.psum(grads, axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # per-chunk indices are disjoint across devices: merge the
            # scatters with one psum, overwrite touched rows only
            delta = jnp.zeros_like(rec).at[idx].set(pred, mode="drop")
            mask = jnp.zeros((npoints,), rec.dtype).at[idx].set(
                1.0, mode="drop")
            delta = jax.lax.psum(delta, axis)
            mask = jax.lax.psum(mask, axis)[:, None]
            rec = rec * (1.0 - mask) + delta
            return (params, opt_state, rec), csums

        (params, opt_state, rec), chunk_sums = jax.lax.scan(
            chunk_body, (params, opt_state, rec), perm)

        # each global point is predicted once per epoch across all devices:
        # psum of the accumulated per-device masked sums equals the
        # rec-buffer reductions (one scalar-pair collective per epoch)
        inv = 1.0 / (npoints * lt.shape[-1])
        mse_noisy = jax.lax.psum(jnp.sum(chunk_sums[0]), axis) * inv
        mse_gt = jax.lax.psum(jnp.sum(chunk_sums[1]), axis) * inv
        tracked = mse_gt if track == "gt" else mse_noisy
        is_best = tracked < best_mse
        best_mse = jnp.where(is_best, tracked, best_mse)
        best_rec, best_params = track_best(
            is_best, (rec, params), (best_rec, best_params))
        return ((params, opt_state, rec, key, best_mse, best_rec,
                 best_params), (mse_gt, mse_noisy))

    pspec_carry = (P(),) * 7
    return _drive(model, cfg, mesh, cache_key, pspec_carry, epoch_body,
                  coords, target, gt_arr, params, tx, donate, repl)

def _drive(model, cfg, mesh, cache_key, pspec_carry, epoch_body, coords,
           target, gt_arr, params, tx, donate, rec_sharding):
    """Shared shard_map driver: builds (and caches) the jitted segmented
    scan program for an epoch body and runs it to cfg.niters."""
    data_pspec = rec_sharding.spec
    seg = min(cfg.niters, max(cfg.scan_segment, 1))
    opt_state = jax.device_put(tx.init(params),
                               NamedSharding(mesh, P()))
    key = jax.random.key(cfg.seed)

    def build(seg_len):
        key2 = cache_key + (seg_len,)
        hit = _PROGRAMS.get(key2)
        if hit is not None:
            return hit

        def run_sharded(carry, lc, lt, lgt):
            body = partial(epoch_body, lc=lc, lt=lt, lgt=lgt)
            return jax.lax.scan(body, carry, None, length=seg_len)

        shard_run = jax.shard_map(
            run_sharded, mesh=mesh,
            in_specs=(pspec_carry, data_pspec, data_pspec, data_pspec),
            out_specs=(pspec_carry, (P(), P())),
            check_vma=False)
        run = jax.jit(shard_run, donate_argnums=(0,) if donate else ())
        _PROGRAMS[key2] = run
        return run

    run = build(seg)

    rec0 = jax.device_put(jnp.zeros_like(target), rec_sharding)
    best_rec0 = jax.device_put(jnp.zeros_like(target), rec_sharding)
    carry0 = (params, opt_state, rec0, key, jnp.asarray(jnp.inf),
              best_rec0, jax.tree.map(jnp.copy, params))
    t0 = time.time()
    carry = carry0
    gts, noisys = [], []
    done = 0
    while done < cfg.niters:
        this = min(seg, cfg.niters - done)
        r = run if this == seg else build(this)
        carry, (mg, mn) = r(carry, coords, target, gt_arr)
        gts.append(mg)
        noisys.append(mn)
        done += this
    jax.block_until_ready(carry)
    wall = time.time() - t0
    mse_gt = jnp.concatenate(gts)
    mse_noisy = jnp.concatenate(noisys)
    params, _, rec, _, best_mse, best_rec, best_params = carry
    return FitResult(
        params=params, best_params=best_params,
        best_rec=np.asarray(best_rec), final_rec=np.asarray(rec),
        mse_gt=np.asarray(mse_gt), mse_noisy=np.asarray(mse_noisy),
        best_mse=float(np.asarray(best_mse).ravel()[0]), wall_time_s=wall)
