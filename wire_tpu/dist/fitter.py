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
                          global_perm=False, epoch_sums=None):
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
    from wire_tpu.signals.coords import GridSpec
    if getattr(cfg, "block_perm", 0):
        # the block-permutation gather optimization (trainer.FitConfig,
        # r5) is implemented on the single-device trainer only; refusing
        # beats silently running a different composition than requested
        raise NotImplementedError(
            "block_perm is not supported by the sharded fitter yet — "
            "use the single-device trainer, or unset block_perm (the "
            "sharded per-device permutation already keeps gathers local)")
    grid = coords if isinstance(coords, GridSpec) else None
    if global_perm:
        return _fit_global_perm(model, params, coords, target, cfg, mesh,
                                gt=gt, track=track, donate=donate,
                                epoch_sums=epoch_sums, grid=grid)
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    npoints = grid.npoints if grid is not None else coords.shape[0]
    if npoints % ndev:
        raise ValueError(f"npoints={npoints} not divisible by mesh size "
                         f"{ndev}; pad the coordinate set")
    local_n = npoints // ndev
    mp_local = min(max(cfg.maxpoints // ndev, 1), local_n)
    nchunks = (local_n + mp_local - 1) // mp_local
    npad = nchunks * mp_local - local_n

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    if grid is not None:
        # implicit grid: each device computes its chunk coordinates from
        # global row index dev*local_n + local index — NO coordinate shard
        # in HBM anywhere (the multi-host story with zero coordinate
        # feeding; see signals.coords.GridSpec)
        coords = jax.device_put(jnp.zeros((ndev, 1), jnp.float32), shard)
    else:
        coords = jax.device_put(jnp.asarray(coords), shard)
    target = jax.device_put(jnp.asarray(target), shard)
    gt_arr = target if gt is None else jax.device_put(jnp.asarray(gt), shard)
    params = jax.device_put(params, repl)

    seg = min(cfg.niters, max(cfg.scan_segment, 1))
    cache_key = (model, cfg, seg, mesh, npoints, grid,
                 target.shape[-1], track, donate, epoch_sums)
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
            c_chunk = (lc[safe] if grid is None
                       else grid.rows(dev * local_n + safe))
            pred, grads, csums = model.step_grads(
                params, c_chunk, lt[safe], nvalid=nvalid, denom=denom,
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
        if epoch_sums is not None:
            # partial sums over the local shard, combined over ICI — the
            # sharded path keeps per-epoch metrics (e.g. occupancy IoU
            # intersection/union counts) instead of dropping them
            extra = jax.tree.map(lambda s: jax.lax.psum(s, axis),
                                 epoch_sums(rec, lt))
        else:
            extra = jnp.float32(0)
        return ((params, opt_state, rec, key, best_mse, best_rec,
                 best_params), (mse_gt, mse_noisy, extra))

    pspec_carry = (P(), P(), P(axis), P(), P(), P(axis), P())
    return _drive(model, cfg, mesh, cache_key, pspec_carry,
                  epoch_body_local, coords, target, gt_arr, params, tx,
                  donate, shard)


def _fit_global_perm(model, params, coords, target, cfg: FitConfig,
                     mesh: Mesh, *, gt, track, donate, epoch_sums=None,
                     grid=None):
    """Exact-composition sharded fit: replicated data, one shared epoch
    permutation (the single-device trainer's key stream), each device takes
    its slice of every global chunk.  Gradient = psum of partial sums over
    the global valid count; reconstruction merges disjoint scatters by psum.
    Trajectory matches train.trainer.fit_pointwise to reduction order."""
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    npoints = grid.npoints if grid is not None else coords.shape[0]
    mp = min(cfg.maxpoints, npoints)
    nchunks = (npoints + mp - 1) // mp
    npad = nchunks * mp - npoints
    if mp % ndev:
        raise ValueError(f"chunk size {mp} not divisible by mesh size "
                         f"{ndev}; adjust maxpoints")
    mp_local = mp // ndev

    repl = NamedSharding(mesh, P())
    if grid is not None:
        coords = jax.device_put(jnp.zeros((1, 1), jnp.float32), repl)
    else:
        coords = jax.device_put(jnp.asarray(coords), repl)
    target = jax.device_put(jnp.asarray(target), repl)
    gt_arr = target if gt is None else jax.device_put(jnp.asarray(gt), repl)
    params = jax.device_put(params, repl)

    seg = min(cfg.niters, max(cfg.scan_segment, 1))
    cache_key = (model, cfg, seg, mesh, npoints, grid,
                 target.shape[-1], track, donate, epoch_sums, "global_perm")
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
            c_chunk = lc[safe] if grid is None else grid.rows(safe)
            pred, grads, csums = model.step_grads(
                params, c_chunk, lt[safe], nvalid=nvalid,
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
        # rec is replicated here: epoch metrics need no collective
        extra = (epoch_sums(rec, lt) if epoch_sums is not None
                 else jnp.float32(0))
        return ((params, opt_state, rec, key, best_mse, best_rec,
                 best_params), (mse_gt, mse_noisy, extra))

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
            out_specs=(pspec_carry, (P(), P(), P())),
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
    gts, noisys, extras = [], [], []
    done = 0
    while done < cfg.niters:
        this = min(seg, cfg.niters - done)
        r = run if this == seg else build(this)
        carry, (mg, mn, ex) = r(carry, coords, target, gt_arr)
        gts.append(mg)
        noisys.append(mn)
        extras.append(ex)
        done += this
    jax.block_until_ready(carry)
    wall = time.time() - t0
    mse_gt = np.concatenate([np.asarray(h) for h in gts])
    mse_noisy = np.concatenate([np.asarray(h) for h in noisys])
    params, _, rec, _, best_mse, best_rec, best_params = carry

    def fetch(arr):
        # the rec buffers are sharded over the mesh; with >1 process their
        # shards span non-addressable devices and np.asarray refuses — pull
        # the global value with an allgather (metrics/params are replicated
        # and unaffected)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                arr, tiled=True))
        return np.asarray(arr)

    res = FitResult(
        params=params, best_params=best_params,
        best_rec=fetch(best_rec), final_rec=fetch(rec),
        mse_gt=mse_gt, mse_noisy=mse_noisy,
        best_mse=float(np.asarray(best_mse).ravel()[0]), wall_time_s=wall)
    # per-epoch metric sums (e.g. IoU intersection/union counts), already
    # collectively combined in-program
    res.time_array = jax.tree.map(
        lambda *segs: np.concatenate([np.asarray(s) for s in segs]), *extras)
    return res


def fit_operator_sharded(model, params, coords, measurement, operator_fn,
                         cfg: FitConfig, mesh: Mesh, *, gt_field=None,
                         field_shape, track="gt", donate=True):
    """Sharded counterpart of train.trainer.fit_operator (the CT/SISR loop,
    bspline_ct.py:146-157): the full-grid render is sharded along the
    coordinate axis — each device renders its rows, an ``all_gather`` over
    ICI assembles the field, and the (comparatively cheap) forward operator
    + loss run replicated.  Gradients combine by ``pmean``: the all_gather
    transpose (a psum-scatter of the replicated cotangent) scales each
    device's slice contribution by the mesh size, and the pmean cancels it,
    so the combined gradient equals the single-device gradient exactly (to
    reduction order).  The optimization trajectory is deterministic (no
    minibatching), hence identical to ``fit_operator`` — asserted in
    tests/test_dist.py."""
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    npoints = coords.shape[0]
    if npoints % ndev:
        raise ValueError(f"npoints={npoints} not divisible by mesh size "
                         f"{ndev}; pad the coordinate set")
    cfg = dataclasses.replace(cfg, schedule_per="iter")

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    coords = jax.device_put(jnp.asarray(coords), shard)
    measurement = jax.device_put(jnp.asarray(measurement), repl)
    has_gt = gt_field is not None
    gt_arr = (measurement if gt_field is None
              else jax.device_put(jnp.asarray(gt_field), repl))
    params = jax.device_put(params, repl)

    seg = min(cfg.niters, max(cfg.scan_segment, 1))
    cache_key = (model, cfg, seg, mesh, npoints, tuple(field_shape),
                 operator_fn, track, has_gt, donate, "operator_sharded")
    tx = make_optimizer(cfg, params, nchunks=1)

    def build(seg_len):
        key2 = cache_key + (seg_len,)
        hit = _PROGRAMS.get(key2)
        if hit is not None:
            return hit

        def run_sharded(carry, lc, lm, lg):
            def loss_fn(p):
                local = model.apply(p, lc)                 # (N/ndev, C)
                full = jax.lax.all_gather(local, axis, tiled=True)
                field = full.reshape(field_shape)
                est = operator_fn(field)
                return jnp.mean((est - lm) ** 2), field

            def step(carry, _):
                (params, opt_state, best_loss, best_field,
                 best_params) = carry
                (loss, field), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                grads = jax.lax.pmean(grads, axis)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if has_gt and track == "gt":
                    tracked = jnp.mean((field - lg) ** 2)
                else:
                    tracked = loss
                is_best = tracked < best_loss
                best_loss = jnp.where(is_best, tracked, best_loss)
                best_field, best_params = track_best(
                    is_best, (field, params), (best_field, best_params))
                return (params, opt_state, best_loss, best_field,
                        best_params), (loss, tracked)

            return jax.lax.scan(step, carry, None, length=seg_len)

        pspec_carry = (P(),) * 5
        shard_run = jax.shard_map(
            run_sharded, mesh=mesh,
            in_specs=(pspec_carry, P(axis), P(), P()),
            out_specs=(pspec_carry, (P(), P())),
            check_vma=False)
        run = jax.jit(shard_run, donate_argnums=(0,) if donate else ())
        _PROGRAMS[key2] = run
        return run

    run = build(seg)
    opt_state = jax.device_put(tx.init(params), repl)
    field0 = jax.device_put(jnp.zeros(field_shape, measurement.dtype), repl)
    carry = (params, opt_state, jnp.asarray(jnp.inf), field0,
             jax.tree.map(jnp.copy, params))
    loss_h, tracked_h = [], []
    t0 = time.time()
    done = 0
    while done < cfg.niters:
        this = min(seg, cfg.niters - done)
        r = run if this == seg else build(this)
        carry, (lh, th) = r(carry, coords, measurement, gt_arr)
        loss_h.append(lh)
        tracked_h.append(th)
        done += this
    jax.block_until_ready(carry)
    wall = time.time() - t0
    params, _, best_loss, best_field, best_params = carry
    return FitResult(
        params=params, best_params=best_params,
        best_rec=np.asarray(best_field), final_rec=None,
        mse_gt=np.concatenate([np.asarray(h) for h in tracked_h]),
        mse_noisy=np.concatenate([np.asarray(h) for h in loss_h]),
        best_mse=float(np.asarray(best_loss).ravel()[0]), wall_time_s=wall)


def fit_frames_sharded(model, params, frame_coords, frame_pixels,
                       frame_masks, cfg: FitConfig, mesh: Mesh, *, hr_shape,
                       scale, batch_size=4, donate=True):
    """Sharded counterpart of train.trainer.fit_frames (multi-SR,
    wire_multi_sr.py:183-208): each optimizer step's frame batch is split
    across the mesh — device d renders batch_size/ndev frames — and the
    masked squared-error partial sums (and their gradients) combine by
    ``psum`` over the global valid count.  The epoch permutation uses the
    SAME key stream as the single-device fitter, so batch composition and
    the whole trajectory match ``fit_frames`` exactly (to reduction order).

    Frame data is replicated (multi-SR stacks are a few dozen image frames —
    SURVEY.md §2.5 axis 2); the sharded axis is the per-step render, which
    is where the FLOPs are."""
    from wire_tpu.ops.resample import avg_pool2d

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    frame_coords = jnp.asarray(frame_coords)
    frame_pixels = jnp.asarray(frame_pixels)
    frame_masks = jnp.asarray(frame_masks)
    nframes = frame_coords.shape[0]
    H, W, C = hr_shape
    bs = min(batch_size, nframes)
    if bs % ndev:
        raise ValueError(f"batch_size={bs} not divisible by mesh size "
                         f"{ndev}")
    bs_local = bs // ndev
    nbatches = (nframes + bs - 1) // bs
    npad = nbatches * bs - nframes

    repl = NamedSharding(mesh, P())
    frame_coords = jax.device_put(frame_coords, repl)
    frame_pixels = jax.device_put(frame_pixels, repl)
    frame_masks = jax.device_put(frame_masks, repl)
    params = jax.device_put(params, repl)

    seg = min(cfg.niters, max(cfg.scan_segment, 1))
    cache_key = (model, cfg, seg, mesh, frame_coords.shape,
                 frame_pixels.shape, tuple(hr_shape), scale, bs, donate,
                 "frames_sharded")
    tx = make_optimizer(cfg, None, nchunks=nbatches)

    def build(seg_len):
        key2 = cache_key + (seg_len,)
        hit = _PROGRAMS.get(key2)
        if hit is not None:
            return hit

        def run_sharded(carry, fc, fp, fm):
            carry, key0 = carry
            carry = (carry, key0)
            # per-frame LR element count (err.size / bs in the single-device
            # loss, wire_multi_sr.py:197 semantics)
            per_frame = (H // scale) * (W // scale) * C

            def batch_loss(p, fidx):
                # fidx: (bs_local,) this device's slice of the global batch
                valid = (fidx < nframes).astype(fp.dtype)
                safe = jnp.minimum(fidx, nframes - 1)
                rend = model.apply(p, fc[safe])           # (bsl, H*W, C)
                nchw = jnp.transpose(rend.reshape(bs_local, H, W, C),
                                     (0, 3, 1, 2))
                lr = jnp.transpose(avg_pool2d(nchw, scale), (0, 2, 3, 1))
                lr = lr.reshape(bs_local, -1, C)
                m = fm[safe] * valid[:, None, None]
                err = (lr - fp[safe]) * m
                nvalid = jax.lax.psum(valid.sum(), axis)
                # partial of the global masked mean; psum of grads (and of
                # the loss values) completes it
                return jnp.sum(err ** 2) / (per_frame
                                            * jnp.maximum(nvalid, 1))

            def step(carry, idx_all):
                params, opt_state, best_loss, best_params = carry
                dev = jax.lax.axis_index(axis)
                fidx = jax.lax.dynamic_slice_in_dim(
                    idx_all, dev * bs_local, bs_local)
                loss_p, grads = jax.value_and_grad(batch_loss)(params, fidx)
                loss = jax.lax.psum(loss_p, axis)
                grads = jax.lax.psum(grads, axis)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                is_best = loss < best_loss
                best_loss = jnp.where(is_best, loss, best_loss)
                best_params = track_best(is_best, params, best_params)
                return (params, opt_state, best_loss, best_params), loss

            def epoch(carry, _):
                inner, key = carry
                key, sub = jax.random.split(key)      # fit_frames' stream
                order = jax.random.permutation(sub, nframes)
                if npad:
                    order = jnp.concatenate(
                        [order, jnp.full((npad,), nframes, order.dtype)])
                order = order.reshape(nbatches, bs)
                inner, losses = jax.lax.scan(step, inner, order)
                return (inner, key), jnp.sum(losses)

            (inner, key2_), mse_hist = jax.lax.scan(
                epoch, carry, None, length=seg_len)
            return (inner, key2_), mse_hist

        pspec_carry = ((P(), P(), P(), P()), P())
        shard_run = jax.shard_map(
            run_sharded, mesh=mesh,
            in_specs=(pspec_carry, P(), P(), P()),
            out_specs=(pspec_carry, P()),
            check_vma=False)
        run = jax.jit(shard_run, donate_argnums=(0,) if donate else ())
        _PROGRAMS[key2] = run
        return run

    run = build(seg)
    opt_state = jax.device_put(tx.init(params), repl)
    carry = ((params, opt_state, jnp.asarray(jnp.inf),
              jax.tree.map(jnp.copy, params)), jax.random.key(cfg.seed))
    hists = []
    t0 = time.time()
    done = 0
    while done < cfg.niters:
        this = min(seg, cfg.niters - done)
        r = run if this == seg else build(this)
        carry, h = r(carry, frame_coords, frame_pixels, frame_masks)
        hists.append(h)
        done += this
    (params_f, _, best_loss, best_params), _key = carry
    jax.block_until_ready(best_loss)
    wall = time.time() - t0
    mse_hist = np.concatenate([np.asarray(h) for h in hists])
    return FitResult(
        params=params_f, best_params=best_params, best_rec=None,
        final_rec=None, mse_gt=mse_hist, mse_noisy=mse_hist,
        best_mse=float(np.asarray(best_loss).ravel()[0]), wall_time_s=wall)
