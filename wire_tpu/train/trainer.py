"""The trainer the reference never had (SURVEY.md §7 L4): jitted Adam fitting
of an INR to one signal, with the reference loop semantics —

- per-epoch random permutation of the coordinate grid, chunks of ``maxpoints``
  (wire_image_denoise.py:142-157, wire_occupancy.py:136-158)
- Adam with torch defaults + LambdaLR ``decay^(epoch/niters)`` stepped per
  epoch (bspline_image_denoise.py:135) or per iteration (bspline_ct.py:141)
- running reconstruction buffer + best-metric tracking
  (bspline_image_denoise.py:155-193)
- optional per-stage learning-rate groups for hierarchical models
  (bspline_ct.py:122-133)

TPU-first: the entire epoch (permutation, chunked fwd/bwd, Adam update,
epoch metrics, best tracking) is one XLA program — ``lax.scan`` over chunks
inside ``lax.scan`` over epochs — so a full 2000-epoch fit is a single device
dispatch.  Coordinates can be sharded over a device mesh (see wire_tpu.dist).
"""
from __future__ import annotations

import dataclasses
import hashlib
import os
import time
from functools import partial
from typing import Any, Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class FitConfig:
    learning_rate: Any = 5e-3      # float, or tuple of per-stage LRs
    niters: int = 2000             # epochs (outer loop)
    maxpoints: int = 256 * 256     # chunk size (inner loop)
    lr_decay: float = 0.1          # final LR multiplier
    # reference denoise scripts scale LR by min(1, maxpoints/npoints)
    # (bspline_image_denoise.py:116-118)
    scale_lr_by_batch: bool = False
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    seed: int = 0
    # 'epoch': scheduler steps once per epoch (denoise scripts);
    # 'iter': once per optimizer step (CT/SISR full-grid scripts)
    schedule_per: str = "epoch"
    # cap on scan length per device program: very long single programs can
    # exceed remote-backend execution deadlines (observed ~2min limit on the
    # tunneled backend); the fit loops over segments carrying state
    # (optimizer counts continue across segments, so results are identical)
    scan_segment: int = 250
    # sort indices WITHIN each chunk of the epoch permutation: chunk
    # membership (hence the optimization trajectory) is unchanged — a
    # chunk's gradient is a mean, so within-chunk order only permutes the
    # float reduction order — but sorted rows turn the chunk gather/
    # scatter into near-sequential HBM access (TPU random gathers are the
    # chunk protocol's bottleneck).  Sorting keeps padding sentinels
    # tail-contiguous (they are the largest values).  Off by default for
    # bitwise reference-composition parity.  (r5 note: measured at the
    # occupancy shape the in-chunk sort costs MORE than it saves —
    # tools/exp_occ_profile.py; block_perm below is the winning lever.)
    sort_chunks: bool = False
    # Permute contiguous BLOCKS of this many points instead of single
    # points (0 = off, the reference's exact per-point permutation).  The
    # per-chunk target/gt gather and rec scatter then move (block x c)-wide
    # rows instead of single elements, and the per-epoch permutation sorts
    # npoints/block keys instead of npoints — measured at the 256^3
    # occupancy shape this removes ALL of the random-access overhead
    # (chunk cost drops to the kernel-only floor; tools/exp_occ_profile.py:
    # 10.4 -> 7.6 ms/chunk).  DEVIATION: minibatches are then unions of
    # random contiguous blocks (e.g. z-runs of the volume grid), not
    # uniform point samples — gradients stay unbiased, per-chunk variance
    # rises slightly; quality parity at the occupancy protocol is pinned in
    # tools/exp_occ_blockperm.py.  Requires npoints % block_perm == 0 and
    # no tv_weight.
    block_perm: int = 0


@dataclasses.dataclass
class CheckpointSpec:
    """Mid-fit checkpoint/resume (the capability the reference lacks,
    SURVEY.md §5): the fitter snapshots its full scan carry — params,
    optimizer state, reconstruction buffer, RNG key, best-* tracking — plus
    the metric history at segment boundaries (the natural boundary: one
    device program per <=scan_segment epochs).  A resumed fit reproduces
    the uninterrupted trajectory exactly (the carry IS the whole state:
    optimizer step counts and the epoch key stream continue bit-for-bit) —
    tested in tests/test_trainer.py."""
    path: str
    every: int = 1       # segments between saves
    resume: bool = True  # load an existing checkpoint before fitting


def _is_key(leaf):
    return jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)


def _fit_fingerprint(cfg, model, *arrays):
    """Digest of (config, architecture, input data) written into mid-fit
    checkpoints: a resume against a checkpoint from a DIFFERENT fit (same
    path, but other data/config — e.g. a regenerated measurement) is
    silent corruption otherwise.  Host/numpy inputs are digested by
    shape/dtype/sum (cheap, catches content changes); arrays already on a
    device contribute shape/dtype only — digesting them would force a
    device->host transfer, which tunneled backends make expensive."""
    h = hashlib.md5()
    if isinstance(cfg, FitConfig):
        # scan_segment partitions the same trajectory into device programs
        # ("results are identical") and is retuned to fit tunnel deadlines —
        # a resume after retuning it must NOT be refused
        cfg = dataclasses.replace(cfg, scan_segment=0)
    h.update(repr(cfg).encode())
    h.update(repr(getattr(model, "spec", model)).encode())
    for a in arrays:
        _digest_value(h, a)
    return h.hexdigest()


def _digest_value(h, a):
    if a is None:
        h.update(b"none")
        return
    if dataclasses.is_dataclass(a) and not isinstance(a, type):
        h.update(repr(a).encode())        # e.g. signals.coords.GridSpec
        return
    if isinstance(a, (str, int, float, bool, bytes)):
        h.update(repr(a).encode())
        return
    if isinstance(a, (tuple, list)):
        for v in a:
            _digest_value(h, v)
        return
    if isinstance(a, partial):
        # functools.partial (e.g. partial(metric, thres=0.4)): digest the
        # wrapped callable AND the bound args/kwargs — two partials of the
        # same function with different bound thresholds must not collide
        # (ADVICE r3 #1)
        h.update(b"functools.partial")
        _digest_value(h, a.func)
        _digest_value(h, tuple(a.args))
        for k in sorted(a.keywords):
            h.update(k.encode())
            _digest_value(h, a.keywords[k])
        return
    if callable(a) and not hasattr(a, "shape") and not hasattr(a, "spec") \
            and getattr(a, "__closure__", "no") != "no":
        # plain functions/lambdas (e.g. an epoch_metric): identify by
        # qualname + code consts/names + closure cell values so a resume
        # with a changed metric (edited body, different inline threshold,
        # different closure) is refused rather than silently mixing
        # incompatible 'extra' histories (ADVICE r2 + r3 review).
        # Deliberately NOT co_code: raw bytecode changes with every CPython
        # minor version, which would refuse every resume across interpreter
        # upgrades (ADVICE r3 #2); consts + names + arity catch the edits
        # that change semantics.
        h.update(getattr(a, "__qualname__", repr(type(a))).encode())
        code = getattr(a, "__code__", None)
        if code is not None:
            h.update(repr((code.co_argcount, code.co_names,
                           code.co_varnames)).encode())
            for const in code.co_consts:
                if isinstance(const, (int, float, str, bool, bytes,
                                      type(None))):
                    h.update(repr(const).encode())
        for cell in (a.__closure__ or ()):
            try:
                _digest_value(h, cell.cell_contents)
            except ValueError:  # empty cell
                h.update(b"emptycell")
        return
    if callable(a) and not hasattr(a, "shape") and not hasattr(a, "spec") \
            and not hasattr(a, "__dict__"):
        # other non-function callables (C-level/builtin): qualname is the
        # best stable identity available (ADVICE r3 #1)
        h.update(repr(type(a)).encode())
        h.update(getattr(a, "__qualname__", "").encode())
        return
    arr = a
    h.update(str(getattr(arr, "shape", ())).encode())
    h.update(str(getattr(arr, "dtype", type(arr).__name__)).encode())
    if isinstance(arr, np.ndarray) and arr.size:
        h.update(np.float64(arr.sum(dtype=np.float64)).tobytes())
        # the sum alone is permutation-invariant (a transposed/flipped
        # signal would pass); a strided sample pins positions cheaply
        flat = arr.reshape(-1)
        stride = max(1, flat.size // 4096)
        h.update(np.ascontiguousarray(
            flat[::stride][:4096].astype(np.float64)).tobytes())
    elif (not hasattr(arr, "shape")
          and getattr(a, "__dict__", None) is not None):
        # hashable operator closures (RadonOp/DownsampleOp): digest their
        # identifying attributes process-stably (python hash() is salted)
        h.update(type(a).__name__.encode())
        for k in sorted(vars(a)):
            h.update(k.encode())
            v = vars(a)[k]
            if isinstance(v, np.ndarray) or hasattr(v, "shape"):
                _digest_value(h, np.asarray(v))
            else:
                h.update(repr(v).encode())


def _save_fit_state(path, carry, hists, done, fingerprint=None):
    leaves, _ = jax.tree_util.tree_flatten(carry)
    payload = {}
    if fingerprint is not None:
        payload["fingerprint"] = np.str_(fingerprint)
    for i, leaf in enumerate(leaves):
        if _is_key(leaf):
            leaf = jax.random.key_data(leaf)
        payload[f"leaf_{i}"] = np.asarray(leaf)
    payload["done"] = np.int64(done)
    payload["nhist"] = np.int64(len(hists))
    for j, h in enumerate(hists):
        for k, arr in enumerate(h if isinstance(h, tuple) else (h,)):
            payload[f"hist_{j}_{k}"] = np.asarray(arr)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)  # atomic: a kill mid-save leaves the old file


def _load_fit_state(path, carry_template, hist_arity, fingerprint=None):
    with np.load(path) as z:
        if fingerprint is not None and "fingerprint" in z:
            saved = str(z["fingerprint"])
            if saved != fingerprint:
                raise ValueError(
                    f"checkpoint {path!r} was written by a DIFFERENT fit — "
                    "resuming it would silently corrupt this run.  Causes: "
                    "changed config, model spec, input data, or epoch_metric "
                    "function (including a partial-bound argument), or a "
                    "checkpoint written by an older wire_tpu fingerprint "
                    "format.  Delete the file or point CheckpointSpec.path "
                    "elsewhere.")
        elif fingerprint is not None:
            from wire_tpu.train.artifacts import log
            log(f"WARNING: checkpoint {path!r} has no fingerprint "
                "(legacy format) — resuming UNVERIFIED; the guard against "
                "foreign checkpoints does not apply.")
        leaves, treedef = jax.tree_util.tree_flatten(carry_template)
        out = []
        for i, leaf in enumerate(leaves):
            arr = z[f"leaf_{i}"]
            if _is_key(leaf):
                out.append(jax.random.wrap_key_data(
                    jnp.asarray(arr).astype(jnp.uint32)))
            else:
                out.append(jnp.asarray(arr).astype(leaf.dtype))
        carry = jax.tree_util.tree_unflatten(treedef, out)
        done = int(z["done"])
        hists = []
        for j in range(int(z["nhist"])):
            if hist_arity is None:
                hists.append(np.asarray(z[f"hist_{j}_0"]))
            else:
                hists.append(tuple(np.asarray(z[f"hist_{j}_{k}"])
                                   for k in range(hist_arity)))
    return carry, hists, done


@dataclasses.dataclass
class FitResult:
    params: Any
    best_params: Any
    best_rec: Any           # reconstruction with the best tracked metric
    final_rec: Any
    mse_gt: np.ndarray      # per-epoch MSE vs clean ground truth
    mse_noisy: np.ndarray   # per-epoch MSE vs (noisy) fitting target
    best_mse: float
    wall_time_s: float
    time_array: Optional[np.ndarray] = None


def track_best(is_best, current, best):
    """Best-so-far update for (pytrees of) buffers.

    ``lax.cond`` instead of per-leaf ``jnp.where`` selects: non-improving
    epochs (the common case late in a fit) skip the buffer copies entirely,
    and improving epochs pay one copy instead of a select per leaf.
    Measured 0.12 ms/epoch cheaper at the 65536-coord WIRE-300 headline
    config (tools/exp_epoch_overhead.py).
    """
    return jax.lax.cond(is_best, lambda: current, lambda: best)


def _lr_schedule(cfg: FitConfig, nchunks: int):
    base = cfg.learning_rate if np.isscalar(cfg.learning_rate) else 1.0

    def schedule(step):
        if cfg.schedule_per == "epoch":
            t = jnp.floor_divide(step, nchunks)
        else:
            t = step
        frac = jnp.minimum(t / cfg.niters, 1.0)
        return base * (cfg.lr_decay ** frac)

    return schedule


def make_optimizer(cfg: FitConfig, params, npoints=None, nchunks=1):
    """Adam matching torch defaults. A tuple learning_rate builds per-stage
    param groups keyed on the 'stages'/'heads' structure of hierarchical
    models (the reference's param-group workaround, bspline_ct.py:122-133)."""
    batch_scale = 1.0
    if cfg.scale_lr_by_batch and npoints is not None:
        batch_scale = min(1.0, cfg.maxpoints / npoints)
    sched = _lr_schedule(cfg, nchunks)

    if np.isscalar(cfg.learning_rate):
        tx = optax.chain(
            optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                                eps_root=0.0),
            optax.scale_by_schedule(lambda s: -sched(s) * batch_scale),
        )
        return tx

    # per-stage LR list: label each leaf by its stage index
    lrs = tuple(cfg.learning_rate)

    def label_tree(params):
        def lab(path, leaf):
            for entry in path:
                if isinstance(entry, jax.tree_util.SequenceKey):
                    return f"stage_{entry.idx}"
            return "stage_0"
        return jax.tree_util.tree_map_with_path(lab, params)

    transforms = {}
    for i, lr in enumerate(lrs):
        transforms[f"stage_{i}"] = optax.chain(
            optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                                eps_root=0.0),
            optax.scale_by_schedule(
                partial(lambda s, lr=lr: -sched(s) * lr * batch_scale)),
        )
    return optax.multi_transform(transforms, label_tree)


def fit_pointwise(model, params, coords, target, cfg: FitConfig, *,
                  gt=None, track="gt", tv_weight=0.0, image_shape=None,
                  donate=True, epoch_metric: Optional[Callable] = None,
                  checkpoint: Optional[CheckpointSpec] = None):
    """Fit an INR pointwise to ``target`` sampled at ``coords``.

    coords: (N, d); target: (N, c); gt: optional clean (N, c) for metrics and
    best tracking (track='gt') — track='noisy' tracks the fitting loss
    (wire_occupancy.py:168-172 tracks train loss; denoise tracks gt MSE).
    tv_weight: optional total-variation regularization (computed WITH
    gradient, fixing the reference's no_grad TV, bspline_image_denoise.py:160-172;
    requires image_shape=(H, W, C)).

    Runs the whole fit in one jitted scan-over-epochs program.
    """
    from wire_tpu.signals.coords import GridSpec
    ckpt_fp = (_fit_fingerprint(cfg, model, coords, target, gt, epoch_metric)
               if checkpoint is not None else None)
    grid = coords if isinstance(coords, GridSpec) else None
    if grid is not None:
        # implicit grid: chunk coordinates are computed on device from the
        # permuted indices (GridSpec.rows) — no (N, d) coordinate table in
        # HBM and no per-chunk random gather of it
        npoints = grid.npoints
        coords = jnp.zeros((1, grid.in_features), jnp.float32)  # unused
    else:
        coords = jnp.asarray(coords)
        npoints = coords.shape[0]
    target = jnp.asarray(target)
    gt_arr = target if gt is None else jnp.asarray(gt)
    U = int(cfg.block_perm or 0)
    if U > 1:
        if npoints % U:
            raise ValueError(
                f"block_perm={U} requires npoints ({npoints}) divisible by "
                f"the block size")
        if tv_weight:
            raise ValueError("block_perm is incompatible with tv_weight "
                             "(TV renders the full grid)")
        nunits = npoints // U
        mpu = max(min(cfg.maxpoints // U, nunits), 1)
        mp = mpu * U
        nchunks = (nunits + mpu - 1) // mpu
        npad = (nchunks * mpu - nunits) * U
    else:
        mp = min(cfg.maxpoints, npoints)
        nchunks = (npoints + mp - 1) // mp
        npad = nchunks * mp - npoints

    seg = min(cfg.niters, max(cfg.scan_segment, 1))
    tx, run = _pointwise_program(
        model, cfg, seg, npoints, nchunks, mp, npad, track, tv_weight,
        image_shape, epoch_metric, donate, grid)
    params, opt_state, key, best_params = _run_setup(model, cfg, tx, params)

    # distinct buffers everywhere (donated args must not alias).  Small
    # buffers: numpy zeros transfer without compiling a device program
    # (cheapest on tunneled backends); big buffers (512^3 rec = 0.5 GB):
    # one tiny cached jnp.zeros program beats two half-gigabyte uploads.
    if target.size * target.dtype.itemsize > (1 << 27):
        z1, z2 = (jnp.zeros(target.shape, target.dtype) for _ in range(2))
    else:
        zeros = np.zeros(target.shape, np.dtype(target.dtype))
        z1, z2 = jnp.asarray(zeros), jnp.asarray(zeros)
    carry = (params, opt_state, z1, key,
             jnp.asarray(np.float32(np.inf)), z2,
             best_params)
    hists = []
    done = 0
    if checkpoint is not None and checkpoint.resume and \
            os.path.exists(checkpoint.path):
        carry, hists, done = _load_fit_state(checkpoint.path, carry, 3,
                                             ckpt_fp)
    t0 = time.time()
    nseg = 0
    while done < cfg.niters:
        this = min(seg, cfg.niters - done)
        if this != seg:
            _, run = _pointwise_program(
                model, cfg, this, npoints, nchunks, mp, npad, track,
                tv_weight, image_shape, epoch_metric, donate, grid)
        carry, hist = run(carry, coords, target, gt_arr)
        hists.append(hist)
        done += this
        nseg += 1
        if checkpoint is not None and (nseg % max(checkpoint.every, 1) == 0
                                       or done >= cfg.niters):
            # histories are concatenated host-side anyway; normalize the
            # saved copies so a resumed run appends cleanly
            hists = [tuple(np.asarray(a) for a in h) for h in hists]
            _save_fit_state(checkpoint.path, carry, hists, done, ckpt_fp)
    jax.block_until_ready(carry)
    wall = time.time() - t0
    # host-side concatenation: an eager jnp.concatenate would compile one
    # more device program per shape (expensive on tunneled backends)
    mse_gt, mse_noisy, extra = (
        np.concatenate([np.asarray(h[i]) for h in hists]) for i in range(3))
    params, _, rec, _, best_mse, best_rec, best_params = carry
    res = FitResult(
        params=params, best_params=best_params,
        best_rec=np.asarray(best_rec), final_rec=np.asarray(rec),
        mse_gt=mse_gt, mse_noisy=mse_noisy,
        best_mse=float(best_mse), wall_time_s=wall)
    if epoch_metric is not None:
        res.time_array = np.asarray(extra)
    return res


def _tv(image_nchw):
    dx = image_nchw[:, :, 1:, :] - image_nchw[:, :, :-1, :]
    dy = image_nchw[:, :, :, 1:] - image_nchw[:, :, :, :-1]
    return jnp.sum(jnp.abs(dx)) + jnp.sum(jnp.abs(dy))


# ---------------------------------------------------------------------------
# Batched multi-fit (VERDICT r4 #6): M independent fits of the same
# architecture in ONE device program — a TPU-native capability the
# reference's serial script loops cannot express.  The epoch body
# (permute -> chunked fused steps -> Adam -> best tracking) is vmapped over
# a leading replica axis of (params, optimizer state, RNG key); the fused
# Pallas step kernels batch through their vmap rule (verified equal to the
# unbatched kernel).  Replica r runs seed cfg.seed + r, reproducing
# fit_pointwise(seed=cfg.seed+r) trajectories exactly (tested).
# ---------------------------------------------------------------------------

def _pointwise_many_program(model, cfg: FitConfig, seg_len, npoints,
                            nchunks, mp, npad, track, donate, grid):
    cache_key = (model, cfg, seg_len, npoints, nchunks, mp, npad, track,
                 donate, grid, "many")
    hit = _PROGRAMS.get(cache_key)
    if hit is not None:
        return hit
    tx = make_optimizer(cfg, None, npoints=npoints, nchunks=nchunks)

    def run_impl(carry, coords, target, gt_arr):
        if grid is not None:
            crows = grid.rows
            cfull = lambda: grid.rows(jnp.arange(npoints))  # noqa: E731
        else:
            crows = lambda s: coords[s]                     # noqa: E731
            cfull = lambda: coords                          # noqa: E731
        full_batch = (nchunks == 1 and npad == 0)
        inv_nc = 1.0 / (npoints * target.shape[-1])

        def epoch_body(carry, _):
            def one(carry):
                (params, opt_state, rec, key, best_mse, best_rec,
                 best_params) = carry
                if full_batch:
                    pred, grads, sums = model.step_grads(
                        params, cfull(), target, gt=gt_arr,
                        want_metrics=True)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    rec = pred
                else:
                    key, sub = jax.random.split(key)
                    perm = jax.random.permutation(sub, npoints)
                    if npad:
                        perm = jnp.concatenate(
                            [perm, jnp.full((npad,), npoints, perm.dtype)])
                    perm = perm.reshape(nchunks, mp)
                    if cfg.sort_chunks:
                        perm = jnp.sort(perm, axis=1)

                    def chunk_body(inner, idx):
                        params, opt_state, rec = inner
                        nvalid = jnp.sum(idx < npoints)
                        safe = jnp.minimum(idx, npoints - 1)
                        denom = (nvalid.astype(jnp.float32)
                                 * target.shape[-1])
                        pred, grads, csums = model.step_grads(
                            params, crows(safe), target[safe],
                            nvalid=nvalid, denom=denom, gt=gt_arr[safe],
                            want_metrics=True)
                        updates, opt_state = tx.update(grads, opt_state,
                                                       params)
                        params = optax.apply_updates(params, updates)
                        rec = rec.at[idx].set(pred, mode="drop")
                        return (params, opt_state, rec), csums

                    (params, opt_state, rec), chunk_sums = jax.lax.scan(
                        chunk_body, (params, opt_state, rec), perm)
                    sums = (jnp.sum(chunk_sums[0]), jnp.sum(chunk_sums[1]))
                mse_noisy = sums[0] * inv_nc
                mse_gt = sums[1] * inv_nc
                tracked = mse_gt if track == "gt" else mse_noisy
                is_best = tracked < best_mse
                best_mse = jnp.where(is_best, tracked, best_mse)
                best_rec, best_params = track_best(
                    is_best, (rec, params), (best_rec, best_params))
                return ((params, opt_state, rec, key, best_mse, best_rec,
                         best_params), (mse_gt, mse_noisy))
            return jax.vmap(one)(carry)

        return jax.lax.scan(epoch_body, carry, None, length=seg_len)

    run = jax.jit(run_impl, donate_argnums=(0,) if donate else ())
    _PROGRAMS[cache_key] = (tx, run)
    return tx, run


def fit_pointwise_many(model, params_stack, coords, target, cfg: FitConfig,
                       *, gt=None, track="gt", donate=False):
    """Fit M replicas of the same architecture in ONE jitted program.

    params_stack: a params pytree with a leading replica axis (e.g.
    ``jax.vmap(lambda k: model.init... )`` or ``jax.tree.map(lambda *x:
    jnp.stack(x), *params_list)``).  Replica r uses seed ``cfg.seed + r``
    and reproduces the ``fit_pointwise(..., seed=cfg.seed+r)`` trajectory.
    Returns a FitResult whose params/recs/histories carry the leading M
    axis (mse histories shaped (niters, M); best_mse (M,))."""
    from wire_tpu.signals.coords import GridSpec
    grid = coords if isinstance(coords, GridSpec) else None
    if grid is not None:
        npoints = grid.npoints
        coords = jnp.zeros((1, grid.in_features), jnp.float32)
    else:
        coords = jnp.asarray(coords)
        npoints = coords.shape[0]
    target = jnp.asarray(target)
    gt_arr = target if gt is None else jnp.asarray(gt)
    M = jax.tree.leaves(params_stack)[0].shape[0]
    mp = min(cfg.maxpoints, npoints)
    nchunks = (npoints + mp - 1) // mp
    npad = nchunks * mp - npoints
    seg = min(cfg.niters, max(cfg.scan_segment, 1))
    tx, run = _pointwise_many_program(model, cfg, seg, npoints, nchunks, mp,
                                      npad, track, donate, grid)
    setup = _fit_setup(model, cfg, tx)
    opt_state, _, best_params = jax.vmap(
        lambda p, s: setup(p, s))(params_stack,
                                  jnp.arange(M, dtype=jnp.uint32) * 0)
    keys = jax.vmap(jax.random.key)(
        jnp.uint32(cfg.seed) + jnp.arange(M, dtype=jnp.uint32))
    c = target.shape[-1]
    z = jnp.zeros((M, npoints, c), target.dtype)
    carry = (params_stack, opt_state, z, keys,
             jnp.full((M,), jnp.inf, jnp.float32), z + 0,
             best_params)
    hists = []
    done = 0
    t0 = time.time()
    while done < cfg.niters:
        this = min(seg, cfg.niters - done)
        if this != seg:
            _, run = _pointwise_many_program(model, cfg, this, npoints,
                                             nchunks, mp, npad, track,
                                             donate, grid)
        carry, hist = run(carry, coords, target, gt_arr)
        hists.append(hist)
        done += this
    jax.block_until_ready(carry)
    wall = time.time() - t0
    mse_gt, mse_noisy = (
        np.concatenate([np.asarray(h[i]) for h in hists]) for i in range(2))
    params, _, rec, _, best_mse, best_rec, best_params = carry
    return FitResult(
        params=params, best_params=best_params,
        best_rec=np.asarray(best_rec), final_rec=np.asarray(rec),
        mse_gt=mse_gt, mse_noisy=mse_noisy,
        best_mse=np.asarray(best_mse), wall_time_s=wall)


def fit_frames(model, params, frame_coords, frame_pixels, frame_masks,
               cfg: FitConfig, *, hr_shape, scale, batch_size=4,
               gt_image=None, donate=True,
               checkpoint: Optional[CheckpointSpec] = None):
    """Multi-frame SR fitting (wire_multi_sr.py:183-208): per step, render the
    INR at a batch of frames' warped HR coordinate grids, box-downsample, and
    take the masked MSE against the LR frames.  Frame order reshuffles per
    epoch; best state tracked by train loss (matching the reference's
    best_state_dict checkpointing, wire_multi_sr.py:201-204).

    frame_coords: (n, H*W, 2); frame_pixels/masks: (n, Hl*Wl, C);
    hr_shape: (H, W, C).
    """
    from wire_tpu.ops.resample import avg_pool2d

    ckpt_fp = (_fit_fingerprint(cfg, model, frame_coords, frame_pixels,
                                frame_masks, gt_image)
               if checkpoint is not None else None)
    frame_coords = jnp.asarray(frame_coords)
    frame_pixels = jnp.asarray(frame_pixels)
    frame_masks = jnp.asarray(frame_masks)
    nframes = frame_coords.shape[0]
    H, W, C = hr_shape
    bs = min(batch_size, nframes)
    nbatches = (nframes + bs - 1) // bs
    npad = nbatches * bs - nframes

    seg = min(cfg.niters, max(cfg.scan_segment, 1))

    def build_frames(seg_len):
        cache_key = (model, cfg, seg_len, frame_coords.shape,
                     frame_pixels.shape, tuple(hr_shape), scale, bs, donate,
                     "frames")
        hit = _PROGRAMS.get(cache_key)
        if hit is not None:
            return hit
        tx = make_optimizer(cfg, None, nchunks=nbatches)

        def run_impl(carry, frame_coords, frame_pixels, frame_masks):
            carry, key0 = carry
            carry = (carry, key0)
            def batch_loss(p, fidx):
                valid = (fidx < nframes).astype(frame_pixels.dtype)
                safe = jnp.minimum(fidx, nframes - 1)
                rend = model.apply(p, frame_coords[safe])       # (b,H*W,C)
                nchw = jnp.transpose(rend.reshape(bs, H, W, C), (0, 3, 1, 2))
                lr = jnp.transpose(avg_pool2d(nchw, scale), (0, 2, 3, 1))
                lr = lr.reshape(bs, -1, C)
                m = frame_masks[safe] * valid[:, None, None]
                err = (lr - frame_pixels[safe]) * m
                # reference uses MSELoss over masked products (mean over all
                # elements, wire_multi_sr.py:197)
                return jnp.sum(err ** 2) / (err.size / max(1, bs) * jnp.maximum(valid.sum(), 1))

            def step(carry, fidx):
                params, opt_state, best_loss, best_params = carry
                loss, grads = jax.value_and_grad(batch_loss)(params, fidx)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                is_best = loss < best_loss
                best_loss = jnp.where(is_best, loss, best_loss)
                best_params = track_best(is_best, params, best_params)
                return (params, opt_state, best_loss, best_params), loss

            def epoch(carry, _):
                inner, key = carry
                key, sub = jax.random.split(key)
                order = jax.random.permutation(sub, nframes)
                if npad:
                    order = jnp.concatenate(
                        [order, jnp.full((npad,), nframes, order.dtype)])
                order = order.reshape(nbatches, bs)
                inner, losses = jax.lax.scan(step, inner, order)
                return (inner, key), jnp.sum(losses)

            (inner, key2), mse_hist = jax.lax.scan(
                epoch, carry, None, length=seg_len)
            return (inner, key2), mse_hist

        run = jax.jit(run_impl, donate_argnums=(0,) if donate else ())
        _PROGRAMS[cache_key] = (tx, run)
        return tx, run

    tx, run = build_frames(seg)
    params, opt_state, key0, best_params0 = _run_setup(model, cfg, tx,
                                                       params)
    carry = ((params, opt_state, jnp.asarray(np.float32(np.inf)),
              best_params0), key0)
    hists = []
    done = 0
    if checkpoint is not None and checkpoint.resume and \
            os.path.exists(checkpoint.path):
        carry, hists, done = _load_fit_state(checkpoint.path, carry,
                                             None, ckpt_fp)
    t0 = time.time()
    nseg = 0
    while done < cfg.niters:
        this = min(seg, cfg.niters - done)
        if this != seg:
            _, run = build_frames(this)
        carry, h = run(carry, frame_coords, frame_pixels, frame_masks)
        hists.append(h)
        done += this
        nseg += 1
        if checkpoint is not None and (nseg % max(checkpoint.every, 1) == 0
                                       or done >= cfg.niters):
            hists = [np.asarray(h) for h in hists]
            _save_fit_state(checkpoint.path, carry, hists, done, ckpt_fp)
    (params_f, _, best_loss, best_params), _key = carry
    jax.block_until_ready(best_loss)
    wall = time.time() - t0
    mse_hist = np.concatenate([np.asarray(h) for h in hists])
    return FitResult(
        params=params_f, best_params=best_params, best_rec=None,
        final_rec=None, mse_gt=mse_hist,
        mse_noisy=mse_hist, best_mse=float(best_loss),
        wall_time_s=wall)


def fit_frames_many(model, params_stack, frame_coords, frame_pixels,
                    frame_masks, cfg: FitConfig, *, hr_shape, scale,
                    batch_size=4, donate=False, batched_frames=False):
    """M multi-frame SR fits (the wire_multi_sr.py loop shape) in ONE
    device program — the frames counterpart of ``fit_pointwise_many`` /
    ``fit_operator_many``, completing the batched multi-fit trio.  The
    per-epoch body (frame-order reshuffle -> batched render / box
    downsample / masked MSE -> Adam -> best tracking) is vmapped over the
    replica axis of ``params_stack``; the fused model apply kernels batch
    through their vmap rules.

    Frame stacks are shared across replicas by default (multi-seed fits of
    one burst; replica r uses seed ``cfg.seed + r`` and reproduces the
    ``fit_frames(..., seed=cfg.seed+r)`` trajectory exactly — tested).
    ``batched_frames=True`` marks frame_coords/pixels/masks as carrying a
    leading M axis: M DIFFERENT bursts fit concurrently, which the
    reference's serial script (wire_multi_sr.py:183-208) cannot express.

    frame_coords: (n, H*W, 2) or (M, n, H*W, 2); frame_pixels/masks
    likewise with (n, Hl*Wl, C) trailing shape; hr_shape: (H, W, C).
    Returns a FitResult whose params carry the leading M axis (mse
    histories shaped (niters, M); best_mse (M,))."""
    from wire_tpu.ops.resample import avg_pool2d

    frame_coords = jnp.asarray(frame_coords)
    frame_pixels = jnp.asarray(frame_pixels)
    frame_masks = jnp.asarray(frame_masks)
    M = jax.tree.leaves(params_stack)[0].shape[0]
    f_ax = 0 if batched_frames else None
    nframes = frame_coords.shape[1] if batched_frames else \
        frame_coords.shape[0]
    H, W, C = hr_shape
    bs = min(batch_size, nframes)
    nbatches = (nframes + bs - 1) // bs
    npad = nbatches * bs - nframes

    def build(seg_len):
        cache_key = (model, cfg, seg_len, frame_coords.shape,
                     frame_pixels.shape, tuple(hr_shape), scale, bs, donate,
                     M, f_ax, "frames_many")
        hit = _PROGRAMS.get(cache_key)
        if hit is not None:
            return hit
        tx = make_optimizer(cfg, None, nchunks=nbatches)

        def run_impl(carry, frame_coords, frame_pixels, frame_masks):
            def batch_loss(p, fidx, frame_coords, frame_pixels,
                           frame_masks):
                valid = (fidx < nframes).astype(frame_pixels.dtype)
                safe = jnp.minimum(fidx, nframes - 1)
                rend = model.apply(p, frame_coords[safe])     # (b,H*W,C)
                nchw = jnp.transpose(rend.reshape(bs, H, W, C),
                                     (0, 3, 1, 2))
                lr = jnp.transpose(avg_pool2d(nchw, scale), (0, 2, 3, 1))
                lr = lr.reshape(bs, -1, C)
                m = frame_masks[safe] * valid[:, None, None]
                err = (lr - frame_pixels[safe]) * m
                # same masked-MSE normalization as fit_frames
                # (wire_multi_sr.py:197)
                return jnp.sum(err ** 2) / (
                    err.size / max(1, bs) * jnp.maximum(valid.sum(), 1))

            def one_epoch(carry, frame_coords, frame_pixels, frame_masks):
                inner, key = carry
                key, sub = jax.random.split(key)
                order = jax.random.permutation(sub, nframes)
                if npad:
                    order = jnp.concatenate(
                        [order, jnp.full((npad,), nframes, order.dtype)])
                order = order.reshape(nbatches, bs)

                def step(inner, fidx):
                    params, opt_state, best_loss, best_params = inner
                    loss, grads = jax.value_and_grad(batch_loss)(
                        params, fidx, frame_coords, frame_pixels,
                        frame_masks)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    is_best = loss < best_loss
                    best_loss = jnp.where(is_best, loss, best_loss)
                    best_params = track_best(is_best, params, best_params)
                    return (params, opt_state, best_loss, best_params), loss

                inner, losses = jax.lax.scan(step, inner, order)
                return (inner, key), jnp.sum(losses)

            def epoch(carry, _):
                return jax.vmap(one_epoch, in_axes=(0, f_ax, f_ax, f_ax))(
                    carry, frame_coords, frame_pixels, frame_masks)

            return jax.lax.scan(epoch, carry, None, length=seg_len)

        run = jax.jit(run_impl, donate_argnums=(0,) if donate else ())
        _PROGRAMS[cache_key] = (tx, run)
        return tx, run

    seg = min(cfg.niters, max(cfg.scan_segment, 1))
    tx, run = build(seg)
    setup = _fit_setup(model, cfg, tx)
    opt_state, _, best_params0 = jax.vmap(
        lambda p, s: setup(p, s))(params_stack, jnp.zeros((M,), jnp.uint32))
    keys = jax.vmap(jax.random.key)(
        jnp.uint32(cfg.seed) + jnp.arange(M, dtype=jnp.uint32))
    carry = ((params_stack, opt_state,
              jnp.full((M,), jnp.inf, jnp.float32), best_params0), keys)
    hists = []
    done = 0
    t0 = time.time()
    while done < cfg.niters:
        this = min(seg, cfg.niters - done)
        if this != seg:
            _, run = build(this)
        carry, h = run(carry, frame_coords, frame_pixels, frame_masks)
        hists.append(h)
        done += this
    jax.block_until_ready(carry)
    wall = time.time() - t0
    (params_f, _, best_loss, best_params), _keys = carry
    mse_hist = np.concatenate([np.asarray(h) for h in hists])
    return FitResult(
        params=params_f, best_params=best_params, best_rec=None,
        final_rec=None, mse_gt=mse_hist, mse_noisy=mse_hist,
        best_mse=np.asarray(best_loss), wall_time_s=wall)


# Program cache: building a fresh jax.jit wrapper per fit would re-load the
# executable on every call (expensive on remote/tunneled TPU backends even
# with the XLA compile cache warm).  Programs are keyed on everything that
# shapes the computation; coords/target are jit ARGUMENTS, not closure
# constants, so the same program serves any signal of the same size.
_PROGRAMS: dict = {}


def _host_setup_device():
    """CPU device for running fit-setup programs off the accelerator.

    When a cpu backend is co-registered next to the accelerator backend
    (``jax.config.update("jax_platforms", "axon,cpu")`` — bench.py does
    this), the setup program compiles and runs on the host and only its
    RESULTS transfer, so a fit costs the tunneled backend exactly ONE
    program (the scan).  Returns None when the default backend already is
    cpu (tests) or no cpu backend is registered (plain JAX_PLATFORMS=axon).
    """
    try:
        if jax.default_backend() == "cpu":
            return None
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def _fit_setup(model, cfg, tx):
    """One jitted program building (opt_state, key_data, best_params copy).

    On remote/tunneled backends every DISTINCT eager op compiles its own
    tiny program at ~10s a pop (measured 2026-08-20: eager optimizer init +
    buffer copies cost ~390s of a fresh process's first fit); folding the
    whole setup into one cached program removes all but one of those round
    trips.  The RNG key is returned as raw uint32 key data so the result
    can be transferred across backends (typed key arrays are wrapped after
    placement, _run_setup)."""
    cache_key = (model, cfg, "setup")
    hit = _PROGRAMS.get(cache_key)
    if hit is not None:
        return hit

    def setup_impl(params, seed):
        opt_state = tx.init(params)
        key_data = jax.random.key_data(jax.random.key(seed))
        best_params = jax.tree.map(lambda x: x + 0, params)
        return opt_state, key_data, best_params

    prog = jax.jit(setup_impl)
    _PROGRAMS[cache_key] = prog
    return prog


def _run_setup(model, cfg, tx, params):
    """Run the fit-setup program — on the host cpu backend when one is
    co-registered — and return (params, opt_state, key, best_params) placed
    on the default device."""
    setup = _fit_setup(model, cfg, tx)
    host = _host_setup_device()
    if host is None:
        opt_state, key_data, best_params = setup(params,
                                                 jnp.uint32(cfg.seed))
        return params, opt_state, jax.random.wrap_key_data(key_data), \
            best_params
    with jax.default_device(host):
        opt_state, key_data, best_params = setup(
            jax.device_put(params, host), jnp.uint32(cfg.seed))
    dev = jax.devices()[0]
    params, opt_state, key_data, best_params = jax.device_put(
        (params, opt_state, key_data, best_params), dev)
    return params, opt_state, jax.random.wrap_key_data(key_data), \
        best_params


def _pointwise_program(model, cfg: FitConfig, seg_len, npoints, nchunks, mp,
                       npad, track, tv_weight, image_shape, epoch_metric,
                       donate, grid=None):
    cache_key = (model, cfg, seg_len, npoints, nchunks, mp, npad, track,
                 tv_weight, image_shape, epoch_metric, donate, grid)
    hit = _PROGRAMS.get(cache_key)
    if hit is not None:
        return hit

    tx = make_optimizer(cfg, None, npoints=npoints, nchunks=nchunks)
    _em_two_args = False
    if epoch_metric is not None:
        # two-arg metrics receive (rec, target); count only positional
        # parameters WITHOUT defaults so `lambda rec, thres=0.5` stays
        # one-arg, and fall back to one-arg for C-level callables whose
        # signature inspect can't read (e.g. some jnp functions)
        import inspect
        try:
            sig = inspect.signature(epoch_metric)
            pos = [p for p in sig.parameters.values()
                   if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
            required = [p for p in pos
                        if p.default is inspect.Parameter.empty]
            _em_two_args = len(required) >= 2
            if not _em_two_args and len(pos) >= 2:
                # e.g. `lambda rec, thres=0.5`: the optional second param
                # is NOT bound to the fitting target (it used to be) —
                # say so instead of silently changing behavior
                from wire_tpu.train.artifacts import log
                log("NOTE: epoch_metric has an optional second parameter; "
                    "it keeps its default (the fitting target is passed "
                    "only to metrics with TWO required positional "
                    "parameters).")
        except (ValueError, TypeError):
            _em_two_args = False

    def run_impl(carry, coords, target, gt_arr):
        if grid is not None:
            crows = grid.rows           # device-computed rows
            cfull = lambda: grid.rows(jnp.arange(npoints))
        else:
            crows = lambda s: coords[s]
            cfull = lambda: coords

        def chunk_loss(p, idx):
            # OOB sentinel indices (== npoints) mask out padded entries
            valid = (idx < npoints)
            safe = jnp.minimum(idx, npoints - 1)
            pred = model.apply(p, crows(safe))
            w = valid.astype(pred.dtype)[:, None]
            mse = (jnp.sum(w * (pred - target[safe]) ** 2)
                   / (jnp.sum(w) * pred.shape[-1]))
            loss = mse
            if tv_weight > 0.0 and image_shape is not None:
                H, W, Cc = image_shape
                full = model.apply(p, cfull()).reshape(1, H, W, Cc)
                loss = loss + tv_weight * _tv(
                    jnp.transpose(full, (0, 3, 1, 2)))
            return loss, pred

        def full_batch_loss(p):
            # nchunks == 1 and no padding: the minibatch is the whole grid,
            # so the permutation/gather/scatter machinery is pure overhead
            pred = model.apply(p, cfull())
            loss = jnp.mean((pred - target) ** 2)
            if tv_weight > 0.0 and image_shape is not None:
                H, W, Cc = image_shape
                full = pred.reshape(1, H, W, Cc)
                loss = loss + tv_weight * _tv(
                    jnp.transpose(full, (0, 3, 1, 2)))
            return loss, pred

        full_batch = (nchunks == 1 and npad == 0)
        # the fused one-pass train-step (model.step_grads) covers the plain
        # masked-MSE loss; TV regularization needs autodiff over the full
        # render, so it keeps the value_and_grad path
        use_step = (tv_weight == 0.0)

        inv_nc = 1.0 / (npoints * target.shape[-1])

        def epoch_body(carry, _):
            (params, opt_state, rec, key, best_mse, best_rec,
             best_params) = carry
            sums = None  # (sse_target, sse_gt) from the fused step kernel
            if full_batch:
                if use_step:
                    pred, grads, sums = model.step_grads(
                        params, cfull(), target, gt=gt_arr,
                        want_metrics=True)
                else:
                    (loss, pred), grads = jax.value_and_grad(
                        full_batch_loss, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                rec = pred
            elif cfg.block_perm and int(cfg.block_perm) > 1 and use_step:
                # block-permutation path (r5, VERDICT r4 #5): permute
                # contiguous U-point blocks; gathers/scatters move
                # (U*c)-wide rows and the permutation sorts npoints/U keys.
                U = int(cfg.block_perm)
                nunits = npoints // U
                mpu = mp // U
                c_dim = target.shape[-1]
                key, sub = jax.random.split(key)
                uperm = jax.random.permutation(sub, nunits)
                if npad:
                    uperm = jnp.concatenate(
                        [uperm, jnp.full((npad // U,), nunits, uperm.dtype)])
                uperm = uperm.reshape(nchunks, mpu)
                if cfg.sort_chunks:
                    uperm = jnp.sort(uperm, axis=1)
                tgt_u = target.reshape(nunits, U, c_dim)
                gt_u = gt_arr.reshape(nunits, U, c_dim)
                coords_u = (None if grid is not None
                            else coords.reshape(nunits, U, -1))

                def chunk_body(inner, ublk):
                    params, opt_state, rec = inner
                    # sentinel blocks (== nunits) are tail-contiguous; mask
                    # via nvalid like the per-point path
                    valid = (ublk < nunits)
                    safe = jnp.minimum(ublk, nunits - 1)
                    nvalid = jnp.sum(valid) * U
                    denom = nvalid.astype(jnp.float32) * c_dim
                    if grid is not None:
                        ridx = (safe[:, None] * U
                                + jnp.arange(U)[None]).reshape(-1)
                        rows = grid.rows(ridx)
                    else:
                        rows = coords_u[safe].reshape(mpu * U, -1)
                    t = tgt_u[safe].reshape(mpu * U, c_dim)
                    g = gt_u[safe].reshape(mpu * U, c_dim)
                    pred, grads, csums = model.step_grads(
                        params, rows, t, nvalid=nvalid, denom=denom, gt=g,
                        want_metrics=True)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    rec = rec.reshape(nunits, U, c_dim).at[ublk].set(
                        pred.reshape(mpu, U, c_dim),
                        mode="drop").reshape(npoints, c_dim)
                    return (params, opt_state, rec), csums

                (params, opt_state, rec), chunk_sums = jax.lax.scan(
                    chunk_body, (params, opt_state, rec), uperm)
                sums = (jnp.sum(chunk_sums[0]), jnp.sum(chunk_sums[1]))
            else:
                key, sub = jax.random.split(key)
                perm = jax.random.permutation(sub, npoints)
                if npad:
                    perm = jnp.concatenate(
                        [perm, jnp.full((npad,), npoints, perm.dtype)])
                perm = perm.reshape(nchunks, mp)
                if cfg.sort_chunks:
                    perm = jnp.sort(perm, axis=1)

                def chunk_body(inner, idx):
                    params, opt_state, rec = inner
                    if use_step:
                        # sentinel (== npoints) indices are tail-contiguous
                        # by construction of perm above
                        nvalid = jnp.sum(idx < npoints)
                        safe = jnp.minimum(idx, npoints - 1)
                        denom = (nvalid.astype(jnp.float32)
                                 * target.shape[-1])
                        pred, grads, csums = model.step_grads(
                            params, crows(safe), target[safe],
                            nvalid=nvalid, denom=denom, gt=gt_arr[safe],
                            want_metrics=True)
                    else:
                        (_, pred), grads = jax.value_and_grad(
                            chunk_loss, has_aux=True)(params, idx)
                        csums = (jnp.float32(0), jnp.float32(0))
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    rec = rec.at[idx].set(pred, mode="drop")
                    return (params, opt_state, rec), csums

                (params, opt_state, rec), chunk_sums = jax.lax.scan(
                    chunk_body, (params, opt_state, rec), perm)
                if use_step:
                    # every point is written exactly once per epoch, so the
                    # sum of per-chunk masked sums equals the epoch-end
                    # reduction over the reconstruction buffer
                    sums = (jnp.sum(chunk_sums[0]), jnp.sum(chunk_sums[1]))

            if sums is not None:
                mse_noisy = sums[0] * inv_nc
                mse_gt = sums[1] * inv_nc
            else:
                mse_noisy = jnp.mean((target - rec) ** 2)
                mse_gt = jnp.mean((gt_arr - rec) ** 2)
            tracked = mse_gt if track == "gt" else mse_noisy
            is_best = tracked < best_mse
            best_mse = jnp.where(is_best, tracked, best_mse)
            best_rec, best_params = track_best(
                is_best, (rec, params), (best_rec, best_params))
            if epoch_metric is None:
                extra = 0.0
            elif _em_two_args:
                # two-arg metrics receive the fitting target as a program
                # ARGUMENT — a metric that instead closes over a device
                # array embeds it as a compile-time constant, and at 512^3
                # that 0.5 GB constant blows the tunnel's compile-request
                # size cap (HTTP 413)
                extra = epoch_metric(rec, target)
            else:
                extra = epoch_metric(rec)
            return ((params, opt_state, rec, key, best_mse, best_rec,
                     best_params), (mse_gt, mse_noisy, extra))

        return jax.lax.scan(epoch_body, carry, None, length=seg_len)

    run = jax.jit(run_impl, donate_argnums=(0,) if donate else ())
    _PROGRAMS[cache_key] = (tx, run)
    return tx, run


def fit_operator(model, params, coords, measurement, operator_fn,
                 cfg: FitConfig, *, gt_field=None, field_shape,
                 track="gt", donate=True,
                 checkpoint: Optional[CheckpointSpec] = None,
                 render_chunked=False):
    """Fit through a differentiable forward operator: every iteration renders
    the FULL coordinate grid, applies ``operator_fn`` and takes the MSE
    against ``measurement`` (the CT/SISR loop shape, bspline_ct.py:146-157,
    wire_SISR.py:183-197).

    coords: (N, d); operator_fn(field) with field = render reshaped to
    ``field_shape``; gt_field: clean field (same shape) for tracking.

    render_chunked=True renders the grid in ``cfg.maxpoints``-row chunks
    with rematerialization (``jax.checkpoint`` per chunk) so the live
    activation set is one chunk instead of the whole field — the option the
    reference's full-grid CT loop lacks for >512^2 fields (VERDICT round 1
    weak #6).  Numerics are identical (same forward values; backward
    recomputes per chunk).
    """
    ckpt_fp = (_fit_fingerprint(cfg, model, coords, measurement, gt_field,
                                operator_fn)
               if checkpoint is not None else None)
    coords = jnp.asarray(coords)
    measurement = jnp.asarray(measurement)
    has_gt = gt_field is not None
    gt_arr = measurement if gt_field is None else jnp.asarray(gt_field)
    cfg = dataclasses.replace(cfg, schedule_per="iter")
    npoints = coords.shape[0]
    mp = min(cfg.maxpoints, npoints)
    n_render = (npoints + mp - 1) // mp if render_chunked else 1
    if render_chunked:
        pad = n_render * mp - npoints
        coords = jnp.pad(coords, ((0, pad), (0, 0)))

    def build(seg_len):
        cache_key = (model, cfg, seg_len, coords.shape, tuple(field_shape),
                     operator_fn, track, has_gt, donate, n_render,
                     "operator")
        hit = _PROGRAMS.get(cache_key)
        if hit is not None:
            return hit
        tx = make_optimizer(cfg, None, nchunks=1)

        def run_impl(carry, coords, measurement, gt_arr):
            def render(p):
                if n_render == 1:
                    return model.apply(p, coords).reshape(field_shape)
                rows = jax.lax.map(
                    jax.checkpoint(lambda c: model.apply(p, c)),
                    coords.reshape(n_render, mp, coords.shape[-1]))
                return rows.reshape(n_render * mp, -1)[:npoints].reshape(
                    field_shape)

            def loss_fn(p):
                field = render(p)
                est = operator_fn(field)
                return jnp.mean((est - measurement) ** 2), field

            def step(carry, _):
                params, opt_state, best_loss, best_field, best_params = carry
                (loss, field), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if has_gt and track == "gt":
                    tracked = jnp.mean((field - gt_arr) ** 2)
                else:
                    tracked = loss
                is_best = tracked < best_loss
                best_loss = jnp.where(is_best, tracked, best_loss)
                best_field, best_params = track_best(
                    is_best, (field, params), (best_field, best_params))
                return (params, opt_state, best_loss, best_field,
                        best_params), (loss, tracked)

            return jax.lax.scan(step, carry, None, length=seg_len)

        run = jax.jit(run_impl, donate_argnums=(0,) if donate else ())
        _PROGRAMS[cache_key] = (tx, run)
        return tx, run

    # segment very long scans: one device program per <=scan_segment iters
    # (identical numerics — optimizer step counts carry across segments)
    seg = min(cfg.niters, max(cfg.scan_segment, 1))
    tx, run = build(seg)
    params, opt_state, _, best_params0 = _run_setup(model, cfg, tx, params)
    field0 = jnp.asarray(np.zeros(field_shape,
                                  np.dtype(measurement.dtype)))
    carry = (params, opt_state, jnp.asarray(np.float32(np.inf)), field0,
             best_params0)
    loss_h, tracked_h = [], []
    done = 0
    if checkpoint is not None and checkpoint.resume and \
            os.path.exists(checkpoint.path):
        carry, hists, done = _load_fit_state(checkpoint.path, carry, 2,
                                             ckpt_fp)
        loss_h = [h[0] for h in hists]
        tracked_h = [h[1] for h in hists]
    t0 = time.time()
    nseg = 0
    while done < cfg.niters:
        this = min(seg, cfg.niters - done)
        if this != seg:
            _, run = build(this)
        carry, (lh, th) = run(carry, coords, measurement, gt_arr)
        loss_h.append(lh)
        tracked_h.append(th)
        done += this
        nseg += 1
        if checkpoint is not None and (nseg % max(checkpoint.every, 1) == 0
                                       or done >= cfg.niters):
            loss_h = [np.asarray(h) for h in loss_h]
            tracked_h = [np.asarray(h) for h in tracked_h]
            _save_fit_state(checkpoint.path, carry,
                            list(zip(loss_h, tracked_h)), done, ckpt_fp)
    jax.block_until_ready(carry)
    wall = time.time() - t0
    loss_hist = np.concatenate([np.asarray(h) for h in loss_h])
    tracked_hist = np.concatenate([np.asarray(h) for h in tracked_h])
    params, _, best_loss, best_field, best_params = carry
    return FitResult(
        params=params, best_params=best_params,
        best_rec=np.asarray(best_field), final_rec=None,
        mse_gt=tracked_hist, mse_noisy=loss_hist,
        best_mse=float(best_loss), wall_time_s=wall)


def fit_operator_many(model, params_stack, coords, measurement, operator_fn,
                      cfg: FitConfig, *, gt_field=None, field_shape,
                      track="gt", donate=False, batched_measurement=False):
    """M operator fits (the CT/SISR loop shape) in ONE device program
    (VERDICT r4 #6, the operator counterpart of fit_pointwise_many): the
    iteration body — full-grid render through the fused apply/VJP pairs,
    operator, MSE, Adam, best tracking — is vmapped over the replica axis
    of ``params_stack``.  The fused model kernels AND the Pallas Radon
    rotate-project kernel batch through their vmap rules (verified equal
    to the unbatched programs).

    measurement/gt_field are shared across replicas by default (multi-seed
    fits); ``batched_measurement=True`` marks both as carrying a leading M
    axis — M DIFFERENT measurements (e.g. M CT scans or SISR inputs) fit
    concurrently, a capability the reference's serial scripts cannot
    express.  Returns a FitResult with the leading M axis on
    params/best_rec/histories (mse histories (niters, M); best_mse (M,))."""
    coords = jnp.asarray(coords)
    measurement = jnp.asarray(measurement)
    has_gt = gt_field is not None
    gt_arr = measurement if gt_field is None else jnp.asarray(gt_field)
    cfg = dataclasses.replace(cfg, schedule_per="iter")
    M = jax.tree.leaves(params_stack)[0].shape[0]
    m_ax = 0 if batched_measurement else None

    def build(seg_len):
        cache_key = (model, cfg, seg_len, coords.shape, tuple(field_shape),
                     operator_fn, track, has_gt, donate, M, m_ax,
                     "operator_many")
        hit = _PROGRAMS.get(cache_key)
        if hit is not None:
            return hit
        tx = make_optimizer(cfg, None, nchunks=1)

        def run_impl(carry, coords, measurement, gt_arr):
            def one_step(carry, measurement, gt_arr):
                params, opt_state, best_loss, best_field, best_params = carry

                def loss_fn(p):
                    field = model.apply(p, coords).reshape(field_shape)
                    est = operator_fn(field)
                    return jnp.mean((est - measurement) ** 2), field

                (loss, field), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if has_gt and track == "gt":
                    tracked = jnp.mean((field - gt_arr) ** 2)
                else:
                    tracked = loss
                is_best = tracked < best_loss
                best_loss = jnp.where(is_best, tracked, best_loss)
                best_field, best_params = track_best(
                    is_best, (field, params), (best_field, best_params))
                return (params, opt_state, best_loss, best_field,
                        best_params), (loss, tracked)

            def step(carry, _):
                return jax.vmap(one_step, in_axes=(0, m_ax, m_ax))(
                    carry, measurement, gt_arr)

            return jax.lax.scan(step, carry, None, length=seg_len)

        run = jax.jit(run_impl, donate_argnums=(0,) if donate else ())
        _PROGRAMS[cache_key] = (tx, run)
        return tx, run

    seg = min(cfg.niters, max(cfg.scan_segment, 1))
    tx, run = build(seg)
    setup = _fit_setup(model, cfg, tx)
    opt_state, _, best_params0 = jax.vmap(
        lambda p, s: setup(p, s))(params_stack,
                                  jnp.zeros((M,), jnp.uint32))
    field0 = jnp.zeros((M,) + tuple(field_shape), measurement.dtype)
    carry = (params_stack, opt_state, jnp.full((M,), jnp.inf, jnp.float32),
             field0, best_params0)
    loss_h, tracked_h = [], []
    done = 0
    t0 = time.time()
    while done < cfg.niters:
        this = min(seg, cfg.niters - done)
        if this != seg:
            _, run = build(this)
        carry, (lh, th) = run(carry, coords, measurement, gt_arr)
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
        best_mse=np.asarray(best_loss), wall_time_s=wall)
