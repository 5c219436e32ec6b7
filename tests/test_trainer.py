"""Trainer tests: exact Adam+schedule parity with a torch reference loop,
convergence of the pointwise fitter, and the operator fitter."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wire_tpu.nn import get_inr
from wire_tpu.signals import coords as C
from wire_tpu.signals import image as I
from wire_tpu.train import metrics as M
from wire_tpu.train.trainer import FitConfig, fit_pointwise, fit_operator

from . import torch_bridge as tb


def test_full_batch_training_matches_torch_adam():
    """With a single chunk per epoch (maxpoints >= npoints) the reference
    loop is deterministic full-batch Adam + LambdaLR; our jitted scan must
    track it step for step."""
    import torch

    H = W = 16
    im = I.synthetic_image(H, W, 3, seed=2)
    coords = C.grid2d(H, W)
    target = im.reshape(-1, 3)

    base = dict(in_features=2, hidden_features=32, hidden_layers=2,
                out_features=3, first_omega0=7.0, hidden_omega0=7.0,
                scale=8.0)
    ref = tb.make_ref_model("wire", **base)
    params = tb.params_from_ref("wire", ref, 2)
    model = get_inr("wire", **base)

    niters = 40
    lr = 5e-3

    # --- torch loop (the reference denoise loop shape, full batch) ---------
    tcoords = torch.tensor(coords)[None]
    ttarget = torch.tensor(target)[None]
    optim = torch.optim.Adam(lr=lr, params=ref.parameters())
    sched = torch.optim.lr_scheduler.LambdaLR(
        optim, lambda x: 0.1 ** min(x / niters, 1))
    tl = []
    for _ in range(niters):
        pred = ref(tcoords)
        loss = ((pred - ttarget) ** 2).mean()
        optim.zero_grad()
        loss.backward()
        optim.step()
        sched.step()
        tl.append(loss.item())

    # --- ours -------------------------------------------------------------
    # --- strict one-step parity: grads and Adam update must match exactly --
    import optax
    from wire_tpu.train.trainer import make_optimizer
    ref1 = tb.make_ref_model("wire", **base)
    params1 = jax.tree.map(jnp.asarray, tb.params_from_ref("wire", ref1, 2))
    o1 = torch.optim.Adam(lr=lr, params=ref1.parameters())
    l1 = ((ref1(tcoords) - ttarget) ** 2).mean()
    o1.zero_grad(); l1.backward(); o1.step()
    pt1 = tb.params_from_ref("wire", ref1, 2)
    tx = make_optimizer(FitConfig(learning_rate=lr, niters=niters,
                                  maxpoints=H * W), params1,
                        npoints=H * W, nchunks=1)
    st = tx.init(params1)
    g = jax.grad(lambda p: jnp.mean(
        (model.apply(p, jnp.asarray(coords)) - jnp.asarray(target)) ** 2))(
            params1)
    up, st = tx.update(g, st, params1)
    pj1 = optax.apply_updates(params1, up)
    for leaf_mine, leaf_ref in zip(jax.tree.leaves(pj1),
                                   jax.tree.leaves(pt1)):
        np.testing.assert_allclose(np.asarray(leaf_mine), leaf_ref,
                                   atol=2e-6)

    # --- loose trajectory check: f32 rounding drifts chaotically under
    # Adam; after 40 steps the loss must still agree within a few percent --
    cfg = FitConfig(learning_rate=lr, niters=niters, maxpoints=H * W)
    res = fit_pointwise(model, jax.tree.map(jnp.asarray, params), coords,
                        target, cfg, track="noisy", donate=False)
    with torch.no_grad():
        final_torch = ((ref(tcoords) - ttarget) ** 2).mean().item()
    final_mine = float(res.mse_noisy[-1])
    assert abs(final_mine - final_torch) / final_torch < 0.05, (
        final_mine, final_torch)


def test_pointwise_fit_converges():
    H = W = 64
    im = I.synthetic_image(H, W, 3, seed=0)
    coords = C.grid2d(H, W)
    target = im.reshape(-1, 3)
    model = get_inr("wire", in_features=2, hidden_features=128,
                    hidden_layers=2, out_features=3, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=500, maxpoints=1024)
    res = fit_pointwise(model, params, coords, target, cfg, track="noisy")
    psnr = float(M.psnr_ref(im, res.best_rec.reshape(H, W, 3)))
    assert psnr > 24.0, psnr
    assert res.mse_noisy[-1] < res.mse_noisy[0] / 10


def test_gridspec_fit_matches_materialized_coords():
    """fit_pointwise with an implicit GridSpec (device-computed chunk
    coordinates, no coords table/gather) must reproduce the materialized-
    array fit: same permutation stream, coordinates equal to f32 rounding
    (<=1 ulp), so trajectories agree to float tolerance.  Covers both the
    chunked (3D, remainder chunk) and full-batch (2D) program paths."""
    # 3D chunked with remainder (11*9*7 = 693, maxpoints 128 -> 6 chunks)
    H, W, T = 11, 9, 7
    vol = I.synthetic_volume(16, seed=0)[:H, :W, :T]
    target = vol.reshape(-1, 1)
    model = get_inr("gauss", in_features=3, hidden_features=32,
                    hidden_layers=2, out_features=1, first_omega0=10.0,
                    hidden_omega0=10.0, scale=8.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=2e-3, niters=40, maxpoints=128)
    res_a = fit_pointwise(model, params, C.get_coords(H, W, T), target,
                          cfg, track="noisy", donate=False)
    res_g = fit_pointwise(model, params, C.GridSpec(H, W, T), target,
                          cfg, track="noisy", donate=False)
    np.testing.assert_allclose(res_g.mse_noisy, res_a.mse_noisy,
                               rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(res_g.final_rec, res_a.final_rec,
                               rtol=2e-3, atol=2e-4)
    # 2D full-batch path (nchunks == 1)
    im = I.synthetic_image(16, 16, 3, seed=0)
    model2 = get_inr("wire", in_features=2, hidden_features=32,
                     hidden_layers=2, out_features=3, first_omega0=7.0,
                     hidden_omega0=7.0, scale=6.0)
    p2 = model2.init(jax.random.key(0))
    cfg2 = FitConfig(learning_rate=5e-3, niters=20, maxpoints=256)
    r_a = fit_pointwise(model2, p2, C.grid2d(16, 16), im.reshape(-1, 3),
                        cfg2, track="noisy", donate=False)
    r_g = fit_pointwise(model2, p2, C.GridSpec(16, 16), im.reshape(-1, 3),
                        cfg2, track="noisy", donate=False)
    np.testing.assert_allclose(r_g.mse_noisy, r_a.mse_noisy,
                               rtol=2e-4, atol=1e-7)


def test_pointwise_fit_with_remainder_chunk():
    """npoints not divisible by maxpoints exercises the OOB-sentinel
    masking path."""
    H, W = 17, 23
    im = I.synthetic_image(H, W, 1, seed=1)
    coords = C.grid2d(H, W)
    target = im.reshape(-1, 1)
    model = get_inr("bspline_form", in_features=2, hidden_features=32,
                    hidden_layers=2, out_features=1, first_omega0=-0.2,
                    hidden_omega0=-0.2, scale=2.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=1e-2, niters=300, maxpoints=100)
    res = fit_pointwise(model, params, coords, target, cfg, track="noisy")
    # this test exercises the OOB-sentinel masking path, not fidelity
    assert res.mse_noisy[-1] < res.mse_noisy[0] / 2
    # every point must have been reconstructed (no zeros left from init)
    assert np.count_nonzero(res.final_rec) == res.final_rec.size


def test_operator_fit_sisr():
    """Fit through the area-downsample operator (SISR loop shape)."""
    from wire_tpu.operators.forward import sisr_op
    H = W = 32
    scale = 4
    im = I.synthetic_image(H, W, 3, seed=3)
    lr_img = im.reshape(H // scale, scale, W // scale, scale, 3).mean((1, 3))
    coords = C.grid2d(H, W)
    model = get_inr("siren", in_features=2, hidden_features=48,
                    hidden_layers=2, out_features=3, first_omega0=10.0,
                    hidden_omega0=10.0)
    params = model.init(jax.random.key(1))
    cfg = FitConfig(learning_rate=1e-3, niters=200, lr_decay=0.2)
    res = fit_operator(model, params, coords, lr_img,
                       lambda f: sisr_op(f, scale), cfg,
                       field_shape=(H, W, 3), track="noisy")
    assert res.mse_noisy[-1] < res.mse_noisy[0] / 10


def test_per_stage_lr_groups():
    """Tuple learning_rate drives the multi-transform path for hierarchical
    models (reference param-group workaround)."""
    model = get_inr("bspline_mscale_hier", in_features=2, hidden_features=16,
                    hidden_layers=2, out_features=1, first_omega0=-0.2,
                    hidden_omega0=-0.2, scale=2.0, scale_tensor=(1.0, 4.0))
    params = model.init(jax.random.key(0))
    H = W = 16
    im = I.synthetic_image(H, W, 1, seed=0)
    cfg = FitConfig(learning_rate=(1e-2, 5e-3), niters=60, maxpoints=H * W)
    res = fit_pointwise(model, params, C.grid2d(H, W), im.reshape(-1, 1),
                        cfg, track="noisy")
    assert res.mse_noisy[-1] < res.mse_noisy[0] / 3


def test_checkpoint_resume_reproduces_uninterrupted_fit(tmp_path,
                                                        monkeypatch):
    """Kill-and-resume (VERDICT round 1 #7): a fit killed right after a
    mid-run checkpoint write and resumed from its CheckpointSpec must
    reproduce the uninterrupted trajectory exactly — the carry holds the
    full state (params, Adam state incl. step counts, rec buffer, epoch key
    stream, best-* tracking)."""
    import wire_tpu.train.trainer as T
    from wire_tpu.train.trainer import CheckpointSpec

    im = I.synthetic_image(24, 24, 3, seed=0)
    coords = C.grid2d(24, 24)
    target = im.reshape(-1, 3)
    model = get_inr("wire", in_features=2, hidden_features=32,
                    hidden_layers=2, out_features=3, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    params = model.init(jax.random.key(0))
    # stochastic minibatches + segments of 4 epochs
    cfg = FitConfig(learning_rate=5e-3, niters=16, maxpoints=128,
                    scan_segment=4)

    ref = fit_pointwise(model, jax.tree.map(jnp.copy, params), coords,
                        target, cfg, track="noisy", donate=False)

    # "kill" the process right after the 2nd checkpoint write (8/16 epochs)
    ckpt = CheckpointSpec(path=str(tmp_path / "fit.ckpt"), every=1)
    orig_save = T._save_fit_state
    calls = {"n": 0}

    def killing_save(path, carry, hists, done, *a):
        orig_save(path, carry, hists, done, *a)
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt

    monkeypatch.setattr(T, "_save_fit_state", killing_save)
    with pytest.raises(KeyboardInterrupt):
        fit_pointwise(model, jax.tree.map(jnp.copy, params), coords, target,
                      cfg, track="noisy", donate=False, checkpoint=ckpt)
    monkeypatch.setattr(T, "_save_fit_state", orig_save)

    # resume to the full 16 — the params arg is a fresh init, must be
    # superseded by the checkpointed state
    res = fit_pointwise(model, jax.tree.map(jnp.copy, params), coords,
                        target, cfg, track="noisy", donate=False,
                        checkpoint=ckpt)

    np.testing.assert_array_equal(res.mse_noisy, ref.mse_noisy)
    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(res.best_rec, ref.best_rec)
    np.testing.assert_array_equal(res.final_rec, ref.final_rec)


def test_checkpoint_refuses_foreign_fit_state(tmp_path):
    """A checkpoint written by a fit with DIFFERENT input data (same path,
    same shapes/config) must be refused on resume, not silently loaded —
    e.g. a regenerated measurement with a stale CheckpointSpec.path would
    otherwise return the previous fit's result."""
    from wire_tpu.train.trainer import CheckpointSpec

    im = I.synthetic_image(16, 16, 3, seed=0)
    coords = C.grid2d(16, 16)
    model = get_inr("wire", in_features=2, hidden_features=32,
                    hidden_layers=2, out_features=3, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=4, scan_segment=2,
                    maxpoints=256)
    ckpt = CheckpointSpec(path=str(tmp_path / "fit.ckpt"))
    fit_pointwise(model, params, coords, im.reshape(-1, 3), cfg,
                  track="noisy", donate=False, checkpoint=ckpt)

    other = I.synthetic_image(16, 16, 3, seed=1)  # same shape, other data
    with pytest.raises(ValueError, match="DIFFERENT fit"):
        fit_pointwise(model, params, coords, other.reshape(-1, 3), cfg,
                      track="noisy", donate=False, checkpoint=ckpt)
    # different config at the same path is refused too
    cfg2 = FitConfig(learning_rate=1e-3, niters=4, scan_segment=2,
                     maxpoints=256)
    with pytest.raises(ValueError, match="DIFFERENT fit"):
        fit_pointwise(model, params, coords, im.reshape(-1, 3), cfg2,
                      track="noisy", donate=False, checkpoint=ckpt)


def test_checkpoint_resume_operator_fit(tmp_path, monkeypatch):
    import wire_tpu.train.trainer as T
    from wire_tpu.train.trainer import CheckpointSpec
    from wire_tpu.ops.resample import avg_pool2d

    H = W = 16
    im = I.synthetic_image(H, W, 1, seed=2)[..., 0]
    coords = C.grid2d(H, W)

    def op(field):
        return avg_pool2d(field[None, None], 4)[0, 0]

    meas = np.asarray(jax.jit(op)(jnp.asarray(im)))
    model = get_inr("wire", in_features=2, hidden_features=32,
                    hidden_layers=2, out_features=1, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=12, scan_segment=4)
    ref = fit_operator(model, jax.tree.map(jnp.copy, params), coords, meas,
                       op, cfg, gt_field=im, field_shape=(H, W),
                       donate=False)
    ckpt = CheckpointSpec(path=str(tmp_path / "op.ckpt"))
    orig_save = T._save_fit_state

    def killing_save(path, carry, hists, done, *a):
        orig_save(path, carry, hists, done, *a)
        raise KeyboardInterrupt

    monkeypatch.setattr(T, "_save_fit_state", killing_save)
    with pytest.raises(KeyboardInterrupt):
        fit_operator(model, jax.tree.map(jnp.copy, params), coords, meas,
                     op, cfg, gt_field=im, field_shape=(H, W), donate=False,
                     checkpoint=ckpt)
    monkeypatch.setattr(T, "_save_fit_state", orig_save)
    res = fit_operator(model, jax.tree.map(jnp.copy, params), coords, meas,
                       op, cfg, gt_field=im, field_shape=(H, W),
                       donate=False, checkpoint=ckpt)
    np.testing.assert_array_equal(res.mse_noisy, ref.mse_noisy)
    np.testing.assert_array_equal(res.best_rec, ref.best_rec)


def test_operator_fit_chunked_render_matches_full():
    """render_chunked (VERDICT round 1 weak #6): chunked+rematerialized
    full-grid rendering must reproduce the monolithic render's trajectory."""
    from wire_tpu.ops.resample import avg_pool2d

    H = W = 20
    im = I.synthetic_image(H, W, 1, seed=4)[..., 0]
    coords = C.grid2d(H, W)

    def op(field):
        return avg_pool2d(field[None, None], 4)[0, 0]

    meas = np.asarray(jax.jit(op)(jnp.asarray(im)))
    model = get_inr("wire", in_features=2, hidden_features=32,
                    hidden_layers=2, out_features=1, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    params = model.init(jax.random.key(0))
    # maxpoints 128 -> 4 chunks with a 112-row pad remainder
    cfg = FitConfig(learning_rate=5e-3, niters=10, maxpoints=128)
    ref = fit_operator(model, jax.tree.map(jnp.copy, params), coords, meas,
                       op, cfg, gt_field=im, field_shape=(H, W),
                       donate=False)
    res = fit_operator(model, jax.tree.map(jnp.copy, params), coords, meas,
                       op, cfg, gt_field=im, field_shape=(H, W),
                       donate=False, render_chunked=True)
    np.testing.assert_allclose(res.mse_noisy, ref.mse_noisy, rtol=1e-5)
    np.testing.assert_allclose(res.best_rec, ref.best_rec, atol=1e-5)


def test_checkpoint_resume_frames_fit(tmp_path, monkeypatch):
    import wire_tpu.train.trainer as T
    from wire_tpu.train.trainer import CheckpointSpec, fit_frames

    H = W = 16
    scale = 2
    nframes, bs = 6, 4
    rng = np.random.RandomState(3)
    base = C.grid2d(H, W)
    fc = np.stack([base] * nframes).astype(np.float32)
    fp = rng.rand(nframes, (H // scale) * (W // scale), 3).astype(np.float32)
    fm = np.ones_like(fp)
    model = get_inr("wire", in_features=2, hidden_features=32,
                    hidden_layers=2, out_features=3, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=9, lr_decay=1.0,
                    scan_segment=3)
    ref = fit_frames(model, jax.tree.map(jnp.copy, params), fc, fp, fm, cfg,
                     hr_shape=(H, W, 3), scale=scale, batch_size=bs,
                     donate=False)
    ckpt = CheckpointSpec(path=str(tmp_path / "fr.ckpt"))
    orig_save = T._save_fit_state
    calls = {"n": 0}

    def killing_save(path, carry, hists, done, *a):
        orig_save(path, carry, hists, done, *a)
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt

    monkeypatch.setattr(T, "_save_fit_state", killing_save)
    with pytest.raises(KeyboardInterrupt):
        fit_frames(model, jax.tree.map(jnp.copy, params), fc, fp, fm, cfg,
                   hr_shape=(H, W, 3), scale=scale, batch_size=bs,
                   donate=False, checkpoint=ckpt)
    monkeypatch.setattr(T, "_save_fit_state", orig_save)
    res = fit_frames(model, jax.tree.map(jnp.copy, params), fc, fp, fm, cfg,
                     hr_shape=(H, W, 3), scale=scale, batch_size=bs,
                     donate=False, checkpoint=ckpt)
    np.testing.assert_array_equal(res.mse_noisy, ref.mse_noisy)
    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fingerprint_distinguishes_partials_and_closures():
    """ADVICE r3 #1: functools.partial epoch metrics with different bound
    arguments must produce different fit fingerprints (a resume with a
    changed threshold must be refused), and the digest must be stable for
    identical inputs."""
    from functools import partial
    from wire_tpu.train.trainer import FitConfig, _fit_fingerprint

    def metric(rec, target, thres=0.5):
        return (rec > thres).mean()

    cfg = FitConfig(niters=3)
    base = _fit_fingerprint(cfg, "modelspec", partial(metric, thres=0.4))
    assert base == _fit_fingerprint(cfg, "modelspec",
                                    partial(metric, thres=0.4))
    assert base != _fit_fingerprint(cfg, "modelspec",
                                    partial(metric, thres=0.5))
    assert base != _fit_fingerprint(cfg, "modelspec", metric)

    def make_closure(t):
        def m(rec, target):
            return (rec > t).mean()
        return m

    c4 = _fit_fingerprint(cfg, "modelspec", make_closure(0.4))
    assert c4 == _fit_fingerprint(cfg, "modelspec", make_closure(0.4))
    assert c4 != _fit_fingerprint(cfg, "modelspec", make_closure(0.5))


def test_block_perm_fit_matches_physics():
    """FitConfig.block_perm (r5): block-permuted chunking must (a) train,
    (b) write every point exactly once per epoch (rec buffer complete),
    (c) keep the in-kernel epoch sums equal to the rec-based reduction,
    and (d) reject invalid configurations loudly."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C, image as I
    from wire_tpu.train.trainer import FitConfig, fit_pointwise

    H = W = 32
    im = I.synthetic_image(H, W, 1, seed=0)
    target = im.reshape(-1, 1)
    model = get_inr("wire", in_features=2, out_features=1,
                    hidden_features=32, hidden_layers=2, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=4, maxpoints=300,
                    block_perm=16)   # mpu=18 blocks -> mp=288, npad>0
    res = fit_pointwise(model, jax.tree.map(jnp.copy, params),
                        C.grid2d(H, W), target, cfg, track="noisy",
                        donate=False)
    assert np.isfinite(res.mse_noisy).all()
    assert res.mse_noisy[-1] < res.mse_noisy[0]
    # every point written once per epoch: the tracked noisy MSE must equal
    # the mean squared error of the final rec buffer (same epoch)
    np.testing.assert_allclose(
        res.mse_noisy[-1],
        float(np.mean((np.asarray(res.final_rec) - np.asarray(target)) ** 2)),
        rtol=1e-5)
    # GridSpec coords path too
    res_g = fit_pointwise(model, jax.tree.map(jnp.copy, params),
                          C.GridSpec(H, W), target, cfg, track="noisy",
                          donate=False)
    assert np.isfinite(res_g.mse_noisy).all()
    with pytest.raises(ValueError, match="divisible"):
        fit_pointwise(model, params, C.grid2d(H, W), target,
                      dataclasses.replace(cfg, block_perm=7), donate=False)
    with pytest.raises(ValueError, match="tv_weight"):
        fit_pointwise(model, params, C.grid2d(H, W), target,
                      dataclasses.replace(cfg, block_perm=16),
                      tv_weight=0.1, image_shape=(H, W, 1), donate=False)


def test_fit_pointwise_many_matches_serial():
    """fit_pointwise_many (r5, VERDICT r4 #6): M vmapped replicas in one
    program must reproduce the serial fit_pointwise trajectories at seeds
    cfg.seed + r (chunked path incl. padding, and best tracking)."""
    from wire_tpu.train.trainer import fit_pointwise_many

    H = W = 16
    im = I.synthetic_image(H, W, 3, seed=0)
    target = im.reshape(-1, 3)
    noisy = target + 0.05 * np.random.RandomState(1).randn(*target.shape
                                                           ).astype(np.float32)
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=32, hidden_layers=2, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    cfg = FitConfig(learning_rate=5e-3, niters=5, maxpoints=100)  # npad > 0
    M = 3
    keys = jax.random.split(jax.random.key(42), M)
    pstack = jax.vmap(lambda k: model._init(k, model.spec))(keys)

    res_m = fit_pointwise_many(model, pstack, C.grid2d(H, W), noisy, cfg,
                               gt=target, track="gt")
    assert res_m.mse_gt.shape == (5, M)
    for r in range(M):
        import dataclasses as dc
        p0 = jax.tree.map(lambda x, r=r: x[r], pstack)
        res1 = fit_pointwise(model, p0, C.grid2d(H, W), noisy,
                             dc.replace(cfg, seed=cfg.seed + r), gt=target,
                             track="gt", donate=False)
        np.testing.assert_allclose(res_m.mse_gt[:, r], res1.mse_gt,
                                   rtol=2e-4)
        np.testing.assert_allclose(res_m.mse_noisy[:, r], res1.mse_noisy,
                                   rtol=2e-4)
        np.testing.assert_allclose(res_m.best_mse[r], res1.best_mse,
                                   rtol=2e-4)
        np.testing.assert_allclose(res_m.best_rec[r], res1.best_rec,
                                   atol=2e-4)


def test_fit_operator_many_matches_serial():
    """fit_operator_many (r5): M vmapped operator fits in one program must
    reproduce the serial fit_operator trajectories; batched_measurement
    fits M DIFFERENT measurements concurrently."""
    from wire_tpu.ops.resample import avg_pool2d
    from wire_tpu.train.trainer import fit_operator_many

    H = W = 16
    model = get_inr("wire", in_features=2, out_features=1,
                    hidden_features=32, hidden_layers=2, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    coords = C.grid2d(H, W)

    def op(field):
        return avg_pool2d(field[None, None], 4)[0, 0]

    ims = [I.synthetic_image(H, W, 1, seed=s)[..., 0] for s in (3, 4)]
    meas = np.stack([np.asarray(jax.jit(op)(jnp.asarray(im)))
                     for im in ims])
    M = 2
    keys = jax.random.split(jax.random.key(7), M)
    pstack = jax.vmap(lambda k: model._init(k, model.spec))(keys)
    cfg = FitConfig(learning_rate=5e-3, niters=6)

    res_m = fit_operator_many(model, pstack, coords, meas, op, cfg,
                              gt_field=np.stack(ims), field_shape=(H, W),
                              batched_measurement=True)
    assert res_m.mse_gt.shape == (6, M)
    for r in range(M):
        p0 = jax.tree.map(lambda x, r=r: x[r], pstack)
        res1 = fit_operator(model, p0, coords, meas[r], op, cfg,
                            gt_field=ims[r], field_shape=(H, W),
                            donate=False)
        np.testing.assert_allclose(res_m.mse_noisy[:, r], res1.mse_noisy,
                                   rtol=2e-4)
        np.testing.assert_allclose(res_m.mse_gt[:, r], res1.mse_gt,
                                   rtol=2e-4)
        np.testing.assert_allclose(res_m.best_rec[r], res1.best_rec,
                                   atol=2e-4)


def test_fit_frames_many_matches_serial():
    """fit_frames_many (r5): M vmapped multi-frame SR fits in one program
    must reproduce the serial fit_frames trajectories at seeds cfg.seed + r
    (incl. the padded frame-batch remainder); batched_frames fits M
    DIFFERENT bursts concurrently."""
    import dataclasses as dc
    from wire_tpu.train.trainer import fit_frames, fit_frames_many

    H = W = 16
    scale = 2
    nframes, bs = 6, 4                      # nbatches=2, 2-frame pad
    rng = np.random.RandomState(3)
    base = C.grid2d(H, W)
    fc = np.stack([base] * nframes).astype(np.float32)
    fp = rng.rand(nframes, (H // scale) * (W // scale), 3).astype(np.float32)
    fm = np.ones_like(fp)
    model = get_inr("wire", in_features=2, hidden_features=32,
                    hidden_layers=2, out_features=3, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    M = 2
    keys = jax.random.split(jax.random.key(11), M)
    pstack = jax.vmap(lambda k: model._init(k, model.spec))(keys)
    cfg = FitConfig(learning_rate=5e-3, niters=5)

    res_m = fit_frames_many(model, pstack, fc, fp, fm, cfg,
                            hr_shape=(H, W, 3), scale=scale, batch_size=bs)
    assert res_m.mse_noisy.shape == (5, M)
    for r in range(M):
        p0 = jax.tree.map(lambda x, r=r: x[r], pstack)
        res1 = fit_frames(model, p0, fc, fp, fm,
                          dc.replace(cfg, seed=cfg.seed + r),
                          hr_shape=(H, W, 3), scale=scale, batch_size=bs,
                          donate=False)
        np.testing.assert_allclose(res_m.mse_noisy[:, r], res1.mse_noisy,
                                   rtol=2e-4)
        np.testing.assert_allclose(res_m.best_mse[r], res1.best_mse,
                                   rtol=2e-4)

    # batched_frames: two DIFFERENT bursts fit concurrently
    fp2 = np.stack([fp, rng.rand(*fp.shape).astype(np.float32)])
    fc2 = np.stack([fc, fc])
    fm2 = np.stack([fm, fm])
    res_b = fit_frames_many(model, pstack, fc2, fp2, fm2, cfg,
                            hr_shape=(H, W, 3), scale=scale, batch_size=bs,
                            batched_frames=True)
    for r in range(M):
        p0 = jax.tree.map(lambda x, r=r: x[r], pstack)
        res1 = fit_frames(model, p0, fc2[r], fp2[r], fm2[r],
                          dc.replace(cfg, seed=cfg.seed + r),
                          hr_shape=(H, W, 3), scale=scale, batch_size=bs,
                          donate=False)
        np.testing.assert_allclose(res_b.mse_noisy[:, r], res1.mse_noisy,
                                   rtol=2e-4)
