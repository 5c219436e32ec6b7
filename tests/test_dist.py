"""Multi-device sharding tests on the 8-device CPU mesh: full-batch sharded
training must equal single-device training exactly (pmean-of-means ==
global mean); stochastic sharded fitting must converge."""
import numpy as np

import jax
import jax.numpy as jnp

from wire_tpu.nn import get_inr
from wire_tpu.signals import coords as C
from wire_tpu.signals import image as I
from wire_tpu.dist import fit_pointwise_sharded, make_mesh
from wire_tpu.train.trainer import FitConfig, fit_pointwise


def _setup(H=32, W=32, hidden=32):
    im = I.synthetic_image(H, W, 3, seed=0)
    coords = C.grid2d(H, W)
    target = im.reshape(-1, 3)
    model = get_inr("wire", in_features=2, hidden_features=hidden,
                    hidden_layers=2, out_features=3, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    params = model.init(jax.random.key(0))
    return model, params, coords, target


def test_sharded_full_batch_equals_single_device():
    model, params, coords, target = _setup()
    cfg = FitConfig(learning_rate=5e-3, niters=10,
                    maxpoints=coords.shape[0])
    res1 = fit_pointwise(model, jax.tree.map(jnp.copy, params), coords,
                         target, cfg, track="noisy", donate=False)
    mesh = make_mesh(8)
    res8 = fit_pointwise_sharded(model, jax.tree.map(jnp.copy, params),
                                 coords, target, cfg, mesh, track="noisy",
                                 donate=False)
    np.testing.assert_allclose(res8.mse_noisy, res1.mse_noisy, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(res1.params),
                    jax.tree.leaves(res8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # reconstructions assembled across shards must match too
    np.testing.assert_allclose(res8.final_rec, res1.final_rec, atol=2e-4)


def test_sharded_gridspec_matches_materialized():
    """Sharded fit with an implicit GridSpec (per-device coordinates
    computed from dev*local_n + local index, no coordinate shard in HBM)
    must reproduce the materialized-array sharded fit: identical
    permutation streams, coordinates equal to f32 rounding."""
    model, params, coords, target = _setup()
    mesh = make_mesh(8)
    cfg = FitConfig(learning_rate=5e-3, niters=12, maxpoints=256)
    res_a = fit_pointwise_sharded(model, jax.tree.map(jnp.copy, params),
                                  coords, target, cfg, mesh, track="noisy",
                                  donate=False)
    res_g = fit_pointwise_sharded(model, jax.tree.map(jnp.copy, params),
                                  C.GridSpec(32, 32), target, cfg, mesh,
                                  track="noisy", donate=False)
    np.testing.assert_allclose(res_g.mse_noisy, res_a.mse_noisy,
                               rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(res_g.final_rec, res_a.final_rec,
                               rtol=2e-3, atol=2e-4)
    # exact-composition mode with a grid
    cfg_gp = FitConfig(learning_rate=5e-3, niters=8,
                       maxpoints=coords.shape[0] // 2)
    res_ga = fit_pointwise_sharded(model, jax.tree.map(jnp.copy, params),
                                   coords, target, cfg_gp, mesh,
                                   track="noisy", donate=False,
                                   global_perm=True)
    res_gg = fit_pointwise_sharded(model, jax.tree.map(jnp.copy, params),
                                   C.GridSpec(32, 32), target, cfg_gp, mesh,
                                   track="noisy", donate=False,
                                   global_perm=True)
    np.testing.assert_allclose(res_gg.mse_noisy, res_ga.mse_noisy,
                               rtol=2e-4, atol=1e-7)


def test_sharded_minibatch_converges():
    model, params, coords, target = _setup(H=64, W=64, hidden=48)
    cfg = FitConfig(learning_rate=5e-3, niters=100, maxpoints=512)
    mesh = make_mesh(8)
    res = fit_pointwise_sharded(model, params, coords, target, cfg, mesh,
                                track="noisy")
    assert res.mse_noisy[-1] < res.mse_noisy[0] / 10
    assert np.count_nonzero(res.final_rec) == res.final_rec.size


def test_global_perm_minibatch_matches_single_device_exactly():
    """global_perm=True reproduces the single-device trainer's minibatch
    COMPOSITION (same key stream, same chunks), so the whole stochastic
    trajectory matches to float-reduction order — the strongest equivalence
    the sharded fitter offers (SURVEY.md §7 hard part 4)."""
    model, params, coords, target = _setup(H=32, W=32, hidden=32)
    # 4 chunks of 256, so every epoch takes 4 distinct stochastic steps
    cfg = FitConfig(learning_rate=5e-3, niters=8, maxpoints=256)
    res1 = fit_pointwise(model, jax.tree.map(jnp.copy, params), coords,
                         target, cfg, track="noisy", donate=False)
    mesh = make_mesh(8)
    res8 = fit_pointwise_sharded(model, jax.tree.map(jnp.copy, params),
                                 coords, target, cfg, mesh, track="noisy",
                                 donate=False, global_perm=True)
    np.testing.assert_allclose(res8.mse_noisy, res1.mse_noisy, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(res1.params),
                    jax.tree.leaves(res8.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)
    np.testing.assert_allclose(res8.final_rec, res1.final_rec, atol=2e-4)
    np.testing.assert_allclose(res8.best_rec, res1.best_rec, atol=2e-4)


def test_global_perm_with_remainder_chunk():
    """npad > 0 path: sentinel indices mask out, counts psum correctly."""
    model, params, coords, target = _setup(H=24, W=24, hidden=32)
    # 576 points, maxpoints 512 -> chunks of 512 with a 448-pad remainder
    cfg = FitConfig(learning_rate=5e-3, niters=6, maxpoints=512)
    res1 = fit_pointwise(model, jax.tree.map(jnp.copy, params), coords,
                         target, cfg, track="noisy", donate=False)
    mesh = make_mesh(8)
    res8 = fit_pointwise_sharded(model, jax.tree.map(jnp.copy, params),
                                 coords, target, cfg, mesh, track="noisy",
                                 donate=False, global_perm=True)
    np.testing.assert_allclose(res8.mse_noisy, res1.mse_noisy, rtol=2e-4)
    np.testing.assert_allclose(res8.final_rec, res1.final_rec, atol=2e-4)


def test_sharded_on_subset_mesh():
    model, params, coords, target = _setup(H=16, W=16)
    cfg = FitConfig(learning_rate=5e-3, niters=5, maxpoints=64)
    mesh = make_mesh(4)
    res = fit_pointwise_sharded(model, params, coords, target, cfg, mesh,
                                track="noisy")
    assert np.isfinite(res.mse_noisy).all()


def test_operator_sharded_equals_single_device():
    """fit_operator_sharded: sharded render + all_gather + pmean grads must
    reproduce the (deterministic) single-device fit_operator trajectory."""
    from wire_tpu.dist import fit_operator_sharded
    from wire_tpu.ops.resample import avg_pool2d
    from wire_tpu.train.trainer import fit_operator

    H = W = 16
    im = I.synthetic_image(H, W, 1, seed=3)[..., 0]
    coords = C.grid2d(H, W)
    model = get_inr("wire", in_features=2, hidden_features=32,
                    hidden_layers=2, out_features=1, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    params = model.init(jax.random.key(0))

    def op(field):  # 4x box-downsample (the SISR operator shape)
        return avg_pool2d(field[None, None], 4)[0, 0]

    meas = np.asarray(jax.jit(op)(jnp.asarray(im)))
    cfg = FitConfig(learning_rate=5e-3, niters=12)
    res1 = fit_operator(model, jax.tree.map(jnp.copy, params), coords, meas,
                        op, cfg, gt_field=im, field_shape=(H, W),
                        donate=False)
    mesh = make_mesh(8)
    res8 = fit_operator_sharded(model, jax.tree.map(jnp.copy, params),
                                coords, meas, op, cfg, mesh, gt_field=im,
                                field_shape=(H, W), donate=False)
    np.testing.assert_allclose(res8.mse_noisy, res1.mse_noisy, rtol=2e-4)
    np.testing.assert_allclose(res8.mse_gt, res1.mse_gt, rtol=2e-4)
    np.testing.assert_allclose(res8.best_rec, res1.best_rec, atol=2e-4)
    for a, b in zip(jax.tree.leaves(res1.params),
                    jax.tree.leaves(res8.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_frames_sharded_equals_single_device():
    """fit_frames_sharded: per-step frame batch split over the mesh with
    psum'd partial sums must match fit_frames' stochastic trajectory (same
    key stream, same batch composition)."""
    from wire_tpu.dist import fit_frames_sharded
    from wire_tpu.train.trainer import fit_frames

    H = W = 16
    scale = 2
    nframes, bs = 10, 8      # npad=6: exercises the sentinel mask
    rng = np.random.RandomState(0)
    base = C.grid2d(H, W)
    frame_coords = np.stack([
        np.clip(base + rng.uniform(-0.05, 0.05, size=(1, 2)), -1, 1)
        for _ in range(nframes)]).astype(np.float32)
    frame_pixels = rng.rand(
        nframes, (H // scale) * (W // scale), 3).astype(np.float32)
    frame_masks = (rng.rand(*frame_pixels.shape) > 0.1).astype(np.float32)
    model = get_inr("wire", in_features=2, hidden_features=32,
                    hidden_layers=2, out_features=3, first_omega0=7.0,
                    hidden_omega0=7.0, scale=6.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=6, lr_decay=1.0)
    res1 = fit_frames(model, jax.tree.map(jnp.copy, params), frame_coords,
                      frame_pixels, frame_masks, cfg, hr_shape=(H, W, 3),
                      scale=scale, batch_size=bs, donate=False)
    mesh = make_mesh(8)
    res8 = fit_frames_sharded(model, jax.tree.map(jnp.copy, params),
                              frame_coords, frame_pixels, frame_masks, cfg,
                              mesh, hr_shape=(H, W, 3), scale=scale,
                              batch_size=bs, donate=False)
    np.testing.assert_allclose(res8.mse_noisy, res1.mse_noisy, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(res1.params),
                    jax.tree.leaves(res8.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_sharded_epoch_sums_keeps_iou():
    """The sharded fitter's psum'd per-epoch metric sums must equal the
    single-device epoch_metric (occupancy IoU, VERDICT weak #3)."""
    from wire_tpu.train import metrics as M

    model, params, coords, target = _setup(H=32, W=32)
    timu = jnp.asarray(target)
    cfg = FitConfig(learning_rate=5e-3, niters=6,
                    maxpoints=coords.shape[0])

    def epoch_iou(rec):
        return M.iou(rec, timu, 0.5)

    res1 = fit_pointwise(model, jax.tree.map(jnp.copy, params), coords,
                         target, cfg, track="noisy", donate=False,
                         epoch_metric=epoch_iou)

    def iou_sums(rec_local, tgt_local):
        p = jnp.where(rec_local >= 0.5, 1.0, 0.0)
        inter = jnp.sum(jnp.logical_and(p != 0, tgt_local != 0))
        union = jnp.sum(jnp.logical_or(p != 0, tgt_local != 0))
        return inter, union

    mesh = make_mesh(8)
    res8 = fit_pointwise_sharded(model, jax.tree.map(jnp.copy, params),
                                 coords, target, cfg, mesh, track="noisy",
                                 donate=False, epoch_sums=iou_sums)
    inter, union = res8.time_array
    iou8 = inter / union
    np.testing.assert_allclose(iou8, res1.time_array, rtol=1e-5)


def test_grid_rows_matches_grid3d():
    H, W, T = 6, 5, 4
    full = C.grid3d(H, W, T)
    rows = np.concatenate([C.grid_rows(H, W, T, lo, min(lo + 23, H * W * T))
                           for lo in range(0, H * W * T, 23)])
    np.testing.assert_array_equal(rows, full)


def test_feed_rows_assembles_global_array():
    """multihost.feed_rows (SURVEY §7.5 data path): per-process row feeding
    must assemble the same global sharded array as materializing it."""
    from wire_tpu.dist import multihost as MH

    mesh = make_mesh(8)
    H = W = T = 8
    n = H * W * T
    fed = MH.feed_rows(mesh, lambda lo, hi: C.grid_rows(H, W, T, lo, hi), n)
    assert fed.shape == (n, 3)
    np.testing.assert_array_equal(np.asarray(fed), C.grid3d(H, W, T))
    lo, hi = MH.local_row_range(mesh, n)
    assert (lo, hi) == (0, n)  # single process owns everything


def test_fit_with_fed_rows_matches_numpy_input():
    from wire_tpu.dist import multihost as MH

    model, params, coords, target = _setup(H=16, W=16)
    mesh = make_mesh(8)
    n = coords.shape[0]
    cfg = FitConfig(learning_rate=5e-3, niters=6, maxpoints=n)
    res_np = fit_pointwise_sharded(model, jax.tree.map(jnp.copy, params),
                                   coords, target, cfg, mesh, track="noisy",
                                   donate=False)
    fed_c = MH.feed_rows(mesh, lambda lo, hi: coords[lo:hi], n)
    fed_t = MH.feed_rows(mesh, lambda lo, hi: target[lo:hi], n)
    res_fed = fit_pointwise_sharded(model, jax.tree.map(jnp.copy, params),
                                    fed_c, fed_t, cfg, mesh, track="noisy",
                                    donate=False)
    np.testing.assert_array_equal(res_fed.mse_noisy, res_np.mse_noisy)
    np.testing.assert_array_equal(res_fed.final_rec, res_np.final_rec)


def test_multihost_initialize_noop_single_process():
    from wire_tpu.dist import multihost as MH
    assert MH.initialize() is False
    mesh = MH.make_global_mesh()
    assert mesh.devices.size == len(jax.devices())


def test_sharded_segmented_scan_composes():
    """Forced-small scan_segment (the 134M-point segmenting path, VERDICT
    round 1 #3): multiple segments incl. a remainder-length program must
    equal the single-segment fit exactly."""
    model, params, coords, target = _setup(H=16, W=16)
    mesh = make_mesh(8)
    base = dict(learning_rate=5e-3, niters=5, maxpoints=64)
    res1 = fit_pointwise_sharded(model, jax.tree.map(jnp.copy, params),
                                 coords, target,
                                 FitConfig(**base, scan_segment=250), mesh,
                                 track="noisy", donate=False)
    res2 = fit_pointwise_sharded(model, jax.tree.map(jnp.copy, params),
                                 coords, target,
                                 FitConfig(**base, scan_segment=2), mesh,
                                 track="noisy", donate=False)
    np.testing.assert_array_equal(res2.mse_noisy, res1.mse_noisy)
    np.testing.assert_array_equal(res2.final_rec, res1.final_rec)


def test_scaling_harness():
    """dist.scaling harness (VERDICT r2 #8): runs on 1- and 2-device
    meshes, returns positive coords/s and a well-formed efficiency table."""
    from wire_tpu.dist import scaling as SC
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C, image as I
    from wire_tpu.train.trainer import FitConfig

    H = W = 16
    im = I.synthetic_image(H, W, 3, seed=0)
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=32, hidden_layers=1, first_omega0=5.0,
                    hidden_omega0=5.0, scale=4.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=4, maxpoints=H * W)
    res = SC.measure_scaling(model, params, C.grid2d(H, W),
                             im.reshape(-1, 3), cfg, device_counts=[1, 2],
                             repeats=1)
    rows = SC.efficiency_table(res)
    assert [nd for nd, _, _ in rows] == [1, 2]
    assert all(cps > 0 for _, cps, _ in rows)
    assert abs(rows[0][2] - 1.0) < 1e-9
