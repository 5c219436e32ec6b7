"""Tests for analysis tooling, motion extras, video CS, and volume extras."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from wire_tpu.signals import image as I, motion as Mo, volume as V
from wire_tpu.analysis import aggregate as AG, inspect as INS
from wire_tpu.operators import video_cs as VC


def test_affine_roundtrip():
    mats = np.stack([Mo.euclidean_matrix(0.1, (3, -2)),
                     Mo.euclidean_matrix(-0.2, (0, 5))])
    inv = Mo.invert_regstack(mats)
    for m, mi in zip(mats, inv):
        comp = np.vstack([m, [0, 0, 1]]) @ np.vstack([mi, [0, 0, 1]])
        np.testing.assert_allclose(comp, np.eye(3), atol=1e-10)


def test_affine2rigid():
    theta = 0.25
    mats = Mo.euclidean_matrix(theta, (1, 2))[None]
    angles, trans = Mo.affine2rigid(mats)
    assert abs(angles[0] - theta) < 1e-6
    np.testing.assert_allclose(trans[0], [1, 2])


def test_param2theta_matches_torch_affine_grid():
    import torch
    import torch.nn.functional as F
    H, W = 16, 20
    mats = Mo.euclidean_matrix(0.1, (2.0, -1.0))[None].astype(np.float32)
    theta = Mo.param2theta(mats, W, H)
    grid_t = F.affine_grid(torch.tensor(theta), (1, 1, H, W),
                           align_corners=False).numpy().reshape(1, -1, 2)
    mine = Mo.get_transformed_coords(theta, (H, W))
    np.testing.assert_allclose(mine, grid_t, atol=1e-5)


def test_interp_lr_shapes():
    im = I.synthetic_image(16, 16, 1, seed=0)
    theta = Mo.param2theta(
        Mo.euclidean_matrix(0.0, (0, 0))[None].astype(np.float32), 16, 16)
    coords = Mo.get_transformed_coords(theta, (16, 16))
    out = np.asarray(Mo.interp_lr(im, coords, 4))
    assert out.shape == (1, 4, 4, 1)
    # identity transform: downsampling the reference directly should match
    ref = im.reshape(4, 4, 4, 4, 1).mean((1, 3))
    np.testing.assert_allclose(out[0], ref, atol=2e-2)


def test_prune_stack_keeps_good_frames():
    rng = np.random.RandomState(0)
    im = I.synthetic_image(32, 32, 3, seed=0)
    stack, Xs, Ys, mats = Mo.make_burst(im, shift_max=3,
                                        theta_max=0.05, nframes=4, rng=rng)
    gray = stack.mean(-1)
    # sampling-convention mats for prune (frame(x) = ref(mat x)) are exactly
    # the burst mats
    kept, kept_mats, mask, _ = Mo.prune_stack(gray, mats, (32, 32),
                                              thres=0.5)
    assert mask[0]
    assert kept.shape[0] >= 1


def test_optical_flow_and_rgb():
    im = I.synthetic_image(48, 48, 1, seed=1)[..., 0]
    im2 = np.roll(im, 2, axis=1)
    flow, warped = Mo.optical_flow(im, im2)
    assert flow.shape == (48, 48, 2)
    rgb = Mo.flow2rgb(flow)
    assert rgb.shape == (48, 48, 3) and rgb.dtype == np.uint8
    # frame2(x + flow) ~= frame1: content rolled +2 => flow ~ +2
    assert abs(flow[8:-8, 8:-8, 0].mean() - 2) < 1.0


def test_ecc_flow_recovers_translation():
    im = I.synthetic_image(64, 64, 1, seed=2)[..., 0]
    dx = 3
    im2 = np.roll(im, dx, axis=1)
    warp, aligned, flow = Mo.ecc_flow(im, im2, motion="euclidean")
    # warp maps im1 coords onto im2: x' = x + dx
    assert abs(warp[0, 2] - dx) < 0.5
    # aligned == im2 warped back to im1's frame (interior)
    assert np.abs(aligned[8:-8, 8:-8] - im[8:-8, 8:-8]).mean() < 0.05
    # flow normalization is 2/W per pixel (reference motion.py:194-195)
    assert abs(flow[8:-8, 8:-8, 0].mean() - dx * 2 / 64) < 0.02
    # homography mode returns a 3x3 matrix
    warp_h, _, _ = Mo.ecc_flow(im, im2, motion="homography", niters=200)
    assert warp_h.shape == (3, 3)


def test_video_cs_roundtrip():
    rng = np.random.RandomState(0)
    T, H, W = 8, 6, 5
    video = rng.rand(T, H, W).astype(np.float32)
    masks = np.transpose(VC.coding_masks((H, W, T), 4, rng=rng), (2, 0, 1))
    coded = np.asarray(VC.video_to_coded(video, masks, 4))
    assert coded.shape == (2, H, W)
    # each coded pixel equals the selected frame's value in its chunk
    sel = (video * masks)[:4].sum(0)
    np.testing.assert_allclose(coded[0], sel, atol=1e-6)


def test_volume_extras():
    vol = I.synthetic_volume(24, seed=0)
    noisy = V.jitter_volume(vol, 1.0, rng=np.random.RandomState(0))
    assert noisy.shape == vol.shape and set(np.unique(noisy)) <= {0.0, 1.0}
    iou = V.iou_batched(vol, vol, thres=0.5, maxpoints=1000)
    assert iou == 1.0
    blocks, n = V.block_partition(np.argwhere(vol > 0).astype(np.float32),
                                  100)
    rec = V.unfold_blocks(blocks, n)
    assert rec.shape[0] == n
    assert V.downsample_blocks(blocks, 2).shape[1] == 50


def test_block_point_cloud_matches_reference():
    """BlockPointCloud vs the reference BlockPCDDataset (volutils.py:162-382)
    on the same cloud: bucketing, counts, limits, fold, unfold, downsample."""
    from . import torch_bridge  # noqa: F401  (reference on sys.path)
    import builtins
    import sys
    import types
    # volutils imports open3d/mcubes/skimage at module scope; stub missing
    for mod in ("open3d", "mcubes", "skimage", "skimage.metrics"):
        if mod not in sys.modules:
            try:
                builtins.__import__(mod)
            except ImportError:
                stub = types.ModuleType(mod)
                if mod == "skimage.metrics":
                    stub.structural_similarity = None
                    sys.modules["skimage"].metrics = stub
                sys.modules[mod] = stub
    from modules import volutils as ref

    rng = np.random.RandomState(0)
    xyz = rng.rand(500, 3).astype(np.float32) * 2 - 1
    depth = 2
    ours = V.BlockPointCloud(xyz, depth=depth)
    theirs = ref.BlockPCDDataset(xyz.copy(), depth=depth)

    nb = 2 ** depth
    ref_counts = np.array([len(theirs.chunks[k])
                           for k in sorted(theirs.indices,
                                           key=lambda k: theirs.indices[k])])
    np.testing.assert_array_equal(ours.counts, ref_counts)
    # the reference's per-cell limits are relative to the bbox origin but
    # used as absolute sampling bounds (volutils.py:218-219,276-279) — a
    # defect; ours are absolute (minvals-offset), per SURVEY.md §2.6 policy
    np.testing.assert_allclose(ours.minlim,
                               theirs.minlim + theirs.minvals[None, :],
                               rtol=1e-5, atol=1e-5)
    assert ours.maxpoints() == theirs.maxpoints()
    assert ours.nchunks() == len(theirs.clean_chunks)

    # fill+fold: real points land in the right cells with sdf 1; padding 0
    fx, fs = ours.fill(rng=np.random.RandomState(1))
    assert fx.shape == (nb ** 3, ours.maxpoints(), 3)
    for ci in range(nb ** 3):
        k = int(ours.counts[ci])
        assert np.all(fs[ci, :k] == 1.0) and np.all(fs[ci, k:] == 0.0)
        lo, hi = ours.minlim[ci], ours.maxlim[ci]
        assert np.all(fx[ci] >= lo - 1e-5) and np.all(fx[ci] <= hi + 1e-5)

    # refill replaces exactly the sdf=0 slots, in-cell
    import jax
    rx = np.asarray(ours.refill(fx, fs, jax.random.key(0)))
    np.testing.assert_allclose(rx[fs[..., 0] == 1], fx[fs[..., 0] == 1])
    moved = rx[fs[..., 0] == 0]
    if moved.size:
        assert not np.allclose(moved, fx[fs[..., 0] == 0])

    # unfold parity on a uniform query grid vs the reference's loop
    qc, qds = V.block_query_coords((-1, -1, -1), (1, 1, 1), 16, 1)
    ref_qc, ref_qds = ref.get_query_coords(np.array([-1.0] * 3),
                                           np.array([1.0] * 3), 16, 1)
    vals = np.arange(qc.shape[0] * qc.shape[1], dtype=np.float32)
    vals = vals.reshape(qc.shape[0], qc.shape[1], 1)
    cube_ours = qds.unfold(vals, 16)
    cube_ref = ref_qds.unfold(vals, cubesize=16)
    np.testing.assert_allclose(cube_ours, cube_ref)

    # downsample halves the depth and keeps one centroid per occupied cell
    ds = ours.downsample(1)
    assert ds.depth == depth - 1
    assert ds.xyz.shape[0] == int((ours.counts > 0).sum())
    assert ours.flatten().shape == xyz.shape


def test_aggregate_and_inspect(tmp_path):
    # build two fake runs
    from wire_tpu.train import artifacts as A
    for name, psnr in (("runA", 30.0), ("runB", 28.5)):
        d = tmp_path / name
        os.makedirs(d)
        rec = I.synthetic_image(8, 8, 1)[..., 0]
        A.save_mat(str(d / "metrics.mat"), {name: {"Best PSNR": psnr}})
        A.save_mat(str(d / "info.mat"), {name: {"rec": rec}})
    runs = AG.collect_runs(str(tmp_path))
    assert set(runs) == {"runA", "runB"}
    rows = AG.aggregate(runs, str(tmp_path / "agg"))
    assert rows["runA"]["Best PSNR"] == 30.0
    assert (tmp_path / "agg" / "Agg_results.md").exists()
    assert (tmp_path / "agg" / "Output_img.png").exists()

    im = I.synthetic_image(16, 16, 1)[..., 0]
    err = INS.error_map(im, im * 0.9, str(tmp_path / "err.png"))
    assert err.max() > 0 and (tmp_path / "err.png").exists()
    mag = INS.spectrum(im, str(tmp_path / "spec.png"))
    assert mag.shape == im.shape
    paths = INS.noisy_preview(I.synthetic_image(16, 16, 3),
                              [(30.0, 2), (100.0, 5)], str(tmp_path / "nz"),
                              rng=np.random.RandomState(0))
    assert all(os.path.exists(p) for p in paths)


def test_layer_outputs_montage():
    import jax
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=32, hidden_layers=2, first_omega0=7.0,
                    hidden_omega0=7.0, scale=4.0)
    params = model.init(jax.random.key(0))
    mons = INS.layer_outputs(model, params, C.grid2d(16, 16), (16, 16),
                             nfilters_vis=4)
    assert len(mons) == 3  # first + 2 hidden
    assert all(m.ndim == 2 for m in mons)


def test_get_sr_data_and_shifted_burst():
    rng = np.random.RandomState(0)
    im3 = I.synthetic_image(32, 32, 3, seed=0)
    stack, ecc = Mo.get_sr_data(im3, 2, nimg=3, get_gt=True, rng=rng)
    assert stack.shape == (3, 16, 16, 3) and ecc.shape == (3, 2, 3)
    gray = im3[..., 0]
    st, Xs, Ys = Mo.shifted_downsampled_burst(gray, 2, nshifts=3,
                                              rng=np.random.RandomState(1))
    assert st.shape == (3, 16, 16)
    assert Xs.min() >= -2 and Xs.max() <= 2


def test_query_coords_and_cuboids():
    blocks, n = V.get_query_coords((-1, -1, -1), (1, 1, 1), 8, 64)
    assert blocks.shape[1:] == (64, 3) and n == 512
    X, Y, Z = V.cuboid_data((0, 0, 0), (1, 1, 1))
    assert X.shape == (4, 5)


def test_seed_everything():
    from wire_tpu.train.seeding import seed_everything
    key = seed_everything(3)
    a = np.random.rand(3)
    seed_everything(3)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)

def test_register_burst_subpixel_at_4x():
    """VERDICT r2 #1 done-criterion: registering a synthetically warped
    burst at 4x LR recovers the warped HR coordinate grids to < 0.3 px
    (pyramid ECC on cubic-upsampled LR frames, zero-border masked,
    inverted to the sampling convention like the reference's mat2coords)."""
    size, scale = 256, 4
    rng = np.random.RandomState(3)
    im = I.synthetic_image(size, size, 3, seed=3)
    imstack_hr, Xgt, Ygt, mats = Mo.make_burst(
        im, shift_max=5 * scale, theta_max=np.pi / 10, nframes=4, rng=rng)
    imstack = Mo.downsample_burst(imstack_hr, scale)
    Xs, Ys, ok, emats = Mo.register_burst(imstack, (size, size))
    assert ok.all()
    ex = (Xs - Xgt) * size / 2
    ey = (Ys - Ygt) * size / 2
    err = np.hypot(ex, ey)
    assert err.mean() < 0.3, f"mean registration error {err.mean():.3f} px"


def test_pyramid_register_identity_and_convention():
    """pyramid_register returns W with mov(W p) ~= ref(p): registering a
    frame against itself is identity; a pure shift is recovered."""
    im = I.synthetic_image(128, 128, 1, seed=5)[..., 0]
    w, ok = Mo.pyramid_register(im, im)
    assert ok
    np.testing.assert_allclose(w, np.eye(2, 3), atol=1e-3)
    mov = np.roll(im, (0, 3), axis=(0, 1))  # mov(x) = im(x - 3 in x)
    w, ok = Mo.pyramid_register(im, mov, mask=np.ones_like(im))
    assert ok
    # mov(p) = im(p - 3x) = im(M p), W = M^{-1} => W x-translation ~= +3
    assert abs(w[0, 2] - 3) < 0.1 and abs(w[1, 2]) < 0.1


def test_pyramid_register_without_cv2(monkeypatch):
    """ADVICE r3 #4: the cv2-absent fallback stack (scipy map_coordinates
    resize, numpy FFT phase-correlation init, native C++ Gauss-Newton ECC,
    numpy bilinear remap) is actually exercised — cv2 being installed in
    this environment otherwise shadows it everywhere."""
    monkeypatch.setattr(Mo, "cv2", None)
    im = I.synthetic_image(128, 128, 1, seed=5)[..., 0]
    w, ok = Mo.pyramid_register(im, im)
    assert ok
    np.testing.assert_allclose(w, np.eye(2, 3), atol=5e-3)
    mov = np.roll(im, (0, 3), axis=(0, 1))  # mov(x) = im(x - 3 in x)
    w, ok = Mo.pyramid_register(im, mov, mask=np.ones_like(im))
    assert ok
    assert abs(w[0, 2] - 3) < 0.15 and abs(w[1, 2]) < 0.15, w
