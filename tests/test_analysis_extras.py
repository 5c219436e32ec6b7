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
