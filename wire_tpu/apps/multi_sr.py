"""Multi-frame super-resolution driver — the rebuild of wire_multi_sr.py:
combine a burst of randomly shifted/rotated LR frames into one HR INR.

Pipeline (wire_multi_sr.py:41-234): synthesize nimg = 0.25*s^2 warped HR
frames with known Euclidean motion, area-downsample each by s, optionally
re-estimate the motion (ECC registration) instead of using ground truth,
then fit: render the INR at each frame's warped HR grid, box-downsample,
masked MSE against the LR frame; frames in shuffled batches of 4; best
state restored at the end; scipy griddata interpolation as baseline.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from wire_tpu.nn import get_inr
from wire_tpu.signals import coords as C, image as I, motion as Mo
from wire_tpu.train import artifacts as A, metrics as M
from wire_tpu.train.trainer import FitConfig, fit_frames


def run(nonlin="wire", *, image=None, results_dir="results", seed=0,
        scale_sr=4, niters=2000, use_gt_registration=True, size=192,
        hidden_features=256, hidden_layers=2, omega0=10.0, sigma0=5.0,
        batch_size=4, mesh=None):
    A.log(f"Starting multi-SR with {nonlin}")
    learning_rate = {"wire": 5e-3, "siren": 1e-3, "mfn": 5e-2, "relu": 5e-4,
                     "posenc": 5e-4, "gauss": 1e-3}.get(nonlin, 5e-3)

    rng = np.random.RandomState(seed)
    if image:
        im = I.imread(image).astype(np.float32)
    else:
        im = I.synthetic_image(size, size, 3, seed=seed)
    H, W, _ = im.shape
    nimg = int(0.25 * scale_sr * scale_sr)
    shift_max = 5 * scale_sr
    theta_max = np.pi / 10

    imstack_hr, Xgt, Ygt, mats = Mo.make_burst(
        im, shift_max=shift_max, theta_max=theta_max, nframes=nimg, rng=rng)
    imstack = Mo.downsample_burst(imstack_hr, scale_sr)

    if use_gt_registration:
        Xs, Ys = Xgt, Ygt
    else:
        Xs, Ys, ok, _ = Mo.register_burst(imstack, (H, W))

    masks = 1.0 - np.float32(imstack == 0)
    ds = Mo.FrameDataset.build(imstack, Xs, Ys, masks)

    pos_encode = False
    model_nonlin = nonlin
    if nonlin == "posenc":
        model_nonlin = "relu"
        pos_encode = True
    model = get_inr(model_nonlin, in_features=2, out_features=3,
                    hidden_features=hidden_features,
                    hidden_layers=hidden_layers, first_omega0=omega0,
                    hidden_omega0=omega0, scale=sigma0,
                    pos_encode=pos_encode, sidelength=max(H, W))
    params = model.init(jax.random.key(seed))
    nparams = model.num_params(params)
    A.log(f"Learning with {nparams} parameters "
          f"({nimg * (H // scale_sr) * (W // scale_sr) / nparams:.2f}x "
          f"compression)")

    # griddata interpolation baseline (wire_multi_sr.py:169-182)
    im_interp = interp_baseline(im, imstack, Xs, Ys, scale_sr)
    snr_interp = float(M.psnr_ref(im, im_interp))

    cfg = FitConfig(learning_rate=learning_rate, niters=niters,
                    lr_decay=1.0, seed=seed)  # reference multi-SR: no decay
    if mesh is not None:
        from wire_tpu.dist import fit_frames_sharded
        res = fit_frames_sharded(model, params, ds.coords, ds.pixels,
                                 ds.masks, cfg, mesh, hr_shape=(H, W, 3),
                                 scale=scale_sr, batch_size=batch_size)
    else:
        res = fit_frames(model, params, ds.coords, ds.pixels, ds.masks, cfg,
                         hr_shape=(H, W, 3), scale=scale_sr,
                         batch_size=batch_size)

    # full-grid render with the best state (wire_multi_sr.py:231-234)
    coords_full = jnp.asarray(C.grid2d(H, W))
    img_full = np.asarray(model.apply(res.best_params, coords_full)).reshape(
        H, W, 3)
    snrval = float(M.psnr_ref(im, img_full))
    ssimval = float(M.ssim(im, img_full))
    A.log(f"multi-SR {nonlin}: PSNR {snrval:.3f} (interp {snr_interp:.3f}) "
          f"SSIM {ssimval:.3f}")

    outdir = os.path.join(results_dir, "multi_SR")
    os.makedirs(outdir, exist_ok=True)
    tag = "oracle_reg" if use_gt_registration else "estim_reg"
    A.save_mat(os.path.join(
        outdir, f"{scale_sr}x_{nimg}images_{nonlin}_{tag}.mat"), {
            "rec": img_full, "psnr_rec": snrval, "ssim_rec": ssimval,
            "psnr_interp": snr_interp, "rec_interp": im_interp})
    return {"psnr": snrval, "ssim": ssimval, "psnr_interp": snr_interp,
            "result": res}


def interp_baseline(im, imstack, Xs, Ys, scale_sr):
    """scipy griddata linear interpolation of the registered LR samples
    (wire_multi_sr.py:169-182)."""
    from scipy import interpolate
    H, W, _ = im.shape
    Y, X = np.mgrid[:H, :W]
    Xn = 2 * X / W - 1
    Yn = 2 * Y / H - 1
    pts = np.hstack((Xs[..., ::scale_sr, ::scale_sr].reshape(-1, 1),
                     Ys[..., ::scale_sr, ::scale_sr].reshape(-1, 1)))
    im_interp = np.zeros_like(im)
    for c in range(3):
        vals = imstack[..., c].reshape(-1, 1)
        im_interp[..., c] = interpolate.griddata(
            pts, vals, (Xn, Yn), method="linear")[..., 0]
    im_interp[np.isnan(im_interp)] = 0
    return im_interp


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nonlin", default="wire")
    p.add_argument("--image", default=None)
    p.add_argument("--results_dir", default="results")
    p.add_argument("--scale_sr", type=int, default=4)
    p.add_argument("--niters", type=int, default=2000)
    p.add_argument("--estim_reg", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", type=int, default=0)
    a = p.parse_args(argv)
    from wire_tpu.apps.common import mesh_from_arg
    run(a.nonlin, image=a.image, results_dir=a.results_dir,
        scale_sr=a.scale_sr, niters=a.niters,
        use_gt_registration=not a.estim_reg, seed=a.seed,
        mesh=mesh_from_arg(a.mesh))


if __name__ == "__main__":
    main()
