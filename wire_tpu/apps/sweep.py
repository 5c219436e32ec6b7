"""Nonlinearity sweep drivers — the rebuild of the legacy ``wire_*.py``
scripts' outer loops: run each of the six headline nonlinearities (wire,
siren, mfn, relu, posenc, gauss) on one task with the scripts' hardcoded
per-nonlin hyperparameters, record the deviation from the paper's expected
metric table, and aggregate.

(The reference's own legacy scripts can no longer run — their factory call
omits a required argument, SURVEY.md §2.6; this driver implements the
intended behavior.)

Tasks and their hardcoded settings (with reference cites):
- denoise  wire_image_denoise.py:30-77 (omega0 7, sigma0 4/6-wire, 300 wide,
           2000 iters, per-nonlin LRs, expected PSNRs at :31)
- ct       wire_ct.py:28-53 (omega0 3/12-siren, 300 wide, 5000 iters)
- sisr     wire_SISR.py:28-60 (omega0 8, down 4x, 2000 iters)
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax

from wire_tpu.nn import get_inr
from wire_tpu.signals import coords as C, image as I, noise as N
from wire_tpu.train import artifacts as A, metrics as M
from wire_tpu.train.trainer import FitConfig, fit_pointwise, fit_operator
from wire_tpu.apps import common

NONLINS = ["wire", "siren", "mfn", "relu", "posenc", "gauss"]

# paper-expected values per task (order matches NONLINS)
EXPECTED = {
    "denoise_psnr": [30.2, 26.6, 28.1, 0, 29.2, 29.7],  # wire_image_denoise.py:31
    "ct_psnr": [32.3, 30.3, 18.1, 0, 28.5, 29.2],       # wire_ct.py:34-37
    "ct_ssim": [0.81, 0.76, 0.23, 0, 0.71, 0.73],
    "sisr_mse_db": [27.3, 25.6, 21.9, 0, 26.3, 26.1],   # wire_SISR.py:32-35
    "sisr_ssim": [0.93, 0.90, 0.77, 0, 0.92, 0.91],
}

_DENOISE_LR = {"wire": 5e-3, "siren": 2e-3, "mfn": 5e-2, "relu": 1e-3,
               "posenc": 2e-3, "gauss": 3e-3}  # wire_image_denoise.py:76-83
_CT_LR = {"wire": 5e-3, "siren": 2e-3, "mfn": 5e-2, "relu": 1e-3,
          "posenc": 1e-3, "gauss": 2e-3}       # wire_ct.py:67-76
_SISR_LR = {"wire": 5e-3, "siren": 2e-3, "mfn": 5e-2, "relu": 1e-3,
            "posenc": 1e-3, "gauss": 2e-3}     # wire_SISR.py:96-103


def _build(nonlin, task, H, W, tau, in_features=2, out_features=3,
           hidden_features=None, hidden_layers=2, posenc_sidelength=None):
    omega0, sigma0 = {
        "denoise": (7.0, 4.0), "ct": (3.0, 12.0), "sisr": (8.0, 9.0),
    }[task]  # denoise :41-42, ct :47-49, sisr wire_SISR.py:49-51
    if hidden_features is None:
        # wire_image_denoise.py:48 / wire_ct.py:52-53 use 300;
        # wire_SISR.py:55-56 uses 256
        hidden_features = 256 if task == "sisr" else 300
    if task == "denoise" and nonlin == "wire":
        sigma0 = 6.0  # wire_image_denoise.py:86
    if task == "ct" and nonlin == "siren":
        omega0 = 12.0  # wire_ct.py:84-85
    pos_encode = False
    model_nonlin = nonlin
    sidelength = H
    if nonlin == "posenc":
        model_nonlin, pos_encode = "relu", True
        if posenc_sidelength is not None:
            sidelength = posenc_sidelength  # ct: nmeas (wire_ct.py:103)
        else:
            sidelength = (int(max(H, W) / 3)
                          if (task == "denoise" and tau < 100)
                          else int(max(H, W)))
    model = get_inr(model_nonlin, in_features=in_features,
                    out_features=out_features,
                    hidden_features=hidden_features,
                    hidden_layers=hidden_layers, first_omega0=omega0,
                    hidden_omega0=omega0, scale=sigma0,
                    pos_encode=pos_encode, sidelength=sidelength)
    return model


def sweep_denoise_seeds(nonlin, n_seeds, image=None, results_dir="results",
                        seed0=0, niters=2000, tau=3e1, noise_snr=2,
                        size=512, downscale=0.5):
    """Multi-seed denoise fits of ONE family in a single device program
    (trainer.fit_pointwise_many, VERDICT r4 #6): replica r runs seed
    seed0 + r on the same noisy stand-in — the robustness-quartet /
    seed-sweep workload the reference's serial scripts repeat one process
    at a time.  Returns per-seed PSNRs (reference formula)."""
    import jax.numpy as jnp
    from wire_tpu.train.trainer import fit_pointwise_many
    im = common.load_image(image, size=size, channels=3, seed=seed0)
    if downscale != 1:
        im = I.resize_area(im, downscale)
    H, W, _ = im.shape
    rng = np.random.RandomState(seed0)
    im_noisy = N.measure_np(im, noise_snr, tau, rng=rng).astype(np.float32)
    model = _build(nonlin, "denoise", H, W, tau)
    keys = jax.random.split(jax.random.key(seed0), n_seeds)
    pstack = jax.vmap(lambda k: model._init(k, model.spec))(keys)
    cfg = FitConfig(learning_rate=_DENOISE_LR[nonlin], niters=niters,
                    maxpoints=256 * 256, scale_lr_by_batch=True, seed=seed0)
    res = fit_pointwise_many(model, pstack, C.grid2d(H, W),
                             jnp.asarray(im_noisy.reshape(-1, 3)), cfg,
                             gt=im.reshape(-1, 3), track="gt")
    psnrs = [float(M.psnr_ref(im, res.best_rec[r].reshape(H, W, 3)))
             for r in range(n_seeds)]
    A.log(f"denoise {nonlin} x{n_seeds} seeds: "
          + " ".join(f"{p:.2f}" for p in psnrs)
          + f" ({res.wall_time_s:.1f}s total)")
    return {"psnrs": psnrs, "wall_s": res.wall_time_s, "recs": res.best_rec}


def sweep_ct_seeds(nonlin, n_seeds, image=None, results_dir="results",
                   seed0=0, niters=5000, nmeas=100, size=512):
    """Multi-seed CT fits of ONE family in a single device program
    (trainer.fit_operator_many): replica r initializes with seed seed0+r
    and fits the same sinogram (the operator iteration itself is
    deterministic — full-grid renders, no minibatch RNG).  Returns
    per-seed PSNRs (reference formula)."""
    import jax.numpy as jnp
    from wire_tpu.operators.radon import radon
    from wire_tpu.train.trainer import fit_operator_many
    img = common.load_image(image, size=size, channels=1, seed=seed0)
    if img.ndim == 3:
        img = img[..., 0]
    img = I.normalize(img, True).astype(np.float32)
    H, W = img.shape
    thetas = jnp.asarray(np.linspace(0, 180, nmeas, dtype=np.float32))
    sinogram = np.asarray(jax.jit(lambda x: radon(x, thetas))(
        jnp.asarray(img)))
    model = _build(nonlin, "ct", H, W, tau=1e2, out_features=1,
                   posenc_sidelength=nmeas)
    keys = jax.random.split(jax.random.key(seed0), n_seeds)
    pstack = jax.vmap(lambda k: model._init(k, model.spec))(keys)
    cfg = FitConfig(learning_rate=_CT_LR[nonlin], niters=niters, seed=seed0)
    res = fit_operator_many(model, pstack, C.grid2d(H, W), sinogram,
                            lambda f: radon(f, thetas), cfg, gt_field=img,
                            field_shape=(H, W), track="gt")
    psnrs = [float(M.psnr_ref(img, res.best_rec[r])) for r in range(n_seeds)]
    A.log(f"ct {nonlin} x{n_seeds} seeds: "
          + " ".join(f"{p:.2f}" for p in psnrs)
          + f" ({res.wall_time_s:.1f}s total)")
    return {"psnrs": psnrs, "wall_s": res.wall_time_s, "recs": res.best_rec}


def sweep_sisr_seeds(nonlin, n_seeds, image=None, results_dir="results",
                     seed0=0, niters=2000, scale=4, size=768):
    """Multi-seed SISR fits of ONE family in a single device program
    (trainer.fit_operator_many); replica r initializes with seed
    seed0+r.  Returns per-seed MSE (dB, vs the clean HR image)."""
    from wire_tpu.operators.forward import sisr_op
    from wire_tpu.train.trainer import fit_operator_many
    im = common.load_image(image, size=size, channels=3, seed=seed0)
    im = I.resize_area(im, 1 / 3)
    H, W, _ = im.shape
    im = im[:scale * (H // scale), :scale * (W // scale), :]
    H, W, _ = im.shape
    im_lr = I.resize_area(im, 1 / scale)
    model = _build(nonlin, "sisr", H, W, tau=1e2)
    keys = jax.random.split(jax.random.key(seed0), n_seeds)
    pstack = jax.vmap(lambda k: model._init(k, model.spec))(keys)
    cfg = FitConfig(learning_rate=_SISR_LR[nonlin], niters=niters,
                    lr_decay=0.2, seed=seed0)
    res = fit_operator_many(model, pstack, C.grid2d(H, W), im_lr,
                            lambda f: sisr_op(f, scale), cfg, gt_field=im,
                            field_shape=(H, W, 3), track="gt")
    mse_db = [float(-10 * np.log10(res.best_mse[r])) for r in range(n_seeds)]
    A.log(f"sisr {nonlin} x{n_seeds} seeds: "
          + " ".join(f"{p:.2f}" for p in mse_db)
          + f" ({res.wall_time_s:.1f}s total)")
    return {"mse_db": mse_db, "wall_s": res.wall_time_s,
            "recs": res.best_rec}


def sweep_denoise(image=None, results_dir="results", seed=0, niters=2000,
                  tau=3e1, noise_snr=2, nonlins=NONLINS, size=512,
                  downscale=0.5):
    # the reference script's fixed 1/2 (wire_image_denoise.py:55) assumes
    # its 2040x1356 parrot source; downscale=1 keeps smaller inputs at a
    # comparable pixels-per-parameter ratio
    im = common.load_image(image, size=size, channels=3, seed=seed)
    if downscale != 1:
        im = I.resize_area(im, downscale)
    H, W, _ = im.shape
    rng = np.random.RandomState(seed)
    im_noisy = N.measure_np(im, noise_snr, tau, rng=rng).astype(np.float32)
    coords = C.grid2d(H, W)

    results = {}
    for i, nonlin in enumerate(nonlins):
        model = _build(nonlin, "denoise", H, W, tau)
        params = model.init(jax.random.key(seed))
        cfg = FitConfig(learning_rate=_DENOISE_LR[nonlin], niters=niters,
                        maxpoints=256 * 256, scale_lr_by_batch=True,
                        seed=seed)
        res = fit_pointwise(model, params, coords,
                            im_noisy.reshape(-1, 3), cfg,
                            gt=im.reshape(-1, 3), track="gt")
        psnr = float(M.psnr_ref(im, res.best_rec.reshape(H, W, 3)))
        exp = EXPECTED["denoise_psnr"][NONLINS.index(nonlin)]
        results[nonlin] = {
            "Best PSNR": psnr, "Expected PSNR": exp,
            "PSNR Difference": psnr - exp,
            "Number of parameters": model.num_params(params),
            "Time (s)": res.wall_time_s,
            "rec": res.best_rec.reshape(H, W, 3),
        }
        A.log(f"denoise {nonlin}: PSNR {psnr:.2f} (expected {exp})")
    _save_sweep(results, results_dir, "denoise_sweep")
    return results


def sweep_ct(image=None, results_dir="results", seed=0, niters=5000,
             nmeas=100, nonlins=NONLINS, size=512):
    import jax.numpy as jnp
    from wire_tpu.operators.radon import radon
    img = common.load_image(image, size=size, channels=1, seed=seed)
    if img.ndim == 3:
        img = img[..., 0]
    img = I.normalize(img, True).astype(np.float32)
    H, W = img.shape
    thetas = jnp.asarray(np.linspace(0, 180, nmeas, dtype=np.float32))
    # jit: eager complex FFT ops are unimplemented on some TPU backends
    sinogram = np.asarray(jax.jit(lambda x: radon(x, thetas))(
        jnp.asarray(img)))
    coords = C.grid2d(H, W)

    results = {}
    for nonlin in nonlins:
        lr = _CT_LR[nonlin]
        model = _build(nonlin, "ct", H, W, tau=1e2, out_features=1,
                       posenc_sidelength=nmeas)  # wire_ct.py:103
        params = model.init(jax.random.key(seed))
        cfg = FitConfig(learning_rate=lr, niters=niters, seed=seed)
        res = fit_operator(model, params, coords, sinogram,
                           lambda f: radon(f, thetas), cfg, gt_field=img,
                           field_shape=(H, W), track="gt")
        psnr = float(M.psnr_ref(img, res.best_rec))
        ssim = float(M.ssim(img, res.best_rec))
        iexp = NONLINS.index(nonlin)
        results[nonlin] = {
            "Best PSNR": psnr, "Expected PSNR": EXPECTED["ct_psnr"][iexp],
            "PSNR Difference": psnr - EXPECTED["ct_psnr"][iexp],
            "Best SSIM": ssim, "Expected SSIM": EXPECTED["ct_ssim"][iexp],
            "Time (s)": res.wall_time_s, "rec": res.best_rec,
        }
        A.log(f"ct {nonlin}: PSNR {psnr:.2f} SSIM {ssim:.3f}")
    _save_sweep(results, results_dir, "ct_sweep")
    return results


def sweep_sisr(image=None, results_dir="results", seed=0, niters=2000,
               scale=4, nonlins=NONLINS, size=768):
    from wire_tpu.operators.forward import sisr_op
    im = common.load_image(image, size=size, channels=3, seed=seed)
    im = I.resize_area(im, 1 / 3)
    H, W, _ = im.shape
    im = im[:scale * (H // scale), :scale * (W // scale), :]
    H, W, _ = im.shape
    im_lr = I.resize_area(im, 1 / scale)
    coords = C.grid2d(H, W)

    results = {}
    for nonlin in nonlins:
        lr = _SISR_LR[nonlin]
        model = _build(nonlin, "sisr", H, W, tau=1e2)
        params = model.init(jax.random.key(seed))
        cfg = FitConfig(learning_rate=lr, niters=niters, lr_decay=0.2,
                        seed=seed)
        res = fit_operator(model, params, coords, im_lr,
                           lambda f: sisr_op(f, scale), cfg, gt_field=im,
                           field_shape=(H, W, 3), track="gt")
        mse_db = float(-10 * np.log10(res.best_mse))
        ssim = float(M.ssim(im, res.best_rec))
        iexp = NONLINS.index(nonlin)
        results[nonlin] = {
            "Best MSE": mse_db,
            "Expected MSE": EXPECTED["sisr_mse_db"][iexp],
            "Best SSIM": ssim,
            "Expected SSIM": EXPECTED["sisr_ssim"][iexp],
            "Time (s)": res.wall_time_s, "rec": res.best_rec,
        }
        A.log(f"sisr {nonlin}: MSE {mse_db:.2f}dB SSIM {ssim:.3f}")
    _save_sweep(results, results_dir, "sisr_sweep")
    return results


def _save_sweep(results, results_dir, name):
    os.makedirs(results_dir, exist_ok=True)
    mdict = {}
    metrics = {}
    for nonlin, r in results.items():
        mdict[nonlin] = {"rec": r["rec"]}
        metrics[nonlin] = {k: v for k, v in r.items() if k != "rec"}
    A.save_mat(os.path.join(results_dir, f"{name}_info.mat"), mdict)
    mpath = os.path.join(results_dir, f"{name}_metrics.mat")
    A.save_mat(mpath, metrics)
    A.tabulate_results(mpath, results_dir)
    os.rename(os.path.join(results_dir, "metrics_table.md"),
              os.path.join(results_dir, f"{name}_table.md"))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("task", choices=["denoise", "ct", "sisr"])
    p.add_argument("--image", default=None)
    p.add_argument("--results_dir", default="results")
    p.add_argument("--niters", type=int, default=None)
    p.add_argument("--nonlins", nargs="+", default=NONLINS)
    p.add_argument("--downscale", type=float, default=None)
    p.add_argument("--seeds", type=int, default=0,
                   help="run this many seeds of ONE family (the first of "
                        "--nonlins) batched in one device program")
    a = p.parse_args(argv)
    if a.seeds:
        if a.task == "denoise":
            sweep_denoise_seeds(a.nonlins[0], a.seeds, image=a.image,
                                results_dir=a.results_dir,
                                niters=a.niters or 2000,
                                downscale=(0.5 if a.downscale is None
                                           else a.downscale))
        elif a.task == "ct":
            sweep_ct_seeds(a.nonlins[0], a.seeds, image=a.image,
                           results_dir=a.results_dir,
                           niters=a.niters or 5000)
        else:
            sweep_sisr_seeds(a.nonlins[0], a.seeds, image=a.image,
                             results_dir=a.results_dir,
                             niters=a.niters or 2000)
        return
    kw = dict(image=a.image, results_dir=a.results_dir, nonlins=a.nonlins)
    if a.niters:
        kw["niters"] = a.niters
    if a.downscale is not None and a.task == "denoise":
        kw["downscale"] = a.downscale
    {"denoise": sweep_denoise, "ct": sweep_ct, "sisr": sweep_sisr}[a.task](
        **kw)


if __name__ == "__main__":
    main()
