"""Torch-oracle end-to-end sweep runs on the SAME stand-in images as
apps/sweep.py (VERDICT r3 #1-2): the sweep tables compare against the
paper's expected values, which were calibrated on parrot/chest/butterfly
inputs that don't exist here — so outliers like mfn's -5.5 dB were
uninterpretable.  This harness runs the REFERENCE torch model (imported
read-only via tests/torch_bridge) through the reference training loop
semantics on the stand-in data, giving a same-image oracle number that
adjudicates every sweep delta: if torch lands at the same value, the
deviation is the image, not a bug.

Protocols reproduced (full fidelity, CPU torch):
- denoise: wire_image_denoise.py:30-177 — Adam(lr*min(1,maxpoints/N)),
  LambdaLR 0.1^(e/niters) per epoch, minibatch loop (full batch at 256^2),
  best tracked by per-epoch MSE vs clean gt, PSNR = psnr_ref.
- sisr: wire_SISR.py:28-208 — HR render -> AvgPool2d(scale), loss vs LR,
  Adam(lr), LambdaLR 0.2^(e/niters), best by MSE vs HR gt; reports
  -10 log10(best_mse) and SSIM.

Usage:
  python tools/oracle_sweep.py denoise mfn  [--niters 2000] [--out DIR]
  python tools/oracle_sweep.py sisr wire    [--niters 2000]
  python tools/oracle_sweep.py denoise mfn --jax   # run wire_tpu side too,
        same init (weights copied from the torch model), same schedule
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

# CPU jax for the torch-side runs (the shell presets JAX_PLATFORMS=axon, so
# setdefault would keep the TPU; decided in main() before any jax import:
# torch runs force cpu so they can run alongside TPU jobs, --jax_only keeps
# the preset backend because the number being adjudicated is a TPU number).


def _stand_in_denoise(seed=0):
    from wire_tpu.apps import common
    from wire_tpu.signals import image as I, noise as N
    im = common.load_image(None, size=512, channels=3, seed=seed)
    im = I.resize_area(im, 0.5)
    rng = np.random.RandomState(seed)
    im_noisy = N.measure_np(im, 2, 3e1, rng=rng).astype(np.float32)
    return im.astype(np.float32), im_noisy


def _stand_in_sisr(seed=0, scale=4):
    from wire_tpu.apps import common
    from wire_tpu.signals import image as I
    im = common.load_image(None, size=768, channels=3, seed=seed)
    im = I.resize_area(im, 1 / 3)
    H, W, _ = im.shape
    im = im[:scale * (H // scale), :scale * (W // scale), :]
    im_lr = I.resize_area(im, 1 / scale)
    return im.astype(np.float32), im_lr.astype(np.float32)


def _stand_in_ct(seed=0, size=256):
    from wire_tpu.apps import common
    from wire_tpu.signals import image as I
    img = common.load_image(None, size=size, channels=1, seed=seed)
    if img.ndim == 3:
        img = img[..., 0]
    return I.normalize(img, True).astype(np.float32)


def _make_rot_grids(H, W, thetas_deg):
    """Per-angle torch grid_sample grids reproducing the reference Radon
    rotation (lin_inverse.py:33, kornia.geometry.rotate == cv2 convention,
    pinned in wire_tpu/ops/resample.py:50-65): rotate about the pixel center
    ((W-1)/2, (H-1)/2), positive = CCW on screen, bilinear, zero padding.
    For align_corners=True the normalized<->pixel map is linear about that
    same center, so the grid is the centered pixel-space inverse rotation
    renormalized."""
    import torch
    t = torch.deg2rad(torch.tensor(np.asarray(thetas_deg, np.float32)))
    cos, sin = torch.cos(t)[:, None, None], torch.sin(t)[:, None, None]
    ys, xs = torch.meshgrid(torch.arange(H, dtype=torch.float32),
                            torch.arange(W, dtype=torch.float32),
                            indexing="ij")
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    x, y = xs - cx, ys - cy
    sx = cos * x - sin * y + cx
    sy = sin * x + cos * y + cy
    gx = 2 * sx / (W - 1) - 1
    gy = 2 * sy / (H - 1) - 1
    return torch.stack([gx, gy], -1)  # (A, H, W, 2)


def _torch_radon(img_1chw, grids):
    """Reference radon semantics (rotate every angle, sum rows) on torch CPU
    without kornia (not installed here): F.grid_sample on the pinned-
    convention grids.  (1, 1, H, W) -> (A, W)."""
    import torch.nn.functional as F
    rot = F.grid_sample(img_1chw.expand(grids.shape[0], -1, -1, -1), grids,
                        mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    return rot.sum(2).squeeze(1)


def _build_torch_model(nonlin, task, H, W):
    from torch_bridge import make_ref_model
    from wire_tpu.apps.sweep import _build
    # reuse the (now reference-pinned) sweep builder for the hyperparams,
    # then instantiate the torch model with the same numbers
    m = _build(nonlin, task, H, W,
               tau=3e1 if task == "denoise" else 1e2,
               out_features=3 if task != "ct" else 1)
    spec = m.spec
    ref = make_ref_model(
        spec.nonlin if not spec.pos_encode else "posenc",
        in_features=spec.in_features, hidden_features=spec.hidden_features,
        hidden_layers=spec.hidden_layers, out_features=spec.out_features,
        first_omega0=spec.first_omega0, hidden_omega0=spec.hidden_omega0,
        scale=spec.scale, pos_encode=spec.pos_encode,
        sidelength=spec.sidelength)
    return ref, m


def run_denoise_torch(nonlin, niters, seed=0, log_every=100):
    import copy
    import torch
    from wire_tpu.apps.sweep import _DENOISE_LR
    from wire_tpu.signals import coords as C
    from wire_tpu.train import metrics as M

    im, im_noisy = _stand_in_denoise(seed)
    H, W, _ = im.shape
    maxpoints = 256 * 256
    model, jm = _build_torch_model(nonlin, "denoise", H, W)
    state0 = copy.deepcopy(model.state_dict())  # init, for the jax side
    lr = _DENOISE_LR[nonlin] * min(1, maxpoints / (H * W))
    optim = torch.optim.Adam(lr=lr, params=model.parameters())
    sched = torch.optim.lr_scheduler.LambdaLR(
        optim, lambda x: 0.1 ** min(x / niters, 1))

    coords = torch.tensor(np.asarray(C.grid2d(H, W)))[None]
    gt = torch.tensor(im.reshape(-1, 3))[None]
    gt_noisy = torch.tensor(im_noisy.reshape(-1, 3))[None]
    n = H * W

    best_mse, best_img = float("inf"), None
    mse_hist = []
    t0 = time.time()
    rec = torch.zeros_like(gt)
    for epoch in range(niters):
        if n > maxpoints:
            indices = torch.randperm(n)
        else:
            indices = torch.arange(n)
        for b0 in range(0, n, maxpoints):
            b_idx = indices[b0:min(n, b0 + maxpoints)]
            pix = model(coords[:, b_idx])
            with torch.no_grad():
                rec[:, b_idx] = pix
            loss = ((pix - gt_noisy[:, b_idx]) ** 2).mean()
            optim.zero_grad()
            loss.backward()
            optim.step()
        sched.step()
        with torch.no_grad():
            mse = ((gt - rec) ** 2).mean().item()
        mse_hist.append(mse)
        if mse < best_mse or epoch == 0:
            best_mse = mse
            best_img = rec.detach().numpy().reshape(H, W, 3).copy()
        if log_every and epoch % log_every == 0:
            print(f"[torch {nonlin}] epoch {epoch}: mse_gt {mse:.5f} "
                  f"psnr {-10 * np.log10(mse):.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    psnr = float(M.psnr_ref(im, best_img))
    model.load_state_dict(state0)  # restore the INIT for the jax side
    return {"nonlin": nonlin, "task": "denoise", "niters": niters,
            "psnr_ref": psnr, "best_mse": best_mse,
            "psnr_mse": float(-10 * np.log10(best_mse)),
            "wall_s": time.time() - t0, "mse_hist": mse_hist}, (model, jm)


def run_sisr_torch(nonlin, niters, seed=0, scale=4, log_every=100):
    import copy
    import torch
    from wire_tpu.apps.sweep import _SISR_LR
    from wire_tpu.signals import coords as C
    from wire_tpu.train import metrics as M

    im, im_lr = _stand_in_sisr(seed, scale)
    H, W, _ = im.shape
    model, jm = _build_torch_model(nonlin, "sisr", H, W)
    state0 = copy.deepcopy(model.state_dict())  # init, for the jax side
    lr = _SISR_LR[nonlin]
    optim = torch.optim.Adam(lr=lr, params=model.parameters())
    sched = torch.optim.lr_scheduler.LambdaLR(
        optim, lambda x: 0.2 ** min(x / niters, 1))

    coords_hr = torch.tensor(np.asarray(C.grid2d(H, W)))[None]
    gt = torch.tensor(im.reshape(-1, 3))[None]
    gt_lr = torch.tensor(im_lr.reshape(-1, 3))[None]
    down = torch.nn.AvgPool2d(scale)

    best_mse, best_img = float("inf"), None
    mse_hist = []
    t0 = time.time()
    for epoch in range(niters):
        rec_hr = model(coords_hr)
        rec = down(rec_hr.reshape(H, W, 3).permute(2, 0, 1)[None])
        loss = ((gt_lr - rec.reshape(1, 3, -1).permute(0, 2, 1)) ** 2).mean()
        with torch.no_grad():
            mse = ((gt - rec_hr) ** 2).mean().item()
        optim.zero_grad()
        loss.backward()
        optim.step()
        sched.step()
        mse_hist.append(mse)
        if mse < best_mse:
            best_mse = mse
            best_img = (rec_hr.detach().numpy().reshape(H, W, 3)).copy()
        if log_every and epoch % log_every == 0:
            print(f"[torch {nonlin}] epoch {epoch}: mse_gt {mse:.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    mse_db = float(-10 * np.log10(best_mse))
    ssim = float(M.ssim(im, best_img))
    model.load_state_dict(state0)  # restore the INIT for the jax side
    return {"nonlin": nonlin, "task": "sisr", "niters": niters,
            "mse_db": mse_db, "ssim": ssim, "best_mse": best_mse,
            "wall_s": time.time() - t0, "mse_hist": mse_hist}, (model, jm)


def run_ct_torch(nonlin, niters, seed=0, size=256, nmeas=100, log_every=100):
    """Reference CT loop (wire_ct.py:120-152): full-batch render, radon
    forward, Adam + LambdaLR 0.1^(e/niters), best tracked by MSE vs gt."""
    import copy
    import torch
    from wire_tpu.apps.sweep import _CT_LR
    from wire_tpu.signals import coords as C
    from wire_tpu.train import metrics as M

    img = _stand_in_ct(seed, size)
    H, W = img.shape
    model, jm = _build_torch_model(nonlin, "ct", H, W)
    state0 = copy.deepcopy(model.state_dict())
    optim = torch.optim.Adam(lr=_CT_LR[nonlin], params=model.parameters())
    sched = torch.optim.lr_scheduler.LambdaLR(
        optim, lambda x: 0.1 ** min(x / niters, 1))

    thetas = np.linspace(0, 180, nmeas, dtype=np.float32)
    grids = _make_rot_grids(H, W, thetas)
    imten = torch.tensor(img)[None, None]
    with torch.no_grad():
        sino = _torch_radon(imten, grids)
    coords = torch.tensor(np.asarray(C.grid2d(H, W)))[None]

    best_mse, best_img = float("inf"), None
    mse_hist = []
    t0 = time.time()
    for epoch in range(niters):
        img_estim = model(coords).reshape(1, 1, H, W)
        sino_estim = _torch_radon(img_estim, grids)
        loss = ((sino - sino_estim) ** 2).mean()
        optim.zero_grad()
        loss.backward()
        optim.step()
        sched.step()
        with torch.no_grad():
            mse = ((img_estim[0, 0] - imten[0, 0]) ** 2).mean().item()
        mse_hist.append(mse)
        if mse < best_mse:
            best_mse = mse
            best_img = img_estim.detach().numpy().reshape(H, W).copy()
        if log_every and epoch % log_every == 0:
            print(f"[torch {nonlin}] epoch {epoch}: mse_gt {mse:.5f} "
                  f"psnr {-10 * np.log10(mse):.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    psnr = float(M.psnr_ref(img, best_img))
    ssim = float(M.ssim(img, best_img))
    model.load_state_dict(state0)
    return {"nonlin": nonlin, "task": "ct", "niters": niters, "size": size,
            "nmeas": nmeas, "psnr_ref": psnr, "ssim": ssim,
            "best_mse": best_mse, "wall_s": time.time() - t0,
            "mse_hist": mse_hist}, (model, jm)


def run_ct_jax(nonlin, niters, torch_model, jax_model, seed=0, size=256,
               nmeas=100):
    """wire_tpu CT fit at identical settings, through the reference-exact
    'rotate' operator (same bilinear line integrals as the torch oracle)."""
    import jax
    from torch_bridge import params_from_ref
    from wire_tpu.apps.sweep import _CT_LR
    from wire_tpu.operators.radon import RadonOp
    from wire_tpu.signals import coords as C
    from wire_tpu.train import metrics as M
    from wire_tpu.train.trainer import FitConfig, fit_operator

    img = _stand_in_ct(seed, size)
    H, W = img.shape
    params = jax.tree.map(
        jax.numpy.asarray,
        params_from_ref(nonlin if nonlin != "posenc" else "relu",
                        torch_model, jax_model.spec.hidden_layers))
    op = RadonOp(np.linspace(0, 180, nmeas, dtype=np.float32),
                 method="rotate")
    sino = np.asarray(jax.jit(op)(jax.numpy.asarray(img)))
    cfg = FitConfig(learning_rate=_CT_LR[nonlin], niters=niters, seed=seed)
    res = fit_operator(jax_model, params, C.grid2d(H, W), sino, op, cfg,
                       gt_field=img, field_shape=(H, W), track="gt")
    psnr = float(M.psnr_ref(img, res.best_rec))
    ssim = float(M.ssim(img, res.best_rec))
    return {"nonlin": nonlin, "task": "ct_jax", "niters": niters,
            "size": size, "nmeas": nmeas, "psnr_ref": psnr, "ssim": ssim,
            "best_mse": float(res.best_mse), "wall_s": res.wall_time_s,
            "mse_hist": np.asarray(res.mse_gt).tolist()}


def run_denoise_jax(nonlin, niters, torch_model, jax_model, seed=0):
    """wire_tpu fit at IDENTICAL settings: same stand-in data, same init
    (weights copied from the torch model), same LR/schedule."""
    import jax
    from torch_bridge import params_from_ref
    from wire_tpu.apps.sweep import _DENOISE_LR
    from wire_tpu.signals import coords as C
    from wire_tpu.train import metrics as M
    from wire_tpu.train.trainer import FitConfig, fit_pointwise

    im, im_noisy = _stand_in_denoise(seed)
    H, W, _ = im.shape
    params = jax.tree.map(
        jax.numpy.asarray,
        params_from_ref(nonlin if nonlin != "posenc" else "relu",
                        torch_model, jax_model.spec.hidden_layers))
    cfg = FitConfig(learning_rate=_DENOISE_LR[nonlin], niters=niters,
                    maxpoints=256 * 256, scale_lr_by_batch=True, seed=seed)
    res = fit_pointwise(jax_model, params, C.grid2d(H, W),
                        im_noisy.reshape(-1, 3), cfg,
                        gt=im.reshape(-1, 3), track="gt")
    psnr = float(M.psnr_ref(im, res.best_rec.reshape(H, W, 3)))
    return {"nonlin": nonlin, "task": "denoise_jax", "niters": niters,
            "psnr_ref": psnr, "best_mse": float(res.best_mse),
            "wall_s": res.wall_time_s,
            "mse_hist": np.asarray(res.mse_gt).tolist()}


def run_sisr_jax(nonlin, niters, torch_model, jax_model, seed=0, scale=4):
    import jax
    from torch_bridge import params_from_ref
    from wire_tpu.apps.sweep import _SISR_LR
    from wire_tpu.operators.forward import sisr_op
    from wire_tpu.signals import coords as C
    from wire_tpu.train import metrics as M
    from wire_tpu.train.trainer import FitConfig, fit_operator

    im, im_lr = _stand_in_sisr(seed, scale)
    H, W, _ = im.shape
    params = jax.tree.map(
        jax.numpy.asarray,
        params_from_ref(nonlin if nonlin != "posenc" else "relu",
                        torch_model, jax_model.spec.hidden_layers))
    cfg = FitConfig(learning_rate=_SISR_LR[nonlin], niters=niters,
                    lr_decay=0.2, seed=seed)
    res = fit_operator(jax_model, params, C.grid2d(H, W), im_lr,
                       lambda f: sisr_op(f, scale), cfg, gt_field=im,
                       field_shape=(H, W, 3), track="gt")
    mse_db = float(-10 * np.log10(res.best_mse))
    ssim = float(M.ssim(im, res.best_rec))
    return {"nonlin": nonlin, "task": "sisr_jax", "niters": niters,
            "mse_db": mse_db, "ssim": ssim, "best_mse": float(res.best_mse),
            "wall_s": res.wall_time_s,
            "mse_hist": np.asarray(res.mse_gt).tolist()}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("task", choices=["denoise", "sisr", "ct"])
    p.add_argument("--size", type=int, default=256,
                   help="ct stand-in side (256 keeps torch CPU tractable)")
    p.add_argument("--nmeas", type=int, default=100)
    p.add_argument("nonlin")
    p.add_argument("--niters", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--jax", action="store_true",
                   help="also run the wire_tpu fit from the same init")
    p.add_argument("--jax_only", action="store_true",
                   help="run only the wire_tpu side, loading the init the "
                        "torch run saved (lets the slow CPU torch run and "
                        "the TPU fit be scheduled independently)")
    p.add_argument("--out", default="results_tpu_r4/oracle")
    a = p.parse_args()
    if not (a.jax or a.jax_only):
        os.environ["JAX_PLATFORMS"] = "cpu"

    os.makedirs(a.out, exist_ok=True)
    path = os.path.join(a.out, f"oracle_{a.task}_{a.nonlin}.json")
    ipath = os.path.join(a.out, f"oracle_{a.task}_{a.nonlin}_init.pt")

    if a.jax_only:
        import torch
        with open(path) as f:
            out = json.load(f)
        if a.task == "denoise":
            im, _ = _stand_in_denoise(a.seed)
            H, W, _ = im.shape
        elif a.task == "sisr":
            im, _ = _stand_in_sisr(a.seed)
            H, W, _ = im.shape
        else:
            im = _stand_in_ct(a.seed, a.size)
            H, W = im.shape
        tm, jm = _build_torch_model(a.nonlin, a.task, H, W)
        tm.load_state_dict(torch.load(ipath, weights_only=True))
        if a.task == "ct":
            jr = run_ct_jax(a.nonlin, a.niters, tm, jm, a.seed, a.size,
                            a.nmeas)
        else:
            jr = (run_denoise_jax if a.task == "denoise" else run_sisr_jax)(
                a.nonlin, a.niters, tm, jm, a.seed)
        print(json.dumps({k: v for k, v in jr.items() if k != "mse_hist"}))
        out["jax"] = jr
        with open(path, "w") as f:
            json.dump(out, f)
        print(f"wrote {path}")
        return

    if a.task == "denoise":
        res, (tm, jm) = run_denoise_torch(a.nonlin, a.niters, a.seed)
    elif a.task == "sisr":
        res, (tm, jm) = run_sisr_torch(a.nonlin, a.niters, a.seed)
    else:
        res, (tm, jm) = run_ct_torch(a.nonlin, a.niters, a.seed, a.size,
                                     a.nmeas)
    print(json.dumps({k: v for k, v in res.items() if k != "mse_hist"}))
    out = {"torch": res}
    import torch
    torch.save(tm.state_dict(), ipath)  # the restored INIT (see runners)
    if a.jax:
        if a.task == "ct":
            jr = run_ct_jax(a.nonlin, a.niters, tm, jm, a.seed, a.size,
                            a.nmeas)
        else:
            jr = (run_denoise_jax if a.task == "denoise" else run_sisr_jax)(
                a.nonlin, a.niters, tm, jm, a.seed)
        print(json.dumps({k: v for k, v in jr.items() if k != "mse_hist"}))
        out["jax"] = jr
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
