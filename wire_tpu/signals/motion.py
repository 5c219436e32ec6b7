"""Multi-frame super-resolution data pipeline: synthetic shifted/rotated
burst generation, Euclidean transforms, registration, and frame datasets.

Host-side counterpart of the reference's motion module (modules/motion.py):
- ``euclidean_matrix``     getEuclidianMatrix (motion.py:95-102)
- ``make_burst``           get_imstack semantics (motion.py:264-320): random
                           Euclidean warps of a HR image, per-frame warped
                           coordinate grids in [-1, 1]
- ``downsample_burst``     per-frame area downsample (wire_multi_sr.py:83-88)
- ``register_burst``       intensity-based ECC rigid registration replacing
                           pystackreg (motion.py:401-429) — cv2.findTransformECC
                           here, with the C++ fallback in wire_tpu.native
- ``FrameDataset``         ImageSRDataset equivalent (motion.py:22-76):
                           per-frame (coords, pixels, mask) arrays
"""
from __future__ import annotations

import dataclasses

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def euclidean_matrix(theta, shift):
    """2x3 rigid transform (motion.py:95-102)."""
    return np.array([[np.cos(theta), -np.sin(theta), shift[0]],
                     [np.sin(theta), np.cos(theta), shift[1]]])


def make_burst(im, shift_max=10, theta_max=np.pi / 12, nframes=5, rng=None,
               scale=1):
    """Generate ``nframes`` randomly shifted/rotated copies of ``im`` plus
    the per-frame warped coordinate grids (get_imstack, motion.py:264-320).

    Returns (imstack (n,Hl,Wl,3), Xstack (n,Hl,Wl), Ystack, mats (n,2,3)) with
    X/Y normalized to [-1, 1]; frame 0 is identity.
    """
    rng = np.random if rng is None else rng
    H, W, _ = im.shape
    shifts = rng.randint(-shift_max, shift_max, size=[nframes, 2])
    thetas = (2 * rng.rand(nframes) - 1) * theta_max
    shifts[0, :] = 0
    thetas[0] = 0

    Y, X = np.mgrid[:H, :W]
    ones = np.ones((H * W, 1))
    coords = np.hstack((X.reshape(-1, 1), Y.reshape(-1, 1), ones))

    Hl, Wl = int(H / scale), int(W / scale)
    imstack = np.zeros((nframes, Hl, Wl, 3), np.float32)
    Xstack = np.zeros((nframes, Hl, Wl), np.float32)
    Ystack = np.zeros_like(Xstack)
    mats = np.zeros((nframes, 2, 3))

    for idx in range(nframes):
        mat = euclidean_matrix(thetas[idx], shifts[idx])
        mats[idx] = mat
        cn = coords @ mat.T
        Xn = cn[:, 0].reshape(H, W).astype(np.float32)
        Yn = cn[:, 1].reshape(H, W).astype(np.float32)
        if scale != 1:
            Xn = cv2.resize(Xn, (Wl, Hl), interpolation=cv2.INTER_LINEAR)
            Yn = cv2.resize(Yn, (Wl, Hl), interpolation=cv2.INTER_LINEAR)
        imstack[idx] = _remap(im, Xn, Yn)
        Xstack[idx] = 2 * Xn / W - 1
        Ystack[idx] = 2 * Yn / H - 1
    return imstack, Xstack, Ystack, mats


def _remap(im, Xn, Yn):
    if cv2 is not None:
        return cv2.remap(im, Xn, Yn, cv2.INTER_LINEAR)
    # numpy bilinear fallback with zero border
    H, W = im.shape[:2]
    x0 = np.floor(Xn).astype(int)
    y0 = np.floor(Yn).astype(int)
    wx = (Xn - x0)[..., None]
    wy = (Yn - y0)[..., None]

    def tap(yy, xx):
        inb = ((xx >= 0) & (xx < W) & (yy >= 0) & (yy < H))[..., None]
        v = im[np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)]
        return np.where(inb, v, 0.0)

    top = tap(y0, x0) * (1 - wx) + tap(y0, x0 + 1) * wx
    bot = tap(y0 + 1, x0) * (1 - wx) + tap(y0 + 1, x0 + 1) * wx
    return (top * (1 - wy) + bot * wy).astype(im.dtype)


def downsample_burst(imstack_hr, scale):
    """Per-frame INTER_AREA downsample (wire_multi_sr.py:83-88)."""
    n, H, W, c = imstack_hr.shape
    out = np.zeros((n, H // scale, W // scale, c), np.float32)
    for i in range(n):
        if cv2 is not None:
            out[i] = cv2.resize(imstack_hr[i], None, fx=1 / scale,
                                fy=1 / scale, interpolation=cv2.INTER_AREA)
        else:
            out[i] = imstack_hr[i][:H // scale * scale, :W // scale * scale]\
                .reshape(H // scale, scale, W // scale, scale, c).mean((1, 3))
    return out


def _resize(im, size_wh, interp="linear"):
    """cv2.resize with a scipy.ndimage fallback (same pixel-center
    convention: src_x = (dst_x + 0.5) * src_w/dst_w - 0.5)."""
    Wd, Hd = size_wh
    if cv2 is not None:
        flag = {"linear": cv2.INTER_LINEAR, "cubic": cv2.INTER_CUBIC,
                "area": cv2.INTER_AREA}[interp]
        return cv2.resize(im, (Wd, Hd), interpolation=flag)
    from scipy import ndimage
    H, W = im.shape[:2]
    ys = (np.arange(Hd) + 0.5) * H / Hd - 0.5
    xs = (np.arange(Wd) + 0.5) * W / Wd - 0.5
    Yq, Xq = np.meshgrid(ys, xs, indexing="ij")
    order = 3 if interp == "cubic" else 1
    return ndimage.map_coordinates(im.astype(np.float32), [Yq, Xq],
                                   order=order, mode="nearest")


def _ecc_refine(ref, mov, warp, niters, eps, mask=None):
    """One ECC (or native Gauss-Newton) refinement pass of ``warp``
    (cv2 convention: mov(W p) ~= ref(p)).  Returns (warp, converged)."""
    if cv2 is not None:
        criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
                    niters, eps)
        try:
            _, w = cv2.findTransformECC(ref, mov, warp.copy(),
                                        cv2.MOTION_EUCLIDEAN, criteria,
                                        mask, 5)
            return w, True
        except cv2.error:
            return warp, False
    from wire_tpu.native import rigid_register
    try:
        w = rigid_register(ref, mov, max_iters=niters, eps=eps,
                           init_warp=warp)
        return np.asarray(w, np.float32), True
    except Exception:
        return warp, False


def _coarse_init(ref, mov, theta_max=0.4, ntheta=17):
    """Global rigid initialization at coarse scale: sweep trial rotations
    (about the image center), phase-correlate the de-rotated moving frame
    against the reference for the residual translation, and keep the
    candidate with the best correlation response.  Handles motions far
    outside ECC's identity-seeded convergence basin (e.g. the burst
    protocol's rotations about the ORIGIN, whose apparent translation is
    large).  Returns a (2, 3) warp W with mov(W p) ~= ref(p)."""
    H, W = ref.shape
    c = np.array([(W - 1) / 2.0, (H - 1) / 2.0])
    win = None
    if cv2 is not None:
        win = cv2.createHanningWindow((W, H), cv2.CV_32F)
    best = (-np.inf, np.eye(2, 3, dtype=np.float32))
    for theta in np.linspace(-theta_max, theta_max, ntheta):
        R = np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]], np.float32)
        Rc = np.hstack([R, ((np.eye(2) - R) @ c)[:, None]]).astype(
            np.float32)
        if cv2 is not None:
            mov_r = cv2.warpAffine(mov, Rc, (W, H),
                                   flags=cv2.INTER_LINEAR
                                   | cv2.WARP_INVERSE_MAP)
            # mov_r(p) = mov(R_c p); phaseCorrelate(ref, mov_r) returns d
            # with mov_r(p + d) ~= ref(p)
            (dx, dy), resp = cv2.phaseCorrelate(
                ref.astype(np.float32), mov_r.astype(np.float32), win)
            d = np.array([dx, dy])
        else:  # numpy fallback: nearest de-rotation + FFT phase corr
            Y, X = np.mgrid[:H, :W]
            pts = Rc @ np.stack([X.ravel(), Y.ravel(),
                                 np.ones(H * W)])
            mov_r = _remap(mov[..., None], pts[0].reshape(H, W)
                           .astype(np.float32),
                           pts[1].reshape(H, W).astype(np.float32))[..., 0]
            F = np.fft.fft2(ref) * np.conj(np.fft.fft2(mov_r))
            r = np.fft.ifft2(F / (np.abs(F) + 1e-9)).real
            iy, ix = np.unravel_index(np.argmax(r), r.shape)
            resp = r[iy, ix]
            d = -np.array([ix if ix <= W // 2 else ix - W,
                           iy if iy <= H // 2 else iy - H], np.float64)
        if resp > best[0]:
            # mov(R_c (p + d)) ~= ref(p)  =>  W = [R | R d + (I - R) c]
            t = R @ d + (np.eye(2) - R) @ c
            best = (resp, np.hstack([R, t[:, None]]).astype(np.float32))
    return best[1]


def pyramid_register(ref, mov, levels=None, min_size=48, niters=200,
                     eps=1e-7, mask=None):
    """Coarse-to-fine rigid registration (VERDICT r2 #1): estimate the
    Euclidean warp W with mov(W p) ~= ref(p) by ECC/Gauss-Newton over an
    image pyramid, seeding each level with the previous level's warp.

    Pyramid levels halve via pixel-center-aligned resize, so the warp
    conjugates between levels as t' = 2 t + (I - R) * 0.5 (the 0.5 is the
    half-pixel offset of the resize convention — dropping it costs ~0.5 px
    at full resolution).  The finest level runs with tight criteria for
    subpixel accuracy.  Returns (warp (2, 3) float32, ok).
    """
    H, W = ref.shape
    if levels is None:
        levels = 1
        while min(H, W) // (2 ** levels) >= min_size:
            levels += 1
    pyr_ref, pyr_mov = [ref.astype(np.float32)], [mov.astype(np.float32)]
    # validity mask of the MOVING frame (zero-border pixels from the burst
    # warp bias the alignment toward the border direction — measured
    # ~0.4 px translation bias at 512^2/4x without it); eroded so blurred
    # border taps never leak in
    if mask is None:
        mask = (np.abs(mov) > 1e-6).astype(np.float32)
    m = mask.astype(np.float32)
    if cv2 is not None:
        m = cv2.erode(m, np.ones((9, 9), np.uint8), iterations=1)
    pyr_mask = [m]
    for _ in range(levels - 1):
        h, w = pyr_ref[-1].shape
        pyr_ref.append(_resize(pyr_ref[-1], (w // 2, h // 2), "area"))
        pyr_mov.append(_resize(pyr_mov[-1], (w // 2, h // 2), "area"))
        pyr_mask.append(_resize(pyr_mask[-1], (w // 2, h // 2), "area"))

    warp = _coarse_init(pyr_ref[-1], pyr_mov[-1])
    ok_any = False
    for lvl in range(levels - 1, -1, -1):
        is_finest = lvl == 0
        mlvl = (pyr_mask[lvl] > 0.999).astype(np.uint8)
        warp, ok = _ecc_refine(pyr_ref[lvl], pyr_mov[lvl], warp,
                               niters if not is_finest else 4 * niters,
                               eps if not is_finest else eps * 1e-1,
                               mask=mlvl)
        ok_any = ok_any or ok
        if lvl > 0:
            # lift to the next-finer level: p_fine = 2 p_coarse + 0.5
            R = warp[:, :2]
            t = warp[:, 2]
            warp = warp.copy()
            warp[:, 2] = 2 * t + 0.5 * ((np.eye(2) - R) @ np.ones(2))
    return warp.astype(np.float32), ok_any


def register_burst(imstack, full_size):
    """Estimate rigid transforms of each frame against frame 0 by
    coarse-to-fine ECC intensity alignment (replaces pystackreg,
    motion.py:401-429 / register_stack_ecc motion.py:575-642) and derive
    warped HR coordinate grids in [-1, 1].

    Each LR frame is first upsampled to the HR grid (cubic), and the
    pyramid registration runs in HR coordinates — the estimated warp then
    needs no translation lifting (and no center-offset correction, which a
    naive xscale lift of an LR-estimated translation requires).

    The warp convention follows cv2/pystackreg: frame_i(W_i p) ~= frame_0(p),
    i.e. W_i ~= M_i^{-1} for burst motion frame_i(p) = frame_0(M_i p).  The
    coordinate grids therefore use M_i = W_i^{-1} — the reference does the
    same inversion inside mat2coords (motion.py:449-484); feeding W_i
    directly (as a pre-round-3 version did) doubles the motion instead of
    cancelling it and costs ~8 dB on the multi-SR protocol.

    imstack: (n, H, W) or (n, H, W, C) grayscale-able stack (LR frames);
    full_size: (H_hr, W_hr) of the target HR grid.
    Returns (Xstack, Ystack, ok_mask, mats) with mats = the W_i
    (pystackreg-convention, HR pixel units).
    """
    n = imstack.shape[0]
    Hf, Wf = full_size
    if imstack.ndim == 4:
        gray = imstack.mean(-1).astype(np.float32)
    else:
        gray = imstack.astype(np.float32)
    up = [_resize(g, (Wf, Hf), "cubic") for g in gray]
    # validity masks from the LR frames (exact zeros only there — cubic
    # upsampling smears the zero border into small nonzeros): LR pixels on
    # the border band are partial averages, so erode at LR before lifting
    upmask = []
    for g in gray:
        mlr = (np.abs(g) > 1e-6).astype(np.float32)
        if cv2 is not None:
            mlr = cv2.erode(mlr, np.ones((3, 3), np.uint8), iterations=2)
        upmask.append((_resize(mlr, (Wf, Hf), "linear") > 0.999)
                      .astype(np.float32))
    Y, X = np.mgrid[:Hf, :Wf]
    ones = np.ones((Hf * Wf, 1))
    coords = np.hstack((X.reshape(-1, 1), Y.reshape(-1, 1), ones))
    Xstack = np.zeros((n, Hf, Wf), np.float32)
    Ystack = np.zeros_like(Xstack)
    ok = np.ones(n, np.float32)
    mats = np.zeros((n, 2, 3), np.float32)
    last = np.array([[0.0, 0.0, 1.0]])
    for i in range(n):
        warp = np.eye(2, 3, dtype=np.float32)
        if i > 0:
            warp, converged = pyramid_register(up[0], up[i], mask=upmask[i])
            ok[i] = float(converged)
        mats[i] = warp
        minv = np.linalg.inv(np.vstack([warp, last]))[:2]
        cn = coords @ minv.T
        Xstack[i] = cn[:, 0].reshape(Hf, Wf)
        Ystack[i] = cn[:, 1].reshape(Hf, Wf)
    Xstack = 2 * Xstack / Wf - 1
    Ystack = 2 * Ystack / Hf - 1
    return Xstack, Ystack, ok, mats


def get_sr_data(im, scale, nimg=10, simulation=True, get_gt=False,
                shift_max=10, theta_max=np.pi / 12, rng=None):
    """Wrapper producing an SR burst + registration matrices from either a
    single HR image (simulation) or a pre-captured stack
    (motion.get_SR_data, motion.py:200-262).

    Returns (imstack (n,Hl,Wl[,C]), mats (n,2,3))."""
    rng = np.random if rng is None else rng
    if simulation:
        if im.ndim == 2:
            im = im[..., None].repeat(3, -1)
        imstack_hr, _, _, mats = make_burst(im, shift_max, theta_max, nimg,
                                            rng=rng)
        imstack = downsample_burst(imstack_hr, scale) if scale > 1 \
            else imstack_hr
        if get_gt:
            ecc = invert_regstack(mats)
        else:
            gray = imstack.mean(-1)
            _, _, _, ecc = register_burst(gray, gray.shape[1:3])
        return imstack, ecc
    imstack = np.copy(im[:nimg], order="C")
    gray = imstack.mean(-1) if imstack.ndim == 4 else imstack
    _, _, _, ecc = register_burst(gray, gray.shape[1:3])
    return imstack, ecc


def shifted_downsampled_burst(im, scale, shift_max=10,
                              theta_max=np.pi / 12, nshifts=5,
                              perturb_coords=False, rng=None):
    """Shift-then-rotate-about-image-center burst with area-downsampled
    coordinate grids (get_downsampled_shifted_images, motion.py:323-398);
    optional coordinate perturbation for registration-error studies.

    im: (H, W) grayscale. Returns (imstack (n,Hl,Wl), Xstack, Ystack in
    [-1,1])."""
    rng = np.random if rng is None else rng
    H, W = im.shape
    shifts = rng.randint(-shift_max, shift_max, size=[nshifts, 2])
    thetas = (2 * rng.rand(nshifts) - 1) * theta_max
    shifts[0, :] = 0
    thetas[0] = 0
    Y, X = np.mgrid[:H, :W]
    Hl, Wl = int(H / scale), int(W / scale)
    imstack = np.zeros((nshifts, Hl, Wl), np.float32)
    Xstack = np.zeros_like(imstack)
    Ystack = np.zeros_like(imstack)
    for i in range(nshifts):
        Xs = X - shifts[i, 1]
        Ys = Y - shifts[i, 0]
        c, s = np.cos(thetas[i]), np.sin(thetas[i])
        Xr = (Xs - W / 2) * c - (Ys - H / 2) * s + W / 2
        Yr = (Xs - W / 2) * s + (Ys - H / 2) * c + H / 2
        Xn = cv2.resize(Xr.astype(np.float32), (Wl, Hl),
                        interpolation=cv2.INTER_AREA)
        Yn = cv2.resize(Yr.astype(np.float32), (Wl, Hl),
                        interpolation=cv2.INTER_AREA)
        imstack[i] = cv2.remap(im.astype(np.float32), Xn, Yn,
                               cv2.INTER_AREA)
        if perturb_coords:
            Xn = Xn + rng.randn(Hl, Wl).astype(np.float32)
            Yn = Yn + rng.randn(Hl, Wl).astype(np.float32)
        Xstack[i] = 2 * Xn / W - 1
        Ystack[i] = 2 * Yn / H - 1
    return imstack, Xstack, Ystack


# ---------------------------------------------------------------------------
# Affine / coordinate transform toolbox (motion.py:432-572)
# ---------------------------------------------------------------------------

def xy_mgrid(H, W):
    """(H*W, 2) meshgrid of normalized (x, y) in [-1, 1]
    (motion.py:79-92)."""
    Y, X = np.mgrid[:H, :W]
    X = (2 * X / (W - 1) - 1).astype(np.float32)
    Y = (2 * Y / (H - 1) - 1).astype(np.float32)
    return np.stack([X, Y], axis=-1).reshape(-1, 2)


def invert_regstack(regstack):
    """Invert a stack of (2, 3) affine matrices (motion.py:432-447)."""
    out = np.zeros_like(regstack)
    last = np.array([[0.0, 0.0, 1.0]])
    for i in range(regstack.shape[0]):
        out[i] = np.linalg.inv(np.vstack([regstack[i], last]))[:2]
    return out


def mat2coords(reg_stack, full_res, low_res):
    """Warped [-1,1] coordinate grids from inverse affine matrices
    (motion.py:449-484)."""
    nimg = reg_stack.shape[0]
    H, W = full_res
    Hl, Wl = low_res
    Y, X = np.mgrid[:H, :W]
    coords = np.hstack((X.reshape(-1, 1), Y.reshape(-1, 1),
                        np.ones((H * W, 1))))
    Xs = np.zeros((nimg, Hl, Wl), np.float32)
    Ys = np.zeros_like(Xs)
    last = np.array([[0.0, 0.0, 1.0]])
    for i in range(nimg):
        mat = np.linalg.inv(np.vstack([reg_stack[i], last]))
        cn = coords @ mat.T
        Xn = (2 * cn[:, 0].reshape(H, W) / W - 1).astype(np.float32)
        Yn = (2 * cn[:, 1].reshape(H, W) / H - 1).astype(np.float32)
        if (Hl, Wl) != (H, W):
            Xn = cv2.resize(Xn, (Wl, Hl), interpolation=cv2.INTER_AREA)
            Yn = cv2.resize(Yn, (Wl, Hl), interpolation=cv2.INTER_AREA)
        Xs[i], Ys[i] = Xn, Yn
    return Xs, Ys


def param2theta(params, w, h):
    """Pixel-space affine -> normalized theta for grid-generation
    (motion.py:486-521; the torch affine_grid convention)."""
    last = np.zeros((1, 3), np.float32)
    last[0, 2] = 1
    theta = np.zeros_like(params)
    for i in range(params.shape[0]):
        m = np.linalg.inv(np.vstack([params[i], last]))
        theta[i, 0, 0] = m[0, 0]
        theta[i, 0, 1] = m[0, 1] * h / w
        theta[i, 0, 2] = m[0, 2] * 2 / w + theta[i, 0, 0] + theta[i, 0, 1] - 1
        theta[i, 1, 0] = m[1, 0] * w / h
        theta[i, 1, 1] = m[1, 1]
        theta[i, 1, 2] = m[1, 2] * 2 / h + theta[i, 1, 0] + theta[i, 1, 1] - 1
    return theta


def affine2rigid(mats):
    """(angles, translations) from affine matrices (motion.py:523-542)."""
    angles = np.arccos(np.clip(mats[:, 0, 0], -1, 1))
    translations = mats[:, :, 2]
    return angles, translations


def get_transformed_coords(theta, imsize):
    """Normalized sampling grids for a batch of theta matrices — the
    F.affine_grid equivalent (motion.py:544-552), align_corners=False
    convention: grid(x,y) over pixel centers."""
    B = theta.shape[0]
    H, W = imsize
    # pixel-center normalized base grid (align_corners=False)
    xs = (2 * (np.arange(W) + 0.5) / W - 1).astype(np.float32)
    ys = (2 * (np.arange(H) + 0.5) / H - 1).astype(np.float32)
    X, Y = np.meshgrid(xs, ys)
    base = np.stack([X, Y, np.ones_like(X)], axis=-1).reshape(-1, 3)
    out = np.zeros((B, H * W, 2), np.float32)
    for i in range(B):
        out[i] = base @ theta[i].T
    return out


def interp_lr(imref, coords, downsample_scale):
    """Differentiable: sample an upsampled LR reference at transformed HR
    coordinates then box-downsample (motion.py:554-572) — jnp grid-sample
    instead of torch F.grid_sample."""
    import jax
    import jax.numpy as jnp
    from wire_tpu.ops.resample import area_downsample_hwc, grid_sample
    B = coords.shape[0]
    Hh, Wh = imref.shape[0], imref.shape[1]
    cf = jnp.asarray(coords).reshape(B, Hh, Wh, 2)
    imj = jnp.asarray(imref)
    hrs = jax.vmap(lambda c: grid_sample(imj, c, align_corners=False))(cf)
    hrs = hrs.reshape(B, Hh, Wh, -1)
    return jax.vmap(lambda h: area_downsample_hwc(h, downsample_scale))(hrs)


def optical_flow(frame1, frame2):
    """Dense Farnebäck optical flow + flow-warped frame (fb_flow,
    motion.py:105-128)."""
    H, W = frame1.shape
    Y, X = np.mgrid[:H, :W]
    f1, f2 = frame1, frame2
    if f1.dtype != np.uint8:
        # Farnebäck needs 8-bit input; scale floats to [0, 255]
        scale = max(f1.max(), f2.max(), 1e-8)
        f1 = np.clip(f1 / scale * 255, 0, 255).astype(np.uint8)
        f2 = np.clip(f2 / scale * 255, 0, 255).astype(np.uint8)
    flow = cv2.calcOpticalFlowFarneback(f1, f2, None, 0.5, 3, 15, 3,
                                        5, 1.2, 0)
    warped = cv2.remap(frame2.astype(np.float32),
                       (X + flow[..., 0]).astype(np.float32),
                       (Y + flow[..., 1]).astype(np.float32),
                       cv2.INTER_LINEAR)
    return flow, warped


def ecc_flow(im1, im2, motion="homography", niters=1000, eps=-1):
    """Single-pair ECC intensity alignment (ecc_flow, motion.py:131-197):
    registers im2 to im1 and returns (warp_matrix, im2_aligned, flow), where
    flow is the [-1, 1]-normalized coordinate displacement field mapping im2
    pixels to im1's frame (flow[..., 0] = dx * 2/W, flow[..., 1] = dy * 2/H
    — the reference's normalization, motion.py:194-195)."""
    if cv2 is None:
        raise RuntimeError("ecc_flow needs cv2")
    modes = {"translation": cv2.MOTION_TRANSLATION,
             "euclidean": cv2.MOTION_EUCLIDEAN,
             "affine": cv2.MOTION_AFFINE,
             "homography": cv2.MOTION_HOMOGRAPHY}
    mode = modes[motion]
    H, W = im1.shape[:2]
    warp = (np.eye(3, dtype=np.float32) if mode == cv2.MOTION_HOMOGRAPHY
            else np.eye(2, 3, dtype=np.float32))
    criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, niters, eps)
    _, warp = cv2.findTransformECC(im1.astype(np.float32),
                                   im2.astype(np.float32), warp, mode,
                                   criteria=criteria, inputMask=None,
                                   gaussFiltSize=5)
    flags = cv2.INTER_LINEAR + cv2.WARP_INVERSE_MAP
    if mode == cv2.MOTION_HOMOGRAPHY:
        aligned = cv2.warpPerspective(im2, warp, (W, H), flags=flags)
    else:
        aligned = cv2.warpAffine(im2, warp, (W, H), flags=flags)
    Y, X = np.mgrid[:H, :W]
    coords = np.stack([X.ravel(), Y.ravel(), np.ones(H * W)], axis=0)
    cn = warp @ coords
    if mode == cv2.MOTION_HOMOGRAPHY:
        cn = cn[:2] / cn[2]
    flow = np.zeros((H, W, 2), np.float32)
    flow[..., 0] = (cn[0] - coords[0]).reshape(H, W) * (2 / W)
    flow[..., 1] = (cn[1] - coords[1]).reshape(H, W) * (2 / H)
    return warp, aligned, flow


def flow2rgb(flow):
    """HSV flow visualization (motion.py:685-699)."""
    H, W, _ = flow.shape
    hsv = np.zeros((H, W, 3), dtype=np.uint8)
    hsv[..., 1] = 255
    mag, ang = cv2.cartToPolar(flow[..., 0], flow[..., 1])
    hsv[..., 0] = ang * 180 / np.pi / 2
    hsv[..., 2] = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def prune_stack(imstack, ecc_mats, full_res, thres=1.0):
    """Reject badly registered frames by warped-difference error
    (motion.py:645-682), using the jnp warp instead of kornia."""
    import jax.numpy as jnp
    from wire_tpu.ops.resample import bilinear_sample
    nimg, Hl, Wl = imstack.shape[:3]
    H, W = full_res
    imref = cv2.resize(imstack[0], (W, H), interpolation=cv2.INTER_AREA)
    Y, X = np.mgrid[:Hl, :Wl]
    diffs = []
    for i in range(nimg):
        m = ecc_mats[i]
        xs = m[0, 0] * X + m[0, 1] * Y + m[0, 2]
        ys = m[1, 0] * X + m[1, 1] * Y + m[1, 2]
        warped = np.asarray(bilinear_sample(jnp.asarray(imref),
                                            jnp.asarray(xs),
                                            jnp.asarray(ys)))
        diffs.append(np.abs(warped - imstack[i]))
    imdiff = np.stack(diffs)
    denom = imstack + 1e-2 * imstack.max()
    diff_array = (imdiff / denom).mean((-1, -2))
    mask = diff_array < thres
    return (np.copy(imstack[mask]), np.copy(ecc_mats[mask]), mask, imdiff)


@dataclasses.dataclass
class FrameDataset:
    """Per-frame (coords, pixels, mask) arrays (ImageSRDataset semantics,
    motion.py:22-76) as dense jnp-able ndarrays:

    coords: (n, H*W, 2) warped HR grids; pixels: (n, Hl*Wl, C) LR frames;
    masks: (n, Hl*Wl, C) validity masks.
    """
    coords: np.ndarray
    pixels: np.ndarray
    masks: np.ndarray

    @classmethod
    def build(cls, imstack_lr, Xstack, Ystack, masks=None):
        n, Hl, Wl, c = imstack_lr.shape
        coords = np.stack([Xstack, Ystack], axis=-1).reshape(n, -1, 2)
        pixels = imstack_lr.reshape(n, -1, c)
        if masks is None:
            masks = np.ones_like(pixels)
        else:
            masks = masks.reshape(n, -1, c)
        return cls(coords.astype(np.float32), pixels.astype(np.float32),
                   masks.astype(np.float32))
