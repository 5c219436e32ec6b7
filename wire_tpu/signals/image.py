"""Host-side image plumbing: normalization, IO, resizing, synthetic test
signals.

Resizing on the *preprocessing* path uses cv2 (a dependency, exactly as the
reference scripts do — INTER_AREA for downscaling, INTER_LINEAR for up,
e.g. bspline_image_denoise.py:65, utils.py:179-201); the *differentiable*
area-downsample lives in wire_tpu.operators.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is expected in the image
    cv2 = None


def normalize(x, fullnormalize=False):
    """Scale to [0, 1]: max-only by default, min-max if fullnormalize
    (utils.py:21-46)."""
    x = np.asarray(x)
    if x.sum() == 0:
        return x
    xmax = x.max()
    xmin = x.min() if fullnormalize else 0
    return (x - xmin) / (xmax - xmin)


def imread(path, normalize_full=True):
    import matplotlib.pyplot as plt
    im = plt.imread(path).astype(np.float32)
    if im.ndim == 3 and im.shape[-1] == 4:
        im = im[..., :3]
    return normalize(im, True) if normalize_full else im


def resize_area(im, fx, fy=None):
    """cv2 INTER_AREA resize (reference downscale path)."""
    fy = fx if fy is None else fy
    if cv2 is not None:
        return cv2.resize(im, None, fx=fx, fy=fy,
                          interpolation=cv2.INTER_AREA)
    return _area_resize_np(im, fx, fy)


def resize_linear(im, fx, fy=None):
    fy = fx if fy is None else fy
    if cv2 is not None:
        return cv2.resize(im, None, fx=fx, fy=fy,
                          interpolation=cv2.INTER_LINEAR)
    raise NotImplementedError("bilinear host resize needs cv2")


def _area_resize_np(im, fx, fy):
    """Integer-factor box-average fallback."""
    sy, sx = int(round(1 / fy)), int(round(1 / fx))
    H, W = im.shape[:2]
    H2, W2 = H // sy, W // sx
    im = im[:H2 * sy, :W2 * sx]
    if im.ndim == 2:
        return im.reshape(H2, sy, W2, sx).mean((1, 3))
    return im.reshape(H2, sy, W2, sx, -1).mean((1, 3))


def build_montage(images):
    """Grid montage of (nimg, H, W) stack, each tile min-max normalized
    (utils.py:131-156)."""
    nimg, H, W = images.shape
    nrows = int(np.ceil(np.sqrt(nimg)))
    ncols = int(np.ceil(nimg / nrows))
    montage = np.zeros((H * nrows, W * ncols), dtype=np.float32)
    cnt = 0
    for r in range(nrows):
        for c in range(ncols):
            if cnt == nimg:
                break
            montage[r * H:(r + 1) * H, c * W:(c + 1) * W] = normalize(
                images[cnt], True)
            cnt += 1
    return montage


def inpainting_mask(imsize, mask_type="random2d", mask_frac=0.5, rng=None):
    """utils.py:203-227 mask generator."""
    rng = np.random if rng is None else rng
    H, W = imsize
    if mask_type == "random2d":
        mask = rng.rand(H, W) < mask_frac
    elif mask_type == "random1d":
        mask_row = rng.rand(1, W) < mask_frac
        mask = np.ones((H, 1)).dot(mask_row)
    elif mask_type == "bayer":
        mask = np.zeros((H, W))
        mask[::2, ::2] = 1
    else:
        raise ValueError(mask_type)
    return mask.astype(np.float32)


# ---------------------------------------------------------------------------
# Synthetic test signals (the reference's inputs live on a private cluster
# path; these procedural stand-ins drive tests and benchmarks)
# ---------------------------------------------------------------------------

def synthetic_image(H=256, W=256, channels=3, seed=0):
    """A smooth + textured multi-frequency test image in [0, 1]."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    y, x = y / H, x / W
    chans = []
    for c in range(channels):
        img = 0.5 + 0.25 * np.sin(2 * np.pi * (3 + c) * x) * np.cos(
            2 * np.pi * (2 + c) * y)
        img += 0.15 * np.sin(2 * np.pi * (17 + 5 * c) * (x + y))
        img += 0.1 * np.cos(2 * np.pi * 31 * (x - 0.3 * y + 0.1 * c))
        blobs = np.zeros_like(img)
        for _ in range(6):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            s = rng.uniform(0.02, 0.12)
            blobs += rng.uniform(-0.3, 0.3) * np.exp(
                -((x - cx) ** 2 + (y - cy) ** 2) / (2 * s * s))
        img = img + blobs
        chans.append(img)
    im = np.stack(chans, axis=-1)
    return normalize(im.astype(np.float32), True)


def natural_image(H=512, W=512, channels=3, seed=0, beta=1.2):
    """Random image with natural-image (1/f^beta) amplitude spectrum and a
    few piecewise structures — a stand-in whose statistics are much closer
    to photographs than ``synthetic_image`` (the reference's tuned
    hyperparameters assume natural spectra)."""
    rng = np.random.default_rng(seed)
    fy = np.fft.fftfreq(H)[:, None]
    fx = np.fft.fftfreq(W)[None, :]
    radius = np.sqrt(fy * fy + fx * fx)
    amp = 1.0 / np.maximum(radius, 1.0 / max(H, W)) ** beta
    chans = []
    base_phase = np.exp(2j * np.pi * rng.random((H, W)))
    for c in range(channels):
        phase = base_phase * np.exp(0.35j * 2 * np.pi * rng.random((H, W)))
        spec = amp * phase
        img = np.real(np.fft.ifft2(spec))
        chans.append(img)
    im = np.stack(chans, axis=-1).astype(np.float32)
    # superpose a few sharp-edged regions (natural images have edges)
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    for _ in range(4):
        cx, cy = rng.uniform(0.2, 0.8, 2)
        r = rng.uniform(0.08, 0.25)
        m = (((x / W - cx) ** 2 + (y / H - cy) ** 2) < r * r)
        im[m] += rng.uniform(-0.25, 0.25, channels).astype(np.float32)
    return normalize(im, True)


def shepp_logan(N=256):
    """Shepp–Logan head phantom (standard analytic definition) for CT tests."""
    # (intensity, a, b, x0, y0, phi_degrees)
    ellipses = [
        (1.0, 0.69, 0.92, 0.0, 0.0, 0),
        (-0.8, 0.6624, 0.8740, 0.0, -0.0184, 0),
        (-0.2, 0.1100, 0.3100, 0.22, 0.0, -18),
        (-0.2, 0.1600, 0.4100, -0.22, 0.0, 18),
        (0.1, 0.2100, 0.2500, 0.0, 0.35, 0),
        (0.1, 0.0460, 0.0460, 0.0, 0.1, 0),
        (0.1, 0.0460, 0.0460, 0.0, -0.1, 0),
        (0.1, 0.0460, 0.0230, -0.08, -0.605, 0),
        (0.1, 0.0230, 0.0230, 0.0, -0.606, 0),
        (0.1, 0.0230, 0.0460, 0.06, -0.605, 0),
    ]
    y, x = np.mgrid[-1:1:N * 1j, -1:1:N * 1j].astype(np.float32)
    img = np.zeros((N, N), np.float32)
    for A, a, b, x0, y0, phi in ellipses:
        t = np.deg2rad(phi)
        xr = (x - x0) * np.cos(t) + (y - y0) * np.sin(t)
        yr = -(x - x0) * np.sin(t) + (y - y0) * np.cos(t)
        img += A * ((xr / a) ** 2 + (yr / b) ** 2 <= 1)
    return np.clip(img, 0, None)


def synthetic_volume(N=64, seed=0):
    """A blobby occupancy volume in {0,1} for 3D tests."""
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[-1:1:N * 1j, -1:1:N * 1j, -1:1:N * 1j].astype(
        np.float32)
    f = np.zeros((N, N, N), np.float32)
    for _ in range(5):
        cx, cy, cz = rng.uniform(-0.5, 0.5, 3)
        s = rng.uniform(0.15, 0.4)
        f += np.exp(-((x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2)
                    / (2 * s * s))
    return (f > 0.6).astype(np.float32)
