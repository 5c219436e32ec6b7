"""Differentiable Radon transform:

- ``method='rotate'``: the reference operator's semantics
  (lin_inverse.py:19-40): per-angle bilinear rotation (kornia/OpenCV
  convention, zero padding) then row sum.  On TPU (square images) this
  resolves to ``rotate_pallas`` — the rotate-project kernel
  (ops/pallas/rotsum.py), same line integrals with bf16 one-hot MXU
  contractions (~7e-4 rel-L2 from the f32 oracle, angles treated as
  constants in the backward); elsewhere to ``rotate_xla``, the strict-f32
  XLA gather oracle (precise but ~2.7 ms/angle on TPU).  Pass
  ``rotate_xla`` explicitly when asserting tight f32 parity.

- ``method='fourier'`` (default on TPU for >=24 angles): projection-slice
  theorem — one oversampled 2D FFT of the image, bilinear sampling of the
  spectrum along each angle's central slice, one small 1D iFFT per angle.
  O(P^2 log P) total vs the shear path's per-angle FFTs.

- ``method='shear'`` (default on TPU for few angles): FFT three-shear
  rotation.  Each
  rotation is decomposed into a 90-degree-multiple pre-rotation (exact
  transpose/flip) plus a residual in [-45, 45] degrees applied as three
  per-row/column fractional translations, each a Fourier phase multiply —
  no gathers at all, ~65x faster on TPU.  The image is zero-padded 2x so
  nothing wraps.  Interpolation is periodic-sinc rather than bilinear:
  for signals supported inside the inscribed circle (the standard CT
  assumption; the reference's chest phantom) the two agree to interpolation
  error; parity tests use 'rotate'.

Both are linear in the image, so gradients are exact by construction.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from wire_tpu.ops.resample import rotate


def radon(img, angles_degrees, *, method="auto", checkpoint=True):
    """img: (H, W) image; angles: (nangles,) degrees.
    Returns (nangles, W) sinogram = sum over rows of each rotated image.

    method='auto': rotate on CPU (the parity oracle); on TPU, 'fourier' for
    many-angle fans (its one-FFT cost amortizes; 2.6x faster fwd+bwd and
    8.7x forward-only vs 'shear' at 512^2 x 100 angles on v5e) and 'shear'
    for few angles."""
    if method == "auto":
        if jax.default_backend() == "tpu":
            method = "fourier" if np.shape(angles_degrees)[0] >= 24 else \
                "shear"
        else:
            method = "rotate"
    if method == "rotate":
        # reference-exact semantics; on TPU the Pallas rotate-project
        # kernel computes the same bilinear-rotate line integrals without
        # materializing rotated images (ops/pallas/rotsum.py — the XLA
        # gather path costs ~2.7 ms/angle there).  'rotate_xla' keeps the
        # strict f32 oracle on any backend.
        if jax.default_backend() == "tpu" and img.shape[0] == img.shape[1]:
            method = "rotate_pallas"
        else:
            method = "rotate_xla"
    if method in ("rotate_pallas", "rotate_interpret"):
        from wire_tpu.ops.pallas.rotsum import rotate_project
        return rotate_project(img, jnp.asarray(angles_degrees),
                              method == "rotate_interpret")
    if method == "rotate_xla":
        def project(angle):
            return jnp.sum(rotate(img, angle), axis=0)
        if checkpoint:
            project = jax.checkpoint(project)
        return jax.vmap(project)(jnp.asarray(angles_degrees))
    if method == "shear":
        return _radon_shear(img, jnp.asarray(angles_degrees))
    if method == "fourier":
        return _radon_fourier(img, jnp.asarray(angles_degrees))
    raise ValueError(method)


class RadonOp:
    """Hashable Radon forward-operator closure for the trainer/dist program
    caches: a bare ``lambda f: radon(f, thetas)`` is a fresh object per fit,
    so every fit would recompile (expensive on tunneled backends)."""

    def __init__(self, angles_degrees, *, method="auto"):
        self.angles = jnp.asarray(angles_degrees)
        self.method = method
        self._key = (tuple(np.asarray(angles_degrees).ravel().tolist()),
                     method)

    def __call__(self, field):
        return radon(field, self.angles, method=self.method)

    def __hash__(self):
        return hash(("RadonOp", self._key))

    def __eq__(self, other):
        return isinstance(other, RadonOp) and self._key == other._key


def radon_batch(imgs, angles_degrees, **kw):
    """(nimg, H, W) -> (nimg, nangles, W), matching lin_inverse.radon's
    batched output layout."""
    return jax.vmap(lambda im: radon(im, angles_degrees, **kw))(imgs)


# ---------------------------------------------------------------------------
# FFT three-shear path
# ---------------------------------------------------------------------------

def _fft_size(minimum):
    """Smallest 2^a*3^b size >= minimum (FFT-friendly)."""
    best = 1 << (int(minimum) - 1).bit_length()
    p3 = 1
    while p3 < best:
        p2 = 1
        while p2 * p3 < minimum:
            p2 *= 2
        best = min(best, p2 * p3)
        p3 *= 3
    return best


def _shear_x_from_rfft(F, ty, P):
    """Per-row fractional translate given the row rfft: out[y, x] =
    in[y, x - ty[y]]."""
    k = jnp.fft.rfftfreq(P).astype(ty.dtype)
    phase = jnp.exp(-2j * jnp.pi * k[None, :] * ty[:, None])
    return jnp.fft.irfft(F * phase, n=P, axis=1).astype(ty.dtype)


def _shear_x(im, ty):
    return _shear_x_from_rfft(jnp.fft.rfft(im, axis=1), ty, im.shape[1])


def _shear_y(im, tx):
    F = jnp.fft.rfft(im, axis=0)
    k = jnp.fft.rfftfreq(im.shape[0]).astype(im.dtype)
    phase = jnp.exp(-2j * jnp.pi * k[:, None] * tx[None, :])
    return jnp.fft.irfft(F * phase, n=im.shape[0], axis=0).astype(im.dtype)


# ---------------------------------------------------------------------------
# Fourier-slice path (central-slice theorem)
# ---------------------------------------------------------------------------

def _radon_fourier(img, angles_degrees, oversample=4, sampler="auto"):
    """Radon via the projection-slice theorem: ONE 2D FFT of the (padded)
    image, bilinear sampling of the spectrum along each angle's central
    slice, then a 1D inverse FFT per angle.  O(P^2 log P + nangles*P) vs the
    shear path's O(nangles * P^2 log P) — the fast choice when nangles is
    large.  Interpolation differs from rotate/shear (Fourier-domain bilinear
    with `oversample`x zero-padding); all paths agree on interior-supported
    content to interpolation error.  Linear in img, so gradients are exact.

    The sampling step runs as a Pallas kernel on TPU (sampler='pallas'):
    XLA's generic gather/scatter for the (A, K) slice points costs ~10/46 ms
    fwd/bwd at 512^2 x 100 angles on v5e, vs ~1 ms each for the blocked
    one-hot-matmul kernel (ops/pallas/line_sample.py).  sampler='xla' is the
    dense fallback and oracle; 'interpret' runs the kernel in interpret mode
    (CPU tests)."""
    from wire_tpu.ops.pallas import line_sample as LS

    H, W = img.shape
    S = max(H, W)
    P = _fft_size(oversample * S)
    py0 = (P - H) // 2
    px0 = (P - W) // 2
    pad = jnp.zeros((P, P), img.dtype)
    pad = pad.at[py0:py0 + H, px0:px0 + W].set(img)

    # full 2D DFT, fftshift-ed (so slice coordinates need no mod-P wrap);
    # phase-center it so the sampled function is smooth (centering at the
    # rotate() convention's (P-1)/2 pixel center)
    F = jnp.fft.fftshift(jnp.fft.fftn(pad))
    c = (P - 1) / 2.0
    f = ((jnp.arange(P) - P // 2) / P).astype(img.dtype)  # shifted freqs
    F = F * jnp.exp(2j * jnp.pi * (f[:, None] + f[None, :]) * c)

    # two periodic halo rows/cols on the high side (a slice sample can land
    # exactly on the Nyquist line: position P reads rows P, P+1 which alias
    # to shifted rows 0, 1), then pad to the kernel's plane size
    halo = LS.HALO_PAD if sampler != "xla" else 2
    Fh = jnp.pad(F, ((0, halo), (0, halo)), mode="wrap")
    if halo > 2:
        # only the first 2 halo lines are ever read; zero the rest so the
        # plane is well-defined (cheap, and keeps lane alignment at 128)
        mask = (jnp.arange(P + halo) < P + 2).astype(img.dtype)
        Fh = Fh * mask[:, None] * mask[None, :]

    # projection of the theta-rotated image onto x = slice of F along the
    # direction the x-axis maps FROM under the inverse rotation.
    # rotate() uses dst(y,x) = src(R_phi (y,x)) with screen-CCW phi;
    # sum over y of dst -> slice at (ky, kx) = kx * (sin, cos)(-theta).
    # In the shifted frame, grid position = k_idx * dir + P/2 (no wrap).
    theta = jnp.deg2rad(angles_degrees.astype(img.dtype))
    kx = jnp.fft.rfftfreq(P).astype(img.dtype)          # (K,)
    k_idx = kx * P                                      # 0 .. P/2
    gy = k_idx[None, :] * jnp.sin(theta)[:, None] + P // 2
    gx = k_idx[None, :] * jnp.cos(theta)[:, None] + P // 2

    if sampler == "auto":
        sampler = "pallas" if jax.default_backend() == "tpu" else "xla"
    if sampler == "xla":
        sre, sim = LS.sample_lines_xla(jnp.real(Fh), jnp.imag(Fh), gy, gx)
    else:
        sre, sim = LS.sample_lines(jnp.real(Fh), jnp.imag(Fh), gy, gx,
                                   sampler == "interpret")
    slice_hat = jax.lax.complex(sre, sim)

    # back to the spatial projection; undo the centering phase along x
    slice_hat = slice_hat * jnp.exp(-2j * jnp.pi * kx * c)[None, :]
    proj = jnp.fft.irfft(slice_hat, n=P, axis=1).astype(img.dtype)
    return proj[:, px0:px0 + W]


def _radon_shear(img, angles_degrees):
    H, W = img.shape
    S = max(H, W)
    # pad to a centered square with margin so shears never wrap (rotated
    # content stays within a sqrt(2)*S/2-radius disk; intermediate shear
    # states stay within ~0.78*S half-extent)
    P = _fft_size(int(np.ceil(1.6 * S)) + 2)
    py0 = (P - H) // 2
    px0 = (P - W) // 2
    pad = jnp.zeros((P, P), img.dtype)
    pad = pad.at[py0:py0 + H, px0:px0 + W].set(img)
    cy = (P - 1) / 2.0
    yy = jnp.arange(P, dtype=img.dtype) - cy
    xx = jnp.arange(P, dtype=img.dtype) - cy

    theta = jnp.deg2rad(angles_degrees.astype(img.dtype))
    # positive screen-CCW rotation of the image corresponds to the rotate()
    # convention; decompose theta = 90*k + phi with phi in [-45, 45]
    k = jnp.clip(jnp.round(theta / (jnp.pi / 2)).astype(jnp.int32), 0, 2)
    phi = theta - k.astype(img.dtype) * (jnp.pi / 2)

    # three 90-degree pre-rotations (exact); their row-ffts are shared by
    # every angle with the same k
    variants = jnp.stack([pad, jnp.rot90(pad, 1), jnp.rot90(pad, 2)])
    F1 = jnp.fft.rfft(variants, axis=2)

    def project(k_i, phi_i):
        # inverse-warp shears implementing dst(x,y)=src(R(phi)(x,y)):
        # R(phi) = Shx(a) Shy(b) Shx(a), a = tan(phi/2), b = -sin(phi)
        a = jnp.tan(phi_i / 2)
        b = -jnp.sin(phi_i)
        im1 = _shear_x_from_rfft(F1[k_i], a * yy, P)
        im2 = _shear_y(im1, b * xx)
        im3 = _shear_x(im2, a * yy)
        return jnp.sum(im3, axis=0)

    sino = jax.vmap(project)(k, phi)
    return sino[:, px0:px0 + W]
