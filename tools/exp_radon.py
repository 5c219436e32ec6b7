"""Radon fourier-path timing breakdown on the real chip.

Times forward, fwd+bwd, and the isolated pieces (fft2, gather, scatter
adjoint, per-angle irfft) at the CT headline shape (512^2 x 100 angles) so
the backward optimization work targets the real bottleneck.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import importlib
R = importlib.import_module("wire_tpu.operators.radon")


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force sync via transfer
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    H = W = 512
    A = 100
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(H, W).astype(np.float32))
    angles = jnp.asarray(np.linspace(0, 180, A, endpoint=False,
                                     dtype=np.float32))

    fwd = jax.jit(lambda im: R._radon_fourier(im, angles))
    print("fourier fwd:        %.2f ms" % (timeit(fwd, img) * 1e3))

    def loss(im):
        return jnp.sum(R._radon_fourier(im, angles) ** 2)
    g = jax.jit(jax.grad(loss))
    print("fourier fwd+bwd:    %.2f ms" % (timeit(g, img) * 1e3))

    # pieces ---------------------------------------------------------------
    S = max(H, W)
    P = R._fft_size(4 * S)
    K = P // 2 + 1
    pad = jnp.zeros((P, P), jnp.float32).at[:H, :W].set(img)
    fft2 = jax.jit(lambda x: jnp.sum(jnp.abs(jnp.fft.fftn(x))))
    print("fft2 %dx%d:       %.2f ms" % (P, P, timeit(fft2, pad) * 1e3))
    F = jax.jit(lambda x: jnp.fft.fftn(x))(pad)  # stays on device
    ifft2 = jax.jit(lambda x: jnp.sum(jnp.abs(jnp.fft.ifftn(x))))
    print("ifft2 %dx%d:      %.2f ms" % (P, P, timeit(ifft2, F) * 1e3))

    theta = jnp.deg2rad(angles)
    kx = jnp.fft.rfftfreq(P).astype(np.float32)
    gy = (kx[None, :] * jnp.sin(theta)[:, None] * P) % P
    gx = (kx[None, :] * jnp.cos(theta)[:, None] * P) % P
    y0 = jnp.floor(gy).astype(jnp.int32) % P
    x0 = jnp.floor(gx).astype(jnp.int32) % P

    def gather4(Fm):
        y1 = (y0 + 1) % P
        x1 = (x0 + 1) % P
        return jnp.sum(jnp.abs(
            Fm[y0, x0] + Fm[y0, x1] + Fm[y1, x0] + Fm[y1, x1]))
    gath = jax.jit(gather4)
    print("4x gather (A,K):    %.2f ms" % (timeit(gath, F) * 1e3))

    def scat(vr):
        v = vr.astype(jnp.complex64)
        Z = jnp.zeros((P, P), v.dtype)
        y1 = (y0 + 1) % P
        x1 = (x0 + 1) % P
        Z = Z.at[y0, x0].add(v)
        Z = Z.at[y0, x1].add(v)
        Z = Z.at[y1, x0].add(v)
        Z = Z.at[y1, x1].add(v)
        return jnp.sum(jnp.abs(Z))
    v = jnp.ones((A, K), jnp.float32)
    sc = jax.jit(scat)
    print("4x scatter (A,K):   %.2f ms" % (timeit(sc, v) * 1e3))

    irfft_a = jax.jit(
        lambda s: jnp.sum(jnp.abs(jnp.fft.irfft(
            s.astype(jnp.complex64), n=P, axis=1))))
    s = jnp.ones((A, K), jnp.float32)
    print("per-angle irfft:    %.2f ms" % (timeit(irfft_a, s) * 1e3))

    # accuracy vs rotate oracle on interior-supported content
    yy, xx = np.mgrid[0:H, 0:W]
    r = np.hypot(yy - (H - 1) / 2, xx - (W - 1) / 2)
    disk = jnp.asarray((np.cos(0.05 * r) * (r < 0.42 * H)).astype(np.float32))
    sino_f = np.asarray(fwd(disk))
    rot = jax.jit(lambda im: R.radon(im, angles, method="rotate",
                                     checkpoint=False))
    sino_r = np.asarray(rot(disk))
    rel = np.linalg.norm(sino_f - sino_r) / np.linalg.norm(sino_r)
    print("fourier-vs-rotate rel-L2 (interior disk): %.4f" % rel)


if __name__ == "__main__":
    main()


def pallas_timing():
    import jax
    import jax.numpy as jnp
    H = W = 512
    A = 100
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(H, W).astype(np.float32))
    angles = jnp.asarray(np.linspace(0, 180, A, endpoint=False,
                                     dtype=np.float32))
    for sampler in ("xla", "pallas"):
        fwd = jax.jit(functools.partial(
            lambda im, s: jnp.sum(R._radon_fourier(im, angles, sampler=s)),
            s=sampler))
        print("fourier[%s] fwd:      %.2f ms"
              % (sampler, timeit(fwd, img) * 1e3))

        def loss(im, s=sampler):
            return jnp.sum(R._radon_fourier(im, angles, sampler=s) ** 2)
        g = jax.jit(jax.grad(loss))
        print("fourier[%s] fwd+bwd:  %.2f ms"
              % (sampler, timeit(g, img) * 1e3))
    # accuracy pallas vs xla on TPU (bf16 matmul noise)
    yy, xx = np.mgrid[0:H, 0:W]
    r = np.hypot(yy - (H - 1) / 2, xx - (W - 1) / 2)
    disk = jnp.asarray((np.cos(0.05 * r) * (r < 0.42 * H)).astype(np.float32))
    sp = np.asarray(jax.jit(lambda im: R._radon_fourier(
        im, angles, sampler="pallas"))(disk))
    sx = np.asarray(jax.jit(lambda im: R._radon_fourier(
        im, angles, sampler="xla"))(disk))
    print("pallas-vs-xla rel-L2 on TPU: %.3g"
          % (np.linalg.norm(sp - sx) / np.linalg.norm(sx)))
