"""Reconstruction inspection tools — rebuilds of the reference's one-off
analysis scripts:

- ``error_map``     abs-difference heat map (_error_img.py:14-27)
- ``spectrum``      FFT log-magnitude spectrum (_img_freq.py:9-46)
- ``noisy_preview`` noisy-image previews at given tau/snr
                    (_display_NoisyImg.py:6-18)
- ``layer_outputs`` per-layer activation-atom montages
                    (modules/utils.py:229-288 get_layer_outputs)
"""
from __future__ import annotations

import os

import numpy as np

from wire_tpu.signals.image import build_montage, normalize
from wire_tpu.signals.noise import measure_np


def error_map(gt, rec, out_path=None, vmax=0.1):
    err = np.abs(np.asarray(gt, np.float32) - np.asarray(rec, np.float32))
    if out_path:
        import matplotlib.pyplot as plt
        plt.imsave(out_path, np.clip(err, 0, 1), vmin=0.0, vmax=vmax)
    return err


def spectrum(image, out_path=None):
    im = np.asarray(image, np.float32)
    if im.ndim == 3:
        im = im.mean(-1)
    f = np.fft.fftshift(np.fft.fft2(im))
    mag = np.log1p(np.abs(f))
    if out_path:
        import matplotlib.pyplot as plt
        plt.imsave(out_path, normalize(mag, True), cmap="viridis")
    return mag


def noisy_preview(image, taus_snrs, out_dir, rng=None):
    """Generate noisy previews for (tau, snr) pairs
    (_display_NoisyImg.py semantics — provenance of data_noisy/*.png)."""
    import matplotlib.pyplot as plt
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for tau, snr in taus_snrs:
        noisy = measure_np(np.asarray(image, np.float32), snr, tau, rng=rng)
        p = os.path.join(out_dir, f"noisy_T{tau}_SNR{snr}.png")
        plt.imsave(p, np.clip(noisy, 0, 1))
        paths.append(p)
    return paths


def layer_outputs(model, params, coords, imsize, nfilters_vis=16,
                  get_imag=False):
    """Activation-atom montages per layer (utils.py:229-288): evaluate each
    layer's output over the image grid, sort filters by variance, normalize,
    frame, and montage.

    Works for the sequential families (wire/siren/gauss/relu/bspline_*):
    intermediate activations are captured by re-running the forward with
    jax's intermediate capture.
    """
    import jax.numpy as jnp
    H, W = imsize
    acts = _intermediate_activations(model, params, jnp.asarray(coords),
                                     get_imag)
    montages = []
    for a in acts:
        imgs = np.asarray(a).reshape(H, W, -1)
        if nfilters_vis != "all":
            imgs = imgs[..., :nfilters_vis]
        atoms = imgs
        amin = atoms.min((0, 1), keepdims=True)
        amax = atoms.max((0, 1), keepdims=True)
        signs = np.abs(amin) > np.abs(amax)
        atoms = (1 - 2 * signs) * atoms
        order = np.argsort(atoms.std((0, 1)))
        atoms = atoms[..., order]
        amin = atoms.min((0, 1), keepdims=True)
        amax = atoms.max((0, 1), keepdims=True)
        atoms = (atoms - amin) / np.maximum(1e-14, amax - amin)
        atoms[:, [0, -1], :] = 1
        atoms[[0, -1], :, :] = 1
        montages.append(build_montage(np.transpose(atoms, (2, 0, 1))))
    return montages


def _intermediate_activations(model, params, coords, get_imag):
    """Layer-by-layer forward for the plain sequential families."""
    from wire_tpu.nn import activations as act
    from wire_tpu.nn.layers import complex_linear, linear
    spec = model.spec
    outs = []
    if spec.nonlin == "wire":
        z = linear(params["first"], coords)
        xr, xi = act.complex_gabor_real_input(z, spec.first_omega0,
                                              spec.scale)
        outs.append(xi if get_imag else xr)
        for i in range(spec.hidden_layers):
            zr, zi = complex_linear(params[f"hidden_{i}"], xr, xi)
            xr, xi = act.complex_gabor(zr, zi, spec.hidden_omega0,
                                       spec.scale)
            outs.append(xi if get_imag else xr)
        return outs
    # real sequential families share the layout first/hidden_i/final
    fn = {
        "siren": lambda p, x: act.sine(linear(p, x), spec.hidden_omega0),
        "gauss": lambda p, x: act.gauss(linear(p, x), spec.scale),
        "relu": lambda p, x: act.relu(linear(p, x)),
        "bspline_form": lambda p, x: act.bspline_quadratic(
            linear(p, x) / spec.scale),
    }.get(spec.nonlin)
    if fn is None:
        raise NotImplementedError(
            f"layer_outputs: unsupported family {spec.nonlin}")
    x = fn(params["first"], coords)
    outs.append(x)
    for i in range(spec.hidden_layers):
        x = fn(params[f"hidden_{i}"], x)
        outs.append(x)
    return outs
