"""Video compressive sensing helpers — the rebuild of the reference's coded
video machinery (lin_inverse.py:42-94, Hitomi-style coded exposure):

- ``coding_masks``     per-pixel random frame-selection masks
- ``video_to_coded``   sum mask-selected frames into coded exposures
                       (differentiable jnp; usable as a forward operator)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def coding_masks(video_size, nframes, rng=None):
    """Binary masks assigning each pixel to one of ``nframes`` subframes,
    tiled to the full video length (lin_inverse.py:42-63)."""
    rng = np.random if rng is None else rng
    H, W, total = video_size
    X, Y = np.mgrid[:H, :W]
    indices = rng.randint(0, nframes, (H, W))
    sub = np.zeros((H, W, nframes), np.float32)
    sub[X, Y, indices] = 1
    masks = np.tile(sub, [1, 1, total // nframes + 1])
    return masks[..., :total]


def video_to_coded(video_thw, masks_thw, nframes):
    """Sum each nframes-chunk of mask-weighted frames into one coded frame
    (lin_inverse.py:65-94). video/masks: (T, H, W); returns (ncoded, H, W).
    Differentiable in the video."""
    video = jnp.asarray(video_thw)
    masks = jnp.asarray(masks_thw)
    T = video.shape[0]
    coded = []
    for idx in range(0, T, nframes):
        chunk = video[idx:idx + nframes] * masks[idx:idx + nframes]
        coded.append(jnp.sum(chunk, axis=0))
    return jnp.stack(coded)
