"""Differentiable forward operators mapping an INR's output field to the
measurement domain of each task (SURVEY.md §3 call stacks):

- identity            denoise / representation (bspline_image_denoise.py:153)
- sinogram            CT: full-grid render -> Radon (bspline_ct.py:148-151)
- area_downsample     SISR: HR render -> AvgPool2d(scale) (wire_SISR.py:184-185)
- warped frames       multi-SR: render at per-frame warped HR coords then
                      box-downsample (wire_multi_sr.py:194-195)

Each operator is a pure function usable inside a jitted training step.
"""
from __future__ import annotations

import jax.numpy as jnp

from wire_tpu.operators.radon import radon
from wire_tpu.ops.resample import avg_pool2d


def identity(field, *_args):
    return field


def sinogram_op(field_hw, angles):
    """field (H, W) -> (nangles, W)."""
    return radon(field_hw, angles)


def sisr_op(field_hwc, scale):
    """(H, W, C) HR field -> (H/s, W/s, C) LR via exact box average."""
    nchw = jnp.transpose(field_hwc, (2, 0, 1))[None]
    lr = avg_pool2d(nchw, scale)
    return jnp.transpose(lr[0], (1, 2, 0))


class DownsampleOp:
    """Hashable box-downsample closure (the SISR forward operator,
    wire_SISR.py:184-185) — like RadonOp, a bare lambda would key the
    trainer/dist program caches by object identity and recompile every
    fit (expensive on tunneled backends)."""

    def __init__(self, scale):
        self.scale = int(scale)

    def __call__(self, field_hwc):
        return sisr_op(field_hwc, self.scale)

    def __hash__(self):
        return hash(("DownsampleOp", self.scale))

    def __eq__(self, other):
        return isinstance(other, DownsampleOp) and other.scale == self.scale


def multi_sr_op(frames_bhwc, scale):
    """(B, H, W, C) fields rendered at warped coords -> (B, H/s, W/s, C)."""
    nchw = jnp.transpose(frames_bhwc, (0, 3, 1, 2))
    lr = avg_pool2d(nchw, scale)
    return jnp.transpose(lr, (0, 2, 3, 1))
