"""Model factory — the rebuild of ``modules/models.py:get_INR``.

Unlike the reference factory (models.py:62-75), which binds 14 positional args
and TypeErrors on half its registry (SURVEY.md §2.6), every family here is
registered with its correct signature; ``posenc`` is a first-class name
(the reference scripts remap it to relu+pos_encode by hand, e.g.
wire_image_denoise.py:95-101).
"""
from __future__ import annotations

import math
import os
from typing import Callable, Dict, Tuple

from wire_tpu.nn import models as M
from wire_tpu.nn.models import INR, INRSpec

# nonlin name -> (init_fn, apply_fn)
MODEL_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {
    "wire": (M.wire_init, M.wire_apply),
    "realgabor": (M.realgabor_init, M.realgabor_apply),
    "wire2d": (M.wire2d_init, M.wire2d_apply),
    "siren": (M.siren_init, M.siren_apply),
    "gauss": (M._plain_mlp_init, M.gauss_apply),
    "relu": (M.relu_init, M.relu_apply),
    "posenc": (M.relu_init, M.relu_apply),
    "mfn": (M.mfn_init, M.mfn_apply),
    "bspline_form": (M.bspline_plain_init, M.bspline_form_apply),
    "bspline_cubic": (M.bspline_plain_init, M.bspline_cubic_apply),
    "bspline_srelu": (M.bspline_plain_init, M.bspline_srelu_apply),
    "bspline_sig": (M.bspline_plain_init, M.bspline_sig_apply),
    "bspline_knots": (M.bspline_plain_init, M.bspline_knots_apply),
    "bspline_mscale_1": (M.mscale1_init, M.mscale1_apply),
    "bspline_mscale_1_new": (M.mscale_repin_init, M.mscale_repin_apply),
    "bspline_mscale_repIN": (M.mscale_repin_init, M.mscale_repin_apply),
    "bspline_mscale_2": (M.mscale2_init, M.mscale2_apply),
    "bspline_mscale_HL": (M.mscale_hl_init, M.mscale_hl_apply),
    "bspline_mscale_hier": (M.mscale_hier_init, M.mscale_hier_apply),
}

# Families with a one-pass fused train-step kernel (fwd + MSE loss-grad +
# bwd in a single Pallas call — see ops/pallas/wire_step.py).  Everything
# else trains through autodiff of its apply fn.
STEP_REGISTRY: Dict[str, Callable] = {
    "wire": M.wire_step,
    "wire2d": M.wire2d_step,
    "mfn": M.mfn_step,
    "siren": M.siren_step,
    "gauss": M.gauss_step,
    "relu": M.relu_step,
    "posenc": M.relu_step,
    "bspline_form": M.bspline_form_step,
    "bspline_cubic": M.bspline_cubic_step,
    "bspline_srelu": M.bspline_srelu_step,
    "bspline_knots": M.bspline_knots_step,
    "bspline_mscale_1": M.mscale1_step,
    "bspline_mscale_1_new": M.mscale_repin_step,
    "bspline_mscale_repIN": M.mscale_repin_step,
    "bspline_mscale_HL": M.mscale_hl_step,
    # mscale_2: autodiff over the ONE-invocation scale-stacked fused apply
    # (fwd kernel + XLA combiner + bwd kernel); mscale_hier: full one-pass
    # step over the canonicalized single chain (models._canon_mscale_hier).
    "bspline_mscale_2": M.mscale2_step,
    "bspline_mscale_hier": M.mscale_hier_step,
}

# Default (first_omega0, hidden_omega0, scale) per family, matching each
# reference module's __init__ defaults.
_FAMILY_DEFAULTS = {
    "wire": dict(first_omega0=30.0, hidden_omega0=30.0, scale=10.0),
    # RealGaborLayer defaults omega0=10, sigma0=10 (wire.py:25-26)
    "realgabor": dict(first_omega0=10.0, hidden_omega0=10.0, scale=10.0),
    "wire2d": dict(first_omega0=10.0, hidden_omega0=10.0, scale=10.0),
    "siren": dict(first_omega0=30.0, hidden_omega0=30.0, scale=10.0),
    "gauss": dict(scale=10.0),
    "relu": dict(),
    "posenc": dict(),
    "mfn": dict(),
}


# ---------------------------------------------------------------------------
# TPU lane-efficiency guidance (VERDICT r3 #6).  The MXU processes GEMMs in
# 128-lane tiles: a hidden width that is not a multiple of 128 pads to the
# next multiple and the padded MACs are pure waste.  The reference configs
# are CUDA-arbitrary (wire2d.py:45-67 etc.); a TPU-first framework should
# steer users to MXU-shaped widths.
# ---------------------------------------------------------------------------

_LANE = 128

# family -> effective per-GEMM hidden width as a function of hidden_features
_HIDDEN_RULE = {
    # complex params count double; the reference halves by sqrt(2)
    # (wire.py:119 -> models._wire_hidden)
    "wire": lambda hf: int(hf / math.sqrt(2)),
    # wire2d halves by 2 (wire2d.py:92 -> models.wire2d_init)
    "wire2d": lambda hf: int(hf / 2),
}

# Lane-native named presets with their measured numbers (PERF.md):
#  - wire hf=363 -> h=256: ~60% useful-FLOP bf16 MXU peak vs 46.5% at the
#    reference hf=300 (h=212 pads to 256 lanes), +2.8% step time for 45%
#    more real parameters (tools/exp_width256.py).
#  - wire2d hf=256 -> h=128: 1.76 ms/step vs 3.84 ms at the reference
#    hf=300 (h=150 pads to 256 lanes — 66% of hidden MACs are padding);
#    fits the full 2000-epoch denoise protocol at the flagship WIRE's
#    quality in 3.0 s (tools/exp_tilesweep_pipe.py, PERF.md r3).
LANE_NATIVE = {
    "wire": dict(hidden_features=363),
    "wire2d": dict(hidden_features=256),
}


def hidden_gemm_width(nonlin: str, hidden_features: int) -> int:
    """Effective per-GEMM hidden width (MXU lanes actually used)."""
    return _HIDDEN_RULE.get(nonlin, lambda hf: hf)(hidden_features)


def lane_waste(nonlin: str, hidden_features: int) -> float:
    """Fraction of hidden-layer MACs that are lane padding: the h-wide GEMM
    runs on ceil(h/128)*128 lanes, wasting 1 - (h/pad)^2 of the MXU work."""
    h = hidden_gemm_width(nonlin, hidden_features)
    pad = -(-h // _LANE) * _LANE
    return 1.0 - (h / pad) ** 2


def lane_native_hidden(nonlin: str, hidden_features: int) -> int:
    """Smallest hidden_features >= the given one whose effective GEMM width
    is lane-exact (a multiple of 128).  E.g. wire 300 -> 363 (h=256),
    wire2d 300 -> 512 (h=256), siren 300 -> 384."""
    rule = _HIDDEN_RULE.get(nonlin, lambda hf: hf)
    h = rule(hidden_features)
    target = -(-h // _LANE) * _LANE
    hf = hidden_features
    while rule(hf) < target:
        hf += 1
    return hf


_WARNED_LANE: set = set()


def _maybe_warn_lane(nonlin: str, hidden_features: int):
    if os.environ.get("WIRE_TPU_NO_LANE_WARN"):
        return
    h = hidden_gemm_width(nonlin, hidden_features)
    if h <= _LANE:          # tiny/test models: the first tile is the floor
        return
    waste = lane_waste(nonlin, hidden_features)
    if waste <= 0.30 or (nonlin, hidden_features) in _WARNED_LANE:
        return
    _WARNED_LANE.add((nonlin, hidden_features))
    from wire_tpu.train.artifacts import log
    up = lane_native_hidden(nonlin, hidden_features)
    log(f"note: {nonlin} hidden_features={hidden_features} uses "
        f"{h} of {-(-h // _LANE) * _LANE} MXU lanes — {waste:.0%} of "
        f"hidden-layer MACs are lane padding on TPU.  Consider "
        f"hidden_features={up} (lane-native; see nn.registry.LANE_NATIVE "
        f"and PERF.md), or pass lane_native=True to get_inr.  Set "
        f"WIRE_TPU_NO_LANE_WARN=1 to silence.")


def get_inr(nonlin: str, **kwargs) -> INR:
    """Build an INR model instance.

    Accepts the reference factory's keyword surface (in_features,
    hidden_features, scaled_hidden_features, hidden_layers, out_features,
    outermost_linear, first_omega0, hidden_omega0, scale, scale_tensor,
    pos_encode, sidelength, fn_samples, use_nyquist) plus the rebuild
    extensions on INRSpec (detach_split, combine_type, dtype, ...).
    """
    if nonlin not in MODEL_REGISTRY:
        raise KeyError(f"Unknown nonlin {nonlin!r}; available: "
                       f"{sorted(MODEL_REGISTRY)}")
    kw = dict(_FAMILY_DEFAULTS.get(nonlin, {}))
    # tolerate the reference scripts' 'first_omega_0' spelling
    for ref_name, ours in (("first_omega_0", "first_omega0"),
                           ("hidden_omega_0", "hidden_omega0")):
        if ref_name in kwargs:
            kwargs[ours] = kwargs.pop(ref_name)
    lane_native = kwargs.pop("lane_native", False)
    kw.update(kwargs)
    if lane_native:
        hf = kw.get("hidden_features", INRSpec.hidden_features)
        kw["hidden_features"] = lane_native_hidden(nonlin, hf)
    else:
        _maybe_warn_lane(nonlin,
                         kw.get("hidden_features", INRSpec.hidden_features))
    if nonlin == "posenc":
        kw.setdefault("pos_encode", True)
    if "scale_tensor" in kw and kw["scale_tensor"] is not None:
        kw["scale_tensor"] = tuple(float(s) for s in kw["scale_tensor"])
    spec = INRSpec(nonlin=nonlin, **kw)
    init_fn, apply_fn = MODEL_REGISTRY[nonlin]
    return INR(spec, init_fn, apply_fn, step_fn=STEP_REGISTRY.get(nonlin))
