"""Model factory — the rebuild of ``modules/models.py:get_INR``.

Unlike the reference factory (models.py:62-75), which binds 14 positional args
and TypeErrors on half its registry (SURVEY.md §2.6), every family here is
registered with its correct signature; ``posenc`` is a first-class name
(the reference scripts remap it to relu+pos_encode by hand, e.g.
wire_image_denoise.py:95-101).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

from wire_tpu.nn import models as M
from wire_tpu.nn.models import INR, INRSpec

# nonlin name -> (init_fn, apply_fn)
MODEL_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {
    "wire": (M.wire_init, M.wire_apply),
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
    "wire2d": dict(first_omega0=10.0, hidden_omega0=10.0, scale=10.0),
    "siren": dict(first_omega0=30.0, hidden_omega0=30.0, scale=10.0),
    "gauss": dict(scale=10.0),
    "relu": dict(),
    "posenc": dict(),
    "mfn": dict(),
}


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
    kw.update(kwargs)
    if nonlin == "posenc":
        kw.setdefault("pos_encode", True)
    if "scale_tensor" in kw and kw["scale_tensor"] is not None:
        kw["scale_tensor"] = tuple(float(s) for s in kw["scale_tensor"])
    spec = INRSpec(nonlin=nonlin, **kw)
    init_fn, apply_fn = MODEL_REGISTRY[nonlin]
    return INR(spec, init_fn, apply_fn, step_fn=STEP_REGISTRY.get(nonlin))
