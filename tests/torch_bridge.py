"""Bridge for parity tests: instantiate the *reference* PyTorch models
(imported read-only from /root/reference) and convert their parameters into
wire_tpu pytrees.  This gives exact forward/gradient parity oracles without
replicating any reference code in this repo."""
from __future__ import annotations

import contextlib
import sys

import numpy as np
import torch

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


@contextlib.contextmanager
def cpu_torch():
    """Reference modules hardcode device='cuda' in places
    (bspline_mscale_hier.py:22); strip device kwargs during instantiation."""
    orig_ones = torch.ones
    orig_tensor_cuda = torch.Tensor.cuda

    def ones(*a, **kw):
        kw.pop("device", None)
        return orig_ones(*a, **kw)

    torch.ones = ones
    torch.Tensor.cuda = lambda self, *a, **kw: self
    try:
        yield
    finally:
        torch.ones = orig_ones
        torch.Tensor.cuda = orig_tensor_cuda


def t2n(t):
    # always materialize a fresh buffer: jax's CPU backend may zero-copy
    # numpy arrays, and torch optimizer steps would mutate shared memory
    return np.array(t.detach().cpu().numpy())


def _lin(mod):
    p = {"w": np.array(t2n(mod.weight).T)}
    if mod.bias is not None:
        p["b"] = t2n(mod.bias)
    return p


def _clin(mod):
    w = t2n(mod.weight)
    p = {"wr": w.real.T.copy(), "wi": w.imag.T.copy()}
    if mod.bias is not None:
        b = t2n(mod.bias)
        p["br"] = b.real.copy()
        p["bi"] = b.imag.copy()
    return p


def make_ref_model(nonlin, **kw):
    """Instantiate a reference INR with its own (per-family) signature."""
    torch.manual_seed(0)
    with cpu_torch():
        if nonlin == "wire":
            from modules import wire
            return wire.INR(kw["in_features"], kw["hidden_features"],
                            kw.get("scaled_hidden_features", 0),
                            kw["hidden_layers"], kw["out_features"],
                            True, kw["first_omega0"], kw["hidden_omega0"],
                            kw["scale"])
        if nonlin == "realgabor":
            # the reference defines RealGaborLayer (wire.py:6-42) but never
            # wires it into an INR (wire.py:115 hardcodes ComplexGaborLayer);
            # compose the REFERENCE layer class into the shared chain
            # topology so the layer math itself is the parity oracle.
            from modules import wire
            layers = [wire.RealGaborLayer(
                kw["in_features"], kw["hidden_features"], is_first=True,
                omega0=kw["first_omega0"], sigma0=kw["scale"])]
            for _ in range(kw["hidden_layers"]):
                layers.append(wire.RealGaborLayer(
                    kw["hidden_features"], kw["hidden_features"],
                    omega0=kw["hidden_omega0"], sigma0=kw["scale"]))
            layers.append(torch.nn.Linear(kw["hidden_features"],
                                          kw["out_features"]))
            return torch.nn.Sequential(*layers)
        if nonlin == "wire2d":
            from modules import wire2d
            return wire2d.INR(kw["in_features"], kw["hidden_features"],
                              kw["hidden_layers"], kw["out_features"],
                              True, kw["first_omega0"], kw["hidden_omega0"],
                              kw["scale"])
        if nonlin == "siren":
            from modules import siren
            return siren.INR(kw["in_features"], kw["hidden_features"],
                             kw["hidden_layers"], kw["out_features"],
                             True, kw["first_omega0"], kw["hidden_omega0"],
                             kw["scale"])
        if nonlin == "gauss":
            from modules import gauss
            return gauss.INR(kw["in_features"], kw["hidden_features"],
                             kw["hidden_layers"], kw["out_features"],
                             True, kw["first_omega0"], kw["hidden_omega0"],
                             kw["scale"])
        if nonlin in ("relu", "posenc"):
            from modules import relu
            return relu.INR(kw["in_features"], kw["hidden_features"],
                            kw["hidden_layers"], kw["out_features"],
                            True, kw["first_omega0"], kw["hidden_omega0"],
                            kw["scale"], kw.get("pos_encode", False),
                            kw.get("sidelength", 512))
        if nonlin == "mfn":
            from modules import mfn
            return mfn.INR(kw["in_features"], kw["hidden_features"],
                           kw["hidden_layers"], kw["out_features"])
        if nonlin == "bspline_form":
            from modules import bspline_form
            return bspline_form.INR(kw["in_features"], kw["hidden_features"],
                                    0, kw["hidden_layers"],
                                    kw["out_features"], True,
                                    kw["first_omega0"], kw["hidden_omega0"],
                                    kw["scale"])
        if nonlin == "bspline_cubic":
            from modules import bspline_cubic
            # NB reference signature swaps hidden_layers/scaled_hidden_features
            # (bspline_cubic.py:56-60); call it with ITS OWN order.
            return bspline_cubic.INR(kw["in_features"], kw["hidden_features"],
                                     kw["hidden_layers"], 0,
                                     kw["out_features"], True,
                                     kw["first_omega0"], kw["hidden_omega0"],
                                     kw["scale"])
        if nonlin == "bspline_knots":
            from modules.bspline_imp import bspline_knots
            return bspline_knots.INR(kw["in_features"],
                                     kw["hidden_features"],
                                     kw["hidden_layers"], kw["out_features"],
                                     True, kw["first_omega0"],
                                     kw["hidden_omega0"], kw["scale"])
        if nonlin == "bspline_srelu":
            from modules.bspline_imp import bspline_srelu
            return bspline_srelu.INR(kw["in_features"],
                                     kw["hidden_features"],
                                     kw["hidden_layers"], kw["out_features"],
                                     True, kw["first_omega0"],
                                     kw["hidden_omega0"], kw["scale"])
        if nonlin == "bspline_sig":
            from modules.bspline_imp import bspline_sig
            return bspline_sig.INR(kw["in_features"], kw["hidden_features"],
                                   kw["hidden_layers"], kw["out_features"],
                                   True, kw["first_omega0"],
                                   kw["hidden_omega0"], kw["scale"])
        if nonlin == "bspline_mscale_1":
            from modules import bspline_mscale_1
            return bspline_mscale_1.INR(
                kw["in_features"], kw["hidden_features"],
                kw["scaled_hidden_features"], kw["hidden_layers"],
                kw["out_features"], True, kw["first_omega0"],
                kw["hidden_omega0"], kw["scale"],
                torch.tensor(kw["scale_tensor"]))
        if nonlin == "bspline_mscale_repIN":
            from modules import bspline_mscale_repIN
            return bspline_mscale_repIN.INR(
                kw["in_features"], kw["hidden_features"],
                kw.get("scaled_hidden_features", 0), kw["hidden_layers"],
                kw["out_features"], True, kw["first_omega0"],
                kw["hidden_omega0"], kw["scale"],
                torch.tensor(kw["scale_tensor"]))
        if nonlin == "bspline_mscale_HL":
            from modules import bspline_mscale_HL
            return bspline_mscale_HL.INR(
                kw["in_features"], kw["hidden_features"],
                kw["scaled_hidden_features"], kw["hidden_layers"],
                kw["out_features"], True, kw["first_omega0"],
                kw["hidden_omega0"], kw["scale"],
                torch.tensor(kw["scale_tensor"]))
        if nonlin == "bspline_mscale_2":
            from modules import bspline_mscale_2
            return bspline_mscale_2.INR(
                kw["in_features"], kw["hidden_features"],
                kw.get("scaled_hidden_features", 0), kw["hidden_layers"],
                kw["out_features"], True, kw["first_omega0"],
                kw["hidden_omega0"], kw["scale"],
                torch.tensor(kw["scale_tensor"]),
                sidelength=kw.get("sidelength", 512))
        if nonlin == "bspline_mscale_hier":
            from modules import bspline_mscale_hier
            return bspline_mscale_hier.INR(
                kw["in_features"], kw["hidden_features"],
                kw.get("scaled_hidden_features", 0), kw["hidden_layers"],
                kw["out_features"], True, kw["first_omega0"],
                kw["hidden_omega0"], kw["scale"],
                torch.tensor(kw["scale_tensor"]))
    raise KeyError(nonlin)


def params_from_ref(nonlin, model, hidden_layers):
    """Convert a reference torch model's weights into a wire_tpu pytree."""
    if nonlin in ("wire",):
        p = {"first": _lin(model.net[0].linear)}
        for i in range(hidden_layers):
            p[f"hidden_{i}"] = _clin(model.net[1 + i].linear)
        p["final"] = _clin(model.net[-1])
        return p
    if nonlin == "realgabor":
        def glayer(m):
            return {"freqs": _lin(m.freqs), "scale": _lin(m.scale)}
        p = {"first": glayer(model[0])}
        for i in range(hidden_layers):
            p[f"hidden_{i}"] = glayer(model[1 + i])
        p["final"] = _lin(model[-1])
        return p
    if nonlin == "wire2d":
        p = {"first_lin": _lin(model.net[0].linear),
             "first_orth": _lin(model.net[0].scale_orth)}
        for i in range(hidden_layers):
            p[f"hidden_{i}_lin"] = _clin(model.net[1 + i].linear)
            p[f"hidden_{i}_orth"] = _clin(model.net[1 + i].scale_orth)
        p["final"] = _clin(model.net[-1])
        return p
    if nonlin in ("siren", "gauss", "relu", "posenc", "bspline_form",
                  "bspline_cubic", "bspline_mscale_repIN", "bspline_knots",
                  "bspline_srelu", "bspline_sig"):
        p = {"first": _lin(model.net[0].linear)}
        for i in range(hidden_layers):
            p[f"hidden_{i}"] = _lin(model.net[1 + i].linear)
        p["final"] = _lin(model.net[-1])
        return p
    if nonlin == "mfn":
        k = hidden_layers + 1
        p = {}
        for i in range(k):
            g = model.gabon_filters[i]
            p[f"gabor_{i}"] = {"mu": t2n(g.mu), "gamma": t2n(g.gamma),
                               "w": t2n(g.linear.weight).T,
                               "b": t2n(g.linear.bias)}
        for i in range(k - 1):
            p[f"linear_{i}"] = _lin(model.linear[i])
        p["final"] = _lin(model.linear[k - 1])
        return p
    if nonlin in ("bspline_mscale_1", "bspline_mscale_HL"):
        p = {"first": _lin(model.net[0].linear),
             "trunk_in": _lin(model.net[1].linear)}
        n_extra = len(model.net) - 3
        for i in range(n_extra):
            p[f"hidden_{i}"] = _lin(model.net[2 + i].linear)
        p["final"] = _lin(model.net[-1])
        return p
    if nonlin == "bspline_mscale_2":
        p = {"first": _lin(model.net[0].linear)}
        for i in range(hidden_layers):
            p[f"hidden_{i}"] = _lin(model.net[1 + i].linear)
        p["final"] = _lin(model.net[-1])
        c = model.combine_scales
        p["combiner"] = {
            "scale_weights": t2n(c.scale_weights),
            "freq_0": _lin(c.freq_mlp[0]),
            "freq_1": _lin(c.freq_mlp[2]),
            "refine_0": _lin(c.refine[0]),
            "refine_1": _lin(c.refine[2]),
        }
        return p
    if nonlin == "bspline_mscale_hier":
        p = {"stages": [], "heads": []}
        for stage_mod, head in zip(model.stages, model.linears):
            p["stages"].append([_lin(l.linear) for l in stage_mod])
            p["heads"].append(_lin(head))
        return p
    raise KeyError(nonlin)


def torch_forward(model, coords_np):
    x = torch.tensor(np.asarray(coords_np, np.float32))
    with torch.no_grad():
        y = model(x)
    return t2n(y)


def torch_forward_and_coord_grad(model, coords_np):
    x = torch.tensor(np.asarray(coords_np, np.float32), requires_grad=True)
    y = model(x)
    y.sum().backward()
    return t2n(y), t2n(x.grad)
