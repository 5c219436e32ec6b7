"""The INR model zoo, as pure (init, apply) pairs over parameter pytrees.

Every family reproduces the *intended* behavior of the corresponding reference
module (file:line cites into /root/reference) — the reference's known defects
(SURVEY.md §2.6: the mscale_HL first-layer detach, the hier heads missing from
``parameters()``, the cubic factory arg swap, unbatchable sigmoid forward) are
fixed by default; where a defect changed published numbers, a compat flag
reproduces it (``detach_split`` for mscale_HL).

Topology shared by all families (e.g. wire.py:127-159, bspline_form.py:72-115):
``[first nonlin layer] + hidden_layers x [nonlin layer] + [final linear]``,
coords in [-1, 1], real outputs (complex models return the real part,
wire.py:161-167).

Apply functions take coords shaped ``(..., in_features)`` with any leading
batch dims and return ``(..., out_features)``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from wire_tpu.nn import activations as act
from wire_tpu.nn import init as winit
from wire_tpu.nn.layers import complex_linear, complex_linear_from_real, linear


@dataclasses.dataclass(frozen=True)
class INRSpec:
    """The uniform configuration surface of the model factory
    (models.py:27-75 in the reference), plus rebuild extensions."""
    nonlin: str
    in_features: int = 2
    hidden_features: int = 256
    hidden_layers: int = 2
    out_features: int = 1
    scaled_hidden_features: int | None = None
    outermost_linear: bool = True
    first_omega0: float = 30.0
    hidden_omega0: float = 30.0
    scale: float = 10.0
    scale_tensor: tuple = ()
    pos_encode: bool = False
    sidelength: int | tuple = 512
    fn_samples: int | None = None
    use_nyquist: bool = True
    # --- rebuild extensions -------------------------------------------------
    # mscale_HL: reproduce the reference's stop-gradient of the sliced first
    # layer (bspline_mscale_HL.py:89-90) for number parity. Default False =
    # intended behavior (first layer trains).
    detach_split: bool = False
    # mscale_HL: width of the slice given the base scale (hardcoded 256 at
    # bspline_mscale_HL.py:88).
    base_split: int = 256
    # mscale_2 combiner mode at forward time (hardcoded 'freq_combine' at
    # bspline_mscale_2.py:173; the combiner is built as 'both').
    combine_type: str = "freq_combine"
    dtype: Any = jnp.float32
    # fused Pallas kernel dispatch for families that have one ('auto' uses it
    # on TPU backends, 'never' forces the jnp path, 'always' forces the
    # kernel — with interpret mode off-TPU, for debugging only)
    fused: str = "auto"
    # MXU matmul precision inside the fused kernels. 'default' = XLA's
    # default TPU matmul path (bf16 operand truncation, f32 accumulation —
    # the numerics all published PSNR-parity runs used); 'highest' = true
    # f32 multi-pass matmuls (exact f32 semantics, slower on TPU).
    gemm_precision: str = "default"

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


_INIT_PROGRAMS: dict = {}


class INR:
    """A model family instance: ``params = m.init(key)``,
    ``y = m.apply(params, coords)``.

    Hashable on (spec, fn identities) so jitted training programs can be
    cached across fits of the same architecture."""

    def __init__(self, spec: INRSpec, init_fn, apply_fn, step_fn=None):
        self.spec = spec
        self._init = init_fn
        self._apply = apply_fn
        self._step = step_fn

    def __hash__(self):
        return hash((self.spec, self._init, self._apply, self._step))

    def __eq__(self, other):
        return (isinstance(other, INR) and self.spec == other.spec
                and self._init is other._init
                and self._apply is other._apply
                and self._step is other._step)

    def init(self, key):
        # One jitted program per architecture instead of dozens of eager
        # dispatches: on remote/tunneled backends every distinct eager op
        # pays a remote-compile round trip (~10s each, measured 2026-08-20),
        # which made bare init cost minutes.  The program is cached on the
        # (hashable) model so repeat inits reuse the loaded executable.
        prog = _INIT_PROGRAMS.get(self)
        if prog is None:
            prog = jax.jit(lambda k: self._init(k, self.spec))
            _INIT_PROGRAMS[self] = prog
        # when a cpu backend is co-registered (jax_platforms='axon,cpu'),
        # init on the host and transfer — the tunneled backend then never
        # compiles an init program at all
        from wire_tpu.train.trainer import _host_setup_device
        host = _host_setup_device()
        if host is None:
            return prog(key)
        try:
            with jax.default_device(host):
                params = prog(jax.device_put(key, host))
            return jax.device_put(params, jax.devices()[0])
        except Exception:
            return prog(key)

    def apply(self, params, coords, **kw):
        return self._apply(params, coords, self.spec, **kw)

    def step_grads(self, params, coords, target, *, nvalid=None, denom=None,
                   gt=None, want_metrics=False):
        """(pred, dparams) of ``loss = sum_{rows<nvalid}(pred-t)^2 / denom``
        — the trainer's per-step unit.  Families with a one-pass fused
        train-step kernel (WIRE) run fwd + loss-grad + bwd in a single
        Pallas call; everything else falls back to autodiff of ``apply``.
        Invalid (padding) rows, if any, must be contiguous at the tail.

        nvalid defaults to n, denom to n*c (plain mean MSE); both may be
        traced scalars.

        want_metrics=True appends the masked squared-error sums
        ``(sse_target, sse_gt)`` as a third return element (gt defaults to
        target) — accumulated inside the fused kernel where one exists, so
        the trainer's epoch metrics cost no extra pass over the
        predictions."""
        if self._step is not None:
            out = self._step(params, coords, target, self.spec,
                             nvalid=nvalid, denom=denom, gt=gt,
                             want_metrics=want_metrics)
            if out is not None:
                return out
        n, c = target.shape
        dn = float(n * c) if denom is None else denom
        mask = None
        if nvalid is not None:
            mask = (jnp.arange(n)[:, None] < nvalid)

        def loss_fn(p):
            pred = self._apply(p, coords, self.spec)
            err = pred - target
            if mask is not None:
                err = err * mask.astype(pred.dtype)
            return jnp.sum(err * err) / dn, pred

        (_, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if not want_metrics:
            return pred, grads
        err_t = pred - target
        err_g = err_t if gt is None else pred - gt
        if mask is not None:
            m = mask.astype(pred.dtype)
            err_t = err_t * m
            err_g = err_g * m
        return pred, grads, (jnp.sum(err_t * err_t), jnp.sum(err_g * err_g))

    def num_params(self, params):
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ===========================================================================
# WIRE — complex Gabor (modules/wire.py)
# ===========================================================================

def _wire_hidden(spec):
    # Complex params count double; the reference halves width by sqrt(2)
    # (wire.py:119).
    return int(spec.hidden_features / np.sqrt(2))


def wire_init(key, spec: INRSpec):
    h = _wire_hidden(spec)
    keys = jax.random.split(key, spec.hidden_layers + 2)
    params = {"first": winit.linear_params(keys[0], spec.in_features, h,
                                           dtype=spec.dtype)}
    for i in range(spec.hidden_layers):
        params[f"hidden_{i}"] = winit.complex_linear_params(
            keys[1 + i], h, h, dtype=spec.dtype)
    params["final"] = winit.complex_linear_params(
        keys[-1], h, spec.out_features, dtype=spec.dtype)
    return params


def wire_apply(params, coords, spec: INRSpec):
    if spec.fused != "never" and spec.dtype == jnp.float32:
        on_tpu = jax.default_backend() == "tpu"
        if spec.fused == "always" or on_tpu:
            from wire_tpu.ops.pallas.wire_mlp import wire_mlp_fused
            return wire_mlp_fused(params, coords, spec,
                                  interpret=not on_tpu)
    # First layer is real->real linear then complex Gabor (wire.py:73-76:
    # is_first uses a float linear).
    z = linear(params["first"], coords)
    xr, xi = act.complex_gabor_real_input(z, spec.first_omega0, spec.scale)
    for i in range(spec.hidden_layers):
        zr, zi = complex_linear(params[f"hidden_{i}"], xr, xi)
        xr, xi = act.complex_gabor(zr, zi, spec.hidden_omega0, spec.scale)
    yr, _ = complex_linear(params["final"], xr, xi)
    return yr  # output.real (wire.py:164-165)


def _complex_step_dispatch(import_fused, doc):
    """Shared fused-dispatch gate for the hand-written step kernels (wire /
    wire2d / mfn): fused enabled, f32, on TPU (or fused='always' ->
    interpret mode off-TPU).  Returns None so INR.step_grads falls back to
    autodiff when the gate fails."""
    def step(params, coords, target, spec, *, nvalid=None, denom=None,
             gt=None, want_metrics=False):
        if spec.fused != "never" and spec.dtype == jnp.float32:
            on_tpu = jax.default_backend() == "tpu"
            if spec.fused == "always" or on_tpu:
                fused = import_fused()
                return fused(params, coords, target, spec, nvalid=nvalid,
                             denom=denom, gt=gt, want_metrics=want_metrics,
                             interpret=not on_tpu)
        return None
    step.__doc__ = doc
    return step


def _import_wire_step():
    from wire_tpu.ops.pallas.wire_step import wire_step_fused
    return wire_step_fused


wire_step = _complex_step_dispatch(
    _import_wire_step,
    "One-pass fused WIRE train-step dispatch (ops/pallas/wire_step.py).")


# ===========================================================================
# WIRE-2D — 2D Gabor (modules/wire2d.py)
# ===========================================================================

def wire2d_init(key, spec: INRSpec):
    h = int(spec.hidden_features / 2)  # wire2d.py:92
    keys = jax.random.split(key, 2 * (spec.hidden_layers + 1) + 1)
    params = {
        "first_lin": winit.linear_params(keys[0], spec.in_features, h,
                                         dtype=spec.dtype),
        "first_orth": winit.linear_params(keys[1], spec.in_features, h,
                                          dtype=spec.dtype),
    }
    for i in range(spec.hidden_layers):
        params[f"hidden_{i}_lin"] = winit.complex_linear_params(
            keys[2 + 2 * i], h, h, dtype=spec.dtype)
        params[f"hidden_{i}_orth"] = winit.complex_linear_params(
            keys[3 + 2 * i], h, h, dtype=spec.dtype)
    params["final"] = winit.complex_linear_params(keys[-1], h,
                                                  spec.out_features,
                                                  dtype=spec.dtype)
    return params


def wire2d_apply(params, coords, spec: INRSpec):
    # First layer: real linears (wire2d.py:36-54 with is_first), complex
    # activation exp(1j*w*lin)*exp(-s^2(|lin|^2+|orth|^2)) (wire2d.py:56-67).
    if spec.fused != "never" and spec.dtype == jnp.float32:
        on_tpu = jax.default_backend() == "tpu"
        if spec.fused == "always" or on_tpu:
            # fused fwd + recompute-backward pair (VERDICT r4 #3): the
            # operator-fit/render model path, same machinery as wire's
            from wire_tpu.ops.pallas.wire2d_step import wire2d_mlp_fused
            return wire2d_mlp_fused(params, coords, spec,
                                    interpret=not on_tpu)
    lin = linear(params["first_lin"], coords)
    orth = linear(params["first_orth"], coords)
    xr, xi = act.complex_gabor2d(lin, jnp.zeros_like(lin), orth,
                                 jnp.zeros_like(orth),
                                 spec.first_omega0, spec.scale)
    for i in range(spec.hidden_layers):
        lr, li = complex_linear(params[f"hidden_{i}_lin"], xr, xi)
        orr, ori = complex_linear(params[f"hidden_{i}_orth"], xr, xi)
        xr, xi = act.complex_gabor2d(lr, li, orr, ori,
                                     spec.hidden_omega0, spec.scale)
    yr, _ = complex_linear(params["final"], xr, xi)
    return yr


def _import_wire2d_step():
    from wire_tpu.ops.pallas.wire2d_step import wire2d_step_fused
    return wire2d_step_fused


wire2d_step = _complex_step_dispatch(
    _import_wire2d_step,
    "One-pass fused wire2d train-step dispatch "
    "(ops/pallas/wire2d_step.py).")


# ---------------------------------------------------------------------------
# Fused real-MLP dispatch (ops/pallas/real_mlp.py): canonicalize a family's
# params to (w, alpha, beta) per layer + basis kinds, run the fused kernel.
# ---------------------------------------------------------------------------

def _use_fused(spec):
    if spec.fused == "never" or spec.dtype != jnp.float32:
        return False, False
    if not spec.outermost_linear:
        return False, False
    on_tpu = jax.default_backend() == "tpu"
    if spec.fused == "always":
        return True, not on_tpu
    return on_tpu, False


def _layer_names(spec):
    return ["first"] + [f"hidden_{i}" for i in range(spec.hidden_layers)]


def _canon_uniform(params, spec, kind, alpha_of, beta_of, names=None):
    """Canonical params for families where every act layer shares one
    (alpha, beta) folding rule."""
    names = _layer_names(spec) if names is None else names
    layers = []
    for nm in names:
        w = params[nm]["w"]
        b = params[nm]["b"]
        width = w.shape[1]
        layers.append({
            "w": w,
            "alpha": jnp.full((width,), alpha_of, w.dtype),
            "beta": beta_of(b),
        })
    return {"layers": layers,
            "final": {"w": params["final"]["w"], "b": params["final"]["b"]}}


def _fused_real(params, coords, spec, kinds, canon):
    from wire_tpu.ops.pallas.real_mlp import real_mlp_fused
    lead = coords.shape[:-1]
    c2 = coords.reshape(-1, coords.shape[-1])
    out = real_mlp_fused(canon, c2, tuple(kinds),
                         jax.default_backend() != "tpu")
    return out.reshape(*lead, out.shape[-1])


def _make_real_step(kinds_of, canon_of, use_ok=None, pre=None):
    """Build a family step fn (INR.step_grads hook) over the shared one-pass
    real-MLP train-step kernel (ops/pallas/real_mlp.py:real_step_fused).

    kinds_of(spec) -> tuple of basis names (static); canon_of(params, spec)
    -> canonical params (traced — native-family gradients are recovered by
    jax.vjp through it); use_ok(params, spec) gates family-specific
    fusability; pre(coords, spec) is an optional param-free input transform
    (posenc, repIN tiling)."""
    def step(params, coords, target, spec, *, nvalid=None, denom=None,
             gt=None, want_metrics=False):
        use, interpret = _use_fused(spec)
        if not use or (use_ok is not None and not use_ok(params, spec)):
            return None
        from wire_tpu.ops.pallas.real_mlp import real_step_fused
        x = coords if pre is None else pre(coords, spec)
        canon, vjp = jax.vjp(lambda p: canon_of(p, spec), params)
        out = real_step_fused(canon, x, target, tuple(kinds_of(spec)),
                              nvalid=nvalid, denom=denom, gt=gt,
                              want_metrics=want_metrics,
                              interpret=interpret)
        if want_metrics:
            pred, dcanon, sums = out
            return pred, vjp(dcanon)[0], sums
        pred, dcanon = out
        return pred, vjp(dcanon)[0]
    return step


# ===========================================================================
# SIREN (modules/siren.py)
# ===========================================================================

def siren_init(key, spec: INRSpec):
    keys = jax.random.split(key, spec.hidden_layers + 2)
    params = {"first": winit.siren_linear_params(
        keys[0], spec.in_features, spec.hidden_features,
        is_first=True, omega0=spec.first_omega0, dtype=spec.dtype)}
    for i in range(spec.hidden_layers):
        params[f"hidden_{i}"] = winit.siren_linear_params(
            keys[1 + i], spec.hidden_features, spec.hidden_features,
            is_first=False, omega0=spec.hidden_omega0, dtype=spec.dtype)
    if spec.outermost_linear:
        params["final"] = winit.siren_final_linear_params(
            keys[-1], spec.hidden_features, spec.out_features,
            omega0=spec.hidden_omega0, dtype=spec.dtype)
    else:
        params["final"] = winit.siren_linear_params(
            keys[-1], spec.hidden_features, spec.out_features,
            is_first=False, omega0=spec.hidden_omega0, dtype=spec.dtype)
    return params


def _canon_siren(params, spec):
    layers = []
    for i, nm in enumerate(_layer_names(spec)):
        w = params[nm]["w"]
        omega = spec.first_omega0 if i == 0 else spec.hidden_omega0
        layers.append({"w": w,
                       "alpha": jnp.full((w.shape[1],), omega, w.dtype),
                       "beta": omega * params[nm]["b"]})
    return {"layers": layers, "final": dict(params["final"])}


def siren_apply(params, coords, spec: INRSpec):
    # r3 gated this family off the fused path ("backward recompute of
    # sin/cos costs more than XLA's residual storage"); fast_sincos
    # (ops/pallas/wire_mlp.py, r4) made the recompute cheap — measured
    # 7.93/14.5 ms XLA vs 4.48/11.1 ms fused fwd/fwd+bwd at 512^2 coords
    use = _use_fused(spec)[0]
    if use:
        canon = _canon_siren(params, spec)
        return _fused_real(params, coords, spec,
                           ("sine",) * len(canon["layers"]), canon)
    x = act.sine(linear(params["first"], coords), spec.first_omega0)
    for i in range(spec.hidden_layers):
        x = act.sine(linear(params[f"hidden_{i}"], x), spec.hidden_omega0)
    if spec.outermost_linear:
        return linear(params["final"], x)
    return act.sine(linear(params["final"], x), spec.hidden_omega0)


# ===========================================================================
# Real Gabor (modules/wire.py:6-42 RealGaborLayer) — VERDICT r4 #8.
# cos(omega0*freqs(x)) * exp(-(sigma0*scale(x))^2) with TWO torch-default
# Linears per layer.  The reference defines the layer but never wires it
# into an INR (wire.py:115 hardcodes ComplexGaborLayer), so the chain
# topology here is the shared INR convention (first + hidden_layers gabor
# layers + final linear) with REAL parameters — no sqrt(2) width reduction
# (that is the complex INR's, wire.py:119).
# ===========================================================================

def realgabor_init(key, spec: INRSpec):
    h = spec.hidden_features
    keys = jax.random.split(key, 2 * (spec.hidden_layers + 1) + 2)

    def pair(k0, k1, nin):
        return {"freqs": winit.linear_params(k0, nin, h, dtype=spec.dtype),
                "scale": winit.linear_params(k1, nin, h, dtype=spec.dtype)}

    params = {"first": pair(keys[0], keys[1], spec.in_features)}
    for i in range(spec.hidden_layers):
        params[f"hidden_{i}"] = pair(keys[2 + 2 * i], keys[3 + 2 * i], h)
    if spec.outermost_linear:
        params["final"] = winit.linear_params(keys[-1], h, spec.out_features,
                                              dtype=spec.dtype)
    else:
        params["final"] = {"freqs": winit.linear_params(
            keys[-2], h, spec.out_features, dtype=spec.dtype),
            "scale": winit.linear_params(keys[-1], h, spec.out_features,
                                         dtype=spec.dtype)}
    return params


def _real_gabor_layer(p, x, omega0, sigma0):
    """wire.py:38-42: cos(omega_0 * freqs(x)) * exp(-(scale(x) * scale_0)^2)."""
    omega = omega0 * linear(p["freqs"], x)
    s = sigma0 * linear(p["scale"], x)
    return jnp.cos(omega) * jnp.exp(-(s * s))


def realgabor_apply(params, coords, spec: INRSpec):
    x = _real_gabor_layer(params["first"], coords, spec.first_omega0,
                          spec.scale)
    for i in range(spec.hidden_layers):
        x = _real_gabor_layer(params[f"hidden_{i}"], x, spec.hidden_omega0,
                              spec.scale)
    if spec.outermost_linear:
        return linear(params["final"], x)
    return _real_gabor_layer(params["final"], x, spec.hidden_omega0,
                             spec.scale)


# ===========================================================================
# Gauss (modules/gauss.py)
# ===========================================================================

def _plain_mlp_init(key, spec: INRSpec, in_features=None):
    nin = spec.in_features if in_features is None else in_features
    keys = jax.random.split(key, spec.hidden_layers + 2)
    params = {"first": winit.linear_params(keys[0], nin, spec.hidden_features,
                                           dtype=spec.dtype)}
    for i in range(spec.hidden_layers):
        params[f"hidden_{i}"] = winit.linear_params(
            keys[1 + i], spec.hidden_features, spec.hidden_features,
            dtype=spec.dtype)
    params["final"] = winit.linear_params(keys[-1], spec.hidden_features,
                                          spec.out_features, dtype=spec.dtype)
    return params


def gauss_apply(params, coords, spec: INRSpec):
    use, _ = _use_fused(spec)
    if use:
        s = spec.scale
        canon = _canon_uniform(params, spec, "gauss", s,
                               lambda b: s * b)
        return _fused_real(params, coords, spec,
                           ("gauss",) * (spec.hidden_layers + 1), canon)
    x = act.gauss(linear(params["first"], coords), spec.scale)
    for i in range(spec.hidden_layers):
        x = act.gauss(linear(params[f"hidden_{i}"], x), spec.scale)
    if spec.outermost_linear:
        return linear(params["final"], x)
    return act.gauss(linear(params["final"], x), spec.scale)


# ===========================================================================
# ReLU (+ positional encoding) (modules/relu.py)
# ===========================================================================

def posenc_num_frequencies(spec: INRSpec):
    """modules/relu.py:40-60 frequency-count selection."""
    nf = spec.in_features
    if nf == 3:
        return 10
    side = spec.sidelength
    if isinstance(side, int):
        side = (side, side)
    if nf == 2:
        samples = min(side[0], side[1])
    elif nf == 1:
        samples = spec.fn_samples if spec.fn_samples is not None else side[0]
    else:
        return 4
    if not spec.use_nyquist:
        return 4
    nyquist_rate = 1 / (2 * (2 * 1 / samples))
    import math
    return int(math.floor(math.log(nyquist_rate, 2)))


def posenc_out_dim(spec: INRSpec):
    nf = posenc_num_frequencies(spec)
    return spec.in_features + 2 * spec.in_features * nf


def relu_init(key, spec: INRSpec):
    nin = posenc_out_dim(spec) if spec.pos_encode else spec.in_features
    return _plain_mlp_init(key, spec, in_features=nin)


def relu_apply(params, coords, spec: INRSpec):
    if spec.pos_encode:
        coords = act.posenc(coords, posenc_num_frequencies(spec),
                            spec.in_features)
    use, _ = _use_fused(spec)
    if use:
        canon = _canon_uniform(params, spec, "relu", 1.0, lambda b: b)
        return _fused_real(params, coords, spec,
                           ("relu",) * (spec.hidden_layers + 1), canon)
    x = act.relu(linear(params["first"], coords))
    for i in range(spec.hidden_layers):
        x = act.relu(linear(params[f"hidden_{i}"], x))
    if spec.outermost_linear:
        return linear(params["final"], x)
    return act.relu(linear(params["final"], x))


# ===========================================================================
# MFN — Gabor multiplicative filter network (modules/mfn.py)
# ===========================================================================

def mfn_init(key, spec: INRSpec):
    k = spec.hidden_layers + 1
    keys = jax.random.split(key, 2 * k + 1)
    params = {}
    for i in range(k):
        params[f"gabor_{i}"] = winit.mfn_gabor_params(
            keys[i], spec.in_features, spec.hidden_features,
            alpha=6.0 / k, dtype=spec.dtype)
    bound = np.sqrt(1.0 / spec.hidden_features)
    for i in range(k - 1):
        params[f"linear_{i}"] = winit.linear_params(
            keys[k + i], spec.hidden_features, spec.hidden_features,
            w_bound=bound, dtype=spec.dtype)
    params["final"] = winit.linear_params(
        keys[-1], spec.hidden_features, spec.out_features, dtype=spec.dtype)
    return params


def _mfn_gabor(p, x):
    # exp(-gamma/2 * ||x - mu||^2) * sin(Wx + b)   (mfn.py:21-23)
    norm = (jnp.sum(x * x, axis=-1, keepdims=True)
            + jnp.sum(p["mu"] * p["mu"], axis=-1)[None, :]
            - 2.0 * (x @ p["mu"].T))
    return jnp.exp(-0.5 * p["gamma"] * norm) * jnp.sin(x @ p["w"] + p["b"])


def mfn_apply(params, coords, spec: INRSpec):
    # The reference forward indexes x[0, ...] and re-adds the batch dim
    # (mfn.py:49-53); here leading dims broadcast naturally.
    use, interpret = _use_fused(spec)
    if use:
        # fused fwd + custom recompute-VJP pair (the operator-fit model
        # path — the pointwise one-pass step kernel cannot absorb a
        # global operator); serial form, dcoords included
        from wire_tpu.ops.pallas.mfn_step import mfn_mlp_fused
        return mfn_mlp_fused(params, coords, spec, interpret)
    k = spec.hidden_layers + 1
    z = _mfn_gabor(params["gabor_0"], coords)
    for i in range(k - 1):
        z = linear(params[f"linear_{i}"], z) * _mfn_gabor(
            params[f"gabor_{i + 1}"], coords)
    return linear(params["final"], z)


def _import_mfn_step():
    from wire_tpu.ops.pallas.mfn_step import mfn_step_fused
    return mfn_step_fused


mfn_step = _complex_step_dispatch(
    _import_mfn_step,
    "One-pass fused Gabor-MFN train-step dispatch "
    "(ops/pallas/mfn_step.py).")


# ===========================================================================
# B-spline families (modules/bspline_*.py)
# ===========================================================================
# Scale conventions differ across the reference variants:
#   'divide': B(Wx / sigma)      bspline_form.py:44, mscale_HL/hier/2
#   'pre'   : B(W(sigma * x))    bspline_mscale_1.py:43, bspline_cubic.py:45
#   'post'  : B(sigma * Wx)      bspline_mscale_repIN.py:41-42

def _bspline_layer(p, x, sigma, mode, basis=act.bspline_quadratic):
    if mode == "pre":
        return basis(linear(p, sigma * x))
    z = linear(p, x)
    if mode == "divide":
        return basis(z / sigma)
    if mode == "post":
        return basis(sigma * z)
    raise ValueError(mode)


def bspline_form_apply(params, coords, spec: INRSpec):
    use, _ = _use_fused(spec)
    if use:
        s = spec.scale
        canon = _canon_uniform(params, spec, "qspline", 1.0 / s,
                               lambda b: b / s)
        return _fused_real(params, coords, spec,
                           ("qspline",) * (spec.hidden_layers + 1), canon)
    x = _bspline_layer(params["first"], coords, spec.scale, "divide")
    for i in range(spec.hidden_layers):
        x = _bspline_layer(params[f"hidden_{i}"], x, spec.scale, "divide")
    if spec.outermost_linear:
        return linear(params["final"], x)
    return _bspline_layer(params["final"], x, spec.scale, "divide")


def bspline_cubic_apply(params, coords, spec: INRSpec):
    use, _ = _use_fused(spec)
    if use:
        s = spec.scale
        # 'pre' mode: z = (s*a)@W + b = s*(a@W) + b
        canon = _canon_uniform(params, spec, "cspline", s, lambda b: b)
        return _fused_real(params, coords, spec,
                           ("cspline",) * (spec.hidden_layers + 1), canon)
    x = _bspline_layer(params["first"], coords, spec.scale, "pre",
                       act.bspline_cubic)
    for i in range(spec.hidden_layers):
        x = _bspline_layer(params[f"hidden_{i}"], x, spec.scale, "pre",
                           act.bspline_cubic)
    if spec.outermost_linear:
        return linear(params["final"], x)
    return _bspline_layer(params["final"], x, spec.scale, "pre",
                          act.bspline_cubic)


def bspline_srelu_apply(params, coords, spec: INRSpec):
    use, _ = _use_fused(spec)
    if use:
        s = spec.scale
        canon = _canon_uniform(params, spec, "srelu", s, lambda b: s * b)
        return _fused_real(params, coords, spec,
                           ("srelu",) * (spec.hidden_layers + 1), canon)

    def f(p, x):
        return act.bspline_srelu(linear(p, x), spec.scale)
    x = f(params["first"], coords)
    for i in range(spec.hidden_layers):
        x = f(params[f"hidden_{i}"], x)
    if spec.outermost_linear:
        return linear(params["final"], x)
    return f(params["final"], x)


def bspline_sig_apply(params, coords, spec: INRSpec):
    neg = coords[..., :1] < 0
    def f(p, x):
        return act.bspline_sigmoid(linear(p, x), neg, spec.first_omega0,
                                   spec.scale)
    x = f(params["first"], coords)
    for i in range(spec.hidden_layers):
        x = f(params[f"hidden_{i}"], x)
    if spec.outermost_linear:
        return linear(params["final"], x)
    return f(params["final"], x)


_DEBOOR_KNOTS = (-1.5, -1.5, -1.5, -0.5, 0.5, 1.5, 1.5, 1.5)


def bspline_knots_apply(params, coords, spec: INRSpec):
    def f(p, x):
        return act.bspline_deboor(linear(p, x), _DEBOOR_KNOTS, degree=2)
    x = f(params["first"], coords)
    for i in range(spec.hidden_layers):
        x = f(params[f"hidden_{i}"], x)
    if spec.outermost_linear:
        return linear(params["final"], x)
    return f(params["final"], x)


# --- mscale_1: parallel scaled first layer (modules/bspline_mscale_1.py) ----

def mscale1_init(key, spec: INRSpec):
    shf = spec.scaled_hidden_features
    ns = len(spec.scale_tensor)
    # hidden_layers is decremented once (bspline_mscale_1.py:115) and the body
    # loop runs hidden_layers-1 more times -> total trunk depth below.
    extra = max(spec.hidden_layers - 2, 0)
    keys = jax.random.split(key, extra + 3)
    params = {
        "first": winit.linear_params(keys[0], spec.in_features, shf,
                                     dtype=spec.dtype),
        "trunk_in": winit.linear_params(keys[1], shf * ns,
                                        spec.hidden_features,
                                        dtype=spec.dtype),
    }
    for i in range(extra):
        params[f"hidden_{i}"] = winit.linear_params(
            keys[2 + i], spec.hidden_features, spec.hidden_features,
            dtype=spec.dtype)
    params["final"] = winit.linear_params(keys[-1], spec.hidden_features,
                                          spec.out_features, dtype=spec.dtype)
    return params


def mscale1_apply(params, coords, spec: INRSpec):
    # First layer: one shared Linear applied to scale*input per scale, concat
    # along features; the reference returns the *raw* linear output (the
    # B-spline application is commented out, bspline_mscale_1.py:80-87).
    outs = [linear(params["first"], s * coords) for s in spec.scale_tensor]
    x = jnp.concatenate(outs, axis=-1)
    x = _bspline_layer(params["trunk_in"], x, spec.scale, "pre")
    for i in range(max(spec.hidden_layers - 2, 0)):
        x = _bspline_layer(params[f"hidden_{i}"], x, spec.scale, "pre")
    if spec.outermost_linear:
        return linear(params["final"], x)
    return _bspline_layer(params["final"], x, spec.scale, "pre")


# --- mscale_repIN: replicated scaled inputs (bspline_mscale_repIN.py) -------

def _repin_expand(coords, spec):
    # Tile coords per scale into a widened vector
    # (bspline_mscale_repIN.py:110-119): in_features = 2*nscales*repeat.
    # The reference's permute(1,0,2,3).reshape(B,-1,in) interleaves rows in
    # a specific (scale-major) flattening; mirrored exactly here.
    if coords.ndim == 2:
        coords = coords[None]
        squeeze = True
    else:
        squeeze = False
    B, N, coord_dim = coords.shape
    ns = len(spec.scale_tensor)
    repeat = spec.in_features // (coord_dim * ns)
    scales = jnp.asarray(spec.scale_tensor, coords.dtype)
    scaled = scales[None, :, None, None] * coords[:, None]   # (B, ns, N, d)
    tiled = jnp.tile(scaled, (1, 1, 1, repeat))              # (B, ns, N, d*r)
    x = jnp.transpose(tiled, (1, 0, 2, 3)).reshape(
        B, -1, ns * coord_dim * repeat)
    return x[0] if squeeze else x


def mscale_repin_apply(params, coords, spec: INRSpec):
    x = _repin_expand(coords, spec)
    use, _ = _use_fused(spec)
    if use:
        s = spec.scale
        canon = _canon_uniform(params, spec, "qspline", s, lambda b: s * b)
        return _fused_real(params, x, spec,
                           ("qspline",) * (spec.hidden_layers + 1), canon)
    x = _bspline_layer(params["first"], x, spec.scale, "post")
    for i in range(spec.hidden_layers):
        x = _bspline_layer(params[f"hidden_{i}"], x, spec.scale, "post")
    if spec.outermost_linear:
        return linear(params["final"], x)
    return _bspline_layer(params["final"], x, spec.scale, "post")


# --- mscale_HL: split first layer into High/Low bands (bspline_mscale_HL.py)

def mscale_hl_init(key, spec: INRSpec):
    shf = spec.scaled_hidden_features
    extra = max(spec.hidden_layers - 1, 0)
    keys = jax.random.split(key, extra + 3)
    params = {
        "first": winit.linear_params(keys[0], spec.in_features, shf,
                                     dtype=spec.dtype),
        "trunk_in": winit.linear_params(keys[1], shf, spec.hidden_features,
                                        dtype=spec.dtype),
    }
    for i in range(extra):
        params[f"hidden_{i}"] = winit.linear_params(
            keys[2 + i], spec.hidden_features, spec.hidden_features,
            dtype=spec.dtype)
    params["final"] = winit.linear_params(keys[-1], spec.hidden_features,
                                          spec.out_features, dtype=spec.dtype)
    return params


def _mscale_hl_bounds(width, spec):
    scales = spec.scale_tensor
    base = spec.base_split
    nrest = len(scales) - 1
    bounds = [0, base]
    if nrest > 0:
        split = (width - base) // nrest
        for i in range(nrest):
            bounds.append(base + (i + 1) * split)
    return bounds


def _canon_mscale_hl(params, spec):
    # per-lane alpha folds the band scales into one fused first layer
    width = params["first"]["w"].shape[1]
    bounds = _mscale_hl_bounds(width, spec)
    alpha0 = np.ones((width,), np.float32)
    for i, s in enumerate(spec.scale_tensor):
        alpha0[bounds[i]:bounds[i + 1]] = 1.0 / s
    alpha0 = jnp.asarray(alpha0)
    layers = [{"w": params["first"]["w"], "alpha": alpha0,
               "beta": alpha0 * params["first"]["b"]}]
    s = spec.scale
    for nm in ["trunk_in"] + [f"hidden_{i}"
                              for i in range(max(spec.hidden_layers - 1,
                                                 0))]:
        w = params[nm]["w"]
        layers.append({"w": w,
                       "alpha": jnp.full((w.shape[1],), 1.0 / s, w.dtype),
                       "beta": params[nm]["b"] / s})
    return {"layers": layers, "final": dict(params["final"])}


def _mscale_hl_fusable(params, spec):
    width = params["first"]["w"].shape[1]
    return (not spec.detach_split
            and _mscale_hl_bounds(width, spec)[-1] == width)


def mscale_hl_apply(params, coords, spec: INRSpec):
    # One wide first Linear, output sliced per scale band
    # (bspline_mscale_HL.py:85-97): first `base_split` units at
    # scale_tensor[0], the rest split evenly across remaining scales.
    scales = spec.scale_tensor
    width = params["first"]["w"].shape[1]
    bounds = _mscale_hl_bounds(width, spec)

    use, _ = _use_fused(spec)
    if use and _mscale_hl_fusable(params, spec):
        canon = _canon_mscale_hl(params, spec)
        return _fused_real(params, coords, spec,
                           ("qspline",) * len(canon["layers"]), canon)

    lin = linear(params["first"], coords)
    pieces = []
    for i, s in enumerate(scales):
        seg = lin[..., bounds[i]:bounds[i + 1]]
        if spec.detach_split:
            # Reference-compat: slices are detached so the first Linear never
            # trains (bspline_mscale_HL.py:89-90).
            seg = jax.lax.stop_gradient(seg)
        pieces.append(act.bspline_quadratic(seg / s))
    x = jnp.concatenate(pieces, axis=-1)
    x = _bspline_layer(params["trunk_in"], x, spec.scale, "divide")
    for i in range(max(spec.hidden_layers - 1, 0)):
        x = _bspline_layer(params[f"hidden_{i}"], x, spec.scale, "divide")
    if spec.outermost_linear:
        return linear(params["final"], x)
    return _bspline_layer(params["final"], x, spec.scale, "divide")


# --- mscale_2: per-scale full passes + learned combiner (bspline_mscale_2.py)

def mscale2_init(key, spec: INRSpec):
    ns = len(spec.scale_tensor)
    keys = jax.random.split(key, spec.hidden_layers + 7)
    params = {"first": winit.linear_params(keys[0], spec.in_features,
                                           spec.hidden_features,
                                           dtype=spec.dtype)}
    for i in range(spec.hidden_layers):
        params[f"hidden_{i}"] = winit.linear_params(
            keys[1 + i], spec.hidden_features, spec.hidden_features,
            dtype=spec.dtype)
    params["final"] = winit.linear_params(keys[spec.hidden_layers + 1],
                                          spec.hidden_features,
                                          spec.out_features, dtype=spec.dtype)
    k = spec.hidden_layers + 2
    # AdaptiveScaleCombiner built as 'both' (bspline_mscale_2.py:124): all
    # three heads exist as params even though the forward only uses freq_mlp
    # under the default 'freq_combine' mode.
    params["combiner"] = {
        "scale_weights": jnp.ones((ns,), spec.dtype),
        "freq_0": winit.linear_params(keys[k], ns * spec.out_features, 128,
                                      dtype=spec.dtype),
        "freq_1": winit.linear_params(keys[k + 1], 128, spec.out_features,
                                      dtype=spec.dtype),
        "refine_0": winit.linear_params(keys[k + 2], spec.out_features, 128,
                                        dtype=spec.dtype),
        "refine_1": winit.linear_params(keys[k + 3], 128, spec.out_features,
                                        dtype=spec.dtype),
    }
    return params


def _mscale2_trunk(params, coords, spec, s):
    x = _bspline_layer(params["first"], coords, s, "divide")
    for i in range(spec.hidden_layers):
        x = _bspline_layer(params[f"hidden_{i}"], x, s, "divide")
    if spec.outermost_linear:
        return linear(params["final"], x)
    return _bspline_layer(params["final"], x, s, "divide")


def mscale2_apply(params, coords, spec: INRSpec):
    # The whole trunk runs once per scale (bspline_mscale_2.py:159-172);
    # here the scales are vmapped so XLA batches the per-scale GEMMs.
    use, _ = _use_fused(spec)
    if use:
        # ONE kernel invocation for ALL scales: the per-scale passes share
        # (W, b) and differ only by the activation prescale 1/s, so the
        # scale blocks stack along M and the kernel applies each block's
        # gamma by grid index (real_mlp_fused_scales; VERDICT round 1 #5 —
        # previously a Python loop of one fwd+bwd kernel pair per scale).
        from wire_tpu.ops.pallas.real_mlp import real_mlp_fused_scales
        kinds = ("qspline",) * (spec.hidden_layers + 1)
        canon = _canon_uniform(params, spec, "qspline", 1.0, lambda b: b)
        lead = coords.shape[:-1]
        c2 = coords.reshape(-1, coords.shape[-1])
        inv = tuple(1.0 / s for s in spec.scale_tensor)
        outs = real_mlp_fused_scales(canon, c2, kinds, inv,
                                     jax.default_backend() != "tpu")
        outs = outs.reshape((len(inv),) + lead + (outs.shape[-1],))
    else:
        scales = jnp.asarray(spec.scale_tensor, coords.dtype)
        outs = jax.vmap(lambda s: _mscale2_trunk(params, coords, spec,
                                                 s))(scales)
    c = params["combiner"]
    mode = spec.combine_type
    if mode == "scale_weights":
        w = c["scale_weights"].reshape((-1,) + (1,) * (outs.ndim - 1))
        return jnp.sum(w * outs, axis=0)
    if mode == "freq_combine":
        cat = jnp.concatenate(list(outs), axis=-1)
        return linear(c["freq_1"], act.relu(linear(c["freq_0"], cat)))
    if mode == "both":
        w = c["scale_weights"].reshape((-1,) + (1,) * (outs.ndim - 1))
        cat = jnp.concatenate(list(w * outs), axis=-1)
        y = linear(c["freq_1"], act.relu(linear(c["freq_0"], cat)))
        return linear(c["refine_1"], act.relu(linear(c["refine_0"], y)))
    raise ValueError(mode)


# --- mscale_hier: hierarchical stages (bspline_mscale_hier.py) --------------

def mscale_hier_init(key, spec: INRSpec):
    nstages = len(spec.scale_tensor)
    params = {"stages": [], "heads": []}
    keys = jax.random.split(key, nstages)
    for stage in range(nstages):
        sk = jax.random.split(keys[stage], spec.hidden_layers + 2)
        layers = [winit.linear_params(sk[0], spec.in_features,
                                      spec.hidden_features, dtype=spec.dtype)]
        width_in = (spec.hidden_features * 2 if stage != 0
                    else spec.hidden_features)
        layers.append(winit.linear_params(sk[1], width_in,
                                          spec.hidden_features,
                                          dtype=spec.dtype))
        for i in range(spec.hidden_layers - 1):
            layers.append(winit.linear_params(sk[2 + i], spec.hidden_features,
                                              spec.hidden_features,
                                              dtype=spec.dtype))
        params["stages"].append(layers)
        # Heads registered as real params — the reference kept them in a plain
        # Python list, silently excluding them from model.parameters()
        # (bspline_mscale_hier.py:72,110); fixed here.
        params["heads"].append(winit.linear_params(
            sk[-1], spec.hidden_features, spec.out_features, dtype=spec.dtype))
    return params


def _canon_mscale_hier(params, spec: INRSpec):
    """Canonicalize the WHOLE hierarchical model as ONE chain for the fused
    real-MLP kernels (VERDICT round 1 #5: hier previously trained entirely
    through XLA autodiff).

    The chain state carries three lane groups: [trunk (h) | coords (d) |
    head-sum accumulator (o)].  Identity-basis lanes (real_mlp._basis_any)
    ferry the raw coords to each stage's first layer and accumulate the
    per-stage head outputs, so the stage recursion
    (bspline_mscale_hier.py:112-125: stage k concats its own first-layer
    features with stage k-1's trunk output; heads summed) becomes a plain
    layer sequence:

      stage 0:        [W0 | I_d | 0]  then HL x [[W,0,0],[0,I,0],[0,0,I]]
      stage k>0 (A):  x_prev->copy + head_{k-1} into acc; coords->x_in
                      (state widens to [x_in | x_prev | coords | acc])
      stage k>0 (B):  [x_in, x_prev] @ W1; coords/acc carried
      final linear:   [Whead_last ; 0 ; I_o], bias bhead_last

    The structural zero/identity blocks are constants, so native-param
    gradients fall out of jax.vjp through this function (the
    _make_real_step pattern)."""
    d, h, o = spec.in_features, spec.hidden_features, spec.out_features
    S = len(spec.scale_tensor)
    stages, heads = params["stages"], params["heads"]
    dt = stages[0][0]["w"].dtype
    I_d = jnp.eye(d, dtype=dt)
    I_h = jnp.eye(h, dtype=dt)
    I_o = jnp.eye(o, dtype=dt)
    m = h + d + o

    def lane_ab(s, b, carry_w):
        alpha = jnp.concatenate([jnp.full((h,), 1.0 / s, dt),
                                 jnp.ones((carry_w,), dt)])
        beta = jnp.concatenate([b / s, jnp.zeros((carry_w,), dt)])
        return alpha, beta

    layers = []
    s0 = spec.scale_tensor[0]
    # stage-0 first layer: coords -> [x | coords | acc=0]
    W = jnp.zeros((d, m), dt)
    W = W.at[:, :h].set(stages[0][0]["w"]).at[:, h:h + d].set(I_d)
    al, be = lane_ab(s0, stages[0][0]["b"], d + o)
    layers.append({"w": W, "alpha": al, "beta": be})

    def mid(lay, s):
        W = jnp.zeros((m, m), dt)
        W = (W.at[:h, :h].set(lay["w"])
             .at[h:h + d, h:h + d].set(I_d)
             .at[h + d:, h + d:].set(I_o))
        al, be = lane_ab(s, lay["b"], d + o)
        return {"w": W, "alpha": al, "beta": be}

    for lay in stages[0][1:]:
        layers.append(mid(lay, s0))

    for k in range(1, S):
        sk = spec.scale_tensor[k]
        # (A) widen: [x_prev | coords | acc] -> [x_in | x_prev | coords |
        # acc + head_{k-1}(x_prev)]
        W = jnp.zeros((m, h + m), dt)
        W = (W.at[:h, h:2 * h].set(I_h)
             .at[:h, 2 * h + d:].set(heads[k - 1]["w"])
             .at[h:h + d, :h].set(stages[k][0]["w"])
             .at[h:h + d, 2 * h:2 * h + d].set(I_d)
             .at[h + d:, 2 * h + d:].set(I_o))
        al = jnp.concatenate([jnp.full((h,), 1.0 / sk, dt),
                              jnp.ones((h + d + o,), dt)])
        be = jnp.concatenate([stages[k][0]["b"] / sk,
                              jnp.zeros((h + d,), dt),
                              heads[k - 1]["b"]])
        layers.append({"w": W, "alpha": al, "beta": be})
        # (B) contract: [x_in, x_prev] @ W1 (the reference's concat layer);
        # coords/acc carried
        W = jnp.zeros((h + m, m), dt)
        W = (W.at[:2 * h, :h].set(stages[k][1]["w"])
             .at[2 * h:2 * h + d, h:h + d].set(I_d)
             .at[2 * h + d:, h + d:].set(I_o))
        al, be = lane_ab(sk, stages[k][1]["b"], d + o)
        layers.append({"w": W, "alpha": al, "beta": be})
        for lay in stages[k][2:]:
            layers.append(mid(lay, sk))

    wf = jnp.zeros((m, o), dt)
    wf = wf.at[:h, :].set(heads[-1]["w"]).at[h + d:, :].set(I_o)
    return {"layers": layers,
            "final": {"w": wf, "b": heads[-1]["b"]}}


def _hier_kinds(spec: INRSpec):
    d, h, o = spec.in_features, spec.hidden_features, spec.out_features
    S = len(spec.scale_tensor)
    # layers per stage = first + second + max(hidden_layers-1, 0) extras
    # (mscale_hier_init mirrors bspline_mscale_hier.py:99-110)
    ntrunk = 2 + max(spec.hidden_layers - 1, 0)
    mid = (("qspline", h), ("identity", d + o))
    kinds = [mid] * ntrunk                         # stage 0
    for _ in range(1, S):
        kinds.append((("qspline", h), ("identity", h + d + o)))   # (A)
        kinds.extend([mid] * (ntrunk - 1))         # (B) + extras
    return tuple(kinds)


def mscale_hier_apply(params, coords, spec: INRSpec):
    use, _ = _use_fused(spec)
    if use:
        return _fused_real(params, coords, spec, _hier_kinds(spec),
                           _canon_mscale_hier(params, spec))
    outs = []
    x = coords
    for stage, s in enumerate(spec.scale_tensor):
        layers = params["stages"][stage]
        if stage == 0:
            for lp in layers:
                x = _bspline_layer(lp, x, s, "divide")
        else:
            # Stage k>0 (bspline_mscale_hier.py:112-122): first layer on the
            # raw coords, second on concat with the previous stage's trunk
            # output, remaining layers sequential.
            x_in = _bspline_layer(layers[0], coords, s, "divide")
            x = _bspline_layer(layers[1],
                               jnp.concatenate([x_in, x], axis=-1), s,
                               "divide")
            for lp in layers[2:]:
                x = _bspline_layer(lp, x, s, "divide")
        outs.append(linear(params["heads"][stage], x))
    return sum(outs)


# ===========================================================================
# Generic init for the plain real families
# ===========================================================================

def bspline_plain_init(key, spec: INRSpec):
    return _plain_mlp_init(key, spec)


def mscale_repin_init(key, spec: INRSpec):
    return _plain_mlp_init(key, spec)


# ===========================================================================
# One-pass fused train-step hooks (INR.step_grads; registered per family in
# registry.STEP_REGISTRY).  Each folds its family to the canonical
# (w, alpha, beta, basis) form and runs ops/pallas/real_mlp.real_step_fused
# — native-param gradients come back through jax.vjp of the fold.
# ===========================================================================

def _n_act_layers(spec):
    return spec.hidden_layers + 1


siren_step = _make_real_step(
    lambda spec: ("sine",) * _n_act_layers(spec), _canon_siren)

gauss_step = _make_real_step(
    lambda spec: ("gauss",) * _n_act_layers(spec),
    lambda p, spec: _canon_uniform(p, spec, "gauss", spec.scale,
                                   lambda b: spec.scale * b))

relu_step = _make_real_step(
    lambda spec: ("relu",) * _n_act_layers(spec),
    lambda p, spec: _canon_uniform(p, spec, "relu", 1.0, lambda b: b),
    pre=lambda c, spec: (act.posenc(c, posenc_num_frequencies(spec),
                                    spec.in_features)
                         if spec.pos_encode else c))

bspline_form_step = _make_real_step(
    lambda spec: ("qspline",) * _n_act_layers(spec),
    lambda p, spec: _canon_uniform(p, spec, "qspline", 1.0 / spec.scale,
                                   lambda b: b / spec.scale))

bspline_cubic_step = _make_real_step(
    lambda spec: ("cspline",) * _n_act_layers(spec),
    lambda p, spec: _canon_uniform(p, spec, "cspline", spec.scale,
                                   lambda b: b))

# bspline_knots: the De Boor recursion on the fixed knot vector
# (-1.5,-1.5,-1.5,-0.5,0.5,1.5,1.5,1.5) at degree 2 evaluates to exactly
# the quadratic B-spline bump ((z+1.5)^2/2, 0.75-z^2, (1.5-z)^2/2 on its
# three pieces, 0 outside) — the same function as the 'qspline' basis, so
# the family trains through the shared step kernel with alpha=1, beta=b
# (no sigma in this family's apply).  Pinned numerically in
# tests/test_pallas_real.py::test_knots_step_matches_autodiff.
bspline_knots_step = _make_real_step(
    lambda spec: ("qspline",) * _n_act_layers(spec),
    lambda p, spec: _canon_uniform(p, spec, "qspline", 1.0, lambda b: b))

bspline_srelu_step = _make_real_step(
    lambda spec: ("srelu",) * _n_act_layers(spec),
    lambda p, spec: _canon_uniform(p, spec, "srelu", spec.scale,
                                   lambda b: spec.scale * b))

def _canon_mscale1(params, spec):
    """mscale_1 as ONE canonical chain: the reference's first layer applies
    a SHARED linear to scale*x per scale and concatenates RAW (no basis —
    the B-spline application is commented out, bspline_mscale_1.py:80-87),
    so layer 0 is a single wide 'identity'-basis linear with the scales
    folded into stacked weight copies: [s_1 W | s_2 W | ...].  The trunk
    layers are standard 'pre'-mode quadratic-spline layers (B(W(sigma x)) =
    B(sigma (x W) + b) for scalar sigma)."""
    W = params["first"]["w"]
    b = params["first"]["b"]
    w0 = jnp.concatenate([jnp.float32(s) * W for s in spec.scale_tensor],
                         axis=1)
    b0 = jnp.concatenate([b] * len(spec.scale_tensor))
    layers = [{"w": w0, "alpha": jnp.ones((w0.shape[1],), W.dtype),
               "beta": b0}]
    names = ["trunk_in"] + [f"hidden_{i}"
                            for i in range(max(spec.hidden_layers - 2, 0))]
    for nm in names:
        w = params[nm]["w"]
        layers.append({"w": w,
                       "alpha": jnp.full((w.shape[1],), spec.scale,
                                         w.dtype),
                       "beta": params[nm]["b"]})
    return {"layers": layers, "final": dict(params["final"])}


mscale1_step = _make_real_step(
    lambda spec: ("identity",)
    + ("qspline",) * (1 + max(spec.hidden_layers - 2, 0)),
    _canon_mscale1)

mscale_repin_step = _make_real_step(
    lambda spec: ("qspline",) * _n_act_layers(spec),
    lambda p, spec: _canon_uniform(p, spec, "qspline", spec.scale,
                                   lambda b: spec.scale * b),
    pre=_repin_expand)

mscale_hl_step = _make_real_step(
    lambda spec: ("qspline",) * (max(spec.hidden_layers - 1, 0) + 2),
    _canon_mscale_hl, use_ok=_mscale_hl_fusable)

# Hierarchical stages as ONE canonical chain (identity lanes carry coords +
# the head-sum accumulator, _canon_mscale_hier): the one-pass train-step
# kernel applies directly.
mscale_hier_step = _make_real_step(_hier_kinds, _canon_mscale_hier)


def mscale2_step(params, coords, target, spec: INRSpec, *, nvalid=None,
                 denom=None, gt=None, want_metrics=False):
    """mscale_2 training step.

    combine_type='freq_combine' (the reference's hardcoded forward mode,
    bspline_mscale_2.py:173) runs the r5 ONE-PASS kernel: all per-scale
    trunks + the combiner + loss-grad + backward in a single pallas_call
    (ops/pallas/mscale2_step.py; VERDICT r4 #2 — the combiner's row-block
    mixing was an artifact of M-stacking, solved by keeping the scales as
    independent chains within one grid step and padding the combiner GEMM's
    per-scale row blocks).  Other combine modes fall back to autodiff over
    the scale-stacked fused apply (one fwd kernel + XLA combiner + one bwd
    kernel through the custom VJP)."""
    use, interpret = _use_fused(spec)
    if not use:
        return None
    if spec.combine_type == "freq_combine":
        from wire_tpu.ops.pallas.mscale2_step import mscale2_step_fused
        kinds = ("qspline",) * (spec.hidden_layers + 1)
        inv = tuple(1.0 / s for s in spec.scale_tensor)
        canon, vjp = jax.vjp(
            lambda p: _canon_uniform(p, spec, "qspline", 1.0, lambda b: b),
            {k: v for k, v in params.items() if k != "combiner"})
        out = mscale2_step_fused(
            canon, params["combiner"], coords, target, kinds, inv,
            nvalid=nvalid, denom=denom, gt=gt, want_metrics=want_metrics,
            interpret=interpret,
            precision=getattr(spec, "gemm_precision", "default"))
        if want_metrics:
            pred, dcanon, dcomb, sums = out
        else:
            pred, dcanon, dcomb = out
        grads = dict(vjp(dcanon)[0])
        # unused combiner heads under freq_combine (scale_weights, refine_*;
        # built-but-dead in the reference too, bspline_mscale_2.py:124)
        # get structural zero grads
        c = params["combiner"]
        grads["combiner"] = {
            "scale_weights": jnp.zeros_like(c["scale_weights"]),
            "freq_0": dcomb["freq_0"], "freq_1": dcomb["freq_1"],
            "refine_0": jax.tree.map(jnp.zeros_like, c["refine_0"]),
            "refine_1": jax.tree.map(jnp.zeros_like, c["refine_1"]),
        }
        if want_metrics:
            return pred, grads, sums
        return pred, grads
    n, c = target.shape
    dn = float(n * c) if denom is None else denom
    mask = None
    if nvalid is not None:
        mask = (jnp.arange(n)[:, None] < nvalid)

    def loss_fn(p):
        pred = mscale2_apply(p, coords, spec)
        err = pred - target
        if mask is not None:
            err = err * mask.astype(pred.dtype)
        return jnp.sum(err * err) / dn, pred

    (_, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    if not want_metrics:
        return pred, grads
    err_t = pred - target
    err_g = err_t if gt is None else pred - gt
    if mask is not None:
        m = mask.astype(pred.dtype)
        err_t = err_t * m
        err_g = err_g * m
    return pred, grads, (jnp.sum(err_t * err_t), jnp.sum(err_g * err_g))
