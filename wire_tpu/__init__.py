"""wire_tpu — a TPU-native implicit-neural-representation (INR) fitting framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the WIRE research
fork (wavelet / multiscale-B-spline INRs fit to individual signals through
differentiable forward operators), built for TPU:

- ``wire_tpu.nn``        functional INR model zoo (complex Gabor, sine, Gauss,
                         ReLU+posenc, MFN, quadratic/cubic B-spline and the
                         multiscale B-spline composites) as pure pytree
                         init/apply pairs.
- ``wire_tpu.ops``       compute ops: fused Pallas MLP kernels, differentiable
                         rotation/Radon, grid-sample, area resampling.
- ``wire_tpu.signals``   coordinate grids, sensor noise model, image/volume IO.
- ``wire_tpu.operators`` differentiable forward operators (identity, Radon,
                         downsample, warp+downsample, volume probe).
- ``wire_tpu.train``     the jitted trainer, configs (all reference presets),
                         metrics (reference-formula PSNR, SSIM, IoU), logging.
- ``wire_tpu.dist``      multi-device coordinate sharding over a jax Mesh.
- ``wire_tpu.native``    host-side C++ (marching cubes, registration) with
                         pure-python fallbacks.
- ``wire_tpu.apps``      task drivers: denoise/representation, CT, SISR,
                         multi-frame SR, 3D occupancy.
"""

__version__ = "0.1.0"

from wire_tpu.nn import registry as models  # noqa: F401
