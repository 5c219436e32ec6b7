from wire_tpu.dist.mesh import make_mesh  # noqa: F401
from wire_tpu.dist.fitter import fit_pointwise_sharded  # noqa: F401
