from wire_tpu.operators.radon import radon  # noqa: F401
from wire_tpu.operators import forward  # noqa: F401
