from wire_tpu.nn import activations, init, layers, models, registry  # noqa: F401
from wire_tpu.nn.registry import get_inr, MODEL_REGISTRY  # noqa: F401
