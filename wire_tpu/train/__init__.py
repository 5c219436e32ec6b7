from wire_tpu.train import metrics  # noqa: F401
