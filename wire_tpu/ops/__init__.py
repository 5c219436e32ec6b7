from wire_tpu.ops import resample  # noqa: F401
