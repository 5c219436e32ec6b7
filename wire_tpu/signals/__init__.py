from wire_tpu.signals import coords, image, noise  # noqa: F401
