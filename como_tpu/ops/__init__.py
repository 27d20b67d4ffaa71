from como_tpu.ops import coords, interp, image, linalg  # noqa: F401
