from como_tpu.geometry import lie, camera, transforms, depth, affine  # noqa: F401
