from como_tpu.data import synthetic  # noqa: F401
