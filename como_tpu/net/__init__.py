from como_tpu.net import analytic_prior, depthcov, unet  # noqa: F401
