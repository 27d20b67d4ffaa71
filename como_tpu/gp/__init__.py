from como_tpu.gp import kernels, predictor, distill, sampler  # noqa: F401
