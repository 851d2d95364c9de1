from fisr_tpu.kernels import cost_volume_pallas  # noqa: F401
