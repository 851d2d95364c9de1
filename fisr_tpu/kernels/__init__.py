from fisr_tpu.kernels import cost_volume_pallas, res_block_pallas  # noqa: F401
