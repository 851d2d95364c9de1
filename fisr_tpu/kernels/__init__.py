from fisr_tpu.kernels import res_block_pallas  # noqa: F401
