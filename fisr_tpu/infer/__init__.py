from fisr_tpu.infer import device, sharded, tiled  # noqa: F401
