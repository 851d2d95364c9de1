from fisr_tpu.infer import sharded, tiled  # noqa: F401
