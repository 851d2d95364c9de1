from fisr_tpu.core import mesh  # noqa: F401
