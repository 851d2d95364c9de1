from fisr_tpu.data import flo, matio, png_io  # noqa: F401
