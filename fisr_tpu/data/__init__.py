from fisr_tpu.data import dataset, flo, matio, png_io, synth  # noqa: F401
