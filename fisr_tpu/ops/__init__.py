from fisr_tpu.ops import color, conv, cost_volume, metrics, resize, seq, warp  # noqa: F401
