from fisr_tpu.train import checkpoint, losses, pwc_loss, schedule, trainer  # noqa: F401
