from fisr_tpu.models import fisrnet, pwcnet  # noqa: F401
