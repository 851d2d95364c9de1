from fisr_tpu.utils import flow_viz, profiling  # noqa: F401
