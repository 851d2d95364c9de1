from fisr_tpu.convert import tf_import  # noqa: F401
