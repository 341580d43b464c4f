from dflo_tpu.utils.profiling import Timer, scope  # noqa: F401
