from dflo_tpu.ops import quadrature, basis  # noqa: F401
