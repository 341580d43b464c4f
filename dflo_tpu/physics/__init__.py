from dflo_tpu.physics import euler, fluxes  # noqa: F401
