from dflo_tpu.solver.spatial import BoundarySide, make_rhs  # noqa: F401
from dflo_tpu.solver.rk import ssp_rk_step, rk_coeffs, compute_dt  # noqa: F401
