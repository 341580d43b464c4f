from dflo_tpu.stab.indicator import make_shock_indicator  # noqa: F401
from dflo_tpu.stab.limiter import make_tvb_limiter, minmod  # noqa: F401
from dflo_tpu.stab.positivity import make_positivity_limiter  # noqa: F401
