from dflo_tpu.config.prm import parse_prm, parse_prm_file  # noqa: F401
from dflo_tpu.config.expressions import compile_expression  # noqa: F401
from dflo_tpu.config.params import AllParameters  # noqa: F401
