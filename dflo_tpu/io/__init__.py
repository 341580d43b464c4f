from dflo_tpu.io.vtk import write_vtu, derived_fields  # noqa: F401
from dflo_tpu.io.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
