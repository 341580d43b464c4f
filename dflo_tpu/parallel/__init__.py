from dflo_tpu.parallel.sharding import (  # noqa: F401
    cell_sharding, device_mesh, shard_state)
