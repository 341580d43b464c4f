from dflo_tpu.parallel.sharding import (  # noqa: F401
    cell_sharding, device_mesh, device_mesh_1d, flat_sharding, shard_state,
    shard_state_flat)
