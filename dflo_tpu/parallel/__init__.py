from dflo_tpu.parallel.sharding import (  # noqa: F401
    cell_sharding, device_mesh, device_mesh_1d, device_mesh_multislice,
    flat_sharding, mesh_grid_shape, mesh_y_axes, shard_state,
    shard_state_flat)
