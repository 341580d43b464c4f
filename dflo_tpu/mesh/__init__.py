from dflo_tpu.mesh.cartesian import CartesianMesh  # noqa: F401
