"""Test harness config: run on CPU with 8 virtual devices and float64.

Multi-device tests emulate a TPU mesh on the host, per the multi-chip
validation strategy (SURVEY.md §4): the same problem must give equal results
on 1 vs N devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's sitecustomize registers the 'axon' TPU-tunnel backend and pins
# JAX_PLATFORMS=axon; the env var is consumed before conftest runs, so the
# config must be updated post-import to pin tests to the virtual-device CPU
# mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
