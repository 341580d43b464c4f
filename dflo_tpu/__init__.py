"""dflo_tpu — TPU-native discontinuous-Galerkin solver for the 2-D compressible
Euler equations on quadrilateral meshes.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
C++/deal.II code cpraveen/dflo (see SURVEY.md): Qk nodal (Gauss / GLL) and Pk
modal Legendre bases, Lax-Friedrichs / Steger-Warming / Roe / HLLC / KFVS /
KEP numerical fluxes, TVB + minmax + positivity limiters, KXRCF / u2 /
residual shock indicators, MOOD stabilization, SSP-RK and matrix-free implicit
time stepping, well-balanced gravity, and SPMD distribution over TPU meshes
via jax.sharding (halo exchange over ICI in place of the reference's
MPI/p4est ghost layer).

State layout convention: conserved variables are stored SoA with the
component axis leading, ``U[4, K, Ny, Nx]`` — components ordered
(x-momentum, y-momentum, density, energy) to match the reference
(src/equation.h:26-28), K = per-cell basis coefficients, and the trailing
cell grid dims are the ones sharded across devices.
"""

__version__ = "0.1.0"

from dflo_tpu.physics import euler  # noqa: F401
