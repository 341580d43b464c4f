"""Domain decomposition over a TPU device mesh.

TPU-native replacement for the reference's entire MPI/p4est distribution layer
(src_mpi tree, SURVEY.md §2.2/§5.8): the p4est cell partition with a ghost
layer (src_mpi/claw.cc:59-76, 331-340) becomes a 2-D ``jax.sharding.Mesh``
over the (cell-row, cell-column) axes of the state array
``u[4, K, ny, nx]``:

- ghost refresh (`update_ghost_values`, src_mpi/claw.cc:793): the interior
  face slices and `jnp.roll` shifts in the residual/limiter compile to XLA
  collective-permutes of one face-trace slab over ICI — O(boundary) bytes,
  exactly the halo pattern;
- scatter-add `compress` (src_mpi/assemble_explicit.cc:580): avoided by
  design — each interface flux is computed once and applied to both sides
  with dense shifted adds, so no reverse communication exists;
- global reductions (`MPI::min` dt, src_mpi/claw.cc:579): `jnp.min/sum`
  lower to psum/pmin collectives under GSPMD.

Because the solver is written as whole-domain array ops, single-chip and
multi-chip runs are the SAME program: distribution is applied by placing the
state on a NamedSharding and letting GSPMD partition the jitted step.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_mesh(shape: tuple[int, int] | None = None,
                devices=None) -> Mesh:
    """Build a 2-D ('dy', 'dx') device mesh for domain decomposition.

    shape defaults to the most-square factorization of the device count
    (mirroring p4est's balanced partition goal)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        a = int(np.sqrt(n))
        while n % a:
            a -= 1
        shape = (a, n // a)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("dy", "dx"))


def device_mesh_multislice(n_slices: int, shape: tuple[int, int] | None = None,
                           devices=None) -> Mesh:
    """Build a 3-D ('slice', 'dy', 'dx') device mesh for multi-slice
    (DCN-connected) TPU pods.

    The reference scales out with one flat MPI communicator (p4est assigns
    ranks irrespective of network topology, src_mpi/claw.cc:59-76); on TPU
    the slice boundary is 1-2 orders of magnitude slower than ICI, so the
    slice axis must be OUTERMOST and carry the least traffic.  Splitting the
    domain's y axis over ('slice', 'dy') does exactly that: each slice owns
    a contiguous band of cell rows, and the only cross-slice communication
    is the one face-trace halo row between adjacent bands (plus scalar
    reductions) — O(nx) bytes per step over DCN while all other halos ride
    ICI.

    ``jax.devices()`` orders devices slice-major under multi-slice
    deployments, so the plain reshape below places consecutive-slice
    devices on the same 'slice' coordinate.  Untestable on real DCN here
    (single-chip environment); validated on the virtual CPU mesh
    (tests/test_parallel.py) where the collective pattern — not the wire —
    is what's checked."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % n_slices:
        raise ValueError(f"{n} devices not divisible into {n_slices} slices")
    per = n // n_slices
    if shape is None:
        a = int(np.sqrt(per))
        while per % a:
            a -= 1
        shape = (a, per // a)
    if shape[0] * shape[1] != per:
        raise ValueError(f"per-slice shape {shape} != {per} devices/slice")
    arr = np.asarray(devices).reshape((n_slices,) + tuple(shape))
    return Mesh(arr, ("slice", "dy", "dx"))


def compatible_shape(n: int, ny: int, nx: int,
                     n_slices: int = 1) -> tuple[int, int] | None:
    """Most-square (a, b) with a*b = n/n_slices whose folded row split
    n_slices*a divides ny and whose column split b divides nx — so
    `cell_sharding` can place a [.., ny, nx] state without padding.
    Returns None if no factorization divides the grid."""
    per = n // n_slices
    if n % n_slices:
        raise ValueError(f"{n} devices not divisible into {n_slices} slices")
    best = None
    for a in range(1, per + 1):
        if per % a:
            continue
        b = per // a
        if ny % (n_slices * a) == 0 and nx % b == 0:
            score = abs(a - b)
            if best is None or score < best[0]:
                best = (score, (a, b))
    return best[1] if best else None


def mesh_grid_shape(mesh: Mesh) -> tuple[int, int]:
    """Effective (DY, DX) cell-grid decomposition of a 2-D or 3-D device
    mesh: all leading axes fold into the y split, the last axis is x."""
    shape = mesh.devices.shape
    return int(np.prod(shape[:-1])), int(shape[-1])


def mesh_y_axes(mesh: Mesh) -> tuple[str, ...]:
    """The mesh axis names the domain's y (cell-row) axis is split over —
    ('dy',) for a 2-D mesh, ('slice', 'dy') for a multi-slice mesh."""
    return tuple(mesh.axis_names[:-1])


def cell_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of u[4, K, ny, nx]: cells split over the device mesh,
    components/DoFs replicated (the owner-computes layout of §5.8).
    On a 3-D ('slice', 'dy', 'dx') mesh the row axis folds ('slice', 'dy')
    together, keeping cross-slice traffic to one halo row."""
    return NamedSharding(
        mesh, P(None, None, mesh_y_axes(mesh), mesh.axis_names[-1]))


def shard_state(u, mesh: Mesh):
    """Place a state array onto the device mesh."""
    return jax.device_put(u, cell_sharding(mesh))


# ---------------------------------------------------------------------------
# Flat-cell (unstructured) decomposition: u[4, K, N] split over one axis.
# The face-gather/scatter tables become GSPMD gather collectives — the
# all-to-neighbor exchange of the reference's distributed Triangulation
# ghost layer (src_mpi/claw.cc:331-340) without an explicit partitioner.
# ---------------------------------------------------------------------------

def device_mesh_1d(devices=None) -> Mesh:
    """1-D ('cells',) device mesh for the flat-cell unstructured layout."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("cells",))


def flat_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of u[4, K, N]: the cell axis split, the rest replicated.

    Works on ANY device mesh: a 1-D ('cells',) mesh splits N directly; a
    2-D ('dy', 'dx') (or 3-D multi-slice) mesh splits N over the folded
    product of all axes — the two-axis decomposition of the flat-cell
    path.  Pair with UnstructuredQuadMesh.morton_order() so the equal
    splits are geometrically compact (the p4est Morton-partition analog,
    src_mpi/claw.cc:59-76); GSPMD then lowers the face-gather tables to
    neighbor-local collectives instead of all-to-all."""
    return NamedSharding(mesh, P(None, None, tuple(mesh.axis_names)))


def shard_state_flat(u, mesh: Mesh):
    """Place a flat-cell state array onto the 1-D device mesh."""
    return jax.device_put(u, flat_sharding(mesh))
