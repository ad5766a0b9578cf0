"""sph_taichi_tpu — a TPU-native SPH framework (JAX / XLA / Pallas).

A ground-up redesign of the capabilities of the SPH_Taichi reference
(erizmr/SPH_Taichi) for TPU hardware:

- Scene-JSON driven simulations with the reference's exact schema
  (``Configuration`` / ``FluidBlocks`` / ``RigidBlocks`` / ``RigidBodies``).
- WCSPH and DFSPH pressure solvers with cubic-spline kernels, Akinci
  rigid-fluid coupling (one-way and two-way), shape-matching rigid bodies,
  and symplectic-Euler integration.
- Neighbor search as a fully functional XLA pipeline: flattened uniform
  grid, stable sort by cell id, prefix offsets, fixed-capacity neighbor
  lists.  No atomics anywhere — every scatter of the reference is
  reformulated as a deterministic gather/segment reduction.
- Whole steps are a single ``jax.jit`` program; DFSPH convergence loops run
  on-device via ``lax.while_loop`` (the reference syncs a scalar to host
  every solver iteration).
- Multi-chip scaling by spatial slab decomposition over a
  ``jax.sharding.Mesh`` with ``shard_map`` + ``lax.ppermute`` halo
  exchange (see ``sph_taichi_tpu.parallel``).

Public entry points:
    ``SimConfig``        — scene JSON loader (config.py)
    ``build_scene``      — scene → (SimParams, Particles, SceneObjects)
    ``build_solver``     — simulationMethod → WCSPH / DFSPH solver
"""

from sph_taichi_tpu.config import SimConfig
from sph_taichi_tpu.scene import build_scene
from sph_taichi_tpu.state import Particles, SimParams, SimState

__version__ = "0.1.0"


def build_solver(params, scene=None):
    """Instantiate the solver selected by ``simulationMethod``.

    Mirrors ParticleSystem.build_solver (reference particle_system.py:214-221):
    0 -> WCSPH, 4 -> DFSPH, else NotImplementedError.
    Additionally supports 2 -> IISPH (the reference ships it stale/unwired;
    here the IISPH math is ported onto the live engine mechanism) and
    1 -> PCISPH (the reference has it only in the legacy 2D engine; the
    prediction-correction loop is ported onto the 3D engine mechanism,
    models/pcisph.py).  2D PCISPH also lives in legacy2d.py, matching the
    reference's legacy engine.
    """
    method = params.simulation_method
    if method == 0:
        from sph_taichi_tpu.models.wcsph import WCSPHSolver
        return WCSPHSolver(params)
    elif method == 1:
        from sph_taichi_tpu.models.pcisph import PCISPHSolver
        return PCISPHSolver(params)
    elif method == 4:
        from sph_taichi_tpu.models.dfsph import DFSPHSolver
        return DFSPHSolver(params)
    elif method == 2:
        from sph_taichi_tpu.models.iisph import IISPHSolver
        return IISPHSolver(params)
    else:
        raise NotImplementedError(
            f"Solver type {method} has not been implemented.")
