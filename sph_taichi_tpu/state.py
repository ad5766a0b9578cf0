"""Particle state and static simulation parameters.

The reference stores particles as a set of Taichi fields plus a full
duplicate buffer set used by its counting sort (particle_system.py:102-140).
Here the particle store is a single immutable pytree of jnp arrays (SoA);
"sorting" is a functional permutation of the whole pytree, so no explicit
double-buffering is needed and every step is a pure function
``SimState -> SimState`` that XLA can fuse end to end.

Array capacity is padded to a multiple of PAD_MULTIPLE for TPU tiling;
padding particles carry ``material == MATERIAL_PAD`` and are parked in a
virtual overflow grid cell so they are invisible to neighbor search.
"""

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

# Material codes (reference particle_system.py:30-31). PAD is ours.
MATERIAL_SOLID = 0
MATERIAL_FLUID = 1
MATERIAL_PAD = -1

PAD_MULTIPLE = 512


class Particles(NamedTuple):
    """SoA particle store (reference particle_system.py:102-117).

    All per-particle arrays have leading dim n_pad (capacity).  ``density``
    of solid particles keeps its scene-assigned value forever, exactly like
    the reference (solids are skipped by compute_densities).
    """
    object_id: jnp.ndarray    # i32[N]
    x: jnp.ndarray            # f32[N,3] position
    x0: jnp.ndarray           # f32[N,3] rest position (reference x_0)
    v: jnp.ndarray            # f32[N,3] velocity
    acc: jnp.ndarray          # f32[N,3] acceleration
    m_V: jnp.ndarray          # f32[N]   volume (boundary particles get Akinci volume)
    m: jnp.ndarray            # f32[N]   mass = m_V0 * density at creation
    density: jnp.ndarray      # f32[N]
    pressure: jnp.ndarray     # f32[N]
    material: jnp.ndarray     # i32[N]  1=fluid 0=solid -1=padding
    is_dynamic: jnp.ndarray   # i32[N]
    color: jnp.ndarray        # i32[N,3]
    # DFSPH extras (reference particle_system.py:115-117); None for WCSPH.
    dfsph_factor: Optional[jnp.ndarray] = None   # f32[N]
    density_adv: Optional[jnp.ndarray] = None    # f32[N]
    # DFSPH kappa warm-start accumulators (round 5, opt-in via
    # dfsph_warm_start; the reference carries this as a TODO,
    # DFSPH.py:236-311 region).  Persist across substeps, so they ride
    # the per-step sort — only allocated when the knob is on.
    kappa_v: Optional[jnp.ndarray] = None        # f32[N] divergence solver
    kappa_p: Optional[jnp.ndarray] = None        # f32[N] pressure solver

    @property
    def n(self):
        return self.x.shape[0]

    def is_fluid(self):
        return self.material == MATERIAL_FLUID

    def is_solid(self):
        return self.material == MATERIAL_SOLID

    def is_static_rigid(self):
        # reference particle_system.py:302-303
        return (self.material == MATERIAL_SOLID) & (self.is_dynamic == 0)

    def is_dynamic_rigid(self):
        # reference particle_system.py:306-308
        return (self.material == MATERIAL_SOLID) & (self.is_dynamic != 0)


class SimState(NamedTuple):
    """Full dynamic simulation state threaded through the jitted step."""
    p: Particles
    rigid_rest_cm: jnp.ndarray   # f32[n_objects, 3] rest center-of-mass per object id
    dt: jnp.ndarray              # f32[] current timestep (traced: enables adaptive CFL dt)
    t: jnp.ndarray               # f32[] simulated time
    step_count: jnp.ndarray      # i32[]


@dataclasses.dataclass(frozen=True)
class SimParams:
    """Static (compile-time) simulation parameters.

    Derived constants follow reference particle_system.py:33-46:
    support_radius = 4*particle_radius, particle_diameter = 2r,
    m_V0 = 0.8 * diameter**dim, grid cell = support_radius,
    padding = one grid cell.
    """
    dim: int
    particle_radius: float
    density0: float
    gravity: tuple                # (3,)
    dt0: float                    # timeStepSize from scene
    stiffness: float              # WCSPH Tait EOS
    exponent: float               # WCSPH Tait EOS
    simulation_method: int
    domain_start: tuple
    domain_end: tuple
    # particle counts
    n_particles: int              # real particles
    n_fluid: int
    n_solid: int
    n_pad: int                    # array capacity (>= n_particles, tile multiple)
    # object/rigid bookkeeping (static python data)
    num_objects: int              # max object id + 1
    rigid_body_ids: tuple         # object ids that are rigid bodies/blocks
    dynamic_rigid_ids: tuple      # subset that is dynamic (order = reference iteration order)
    # tunables (framework-specific; not in reference)
    neighbor_cap: int = 64        # K: max stored neighbors per particle
    cell_cap: int = 32            # M: max particles fetched per grid cell
    backend: str = "auto"         # pair engine: "auto" | "gather" | "pallas"
    # Round-3 measured schedule (dragon evolved state, one v5e):
    #   z6/w128/cb64 (round-2 default): 109.8 ms/step, rising with
    #   occupancy; z4/w64/cb32: 62.4 ms/step, FLAT across 120 steps
    #   (narrow sheeted windows absorb occupancy growth where wide
    #   static windows paid everywhere).  Round 2's "narrow tiles are
    #   slower" finding (z2/w64) kept CB=64 center sublanes fixed and was
    #   measuring 75% center-sublane waste, not lane-width cost — CB must
    #   scale with the z_batch*8 expected batch population.
    # z16/w192 remains faster on isolated traversals but full-step
    # programs with it fault (TPU INTERNAL, unresolved; see CLAUDE.md).
    window_cap: int = 64          # pallas: lanes per (z_batch+2)-cell window
    row_cap: int = 1024           # pallas: max particles per grid row
    z_batch: int = 4              # pallas: z-cells per center tile
    center_block: int = 32        # pallas: center sublanes per pass (CB)
    span_cap: int = 6144          # pallas: lanes per (G+2)-row y-span DMA
    group_cap: int = 8192         # pallas: particles per row-group (output acc)
    rows_per_instance: int = 8    # pallas: grid rows per kernel instance
    assemble: str = "roll"        # pallas: window assembly ("roll" | "slab")
    # v3 block engine (ops/pallas_blocks.py) knobs
    blocks_rows: int = 2          # Bx: grid rows per instance (x extent).
    #                               Bigger B amortizes per-instance fixed
    #                               cost ((B+2)^2 windows / B^2 own cells)
    #                               at the price of wider pair-math tiles
    blocks_rows_y: int = 0        # By: iy rows per instance (0 = Bx).
    #                               Growing By alone keeps the pair-math
    #                               half-tile at 3*(Bx+2)*WC lanes while
    #                               amortizing the per-instance floor —
    #                               the asymmetric-block round-4 lever
    blocks_groups_cap: int = 0    # instance compaction: kernel grid size
    #                               (occupied INSTANCES only; 0 = off;
    #                               an instance is groups_per_inst
    #                               iy-adjacent groups, so this equals
    #                               the round-4 occupied-groups cap when
    #                               groups_per_inst == 1).  ~70% of
    #                               dragon's groups are empty at t=0 —
    #                               compaction drops their per-instance
    #                               setup cost.  Sized by scene.py from
    #                               the t=0 footprint with the standard
    #                               margin; overflow is FATAL (dropped
    #                               instances = unwritten output rows,
    #                               NaN-poisoned)
    blocks_groups_per_inst: int = 1  # G: iy-adjacent BxBy groups per
    #                               kernel instance (round 5).  Their
    #                               per-column HBM spans are ADJACENT
    #                               rid ranges (iy-minor sorted order
    #                               within one ix row), so one union
    #                               span DMA per column feeds all G
    #                               groups: span descriptors, SMEM
    #                               table fetches, countdown-plane DMAs
    #                               and grid sequencing all drop ~G x —
    #                               the attack on the measured
    #                               descriptor-bound DMA/scaffold floor
    #                               (12.75 ms dragon / 63.6 armadillo,
    #                               j212/j219).  Pair-math tiles are
    #                               UNCHANGED (the member loop runs each
    #                               group's own windows).  Sized by
    #                               scene.py under the VMEM budget.
    blocks_z_batch: int = 2       # z-cells per center batch (Z).
    # Z=2 is the measured optimum (z4/z8 flat-to-worse r4; Z=1 is 40%
    # SLOWER, batch-count bound, j304).  DEVICE HAZARD: Z=3 kernel-
    # faulted the v5e TPU worker twice (j303) though its semantics are
    # interpret-exact (test_block_solver_equivalence_z_batch) — prefer
    # even Z on real hardware.
    blocks_window_cap: int = 32   # lanes per (Z+2)-cell window (WC)
    blocks_span_cap: int = 4096   # lanes per 4-row ix-column span DMA
    # (sized for EVOLVED occupancy, not t=0: rows in both headline scenes
    # reach ~864 particles as fluid crosses cell planes, so 4-row spans
    # reach ~3456; 3072 silently clipped them at the old threshold)
    blocks_col_cap: int = 2048    # particles per own ix-column (out half)
    blocks_dma_chunk: int = 0     # span-DMA chunk lanes (multiple of 128;
    #                               0 or >= span_cap disables chunking).
    #                               When set, a group ships only
    #                               ceil(len/chunk) chunks of its ACTUAL
    #                               span instead of the cap-sized slab.
    #                               DEFAULT OFF — measured negative (j224/
    #                               j225, device): byte savings (0.46x
    #                               dragon, 0.19x DFSPH, j222) are
    #                               invisible because the span DMA floor
    #                               is descriptor/issue bound, not byte
    #                               bound; the per-chunk fori_loop adds
    #                               scalar-pipe work where the kernel is
    #                               already scalar-bound (dragon NEUTRAL
    #                               39.6-40.7 at chunk 1024/512; DFSPH
    #                               510-617 vs 354-371 ms/step SLOWER at
    #                               chunk 1024, same 4+1 iters)
    blocks_reduce: str = "sum"    # pair-sum reduction: "sum" (VPU roll
    #                               tree), "dot" (MXU dot_general of the
    #                               masked per-pair products against the
    #                               candidate validity column — identical
    #                               addends, MXU accumulation order),
    #                               "decomp" (radial outputs as xi*S0-Sx
    #                               from one coefficient row — fastest,
    #                               position-scale cancellation changes
    #                               rounding; see pallas_blocks.py),
    #                               "ones" (standard-orientation matmul
    #                               against a constant ones rhs)
    blocks_reduce_prec: str = "highest"  # dot_general precision for the
    #                               MXU reduce modes ("highest"|"default")
    # per-object-id constants (round 5): material / creation density /
    # is_dynamic are single-valued per object, so the per-particle
    # fields material, is_dynamic, m (= m_V0 * creation density) and
    # density (solid rows keep creation density forever; fluid rows are
    # fully recomputed by compute_densities before any read in every
    # solver's substep) need not ride the per-step 14-operand sort
    # network — bin_and_sort drops them as transients and restores them
    # from these tables via tiny static lookups (j241: the sort alone
    # is 7.1 ms/step at dragon scale, ~2x the round-3 attribution).
    # Empty tuples disable the optimization (scene.py sets them only
    # when every object_id is single-valued).
    obj_material: tuple = ()
    obj_density0: tuple = ()
    obj_is_dynamic: tuple = ()
    obj_m0: tuple = ()            # creation m per object, tabled VERBATIM
    #                               (recomputing m_V0*density0 lands 1 ulp
    #                               off creation's f64-multiply-then-cast
    #                               chain and broke golden bitwise parity)
    dfsph_warm_start: bool = False  # kappa warm start across substeps
    #                               (round 5, the reference's own TODO):
    #                               each solver pre-applies half of last
    #                               substep's accumulated stiffness and
    #                               converges in fewer Jacobi iterations.
    #                               Changes iteration trajectories, so
    #                               OFF by default; requires the kappa_v/
    #                               kappa_p state fields (scene.py
    #                               allocates them when this is set).
    #                               Single-device only (the shard pack
    #                               drops the kappa fields).
    blocks_sched: str = "ctr_outer"  # blocks inner-loop scheduler:
    #                               "sheet_outer" (rounds 3-4: candidate
    #                               sheet assembled once, all center
    #                               sheets re-swept per window sheet) or
    #                               "ctr_outer" (round 5 DEFAULT:
    #                               macro-group of blocks_sheet_group
    #                               sheets assembled once, window sheets
    #                               INNER with per-piece (RH, 128)
    #                               register accumulators — cross-lane
    #                               reduce trees, center assembly, and
    #                               out_scr read-modify-writes drop to
    #                               once per center sheet).  Device A/B
    #                               j252/j253: dragon 37.6 vs 38.2,
    #                               armadillo 149.3 vs 152.1 ms/step.
    #                               Falls back to sheet_outer when
    #                               blocks_reduce != "sum" or the
    #                               chunked span DMA is on.
    blocks_sheet_group: int = 4   # ctr_outer: window sheets per macro
    #                               group (VMEM cand scratch rows =
    #                               group * f_pad; batches wider than
    #                               group*WC lanes accumulate across
    #                               macro groups through out_scr)
    blocks_tile: str = "half"     # pair-math tile granularity: "half"
    #                               (2 tiles of (2*CSL, 12*WC) per center
    #                               sheet) or "quarter" (4 of (CSL, 9*WC):
    #                               each own row drops its dead ci column
    #                               — 25% less padded pair math for 3
    #                               static slices + a concat per quarter)
    # v4 slot-dense engine (ops/pallas_slots.py) knobs
    slot_layers: int = 4          # dense layers (capacity = 8*layers/cell;
    #                               4 matches the default cell_cap of 32 —
    #                               evolved occupancy overruns 16/cell)
    # spatial sharding (parallel/sharding.py): local extended grid override
    grid_num_override: tuple = ()
    axis_name: str = ""           # mesh axis for cross-device reductions
    # fixed reference constants
    viscosity: float = 0.01       # sph_base.py:15
    surface_tension: float = 0.01 # WCSPH.py:15 / DFSPH.py:9
    collision_factor: float = 0.5 # c_f, sph_base.py:121

    # ---- derived (reference particle_system.py:33-46) ----
    @property
    def particle_diameter(self):
        return 2.0 * self.particle_radius

    @property
    def support_radius(self):
        return 4.0 * self.particle_radius

    @property
    def m_V0(self):
        return 0.8 * self.particle_diameter ** self.dim

    @property
    def domain_size(self):
        return tuple(e - s for e, s in zip(self.domain_end, self.domain_start))

    @property
    def grid_size(self):
        return self.support_radius

    @property
    def grid_num(self):
        if self.grid_num_override:
            return self.grid_num_override
        return tuple(int(np.ceil(s / self.grid_size)) for s in self.domain_size)

    @property
    def num_cells(self):
        n = 1
        for g in self.grid_num:
            n *= g
        return n

    @property
    def padding(self):
        return self.grid_size


def pad_count(n, multiple=PAD_MULTIPLE):
    return int(-(-n // multiple) * multiple)


def make_particles(np_arrays, n_pad, with_dfsph=False, with_warm=False):
    """Assemble a padded Particles pytree from host numpy arrays of length n.

    Padding particles: material=-1, is_dynamic=0, parked far outside the
    domain so any distance test fails; the grid stage additionally forces
    their cell id into the overflow cell.
    """
    n = np_arrays["x"].shape[0]
    assert n_pad >= n

    def pad(a, fill=0):
        if a.ndim == 1:
            out = np.full((n_pad,), fill, dtype=a.dtype)
        else:
            out = np.full((n_pad,) + a.shape[1:], fill, dtype=a.dtype)
        out[:n] = a
        return jnp.asarray(out)

    far = 1e9  # way outside any domain
    return Particles(
        object_id=pad(np_arrays["object_id"].astype(np.int32), -1),
        x=pad(np_arrays["x"].astype(np.float32), far),
        x0=pad(np_arrays["x"].astype(np.float32), far),
        v=pad(np_arrays["v"].astype(np.float32)),
        acc=pad(np.zeros_like(np_arrays["x"], dtype=np.float32)),
        m_V=pad(np_arrays["m_V"].astype(np.float32)),
        m=pad(np_arrays["m"].astype(np.float32)),
        density=pad(np_arrays["density"].astype(np.float32)),
        pressure=pad(np_arrays["pressure"].astype(np.float32)),
        material=pad(np_arrays["material"].astype(np.int32), MATERIAL_PAD),
        is_dynamic=pad(np_arrays["is_dynamic"].astype(np.int32)),
        color=pad(np_arrays["color"].astype(np.int32)),
        dfsph_factor=pad(np.zeros(n, np.float32)) if with_dfsph else None,
        density_adv=pad(np.zeros(n, np.float32)) if with_dfsph else None,
        kappa_v=pad(np.zeros(n, np.float32)) if with_warm else None,
        kappa_p=pad(np.zeros(n, np.float32)) if with_warm else None,
    )
