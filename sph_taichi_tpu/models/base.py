"""Shared SPH solver machinery (TPU-native counterpart of sph_base.py).

Every pair sum is expressed as a term function over (center fields,
neighbor fields, pair geometry) and evaluated by a pluggable traversal
engine (ops/pairs.py): the gather backend for CPU/tests, the Pallas
row-streaming backend for TPU.  Everything else here is pure jnp:

- Akinci boundary volumes (static once, moving every step) —
  sph_base.py:91-113, keeping the hardcoded 3.0 coefficient.
- Domain-box collision: clamp into [padding, domain_size - padding] and
  reflect velocity with restitution c_f = 0.5 — sph_base.py:118-179.
- Shape-matching rigid-body solve per dynamic object: mass-weighted COM,
  moment matrix, polar rotation, goal projection — sph_base.py:182-260.
  The reference's per-object Python loop with serial reduction kernels
  becomes masked vector reductions, unrolled over the (static) object list
  in the same order so the enforce-boundary interleaving is preserved.
- Step orchestration — sph_base.py:263-271: re-sort, moving boundary
  volumes, solver substep, rigid solve, fluid box clamp — fused into one
  jitted program per step.

Two-way coupling note: all of the reference's atomic scatters onto rigid
neighbors are reformulated as gathers computed from the rigid particle's
side (the neighbor relation is symmetric), so the whole step is
deterministic.
"""

from typing import Any, Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from sph_taichi_tpu.state import (
    MATERIAL_FLUID, MATERIAL_PAD, MATERIAL_SOLID, Particles, SimParams,
    SimState)
from sph_taichi_tpu.ops.kernels import (
    cubic_kernel, cubic_kernel_derivative_scalar)
from sph_taichi_tpu.ops.grid import (
    compute_cell_ids, sort_by_cell, cell_offsets, max_cell_occupancy)
from sph_taichi_tpu.ops.linalg import polar_rotation
from sph_taichi_tpu.ops.pairs import make_engine


# ---------------------------------------------------------------------------
# step context: engine ctx + optional sharded ghost synchronization
# ---------------------------------------------------------------------------

class StepCtx(NamedTuple):
    """What a traversal needs: the engine's per-step context, plus (for
    spatially sharded runs) a callback that refreshes ghost particles'
    derived fields from their owning devices (parallel/sharding.py).
    Single-device runs pass the bare engine ctx; ghost_sync is a no-op."""
    engine_ctx: Any
    ghost_sync: Optional[Callable] = None


def ectx(ctx):
    return ctx.engine_ctx if isinstance(ctx, StepCtx) else ctx


def sync_fields(ctx, p: Particles, names):
    """After center-side fields are recomputed, push owned boundary-layer
    values into the neighbors' ghost copies (sharded runs only)."""
    if isinstance(ctx, StepCtx) and ctx.ghost_sync is not None:
        return ctx.ghost_sync(p, tuple(names))
    return p


# ---------------------------------------------------------------------------
# neighbor-structure rebuild (reference initialize_particle_system, :372-375)
# ---------------------------------------------------------------------------

def bin_and_sort(p: Particles, params: SimParams, engine):
    """Re-bin particles into the grid, sort, and prepare the pair engine.

    Sort-payload analysis (every excluded operand shrinks the per-step
    sort network):
    - acc: every solver fully recomputes acceleration before reading it
      within the substep (WCSPH compute_non_pressure/forces, DFSPH
      compute_non_pressure_forces, IISPH compute_non_pressure).
    - pressure: WCSPH rewrites it from the EOS each substep and solid
      pressure stays 0; DFSPH never reads it (kappa-based).  IISPH warm-
      starts from last step's pressure (IISPH.py:100), so there it rides.
    - x0 (rest positions): only shape matching and rigid rest-CM read
      them; scenes without dynamic rigid objects never do after init.
    - color: per-particle color is constant per object; the host side
      reconstructs it from object_id (Simulation keeps a palette table),
      so it never needs to be permutation-consistent on device.
    """
    transient = ["acc", "color"]
    if params.simulation_method != 2:
        transient.append("pressure")
    if not params.dynamic_rigid_ids:
        transient.append("x0")
    # per-object-constant fields (round 5, j241: the sort network alone
    # is 7.1 ms/step at dragon scale): material / is_dynamic / m /
    # density are derivable from object_id (solid density is the
    # creation value forever; fluid density is fully recomputed by
    # compute_densities before any read in every solver substep), so
    # they are dropped from the sort payload and restored from the
    # static SimParams tables below — tiny lookups that fuse into the
    # consumers instead of four more 442K-lane sort operands.
    derived = bool(params.obj_material)
    if derived:
        transient += ["material", "is_dynamic", "m", "density"]
    cell_ids = compute_cell_ids(p.x, p.material, params.grid_size,
                                params.grid_num)
    p, sorted_ids = sort_by_cell(p, cell_ids, extra_transient=transient)
    if derived:
        oid = p.object_id
        pad_row = oid < 0
        safe = jnp.clip(oid, 0, len(params.obj_material) - 1)
        mat_t = jnp.asarray(params.obj_material, jnp.int32)
        den_t = jnp.asarray(params.obj_density0, jnp.float32)
        dyn_t = jnp.asarray(params.obj_is_dynamic, jnp.int32)
        # m tabled VERBATIM from creation values (recomputing
        # m_V0*density0 here lands 1 ulp off creation's cast chain)
        m_t = jnp.asarray(params.obj_m0, jnp.float32)
        p = p._replace(
            material=jnp.where(pad_row, MATERIAL_PAD, mat_t[safe]),
            is_dynamic=jnp.where(pad_row, 0, dyn_t[safe]),
            density=jnp.where(pad_row, 0.0, den_t[safe]),
            m=jnp.where(pad_row, 0.0, m_t[safe]))
    starts = cell_offsets(sorted_ids, params.num_cells)
    ctx = engine.prepare(p.x, starts)
    diag = {"max_cell_occupancy": max_cell_occupancy(starts),
            # in-step sort/offsets invariants (round 3: guards against a
            # large-program miscompile of the sort pipeline — cheap, and
            # a silent sort corruption poisons every pair sum)
            "sort_invariant_violated":
                jnp.any(sorted_ids[1:] < sorted_ids[:-1])
                | (starts[-1] != p.n)}
    if hasattr(ctx, "diag"):
        diag.update(ctx.diag)   # pallas capacity diagnostics
    return p, ctx, diag


# ---------------------------------------------------------------------------
# Akinci boundary volumes (sph_base.py:91-113)
# ---------------------------------------------------------------------------

# Above this solid count the dense O(S^2) path stops paying vs one full
# engine traversal (dragon-dynamic S=18.5K is ~2 ms dense; the traversal
# it replaces is ~15 ms at that scale, ~60 ms at armadillo's 1.73M).
DENSE_SOLID_CAP = 32768


def _boundary_volume_dense(p: Particles, params: SimParams, target_mask):
    """Dense solid-solid rebuild of m_V for scenes with few solids.

    The engine traversal in _boundary_volume walks EVERY particle's
    neighborhood to update only the solid particles' m_V — at armadillo
    scale that is a full 1.73M-particle traversal per step for 5349
    solids.  Since only solid-solid pairs contribute (sph_base.py:104
    sums over solid neighbors) and n_solid is a static scene constant,
    an all-pairs W-sum over the compacted solid set is exact (pairs
    beyond h contribute W=0) and orders of magnitude cheaper.  The
    diagonal term rn=0 contributes W(0), which is exactly the self term
    the reference adds explicitly (sph_base.py:101).  Pair math matches
    the gather engine (direct subtraction, no matmul expansion).
    Non-sharded runs only: compaction needs the whole solid set local.
    """
    h = params.support_radius
    S = params.n_solid
    (sidx,) = jnp.nonzero(p.material == MATERIAL_SOLID, size=S,
                          fill_value=0)
    xs = p.x[sidx]                                    # (S, dim)
    T = 512
    pad = (-S) % T
    xs_rows = jnp.pad(xs, ((0, pad), (0, 0)))

    def row_chunk(xr):
        d = xr[:, None, :] - xs[None, :, :]
        rn = jnp.sqrt(jnp.sum(d * d, axis=-1))
        return jnp.sum(cubic_kernel(rn, h, params.dim), axis=1)

    delta = jax.lax.map(row_chunk,
                        xs_rows.reshape(-1, T, params.dim)).reshape(-1)[:S]
    m_v = 3.0 / delta
    mv_full = jnp.zeros_like(p.m_V).at[sidx].set(m_v)
    return p._replace(m_V=jnp.where(target_mask, mv_full, p.m_V))


def _boundary_volume(p: Particles, ctx, engine, params: SimParams,
                     target_mask):
    """m_V = 3.0 / (W(0) + sum_{j in solid nbrs} W(|x_i - x_j|)).

    The 3.0 compensates missing boundary layers ("by trial and error",
    sph_base.py:98) — preserved for behavioral parity.
    """
    if (0 < params.n_solid <= DENSE_SOLID_CAP
            and not (isinstance(ctx, StepCtx)
                     and ctx.ghost_sync is not None)):
        return _boundary_volume_dense(p, params, target_mask)
    return _boundary_volume_engine(p, ctx, engine, params, target_mask)


def _boundary_volume_engine(p: Particles, ctx, engine, params: SimParams,
                            target_mask):
    """Engine-traversal m_V (sharded runs and solid-heavy scenes)."""
    h = params.support_radius

    def term(fi, fj, d2, rn, dots):
        w = cubic_kernel(rn, h, params.dim)
        return {"delta": jnp.where(fj["material"] == MATERIAL_SOLID, w, 0.0)}

    out = engine.traverse(ectx(ctx), p.x, {"material": p.material}, term,
                          {"delta": "scalar"}, mode="mxu")
    delta = cubic_kernel(jnp.zeros((), p.x.dtype), h, params.dim) \
        + out["delta"]
    m_v = 3.0 / delta
    p = p._replace(m_V=jnp.where(target_mask, m_v, p.m_V))
    return sync_fields(ctx, p, ["m_V"])


def compute_static_boundary_volume(p, ctx, engine, params):
    return _boundary_volume(p, ctx, engine, params, p.is_static_rigid())


def compute_moving_boundary_volume(p, ctx, engine, params):
    return _boundary_volume(p, ctx, engine, params, p.is_dynamic_rigid())


# ---------------------------------------------------------------------------
# domain-box collision (sph_base.py:118-179)
# ---------------------------------------------------------------------------

def enforce_boundary(p: Particles, params: SimParams, particle_type):
    """Clamp dynamic particles of `particle_type` into the padded box and
    reflect their velocity (c_f = 0.5). Exact reference comparisons:
    strict `>` at the high side, inclusive `<=` at the low side."""
    size = jnp.asarray(params.domain_size, p.x.dtype)
    pad = params.padding
    active = (p.material == particle_type) & (p.is_dynamic != 0)

    over = p.x > (size - pad)[None, :]
    under = p.x <= pad
    normal = over.astype(p.x.dtype) - under.astype(p.x.dtype)
    x_new = jnp.where(over, (size - pad)[None, :], p.x)
    x_new = jnp.where(under, pad, x_new)  # low side wins if both (ref order)

    nlen = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    nhat = normal / jnp.maximum(nlen, 1e-30)
    vdotn = jnp.sum(p.v * nhat, axis=-1, keepdims=True)
    v_reflected = p.v - (1.0 + params.collision_factor) * vdotn * nhat
    v_new = jnp.where(nlen > 1e-6, v_reflected, p.v)

    x_out = jnp.where(active[:, None], x_new, p.x)
    v_out = jnp.where(active[:, None], v_new, p.v)
    return p._replace(x=x_out, v=v_out)


# ---------------------------------------------------------------------------
# shape-matching rigid solve (sph_base.py:182-260)
# ---------------------------------------------------------------------------

def _allsum(x, axis_name=""):
    """Sum over the particle axis, then across the device mesh if sharded."""
    s = jnp.sum(x, axis=0)
    if axis_name:
        s = jax.lax.psum(s, axis_name)
    return s


def compute_com(p: Particles, object_id, axis_name=""):
    """Mass-weighted COM over this object's dynamic rigid particles.

    Mass = m_V0 * density (NOT the Akinci m_V) — sph_base.py:188.
    m_V0*density is exactly the stored p.m, assigned at creation.
    Ghost copies (sharded runs) must be excluded by the caller having
    marked them non-dynamic or by identical replication—in our sharding,
    ghosts are counted once because psum sums owned copies only when the
    caller pre-masks; see parallel/sharding.py.
    """
    mask = p.is_dynamic_rigid() & (p.object_id == object_id)
    w = jnp.where(mask, p.m, 0.0)
    sum_m = _allsum(w, axis_name)
    cm = _allsum(w[:, None] * p.x, axis_name) / sum_m
    return cm


def solve_constraints(p: Particles, rest_cm, object_id, axis_name=""):
    """One shape-matching projection for one object (sph_base.py:200-222)."""
    mask = p.is_dynamic_rigid() & (p.object_id == object_id)
    w = jnp.where(mask, p.m, 0.0)
    sum_m = _allsum(w, axis_name)
    cm = _allsum(w[:, None] * p.x, axis_name) / sum_m
    q = p.x0 - rest_cm[None, :]
    pv = p.x - cm[None, :]
    # A = sum m * p ⊗ q  (outer_product(p, q), sph_base.py:210)
    a = jnp.einsum("n,ni,nj->ij", w, pv, q)
    if axis_name:
        a = jax.lax.psum(a, axis_name)
    r = polar_rotation(a)
    goal = cm[None, :] + q @ r.T
    x_new = jnp.where(mask[:, None], goal, p.x)  # stiffness 1.0
    return p._replace(x=x_new), r, cm


def compute_rigid_rest_cm(p: Particles, params: SimParams):
    """rigid_rest_cm per object id (sph_base.py:87-89). Objects with no
    dynamic rigid particles (fluids, static rigids) get zeros — the
    reference stores NaN there but never reads it."""
    n_obj = max(params.num_objects, 1)
    cms = []
    for obj in range(n_obj):
        if obj in params.dynamic_rigid_ids:
            cms.append(compute_com(p, obj, params.axis_name))
        else:
            cms.append(jnp.zeros((params.dim,), p.x.dtype))
    return jnp.stack(cms, axis=0)


def solve_rigid_body(p: Particles, rest_cm, params: SimParams):
    """Sequential shape-match + solid box clamp per dynamic object, in the
    reference's iteration order (sph_base.py:247-260): the solid boundary
    enforcement runs once after EVERY dynamic object's projection."""
    rots, cms = [], []
    for obj in params.dynamic_rigid_ids:
        p, r, cm = solve_constraints(p, rest_cm[obj], obj, params.axis_name)
        p = enforce_boundary(p, params, MATERIAL_SOLID)
        rots.append(r)
        cms.append(cm)
    if rots:
        rigid_info = {"R": jnp.stack(rots), "cm": jnp.stack(cms)}
    else:
        rigid_info = {"R": jnp.zeros((0, 3, 3), p.x.dtype),
                      "cm": jnp.zeros((0, params.dim), p.x.dtype)}
    return p, rigid_info


# ---------------------------------------------------------------------------
# solver base class
# ---------------------------------------------------------------------------

class SPHBase:
    """Owns the static params, the traversal engine, and the compiled
    step/initialize programs.  Subclasses implement
    `substep(p, ctx, dt) -> (p, metrics)` as a pure function
    (WCSPH.py:152-156 / DFSPH.py:400-408 equivalents)."""

    def __init__(self, params: SimParams):
        self.params = params
        self.g = jnp.asarray(params.gravity, jnp.float32)
        self.density_0 = params.density0
        self.viscosity = params.viscosity
        self.engine = make_engine(params)
        self._step = jax.jit(self.step_fn, donate_argnums=0)
        self._init = jax.jit(self.initialize_fn)

    # -- public API ---------------------------------------------------------
    def initialize(self, particles: Particles) -> SimState:
        """Reference SPHBase.initialize (sph_base.py:80-85)."""
        return self._init(particles)

    def step(self, state: SimState):
        """One full simulation step; returns (new_state, metrics)."""
        return self._step(state)

    def make_frame_fn(self, substeps: int):
        """Compile `substeps` solver steps as one lax.scan-ed program —
        the per-frame loop of run_simulation.py:79-81 without host
        round-trips."""
        if substeps == 1:
            # Do NOT scan a single step: XLA's while-loop simplifier
            # unrolls the trip-count-1 loop into the parent module and
            # later passes blow up on the flat graph — scan-of-1
            # measured ~1490 s to compile at dragon scale vs 104 s for
            # the identical body jitted directly (devjobs j310/j312;
            # scan-of-2 is 125 s).  substeps=1 is the DEFAULT CLI path
            # (numberOfStepsPerRenderUpdate=1 in every bundled scene).
            # Metrics keep the scan's leading step axis.
            def frame1(state):
                s, m = self.step_fn(state)
                return s, jax.tree.map(lambda a: jnp.asarray(a)[None], m)
            return jax.jit(frame1, donate_argnums=0)

        def frame(state):
            def body(s, _):
                s, m = self.step_fn(s)
                return s, m
            state, metrics = jax.lax.scan(body, state, None, length=substeps)
            return state, metrics
        return jax.jit(frame, donate_argnums=0)

    # -- jitted programs ------------------------------------------------------
    def initialize_fn(self, particles: Particles) -> SimState:
        params = self.params
        p, ctx, _ = bin_and_sort(particles, params, self.engine)
        rest_cm = compute_rigid_rest_cm(p, params)
        p = compute_static_boundary_volume(p, ctx, self.engine, params)
        p = compute_moving_boundary_volume(p, ctx, self.engine, params)
        return SimState(
            p=p, rigid_rest_cm=rest_cm,
            dt=jnp.asarray(params.dt0, jnp.float32),
            t=jnp.zeros((), jnp.float32),
            step_count=jnp.zeros((), jnp.int32))

    def step_fn(self, state: SimState):
        """Reference SPHBase.step (sph_base.py:263-271)."""
        params = self.params
        p, ctx, diag = bin_and_sort(state.p, params, self.engine)
        if params.n_solid > 0 and params.dynamic_rigid_ids:
            p = compute_moving_boundary_volume(p, ctx, self.engine, params)
        self._boundary_fused = False
        p, sub_metrics = self.substep(p, ctx, state.dt)
        p, rigid_info = solve_rigid_body(p, state.rigid_rest_cm, params)
        # a solver may fold the fluid box clamp into its last traversal's
        # in-kernel epilogue (WCSPH fused advect, trace-time flag); the
        # clamp commutes with the rigid solve (disjoint rows) so skipping
        # it here is exact
        if not self._boundary_fused:
            p = enforce_boundary(p, params, MATERIAL_FLUID)
        new_state = state._replace(
            p=p, t=state.t + state.dt, step_count=state.step_count + 1)
        fluid = p.is_fluid()
        metrics = dict(diag)
        metrics.update(sub_metrics)
        metrics["rigid"] = rigid_info
        metrics["max_velocity"] = jnp.max(
            jnp.where(fluid, jnp.linalg.norm(p.v, axis=-1), 0.0))
        return new_state, metrics

    def substep(self, p, ctx, dt):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# pair-sum building blocks shared by WCSPH / DFSPH
# ---------------------------------------------------------------------------

def compute_densities(p: Particles, ctx, engine, params: SimParams):
    """rho_i = rho0 * (m_V_i*W(0) + sum_j m_V_j*W(r_ij)), fluid centers only,
    fluid and solid neighbors both contribute (WCSPH.py:19-43 ==
    DFSPH.py:23-47). Solid/pad densities keep their stored values."""
    h = params.support_radius

    def term(fi, fj, d2, rn, dots):
        w = cubic_kernel(rn, h, params.dim)
        return {"den": jnp.where(fj["material"] >= 0, fj["m_V"] * w, 0.0)}

    out = engine.traverse(ectx(ctx), p.x,
                          {"material": p.material, "m_V": p.m_V},
                          term, {"den": "scalar"}, mode="mxu")
    den = p.m_V * cubic_kernel(jnp.zeros((), p.x.dtype), h, params.dim) \
        + out["den"]
    density = den * params.density0
    p = p._replace(density=jnp.where(p.is_fluid(), density, p.density))
    return sync_fields(ctx, p, ["density"])


def restore_tail(col, fallback, params):
    """Kernel groups never cover overflow-cell (padding) rows, so their
    epilogue outputs are garbage; restore them from ``fallback`` with a
    static-slice concat (padding sorts to the tail — max cell id)."""
    n_real = params.n_fluid + params.n_solid
    if n_real < col.shape[0]:
        return jnp.concatenate([col[:n_real], fallback[n_real:]], 0)
    return col


def compute_non_pressure_forces(p: Particles, ctx, engine,
                                params: SimParams, g, predict_dt=None):
    """Gravity for every dynamic particle; surface tension + XSPH-style
    viscosity pair sums for fluid centers (WCSPH.py:88-141 ==
    DFSPH.py:50-102).

    The reference's boundary-viscosity reaction scatter onto dynamic rigid
    neighbors multiplies by boundary_viscosity = 0.0 (WCSPH.py:118,
    DFSPH.py:80) and is therefore exactly zero — intentionally omitted,
    as is the (also zero) solid viscosity term on fluid centers.
    Static rigid acceleration is zeroed (WCSPH.py:131-132).
    """
    h = params.support_radius
    dim = params.dim
    st = params.surface_tension
    visc = params.viscosity
    diameter = params.particle_diameter
    w_diam = None  # computed inside term with static shapes

    def term(fi, fj, d2, rn, dots):
        fluid_j = fj["material"] == MATERIAL_FLUID
        r2 = d2
        # surface tension (WCSPH.py:92-102): kernel of max(r, diameter)
        w = cubic_kernel(rn, h, dim)
        wd = cubic_kernel(jnp.asarray(diameter, rn.dtype), h, dim)
        w_st = jnp.where(r2 > diameter * diameter, w, wd)
        st_coef = jnp.where(fluid_j,
                            -(st / fi["m"]) * fj["m"] * w_st, 0.0)
        # viscosity (WCSPH.py:105-116)
        v_xy = dots["v"]
        gradw_s = cubic_kernel_derivative_scalar(rn, h, dim, inv_r=dots.get("_inv"))
        d = 2.0 * (dim + 2.0)
        visc_coef = jnp.where(
            fluid_j,
            d * visc * (fj["m"] / fj["density"]) * v_xy
            / (r2 + 0.01 * h * h) * gradw_s,
            0.0)
        return {"a": st_coef + visc_coef}

    fields = {"material": p.material, "m": p.m, "density": p.density,
              "v0": p.v[:, 0], "v1": p.v[:, 1], "v2": p.v[:, 2]}

    if predict_dt is not None:
        # fused variant (DFSPH): the acc selection chain AND the
        # fluid velocity kick v += dt*acc (predict_velocity,
        # DFSPH.py:392-397) run in the kernel epilogue; f_pad is 16
        # either way so the extra fields are free
        fields["is_dyn"] = p.is_dynamic
        gl = [float(val) for val in np.asarray(g)]

        def epi(fi, sums, sc):
            # row-major contract: (1, R) rows; sums are ncomp-tuples
            dtv = sc[0]
            fluid = fi["material"] == float(MATERIAL_FLUID)
            solid = fi["material"] == float(MATERIAL_SOLID)
            padm = fi["material"] == float(MATERIAL_PAD)
            dynm = fi["is_dyn"] > 0.5
            aout, vout = [], []
            for k in range(3):
                a = gl[k] + jnp.where(fluid, sums["a"][k], 0.0)
                a = jnp.where(solid & ~dynm, 0.0, a)
                a = jnp.where(padm, 0.0, a)
                aout.append(a)
                vout.append(jnp.where(fluid & dynm,
                                      fi[f"v{k}"] + dtv * a, fi[f"v{k}"]))
            return {"acc": tuple(aout), "v": tuple(vout)}

        out = engine.traverse(
            ectx(ctx), p.x, fields, term, {"a": "radial"}, mode="mxu",
            pair_dots=("v",),
            epilogue=(epi, {"acc": 3, "v": 3}, jnp.stack([predict_dt])))
        acc = restore_tail(jnp.stack(out["acc"], axis=1),
                           jnp.zeros_like(p.acc), params)
        v = restore_tail(jnp.stack(out["v"], axis=1), p.v, params)
        return p._replace(acc=acc, v=v)

    out = engine.traverse(
        ectx(ctx), p.x, fields,
        term, {"a": "radial"}, mode="mxu", pair_dots=("v",))
    a_pair = jnp.stack(out["a"], axis=1)

    acc = g[None, :] + jnp.where(p.is_fluid()[:, None], a_pair, 0.0)
    acc = jnp.where(p.is_static_rigid()[:, None], 0.0, acc)
    acc = jnp.where((p.material == -1)[:, None], 0.0, acc)  # padding inert
    return p._replace(acc=acc)
