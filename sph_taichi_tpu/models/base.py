"""Shared SPH solver machinery (TPU-native counterpart of sph_base.py).

Everything here is a pure function over (Particles, NeighborList, params):
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

import functools

import jax
import jax.numpy as jnp

from sph_taichi_tpu.state import (
    MATERIAL_FLUID, MATERIAL_SOLID, Particles, SimParams, SimState)
from sph_taichi_tpu.ops.kernels import cubic_kernel
from sph_taichi_tpu.ops.grid import (
    compute_cell_ids, sort_by_cell, cell_offsets, max_cell_occupancy)
from sph_taichi_tpu.ops.neighbors import build_neighbor_list
from sph_taichi_tpu.ops.linalg import polar_rotation


# ---------------------------------------------------------------------------
# neighbor-structure rebuild (reference initialize_particle_system, :372-375)
# ---------------------------------------------------------------------------

def bin_and_sort(p: Particles, params: SimParams):
    """Re-bin particles into the grid, sort, and build neighbor lists."""
    cell_ids = compute_cell_ids(p.x, p.material, params.grid_size,
                                params.grid_num)
    p, sorted_ids, _ = sort_by_cell(p, cell_ids)
    starts = cell_offsets(sorted_ids, params.num_cells)
    nl = build_neighbor_list(
        p.x, starts, params.grid_num, params.grid_size,
        params.support_radius, params.neighbor_cap, params.cell_cap,
        dim=params.dim)
    diag = {"max_neighbors": nl.max_cnt,
            "max_cell_occupancy": max_cell_occupancy(starts)}
    return p, nl, diag


# ---------------------------------------------------------------------------
# Akinci boundary volumes (sph_base.py:91-113)
# ---------------------------------------------------------------------------

def _boundary_volume(p: Particles, nl, params: SimParams, target_mask):
    """m_V = 3.0 / (W(0) + sum_{j in solid nbrs} W(|x_i - x_j|)).

    The 3.0 compensates missing boundary layers ("by trial and error",
    sph_base.py:98) — preserved for behavioral parity.
    """
    h = params.support_radius
    xj = p.x[nl.idx]
    r = p.x[:, None, :] - xj
    rn = jnp.linalg.norm(r, axis=-1)
    w = cubic_kernel(rn, h, params.dim)
    solid_j = p.material[nl.idx] == MATERIAL_SOLID
    contrib = jnp.where(nl.mask() & solid_j, w, 0.0)
    delta = cubic_kernel(jnp.zeros((), p.x.dtype), h, params.dim) \
        + jnp.sum(contrib, axis=1)
    m_v = 3.0 / delta
    return p._replace(m_V=jnp.where(target_mask, m_v, p.m_V))


def compute_static_boundary_volume(p, nl, params):
    return _boundary_volume(p, nl, params, p.is_static_rigid())


def compute_moving_boundary_volume(p, nl, params):
    return _boundary_volume(p, nl, params, p.is_dynamic_rigid())


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

def compute_com(p: Particles, object_id):
    """Mass-weighted COM over this object's dynamic rigid particles.

    Mass = m_V0 * density (NOT the Akinci m_V) — sph_base.py:188.
    m_V0*density is exactly the stored p.m, assigned at creation.
    """
    mask = p.is_dynamic_rigid() & (p.object_id == object_id)
    w = jnp.where(mask, p.m, 0.0)
    sum_m = jnp.sum(w)
    cm = jnp.sum(w[:, None] * p.x, axis=0) / sum_m
    return cm


def solve_constraints(p: Particles, rest_cm, object_id):
    """One shape-matching projection for one object (sph_base.py:200-222)."""
    mask = p.is_dynamic_rigid() & (p.object_id == object_id)
    w = jnp.where(mask, p.m, 0.0)
    sum_m = jnp.sum(w)
    cm = jnp.sum(w[:, None] * p.x, axis=0) / sum_m
    q = p.x0 - rest_cm[None, :]
    pv = p.x - cm[None, :]
    # A = sum m * p ⊗ q  (outer_product(p, q), sph_base.py:210)
    a = jnp.einsum("n,ni,nj->ij", w, pv, q)
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
            cms.append(compute_com(p, obj))
        else:
            cms.append(jnp.zeros((params.dim,), p.x.dtype))
    return jnp.stack(cms, axis=0)


def solve_rigid_body(p: Particles, rest_cm, params: SimParams):
    """Sequential shape-match + solid box clamp per dynamic object, in the
    reference's iteration order (sph_base.py:247-260): the solid boundary
    enforcement runs once after EVERY dynamic object's projection."""
    rots, cms = [], []
    for obj in params.dynamic_rigid_ids:
        p, r, cm = solve_constraints(p, rest_cm[obj], obj)
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
    """Owns the static params and the compiled step/initialize programs.

    Subclasses implement `substep(p, nl, dt) -> (p, metrics)` as a pure
    function (WCSPH.py:152-156 / DFSPH.py:400-408 equivalents).
    """

    def __init__(self, params: SimParams):
        self.params = params
        self.g = jnp.asarray(params.gravity, jnp.float32)
        self.density_0 = params.density0
        self.viscosity = params.viscosity
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
        p, nl, _ = bin_and_sort(particles, params)
        rest_cm = compute_rigid_rest_cm(p, params)
        p = compute_static_boundary_volume(p, nl, params)
        p = compute_moving_boundary_volume(p, nl, params)
        return SimState(
            p=p, rigid_rest_cm=rest_cm,
            dt=jnp.asarray(params.dt0, jnp.float32),
            t=jnp.zeros((), jnp.float32),
            step_count=jnp.zeros((), jnp.int32))

    def step_fn(self, state: SimState):
        """Reference SPHBase.step (sph_base.py:263-271)."""
        params = self.params
        p, nl, diag = bin_and_sort(state.p, params)
        p = compute_moving_boundary_volume(p, nl, params)
        p, sub_metrics = self.substep(p, nl, state.dt)
        p, rigid_info = solve_rigid_body(p, state.rigid_rest_cm, params)
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

    def substep(self, p, nl, dt):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# pair-sum building blocks shared by WCSPH / DFSPH
# ---------------------------------------------------------------------------

def compute_densities(p: Particles, nl, params: SimParams):
    """rho_i = rho0 * (m_V_i*W(0) + sum_j m_V_j*W(r_ij)), fluid centers only,
    fluid and solid neighbors both contribute (WCSPH.py:19-43 ==
    DFSPH.py:23-47). Solid/pad densities keep their stored values."""
    h = params.support_radius
    xj = p.x[nl.idx]
    rn = jnp.linalg.norm(p.x[:, None, :] - xj, axis=-1)
    w = cubic_kernel(rn, h, params.dim)
    m_v_j = p.m_V[nl.idx]
    valid = nl.mask() & (p.material[nl.idx] != -1)
    den = p.m_V * cubic_kernel(jnp.zeros((), p.x.dtype), h, params.dim)
    den = den + jnp.sum(jnp.where(valid, m_v_j * w, 0.0), axis=1)
    density = den * params.density0
    return p._replace(density=jnp.where(p.is_fluid(), density, p.density))


def compute_non_pressure_forces(p: Particles, nl, params: SimParams, g):
    """Gravity for every dynamic particle; surface tension + XSPH-style
    viscosity pair sums for fluid centers (WCSPH.py:88-141 ==
    DFSPH.py:50-102).

    The reference's boundary-viscosity reaction scatter onto dynamic rigid
    neighbors multiplies by boundary_viscosity = 0.0 (WCSPH.py:118,
    DFSPH.py:80) and is therefore exactly zero — intentionally omitted.
    Static rigid acceleration is zeroed (WCSPH.py:131-132).
    """
    h = params.support_radius
    dim = params.dim
    st = params.surface_tension
    visc = params.viscosity
    diameter = params.particle_diameter

    xj = p.x[nl.idx]
    r = p.x[:, None, :] - xj
    r2 = jnp.sum(r * r, axis=-1)
    rn = jnp.sqrt(r2)
    mat_j = p.material[nl.idx]
    fluid_j = nl.mask() & (mat_j == MATERIAL_FLUID)

    # ---- surface tension (fluid neighbors only; WCSPH.py:92-102) ----
    w = cubic_kernel(rn, h, dim)
    w_diam = cubic_kernel(jnp.asarray(diameter, p.x.dtype), h, dim)
    w_st = jnp.where(r2 > diameter * diameter, w, w_diam)
    m_j = p.m[nl.idx]
    st_coef = jnp.where(fluid_j, (st / p.m[:, None]) * m_j * w_st, 0.0)
    a_st = -jnp.sum(st_coef[..., None] * r, axis=1)

    # ---- viscosity (fluid neighbors; solid term has coefficient 0) ----
    from sph_taichi_tpu.ops.kernels import cubic_kernel_derivative_scalar
    d = 2.0 * (dim + 2.0)
    vj = p.v[nl.idx]
    v_xy = jnp.sum((p.v[:, None, :] - vj) * r, axis=-1)
    dens_j = p.density[nl.idx]
    gradw_scale = cubic_kernel_derivative_scalar(rn, h, dim)
    coef = d * visc * (m_j / dens_j) * v_xy / (r2 + 0.01 * h * h)
    coef = jnp.where(fluid_j, coef * gradw_scale, 0.0)
    a_visc = jnp.sum(coef[..., None] * r, axis=1)

    acc = g[None, :] + jnp.where(p.is_fluid()[:, None], a_st + a_visc, 0.0)
    acc = jnp.where(p.is_static_rigid()[:, None], 0.0, acc)
    acc = jnp.where((p.material == -1)[:, None], 0.0, acc)  # padding inert
    return p._replace(acc=acc)
