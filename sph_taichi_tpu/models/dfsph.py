"""Divergence-Free SPH solver (TPU-native counterpart of DFSPH.py).

Substep pipeline (DFSPH.py:400-408): densities -> alpha factor ->
divergence solver -> non-pressure forces -> predict velocity ->
constant-density pressure solver -> advection.

The reference drives both Jacobi solvers from Python, syncing the average
density error to the host every iteration (DFSPH.py:248-257, 330-337) —
its main accelerator weakness.  Here each solver is a single
``lax.while_loop`` with an on-device error reduction; iteration counts and
final errors are returned as metrics instead of printed.

Parity notes:
- exact tolerances: divergence eta = (1/dt)*0.1%*rho0, density eta =
  0.05%*rho0; max 100 iterations; both loops always run at least once
  (DFSPH.py:14-20,248,253,330,334);
- particle-deficiency cutoff: density_adv zeroed when a fluid particle has
  fewer than 20 (3D) / 7 (2D) neighbors (DFSPH.py:171-176);
- m_eps = 1e-5 stiffness gate (DFSPH.py:17,300,375);
- the alpha factor is rescaled by 1/dt (divergence) and 1/dt^2 (pressure)
  around each solve on fluid particles only (DFSPH.py:229-233,241,267,323);
- the divergence solver's reaction scatter onto dynamic rigid bodies
  (DFSPH.py:310-311) is *discarded* by the reference: compute_non_pressure_
  forces runs right after and resets every dynamic particle's acceleration
  to gravity (DFSPH.py:98-99).  We therefore don't compute it.  Only the
  pressure solver's reaction (DFSPH.py:388-389) affects rigid motion; it is
  accumulated across iterations inside the while_loop, in gather form.
- advection: v += dt*acc for dynamic rigid only; x += dt*v for all dynamic
  (DFSPH.py:105-112).
"""

import jax
import jax.numpy as jnp

from sph_taichi_tpu.state import MATERIAL_FLUID, MATERIAL_SOLID, Particles
from sph_taichi_tpu.ops.kernels import cubic_kernel_derivative_scalar
from sph_taichi_tpu.models.base import (
    SPHBase, compute_densities, compute_non_pressure_forces)


class DFSPHSolver(SPHBase):
    def __init__(self, params):
        self.m_max_iterations_v = 100   # DFSPH.py:14
        self.m_max_iterations = 100     # DFSPH.py:15
        self.m_eps = 1e-5               # DFSPH.py:17
        self.max_error_V = 0.1          # % , DFSPH.py:19
        self.max_error = 0.05           # % , DFSPH.py:20
        self.enable_divergence_solver = True
        super().__init__(params)

    # ------------------------------------------------------------------
    def _pair_geometry(self, p: Particles, nl):
        """Shared per-step pair quantities: -m_V_j * gradW(x_i - x_j)."""
        params = self.params
        h = params.support_radius
        xj = p.x[nl.idx]
        r = p.x[:, None, :] - xj
        rn = jnp.linalg.norm(r, axis=-1)
        gradw = cubic_kernel_derivative_scalar(rn, h, params.dim)[..., None] * r
        mat_j = p.material[nl.idx]
        valid = nl.mask()
        fluid_j = valid & (mat_j == MATERIAL_FLUID)
        solid_j = valid & (mat_j == MATERIAL_SOLID)
        m_v_j = p.m_V[nl.idx]
        grad_p_j = -m_v_j[..., None] * gradw   # DFSPH.py:146 etc.
        return dict(gradw=gradw, grad_p_j=grad_p_j, fluid_j=fluid_j,
                    solid_j=solid_j, m_v_j=m_v_j)

    # ------------------------------------------------------------------
    def compute_factor(self, p: Particles, nl, geo):
        """alpha_i = -1 / (|sum grad|^2 + sum |grad|^2) (DFSPH.py:115-155).

        Fluid neighbors contribute to both terms; solid neighbors only to
        the gradient sum. factor = 0 when denominator <= 1e-6."""
        grad_p_j = geo["grad_p_j"]
        fluid_j, solid_j = geo["fluid_j"], geo["solid_j"]
        both = (fluid_j | solid_j)[..., None]
        grad_p_i = -jnp.sum(jnp.where(both, grad_p_j, 0.0), axis=1)
        sum_sq = jnp.sum(
            jnp.where(fluid_j, jnp.sum(grad_p_j * grad_p_j, axis=-1), 0.0),
            axis=1)
        sum_grad_p_k = sum_sq + jnp.sum(grad_p_i * grad_p_i, axis=-1)
        factor = jnp.where(sum_grad_p_k > 1e-6, -1.0 / sum_grad_p_k, 0.0)
        return jnp.where(p.is_fluid(), factor, 0.0)

    def _density_change(self, p: Particles, nl, geo, v):
        """d(rho)/dt term, clamped >= 0, zeroed on particle deficiency
        (compute_density_change, DFSPH.py:158-194)."""
        vj = v[nl.idx]
        dvel = v[:, None, :] - vj
        div = jnp.sum(
            jnp.where(geo["fluid_j"] | geo["solid_j"],
                      geo["m_v_j"] * jnp.sum(dvel * geo["gradw"], axis=-1),
                      0.0), axis=1)
        adv = jnp.maximum(div, 0.0)
        min_nbr = 20 if self.params.dim == 3 else 7
        adv = jnp.where(nl.cnt < min_nbr, 0.0, adv)
        return jnp.where(p.is_fluid(), adv, 0.0)

    def _density_adv(self, p: Particles, nl, geo, v, density, dt):
        """rho*/rho0 = rho/rho0 + dt*div, clamped >= 1
        (compute_density_adv, DFSPH.py:197-218)."""
        vj = v[nl.idx]
        dvel = v[:, None, :] - vj
        div = jnp.sum(
            jnp.where(geo["fluid_j"] | geo["solid_j"],
                      geo["m_v_j"] * jnp.sum(dvel * geo["gradw"], axis=-1),
                      0.0), axis=1)
        adv = density / self.density_0 + dt * div
        adv = jnp.maximum(adv, 1.0)
        return jnp.where(p.is_fluid(), adv, 0.0)

    def _avg_density_error(self, p: Particles, adv, offset):
        """sum over fluid of (rho0*adv - offset) / n_fluid
        (DFSPH.py:221-227 + :274,:350)."""
        err = jnp.sum(jnp.where(p.is_fluid(),
                                self.density_0 * adv - offset, 0.0))
        return err / self.params.n_fluid

    # ------------------------------------------------------------------
    def divergence_solve(self, p: Particles, nl, geo, dt):
        """DFSPH.py:236-311 as a lax.while_loop; returns updated velocity."""
        factor = p.dfsph_factor / dt   # multiply_time_step(inv_dt), fluid-only values
        eta = (1.0 / dt) * self.max_error_V * 0.01 * self.density_0
        adv0 = self._density_change(p, nl, geo, p.v)
        idx = nl.idx
        fluid_j, solid_j = geo["fluid_j"], geo["solid_j"]
        grad_p_j = geo["grad_p_j"]
        is_fluid_c = p.is_fluid()

        def one_iteration(v, adv):
            k = adv * factor                       # k_i per particle
            k_i = k[:, None]
            k_j = k[idx]
            k_sum = k_i + k_j                      # rho0/rho0 * k_j == k_j
            dv_fluid = jnp.where(
                (fluid_j & (jnp.abs(k_sum) > self.m_eps))[..., None],
                -dt * k_sum[..., None] * grad_p_j, 0.0)
            dv_solid = jnp.where(
                (solid_j & (jnp.abs(k_i) > self.m_eps))[..., None],
                -dt * k_i[..., None] * grad_p_j, 0.0)
            dv = jnp.sum(dv_fluid + dv_solid, axis=1)
            v = jnp.where(is_fluid_c[:, None], v + dv, v)
            adv = self._density_change(p, nl, geo, v)
            err = self._avg_density_error(p, adv, 0.0)
            return v, adv, err

        def cond(carry):
            v, adv, err, it = carry
            return (it == 0) | ((err > eta) & (it < self.m_max_iterations_v))

        def body(carry):
            v, adv, _, it = carry
            v, adv, err = one_iteration(v, adv)
            return v, adv, err, it + 1

        init = (p.v, adv0, jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.int32))
        v, adv, err, iters = jax.lax.while_loop(cond, body, init)
        p = p._replace(v=v, density_adv=adv)
        return p, {"divergence_iters": iters, "divergence_error": err}

    # ------------------------------------------------------------------
    def pressure_solve(self, p: Particles, nl, geo, dt):
        """DFSPH.py:314-389 as a lax.while_loop.

        Updates fluid velocity and accumulates the two-way reaction onto
        dynamic rigid accelerations (gather form of DFSPH.py:388-389)."""
        factor = p.dfsph_factor / (dt * dt)
        eta = self.max_error * 0.01 * self.density_0
        adv0 = self._density_adv(p, nl, geo, p.v, p.density, dt)
        idx = nl.idx
        fluid_j, solid_j = geo["fluid_j"], geo["solid_j"]
        grad_p_j = geo["grad_p_j"]
        gradw = geo["gradw"]
        is_fluid_c = p.is_fluid()
        is_dyn_rigid_c = p.is_dynamic_rigid()

        # reaction ingredients seen from the rigid center c with fluid
        # neighbor k: vel_change(k,c) = -dt * k_k * (-m_V_c * gradW(x_k-x_c))
        #           = -dt * k_k * m_V_c * gradw(c,k)
        # acc_c += -vel_change/dt * rho_k / rho_c
        #        =  k_k * m_V_c * gradw(c,k) * rho_k / rho_c
        rho_k = p.density[idx]
        rho_ratio = rho_k / p.density[:, None]
        m_v_c = p.m_V[:, None]

        def one_iteration(v, acc, adv):
            b = adv - 1.0
            k = b * factor
            k_i = k[:, None]
            k_j = k[idx]
            k_sum = k_i + k_j
            dv_fluid = jnp.where(
                (fluid_j & (jnp.abs(k_sum) > self.m_eps))[..., None],
                -dt * k_sum[..., None] * grad_p_j, 0.0)
            dv_solid = jnp.where(
                (solid_j & (jnp.abs(k_i) > self.m_eps))[..., None],
                -dt * k_i[..., None] * grad_p_j, 0.0)
            dv = jnp.sum(dv_fluid + dv_solid, axis=1)
            v = jnp.where(is_fluid_c[:, None], v + dv, v)

            # rigid reaction: sum over fluid neighbors k with |k_k| > eps
            k_k = k[idx]
            da = jnp.where(
                (fluid_j & (jnp.abs(k_k) > self.m_eps))[..., None],
                (k_k * m_v_c * rho_ratio)[..., None] * gradw, 0.0)
            acc = jnp.where(is_dyn_rigid_c[:, None],
                            acc + jnp.sum(da, axis=1), acc)

            adv = self._density_adv(p, nl, geo, v, p.density, dt)
            err = self._avg_density_error(p, adv, self.density_0)
            return v, acc, adv, err

        def cond(carry):
            v, acc, adv, err, it = carry
            return (it == 0) | ((err > eta) & (it < self.m_max_iterations))

        def body(carry):
            v, acc, adv, _, it = carry
            v, acc, adv, err = one_iteration(v, acc, adv)
            return v, acc, adv, err, it + 1

        init = (p.v, p.acc, adv0, jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.int32))
        v, acc, adv, err, iters = jax.lax.while_loop(cond, body, init)
        p = p._replace(v=v, acc=acc, density_adv=adv)
        return p, {"pressure_iters": iters, "pressure_error": err}

    # ------------------------------------------------------------------
    def predict_velocity(self, p: Particles, dt):
        """Fluid-only v += dt*acc (DFSPH.py:392-397)."""
        m = (p.is_fluid() & (p.is_dynamic != 0))[:, None]
        return p._replace(v=jnp.where(m, p.v + dt * p.acc, p.v))

    def advect(self, p: Particles, dt):
        """v += dt*acc for dynamic rigid; x += dt*v for all dynamic
        (DFSPH.py:105-112)."""
        v = jnp.where(p.is_dynamic_rigid()[:, None], p.v + dt * p.acc, p.v)
        dyn = (p.is_dynamic != 0)[:, None]
        x = jnp.where(dyn, p.x + dt * v, p.x)
        return p._replace(v=v, x=x)

    # ------------------------------------------------------------------
    def substep(self, p: Particles, nl, dt):
        p = compute_densities(p, nl, self.params)
        geo = self._pair_geometry(p, nl)
        p = p._replace(dfsph_factor=self.compute_factor(p, nl, geo))
        metrics = {}
        if self.enable_divergence_solver:
            p, m = self.divergence_solve(p, nl, geo, dt)
            metrics.update(m)
        p = compute_non_pressure_forces(p, nl, self.params, self.g)
        p = self.predict_velocity(p, dt)
        p, m = self.pressure_solve(p, nl, geo, dt)
        metrics.update(m)
        p = self.advect(p, dt)
        return p, metrics
