"""Weakly-compressible SPH solver (TPU-native counterpart of WCSPH.py).

Substep pipeline (WCSPH.py:152-156): densities -> non-pressure forces ->
Tait-EOS pressure forces -> symplectic Euler advection, as one fused jnp
program over the per-step neighbor lists.

Behavioral parity notes (quirks intentionally preserved):
- density is clamped to >= rho0 *and stored* before the EOS (WCSPH.py:75);
- the boundary pressure mirror uses p_j := p_i and rho_j := rho0
  (WCSPH.py:58-65);
- boundary viscosity coefficient is 0.0 (WCSPH.py:118) so the viscosity
  reaction on rigid bodies vanishes exactly;
- two-way coupling: the reference's atomic scatter
  `acceleration[p_j] += -f_p * rho0 / rho_j` (WCSPH.py:67-68) is computed
  here from the rigid particle's side as a gather over its fluid
  neighbors — same pair terms, deterministic summation.
"""

import jax.numpy as jnp

from sph_taichi_tpu.state import MATERIAL_FLUID, MATERIAL_SOLID, Particles
from sph_taichi_tpu.ops.kernels import cubic_kernel_derivative_scalar
from sph_taichi_tpu.models.base import (
    SPHBase, compute_densities, compute_non_pressure_forces)


class WCSPHSolver(SPHBase):
    def __init__(self, params):
        self.exponent = params.exponent      # WCSPH.py:9-10
        self.stiffness = params.stiffness    # WCSPH.py:12-13
        super().__init__(params)

    def substep(self, p: Particles, nl, dt):
        params = self.params
        p = compute_densities(p, nl, params)
        p = compute_non_pressure_forces(p, nl, params, self.g)
        p = self.compute_pressure_forces(p, nl)
        p = self.advect(p, dt)
        return p, {}

    def compute_pressure_forces(self, p: Particles, nl):
        """WCSPH.py:46-85 + the rigid reaction of :67-68 in gather form."""
        params = self.params
        h = params.support_radius
        rho0 = self.density_0

        # -- density clamp + Tait EOS, fluid only (WCSPH.py:75-76) --
        density = jnp.where(p.is_fluid(),
                            jnp.maximum(p.density, rho0), p.density)
        pressure = jnp.where(
            p.is_fluid(),
            self.stiffness * (jnp.power(density / rho0, self.exponent) - 1.0),
            p.pressure)
        p = p._replace(density=density, pressure=pressure)

        # -- shared pair geometry --
        xj = p.x[nl.idx]
        r = p.x[:, None, :] - xj            # x_i - x_j
        rn = jnp.linalg.norm(r, axis=-1)
        gradw = cubic_kernel_derivative_scalar(rn, h, params.dim)[..., None] * r
        mat_j = p.material[nl.idx]
        valid = nl.mask()
        fluid_j = valid & (mat_j == MATERIAL_FLUID)
        solid_j = valid & (mat_j == MATERIAL_SOLID)
        m_v_j = p.m_V[nl.idx]

        # -- fluid-centered pressure acceleration (WCSPH.py:47-66) --
        dpi = p.pressure / (p.density * p.density)          # (N,)
        dpj_fluid = p.pressure[nl.idx] / jnp.square(p.density[nl.idx])
        dpj_solid = (p.pressure / (rho0 * rho0))[:, None]   # mirror: p_i / rho0^2
        dpj = jnp.where(fluid_j, dpj_fluid, dpj_solid)
        coef = jnp.where(fluid_j | solid_j,
                         -rho0 * m_v_j * (dpi[:, None] + dpj), 0.0)
        dv = jnp.sum(coef[..., None] * gradw, axis=1)

        # -- reaction on dynamic rigid centers (gather form of WCSPH.py:67-68)
        # For rigid j with fluid neighbor i:
        #   f_p(i,j) = -rho0 * m_V_j * (p_i/rho_i^2 + p_i/rho0^2) * gradW(x_i - x_j)
        #   acc_j += -f_p * rho0 / rho_j
        # Here the center is the rigid particle (call it c) and neighbors are
        # its fluid particles (call them k): gradW(x_k - x_c) = -gradw_ck.
        p_i = p.pressure[nl.idx]                    # fluid neighbor pressure
        rho_i = p.density[nl.idx]
        dpi_k = p_i / (rho_i * rho_i) + p_i / (rho0 * rho0)
        # f_p seen from the rigid side: -rho0 * m_V_c * dpi_k * (-gradw)
        f_p = (rho0 * p.m_V[:, None] * dpi_k)[..., None] * gradw
        react = -f_p * (rho0 / p.density)[:, None, None]
        react = jnp.where(fluid_j[..., None], react, 0.0)
        a_react = jnp.sum(react, axis=1)

        is_dyn_rigid = p.is_dynamic_rigid()
        acc = jnp.where(p.is_fluid()[:, None], p.acc + dv, p.acc)
        acc = jnp.where(is_dyn_rigid[:, None], p.acc + a_react, acc)
        acc = jnp.where(p.is_static_rigid()[:, None], 0.0, acc)  # WCSPH.py:78-79
        return p._replace(acc=acc)

    def advect(self, p: Particles, dt):
        """Symplectic Euler for every dynamic particle (WCSPH.py:143-149)."""
        dyn = (p.is_dynamic != 0)[:, None]
        v = jnp.where(dyn, p.v + dt * p.acc, p.v)
        x = jnp.where(dyn, p.x + dt * v, p.x)
        return p._replace(v=v, x=x)
