"""Weakly-compressible SPH solver (TPU-native counterpart of WCSPH.py).

Substep pipeline (WCSPH.py:152-156): densities -> non-pressure forces ->
Tait-EOS pressure forces -> symplectic Euler advection, with every pair
sum evaluated by the pluggable traversal engine.

Behavioral parity notes (quirks intentionally preserved):
- density is clamped to >= rho0 *and stored* before the EOS (WCSPH.py:75);
- the boundary pressure mirror uses p_j := p_i and rho_j := rho0
  (WCSPH.py:58-65);
- boundary viscosity coefficient is 0.0 (WCSPH.py:118) so the viscosity
  reaction on rigid bodies vanishes exactly;
- two-way coupling: the reference's atomic scatter
  `acceleration[p_j] += -f_p * rho0 / rho_j` (WCSPH.py:67-68) is computed
  here from the rigid particle's side as a sum over its fluid
  neighbors — same pair terms, deterministic summation.  Both the fluid
  pressure acceleration and the rigid reaction come out of ONE traversal.
"""

import jax.numpy as jnp

from sph_taichi_tpu.state import MATERIAL_FLUID, MATERIAL_SOLID, Particles
from sph_taichi_tpu.ops.kernels import cubic_kernel_derivative_scalar
from sph_taichi_tpu.ops.pairs import vscale
from sph_taichi_tpu.models.base import (
    SPHBase, compute_densities, compute_non_pressure_forces, ectx,
    sync_fields)


class WCSPHSolver(SPHBase):
    def __init__(self, params):
        self.exponent = params.exponent      # WCSPH.py:9-10
        self.stiffness = params.stiffness    # WCSPH.py:12-13
        super().__init__(params)

    def substep(self, p: Particles, ctx, dt):
        params = self.params
        p = compute_densities(p, ctx, self.engine, params)
        p = compute_non_pressure_forces(p, ctx, self.engine, params, self.g)
        p = self.compute_pressure_forces(p, ctx)
        p = self.advect(p, dt)
        return p, {}

    def compute_pressure_forces(self, p: Particles, ctx):
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
        # no ghost hop needed here: ghost centers run the same elementwise
        # clamp+EOS on their already-synced density

        def term(fi, fj, rvec, rn):
            gradw_s = cubic_kernel_derivative_scalar(rn, h, params.dim)
            fluid_j = fj["material"] == MATERIAL_FLUID
            solid_j = fj["material"] == MATERIAL_SOLID

            # fluid-centered pressure acceleration (WCSPH.py:47-66):
            # gradW(x_i - x_j) = gradw_s * rvec
            dpi = fi["pressure"] / (fi["density"] * fi["density"])
            dpj_fluid = fj["pressure"] / (fj["density"] * fj["density"])
            dpj_solid = fi["pressure"] / (rho0 * rho0)  # mirror p_j := p_i
            dpj = jnp.where(fluid_j, dpj_fluid, dpj_solid)
            coef = jnp.where(fluid_j | solid_j,
                             -rho0 * fj["m_V"] * (dpi + dpj) * gradw_s, 0.0)

            # reaction on dynamic-rigid centers (WCSPH.py:67-68 as gather):
            # center c rigid, neighbor k fluid:
            #   f_p(k,c) = -rho0*m_V_c*(p_k/rho_k^2 + p_k/rho0^2)*gradW(x_k-x_c)
            #   acc_c += -f_p * rho0/rho_c,  gradW(x_k-x_c) = -gradw_s*rvec
            dpi_k = fj["pressure"] / (fj["density"] * fj["density"]) \
                + fj["pressure"] / (rho0 * rho0)
            react_coef = jnp.where(
                fluid_j,
                -(rho0 * fi["m_V"] * dpi_k) * (rho0 / fi["density"]) * gradw_s,
                0.0)
            return {"dv": vscale(coef, rvec), "react": vscale(react_coef, rvec)}

        out = self.engine.traverse(
            ectx(ctx), p.x,
            {"material": p.material, "m_V": p.m_V, "density": p.density,
             "pressure": p.pressure},
            term, {"dv": "vec", "react": "vec"})
        dv = jnp.stack(out["dv"], axis=1)
        a_react = jnp.stack(out["react"], axis=1)

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
