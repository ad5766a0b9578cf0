"""Predictive-Corrective Incompressible SPH (PCISPH), 3D.

The reference has NO 3D PCISPH (particle_system.py:214-221 raises
NotImplementedError for method 1); its PCISPH lives only in the legacy
2D engine (legacy/engine/sph_solver.py:377-487).  This module is a
capability extension: the legacy prediction–correction loop ported onto
the 3D engine/term mechanism (Solenthaler & Pajarola 2009), wired as
simulationMethod 1.

Loop semantics follow the legacy engine exactly:
- scaling factor from an ideal particle-diameter lattice filling the
  support radius (legacy:377-396), dt-dependent part applied per step:
  s_f = 1 / max(2 (dt m_V0)^2 * (|sum gradW|^2 + sum |gradW|^2), 1e-6);
- prediction–correction until max |rho_err| < 1% rho0, min 3 and max
  1000 iterations (legacy:785-797), as an on-device lax.while_loop;
- each iteration predicts v*/x*, evaluates the continuity density
  derivative and the symmetric pressure force ON PREDICTED POSITIONS
  (legacy:414,443-456) — with the neighbor structure pinned to the
  step-start binning, the classic PCISPH fixed-neighbor-list
  approximation (positions move << h within one dt);
- non-pressure forces and boundary handling reuse the shared 3D
  machinery (gravity + surface tension + viscosity, Akinci boundaries,
  solid pressure mirror p_j := p_i, rho_j := rho0 as in WCSPH.py:58-65).
"""

import numpy as np
import jax
import jax.numpy as jnp

from sph_taichi_tpu.state import MATERIAL_FLUID, MATERIAL_SOLID, Particles
from sph_taichi_tpu.ops.kernels import cubic_kernel_derivative_scalar
from sph_taichi_tpu.models.base import (
    SPHBase, compute_densities, compute_non_pressure_forces, ectx,
    restore_tail, sync_fields)


class PCISPHSolver(SPHBase):
    def __init__(self, params):
        self.max_iterations = 1000   # legacy:794
        self.min_iterations = 3      # legacy:795 (i < 3 keeps looping)
        self.tolerance_frac = 0.01   # 1% rho0 (legacy:793)
        super().__init__(params)
        self.s_f_base = self._scaling_base(params)

    @staticmethod
    def _scaling_base(params):
        """|sum gradW|^2 + sum |gradW|^2 over the ideal filled lattice
        (legacy:377-396, in 3D with the 3D cubic kernel)."""
        h = params.support_radius
        dx = params.particle_diameter
        half = int(np.ceil(h / dx)) + 1
        grad_sum = np.zeros(3)
        grad_dot = 0.0
        for xx in range(-half, half + 1):
            for yy in range(-half, half + 1):
                for zz in range(-half, half + 1):
                    r = -np.array([xx, yy, zz], np.float64) * dx
                    rm = float(np.linalg.norm(r))
                    if 1e-5 < rm < h:
                        d = float(cubic_kernel_derivative_scalar(
                            jnp.float32(rm), h, 3))
                        g = d * r
                        grad_sum += g
                        grad_dot += float(g @ g)
        return float(grad_sum @ grad_sum + grad_dot)

    # ------------------------------------------------------------------
    def _d_rho(self, p: Particles, ctx, x, v, correct=None):
        """Continuity density derivative on (possibly predicted) positions:
        drho_i/dt = rho0 * sum_j m_V_j (v_i - v_j) . gradW_ij.

        With ``correct=(pressure, dt, s_f)`` (fused mode) the PCISPH
        pressure correction runs in the kernel epilogue and
        (pressure', rho_err) is returned instead."""
        params = self.params
        h = params.support_radius
        rho0 = float(self.density_0)

        def term(fi, fj, d2, rn, dots):
            gradw_s = cubic_kernel_derivative_scalar(rn, h, params.dim, inv_r=dots.get("_inv"))
            real = fj["material"] >= 0
            return {"div": jnp.where(real,
                                     fj["m_V"] * gradw_s * dots["v"], 0.0)}

        fields = {"material": p.material, "m_V": p.m_V,
                  "v0": v[:, 0], "v1": v[:, 1], "v2": v[:, 2]}

        if correct is not None:
            pressure, dt, s_f = correct
            fields["density"] = p.density
            fields["pr"] = pressure

            def epi(fi, sums, sc):
                # row-major contract: (1, R) rows; sums are ncomp-tuples
                dtv, sfv = sc[0], sc[1]
                fluid = fi["material"] == float(MATERIAL_FLUID)
                d_rho = jnp.where(fluid, sums["div"][0] * rho0, 0.0)
                rho_err = jnp.where(
                    fluid,
                    jnp.maximum(fi["density"] + dtv * d_rho - rho0, 0.0),
                    0.0)
                pr = jnp.where(
                    fluid, jnp.maximum(fi["pr"] + sfv * rho_err, 0.0), 0.0)
                return {"pr": pr, "rho_err": rho_err}

            out = self.engine.traverse(
                ectx(ctx), x, fields, term, {"div": "scalar"},
                mode="mxu", pair_dots=("v",),
                epilogue=(epi, {"pr": 1, "rho_err": 1},
                          jnp.stack([dt, s_f])))
            zero = jnp.zeros_like(p.pressure)
            return (restore_tail(out["pr"], zero, params),
                    restore_tail(out["rho_err"], zero, params))

        out = self.engine.traverse(
            ectx(ctx), x, fields,
            term, {"div": "scalar"}, mode="mxu", pair_dots=("v",))
        return jnp.where(p.is_fluid(), out["div"] * self.density_0, 0.0)

    def _pressure_accel(self, p: Particles, ctx, x, pressure,
                        predict=None):
        """Symmetric pressure acceleration with the WCSPH solid mirror.

        With ``predict=dt`` (fused mode) the epilogue additionally emits
        the next iteration's predicted state from the ORIGINAL p.v/p.acc
        (v* = v + dt (a_np + a_p); x* = x + dt v*, fluid rows), and
        (p_acc, x*, v*) is returned."""
        params = self.params
        h = params.support_radius
        rho0 = self.density_0

        def term(fi, fj, d2, rn, dots):
            fluid_j = fj["material"] == MATERIAL_FLUID
            solid_j = fj["material"] == MATERIAL_SOLID
            gradw_s = cubic_kernel_derivative_scalar(rn, h, params.dim, inv_r=dots.get("_inv"))
            dpi = fi["pr"] / (fi["density"] * fi["density"])
            dpj = jnp.where(fluid_j,
                            fj["pr"] / (fj["density"] * fj["density"]),
                            fi["pr"] / (rho0 * rho0))
            coef = jnp.where(fluid_j | solid_j,
                             -rho0 * fj["m_V"] * (dpi + dpj) * gradw_s, 0.0)
            return {"ap": coef}

        fields = {"material": p.material, "m_V": p.m_V,
                  "density": p.density, "pr": pressure}

        if predict is not None:
            # NOTE: the predicted x* = x_orig + dt v* must NOT be built
            # here — fi["x?"] inside this traversal is the CURRENT
            # predicted position (the traversal's pair geometry), not
            # x_orig, and adding 3 x_orig fields would push f_used past
            # 16.  v* only needs the original v/acc (10+4 fields), so v*
            # is fused and x* stays a single XLA op in the loop body.
            for k in range(3):
                fields[f"v{k}"] = p.v[:, k]
                fields[f"a{k}"] = p.acc[:, k]

            def epi(fi, sums, sc):
                dtv = sc[0]
                fluid = fi["material"] == float(MATERIAL_FLUID)
                vs = []
                for k in range(3):
                    apk = jnp.where(fluid, sums["ap"][k], 0.0)
                    vs.append(jnp.where(
                        fluid,
                        fi[f"v{k}"] + dtv * (fi[f"a{k}"] + apk),
                        fi[f"v{k}"]))
                return {"vp": tuple(vs)}

            out = self.engine.traverse(
                ectx(ctx), x, fields, term, {"ap": "radial"}, mode="mxu",
                epilogue=(epi, {"vp": 3}, jnp.stack([predict])))
            return restore_tail(jnp.stack(out["vp"], axis=1), p.v, params)

        out = self.engine.traverse(
            ectx(ctx), x, fields,
            term, {"ap": "radial"}, mode="mxu")
        return jnp.stack(out["ap"], axis=1)

    # ------------------------------------------------------------------
    def pressure_solve(self, p: Particles, ctx, dt):
        """Prediction–correction loop (legacy:776-797) on device."""
        params = self.params
        rho0 = self.density_0
        fluid = p.is_fluid()
        fluid3 = fluid[:, None]
        m_like = params.m_V0  # dt m / rho0 == dt m_V0 (m = m_V0 rho0)
        s_f = 1.0 / jnp.maximum(
            2.0 * (dt * m_like) ** 2 * self.s_f_base, 1e-6)
        tol = self.tolerance_frac * rho0

        fused = (getattr(self.engine, "supports_epilogue", False)
                 and not (hasattr(ctx, "ghost_sync")
                          and ctx.ghost_sync is not None))

        if fused:
            # in-kernel epilogues carry the correction (pressure update
            # in _d_rho) and the velocity predict (in _pressure_accel);
            # the final predicted (x*, v*) double as the fluid advect —
            # bitwise the same formula the unfused path applies after
            # the loop (legacy:798-806)
            def body(carry):
                pressure, vp, xp, _, it = carry
                q = p._replace(pressure=pressure)
                pressure, rho_err = self._d_rho(
                    q, ctx, xp, vp, correct=(pressure, dt, s_f))
                err = jnp.max(jnp.abs(rho_err))
                vp = self._pressure_accel(p, ctx, xp, pressure,
                                          predict=dt)
                xp = jnp.where(fluid3, p.x + dt * vp, p.x)
                return pressure, vp, xp, err, it + 1

            def cond(carry):
                _, _, _, err, it = carry
                return ((err >= tol) | (it < self.min_iterations)) \
                    & (it <= self.max_iterations)

            vp0 = jnp.where(fluid3, p.v + dt * p.acc, p.v)
            xp0 = jnp.where(fluid3, p.x + dt * vp0, p.x)
            init = (jnp.zeros_like(p.pressure), vp0, xp0,
                    jnp.asarray(np.inf, jnp.float32),
                    jnp.zeros((), jnp.int32))
            pressure, vp, xp, err, iters = jax.lax.while_loop(
                cond, body, init)
            return pressure, (vp, xp), {"pressure_iters": iters,
                                        "pressure_error": err}

        def body(carry):
            pressure, p_acc, d_rho, _, it = carry
            v_new = jnp.where(fluid3, p.v + dt * (p.acc + p_acc), p.v)
            x_new = jnp.where(fluid3, p.x + dt * v_new, p.x)
            q = p._replace(x=x_new, v=v_new, pressure=pressure)
            q = sync_fields(ctx, q, ["x", "v", "pressure"])
            d_rho = self._d_rho(q, ctx, q.x, q.v)
            # free-surface clamp: the 3D machinery uses summation density,
            # whose deficiency at free surfaces would otherwise pin
            # rho_err at ~-0.5 rho0 forever (the same reason WCSPH clamps
            # density >= rho0 before its EOS and DFSPH clamps adv >= 1)
            rho_err = jnp.where(
                fluid, jnp.maximum(p.density + dt * d_rho - rho0, 0.0), 0.0)
            pressure = jnp.where(
                fluid, jnp.maximum(q.pressure + s_f * rho_err, 0.0), 0.0)
            q = sync_fields(ctx, q._replace(pressure=pressure), ["pressure"])
            p_acc = self._pressure_accel(q, ctx, q.x, q.pressure)
            p_acc = jnp.where(fluid3, p_acc, 0.0)
            err = jnp.max(jnp.abs(rho_err))
            if params.axis_name:
                err = jax.lax.pmax(err, params.axis_name)
            return q.pressure, p_acc, d_rho, err, it + 1

        def cond(carry):
            _, _, _, err, it = carry
            return ((err >= tol) | (it < self.min_iterations)) \
                & (it <= self.max_iterations)

        init = (jnp.zeros_like(p.pressure), jnp.zeros_like(p.v),
                jnp.zeros_like(p.density),
                jnp.asarray(np.inf, jnp.float32), jnp.zeros((), jnp.int32))
        pressure, p_acc, _, err, iters = jax.lax.while_loop(
            cond, body, init)
        return pressure, p_acc, {"pressure_iters": iters,
                                 "pressure_error": err}

    # ------------------------------------------------------------------
    def advect(self, p: Particles, p_acc, dt):
        """v += dt (a_np + a_p); x += dt v for fluid; dynamic rigids by
        non-pressure acceleration only.  Density is re-summed from
        positions at the next substep (the 3D machinery is summation-
        based; the predicted rho + dt*d_rho is used only inside the
        correction loop)."""
        fluid3 = p.is_fluid()[:, None]
        v = jnp.where(fluid3, p.v + dt * (p.acc + p_acc), p.v)
        x = jnp.where(fluid3, p.x + dt * v, p.x)
        dyn_r = p.is_dynamic_rigid()[:, None]
        v = jnp.where(dyn_r, p.v + dt * p.acc, v)
        x = jnp.where(dyn_r, p.x + dt * v, x)
        return p._replace(v=v, x=x)

    # ------------------------------------------------------------------
    def substep(self, p: Particles, ctx, dt):
        p = compute_densities(p, ctx, self.engine, self.params)
        p = compute_non_pressure_forces(p, ctx, self.engine, self.params,
                                        self.g)
        pressure, res, metrics = self.pressure_solve(p, ctx, dt)
        p = p._replace(pressure=pressure)
        if isinstance(res, tuple):
            # fused loop: the final predicted (v*, x*) ARE the fluid
            # advect (bitwise the same formula); rigids advect in XLA
            vp, xp = res
            fluid3 = p.is_fluid()[:, None]
            v = jnp.where(fluid3, vp, p.v)
            x = jnp.where(fluid3, xp, p.x)
            dyn_r = p.is_dynamic_rigid()[:, None]
            v = jnp.where(dyn_r, p.v + dt * p.acc, v)
            x = jnp.where(dyn_r, p.x + dt * v, x)
            p = p._replace(v=v, x=x)
        else:
            p = self.advect(p, res, dt)
        return p, metrics
