"""Implicit Incompressible SPH (IISPH) solver.

The reference ships IISPH.py in a stale form: it targets a neighbor-list
API that no longer exists and is not wired into build_solver
(particle_system.py:214-221), and its a_ii inner loops carry obvious
index typos (IISPH.py:37-42 reuse j for k).  Per SURVEY §7.11 this module
ports the *intended math* — relaxed-Jacobi IISPH (Ihmsen et al. 2014) with
omega = 0.5 (IISPH.py:116), warm start last_pressure = 0.5*p
(IISPH.py:100), tolerance 1e-3 with <= 1000 iterations (IISPH.py:104-112)
— onto the engine/term mechanism, with the solver loop as an on-device
lax.while_loop.

Structure per substep (IISPH.py:259-267):
  densities -> non-pressure forces (gravity + viscosity, IISPH.py:236-249)
  -> predict advection (v* = v + dt*a; a_ii; source term s_i)
  -> relaxed-Jacobi pressure solve -> pressure forces -> advect
  (fluid advects by pressure accel only: v* already includes a_nonp,
  IISPH.py:251-257).

a_ii derivation (corrected form of IISPH.py:20-69):
  S_i = sum_j m_V_j gradW_ij / rho_j^2     (all neighbors)
  G_i = sum_j m_V_j gradW_ij
  Q_i = sum_j m_V_j |gradW_ij|^2
  a_ii = dt^2 rho0^2 ( -S_i . G_i - (m_V_i / rho_i^2) Q_i )
"""

import jax
import jax.numpy as jnp

from sph_taichi_tpu.state import MATERIAL_FLUID, MATERIAL_SOLID, Particles
from sph_taichi_tpu.ops.kernels import (
    cubic_kernel, cubic_kernel_derivative_scalar)
from sph_taichi_tpu.models.base import (
    SPHBase, compute_densities, ectx, restore_tail, sync_fields)

import numpy as np


class IISPHSolver(SPHBase):
    def __init__(self, params):
        self.omega = 0.5          # IISPH.py:116
        self.max_iterations = 1000
        self.tolerance = 1e-3     # IISPH.py:110
        super().__init__(params)

    def _fused(self, ctx):
        """In-kernel epilogue routing (docs/DESIGN.md round 3); sharded
        runs keep the unfused path (ghost-sync granularity)."""
        return (getattr(self.engine, "supports_epilogue", False)
                and not (hasattr(ctx, "ghost_sync")
                         and ctx.ghost_sync is not None))

    # ------------------------------------------------------------------
    def compute_non_pressure(self, p: Particles, ctx, vstar_dt=None):
        """Gravity + fluid viscosity for every real particle
        (IISPH.py:236-249; viscosity_force from sph_base.py:70-78).

        With ``vstar_dt`` (fused mode) the acc chain and the fluid
        v* = v + dt*acc kick (IISPH.py:73-75) run in the epilogue."""
        params = self.params
        h = params.support_radius
        d = 2.0 * (params.dim + 2.0)
        visc = params.viscosity

        def term(fi, fj, d2, rn, dots):
            fluid_j = fj["material"] == MATERIAL_FLUID
            gradw_s = cubic_kernel_derivative_scalar(rn, h, params.dim, inv_r=dots.get("_inv"))
            coef = jnp.where(
                fluid_j,
                d * visc * (fj["m"] / fj["density"]) * dots["v"]
                / (d2 + 0.01 * h * h) * gradw_s, 0.0)
            return {"a": coef}

        fields = {"material": p.material, "m": p.m, "density": p.density,
                  "v0": p.v[:, 0], "v1": p.v[:, 1], "v2": p.v[:, 2]}

        if vstar_dt is not None:
            gl = [float(val) for val in np.asarray(self.g)]

            def epi(fi, sums, sc):
                # row-major contract: (1, R) rows; sums are ncomp-tuples
                dtv = sc[0]
                fluid = fi["material"] == float(MATERIAL_FLUID)
                padm = fi["material"] == -1.0
                aout, vout = [], []
                for k in range(3):
                    a = jnp.where(padm, 0.0, gl[k] + sums["a"][k])
                    aout.append(a)
                    vout.append(jnp.where(fluid,
                                          fi[f"v{k}"] + dtv * a,
                                          fi[f"v{k}"]))
                return {"acc": tuple(aout), "v": tuple(vout)}

            out = self.engine.traverse(
                ectx(ctx), p.x, fields, term, {"a": "radial"},
                mode="mxu", pair_dots=("v",),
                epilogue=(epi, {"acc": 3, "v": 3},
                          jnp.stack([vstar_dt])))
            acc = restore_tail(jnp.stack(out["acc"], axis=1),
                               jnp.zeros_like(p.acc), params)
            v = restore_tail(jnp.stack(out["v"], axis=1), p.v, params)
            return p._replace(acc=acc, v=v)

        out = self.engine.traverse(
            ectx(ctx), p.x, fields,
            term, {"a": "radial"}, mode="mxu", pair_dots=("v",))
        acc = self.g[None, :] + jnp.stack(out["a"], axis=1)
        acc = jnp.where((p.material == -1)[:, None], 0.0, acc)
        return p._replace(acc=acc)

    # ------------------------------------------------------------------
    def predict_advection(self, p: Particles, ctx, dt, vstar_done=False):
        """a_ii, v* and the density-deviation source (IISPH.py:20-100)."""
        params = self.params
        h = params.support_radius
        rho0 = self.density_0

        if not vstar_done:
            # v* = v + dt * a_nonpressure for fluid (IISPH.py:73-75);
            # in fused mode this already rode compute_non_pressure
            v_star = jnp.where(p.is_fluid()[:, None], p.v + dt * p.acc,
                               p.v)
            p = p._replace(v=v_star)
        p = sync_fields(ctx, p, ["v"])

        def term(fi, fj, d2, rn, dots):
            real = fj["material"] >= 0
            gradw_s = cubic_kernel_derivative_scalar(rn, h, params.dim, inv_r=dots.get("_inv"))
            mg = jnp.where(real, fj["m_V"] * gradw_s, 0.0)
            q = mg * gradw_s * d2                 # m_V_j |gradW_ij|^2
            div = mg * dots["v"]                  # m_V_j (v_i-v_j).gradW_ij
            return {"g": mg,
                    "s": mg / (fj["density"] * fj["density"]),
                    "q": q, "div": div}

        fields = {"material": p.material, "m_V": p.m_V,
                  "density": p.density,
                  "v0": p.v[:, 0], "v1": p.v[:, 1], "v2": p.v[:, 2]}
        specs = {"g": "radial", "s": "radial", "q": "scalar",
                 "div": "scalar"}

        if self._fused(ctx):
            fields["pr"] = p.pressure
            rho0f = float(rho0)

            def epi(fi, sums, sc):
                dtv = sc[0]
                g = sums["g"]
                s = sums["s"]
                dot_sg = s[0] * g[0] + s[1] * g[1] + s[2] * g[2]
                rho2 = fi["density"] * fi["density"]
                a_ii = (dtv * dtv) * (rho0f * rho0f) * (
                    -dot_sg - (fi["m_V"] / rho2) * sums["q"][0])
                source = (rho0f - fi["density"]
                          - dtv * sums["div"][0] * rho0f)
                return {"a_ii": a_ii, "source": source,
                        "last_p": 0.5 * fi["pr"]}

            out = self.engine.traverse(
                ectx(ctx), p.x, fields, term, specs, mode="mxu",
                pair_dots=("v",),
                epilogue=(epi, {"a_ii": 1, "source": 1, "last_p": 1},
                          jnp.stack([dt])))
            zero = jnp.zeros_like(p.pressure)
            return (p, restore_tail(out["a_ii"], zero, params),
                    restore_tail(out["source"], zero, params),
                    restore_tail(out["last_p"], zero, params))

        out = self.engine.traverse(
            ectx(ctx), p.x, fields, term, specs,
            mode="mxu", pair_dots=("v",))

        gx, gy, gz = out["g"]
        sx, sy, sz = out["s"]
        dot_sg = sx * gx + sy * gy + sz * gz
        rho2 = p.density * p.density
        a_ii = (dt * dt) * (rho0 * rho0) * (
            -dot_sg - (p.m_V / rho2) * out["q"])

        # source term (IISPH.py:77-94)
        source = rho0 - p.density - dt * out["div"] * rho0
        last_pressure = 0.5 * p.pressure   # warm start (IISPH.py:100)
        return p, a_ii, source, last_pressure

    # ------------------------------------------------------------------
    def _pressure_accel(self, p: Particles, ctx, pressure,
                        advect_dt=None, lanes=None):
        """Symmetric pressure acceleration from a pressure field
        (IISPH.py:114-144 / :202-233).

        With ``advect_dt`` (fused mode) the fluid advect — v += dt*a_p
        (v already holds v*), x += dt*v (IISPH.py:251-257) — runs in the
        epilogue; positions here ARE the originals, so (v', x') is
        returned."""
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
        if lanes is not None:
            assert tuple(sorted(fields)) == lanes.names, \
                (sorted(fields), lanes.names)
            fields = lanes

        if advect_dt is not None:
            for k in range(3):
                fields[f"v{k}"] = p.v[:, k]

            def epi(fi, sums, sc):
                dtv = sc[0]
                fluid = fi["material"] == float(MATERIAL_FLUID)
                vs, xs = [], []
                for k in range(3):
                    vk = jnp.where(fluid, fi[f"v{k}"] + dtv * sums["ap"][k],
                                   fi[f"v{k}"])
                    xs.append(jnp.where(fluid, fi[f"x{k}"] + dtv * vk,
                                        fi[f"x{k}"]))
                    vs.append(vk)
                return {"v": tuple(vs), "x": tuple(xs)}

            out = self.engine.traverse(
                ectx(ctx), p.x, fields, term, {"ap": "radial"},
                mode="mxu",
                epilogue=(epi, {"v": 3, "x": 3}, jnp.stack([advect_dt])))
            v = restore_tail(jnp.stack(out["v"], axis=1), p.v, params)
            x = restore_tail(jnp.stack(out["x"], axis=1), p.x, params)
            return p._replace(v=v, x=x)

        out = self.engine.traverse(
            ectx(ctx), p.x, fields,
            term, {"ap": "radial"}, mode="mxu")
        return jnp.stack(out["ap"], axis=1)

    def _apply_A(self, p: Particles, ctx, accel, update=None,
                 lanes=None):
        """Ap_i = dt^2 rho0 sum_j m_V_j (a_i - a_j).gradW_ij
        (IISPH.py:146-163) — dt^2 applied by the caller.

        With ``update=(a_ii, source, last_p, dt2, rho0)`` (fused mode)
        the relaxed-Jacobi pressure update and the per-particle error
        term run in the epilogue; returns (new_p, err_term)."""
        params = self.params
        h = params.support_radius

        def term(fi, fj, d2, rn, dots):
            real = fj["material"] >= 0
            gradw_s = cubic_kernel_derivative_scalar(rn, h, params.dim, inv_r=dots.get("_inv"))
            return {"ap": jnp.where(real,
                                    fj["m_V"] * gradw_s * dots["a"],
                                    0.0)}

        fields = {"material": p.material, "m_V": p.m_V,
                  "a0": accel[:, 0], "a1": accel[:, 1], "a2": accel[:, 2]}
        if update is not None:
            a_ii, source, last_p, dt2, rho0 = update
            rho0f = float(rho0)
            omega = float(self.omega)
            fields["a_ii"] = a_ii
            fields["source"] = source
            fields["last_p"] = last_p

            def epi(fi, sums, sc):
                ap = sums["ap"][0] * sc[0] * rho0f
                real_c = fi["material"] >= 0.0
                new_p = jnp.where(
                    jnp.abs(fi["a_ii"]) > 1e-6,
                    jnp.maximum(
                        fi["last_p"]
                        + omega * (fi["source"] - ap) / fi["a_ii"], 0.0),
                    0.0)
                new_p = jnp.where(real_c, new_p, 0.0)
                err = jnp.where(real_c & (new_p != 0.0),
                                jnp.abs(ap - fi["source"]) / rho0f, 0.0)
                return {"new_p": new_p, "err": err}

            if lanes is not None:
                assert tuple(sorted(fields)) == lanes.names, \
                    (sorted(fields), lanes.names)
                fields = lanes
            out = self.engine.traverse(
                ectx(ctx), p.x, fields, term, {"ap": "scalar"},
                mode="mxu", pair_dots=("a",),
                epilogue=(epi, {"err": 1, "new_p": 1},
                          jnp.stack([dt2])))
            zero = jnp.zeros_like(p.pressure)
            return (restore_tail(out["new_p"], zero, params),
                    restore_tail(out["err"], zero, params))

        out = self.engine.traverse(
            ectx(ctx), p.x, fields,
            term, {"ap": "scalar"}, mode="mxu", pair_dots=("a",))
        return out["ap"]

    # ------------------------------------------------------------------
    def pressure_solve(self, p: Particles, ctx, a_ii, source, last_pressure,
                       dt):
        """Relaxed Jacobi to avg |Ap - s|/rho0 < 1e-3, <= 1000 iterations
        (IISPH.py:102-179) as an on-device while_loop."""
        params = self.params
        rho0 = self.density_0
        dt2 = dt * dt
        real = p.material >= 0
        owned = real & (p.is_dynamic >= 0)
        fused = self._fused(ctx)

        buf_pa = buf_aa = None
        if fused and getattr(self.engine, "supports_lanes", False) \
                and not (hasattr(ctx, "ghost_sync")
                         and ctx.ghost_sync is not None):
            # prebuilt lanes reused across Jacobi iterations (see
            # pallas_blocks.make_lanes): only pr / accel / last_p rows
            # change per iteration
            buf_pa = self.engine.make_lanes(
                p.x, {"material": p.material, "m_V": p.m_V,
                      "density": p.density,
                      "pr": jnp.zeros_like(p.pressure)})
            zc = jnp.zeros_like(p.pressure)
            buf_aa = self.engine.make_lanes(
                p.x, {"material": p.material, "m_V": p.m_V,
                      "a0": zc, "a1": zc, "a2": zc,
                      "a_ii": a_ii, "source": source, "last_p": zc})

        def body(carry):
            last_p, _, it = carry
            lpa = None if buf_pa is None else self.engine.update_lanes(
                buf_pa, {"pr": last_p})
            accel = self._pressure_accel(p, ctx, last_p, lanes=lpa)
            if fused:
                laa = None if buf_aa is None else self.engine.update_lanes(
                    buf_aa, {"a0": accel[:, 0], "a1": accel[:, 1],
                             "a2": accel[:, 2], "last_p": last_p})
                new_p, err_t = self._apply_A(
                    p, ctx, accel,
                    update=(a_ii, source, last_p, dt2, rho0),
                    lanes=laa)
                err = jnp.sum(err_t) / params.n_particles
                return new_p, err, it + 1
            ap = self._apply_A(p, ctx, accel) * dt2 * rho0
            new_p = jnp.where(
                jnp.abs(a_ii) > 1e-6,
                jnp.maximum(last_p + self.omega * (source - ap) / a_ii, 0.0),
                0.0)
            new_p = jnp.where(real, new_p, 0.0)
            err = jnp.sum(jnp.where(owned & (new_p != 0.0),
                                    jnp.abs(ap - source) / rho0, 0.0))
            if params.axis_name:
                err = jax.lax.psum(err, params.axis_name)
            err = err / params.n_particles
            new_p = self._sync(ctx, p, new_p)
            return new_p, err, it + 1

        def cond(carry):
            _, err, it = carry
            return (it == 0) | ((err >= self.tolerance)
                                & (it < self.max_iterations))

        init = (last_pressure, jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.int32))
        pressure, err, iters = jax.lax.while_loop(cond, body, init)
        return pressure, {"pressure_iters": iters, "pressure_error": err}

    def _sync(self, ctx, p, arr):
        q = sync_fields(ctx, p._replace(pressure=arr), ["pressure"])
        return q.pressure

    # ------------------------------------------------------------------
    def advect(self, p: Particles, pressure_accel, dt):
        """Fluid only: v += dt*a_p (v already holds v*); x += dt*v
        (IISPH.py:251-257)."""
        m = p.is_fluid()[:, None]
        v = jnp.where(m, p.v + dt * pressure_accel, p.v)
        x = jnp.where(m, p.x + dt * v, p.x)
        return p._replace(v=v, x=x)

    # ------------------------------------------------------------------
    def substep(self, p: Particles, ctx, dt):
        p = compute_densities(p, ctx, self.engine, self.params)
        fused = self._fused(ctx)
        if fused:
            p = self.compute_non_pressure(p, ctx, vstar_dt=dt)
        else:
            p = self.compute_non_pressure(p, ctx)
        p, a_ii, source, last_p = self.predict_advection(
            p, ctx, dt, vstar_done=fused)
        pressure, metrics = self.pressure_solve(
            p, ctx, a_ii, source, last_p, dt)
        p = p._replace(pressure=pressure)
        if fused:
            p = self._pressure_accel(p, ctx, pressure, advect_dt=dt)
        else:
            accel = self._pressure_accel(p, ctx, pressure)
            accel = jnp.where(p.is_fluid()[:, None], accel, 0.0)
            p = self.advect(p, accel, dt)
        return p, metrics
