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
  around each solve (DFSPH.py:229-233,241,267,323);
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
from sph_taichi_tpu.ops.kernels import (
    cubic_kernel, cubic_kernel_derivative_scalar)
from sph_taichi_tpu.models.base import (
    SPHBase, compute_densities, compute_non_pressure_forces, ectx,
    restore_tail as _restore_tail, sync_fields)


class DFSPHSolver(SPHBase):
    def __init__(self, params):
        self.m_max_iterations_v = 100   # DFSPH.py:14
        self.m_max_iterations = 100     # DFSPH.py:15
        self.m_eps = 1e-5               # DFSPH.py:17
        self.max_error_V = 0.1          # % , DFSPH.py:19
        self.max_error = 0.05           # % , DFSPH.py:20
        self.enable_divergence_solver = True
        super().__init__(params)
        # W(0) as a Python constant for the fused epilogue (jnp inside
        # jit is traced; this is computed eagerly at build time)
        self._w0 = float(cubic_kernel(jnp.zeros(()),
                                      params.support_radius, params.dim))

    def _fused(self, ctx):
        """Route elementwise consumers through the engine's in-kernel
        epilogue (docs/DESIGN.md round 3: standalone XLA elementwise
        stages cost ~10 ms/step at dragon scale regardless of flops).
        Sharded runs keep the unfused path (ghost-sync granularity)."""
        return (getattr(self.engine, "supports_epilogue", False)
                and not (hasattr(ctx, "ghost_sync")
                         and ctx.ghost_sync is not None))

    # ------------------------------------------------------------------
    def density_and_factor(self, p: Particles, ctx):
        """Fused compute_densities (DFSPH.py:37-47) + compute_DFSPH_factor
        (DFSPH.py:115-155): both only need pair geometry and m_V, so they
        share one traversal on TPU."""
        params = self.params
        h = params.support_radius

        def term(fi, fj, d2, rn, dots):
            real = fj["material"] >= 0
            w = cubic_kernel(rn, h, params.dim)
            den = jnp.where(real, fj["m_V"] * w, 0.0)
            gradw_s = cubic_kernel_derivative_scalar(rn, h, params.dim, inv_r=dots.get("_inv"))
            gcoef = -fj["m_V"] * gradw_s
            sq = jnp.where(fj["material"] == MATERIAL_FLUID,
                           gcoef * gcoef * d2, 0.0)
            return {"den": den,
                    "grad": jnp.where(real, -gcoef, 0.0), "sq": sq}

        fields = {"material": p.material, "m_V": p.m_V}
        specs = {"den": "scalar", "grad": "radial", "sq": "scalar"}
        rho0 = float(self.density_0)
        w0 = self._w0

        if self._fused(ctx):
            fields["den0"] = p.density

            def epi(fi, sums, sc):
                # row-major contract: (1, R) rows; sums are ncomp-tuples
                fluid = fi["material"] == float(MATERIAL_FLUID)
                den = fi["m_V"] * w0 + sums["den"][0]
                density = jnp.where(fluid, den * rho0, fi["den0"])
                g = sums["grad"]
                s = (sums["sq"][0] + g[0] * g[0] + g[1] * g[1]
                     + g[2] * g[2])
                factor = jnp.where(s > 1e-6, -1.0 / s, 0.0)
                return {"density": density,
                        "factor": jnp.where(fluid, factor, 0.0)}

            out = self.engine.traverse(
                ectx(ctx), p.x, fields, term, specs, mode="mxu",
                epilogue=(epi, {"density": 1, "factor": 1},
                          jnp.zeros((1,), jnp.float32)))
            density = _restore_tail(out["density"], p.density, params)
            factor = _restore_tail(out["factor"],
                                   jnp.zeros_like(p.dfsph_factor), params)
            return p._replace(density=density, dfsph_factor=factor)

        out = self.engine.traverse(
            ectx(ctx), p.x, fields, term, specs, mode="mxu")

        den = p.m_V * cubic_kernel(jnp.zeros((), p.x.dtype), h, params.dim) \
            + out["den"]
        density = jnp.where(p.is_fluid(), den * self.density_0, p.density)

        gx, gy, gz = out["grad"]
        sum_grad_p_k = out["sq"] + gx * gx + gy * gy + gz * gz
        factor = jnp.where(sum_grad_p_k > 1e-6, -1.0 / sum_grad_p_k, 0.0)
        factor = jnp.where(p.is_fluid(), factor, 0.0)

        p = p._replace(density=density, dfsph_factor=factor)
        return sync_fields(ctx, p, ["density", "dfsph_factor"])

    def compute_factor(self, p: Particles, ctx):
        """alpha_i = -1 / (|sum grad|^2 + sum |grad|^2) (DFSPH.py:115-155).

        Fluid neighbors contribute to both terms; solid neighbors only to
        the gradient sum. factor = 0 when denominator <= 1e-6."""
        params = self.params
        h = params.support_radius

        def term(fi, fj, d2, rn, dots):
            gradw_s = cubic_kernel_derivative_scalar(rn, h, params.dim, inv_r=dots.get("_inv"))
            # grad_p_j = -m_V_j * gradW(x_i - x_j)
            gcoef = -fj["m_V"] * gradw_s
            real = fj["material"] >= 0
            # grad_p_i -= grad_p_j for both fluid and solid neighbors
            sq = jnp.where(fj["material"] == MATERIAL_FLUID,
                           gcoef * gcoef * d2, 0.0)
            return {"grad": jnp.where(real, -gcoef, 0.0), "sq": sq}

        out = self.engine.traverse(
            ectx(ctx), p.x, {"material": p.material, "m_V": p.m_V},
            term, {"grad": "radial", "sq": "scalar"}, mode="mxu")
        gx, gy, gz = out["grad"]
        sum_grad_p_k = out["sq"] + gx * gx + gy * gy + gz * gz
        factor = jnp.where(sum_grad_p_k > 1e-6, -1.0 / sum_grad_p_k, 0.0)
        return jnp.where(p.is_fluid(), factor, 0.0)

    def _density_change(self, p: Particles, ctx, v, lanes=None,
                        with_err=False):
        """d(rho)/dt term, clamped >= 0, zeroed on particle deficiency
        (compute_density_change, DFSPH.py:158-194). Also returns the
        neighbor count used for the deficiency test.

        with_err=True (fused path only): additionally emit the per-center
        avg-density-error addend rho0*adv as an epilogue output column
        (VERDICT r4 item 3a) so the Jacobi loop's convergence reduction
        consumes a kernel-ready column instead of re-deriving it in a
        separate XLA elementwise+reduce stage each iteration.  Returns
        (adv, err) with err = sum/n_fluid, or (adv, None) when the
        engine computed no error column (caller falls back to
        _avg_density_error)."""
        params = self.params
        h = params.support_radius

        def term(fi, fj, d2, rn, dots):
            gradw_s = cubic_kernel_derivative_scalar(rn, h, params.dim, inv_r=dots.get("_inv"))
            real = fj["material"] >= 0
            div = jnp.where(real, fj["m_V"] * gradw_s * dots["v"], 0.0)
            return {"div": div, "cnt": jnp.where(real, 1.0, 0.0)}

        fields = {"material": p.material, "m_V": p.m_V,
                  "v0": v[:, 0], "v1": v[:, 1], "v2": v[:, 2]}
        specs = {"div": "scalar", "cnt": "scalar"}
        min_nbr = float(20 if params.dim == 3 else 7)
        rho0 = float(self.density_0)
        if lanes is not None:
            assert tuple(sorted(fields)) == lanes.names, \
                (sorted(fields), lanes.names)
            fields = lanes

        if self._fused(ctx):
            def epi(fi, sums, sc):
                adv = jnp.maximum(sums["div"][0], 0.0)
                adv = jnp.where(sums["cnt"][0] < min_nbr, 0.0, adv)
                adv = jnp.where(
                    fi["material"] == float(MATERIAL_FLUID), adv, 0.0)
                res = {"adv": adv}
                if with_err:
                    res["errt"] = jnp.where(
                        fi["material"] == float(MATERIAL_FLUID),
                        rho0 * adv, 0.0)
                return res

            epi_specs = {"adv": 1}
            if with_err:
                epi_specs["errt"] = 1
            out = self.engine.traverse(
                ectx(ctx), p.x, fields, term, specs, mode="mxu",
                pair_dots=("v",),
                epilogue=(epi, epi_specs, jnp.zeros((1,), jnp.float32)))
            adv = _restore_tail(out["adv"], jnp.zeros_like(p.density),
                                params)
            err = None
            if with_err:
                n_real = params.n_fluid + params.n_solid
                err = jnp.sum(out["errt"][:n_real]) / params.n_fluid
            return (adv, err) if with_err else adv

        out = self.engine.traverse(
            ectx(ctx), p.x, fields, term, specs,
            mode="mxu", pair_dots=("v",))
        adv = jnp.maximum(out["div"], 0.0)
        adv = jnp.where(out["cnt"] < min_nbr, 0.0, adv)
        adv = jnp.where(p.is_fluid(), adv, 0.0)
        return (adv, None) if with_err else adv

    def _density_adv(self, p: Particles, ctx, v, density, dt,
                     lanes=None, with_err=False):
        """rho*/rho0 = rho/rho0 + dt*div, clamped >= 1
        (compute_density_adv, DFSPH.py:197-218).  with_err: see
        _density_change."""
        params = self.params
        h = params.support_radius

        def term(fi, fj, d2, rn, dots):
            gradw_s = cubic_kernel_derivative_scalar(rn, h, params.dim, inv_r=dots.get("_inv"))
            real = fj["material"] >= 0
            return {"div": jnp.where(real,
                                     fj["m_V"] * gradw_s * dots["v"],
                                     0.0)}

        fields = {"material": p.material, "m_V": p.m_V,
                  "v0": v[:, 0], "v1": v[:, 1], "v2": v[:, 2]}
        rho0 = float(self.density_0)

        if self._fused(ctx):
            fields["density"] = density
            if lanes is not None:
                assert tuple(sorted(fields)) == lanes.names, \
                    (sorted(fields), lanes.names)
                fields = lanes

            def epi(fi, sums, sc):
                adv = fi["density"] / rho0 + sc[0] * sums["div"][0]
                adv = jnp.maximum(adv, 1.0)
                adv = jnp.where(
                    fi["material"] == float(MATERIAL_FLUID), adv, 0.0)
                res = {"adv": adv}
                if with_err:
                    # avg-density-error addend rho0*(adv - 1) per fluid
                    # center (VERDICT r4 item 3a): kernel-ready column,
                    # see _density_change
                    res["errt"] = jnp.where(
                        fi["material"] == float(MATERIAL_FLUID),
                        rho0 * adv - rho0, 0.0)
                return res

            epi_specs = {"adv": 1}
            if with_err:
                epi_specs["errt"] = 1
            out = self.engine.traverse(
                ectx(ctx), p.x, fields, term, {"div": "scalar"},
                mode="mxu", pair_dots=("v",),
                epilogue=(epi, epi_specs, jnp.stack([dt])))
            adv = _restore_tail(out["adv"], jnp.zeros_like(density),
                                params)
            err = None
            if with_err:
                n_real = params.n_fluid + params.n_solid
                err = jnp.sum(out["errt"][:n_real]) / params.n_fluid
            return (adv, err) if with_err else adv

        if lanes is not None:
            assert tuple(sorted(fields)) == lanes.names, \
                (sorted(fields), lanes.names)
            fields = lanes
        out = self.engine.traverse(
            ectx(ctx), p.x, fields,
            term, {"div": "scalar"}, mode="mxu", pair_dots=("v",))
        adv = density / self.density_0 + dt * out["div"]
        adv = jnp.maximum(adv, 1.0)
        adv = jnp.where(p.is_fluid(), adv, 0.0)
        return (adv, None) if with_err else adv

    def _avg_density_error(self, p: Particles, adv, offset):
        """sum over fluid of (rho0*adv - offset) / n_fluid
        (DFSPH.py:221-227 + :274,:350)."""
        center = p.is_fluid() & (p.is_dynamic != 0)  # excludes ghost copies
        err = jnp.sum(jnp.where(center,
                                self.density_0 * adv - offset, 0.0))
        if self.params.axis_name:
            err = jax.lax.psum(err, self.params.axis_name)
        return err / self.params.n_fluid

    # A/B knob: fusing the Jacobi v-update into _solver_dv's epilogue
    # removes the per-iteration XLA elementwise stage but adds v (and
    # acc/is_dyn for reaction scenes) as traversal fields, pushing that
    # traversal's f_pad from 8 to 16 (double span-DMA/assembly volume).
    # Device A/B (j85, evolved dragon_bath_dfsph, real v5e): fused
    # 432.8 ms/step vs unfused 425.6 — the doubled assembly volume
    # slightly outweighs the saved per-iteration XLA stage, so the
    # default is UNFUSED.  Caveat (ADVICE r3): that 1.7% delta is a
    # single run each, within plausible run-to-run noise (j100-class
    # repeats vary ~1-3 ms/step); treat the default as provisional
    # until a repeated A/B settles it — both sides are correct and
    # interpret-tested, so the risk is perf-only.  (All other DFSPH epilogue fusions — density+
    # alpha, clamps, non-pressure+predict — have no f_pad cost and stay.)
    fuse_solver_dv = False

    def _use_lanes(self, ctx):
        """Prebuilt-lanes reuse across Jacobi iterations (BlockEngine
        only; sharded runs rebuild fields at ghost-sync granularity).
        Each iteration then refreshes only the changed rows (kappa, v)
        instead of re-stacking the full (f_pad, n) kernel input slab."""
        return (getattr(self.engine, "supports_lanes", False)
                and not (hasattr(ctx, "ghost_sync")
                         and ctx.ghost_sync is not None))

    # ------------------------------------------------------------------
    def _solver_dv(self, p, ctx, kappa, with_reaction, dt,
                   v=None, acc=None, lanes=None):
        """One Jacobi velocity update:
        dv_i = -dt * sum_fluid_j [k_i + k_j] grad_p_j
               -dt * sum_solid_j k_i grad_p_j         (gated on m_eps)
        plus (optionally) the rigid reaction sum for dynamic-rigid centers
        (gather form of DFSPH.py:388-389):
        da_c = sum_fluid_k (|k_k|>eps) k_k * m_V_c * gradW(x_c-x_k) * rho_k/rho_c

        With ``v`` given (fused mode) the velocity update — and, with
        reaction, the acceleration accumulation — runs in the kernel
        epilogue and the UPDATED arrays are returned: (v', acc'|None).
        Otherwise returns (dv, react|None) as raw sums.
        """
        params = self.params
        h = params.support_radius
        eps = self.m_eps

        def term(fi, fj, d2, rn, dots):
            # NOTE: dt is traced (SimState.dt) and must not be captured by
            # the term closure (the Pallas kernel takes no traced
            # constants); it scales "dv" linearly, so it is applied after
            # the traversal instead.
            gradw_s = cubic_kernel_derivative_scalar(rn, h, params.dim, inv_r=dots.get("_inv"))
            fluid_j = fj["material"] == MATERIAL_FLUID
            solid_j = fj["material"] == MATERIAL_SOLID
            k_i = fi["kappa"]
            k_j = fj["kappa"]
            k_sum = k_i + k_j
            # grad_p_j = -m_V_j * gradw_s * rvec
            coef_fluid = jnp.where(
                fluid_j & (jnp.abs(k_sum) > eps),
                k_sum * fj["m_V"] * gradw_s, 0.0)
            coef_solid = jnp.where(
                solid_j & (jnp.abs(k_i) > eps),
                k_i * fj["m_V"] * gradw_s, 0.0)
            dv_coef = coef_fluid + coef_solid
            if with_reaction:
                # rigid reaction (gather form of DFSPH.py:388-389).  The
                # dv sum is consumed only by FLUID centers (v update is
                # fluid-gated) and the reaction only by dynamic-rigid
                # centers — mutually exclusive per center, so both ride
                # ONE radial output selected by center material (3 lane
                # reduces + 3 writeback lanes instead of 6).  The
                # density quotient is restructured as
                # (k_j*rho_j)*gradw * (m_V_i/rho_i): the divide becomes
                # a per-center COLUMN op instead of per candidate lane
                # (<=1 ulp shift, same class as the rsqrt reduction).
                # denominator clamp (ADVICE r4): pad rows and the blocks
                # kernel's invalid-center sentinel carry density == 0, so
                # the bare per-center quotient is 0/0 = NaN, and the
                # where-masked lane value times NaN is NaN again.  All
                # current consumers re-mask with selects, but a clamped
                # divisor keeps the lane exactly 0 for any future
                # multiply-masking consumer.
                react = jnp.where(
                    fluid_j & (jnp.abs(k_j) > eps),
                    (k_j * fj["density"]) * gradw_s,
                    0.0) * (fi["m_V"] / jnp.maximum(fi["density"], 1e-30))
                dv_coef = jnp.where(fi["material"] == MATERIAL_FLUID,
                                    dv_coef, react)
            return {"dv": dv_coef}

        fields = {"material": p.material, "m_V": p.m_V, "kappa": kappa}
        specs = {"dv": "radial"}
        if with_reaction:
            fields["density"] = p.density

        if v is not None:
            for k in range(3):
                fields[f"v{k}"] = v[:, k]
            if with_reaction:
                fields["is_dyn"] = p.is_dynamic
                for k in range(3):
                    fields[f"a{k}"] = acc[:, k]

            def epi(fi, sums, sc):
                dtv = sc[0]
                fluid = fi["material"] == float(MATERIAL_FLUID)
                res = {"v": tuple(
                    jnp.where(fluid, fi[f"v{k}"] + dtv * sums["dv"][k],
                              fi[f"v{k}"]) for k in range(3))}
                if with_reaction:
                    dynr = ((fi["material"] == float(MATERIAL_SOLID))
                            & (fi["is_dyn"] > 0.5))
                    # fused output: sums["dv"] on a dynamic-rigid center
                    # IS the reaction sum (center-material select above)
                    res["acc"] = tuple(
                        jnp.where(dynr, fi[f"a{k}"] + sums["dv"][k],
                                  fi[f"a{k}"]) for k in range(3))
                return res

            epi_specs = {"v": 3}
            if with_reaction:
                epi_specs["acc"] = 3
            if lanes is not None:
                assert tuple(sorted(fields)) == lanes.names, \
                    (sorted(fields), lanes.names)
                fields = lanes
            out = self.engine.traverse(
                ectx(ctx), p.x, fields, term, specs, mode="mxu",
                epilogue=(epi, epi_specs, jnp.stack([dt])))
            v_new = _restore_tail(jnp.stack(out["v"], axis=1), v,
                                  self.params)
            acc_new = None
            if with_reaction:
                acc_new = _restore_tail(jnp.stack(out["acc"], axis=1),
                                        acc, self.params)
            return v_new, acc_new

        if lanes is not None:
            assert tuple(sorted(fields)) == lanes.names, \
                (sorted(fields), lanes.names)
            fields = lanes
        out = self.engine.traverse(ectx(ctx), p.x, fields, term, specs,
                                   mode="mxu")
        raw = jnp.stack(out["dv"], axis=1)
        # fused output: fluid rows carry the dv sum (scaled by dt), solid
        # rows the reaction sum (NOT dt-scaled); consumers apply disjoint
        # masks, so handing back the same array twice is exact.
        dv = dt * raw
        react = raw if with_reaction else None
        return dv, react

    # ------------------------------------------------------------------
    def divergence_solve(self, p: Particles, ctx, dt):
        """DFSPH.py:236-311 as a lax.while_loop.

        Kappa warm start (round 5, opt-in via params.dfsph_warm_start;
        the reference's own TODO, DFSPH.py:236-311 region): before the
        Jacobi loop, apply one velocity kick from HALF of last substep's
        accumulated stiffness (the SPlisHSPlasH recipe) — the solver then
        starts near the converged solution and needs fewer iterations.
        The per-substep kappa sum (including the warm kick) is stored in
        p.kappa_v for the next substep.  Changes iteration trajectories,
        so it is OFF by default and gated on the golden/parity suite.
        Sharded runs never see the kappa fields (the shard pack drops
        them), so warm start is single-device only."""
        factor = p.dfsph_factor / dt   # multiply_time_step(inv_dt)
        eta = (1.0 / dt) * self.max_error_V * 0.01 * self.density_0
        is_fluid_c = p.is_fluid()
        dv_fused = self._fused(ctx) and self.fuse_solver_dv
        warm = (bool(getattr(self.params, "dfsph_warm_start", False))
                and p.kappa_v is not None)

        v_start = p.v
        kacc0 = jnp.zeros_like(p.density)
        if warm:
            kappa0 = jnp.where(is_fluid_c, 0.5 * p.kappa_v, 0.0)
            dv, _ = self._solver_dv(p, ctx, kappa0, False, dt)
            v_start = jnp.where(is_fluid_c[:, None], p.v + dv, p.v)
            v_start = self._sync_vec(ctx, p, v_start)
            kacc0 = kappa0

        buf_dv = buf_dc = None
        if self._use_lanes(ctx):
            f_dv = {"material": p.material, "m_V": p.m_V,
                    "kappa": jnp.zeros_like(p.density)}
            if dv_fused:
                for k in range(3):
                    f_dv[f"v{k}"] = v_start[:, k]
            buf_dv = self.engine.make_lanes(p.x, f_dv)
            buf_dc = self.engine.make_lanes(
                p.x, {"material": p.material, "m_V": p.m_V,
                      "v0": v_start[:, 0], "v1": v_start[:, 1],
                      "v2": v_start[:, 2]})

        adv0 = self._sync_arr(ctx, p,
                              self._density_change(p, ctx, v_start,
                                                   lanes=buf_dc))

        def body(carry):
            v, adv, kacc, _, it = carry
            kappa = adv * factor
            ldv = None
            if buf_dv is not None:
                ups = {"kappa": kappa}
                if dv_fused:
                    ups.update({f"v{k}": v[:, k] for k in range(3)})
                ldv = self.engine.update_lanes(buf_dv, ups)
            if dv_fused:
                v, _ = self._solver_dv(p, ctx, kappa, False, dt, v=v,
                                       lanes=ldv)
            else:
                dv, _ = self._solver_dv(p, ctx, kappa, False, dt,
                                        lanes=ldv)
                v = jnp.where(is_fluid_c[:, None], v + dv, v)
            v = self._sync_vec(ctx, p, v)
            ldc = None if buf_dc is None else self.engine.update_lanes(
                buf_dc, {f"v{k}": v[:, k] for k in range(3)})
            adv, err = self._density_change(p, ctx, v, lanes=ldc,
                                            with_err=True)
            adv = self._sync_arr(ctx, p, adv)
            if err is None:
                err = self._avg_density_error(p, adv, 0.0)
            return v, adv, kacc + kappa, err, it + 1

        def cond(carry):
            _, _, _, err, it = carry
            return (it == 0) | ((err > eta) & (it < self.m_max_iterations_v))

        init = (v_start, adv0, kacc0, jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.int32))
        v, adv, kacc, err, iters = jax.lax.while_loop(cond, body, init)
        p = p._replace(v=v, density_adv=adv)
        if warm:
            p = p._replace(kappa_v=kacc)
        return p, {"divergence_iters": iters, "divergence_error": err}

    # ------------------------------------------------------------------
    def pressure_solve(self, p: Particles, ctx, dt):
        """DFSPH.py:314-389 as a lax.while_loop, accumulating the two-way
        reaction on dynamic-rigid accelerations across iterations."""
        params = self.params
        factor = p.dfsph_factor / (dt * dt)
        eta = self.max_error * 0.01 * self.density_0
        is_fluid_c = p.is_fluid()
        is_dyn_rigid_c = p.is_dynamic_rigid()
        has_dyn_rigid = bool(params.dynamic_rigid_ids)

        dv_fused = self._fused(ctx) and self.fuse_solver_dv
        warm = (bool(getattr(self.params, "dfsph_warm_start", False))
                and p.kappa_p is not None)

        v_start, acc_start = p.v, p.acc
        kacc0 = jnp.zeros_like(p.density)
        if warm:
            # half of last substep's accumulated stiffness as the initial
            # guess (see divergence_solve); the kick's rigid reaction
            # accumulates like a normal iteration's
            kappa0 = jnp.where(is_fluid_c, 0.5 * p.kappa_p, 0.0)
            dv, react = self._solver_dv(p, ctx, kappa0, has_dyn_rigid, dt)
            v_start = jnp.where(is_fluid_c[:, None], p.v + dv, p.v)
            v_start = self._sync_vec(ctx, p, v_start)
            if has_dyn_rigid:
                acc_start = jnp.where(is_dyn_rigid_c[:, None],
                                      p.acc + react, p.acc)
            kacc0 = kappa0

        buf_dv = buf_da = None
        if self._use_lanes(ctx):
            f_dv = {"material": p.material, "m_V": p.m_V,
                    "kappa": jnp.zeros_like(p.density)}
            if has_dyn_rigid:
                f_dv["density"] = p.density
            if dv_fused:
                for k in range(3):
                    f_dv[f"v{k}"] = v_start[:, k]
                if has_dyn_rigid:
                    f_dv["is_dyn"] = p.is_dynamic
                    for k in range(3):
                        f_dv[f"a{k}"] = acc_start[:, k]
            buf_dv = self.engine.make_lanes(p.x, f_dv)
            f_da = {"material": p.material, "m_V": p.m_V,
                    "v0": v_start[:, 0], "v1": v_start[:, 1],
                    "v2": v_start[:, 2]}
            if self._fused(ctx):
                f_da["density"] = p.density
            buf_da = self.engine.make_lanes(p.x, f_da)

        adv0 = self._sync_arr(ctx, p, self._density_adv(p, ctx, v_start,
                                                        p.density, dt,
                                                        lanes=buf_da))

        def body(carry):
            v, acc, adv, kacc, _, it = carry
            kappa = (adv - 1.0) * factor
            ldv = None
            if buf_dv is not None:
                ups = {"kappa": kappa}
                if dv_fused:
                    ups.update({f"v{k}": v[:, k] for k in range(3)})
                    if has_dyn_rigid:
                        ups.update({f"a{k}": acc[:, k] for k in range(3)})
                ldv = self.engine.update_lanes(buf_dv, ups)
            if dv_fused:
                v, acc_new = self._solver_dv(p, ctx, kappa, has_dyn_rigid,
                                             dt, v=v, acc=acc, lanes=ldv)
                if has_dyn_rigid:
                    acc = acc_new
            else:
                dv, react = self._solver_dv(p, ctx, kappa, has_dyn_rigid,
                                            dt, lanes=ldv)
                v = jnp.where(is_fluid_c[:, None], v + dv, v)
                if has_dyn_rigid:
                    acc = jnp.where(is_dyn_rigid_c[:, None],
                                    acc + react, acc)
            v = self._sync_vec(ctx, p, v)
            lda = None if buf_da is None else self.engine.update_lanes(
                buf_da, {f"v{k}": v[:, k] for k in range(3)})
            adv, err = self._density_adv(p, ctx, v, p.density, dt,
                                         lanes=lda, with_err=True)
            adv = self._sync_arr(ctx, p, adv)
            if err is None:
                err = self._avg_density_error(p, adv, self.density_0)
            return v, acc, adv, kacc + kappa, err, it + 1

        def cond(carry):
            _, _, _, _, err, it = carry
            return (it == 0) | ((err > eta) & (it < self.m_max_iterations))

        init = (v_start, acc_start, adv0, kacc0, jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.int32))
        v, acc, adv, kacc, err, iters = jax.lax.while_loop(cond, body, init)
        p = p._replace(v=v, acc=acc, density_adv=adv)
        if warm:
            p = p._replace(kappa_p=kacc)
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
    def _sync_arr(self, ctx, p, arr):
        """Ghost-refresh a scalar per-particle array (sharded runs)."""
        q = sync_fields(ctx, p._replace(pressure=arr), ["pressure"])
        return q.pressure

    def _sync_vec(self, ctx, p, vec):
        """Ghost-refresh a (N,3) per-particle array (sharded runs)."""
        q = sync_fields(ctx, p._replace(v=vec), ["v"])
        return q.v

    def substep(self, p: Particles, ctx, dt):
        p = self.density_and_factor(p, ctx)
        metrics = {}
        if self.enable_divergence_solver:
            p, m = self.divergence_solve(p, ctx, dt)
            metrics.update(m)
        if self._fused(ctx):
            # predict_velocity rides the non-pressure traversal's epilogue
            p = compute_non_pressure_forces(p, ctx, self.engine,
                                            self.params, self.g,
                                            predict_dt=dt)
        else:
            p = compute_non_pressure_forces(p, ctx, self.engine,
                                            self.params, self.g)
            p = self.predict_velocity(p, dt)
        p = sync_fields(ctx, p, ["v"])  # ghosts need the non-pressure kick
        p, m = self.pressure_solve(p, ctx, dt)
        metrics.update(m)
        p = self.advect(p, dt)
        return p, metrics
