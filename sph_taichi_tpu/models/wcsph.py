"""Weakly-compressible SPH solver (TPU-native counterpart of WCSPH.py).

Substep pipeline (WCSPH.py:152-156): densities -> non-pressure forces ->
Tait-EOS pressure forces -> symplectic Euler advection.

TPU structure: the density sum is one traversal; the non-pressure
(surface tension + viscosity) and pressure force sums — separate kernels
in the reference — read the same pair geometry and are FUSED into a
single second traversal (the EOS between them is elementwise).  Exact
parity is kept by passing both the unclamped density (viscosity reads it,
WCSPH.py:114) and the clamped density (pressure reads it, WCSPH.py:75)
as separate neighbor fields.

Behavioral parity notes (quirks intentionally preserved):
- density is clamped to >= rho0 *and stored* before the EOS (WCSPH.py:75);
- the boundary pressure mirror uses p_j := p_i and rho_j := rho0
  (WCSPH.py:58-65);
- boundary viscosity coefficient is 0.0 (WCSPH.py:118) so the viscosity
  reaction on rigid bodies vanishes exactly;
- two-way coupling: the reference's atomic scatter
  `acceleration[p_j] += -f_p * rho0 / rho_j` (WCSPH.py:67-68) is computed
  here from the rigid particle's side as a sum over its fluid
  neighbors — same pair terms, deterministic summation.
"""

import numpy as np
import jax.numpy as jnp

from sph_taichi_tpu.state import (
    MATERIAL_FLUID, MATERIAL_PAD, MATERIAL_SOLID, Particles)
from sph_taichi_tpu.ops.kernels import (
    cubic_kernel, cubic_kernel_derivative_scalar)
from sph_taichi_tpu.models.base import (
    SPHBase, compute_densities, ectx)


class WCSPHSolver(SPHBase):
    def __init__(self, params):
        self.exponent = params.exponent      # WCSPH.py:9-10
        self.stiffness = params.stiffness    # WCSPH.py:12-13
        super().__init__(params)

    def substep(self, p: Particles, ctx, dt):
        p = compute_densities(p, ctx, self.engine, self.params)
        # fused path: advect + fluid boundary clamp run inside the forces
        # kernel's writeback epilogue (measured ~10 ms/step of XLA-graph
        # cost for the standalone elementwise stages at dragon scale —
        # docs/DESIGN.md round 3).  The fluid box clamp commutes with the
        # rigid shape-matching solve (disjoint particle rows), so running
        # it before solve_rigid_body instead of after is order-exact.
        # Sharded runs keep the unfused path (ghost-sync granularity).
        fused = (getattr(self.engine, "supports_epilogue", False)
                 and not (hasattr(ctx, "ghost_sync")
                          and ctx.ghost_sync is not None))
        p = self.compute_forces(p, ctx, dt=dt if fused else None)
        if not fused:
            p = self.advect(p, dt)
        # trace-time flag read by SPHBase.step_fn right after this call
        # (not a metric: sharded metric pytrees have a static structure)
        self._boundary_fused = fused
        return p, {}

    def compute_forces(self, p: Particles, ctx, dt=None):
        """Fused WCSPH.py:88-141 (non-pressure) + :46-85 (pressure) +
        :67-68 (rigid reaction, gather form) in one traversal."""
        params = self.params
        h = params.support_radius
        dim = params.dim
        rho0 = self.density_0
        st = params.surface_tension
        visc = params.viscosity
        diameter = params.particle_diameter

        # -- density clamp + Tait EOS, fluid only (WCSPH.py:75-76) --
        density_nc = p.density  # pre-clamp value: viscosity parity
        density = jnp.where(p.is_fluid(),
                            jnp.maximum(p.density, rho0), p.density)
        pressure = jnp.where(
            p.is_fluid(),
            self.stiffness * (jnp.power(density / rho0, self.exponent) - 1.0),
            p.pressure)
        p = p._replace(density=density, pressure=pressure)
        # ghost copies (sharded runs) computed the same elementwise values
        # from their synced density — no extra hop needed

        # reaction output only exists when some rigid is dynamic — for
        # static-rigid scenes the traversal math and output lanes for the
        # two-way term are dead weight (reference short-circuits the same
        # way: is_dynamic_rigid never true, WCSPH.py:67)
        want_react = bool(params.dynamic_rigid_ids)

        # strength reduction (round 3): every pressure/viscosity quotient
        # below depends on ONE particle only, so it is computed once per
        # particle here instead of once per candidate LANE inside the pair
        # kernel (the padded tile evaluates ~5-20x more lanes than real
        # pairs; VPU divides are the most expensive ops in the chain).
        # Same formulas, same f32 values — parity is unchanged.
        dpi_f = p.pressure / (p.density * p.density)     # WCSPH.py:56,62
        p_r02 = p.pressure / (rho0 * rho0)               # WCSPH.py:58-65
        m_nc = p.m / density_nc                          # WCSPH.py:114

        def term(fi, fj, d2, rn, dots):
            gradw_s = cubic_kernel_derivative_scalar(rn, h, dim, inv_r=dots.get("_inv"))
            fluid_j = fj["material"] == MATERIAL_FLUID
            solid_j = fj["material"] == MATERIAL_SOLID
            r2 = d2

            # surface tension (WCSPH.py:92-102)
            w = cubic_kernel(rn, h, dim)
            wd = cubic_kernel(jnp.asarray(diameter, rn.dtype), h, dim)
            w_st = jnp.where(r2 > diameter * diameter, w, wd)
            st_coef = jnp.where(fluid_j, -(st / fi["m"]) * fj["m"] * w_st,
                                0.0)

            # viscosity (WCSPH.py:105-116) — unclamped neighbor density
            v_xy = dots["v"]
            d = 2.0 * (dim + 2.0)
            visc_coef = jnp.where(
                fluid_j,
                d * visc * fj["m_nc"] * v_xy
                / (r2 + 0.01 * h * h) * gradw_s,
                0.0)

            # pressure (WCSPH.py:47-66) — clamped density + EOS pressure
            dpj = jnp.where(fluid_j, fj["dpi"], fi["p_r02"])  # mirror
            press_coef = jnp.where(
                fluid_j | solid_j,
                -rho0 * fj["m_V"] * (fi["dpi"] + dpj) * gradw_s, 0.0)

            a_coef = st_coef + visc_coef + press_coef
            if want_react:
                # reaction on dynamic-rigid centers (WCSPH.py:67-68 as
                # gather).  The fluid sum and the reaction sum are
                # MUTUALLY EXCLUSIVE per center (fluid centers consume
                # "a", dynamic-rigid centers consume the reaction; every
                # other material is zeroed downstream), so both ride ONE
                # radial output selected by center material — j231: 3
                # lane-reduce trees + 3 writeback lanes instead of 6,
                # consumed values bit-identical.
                dpi_k = fj["dpi"] + fj["p_r02"]
                react = jnp.where(
                    fluid_j,
                    -(rho0 * fi["m_V"] * dpi_k) * fi["rr0"] * gradw_s,
                    0.0)
                a_coef = jnp.where(fi["material"] == MATERIAL_FLUID,
                                   a_coef, react)
            return {"a": a_coef}

        specs = {"a": "radial"}
        fields = {"material": p.material, "m": p.m, "m_V": p.m_V,
                  "dpi": dpi_f, "p_r02": p_r02, "m_nc": m_nc,
                  "v0": p.v[:, 0], "v1": p.v[:, 1], "v2": p.v[:, 2]}
        if want_react:
            fields["rr0"] = rho0 / p.density

        epilogue = None
        if dt is not None:
            fields["is_dyn"] = p.is_dynamic
            # Pallas kernels cannot capture array constants — everything
            # below closes over Python scalars, componentwise.
            gl = [float(v) for v in np.asarray(self.g)]
            lo = float(params.padding)
            hi = [float(s) - lo for s in params.domain_size]
            cf = float(params.collision_factor)

            def epi(fi, sums, sc):
                # row-major contract: every fi/sums value is a (1, R) row
                dtv = sc[0]
                fluid = fi["material"] == float(MATERIAL_FLUID)
                solid = fi["material"] == float(MATERIAL_SOLID)
                padm = fi["material"] == float(MATERIAL_PAD)
                dynm = fi["is_dyn"] > 0.5
                xs, vs = [], []
                for k in range(3):
                    # acc selection — same chain as the unfused path below
                    a = gl[k] + jnp.where(fluid, sums["a"][k], 0.0)
                    if want_react:
                        # fused output: sums["a"] on a solid center IS
                        # the reaction sum (center-material select in
                        # the term fn)
                        a = jnp.where(solid & dynm,
                                      gl[k] + sums["a"][k], a)
                    a = jnp.where(solid & ~dynm, 0.0, a)
                    a = jnp.where(padm, 0.0, a)
                    # symplectic Euler (WCSPH.py:143-149)
                    v = jnp.where(dynm, fi[f"v{k}"] + dtv * a, fi[f"v{k}"])
                    x = jnp.where(dynm, fi[f"x{k}"] + dtv * v, fi[f"x{k}"])
                    vs.append(v)
                    xs.append(x)
                # fluid domain-box clamp (sph_base.py:118-179 semantics,
                # identical to models/base.py enforce_boundary)
                over = [xs[k] > hi[k] for k in range(3)]
                under = [xs[k] <= lo for k in range(3)]
                nrm = [over[k].astype(jnp.float32)
                       - under[k].astype(jnp.float32) for k in range(3)]
                xn = [jnp.where(over[k], hi[k], xs[k]) for k in range(3)]
                xn = [jnp.where(under[k], lo, xn[k]) for k in range(3)]
                nlen = jnp.sqrt(nrm[0] * nrm[0] + nrm[1] * nrm[1]
                                + nrm[2] * nrm[2])
                nd = jnp.maximum(nlen, 1e-30)
                nhat = [nrm[k] / nd for k in range(3)]
                vdotn = (vs[0] * nhat[0] + vs[1] * nhat[1]
                         + vs[2] * nhat[2])
                vr = [vs[k] - (1.0 + cf) * vdotn * nhat[k]
                      for k in range(3)]
                vn = [jnp.where(nlen > 1e-6, vr[k], vs[k])
                      for k in range(3)]
                active = fluid & dynm
                return {"x": tuple(jnp.where(active, xn[k], xs[k])
                                   for k in range(3)),
                        "v": tuple(jnp.where(active, vn[k], vs[k])
                                   for k in range(3))}

            epilogue = (epi, {"x": 3, "v": 3}, jnp.stack([dt]))

        out = self.engine.traverse(
            ectx(ctx), p.x, fields,
            term, specs, mode="mxu", pair_dots=("v",),
            **({"epilogue": epilogue} if epilogue is not None else {}))
        if dt is not None:
            x_new = jnp.stack(out["x"], axis=1)
            v_new = jnp.stack(out["v"], axis=1)
            n_real = params.n_fluid + params.n_solid
            if n_real < p.n:
                # padding particles live in the overflow cell (max cell
                # id -> sorted to the tail) which no kernel group covers;
                # their writeback rows are garbage.  Keep their parked
                # state with a static-slice concat.
                x_new = jnp.concatenate([x_new[:n_real], p.x[n_real:]], 0)
                v_new = jnp.concatenate([v_new[:n_real], p.v[n_real:]], 0)
            return p._replace(x=x_new, v=v_new)
        a_pair = jnp.stack(out["a"], axis=1)

        acc = self.g[None, :] + jnp.where(p.is_fluid()[:, None], a_pair, 0.0)
        if want_react:
            # fused output: a_pair on a dynamic-rigid center IS the
            # reaction sum (center-material select in the term fn)
            acc = jnp.where(p.is_dynamic_rigid()[:, None],
                            self.g[None, :] + a_pair, acc)
        acc = jnp.where(p.is_static_rigid()[:, None], 0.0, acc)
        acc = jnp.where((p.material == MATERIAL_PAD)[:, None], 0.0, acc)
        return p._replace(acc=acc)

    def advect(self, p: Particles, dt):
        """Symplectic Euler for every dynamic particle (WCSPH.py:143-149)."""
        dyn = (p.is_dynamic != 0)[:, None]
        v = jnp.where(dyn, p.v + dt * p.acc, p.v)
        x = jnp.where(dyn, p.x + dt * v, p.x)
        return p._replace(v=v, x=x)
