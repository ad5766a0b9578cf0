"""Legacy 2D engine: WCSPH / PCISPH / DFSPH with adaptive CFL timestep
and mid-simulation particle emission.

TPU-native counterpart of the reference's self-contained 2D vertical
slice (legacy/engine/sph_solver.py, 972 LoC).  Capabilities the main 3D
engine does not have (SURVEY §2.2):

- **PCISPH** — precomputed ideal-lattice scaling factor
  (legacy:377-396), prediction-correction loop to 1% rho0 with >= 3
  iterations (legacy:776-797);
- **adaptive CFL dt** — dt from max |v|, max |a| (and the WCSPH acoustic
  bound), CFL_v=0.25 / CFL_a=0.05 (legacy:49-50, 731-761) — computed
  **on device** (the reference pulls full arrays to host every step);
- **runtime emission** — `add_cube` mid-simulation fills padded slots
  (legacy:906-954; scene.py:59-75 adds cubes at t>0.4);
- legacy physics: 2D cubic spline with 2h support and 10/(7 pi h^2)
  normalization (legacy:235-259), continuity-equation density
  integration, Monaghan artificial viscosity gated on approach
  (legacy:282-296), Tait EOS with c0=200 (legacy:73,267-271), boundary
  push-out with c_f=0.3 (legacy:298-330), legacy-variant DFSPH
  (legacy:499-729).

Neighbor search: brute-force O(N^2) pair masks under jit.  The legacy
demos run ~4.5K particles (legacy/README.md:15) where the dense (N, N)
pair matrix is small (~80 MB of masks at 4.5K) and maps perfectly onto
the TPU's vector unit — a cell grid would be pure overhead at this size.
"""

import dataclasses
from functools import reduce, partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

METHOD_WCSPH = 0
METHOD_PCISPH = 1
METHOD_DFSPH = 2
METHODS = {"WCSPH": METHOD_WCSPH, "PCISPH": METHOD_PCISPH,
           "DFSPH": METHOD_DFSPH}

MATERIAL_FLUID = 1
MATERIAL_BOUND = 0
MATERIAL_NONE = -1


class State2D(NamedTuple):
    x: jnp.ndarray          # f32[N,2]
    v: jnp.ndarray          # f32[N,2]
    v_new: jnp.ndarray      # f32[N,2] prediction buffer (PCISPH/DFSPH)
    pressure: jnp.ndarray   # f32[N]
    pressure_acc: jnp.ndarray  # f32[N,2]
    density: jnp.ndarray    # f32[N]
    d_v: jnp.ndarray        # f32[N,2] non-pressure accel
    alpha: jnp.ndarray      # f32[N] DFSPH alpha
    material: jnp.ndarray   # i32[N] 1 fluid / 0 bound / -1 empty slot
    color: jnp.ndarray      # i32[N]
    n: jnp.ndarray          # i32[] live particle count
    dt: jnp.ndarray         # f32[]


# ---------------------------------------------------------------------------
# legacy 2D cubic spline (2h support) — legacy:235-259
# ---------------------------------------------------------------------------

def cubic_kernel_2d(r, h):
    k = 10.0 / (7.0 * np.pi * h * h)
    q = r / h
    w1 = k * (1 - 1.5 * q * q + 0.75 * q * q * q)
    w2 = k * 0.25 * (2 - q) ** 3
    return jnp.where(q <= 1.0, w1, jnp.where(q < 2.0, w2, 0.0))


def cubic_kernel_derivative_2d(r, h):
    """Scalar dW/dr (legacy multiplies by r/|r| itself)."""
    k = 10.0 / (7.0 * np.pi * h * h)
    q = r / h
    d1 = (k / h) * (-3 * q + 2.25 * q * q)
    d2 = -0.75 * (k / h) * (2 - q) ** 2
    return jnp.where(q < 1.0, d1, jnp.where(q < 2.0, d2, 0.0))


class SPHSolver2D:
    """Reference-compatible constructor (legacy/engine/sph_solver.py:21-49).

    `res` is the GUI resolution; world = res / screen_to_world_ratio.
    bound = [top, bottom, left, right] in world units.
    """

    def __init__(self, res, screen_to_world_ratio, bound, alpha=0.5, dx=0.2,
                 max_num_particles=2 ** 14, padding=None, max_time=5.0,
                 max_steps=50000, dynamic_allocate=False,
                 adaptive_time_step=True, method=0):
        self.method = method
        self.adaptive_time_step = adaptive_time_step
        self.dim = len(res)
        assert self.dim == 2
        self.res = res
        self.screen_to_world_ratio = screen_to_world_ratio
        self.padding = 2 * dx                 # legacy:41
        self.max_time = max_time
        self.max_steps = max_steps
        self.max_num_particles = int(max_num_particles)

        self.g = -9.80                        # legacy:46
        self.alpha = alpha
        self.rho_0 = 1000.0
        self.CFL_v = 0.25
        self.CFL_a = 0.05
        self.df_fac = 1.3
        self.dx = dx
        self.dh = dx * self.df_fac            # smoothing length
        self.m = self.dx ** self.dim * self.rho_0
        self.gamma = 7.0
        self.c_0 = 200.0

        self.top_bound, self.bottom_bound = bound[0], bound[1]
        self.left_bound, self.right_bound = bound[2], bound[3]

        # PCISPH scaling factor from an ideal lattice (legacy:377-396):
        # static — depends only on dx/dh — except the dt^2 factor, applied
        # per step.
        self.s_f_base = self._pci_scaling_base()

        n = self.max_num_particles
        z2 = jnp.zeros((n, 2), jnp.float32)
        z1 = jnp.zeros((n,), jnp.float32)
        self.state = State2D(
            x=jnp.full((n, 2), 1e9, jnp.float32), v=z2, v_new=z2,
            pressure=z1, pressure_acc=z2, density=z1, d_v=z2, alpha=z1,
            material=jnp.full((n,), MATERIAL_NONE, jnp.int32),
            color=jnp.zeros((n,), jnp.int32),
            n=jnp.zeros((), jnp.int32),
            dt=jnp.asarray(0.1 * self.dh / self.c_0, jnp.float32))
        self._step_fn = jax.jit(self._step, donate_argnums=0)
        self.it = 0  # last solver iteration count (diagnostic)

    # ------------------------------------------------------------------
    def _pci_scaling_base(self):
        """grad sums over the ideal 2h-support lattice (legacy:377-396);
        s_f = 1 / max(2 (dt m / rho0)^2 * (|sum grad|^2 + sum |grad|^2), eps)
        — the dt-independent part is precomputed here."""
        rng = int(self.dh * 2.0 / self.dx)
        half = rng // 2
        grad_sum = np.zeros(2)
        grad_dot = 0.0
        for xx in range(-half, half):
            for yy in range(-half, half):
                r = np.array([-xx * self.dx, -yy * self.dx])
                rm = np.linalg.norm(r)
                if 1e-5 < rm < 2.0 * self.dh:
                    k = 10.0 / (7.0 * np.pi * self.dh ** 2)
                    q = rm / self.dh
                    if q < 1.0:
                        d = (k / self.dh) * (-3 * q + 2.25 * q * q)
                    else:
                        d = -0.75 * (k / self.dh) * (2 - q) ** 2
                    g = d * r / rm
                    grad_sum += g
                    grad_dot += g @ g
        return float(grad_sum @ grad_sum + grad_dot)

    # ------------------------------------------------------------------
    # pair helpers (dense O(N^2) under jit)
    # ------------------------------------------------------------------
    def _pairs(self, x, material):
        r = x[:, None, :] - x[None, :, :]
        d2 = jnp.sum(r * r, axis=-1)
        rm = jnp.sqrt(d2)
        real = material >= 0
        n = x.shape[0]
        eye = jnp.eye(n, dtype=bool)
        # legacy search: within 2h (2.0 * dh * 1.00 support, legacy:230)
        mask = real[None, :] & real[:, None] & ~eye & (rm < 2.0 * self.dh)
        rm_safe = jnp.maximum(rm, 1e-5)
        return r, rm_safe, mask

    def _visc_press_forces(self, s, r, rm, mask, use_pressure=True):
        """Monaghan artificial viscosity (gated on approach, legacy:282-296)
        + symmetric pressure force (legacy:273-280); fluid centers only."""
        dvel = s.v[:, None, :] - s.v[None, :, :]
        v_xy = jnp.sum(dvel * r, axis=-1)
        dw = cubic_kernel_derivative_2d(rm, self.dh)
        rho_i = s.density[:, None]
        rho_j = s.density[None, :]
        vmu = -2.0 * self.alpha * self.dx * self.c_0 / (rho_i + rho_j)
        visc = jnp.where(mask & (v_xy < 0),
                         -self.m * vmu * v_xy / (rm * rm + 0.01 * self.dx ** 2)
                         * dw / rm, 0.0)
        coef = visc
        if use_pressure:
            pi = s.pressure[:, None] / (rho_i * rho_i)
            pj = s.pressure[None, :] / (rho_j * rho_j)
            press = jnp.where(mask, -self.m * (pi + pj) * dw / rm, 0.0)
            coef = coef + press
        return jnp.einsum("ij,ijk->ik", coef, r)

    def _d_rho(self, v, s, r, rm, mask):
        """Continuity-equation density derivative (legacy:262-266)."""
        dvel = v[:, None, :] - v[None, :, :]
        dw = cubic_kernel_derivative_2d(rm, self.dh)
        term = jnp.where(mask,
                         self.m * dw * jnp.sum(dvel * r, axis=-1) / rm, 0.0)
        return jnp.sum(term, axis=1)

    def _p_update(self, rho):
        b = self.rho_0 * self.c_0 ** 2 / self.gamma
        return b * ((rho / self.rho_0) ** self.gamma - 1.0)

    # ------------------------------------------------------------------
    def _enforce_boundary(self, s: State2D):
        """Push-out + velocity reflection c_f = 0.3 (legacy:298-330)."""
        c_f = 0.3
        fluid = (s.material == MATERIAL_FLUID)
        x, v, vn = s.x, s.v, s.v_new
        for axis, nvec, lim, side in (
                (0, jnp.array([1.0, 0.0]), self.left_bound + 0.5 * self.padding, "lo"),
                (0, jnp.array([-1.0, 0.0]), self.right_bound - 0.5 * self.padding, "hi"),
                (1, jnp.array([0.0, -1.0]), self.top_bound - self.padding, "hi"),
                (1, jnp.array([0.0, 1.0]), self.bottom_bound + self.padding, "lo")):
            pos = x[:, axis]
            hit = fluid & ((pos < lim) if side == "lo" else (pos > lim))
            d = jnp.abs(pos - lim)
            x = jnp.where(hit[:, None], x + nvec[None, :] * d[:, None], x)
            vdotn = v @ nvec
            v = jnp.where(hit[:, None],
                          v - (1.0 + c_f) * vdotn[:, None] * nvec[None, :], v)
            if self.method == METHOD_DFSPH:
                vndotn = vn @ nvec
                vn = jnp.where(hit[:, None],
                               vn - (1.0 + c_f) * vndotn[:, None] * nvec[None, :],
                               vn)
        return s._replace(x=x, v=v, v_new=vn)

    # ------------------------------------------------------------------
    def _adaptive_dt(self, s: State2D, accel):
        """legacy adaptive_step (:731-761), fully on device."""
        fluid = s.material == MATERIAL_FLUID
        vmax = jnp.maximum(jnp.max(jnp.where(
            fluid, jnp.linalg.norm(s.v, axis=1), 0.0)), 1e-6)
        amax = jnp.maximum(jnp.max(jnp.where(
            fluid, jnp.linalg.norm(accel, axis=1), 0.0)), 1e-6)
        dt_cfl = self.CFL_v * self.dh / vmax
        dt_f = self.CFL_a * jnp.sqrt(self.dh / amax)
        if not self.adaptive_time_step:
            return s.dt
        if self.method == METHOD_DFSPH:
            return jnp.minimum(dt_cfl, dt_f)
        if self.method == METHOD_WCSPH:
            rho_max = jnp.maximum(jnp.max(jnp.where(fluid, s.density, 0.0)),
                                  self.rho_0)
            dt_a = 0.20 * self.dh / (self.c_0 * jnp.sqrt(
                (rho_max / self.rho_0) ** self.gamma))
            return jnp.minimum(jnp.minimum(dt_cfl, dt_f), dt_a)
        return jnp.minimum(dt_cfl, dt_f)  # PCISPH

    # ------------------------------------------------------------------
    def _step(self, s: State2D):
        r, rm, mask = self._pairs(s.x, s.material)
        fluid = (s.material == MATERIAL_FLUID)
        dt = s.dt
        g_vec = jnp.array([0.0, self.g], jnp.float32)
        it = jnp.zeros((), jnp.int32)

        if self.method == METHOD_WCSPH:
            d_rho = self._d_rho(s.v, s, r, rm, mask)
            acc = self._visc_press_forces(s, r, rm, mask, use_pressure=True)
            acc = jnp.where(fluid[:, None], acc + g_vec[None, :], 0.0)
            v = jnp.where(fluid[:, None], s.v + dt * acc, s.v)
            x = jnp.where(fluid[:, None], s.x + dt * v, s.x)
            real = s.material >= 0
            density = jnp.where(real, s.density + dt * d_rho, s.density)
            pressure = jnp.where(real, self._p_update(density), s.pressure)
            s = s._replace(x=x, v=v, density=density, pressure=pressure,
                           d_v=jnp.where(fluid[:, None], acc, 0.0))

        elif self.method == METHOD_PCISPH:
            # non-pressure deltas + zero pressure state (legacy:458-483)
            acc_np = self._visc_press_forces(s, r, rm, mask,
                                             use_pressure=False)
            acc_np = jnp.where(fluid[:, None], acc_np + g_vec[None, :], 0.0)
            s_f = 1.0 / jnp.maximum(
                2.0 * (dt * self.m / self.rho_0) ** 2 * self.s_f_base, 1e-6)
            real = s.material >= 0
            dw = cubic_kernel_derivative_2d(rm, self.dh)

            def body(carry):
                pressure, p_acc, d_rho_c, err, i = carry
                v_new = jnp.where(fluid[:, None],
                                  s.v + dt * (acc_np + p_acc), s.v)
                x_new = jnp.where(fluid[:, None], s.x + dt * v_new, s.x)
                # predicted divergence on predicted positions (legacy:414)
                r2 = x_new[:, None, :] - x_new[None, :, :]
                rm2 = jnp.maximum(jnp.sqrt(jnp.sum(r2 * r2, -1)), 1e-5)
                dw2 = cubic_kernel_derivative_2d(rm2, self.dh)
                dvel = v_new[:, None, :] - v_new[None, :, :]
                m2 = mask & (rm2 > 1e-5)
                d_rho = jnp.sum(jnp.where(
                    m2, dw2 * jnp.sum(dvel * r2, -1) / rm2, 0.0), axis=1)
                rho_err = jnp.where(real,
                                    s.density + dt * d_rho - self.rho_0, 0.0)
                pressure = pressure + s_f * rho_err
                # pressure force on predicted positions (legacy:443-456)
                pi = pressure[:, None] / jnp.square(s.density[:, None])
                pj = pressure[None, :] / jnp.square(s.density[None, :])
                coef = jnp.where(m2, -self.m * (pi + pj) * dw2 / rm2, 0.0)
                p_acc = jnp.einsum("ij,ijk->ik", coef, r2)
                err = jnp.max(jnp.abs(rho_err))
                return pressure, p_acc, d_rho, err, i + 1

            def cond(carry):
                _, _, _, err, i = carry
                return ((err >= 0.01 * self.rho_0) | (i < 3)) & (i <= 1000)

            init = (jnp.zeros_like(s.pressure), jnp.zeros_like(s.v),
                    jnp.zeros_like(s.density),
                    jnp.asarray(np.inf, jnp.float32), jnp.zeros((), jnp.int32))
            pressure, p_acc, d_rho, err, it = jax.lax.while_loop(
                cond, body, init)
            v = jnp.where(fluid[:, None], s.v + dt * (acc_np + p_acc), s.v)
            x = jnp.where(fluid[:, None], s.x + dt * v, s.x)
            density = jnp.where(real, s.density + dt * d_rho, s.density)
            s = s._replace(x=x, v=v, density=density, pressure=pressure,
                           pressure_acc=p_acc,
                           d_v=jnp.where(fluid[:, None], acc_np, 0.0))

        else:  # DFSPH (legacy variant, step order legacy:798-840)
            s, it = self._dfsph_step(s, r, rm, mask, fluid, g_vec)

        s = self._enforce_boundary(s)
        if self.method != METHOD_DFSPH:
            accel = s.d_v + s.pressure_acc
            s = s._replace(dt=self._adaptive_dt(s, accel))
        return s, it

    # ------------------------------------------------------------------
    def _dfsph_step(self, s, r, rm, mask, fluid, g_vec):
        dt = s.dt
        real = s.material >= 0
        dw = cubic_kernel_derivative_2d(rm, self.dh)
        fluid_j = fluid[None, :]
        grad_unit = jnp.where((mask & (rm > 1e-4))[..., None],
                              (self.m * dw / rm)[..., None] * r, 0.0)

        # rho + alpha (legacy:600-625); note density fully recomputed
        w = cubic_kernel_2d(rm, self.dh)
        density = jnp.sum(jnp.where(mask & (rm > 1e-4), self.m * w, 0.0),
                          axis=1)
        grad_sum = jnp.sum(grad_unit, axis=1)
        grad_sq = jnp.sum(jnp.where(fluid_j,
                                    jnp.sum(grad_unit * grad_unit, -1), 0.0),
                          axis=1)
        alpha = -1.0 / jnp.maximum(
            jnp.sum(grad_sum * grad_sum, -1) + grad_sq, 1e-6)
        density = jnp.where(real, density, s.density)
        s = s._replace(density=density, alpha=alpha, v_new=s.v)

        n_live = jnp.maximum(jnp.sum(real.astype(jnp.float32)), 1.0)

        def div_iter(carry):
            v_new, _, i = carry
            d_rho = self._df_drho(v_new, s, r, rm, mask, fluid)
            d_rho = jnp.maximum(d_rho, 0.0)
            # skip decompression (legacy:656-660)
            skip = (s.density + dt * d_rho < self.rho_0) & (s.density < self.rho_0)
            d_rho = jnp.where(skip, 0.0, d_rho)
            stiff = d_rho * s.alpha
            dv = self._df_stiff_dv(stiff, r, rm, mask, fluid)
            v_new = v_new + dv
            return v_new, jnp.sum(jnp.where(real, d_rho, 0.0)), i + 1

        def div_cond(carry):
            _, sum_drho, i = carry
            return ((sum_drho >= 0.01 * n_live * self.rho_0) | (i < 1)) \
                & (i <= 1000)

        v_new, _, it1 = jax.lax.while_loop(
            div_cond, div_iter,
            (s.v, jnp.asarray(np.inf, jnp.float32), jnp.zeros((), jnp.int32)))
        v = jnp.where(fluid[:, None], v_new, s.v)  # df_update_velocities
        s = s._replace(v=v, v_new=v_new)

        # non-pressure deltas (legacy:499-521)
        acc_np = self._visc_press_forces(s, r, rm, mask, use_pressure=False)
        acc_np = jnp.where(fluid[:, None], acc_np + g_vec[None, :], 0.0)
        s = s._replace(d_v=acc_np, dt=self._adaptive_dt(s, acc_np))
        dt = s.dt

        # predict velocities v* (legacy:523-528)
        v_star = jnp.where(fluid[:, None], s.v + dt * acc_np, s.v)

        def rho_iter(carry):
            v_new, _, i = carry
            d_rho = self._df_drho(v_new, s, r, rm, mask, fluid)
            rho_star = s.density + dt * d_rho
            err = jnp.maximum(rho_star - self.rho_0, 0.0)
            stiff = err * s.alpha
            dv = self._df_stiff_dv(stiff, r, rm, mask, fluid)
            v_new = v_new + dv / jnp.maximum(dt, 1e-5)
            return v_new, jnp.sum(jnp.where(real, err, 0.0)), i + 1

        def rho_cond(carry):
            _, sum_err, i = carry
            return ((sum_err >= 0.01 * n_live * self.rho_0) | (i < 2)) \
                & (i <= 1000)

        v_new, _, it2 = jax.lax.while_loop(
            rho_cond, rho_iter,
            (v_star, jnp.asarray(np.inf, jnp.float32),
             jnp.zeros((), jnp.int32)))
        x = jnp.where(fluid[:, None], s.x + dt * v_new, s.x)
        return s._replace(x=x, v_new=v_new), it1 + it2

    def _df_drho(self, v_new, s, r, rm, mask, fluid):
        """legacy df d_rho: boundary neighbors contribute with v_j = 0
        (legacy:544-549, 637-648)."""
        dw = cubic_kernel_derivative_2d(rm, self.dh)
        vi = v_new[:, None, :]
        vj = jnp.where(fluid[None, :, None], v_new[None, :, :], 0.0)
        term = jnp.where(mask & (rm > 1e-4),
                         self.m * dw * jnp.sum((vi - vj) * r, -1) / rm, 0.0)
        return jnp.sum(term, axis=1)

    def _df_stiff_dv(self, stiff, r, rm, mask, fluid):
        """dv = sum_j m (k_i [+ k_j if fluid]) gradW (legacy:563-589)."""
        ki = stiff[:, None]
        kj = jnp.where(fluid[None, :], stiff[None, :], 0.0)
        dw = cubic_kernel_derivative_2d(rm, self.dh)
        coef = jnp.where(mask & (rm > 1e-4),
                         self.m * (ki + kj) * dw / rm, 0.0)
        return jnp.einsum("ij,ijk->ik", coef, r)

    # ------------------------------------------------------------------
    # public API (legacy names)
    # ------------------------------------------------------------------
    def step(self, frame=0, t=0.0, total_start=0.0):
        self.state, it = self._step_fn(self.state)
        self.it = int(it)
        return float(self.state.dt)

    def add_cube(self, lower_corner, cube_size, material, color=0xFFFFFF,
                 density=None, pressure=None, velocity=None):
        """Lattice fill at dx pitch into free padded slots (legacy:906-954).
        Works mid-simulation: emission just claims more capacity."""
        axes = [np.arange(lower_corner[i], lower_corner[i] + cube_size[i],
                          self.dx) for i in range(self.dim)]
        num = reduce(lambda a, b: a * b, [len(ax) for ax in axes])
        pos = np.array(np.meshgrid(*axes, sparse=False, indexing="ij"),
                       dtype=np.float32).reshape(self.dim, -1).T
        n0 = int(self.state.n)
        assert n0 + num <= self.max_num_particles, "capacity exceeded"
        dens = float(density[0] if hasattr(density, "__len__") else
                     (density or 1000.0))
        pres = float(pressure[0] if hasattr(pressure, "__len__") else
                     (pressure or 0.0))
        vel = np.asarray(velocity if velocity is not None
                         else np.zeros(self.dim), np.float32)

        s = self.state
        idx = jnp.arange(n0, n0 + num)
        self.state = s._replace(
            x=s.x.at[idx].set(jnp.asarray(pos)),
            v=s.v.at[idx].set(jnp.asarray(np.tile(vel, (num, 1)))),
            v_new=s.v_new.at[idx].set(jnp.asarray(np.tile(vel, (num, 1)))),
            pressure=s.pressure.at[idx].set(pres),
            density=s.density.at[idx].set(dens),
            material=s.material.at[idx].set(material),
            color=s.color.at[idx].set(int(color)),
            n=s.n + num)

    def particle_info(self):
        """numpy export (legacy:956-972)."""
        n = int(self.state.n)
        live = np.asarray(self.state.material) >= 0
        return {
            "position": np.asarray(self.state.x)[live],
            "velocity": np.asarray(self.state.v)[live],
            "material": np.asarray(self.state.material)[live],
            "color": np.asarray(self.state.color)[live],
        }
