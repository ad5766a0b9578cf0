"""Legacy 2D engine: all three methods, adaptive dt, runtime emission."""

import numpy as np
import pytest

from sph_taichi_tpu.legacy2d import (
    SPHSolver2D, METHODS, MATERIAL_FLUID, cubic_kernel_2d,
    cubic_kernel_derivative_2d)


def ref_kernel_2d(r, h):
    # legacy/engine/sph_solver.py:235-246
    k = 10.0 / (7.0 * np.pi * h ** 2)
    q = r / h
    if q <= 1.0:
        return k * (1 - 1.5 * q ** 2 + 0.75 * q ** 3)
    if q < 2.0:
        return k * 0.25 * (2 - q) ** 3
    return 0.0


def test_legacy_kernel_values():
    h = 0.26
    rs = np.linspace(0, 2.5 * h, 61)
    ours = np.asarray(cubic_kernel_2d(rs.astype(np.float32), h))
    ref = np.array([ref_kernel_2d(r, h) for r in rs])
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-7)


def test_legacy_kernel_normalization():
    # 2D: integral of W over the 2h-support disk == 1
    h = 0.26
    n = 400
    xs = np.linspace(-2 * h, 2 * h, n)
    dx = xs[1] - xs[0]
    gx, gy = np.meshgrid(xs, xs)
    rn = np.hypot(gx, gy)
    w = np.asarray(cubic_kernel_2d(rn.astype(np.float32), h))
    assert abs(w.sum() * dx * dx - 1.0) < 5e-3


@pytest.mark.parametrize("name", list(METHODS))
def test_2d_methods_run_stable(name):
    sph = SPHSolver2D((200, 200), 20, [10.0, 0.0, 0.0, 10.0], dx=0.2,
                      method=METHODS[name], adaptive_time_step=True,
                      max_num_particles=1024)
    sph.add_cube([1.0, 1.0], [2.0, 3.0], MATERIAL_FLUID, density=[1000],
                 velocity=[0.0, -2.0])
    for f in range(12):
        dt = sph.step()
        assert dt > 0
        if f == 4:
            sph.add_cube([5.0, 6.0], [1.0, 1.0], MATERIAL_FLUID,
                         density=[1000], velocity=[0.0, -5.0])
    info = sph.particle_info()
    x = info["position"]
    assert len(x) == 150 + 25   # emission landed
    assert np.isfinite(x).all()
    # fluid stays inside the padded bounds (enforce_boundary semantics)
    assert (x[:, 0] >= sph.left_bound).all()
    assert (x[:, 0] <= sph.right_bound).all()
    assert (x[:, 1] >= sph.bottom_bound).all()


def test_adaptive_dt_responds_to_velocity():
    sph = SPHSolver2D((200, 200), 20, [10.0, 0.0, 0.0, 10.0], dx=0.2,
                      method=METHODS["PCISPH"], adaptive_time_step=True,
                      max_num_particles=512)
    sph.add_cube([1.0, 5.0], [1.0, 1.0], MATERIAL_FLUID, density=[1000],
                 velocity=[0.0, -0.1])
    dt_slow = sph.step()
    sph2 = SPHSolver2D((200, 200), 20, [10.0, 0.0, 0.0, 10.0], dx=0.2,
                       method=METHODS["PCISPH"], adaptive_time_step=True,
                       max_num_particles=512)
    sph2.add_cube([1.0, 5.0], [1.0, 1.0], MATERIAL_FLUID, density=[1000],
                  velocity=[0.0, -20.0])
    dt_fast = sph2.step()
    assert dt_fast < dt_slow  # CFL: faster fluid -> smaller dt
