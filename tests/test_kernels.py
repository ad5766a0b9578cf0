"""Unit tests for the cubic-spline kernel (SURVEY.md §4 parity target #1).

Oracle: a direct transcription of the reference's scalar math
(sph_base.py:23-68) in numpy, evaluated pointwise.
"""

import numpy as np
import jax.numpy as jnp

from sph_taichi_tpu.ops.kernels import (
    cubic_kernel, cubic_kernel_derivative, cubic_kernel_derivative_scalar)


def ref_cubic_kernel(r_norm, h, dim=3):
    k = {1: 4 / 3, 2: 40 / 7 / np.pi, 3: 8 / np.pi}[dim] / h ** dim
    q = r_norm / h
    if q > 1.0:
        return 0.0
    if q <= 0.5:
        return k * (6.0 * q ** 3 - 6.0 * q ** 2 + 1)
    return k * 2 * (1 - q) ** 3


def ref_cubic_kernel_derivative(r, h, dim=3):
    k = 6.0 * {1: 4 / 3, 2: 40 / 7 / np.pi, 3: 8 / np.pi}[dim] / h ** dim
    r = np.asarray(r, np.float64)
    r_norm = np.linalg.norm(r)
    q = r_norm / h
    if r_norm <= 1e-5 or q > 1.0:
        return np.zeros(dim)
    grad_q = r / (r_norm * h)
    if q <= 0.5:
        return k * q * (3.0 * q - 2.0) * grad_q
    return -k * (1.0 - q) ** 2 * grad_q


def test_kernel_values_match_reference():
    h = 0.04
    rs = np.linspace(0.0, 1.5 * h, 97)
    ours = np.asarray(cubic_kernel(jnp.asarray(rs, jnp.float32), h))
    ref = np.array([ref_cubic_kernel(r, h) for r in rs])
    np.testing.assert_allclose(ours, ref, rtol=2e-5)


def test_kernel_normalization_integrates_to_one():
    # 3D: integral of W over the support sphere == 1
    h = 0.1
    n = 80
    xs = np.linspace(-h, h, n)
    dx = xs[1] - xs[0]
    grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    rn = np.linalg.norm(grid, axis=-1)
    w = np.asarray(cubic_kernel(jnp.asarray(rn, jnp.float32), h))
    integral = w.sum() * dx ** 3
    assert abs(integral - 1.0) < 5e-3


def test_gradient_matches_reference(rng):
    h = 0.04
    rvecs = rng.uniform(-1.2 * h, 1.2 * h, size=(200, 3)).astype(np.float32)
    rvecs[0] = 0.0  # degenerate point must give zero gradient
    ours = np.asarray(cubic_kernel_derivative(jnp.asarray(rvecs), h))
    ref = np.array([ref_cubic_kernel_derivative(r, h) for r in rvecs])
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_scalar_gradient_factor_consistent(rng):
    h = 0.04
    rvecs = rng.uniform(-h, h, size=(100, 3)).astype(np.float32)
    rn = jnp.linalg.norm(jnp.asarray(rvecs), axis=-1)
    g = cubic_kernel_derivative_scalar(rn, h)[..., None] * rvecs
    full = cubic_kernel_derivative(jnp.asarray(rvecs), h)
    np.testing.assert_allclose(np.asarray(g), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


def test_gradient_is_odd_function(rng):
    h = 0.04
    r = rng.uniform(-h, h, size=(50, 3)).astype(np.float32)
    a = np.asarray(cubic_kernel_derivative(jnp.asarray(r), h))
    b = np.asarray(cubic_kernel_derivative(jnp.asarray(-r), h))
    np.testing.assert_allclose(a, -b, rtol=1e-5, atol=1e-7)
