"""Cubic-spline SPH smoothing kernel W and its gradient, as pure jnp funcs.

Constant-for-constant parity with the reference Taichi @ti.func versions
(sph_base.py:23-68): normalization k = 4/3, 40/(7*pi), 8/pi for dim 1/2/3
divided by h**dim; two-branch polynomial in q = r/h with split at q=0.5;
gradient prefactor 6k/h**dim, zero gradient for r_norm <= 1e-5 or q > 1.

Everything is shape-polymorphic and vmappable; all math stays in f32 when
given f32 inputs (constants are Python floats, i.e. weakly typed).
"""

import jax.numpy as jnp
import numpy as np


def _norm_const(dim, h):
    if dim == 1:
        k = 4.0 / 3.0
    elif dim == 2:
        k = 40.0 / 7.0 / np.pi
    elif dim == 3:
        k = 8.0 / np.pi
    else:
        raise ValueError(f"dim must be 1/2/3, got {dim}")
    return k / float(h) ** dim


def cubic_kernel(r_norm, h, dim=3):
    """W(r) — reference sph_base.py:24-44. r_norm: any-shape array.

    q is computed as r*(1/h) (one reciprocal folded at trace time)
    instead of r/h: VPU divides are multi-pass and this runs once per
    padded candidate LANE in the pair kernels (~6x more lanes than real
    pairs).  Same formula, f32 rounding shifts <= 1 ulp.
    """
    k = _norm_const(dim, h)
    q = r_norm * (1.0 / float(h))
    q2 = q * q
    q3 = q2 * q
    w_near = k * (6.0 * q3 - 6.0 * q2 + 1.0)
    one_m_q = 1.0 - q
    w_far = k * 2.0 * one_m_q * one_m_q * one_m_q
    res = jnp.where(q <= 0.5, w_near, w_far)
    return jnp.where(q <= 1.0, res, 0.0)


def cubic_kernel_derivative(r, h, dim=3):
    """grad W(r) — reference sph_base.py:46-68. r: (..., dim) vectors.

    Returns zero vector when r_norm <= 1e-5 or q > 1 (same cutoffs).
    """
    k = 6.0 * _norm_const(dim, h)
    r_norm = jnp.linalg.norm(r, axis=-1, keepdims=True)
    q = r_norm / h
    # guard the division; the result is masked out where r_norm <= 1e-5
    safe_norm = jnp.maximum(r_norm, 1e-24)
    grad_q = r / (safe_norm * h)
    near = (k * q * (3.0 * q - 2.0)) * grad_q
    fac = 1.0 - q
    far = (-k * fac * fac) * grad_q
    res = jnp.where(q <= 0.5, near, far)
    valid = (r_norm > 1e-5) & (q <= 1.0)
    return jnp.where(valid, res, 0.0)


def cubic_kernel_derivative_scalar(r_norm, h, dim=3, inv_r=None):
    """dW/dr / r — scalar gradient factor g such that grad W = g * r.

    Useful in pair kernels that already have r vectors and distances:
    avoids recomputing the norm. Matches cubic_kernel_derivative to f32
    rounding: grad W(r) = g(|r|) * r.

    ``inv_r``: optional precomputed 1/|r| (engines provide it in mxu
    mode as ``dots["_inv"]`` via one rsqrt(d2) — round-4 strength
    reduction: drops the per-lane divide here AND the engine's sqrt).
    Values shift <= 2 ulp vs the divide form; the masked r<=1e-5 region
    is unaffected (result forced to 0 either way).
    """
    k = 6.0 * _norm_const(dim, h)
    inv_h = 1.0 / float(h)
    q = r_norm * inv_h
    if inv_r is None:
        safe = jnp.maximum(r_norm, 1e-24)
        inv_rh = inv_h / safe
    else:
        inv_rh = inv_r * inv_h
    near = k * q * (3.0 * q - 2.0) * inv_rh
    fac = 1.0 - q
    far = -k * fac * fac * inv_rh
    res = jnp.where(q <= 0.5, near, far)
    valid = (r_norm > 1e-5) & (q <= 1.0)
    return jnp.where(valid, res, 0.0)
