"""Small dense linear algebra helpers used by the rigid-body solver."""

import jax.numpy as jnp


def polar_rotation(a):
    """Rotation factor R of the polar decomposition A = R S.

    TPU-native replacement for ti.polar_decompose (reference
    sph_base.py:212): SVD with determinant correction so R is always a
    proper rotation (det +1), matching Taichi's rotation-safe svd3d.
    Degenerate A ~ 0 yields identity (the reference falls back to identity
    when R vanishes, sph_base.py:214-215).
    """
    u, _, vt = jnp.linalg.svd(a)
    det = jnp.linalg.det(u @ vt)
    d = jnp.ones((3,), a.dtype).at[2].set(det)
    r = (u * d[None, :]) @ vt
    degenerate = jnp.sum(jnp.abs(a)) < 1e-12
    return jnp.where(degenerate, jnp.eye(3, dtype=a.dtype), r)
