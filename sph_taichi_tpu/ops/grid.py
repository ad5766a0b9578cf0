"""Uniform background grid: cell ids, stable sort, cell-range offsets.

The reference re-bins particles every step with an atomic histogram, a
native GPU prefix sum, and an atomic counting sort through a full duplicate
buffer set (particle_system.py:311-375 + scan_single_buffer.py).  The
TPU-native equivalent is branch-free and deterministic:

    cell id  ->  stable sort of (cell_id, iota)  ->  permute the whole
    Particles pytree with one shared gather  ->  cell start offsets by
    searchsorted over the sorted keys (a vectorized binary search; the
    prefix-sum information content without a scan kernel).

Cell-id math is bit-identical to the reference: integer truncation of
pos / grid_size (pos_to_index, particle_system.py:288-289) and flattening
ix*ny*nz + iy*nz + iz (flatten_grid_index, :292-294).

Padding particles are forced into a dedicated overflow cell (id =
num_cells) so they sort to the tail and never appear in any neighbor
window; this also fixes the reference's cell-0 bug (particles in flat cell
0 are invisible as neighbors, particle_system.py:383) — our cell ranges
come from explicit [start, end) offsets, not prefix[cell-1].
"""

import jax
import jax.numpy as jnp
import numpy as np

from sph_taichi_tpu.state import MATERIAL_PAD


def pos_to_cell(x, grid_size):
    """Integer cell coords by truncation toward zero (reference :288-289).

    Implementation note (round-3 armadillo root cause): this must be a
    multiply by a HOST-computed f32 reciprocal, not a division.  XLA:TPU
    lowers f32 division differently from CPU (reciprocal-based), so
    ``x / grid_size`` assigns boundary-sitting lattice planes to
    different cells on TPU than on CPU — measured at armadillo scale:
    max row length 576 on device vs 384 on CPU, silently overflowing
    group_cap and corrupting every sum.  An IEEE f32 multiply rounds
    identically on both platforms, so capacity planning done on CPU
    (tests) holds on device.  Physics is insensitive to the 1-ulp
    assignment choice: pair inclusion is by exact distance (d2 < h2),
    and a both-ways-misrounded pair can only be lost at distance
    h - O(1e-7) where W vanishes.
    """
    inv = np.float32(1.0) / np.float32(grid_size)
    return (x * inv).astype(jnp.int32)


def flatten_cell(cell, grid_num):
    """ix*ny*nz + iy*nz + iz (reference :292-294)."""
    ny, nz = grid_num[1], grid_num[2]
    return cell[..., 0] * (ny * nz) + cell[..., 1] * nz + cell[..., 2]


def compute_cell_ids(x, material, grid_size, grid_num):
    """Flat cell id per particle; padding -> overflow cell (= num_cells).

    Real particle coords are clipped into the grid so out-of-domain strays
    get a valid edge cell instead of wrapping (the reference would index
    out of range, UB in Taichi).
    """
    num_cells = grid_num[0] * grid_num[1] * grid_num[2]
    cell = pos_to_cell(x, grid_size)
    cell = jnp.clip(cell, 0, jnp.asarray(grid_num, jnp.int32) - 1)
    flat = flatten_cell(cell, grid_num)
    return jnp.where(material == MATERIAL_PAD, num_cells, flat)


def sort_by_cell(particles, cell_ids, extra_transient=()):
    """Stable sort of the whole particle pytree by flat cell id.

    Replaces the reference's atomic counting sort (particle_system.py:322-369).
    Deterministic: equal keys keep their relative order.

    Implementation note: every field rides through one multi-operand
    ``lax.sort`` (the payload moves inside the sort network, fully
    vectorized).  The obvious argsort-then-gather alternative is ~100x
    slower on TPU, where irregular gathers serialize.
    Returns (sorted_particles, sorted_cell_ids).

    Transient fields do NOT ride the sort.  A field is transient when it
    is (re)computed before any read in every step, so permuting it
    carries no information; the sort network cost is linear in operand
    count, so every excluded field is a direct win.  Always transient:
    dfsph_factor / density_adv (recomputed by density_and_factor / the
    solvers at the top of every substep — excluding them also sidesteps
    a remote-compile pathology observed only with the 24-operand sort at
    dragon scale, round-1 known issue).  Callers pass more via
    ``extra_transient`` (see models/base.py bin_and_sort for the
    per-method analysis: acc always, pressure for WCSPH/DFSPH, x0 and
    color when nothing reads them after initialization).
    """
    transients = {}
    for name in ("dfsph_factor", "density_adv") + tuple(extra_transient):
        a = getattr(particles, name, None)
        if a is not None:
            transients[name] = jnp.zeros_like(a)
    if transients:
        particles = particles._replace(
            **{k: None for k in transients})
    leaves, treedef = jax.tree_util.tree_flatten(particles)
    operands = [cell_ids]
    layout = []  # (n_components,) per leaf
    for a in leaves:
        if a.ndim == 1:
            operands.append(a)
            layout.append(1)
        else:
            for d in range(a.shape[1]):
                operands.append(a[:, d])
            layout.append(a.shape[1])
    out = jax.lax.sort(tuple(operands), dimension=0, is_stable=True,
                       num_keys=1)
    sorted_ids = out[0]
    sorted_leaves = []
    pos = 1
    for a, ncomp in zip(leaves, layout):
        if ncomp == 1:
            sorted_leaves.append(out[pos])
            pos += 1
        else:
            sorted_leaves.append(jnp.stack(out[pos:pos + ncomp], axis=1))
            pos += ncomp
    sorted_particles = jax.tree_util.tree_unflatten(treedef, sorted_leaves)
    if transients:
        sorted_particles = sorted_particles._replace(**transients)
    return sorted_particles, sorted_ids


def cell_offsets(sorted_cell_ids, num_cells):
    """start[c] .. start[c+1] gives the sorted index range of cell c.

    start has length num_cells + 2 (one extra for the overflow cell used by
    padding particles).  Equivalent information to the reference's inclusive
    prefix sum over per-cell histograms (particle_system.py:374).

    Implementation: a sentinel-merge through two sort networks instead of
    `searchsorted` — the vectorized binary search is ~469K irregular loads
    and measured ~50 ms/step at dragon scale on TPU, while two structured
    sorts of (n + num_cells) keys run in ~1 ms.  Sentinel c gets key 2c
    (sorting just *before* particles in cell c, key 2c+1), so its merged
    rank q_c = starts[c] + c; a second flag-sort compacts the sentinel
    ranks to the front in cell order.
    """
    n = sorted_cell_ids.shape[0]
    c2 = num_cells + 2
    keys = jnp.concatenate([
        sorted_cell_ids.astype(jnp.int32) * 2 + 1,
        jnp.arange(c2, dtype=jnp.int32) * 2,
    ])
    flag = jnp.concatenate([jnp.ones((n,), jnp.int32),
                            jnp.zeros((c2,), jnp.int32)])
    _, flag_sorted = jax.lax.sort((keys, flag), dimension=0,
                                  is_stable=True, num_keys=1)
    q = jnp.arange(n + c2, dtype=jnp.int32)
    _, q_sent = jax.lax.sort((flag_sorted, q), dimension=0,
                             is_stable=True, num_keys=1)
    return q_sent[:c2] - jnp.arange(c2, dtype=jnp.int32)


def max_cell_occupancy(starts):
    """Diagnostic: most particles in any real cell (for cell_cap sizing)."""
    return jnp.max(starts[1:-1] - starts[:-2])
