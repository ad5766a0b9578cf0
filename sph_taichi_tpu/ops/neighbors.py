"""Fixed-capacity neighbor lists from the sorted cell structure.

The reference iterates neighbors on the fly inside every pair kernel via a
27-cell template loop (for_all_neighbors, particle_system.py:378-385).  On
TPU that per-use traversal would repeat all the irregular index math for
every pair sum, so instead we materialize a (N, K) neighbor index matrix
once per step and let every pair sum reuse it as plain masked gathers —
WCSPH reuses it 3x per substep, DFSPH O(solver iterations) times.

The builder loops over the 27 (3^dim) cell offsets *statically*; for each
offset it pulls up to `cell_cap` candidate indices from the cell's sorted
[start, end) range, applies the same filters as the reference
(p_j != p_i and |x_i - x_j| < support_radius, particle_system.py:384), and
compacts survivors into the next free slots with a deterministic scatter.

Semantics notes:
- `cnt` is the *exact* number of within-radius neighbors (even beyond K),
  which is what DFSPH's particle-deficiency test needs (DFSPH.py:171-176).
- Cells fuller than cell_cap or particles with more than K neighbors are
  truncated; both are surfaced as diagnostics so capacities can be sized.
  (The reference has no caps but its 3D engine never needs >~80 neighbors;
  capacities are config knobs.)
"""

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class NeighborList(NamedTuple):
    idx: jnp.ndarray      # i32[N, K] sorted-order neighbor indices (0-filled tail)
    cnt: jnp.ndarray      # i32[N] true within-radius neighbor count (may exceed K)
    # diagnostics (scalars)
    max_cnt: jnp.ndarray  # i32[] max neighbors seen for any particle

    def mask(self):
        """bool[N, K]: which idx entries are valid."""
        k = self.idx.shape[1]
        slots = jnp.arange(k, dtype=jnp.int32)[None, :]
        return slots < jnp.minimum(self.cnt, k)[:, None]

    @property
    def diag(self):
        """Capacity diagnostics, surfaced into step metrics by
        models.base.bin_and_sort (same contract as BlockEngine's BlockCtx).
        neighbor_overflow != 0 means pair contributions were dropped —
        physics is WRONG; raise params.neighbor_cap."""
        k = self.idx.shape[1]
        return {"max_neighbors": self.max_cnt,
                "neighbor_overflow":
                    (self.max_cnt > k).astype(jnp.int32)}


def build_neighbor_list(x, cell_starts, grid_num, grid_size, support_radius,
                        neighbor_cap, cell_cap, dim=3):
    """Build (N, K) neighbor lists over cell-sorted positions.

    Args:
      x: f32[N, dim] positions in sorted (by cell id) order.
      cell_starts: i32[num_cells + 2] from ops.grid.cell_offsets.
      grid_num: static (nx, ny, nz).
      neighbor_cap: K.
      cell_cap: M, max particles fetched per cell.
    """
    n = x.shape[0]
    k_cap = neighbor_cap
    m = cell_cap
    h2 = support_radius * support_radius
    gn = jnp.asarray(grid_num, jnp.int32)
    strides = jnp.asarray(
        [grid_num[1] * grid_num[2], grid_num[2], 1], jnp.int32)[:dim]

    from sph_taichi_tpu.ops.grid import pos_to_cell
    center = pos_to_cell(x, grid_size)  # must match grid cell assignment
    rows = jnp.arange(n, dtype=jnp.int32)
    slot_iota = jnp.arange(m, dtype=jnp.int32)[None, :]

    nbr_idx = jnp.zeros((n, k_cap), jnp.int32)
    cnt = jnp.zeros((n,), jnp.int32)

    offsets = list(itertools.product(*([(-1, 0, 1)] * dim)))
    for off in offsets:
        cc = center + jnp.asarray(off, jnp.int32)
        in_grid = jnp.all((cc >= 0) & (cc < gn), axis=-1)
        flat = jnp.sum(jnp.clip(cc, 0, gn - 1) * strides, axis=-1)
        start = cell_starts[flat]
        end = jnp.where(in_grid, cell_starts[flat + 1], start)
        cand = start[:, None] + slot_iota                    # (N, M)
        in_cell = cand < end[:, None]
        cand_c = jnp.minimum(cand, n - 1)
        xj = x[cand_c]                                       # (N, M, dim)
        d = x[:, None, :] - xj
        d2 = jnp.sum(d * d, axis=-1)
        ok = in_cell & (d2 < h2) & (cand_c != rows[:, None])
        # compact survivors into next free slots (deterministic scatter)
        slot = cnt[:, None] + jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
        write_slot = jnp.where(ok & (slot < k_cap), slot, k_cap)  # k_cap -> dropped
        nbr_idx = nbr_idx.at[rows[:, None], write_slot].set(
            cand_c, mode="drop")
        cnt = cnt + jnp.sum(ok, axis=1, dtype=jnp.int32)

    return NeighborList(idx=nbr_idx, cnt=cnt, max_cnt=jnp.max(cnt))


def gather_neighbors(arr, nl):
    """arr[N, ...] -> arr[N, K, ...] gathered along the neighbor axis."""
    return arr[nl.idx]
