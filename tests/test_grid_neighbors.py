"""Grid binning, sorting, and neighbor lists vs brute-force numpy oracles.

Mirrors the reference test strategy targets (SURVEY.md §4): flatten/unflatten
round trip (particle_system.py:288-298), counting sort == stable argsort,
prefix offsets == cumsum of histograms, neighbor sets == O(N^2) radius
search with the exact reference filters (p_j != p_i, |x_i-x_j| < h).
"""

import numpy as np
import jax.numpy as jnp

from sph_taichi_tpu.state import MATERIAL_FLUID, MATERIAL_PAD, Particles
from sph_taichi_tpu.ops.grid import (
    pos_to_cell, flatten_cell, compute_cell_ids, sort_by_cell, cell_offsets)
from sph_taichi_tpu.ops.neighbors import build_neighbor_list


GRID_NUM = (5, 4, 3)
GRID_SIZE = 0.1


def _rand_particles(rng, n, n_pad=None):
    n_pad = n_pad or n
    x = rng.uniform(0.0, [g * GRID_SIZE for g in GRID_NUM],
                    size=(n, 3)).astype(np.float32)
    xp = np.full((n_pad, 3), 1e9, np.float32)
    xp[:n] = x
    material = np.full(n_pad, MATERIAL_PAD, np.int32)
    material[:n] = MATERIAL_FLUID
    return jnp.asarray(xp), jnp.asarray(material)


def test_flatten_round_trip():
    nx, ny, nz = GRID_NUM
    cells = np.stack(np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                                 indexing="ij"), -1).reshape(-1, 3)
    flat = np.asarray(flatten_cell(jnp.asarray(cells), GRID_NUM))
    # must hit each id exactly once, in row-major order (reference :292-294)
    np.testing.assert_array_equal(flat, np.arange(nx * ny * nz))


def test_pos_to_cell_truncates():
    x = jnp.asarray([[0.0, 0.05, 0.0999], [0.1, 0.19999, 0.2]], jnp.float32)
    c = np.asarray(pos_to_cell(x, GRID_SIZE))
    np.testing.assert_array_equal(c, [[0, 0, 0], [1, 1, 2]])


def test_sort_matches_stable_argsort(rng):
    x, material = _rand_particles(rng, 200, 256)
    ids = compute_cell_ids(x, material, GRID_SIZE, GRID_NUM)
    dummy = Particles(
        object_id=jnp.arange(256, dtype=jnp.int32), x=x, x0=x,
        v=jnp.zeros_like(x), acc=jnp.zeros_like(x),
        m_V=jnp.zeros(256), m=jnp.zeros(256), density=jnp.zeros(256),
        pressure=jnp.zeros(256), material=material,
        is_dynamic=jnp.ones(256, jnp.int32),
        color=jnp.zeros((256, 3), jnp.int32))
    sp, sids = sort_by_cell(dummy, ids)
    ref_perm = np.argsort(np.asarray(ids), kind="stable")
    # object_id was iota, so the sorted object_id IS the permutation
    np.testing.assert_array_equal(np.asarray(sp.object_id), ref_perm)
    np.testing.assert_array_equal(np.asarray(sids),
                                  np.asarray(ids)[ref_perm])
    np.testing.assert_allclose(np.asarray(sp.x),
                               np.asarray(x)[ref_perm])
    # padding sorts to the tail (overflow cell)
    assert np.all(np.asarray(sp.material)[200:] == MATERIAL_PAD)


def test_cell_offsets_match_histogram(rng):
    x, material = _rand_particles(rng, 300, 300)
    ids = np.asarray(compute_cell_ids(x, material, GRID_SIZE, GRID_NUM))
    num_cells = np.prod(GRID_NUM)
    sorted_ids = np.sort(ids)
    starts = np.asarray(cell_offsets(jnp.asarray(sorted_ids), int(num_cells)))
    hist = np.bincount(ids, minlength=num_cells + 1)
    np.testing.assert_array_equal(np.diff(starts), hist)


def brute_force_neighbors(x, n_real, h):
    """Reference for_all_neighbors semantics: j != i, |xi-xj| < h."""
    sets = []
    for i in range(n_real):
        d = np.linalg.norm(x[:n_real] - x[i], axis=-1)
        nbrs = set(np.nonzero(d < h)[0].tolist()) - {i}
        sets.append(nbrs)
    return sets


def test_neighbor_list_matches_brute_force(rng):
    n, n_pad = 220, 256
    h = 4 * 0.0125  # support radius = grid size
    grid_num = (8, 8, 8)
    x = rng.uniform(0.05, 0.35, size=(n, 3)).astype(np.float32)
    xp = np.full((n_pad, 3), 1e9, np.float32)
    xp[:n] = x
    material = np.full(n_pad, MATERIAL_PAD, np.int32)
    material[:n] = MATERIAL_FLUID
    ids = compute_cell_ids(jnp.asarray(xp), jnp.asarray(material), h, grid_num)
    order = np.argsort(np.asarray(ids), kind="stable")
    xs = jnp.asarray(xp[order])
    sorted_ids = jnp.asarray(np.asarray(ids)[order])
    starts = cell_offsets(sorted_ids, int(np.prod(grid_num)))
    nl = build_neighbor_list(xs, starts, grid_num, h, h,
                             neighbor_cap=96, cell_cap=64)
    idx, cnt = np.asarray(nl.idx), np.asarray(nl.cnt)
    expected = brute_force_neighbors(np.asarray(xs), n, h)
    for i in range(n):
        got = set(idx[i, :min(cnt[i], 96)].tolist())
        assert got == expected[i], f"particle {i}: {got} != {expected[i]}"
    # padding has no neighbors
    assert np.all(cnt[n:] == 0)


def test_neighbor_counts_exact_even_beyond_cap(rng):
    # a dense clump: every particle within h of every other
    n, n_pad = 60, 64
    h = 1.0
    grid_num = (4, 4, 4)
    x = rng.uniform(1.2, 1.4, size=(n, 3)).astype(np.float32)
    xp = np.full((n_pad, 3), 1e9, np.float32)
    xp[:n] = x
    material = np.full(n_pad, MATERIAL_PAD, np.int32)
    material[:n] = MATERIAL_FLUID
    ids = compute_cell_ids(jnp.asarray(xp), jnp.asarray(material), h, grid_num)
    order = np.argsort(np.asarray(ids), kind="stable")
    xs = jnp.asarray(xp[order])
    starts = cell_offsets(jnp.asarray(np.asarray(ids)[order]),
                          int(np.prod(grid_num)))
    nl = build_neighbor_list(xs, starts, grid_num, h, h,
                             neighbor_cap=16, cell_cap=64)
    # cnt reports the true neighbor count (n-1) even though K=16 truncates
    assert np.all(np.asarray(nl.cnt)[:n] == n - 1)
    assert int(nl.max_cnt) == n - 1
