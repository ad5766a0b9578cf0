"""Sharded (8 virtual devices) vs single-device equivalence.

The TPU analog of a fake-backend multi-node test (SURVEY §4): the full
shard_map pipeline — migration ppermute, halo-exchange ppermute,
per-iteration ghost field sync, local extended-grid traversal, psum
reductions — runs on 8 virtual CPU devices and must produce the same
physics as the single-device solver (up to f32 summation-order noise,
amplified by the stiff Tait EOS / Jacobi iterations)."""

import numpy as np
import jax
import pytest
from scipy.spatial import cKDTree

from sph_taichi_tpu import SimConfig, build_scene, build_solver
from sph_taichi_tpu.parallel.sharding import ShardedSolver
from conftest import small_scene_dict


@pytest.mark.parametrize("method", [0, 2, 4])
def test_sharded_matches_single_device(method):
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    cfg = SimConfig(config_dict=small_scene_dict(method=method))
    params, particles, _ = build_scene(cfg)

    single = build_solver(params)
    s_state = single.initialize(particles)

    sharded = ShardedSolver(params, n_devices=8, mig_cap=128, halo_cap=512,
                            loc_cap=params.n_pad)
    sh_state = sharded.initialize(particles)

    n_steps = 5
    for _ in range(n_steps):
        s_state, _ = single.step(s_state)
        sh_state, m = sharded.step(sh_state)

    assert int(m["migration_overflow"]) == 0
    assert int(m["halo_overflow"]) == 0

    sp = s_state.p
    mask = np.asarray(sp.material) >= 0
    x1 = np.asarray(sp.x)[mask]
    v1 = np.asarray(sp.v)[mask]

    gp = sharded.gather_particles(sh_state)
    x2, v2 = np.asarray(gp.x), np.asarray(gp.v)
    assert x1.shape == x2.shape, (
        f"particle count mismatch: {x1.shape} vs {x2.shape}")

    # match particle sets by nearest position (f32 noise breaks any exact
    # ordering), then compare matched positions and velocities
    tree = cKDTree(x2)
    dist, idx = tree.query(x1, k=1)
    assert len(np.unique(idx)) == len(idx), "matching is not a bijection"
    assert dist.max() < 5e-4, f"position mismatch: max {dist.max()}"
    dv = np.abs(v1 - v2[idx]).max()
    assert dv < 0.05, f"velocity mismatch: max {dv}"
