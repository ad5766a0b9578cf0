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


@pytest.mark.parametrize("method", [0, 1, 2, 4])
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


def test_sharded_fast_flow_crossing_stress():
    """Particles with strong x-velocity repeatedly cross slab boundaries
    for 50 steps on the 8-device mesh: migration and halo machinery must
    keep every particle, never trip a capacity flag, and keep the state
    finite and inside the padded box.  (VERDICT round 1, item 9.)"""
    assert len(jax.devices()) >= 8
    d = small_scene_dict(method=0, radius=0.05,
                         block=((0.1, 0.4, 0.1), (0.45, 0.7, 0.45)),
                         velocity=(3.0, 0.0, 1.0))
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg)
    sharded = ShardedSolver(params, n_devices=8, mig_cap=128, halo_cap=512,
                            loc_cap=params.n_pad)
    state = sharded.initialize(particles)
    for i in range(50):
        state, m = sharded.step(state)
        assert int(m["migration_overflow"]) == 0, f"step {i}"
        assert int(m["halo_overflow"]) == 0, f"step {i}"
    gp = sharded.gather_particles(state)
    x = np.asarray(gp.x)
    assert x.shape[0] == params.n_particles
    assert np.isfinite(x).all()
    assert np.isfinite(np.asarray(gp.v)).all()
    pad = params.padding
    size = np.asarray(params.domain_size)
    assert (x >= pad - 1e-4).all() and (x <= size - pad + 1e-4).all()


def test_sharded_migration_overflow_is_loud():
    """With a deliberately absurd migration capacity, the overflow flag
    must fire (silent loss is the failure mode being guarded against) and
    the particle count must still be conserved."""
    assert len(jax.devices()) >= 8
    d = small_scene_dict(method=0, radius=0.05,
                         block=((0.1, 0.4, 0.1), (0.45, 0.7, 0.45)),
                         velocity=(3.0, 0.0, 0.0))
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg)
    sharded = ShardedSolver(params, n_devices=8, mig_cap=1, halo_cap=512,
                            loc_cap=params.n_pad)
    state = sharded.initialize(particles)
    fired = False
    for _ in range(30):
        state, m = sharded.step(state)
        if int(m["migration_overflow"]) > 0:
            fired = True
            break
    assert fired, "migration overflow never flagged despite mig_cap=1"


def test_sharded_moving_rigid_ghost_staleness_bound():
    """docs/PARITY.md deviation 3: ghost copies of moving-rigid particles
    refresh their Akinci m_V one hop late in sharded runs.  This test
    quantifies the resulting divergence from the single-device solver on
    a two-way coupling scene and bounds it: the sharded state must stay a
    position-matched bijection of the single-device state within loose
    physical tolerances over 10 steps."""
    assert len(jax.devices()) >= 8
    d = small_scene_dict(method=0)
    d["RigidBlocks"] = [{
        "objectId": 1,
        "start": [0.55, 0.45, 0.25],
        "end": [0.8, 0.7, 0.5],
        "translation": [0.0, 0.0, 0.0],
        "scale": [1.0, 1.0, 1.0],
        "velocity": [0.0, -0.5, 0.0],
        "density": 500.0,
        "color": [100, 100, 100],
        "isDynamic": True,
    }]
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg)

    single = build_solver(params)
    s_state = single.initialize(particles)
    sharded = ShardedSolver(params, n_devices=8, mig_cap=128, halo_cap=512,
                            loc_cap=params.n_pad)
    sh_state = sharded.initialize(particles)

    for _ in range(10):
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
    assert x1.shape == x2.shape
    tree = cKDTree(x2)
    dist, idx = tree.query(x1, k=1)
    assert len(np.unique(idx)) == len(idx), "matching is not a bijection"
    # staleness bound: positions within one particle radius, velocities
    # within 10% of the fall speed after 10 steps
    assert dist.max() < params.particle_radius, \
        f"ghost m_V staleness displaced particles by {dist.max()}"
    dv = np.abs(v1 - v2[idx]).max()
    assert dv < 0.1, f"velocity divergence {dv}"


@pytest.mark.parametrize("method", [0])
def test_sharded_blocks_engine(method):
    """The Pallas blocks engine under shard_map (interpret mode) — the
    actual multi-chip production configuration.  Each shard runs the
    block kernel on its local extended grid; physics must match the
    single-device blocks solver.  (Sharded runs use the unfused paths:
    ghosts carry is_dynamic=-1, see docs/DESIGN.md.)"""
    import dataclasses
    assert len(jax.devices()) >= 8
    cfg = SimConfig(config_dict=small_scene_dict(method=method))
    params, particles, _ = build_scene(cfg)
    params = dataclasses.replace(params,
                                 backend="pallas_blocks_interpret")

    single = build_solver(params)
    s_state = single.initialize(particles)

    sharded = ShardedSolver(params, n_devices=8, mig_cap=128,
                            halo_cap=512, loc_cap=params.n_pad)
    sh_state = sharded.initialize(particles)

    for _ in range(2):
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
    assert x1.shape == x2.shape
    tree = cKDTree(x2)
    dist, idx = tree.query(x1, k=1)
    assert len(np.unique(idx)) == len(idx)
    assert dist.max() < 5e-4, f"position mismatch: max {dist.max()}"
    assert np.abs(v1 - v2[idx]).max() < 0.05
