"""Golden regression: 5 steps of the tiny scene vs committed snapshots.

Catches physics regressions across refactors/rounds. Tolerances are loose
enough to survive compiler/version drift but tight enough to catch any
semantic change (SURVEY §4 'golden regression' item).
"""

import numpy as np
import pytest

from sph_taichi_tpu import SimConfig, build_scene, build_solver
from conftest import small_scene_dict


@pytest.mark.parametrize("method", [0, 4])
def test_golden_5steps(method):
    ref = np.load(f"tests/golden/method{method}_5steps.npz")
    cfg = SimConfig(config_dict=small_scene_dict(method=method))
    params, particles, _ = build_scene(cfg)
    solver = build_solver(params)
    state = solver.initialize(particles)
    for _ in range(5):
        state, _ = solver.step(state)
    m = np.asarray(state.p.material) >= 0
    np.testing.assert_allclose(np.asarray(state.p.x)[m], ref["x"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.p.v)[m], ref["v"], atol=1e-3)


def _two_way_scene(method=0):
    """Tiny fluid block plus a DYNAMIC rigid block: exercises Akinci
    volumes, the two-way reaction, shape matching and rigid advection —
    the parity-richest code path (VERDICT round 1, item 7)."""
    d = small_scene_dict(method=method)
    d["RigidBlocks"] = [{
        "objectId": 1,
        "start": [0.55, 0.45, 0.25],
        "end": [0.8, 0.7, 0.5],
        "translation": [0.0, 0.0, 0.0],
        "scale": [1.0, 1.0, 1.0],
        "velocity": [0.0, 0.0, 0.0],
        "density": 500.0,
        "color": [100, 100, 100],
        "isDynamic": True,
    }]
    return d


def test_golden_two_way_coupling_5steps():
    ref = np.load("tests/golden/two_way_5steps.npz")
    cfg = SimConfig(config_dict=_two_way_scene())
    params, particles, _ = build_scene(cfg)
    solver = build_solver(params)
    state = solver.initialize(particles)
    for _ in range(5):
        state, _ = solver.step(state)
    m = np.asarray(state.p.material) >= 0
    rigid = (np.asarray(state.p.material) == 0)[m]
    np.testing.assert_allclose(np.asarray(state.p.x)[m], ref["x"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.p.v)[m], ref["v"], atol=1e-3)
    # the rigid must have actually moved (two-way forces + gravity act on
    # it) or this golden guards nothing
    assert np.abs(np.asarray(state.p.v)[m][rigid]).max() > 1e-3


def _two_way_dfsph_scene():
    """Dynamic rigid block directly BELOW the falling fluid: contact and
    compression within 5 DFSPH steps, so the pressure solve's in-loop
    reaction is provably nonzero (rigid velocity deviates from the
    gravity-only trajectory by >2 m/s at step 5 — measured when this
    golden was generated)."""
    d = small_scene_dict(method=4)
    d["RigidBlocks"] = [{
        "objectId": 1,
        "start": [0.15, 0.08, 0.15], "end": [0.45, 0.26, 0.45],
        "translation": [0.0, 0.0, 0.0], "scale": [1.0, 1.0, 1.0],
        "velocity": [0.0, 0.0, 0.0], "density": 500.0,
        "color": [100, 100, 100], "isDynamic": True,
    }]
    return d


def test_golden_two_way_coupling_dfsph_5steps():
    """DFSPH with a dynamic rigid: the in-loop reaction accumulation of
    pressure_solve (models/dfsph.py pressure_solve `react`; reference
    DFSPH.py:388-389) had zero end-to-end coverage before round 3
    (VERDICT r2 item 5) — this golden pins its physics."""
    ref = np.load("tests/golden/two_way_dfsph_5steps.npz")
    cfg = SimConfig(config_dict=_two_way_dfsph_scene())
    params, particles, _ = build_scene(cfg)
    solver = build_solver(params)
    state = solver.initialize(particles)
    dt = params.dt0
    for _ in range(5):
        state, metrics = solver.step(state)
    m = np.asarray(state.p.material) >= 0
    rigid = (np.asarray(state.p.material) == 0)[m]
    np.testing.assert_allclose(np.asarray(state.p.x)[m], ref["x"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.p.v)[m], ref["v"], atol=1e-3)
    # solver must actually iterate and converge
    assert 1 <= int(metrics["pressure_iters"]) <= 100
    # the reaction must be visible: rigid velocity deviates from the
    # gravity-only trajectory (otherwise this golden guards nothing)
    vr = np.asarray(state.p.v)[m][rigid]
    assert np.abs(vr[:, 1] - (-9.81 * 5 * dt)).max() > 0.1
