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
