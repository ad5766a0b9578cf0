"""Scene construction parity: lattice counts, derived constants, init values."""

import numpy as np
import pytest

from sph_taichi_tpu import SimConfig, build_scene
from sph_taichi_tpu.scene import compute_cube_particle_num
from conftest import small_scene_dict


def test_cube_particle_num_matches_arange_semantics():
    # reference compute_cube_particle_num (particle_system.py:450-456)
    d = 0.02
    for start, end in [((0.1, 0.1, 0.5), (1.2, 2.9, 1.6)),
                       ((0.04, 0.04, 0.04), (4.96, 1.5, 1.96)),
                       ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))]:
        expected = 1
        for i in range(3):
            expected *= len(np.arange(start[i], end[i], d))
        assert compute_cube_particle_num(start, end, d, 3) == expected


def test_dragon_scene_fluid_count():
    # dragon_bath.json fluid block: arange semantics give exactly 423500
    cfg = SimConfig("data/scenes/dragon_bath.json")
    fluid = cfg.get_fluid_blocks()[0]
    n = compute_cube_particle_num(fluid["start"], fluid["end"], 0.02, 3)
    assert n == 423500


def test_derived_constants():
    cfg = SimConfig(config_dict=small_scene_dict())
    params, particles, _ = build_scene(cfg)
    r = params.particle_radius
    assert params.support_radius == 4 * r          # particle_system.py:37
    assert params.particle_diameter == 2 * r       # :36
    assert abs(params.m_V0 - 0.8 * (2 * r) ** 3) < 1e-12  # :38
    assert params.grid_size == params.support_radius      # :43
    assert params.padding == params.grid_size             # :46


def test_particle_init_values():
    cfg = SimConfig(config_dict=small_scene_dict())
    params, p, _ = build_scene(cfg)
    n = params.n_particles
    m_v = np.asarray(p.m_V)[:n]
    m = np.asarray(p.m)[:n]
    dens = np.asarray(p.density)[:n]
    np.testing.assert_allclose(m_v, params.m_V0, rtol=1e-6)
    np.testing.assert_allclose(m, params.m_V0 * dens, rtol=1e-6)  # :231
    # x0 == x at creation (:227)
    np.testing.assert_array_equal(np.asarray(p.x0)[:n], np.asarray(p.x)[:n])
    # fluid is forced dynamic (:165)
    assert (np.asarray(p.is_dynamic)[:n] == 1).all()


def test_all_bundled_scenes_load():
    import glob
    import os
    for f in sorted(glob.glob("data/scenes/*.json")):
        cfg = SimConfig(f)
        params, p, objects = build_scene(cfg, scene_dir=".")
        assert params.n_particles > 0
        assert params.n_fluid > 0
        if cfg.get_rigid_bodies():
            assert params.n_solid > 0
            assert len(objects.meshes) == len(cfg.get_rigid_bodies())


def test_missing_config_keys_return_none():
    cfg = SimConfig(config_dict=small_scene_dict())
    assert cfg.get_cfg("boundaryHandlingMethod") == 0  # present, dead key
    assert cfg.get_cfg("noSuchKey") is None            # silent None
    with pytest.raises(KeyError):
        cfg.get_cfg("noSuchKey", enforce_exist=True)
