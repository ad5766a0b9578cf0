"""Exporters, checkpoint/resume, geometry loaders."""

import os

import numpy as np
import jax

from sph_taichi_tpu import SimConfig, build_scene, build_solver
from sph_taichi_tpu.utils import exporters
from sph_taichi_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from sph_taichi_tpu.geometry.mesh import TriMesh, load_obj, load_stl
from sph_taichi_tpu.geometry.voxelize import voxelize_fill
from sph_taichi_tpu.geometry.transforms import rotation_matrix
from conftest import small_scene_dict


def test_ply_writer(tmp_path, rng):
    pos = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    path = str(tmp_path / "out.ply")
    exporters.write_ply_ascii(path, pos)
    text = open(path).read()
    assert "element vertex 100" in text
    data = np.loadtxt(path, skiprows=8)
    np.testing.assert_allclose(data, pos, atol=1e-5)
    assert exporters.ply_series_path("a/b.ply", 7) == "a/b_000007.ply"


def test_png_writer(tmp_path, rng):
    img = (rng.uniform(0, 255, (32, 48, 3))).astype(np.uint8)
    path = str(tmp_path / "img.png")
    exporters.write_png(path, img)
    raw = open(path, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in raw and b"IDAT" in raw and b"IEND" in raw


def test_render_png(tmp_path, rng):
    pos = rng.uniform(0, 2, (500, 3))
    col = np.full((500, 3), 200, np.uint8)
    exporters.render_png(str(tmp_path / "frame.png"), pos, col)
    assert os.path.getsize(tmp_path / "frame.png") > 100


def test_obj_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    mesh = TriMesh(verts, faces)
    path = str(tmp_path / "t.obj")
    exporters.write_obj(path, mesh)
    back = load_obj(path)
    np.testing.assert_allclose(back.vertices, verts, atol=1e-6)
    np.testing.assert_array_equal(back.faces, faces)


def test_shape_matched_vertices():
    rest = np.array([[1.0, 0, 0], [0, 1, 0]])
    center = rest.mean(0)
    rot = rotation_matrix(np.pi / 2, [0, 0, 1])[:3, :3]
    out = exporters.shape_matched_vertices(rest, center, rot, [5, 5, 5])
    expected = np.array([5, 5, 5]) + (rest - center) @ rot.T
    np.testing.assert_allclose(out, expected, atol=1e-7)


def test_voxelize_sphere_volume():
    # voxelized solid ball should have ~ (4/3) pi r^3 / pitch^3 points
    import math
    t = np.linspace(0, np.pi, 24)
    p = np.linspace(0, 2 * np.pi, 48)
    tt, pp = np.meshgrid(t, p, indexing="ij")
    r = 0.5
    pts = np.stack([r * np.sin(tt) * np.cos(pp),
                    r * np.sin(tt) * np.sin(pp),
                    r * np.cos(tt)], -1).reshape(-1, 3)
    hull_idx = _convex_hull_faces(pts)
    pitch = 0.05
    out = voxelize_fill(pts, hull_idx, pitch)
    expected = 4 / 3 * math.pi * r ** 3 / pitch ** 3
    assert abs(len(out) - expected) / expected < 0.25
    # all points within the ball + one voxel
    assert (np.linalg.norm(out, axis=1) < r + pitch).all()


def _convex_hull_faces(pts):
    from scipy.spatial import ConvexHull
    return ConvexHull(pts).simplices


def test_stl_loader():
    m = load_stl("data/models/bunny.stl")
    assert m.vertices.shape[0] > 1000
    assert m.faces.shape[1] == 3
    assert m.faces.max() < m.vertices.shape[0]


def test_checkpoint_roundtrip(tmp_path):
    cfg = SimConfig(config_dict=small_scene_dict(method=0))
    params, particles, _ = build_scene(cfg)
    solver = build_solver(params)
    state = solver.initialize(particles)
    for _ in range(3):
        state, _ = solver.step(state)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state)
    fresh = solver.initialize(particles)
    restored = load_checkpoint(path, fresh)
    np.testing.assert_array_equal(np.asarray(restored.p.x),
                                  np.asarray(state.p.x))
    assert int(restored.step_count) == 3
    # resumed run continues identically to an uninterrupted one
    s_direct = state
    for _ in range(2):
        s_direct, _ = solver.step(s_direct)
        restored, _ = solver.step(restored)
    np.testing.assert_array_equal(np.asarray(s_direct.p.x),
                                  np.asarray(restored.p.x))


def test_viewer_reads_exported_series(tmp_path):
    """tools/viewer.py (the GGUI-window counterpart) parses the driver's
    PLY series and the scene's domain box."""
    import sys
    sys.path.insert(0, ".")
    import matplotlib
    matplotlib.use("Agg")
    from tools.viewer import read_ply_positions, frame_series
    from sph_taichi_tpu.utils import exporters

    pts = np.random.RandomState(0).rand(100, 3).astype(np.float32)
    exporters.write_ply_ascii(str(tmp_path / "particle_object_0_000003.ply"),
                              pts)
    series = frame_series(str(tmp_path))
    assert series == [(3, [str(tmp_path / "particle_object_0_000003.ply")])]
    back = read_ply_positions(series[0][1][0])
    np.testing.assert_allclose(back, pts, atol=1e-6)
