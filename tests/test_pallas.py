"""Pallas engine ↔ GatherEngine equivalence (interpret mode on CPU).

The Pallas row-streaming engine (ops/pallas_pairs.py) is the production
TPU path for every pair sum in the framework.  These tests run the SAME
jitted solver programs with backend="pallas_interpret" (the Pallas kernel
executed by the Pallas interpreter on CPU) and backend="gather" (the
portable oracle engine) and assert the resulting states agree.  Whole-
solver equivalence transitively covers every term function in the
codebase:

- boundary volume (models/base.py:_boundary_volume) via initialize() and
  the moving-volume recompute,
- WCSPH density + fused non-pressure/pressure/reaction (models/wcsph.py),
- DFSPH density / factor / density_change / density_adv / both solver
  iteration terms (models/dfsph.py),
- IISPH a_ii / source / pressure-acceleration terms (models/iisph.py).

Layouts are adversarial on purpose: randomized clumped positions that
force multi-pass cells (> CB particles per cell) and particles in edge
rows/cells of the grid (iz = 0 / nz-1, boundary rows), the regimes where
the kernel's window machinery can silently go wrong.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from sph_taichi_tpu import SimConfig, build_scene, build_solver
from conftest import small_scene_dict


def _solver(method, backend, scene=None, steps_scene_kw=None, perturb=None):
    d = scene or small_scene_dict(method=method, **(steps_scene_kw or {}))
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=128, cell_cap=32)
    params = dataclasses.replace(params, backend=backend)
    if perturb is not None:
        particles = particles._replace(x=jnp.asarray(perturb))
    solver = build_solver(params)
    return solver, particles


def _run(method, backend, n_steps, scene=None, perturb=None):
    solver, particles = _solver(method, backend, scene=scene,
                                perturb=perturb)
    state = solver.initialize(particles)
    for _ in range(n_steps):
        state, metrics = solver.step(state)
    return state


def _assert_states_close(sa, sb, atol=2e-5, rtol=2e-4, matched=False):
    """matched=True: compare after a nearest-position bijection.  Needed
    for multi-step runs since the MXU pass computes d2 through a centered
    matmul expansion whose f32 rounding differs from the gather oracle by
    ~1e-6 relative — enough to flip the per-step cell-sort permutation,
    so per-index comparison stops being meaningful (the *sets* agree)."""
    pa, pb = sa.p, sb.p
    real = np.asarray(pa.material) != -1
    realb = np.asarray(pb.material) != -1
    if matched:
        from scipy.spatial import cKDTree
        xa = np.asarray(pa.x)[real]
        xb = np.asarray(pb.x)[realb]
        tree = cKDTree(xb)
        dist, idx = tree.query(xa, k=1)
        assert len(np.unique(idx)) == len(idx), "matching not a bijection"
        assert dist.max() < 5e-4, f"position mismatch: max {dist.max()}"
        for name in ("v", "density", "pressure", "m_V"):
            a = np.asarray(getattr(pa, name))[real]
            b = np.asarray(getattr(pb, name))[realb][idx]
            np.testing.assert_allclose(
                a, b, atol=max(atol, 5e-3), rtol=max(rtol, 2e-3),
                err_msg=f"field {name} diverged between engines")
        return
    for name in ("x", "v", "density", "pressure", "m_V"):
        a = np.asarray(getattr(pa, name))[real]
        b = np.asarray(getattr(pb, name))[realb]
        np.testing.assert_allclose(
            a, b, atol=atol, rtol=rtol,
            err_msg=f"field {name} diverged between engines")


@pytest.mark.parametrize("method", [0, 4, 2, 1])
def test_solver_equivalence_lattice(method):
    """Multi-step solver runs agree on the standard falling-block scene."""
    n = 3
    sg = _run(method, "gather", n)
    sp = _run(method, "pallas_interpret", n)
    _assert_states_close(sg, sp, matched=True)


def _clumped_positions(rng, params, particles):
    """Randomized layout with >CB-particle cells and edge-cell coverage."""
    x = np.asarray(particles.x).copy()
    real = np.asarray(particles.material) != -1
    n = int(real.sum())
    size = np.asarray(params.domain_size, np.float32)
    cell = params.grid_size
    pad = params.padding
    # random positions across the padded box
    x[:n] = rng.uniform(pad, size - pad, size=(n, 3)).astype(np.float32)
    # clump 1: 20 particles inside one interior cell (multi-pass center,
    # multi-pass candidates)
    c0 = np.array([3, 3, 3]) * cell + 0.1 * cell
    x[:20] = (c0 + rng.uniform(0, 0.8 * cell, size=(20, 3))).astype(np.float32)
    # clump 2: 12 particles straddling a cell boundary in z
    c1 = np.array([5, 5, 4]) * cell
    x[20:32] = (c1 + rng.uniform(-0.4 * cell, 0.4 * cell,
                                 size=(12, 3))).astype(np.float32)
    # edge coverage: particles in the first/last cell along each axis
    grid = np.asarray(params.grid_num)
    for i, (ax, hi) in enumerate(((0, False), (1, False), (2, False),
                                  (0, True), (1, True), (2, True))):
        p = rng.uniform(pad, size - pad, size=3).astype(np.float32)
        p[ax] = (grid[ax] - 0.5) * cell if hi else 0.5 * cell
        p[ax] = min(max(p[ax], pad), size[ax] - pad)
        x[32 + i] = p
    return x


@pytest.mark.parametrize("method", [0, 4])
def test_solver_equivalence_clumped(method, rng):
    """One step on an adversarial clumped layout (multi-pass cells, edge
    rows) agrees between engines."""
    solver_g, particles = _solver(method, "gather")
    x = _clumped_positions(rng, solver_g.params, particles)
    sg = _run(method, "gather", 1, perturb=x)
    sp = _run(method, "pallas_interpret", 1, perturb=x)
    _assert_states_close(sg, sp)


@pytest.mark.parametrize("method", [0, 4])
def test_boundary_volume_equivalence_with_rigid_block(method):
    """Akinci boundary volumes (static + moving) agree on a scene with a
    rigid block: covers the solid-only term and the two-way coupling
    reaction path in the force traversal.  method=4 covers DFSPH's
    in-pressure-solve reaction accumulation (VERDICT r2 item 5)."""
    d = small_scene_dict(method=method)
    d["RigidBlocks"] = [{
        "objectId": 1,
        "start": [0.55, 0.1, 0.1],
        "end": [0.85, 0.4, 0.4],
        "translation": [0.0, 0.0, 0.0],
        "scale": [1.0, 1.0, 1.0],
        "velocity": [0.0, 0.0, 0.0],
        "density": 1000.0,
        "color": [100, 100, 100],
        "isDynamic": True,
    }]
    sg = _run(method, "gather", 2, scene=d)
    sp = _run(method, "pallas_interpret", 2, scene=d)
    _assert_states_close(sg, sp, matched=True)


@pytest.mark.parametrize("window_cap", [192, 64])
@pytest.mark.parametrize("mode", ["legacy", "mxu"])
def test_extreme_compression_matches_oracle(rng, window_cap, mode):
    """~200 particles forced into ONE grid cell: candidate windows far
    exceed one 128-lane tile (multi-sheet assembly) and center counts far
    exceed one pass.  The Pallas engine must match the brute-force-backed
    gather oracle exactly — capacity overflow may cost passes, never
    pairs.  (VERDICT round 1, item 4.)"""
    import dataclasses as _dc
    import jax.numpy as _jnp
    from sph_taichi_tpu import SimConfig as _SC, build_scene as _bs
    from sph_taichi_tpu.models.base import bin_and_sort as _bas
    from sph_taichi_tpu.ops.pairs import make_engine as _me
    from sph_taichi_tpu.ops.kernels import cubic_kernel as _ck

    d = small_scene_dict(method=0)
    cfg = _SC(config_dict=d)
    params, particles, _ = _bs(cfg, neighbor_cap=256, cell_cap=256)
    x = np.asarray(particles.x).copy()
    real = np.asarray(particles.material) != -1
    n = int(real.sum())
    cell = params.grid_size
    c0 = np.array([4, 4, 4]) * cell + 0.05 * cell
    m = min(n, 200)
    x[:m] = (c0 + rng.uniform(0, 0.9 * cell, size=(m, 3))).astype(np.float32)
    # randomized velocities so the MXU pair-dot path sees nonzero v_ij
    v = np.asarray(particles.v).copy()
    v[:n] = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    particles = particles._replace(x=_jnp.asarray(x), v=_jnp.asarray(v))

    h = params.support_radius
    outs = {}
    for backend in ("gather", "pallas_interpret"):
        p2 = _dc.replace(params, backend=backend, window_cap=window_cap)
        eng = _me(p2)
        ps, ctx, diag = _bas(particles, p2, eng)

        if mode == "mxu":
            # ADVICE r2 item 4: the multi-sheet overflow path must also be
            # covered with the MXU contract (per-sheet read-modify-write
            # accumulation + radial matmul decomposition + pair dots)
            def term(fi, fj, d2, rn, dots):
                return {"delta": fj["m_V"] * _ck(rn, h, p2.dim),
                        "rad": fj["m_V"] * dots["v"]}

            out = eng.traverse(
                ctx, ps.x,
                {"m_V": ps.m_V, "v0": ps.v[:, 0], "v1": ps.v[:, 1],
                 "v2": ps.v[:, 2]},
                term, {"delta": "scalar", "rad": "radial"},
                mode="mxu", pair_dots=("v",))
        else:
            def term(fi, fj, rvec, rn):
                return {"delta": fj["m_V"] * _ck(rn, h, p2.dim)}

            out = eng.traverse(ctx, ps.x, {"m_V": ps.m_V}, term,
                               {"delta": "scalar"})
        # engine contract: output is defined for real particles only
        # (padding rows are never traversal centers); compare real ones,
        # sorted back to a canonical order
        real_s = np.asarray(ps.material) != -1
        xs = np.asarray(ps.x)[real_s]
        order = np.argsort(xs[:, 0] * 1e6 + xs[:, 1] * 1e3 + xs[:, 2],
                           kind="stable")
        res = np.asarray(out["delta"])[real_s][order]
        if mode == "mxu":
            rad = np.stack([np.asarray(c) for c in out["rad"]], axis=1)
            outs[backend] = (res, rad[real_s][order])
        else:
            outs[backend] = (res, None)
        if backend == "pallas_interpret":
            assert bool(diag["window_overflow"]), \
                "test must actually exercise the multi-sheet path"
            assert int(diag["max_cell_occupancy_engine"]) >= 150
    np.testing.assert_allclose(outs["pallas_interpret"][0],
                               outs["gather"][0], rtol=1e-5, atol=1e-7)
    if mode == "mxu":
        # radial sums over a 200-particle clump are ~1e-6 cancellation
        # residues of ~2.5e-7 per-pair terms; the two engines use
        # different summation orders AND decompositions (centered matmul
        # s0*xc_i - s1 vs direct sum of c*rvec), so compare at per-pair
        # scale.  A dropped pair is still caught by the scalar column
        # above (per-pair ~1e-3 >> 1e-7 atol, same mask).
        np.testing.assert_allclose(outs["pallas_interpret"][1],
                                   outs["gather"][1], rtol=1e-4, atol=3e-6)


@pytest.mark.parametrize("scene", ["dragon_bath.json",
                                   "dragon_bath_dfsph.json",
                                   "dragon_bath_dynamic_dfsph.json",
                                   "armadillo_bath_dynamic.json",
                                   "armadillo_bath_dynamic_dfsph.json"])
def test_bundled_scene_capacities(scene):
    """The bundled reference scenes start within every engine capacity
    (span/group caps; windows may sheet but start single-sheet), so no
    perf cliff or clamp fires at t=0.  (VERDICT round 1, item 4.)"""
    import dataclasses as _dc
    from sph_taichi_tpu import SimConfig as _SC, build_scene as _bs
    from sph_taichi_tpu.models.base import bin_and_sort as _bas
    from sph_taichi_tpu.ops.pairs import make_engine as _me

    cfg = _SC(f"data/scenes/{scene}")
    params, particles, _ = _bs(cfg)
    p2 = _dc.replace(params, backend="pallas_interpret")
    eng = _me(p2)
    _, ctx, _ = _bas(particles, p2, eng)
    diag = {k: np.asarray(v) for k, v in ctx.diag.items()}
    assert not bool(diag["span_overflow"]), diag
    assert not bool(diag["group_overflow"]), diag
    # window sheets are exact and expected at the narrow round-3 default
    # schedule (platform-consistent cell ids concentrate straddling
    # lattice planes to occupancy 12): bound the magnitude instead
    assert int(diag["max_window_len"]) <= 2 * 64, diag
    assert not bool(diag["row_overflow"]), diag


def test_v2_backend_warns_on_tpu(monkeypatch):
    """Selecting the retired v2 row engine on a real TPU must warn loudly:
    it mis-sums pair contributions on device at high cell occupancy
    (docs/DESIGN.md round 3).  VERDICT r3 item 4."""
    import warnings
    import jax as _jax
    from sph_taichi_tpu.ops import pairs as _pairs
    d = small_scene_dict(method=0)
    cfg = SimConfig(config_dict=d)
    params, _, _ = build_scene(cfg)
    params = dataclasses.replace(params, backend="pallas")
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    with pytest.warns(UserWarning, match="mis-sums"):
        _pairs.make_engine(params)
    # CPU (tests) stays silent: the interpret path is exact
    monkeypatch.setattr(_jax, "default_backend", lambda: "cpu")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _pairs.make_engine(params)
