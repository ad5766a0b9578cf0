"""Block engine (v3, ops/pallas_blocks.py) ↔ GatherEngine equivalence.

Same strategy as tests/test_pallas.py: run whole jitted solver programs
with backend="pallas_blocks_interpret" (the v3 kernel under the Pallas
interpreter on CPU) and backend="gather" (the portable oracle) and
assert the states agree.  Adversarial layouts force the block engine's
overflow machinery: candidate window sheets (window > WC lanes) and
center sheets (> CSL centers per row-batch).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from sph_taichi_tpu import SimConfig, build_scene, build_solver
from conftest import small_scene_dict

from conftest import _assert_states_close, _clumped_positions


def _run(method, backend, n_steps, scene=None, perturb=None, **over):
    d = scene or small_scene_dict(method=method)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=128, cell_cap=32)
    params = dataclasses.replace(params, backend=backend, **over)
    if perturb is not None:
        particles = particles._replace(x=jnp.asarray(perturb))
    solver = build_solver(params)
    state = solver.initialize(particles)
    for _ in range(n_steps):
        state, metrics = solver.step(state)
    return state


@pytest.mark.parametrize("method", [0, 4, 2, 1])
def test_block_solver_equivalence_lattice(method):
    n = 3
    sg = _run(method, "gather", n)
    sp = _run(method, "pallas_blocks_interpret", n)
    _assert_states_close(sg, sp, matched=True)


@pytest.mark.parametrize("rows,rows_y,tile", [
    (3, 0, "half"), (4, 0, "half"), (4, 0, "quarter"),
    # asymmetric blocks (round 4): By > Bx amortizes the per-instance
    # floor while keeping the pair-math half-tile at 3*(Bx+2)*WC lanes
    (2, 4, "half"), (2, 4, "quarter"), (2, 6, "half")])
def test_block_solver_equivalence_block_rows(rows, rows_y, tile, rng):
    """Parametric BxBy blocks (round 4): bigger blocks amortize the
    per-instance fixed cost and cut windows per particle; the pair set
    must be invariant.  Clumped layout forces the overflow sheets."""
    d = small_scene_dict(method=0)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=128, cell_cap=32)
    x = _clumped_positions(rng, params, particles)
    # the clumped layout re-scatters across the whole domain while the
    # compaction cap was auto-sized from the t=0 lattice — disable it
    # (its own equivalence/overflow coverage: test_block_compaction_*)
    sg = _run(0, "gather", 2, perturb=x)
    sp = _run(0, "pallas_blocks_interpret", 2, perturb=x,
              blocks_rows=rows, blocks_rows_y=rows_y, blocks_tile=tile,
              blocks_groups_cap=0)
    _assert_states_close(sg, sp)


@pytest.mark.parametrize("gi,rows_y,tile", [
    (2, 0, "half"), (3, 0, "half"), (4, 2, "half"), (4, 0, "quarter")])
def test_block_solver_equivalence_groups_per_inst(gi, rows_y, tile, rng):
    """G groups per instance (round 5): G iy-adjacent groups share one
    kernel instance and per-column UNION span DMAs; the member loop must
    reproduce the per-group pair set exactly.  Clumped layout forces
    overflow sheets; G=3 exercises a ragged last instance (nby % G != 0)
    and rows_y=2 composes G with asymmetric By."""
    d = small_scene_dict(method=0)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=128, cell_cap=32)
    x = _clumped_positions(rng, params, particles)
    sg = _run(0, "gather", 2, perturb=x)
    sp = _run(0, "pallas_blocks_interpret", 2, perturb=x,
              blocks_groups_per_inst=gi, blocks_rows_y=rows_y,
              blocks_tile=tile, blocks_groups_cap=0)
    _assert_states_close(sg, sp)


@pytest.mark.parametrize("sched,smg,gi,tile", [
    ("ctr_outer", 4, 1, "half"), ("ctr_outer", 1, 2, "half"),
    ("ctr_outer", 4, 1, "quarter"), ("sheet_outer", 4, 1, "half")])
def test_block_solver_equivalence_ctr_outer(sched, smg, gi, tile, rng):
    """ctr_outer scheduler (round 5 default): window sheets run INNER
    with per-piece register accumulators; macro-groups of
    blocks_sheet_group sheets accumulate through out_scr.  smg=1 forces
    every batch across multiple macro-groups (the cross-macro
    accumulation path); gi=2 composes with the member loop; quarter
    exercises the 3-slice lane take on both candidates and the validity
    row.  The sheet_outer case keeps the legacy scheduler covered now
    that it is non-default.  Clumped layout forces overflow sheets on
    both sides."""
    d = small_scene_dict(method=0)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=128, cell_cap=32)
    x = _clumped_positions(rng, params, particles)
    sg = _run(0, "gather", 2, perturb=x)
    sp = _run(0, "pallas_blocks_interpret", 2, perturb=x,
              blocks_sched=sched, blocks_sheet_group=smg,
              blocks_groups_per_inst=gi, blocks_tile=tile,
              blocks_groups_cap=0)
    _assert_states_close(sg, sp)


@pytest.mark.parametrize("zb", [1, 3, 4])
def test_block_solver_equivalence_z_batch(zb, rng):
    """blocks_z_batch sweep: the window depth is (Z+2) cells and every
    table (len/loc/ctr/mxt, countdown plane) is built per z-batch, so
    Z=1 (narrowest), Z=3 (odd — nbz8 sublane padding exercised with
    nbz % 8 != 0 from a different residue), and Z=4 must all reproduce
    the gather pair set exactly.  Z=1 and Z=3 were device-measured in
    round 5 (j303/j304): Z=1 is 40% slower (batch-count bound, a
    documented negative) and Z=3 kernel-faulted the TPU worker — this
    test pins that the SEMANTICS of odd/narrow Z are correct under the
    interpreter, so the device fault is a Mosaic-level hazard, not a
    table-construction bug."""
    d = small_scene_dict(method=0)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=128, cell_cap=32)
    x = _clumped_positions(rng, params, particles)
    sg = _run(0, "gather", 2, perturb=x)
    sp = _run(0, "pallas_blocks_interpret", 2, perturb=x,
              blocks_z_batch=zb, blocks_groups_cap=0)
    _assert_states_close(sg, sp)


@pytest.mark.slow
def test_block_solver_equivalence_ctr_outer_dfsph(rng):
    """ctr_outer under DFSPH: LanesBuf reuse across Jacobi iterations,
    multi-output traversals, and the solver epilogues all ride the new
    scheduler."""
    d = small_scene_dict(method=4)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=128, cell_cap=32)
    x = _clumped_positions(rng, params, particles)
    sg = _run(4, "gather", 2, perturb=x)
    sp = _run(4, "pallas_blocks_interpret", 2, perturb=x,
              blocks_sched="ctr_outer", blocks_groups_cap=0)
    _assert_states_close(sg, sp)


@pytest.mark.parametrize("method", [0, 4])
def test_block_solver_equivalence_chunked_dma(method, rng):
    """Chunked span DMA (round 4): dma_chunk=128 forces every occupied
    column through multi-chunk start/wait chains (clumped layout: spans
    far exceed 128 lanes).  The shipped-prefix must carry exactly the
    lanes the full-slab DMA did; lanes past a group's length are stale
    scratch the masks must hide."""
    d = small_scene_dict(method=method)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=128, cell_cap=32)
    x = _clumped_positions(rng, params, particles)
    sg = _run(method, "gather", 2, perturb=x)
    sp = _run(method, "pallas_blocks_interpret", 2, perturb=x,
              blocks_groups_cap=0, blocks_dma_chunk=128)
    _assert_states_close(sg, sp)


@pytest.mark.parametrize("method", [0, 4])
def test_block_solver_equivalence_clumped(method, rng):
    """One step on an adversarial clumped layout: multi-sheet windows and
    multi-sheet center batches."""
    d = small_scene_dict(method=method)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=128, cell_cap=32)
    x = _clumped_positions(rng, params, particles)
    sg = _run(method, "gather", 1, perturb=x)
    sp = _run(method, "pallas_blocks_interpret", 1, perturb=x,
              blocks_groups_cap=0)
    _assert_states_close(sg, sp)


def _occupied_groups(params, particles, perturb=None):
    """Probe occupied-group count via one uncompacted interpret step
    (the engine reports it in diag: num_occupied_groups)."""
    p = dataclasses.replace(params, backend="pallas_blocks_interpret",
                            blocks_groups_cap=0)
    if perturb is not None:
        particles = particles._replace(x=jnp.asarray(perturb))
    solver = build_solver(p)
    state = solver.initialize(particles)
    _, metrics = solver.step(state)
    return int(np.asarray(metrics["num_occupied_groups"]))


def test_block_compaction_active_equivalence():
    """Group compaction (round 4): the kernel grid holds occupied groups
    only.  The small scene's auto-sized cap clamps to n_groups (the
    margin swamps the tiny grid), so set the cap EXACTLY to the probed
    occupancy — zero slack, compaction active.  Physics must match the
    oracle and the fatal flag stay quiet."""
    from sph_taichi_tpu.ops.pairs import make_engine

    d = small_scene_dict(method=0)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=128, cell_cap=32)
    occ = _occupied_groups(params, particles)
    params = dataclasses.replace(params,
                                 backend="pallas_blocks_interpret",
                                 blocks_groups_cap=occ)
    eng = make_engine(params)
    assert 0 < eng.gcap < eng.n_inst, \
        "scene must exercise an actually-compacted grid"
    solver = build_solver(params)
    state = solver.initialize(particles)
    for _ in range(2):
        state, metrics = solver.step(state)
    assert not bool(np.asarray(metrics["group_compact_overflow"]))
    sg = _run(0, "gather", 2)
    _assert_states_close(sg, state, matched=True)


def test_block_compaction_overflow_flag(rng):
    """A cap below the probed occupancy must trip the FATAL
    group_compact_overflow flag (dropped groups = dropped pairs)."""
    d = small_scene_dict(method=0)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=128, cell_cap=32)
    x = _clumped_positions(rng, params, particles)
    occ = _occupied_groups(params, particles, perturb=x)
    assert occ > 1
    params = dataclasses.replace(params,
                                 backend="pallas_blocks_interpret",
                                 blocks_groups_cap=occ - 1)
    solver = build_solver(params)
    state = solver.initialize(particles._replace(x=jnp.asarray(x)))
    state, metrics = solver.step(state)
    assert bool(np.asarray(metrics["group_compact_overflow"]))


def test_block_compaction_recovery():
    """Simulation.run_frame must detect a tripped compaction cap, warn,
    rebuild the solver uncompacted, and re-run the frame from the saved
    entry state — physics identical to an uncompacted run."""
    from sph_taichi_tpu.simulation import Simulation

    d = small_scene_dict(method=0)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=128, cell_cap=32)
    occ = _occupied_groups(params, particles)
    assert occ > 1
    d["TPU"] = {"blocksGroupsCap": occ - 1}
    sim = Simulation(config=SimConfig(config_dict=d),
                     backend="pallas_blocks_interpret")
    with pytest.warns(RuntimeWarning):
        sim.run_frame()
    # post-recovery the solver is uncompacted and the frame re-ran clean
    assert sim.params.blocks_groups_cap == 0
    assert not bool(np.asarray(sim.metrics["group_compact_overflow"]))
    sg = _run(0, "gather", 1)
    _assert_states_close(sg, sim.state, matched=True)


def test_block_two_way_rigid_equivalence():
    d = small_scene_dict(method=0)
    d["RigidBlocks"] = [{
        "objectId": 1,
        "start": [0.55, 0.1, 0.1], "end": [0.85, 0.4, 0.4],
        "translation": [0.0, 0.0, 0.0], "scale": [1.0, 1.0, 1.0],
        "velocity": [0.0, 0.0, 0.0], "density": 1000.0,
        "color": [100, 100, 100], "isDynamic": True,
    }]
    sg = _run(0, "gather", 2, scene=d)
    sp = _run(0, "pallas_blocks_interpret", 2, scene=d)
    _assert_states_close(sg, sp, matched=True)


def test_block_extreme_compression_matches_oracle(rng):
    """~200 particles in ONE cell: windows far beyond WC (candidate
    sheets) and center counts far beyond CSL (center sheets) must still
    match the gather oracle exactly — overflow costs passes, never
    pairs."""
    import jax.numpy as _jnp
    from sph_taichi_tpu.models.base import bin_and_sort as _bas
    from sph_taichi_tpu.ops.pairs import make_engine as _me
    from sph_taichi_tpu.ops.kernels import cubic_kernel as _ck

    d = small_scene_dict(method=0)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=256, cell_cap=256)
    x = np.asarray(particles.x).copy()
    real = np.asarray(particles.material) != -1
    n = int(real.sum())
    cell = params.grid_size
    c0 = np.array([4, 4, 4]) * cell + 0.05 * cell
    m = min(n, 200)
    x[:m] = (c0 + rng.uniform(0, 0.9 * cell, size=(m, 3))).astype(np.float32)
    particles = particles._replace(x=_jnp.asarray(x))

    h = params.support_radius
    outs = {}
    for backend in ("gather", "pallas_blocks_interpret"):
        p2 = dataclasses.replace(params, backend=backend)
        eng = _me(p2)
        ps, ctx, diag = _bas(particles, p2, eng)

        def term(fi, fj, rvec, rn):
            return {"delta": fj["m_V"] * _ck(rn, h, p2.dim)}

        out = eng.traverse(ctx, ps.x, {"m_V": ps.m_V}, term,
                           {"delta": "scalar"})
        real_s = np.asarray(ps.material) != -1
        xs = np.asarray(ps.x)[real_s]
        order = np.argsort(xs[:, 0] * 1e6 + xs[:, 1] * 1e3 + xs[:, 2],
                           kind="stable")
        outs[backend] = np.asarray(out["delta"])[real_s][order]
        if backend == "pallas_blocks_interpret":
            assert bool(diag["window_overflow"]), \
                "test must exercise candidate sheets"
            assert int(diag["max_batch_centers"]) > 16, \
                "test must exercise center sheets"
    np.testing.assert_allclose(outs["pallas_blocks_interpret"],
                               outs["gather"], rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("scene", ["dragon_bath.json",
                                   "armadillo_bath_dynamic.json"])
def test_block_bundled_scene_capacities(scene):
    """Headline scenes start within the block engine's capacities."""
    from sph_taichi_tpu.models.base import bin_and_sort as _bas
    from sph_taichi_tpu.ops.pairs import make_engine as _me

    cfg = SimConfig(f"data/scenes/{scene}")
    params, particles, _ = build_scene(cfg)
    p2 = dataclasses.replace(params, backend="pallas_blocks_interpret")
    eng = _me(p2)
    _, ctx, _ = _bas(particles, p2, eng)
    diag = {k: np.asarray(v) for k, v in ctx.diag.items()}
    assert not bool(diag["span_overflow"]), diag
    assert not bool(diag["group_overflow"]), diag
    # window_overflow is a perf signal only (sheets are exact): the
    # platform-consistent cell ids concentrate straddling lattice planes
    # (max t=0 occupancy 12), so a few 4-cell windows exceed WC=32 and
    # sheet.  Bound the magnitude instead of requiring zero.
    assert int(diag["max_window_len"]) <= 2 * 32, diag


def test_block_epilogue_transform(rng):
    """Engine-level epilogue contract: the in-kernel transform of
    finished pair sums must equal applying the same transform to the
    plain traversal outputs in XLA — including on multi-sheet overflow
    layouts and rows hit by the idempotent exact-tail chunk overlap."""
    import jax.numpy as _jnp
    from sph_taichi_tpu.models.base import bin_and_sort as _bas
    from sph_taichi_tpu.ops.pairs import make_engine as _me
    from sph_taichi_tpu.ops.kernels import cubic_kernel as _ck

    d = small_scene_dict(method=0)
    cfg = SimConfig(config_dict=d)
    params, particles, _ = build_scene(cfg, neighbor_cap=256, cell_cap=256)
    x = np.asarray(particles.x).copy()
    real = np.asarray(particles.material) != -1
    cell = params.grid_size
    c0 = np.array([4, 4, 4]) * cell + 0.05 * cell
    m = min(int(real.sum()), 150)
    x[:m] = (c0 + rng.uniform(0, 0.9 * cell, size=(m, 3))).astype(np.float32)
    particles = particles._replace(x=_jnp.asarray(x))

    h = params.support_radius
    p2 = dataclasses.replace(params, backend="pallas_blocks_interpret")
    eng = _me(p2)
    ps, ctx, _ = _bas(particles, p2, eng)

    def term(fi, fj, d2, rn, dots):
        return {"den": fj["m_V"] * _ck(rn, h, p2.dim)}

    def epi(fi, sums, sc):
        # arbitrary mix of fields, sums, and a traced scalar
        # (row-major contract: (1, R) rows, ncomp-tuples)
        den = sums["den"][0]
        return {"y": (den * sc[0] + fi["m_V"], den - fi["x1"], den)}

    plain = eng.traverse(ctx, ps.x, {"m_V": ps.m_V}, term,
                         {"den": "scalar"}, mode="mxu")
    fused = eng.traverse(ctx, ps.x, {"m_V": ps.m_V}, term,
                         {"den": "scalar"}, mode="mxu",
                         epilogue=(epi, {"y": 3},
                                   jnp.asarray([2.5], jnp.float32)))
    real_s = np.asarray(ps.material) != -1
    den = np.asarray(plain["den"])
    want = [den * 2.5 + np.asarray(ps.m_V),
            den - np.asarray(ps.x[:, 1]), den]
    got = [np.asarray(c) for c in fused["y"]]
    for w, g in zip(want, got):
        np.testing.assert_allclose(g[real_s], w[real_s],
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("fuse_dv", [True])
def test_block_two_way_rigid_equivalence_dfsph(fuse_dv, monkeypatch):
    """DFSPH with a dynamic rigid block against the unfused gather
    oracle, on the fused _solver_dv reaction path (v + acc epilogue, 15
    traversal fields) that would otherwise lose coverage.  The unfused
    production default (False since j85) is covered by the other DFSPH
    equivalence tests; running both sides here doubled one of the
    slowest tests for duplicate coverage (ADVICE r3)."""
    from sph_taichi_tpu.models.dfsph import DFSPHSolver
    monkeypatch.setattr(DFSPHSolver, "fuse_solver_dv", fuse_dv)
    d = small_scene_dict(method=4)
    d["Configuration"]["timeStepSize"] = 4e-3
    d["RigidBlocks"] = [{
        "objectId": 1,
        "start": [0.55, 0.1, 0.1], "end": [0.85, 0.4, 0.4],
        "translation": [0.0, 0.0, 0.0], "scale": [1.0, 1.0, 1.0],
        "velocity": [0.0, 0.0, 0.0], "density": 1000.0,
        "color": [100, 100, 100], "isDynamic": True,
    }]
    sg = _run(4, "gather", 2, scene=d)
    sp = _run(4, "pallas_blocks_interpret", 2, scene=d)
    _assert_states_close(sg, sp, matched=True)


def test_block_two_way_rigid_equivalence_pcisph():
    """PCISPH with a dynamic rigid block on the blocks engine: covers
    the fused correction/predict epilogues alongside the dynamic-rigid
    advect branch."""
    d = small_scene_dict(method=1)
    d["RigidBlocks"] = [{
        "objectId": 1,
        "start": [0.55, 0.1, 0.1], "end": [0.85, 0.4, 0.4],
        "translation": [0.0, 0.0, 0.0], "scale": [1.0, 1.0, 1.0],
        "velocity": [0.0, 0.0, 0.0], "density": 1000.0,
        "color": [100, 100, 100], "isDynamic": True,
    }]
    sg = _run(1, "gather", 2, scene=d)
    sp = _run(1, "pallas_blocks_interpret", 2, scene=d)
    _assert_states_close(sg, sp, matched=True)
