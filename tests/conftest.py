"""Test configuration: run everything on 8 virtual CPU devices.

This is the TPU analog of a fake backend (SURVEY.md §4): the sharded
halo-exchange path is validated on a virtual device mesh, and all physics
tests run on CPU so the suite works with or without a real chip attached.
Must run before jax is imported anywhere.
"""

import os

# The axon sitecustomize imports jax at interpreter start (before this
# conftest), so env vars alone are snapshotted too late; use config.update
# — backends are not initialized yet at collection time.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def small_scene_dict(method=0, domain=(1.0, 1.0, 1.0), radius=0.025,
                     block=((0.1, 0.3, 0.1), (0.5, 0.8, 0.5)),
                     velocity=(0.0, -1.0, 0.0), dt=None):
    """A tiny fluid-block scene in the reference JSON schema."""
    if dt is None:
        dt = 4e-4 if method == 0 else 4e-3
    return {
        "Configuration": {
            "domainStart": [0.0, 0.0, 0.0],
            "domainEnd": list(domain),
            "particleRadius": radius,
            "numberOfStepsPerRenderUpdate": 1,
            "density0": 1000,
            "simulationMethod": method,
            "gravitation": [0.0, -9.81, 0.0],
            "timeStepSize": dt,
            "stiffness": 50000,
            "exponent": 7,
            "boundaryHandlingMethod": 0,
            "exportFrame": False,
            "exportPly": False,
            "exportObj": False,
        },
        "FluidBlocks": [
            {
                "objectId": 0,
                "start": list(block[0]),
                "end": list(block[1]),
                "translation": [0.0, 0.0, 0.0],
                "scale": [1, 1, 1],
                "velocity": list(velocity),
                "density": 1000.0,
                "color": [50, 100, 200],
            }
        ],
    }


# ---------------------------------------------------------------------------
# shared engine-equivalence helpers (originally in the v2 engine's test
# file, which was deleted with the engine in round 5; the blocks/slots
# interpret suites still compare whole-solver states against the gather
# oracle with these)
# ---------------------------------------------------------------------------

def _assert_states_close(sa, sb, atol=2e-5, rtol=2e-4, matched=False):
    """matched=True: compare after a nearest-position bijection.  Needed
    for multi-step runs since engine-vs-oracle f32 rounding differs by
    ~1e-6 relative — enough to flip the per-step cell-sort permutation,
    so per-index comparison stops being meaningful (the *sets* agree)."""
    import numpy as np
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


def _clumped_positions(rng, params, particles):
    """Randomized layout with >CB-particle cells and edge-cell coverage."""
    import numpy as np
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
