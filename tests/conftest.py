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
