"""Benchmark harness — one JSON line for the driver.

Headline metric mirrors the reference's published number (README.md:7):
Dragon Bath, ~420K particles, WCSPH, dt=4e-4 -> steps/s ("FPS", 1 substep
per frame per dragon_bath.json).  Baseline: 280 FPS on an RTX 3090.

Usage: python bench.py [--scene data/scenes/dragon_bath.json] [--steps 100]
"""

import argparse
import json
import os
import sys
import time

import numpy as np


BASELINE_FPS = 280.0  # reference README.md:7 (RTX 3090)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="data/scenes/dragon_bath.json")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()

    os.chdir(os.path.dirname(os.path.abspath(__file__)))
    import jax
    from sph_taichi_tpu import SimConfig, build_scene, build_solver

    cfg = SimConfig(args.scene)
    params, particles, _ = build_scene(cfg, scene_dir=".")
    if args.backend:
        import dataclasses
        params = dataclasses.replace(params, backend=args.backend)
    solver = build_solver(params)
    state = solver.initialize(particles)

    # scan-chunked stepping: amortizes dispatch overhead (the axon tunnel
    # costs ~20-30ms per dispatch) exactly like production frame loops
    chunk = min(args.steps, 20)
    frame_fn = solver.make_frame_fn(chunk)

    state, _ = frame_fn(state)  # compile + warmup
    _ = float(state.t)  # host readback forces completion (block_until_ready
    #                     is unreliable through the axon tunnel)

    n_chunks = max(args.steps // chunk, 1)
    t0 = time.time()
    for _ in range(n_chunks):
        state, metrics = frame_fn(state)
    _ = float(state.t)
    elapsed = time.time() - t0
    args.steps = n_chunks * chunk

    fps = args.steps / elapsed
    x = np.asarray(state.p.x)
    finite = bool(np.isfinite(x[: params.n_particles]).all())
    result = {
        "metric": "dragon_bath_420k_wcsph_fps",
        "value": round(fps, 2),
        "unit": "steps/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "particles": params.n_particles,
        "particle_steps_per_sec": round(fps * params.n_particles),
        "finite": finite,
        "backend": type(solver.engine).__name__,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
