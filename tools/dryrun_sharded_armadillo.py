"""Sharded armadillo dryrun (VERDICT r2 item 9 / BASELINE config #5 prep).

Runs the 1.73M-particle armadillo_bath_dynamic scene through
``ShardedSolver`` on a virtual CPU device mesh to validate, ahead of
multi-chip hardware: (a) the distributed initialize path (host slab
scatter + shard-mapped init — nothing full-scale on a single device),
(b) per-device capacity sizing (owned particles, halo layers, cell
occupancy), and (c) a full sharded step at scale.

Usage (CPU, from the repo root):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/dryrun_sharded_armadillo.py --devices 8 --steps 1

Measured numbers are recorded in docs/DESIGN.md (round 3).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--radius", type=float, default=None,
                    help="override particleRadius (larger -> fewer "
                    "particles, faster CPU dryrun)")
    ap.add_argument("--halo_cap", type=int, default=98304)
    ap.add_argument("--mig_cap", type=int, default=8192)
    args = ap.parse_args()

    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={args.devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from sph_taichi_tpu import SimConfig, build_scene
    from sph_taichi_tpu.parallel.sharding import ShardedSolver

    cfg = SimConfig("data/scenes/armadillo_bath_dynamic.json")
    if args.radius:
        cfg.config["Configuration"]["particleRadius"] = args.radius
    params, particles, _ = build_scene(cfg, scene_dir=".")
    print(f"scene: n={params.n_particles} fluid={params.n_fluid} "
          f"solid={params.n_solid} grid={params.grid_num}", flush=True)

    # slab distribution along x from the raw positions (host-side, the
    # same math _scatter uses) so loc_cap covers the heaviest slab
    xs = np.asarray(particles.x[: params.n_particles, 0])
    inv = np.float32(1.0) / np.float32(params.grid_size)
    ix = (xs * inv).astype(np.int32)
    nxd = -(-params.grid_num[0] // args.devices)
    owner = np.clip(ix // nxd, 0, args.devices - 1)
    per_dev = np.bincount(owner, minlength=args.devices)
    print(f"slab loads: {per_dev.tolist()} (max {per_dev.max()})",
          flush=True)

    sharded = ShardedSolver(
        params, n_devices=args.devices, mig_cap=args.mig_cap,
        halo_cap=args.halo_cap,
        loc_cap=int(per_dev.max() * 1.3 + 4096))
    print(f"per-device slots n_ext={sharded.n_ext} "
          f"(ghost {sharded.ghost_slots}, mig {2 * sharded.mig_cap})",
          flush=True)

    t0 = time.time()
    state = sharded.initialize(particles)
    im = {k: int(v) for k, v in sharded.init_metrics.items()}
    print(f"distributed init OK in {time.time() - t0:.0f}s: {im}",
          flush=True)
    assert im["halo_overflow"] == 0, "halo_cap too small at init"

    for s in range(args.steps):
        t0 = time.time()
        state, metrics = sharded.step(state)
        mv = float(np.asarray(metrics["max_velocity"]))
        flags = {k: int(np.asarray(v)) for k, v in metrics.items()
                 if ("overflow" in k) and np.asarray(v).ndim == 0}
        print(f"step {s}: {time.time() - t0:.0f}s  max|v|={mv:.4g}  "
              f"owned_max={int(np.asarray(metrics['owned_particles_max']))}"
              f"  flags={flags}", flush=True)
        assert flags.get("migration_overflow", 0) == 0
        assert flags.get("halo_overflow", 0) == 0

    gp = sharded.gather_particles(state)
    x = np.asarray(gp.x)
    assert x.shape[0] == params.n_particles, (
        f"lost particles: {x.shape[0]} != {params.n_particles}")
    assert np.isfinite(x).all()
    print(f"OK: {x.shape[0]} particles, finite, "
          f"{args.steps} sharded step(s) on {args.devices} devices",
          flush=True)


if __name__ == "__main__":
    main()
