"""Headless simulation driver (reference run_simulation.py counterpart).

Same CLI contract as the reference (`--scene_file <json>`) plus headless
extensions: frame budget, output dir, backend selection, checkpointing.
The interactive GGUI window is replaced by PNG point-splat renders at the
same export cadence; PLY/OBJ exports follow the reference naming.

    python run_simulation.py --scene_file data/scenes/dragon_bath.json \
        --max_frames 200
"""

import argparse
import os
import sys
import time


def main():
    parser = argparse.ArgumentParser(description="SPH TPU")
    parser.add_argument("--scene_file", default="", help="scene file")
    parser.add_argument("--max_frames", type=int, default=0,
                        help="stop after N frames (0 = run forever)")
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--backend", default=None,
                        choices=[None, "auto", "gather", "pallas_blocks",
                                 "pallas_slots"],
                        help="pair-traversal engine override.  'auto' "
                        "selects pallas_blocks (v3, production) on TPU; "
                        "'pallas_slots' is the retired v4 engine "
                        "(correct but 5.7x slower, A/B only)")
    parser.add_argument("--checkpoint_interval", type=int, default=0)
    parser.add_argument("--resume", default="", help="checkpoint to resume")
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args()

    from sph_taichi_tpu.simulation import Simulation

    scene_dir = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(args.scene_file))))
    sim = Simulation(args.scene_file, scene_dir=scene_dir,
                     output_dir=args.output_dir, backend=args.backend)
    if args.resume:
        sim.resume(args.resume)
    print(f"scene: {sim.scene_name}  particles: {sim.params.n_particles} "
          f"(fluid {sim.params.n_fluid} / solid {sim.params.n_solid})  "
          f"dt: {sim.params.dt0}  substeps/frame: {sim.substeps}")

    n = args.max_frames or (1 << 62)
    t0 = time.time()
    done = 0
    try:
        while done < n:
            chunk = min(50, n - done)
            sim.run(chunk, checkpoint_interval=args.checkpoint_interval)
            done += chunk
            if not args.quiet:
                el = time.time() - t0
                steps = done * sim.substeps
                print(f"frame {done}  t={float(sim.state.t):.4f}s  "
                      f"{steps / el:.1f} steps/s", flush=True)
    except KeyboardInterrupt:
        print("interrupted", file=sys.stderr)


if __name__ == "__main__":
    main()
