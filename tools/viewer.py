"""Interactive host-side particle viewer.

The TPU-native counterpart of the reference's GGUI window
(run_simulation.py:37-94: ti.ui window + camera + live particle render).
TPUs are headless, so live rendering is a host concern: this viewer
replays (or live-follows) a simulation output directory — the PLY series
written by the driver at the reference export cadence — as an
interactive matplotlib 3D point cloud with the same wireframe domain box
the reference draws (run_simulation.py:57-74).

Usage:
    python tools/viewer.py <output_dir> [--scene data/scenes/x.json]
        [--follow]      poll the directory for new frames (live view of a
                        running simulation)
        [--stride N]    render every Nth particle (default auto ~20k pts)
        [--interval MS] frame interval (default 50)

Keys: space = pause/resume, left/right = scrub one frame (while paused).

Works on any PLY series produced by Simulation.export_frame /
run_simulation.py (ascii or binary_little_endian position-only PLYs from
utils/exporters.write_ply_ascii).
"""

import argparse
import glob
import json
import os
import re
import sys
import time

import numpy as np


def read_ply_positions(path):
    """Minimal PLY reader for the exporter's position-only files."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        n = 0
        fmt = "ascii"
        for line in header:
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("format"):
                fmt = line.split()[1]
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n, dtype=np.float32)
        else:
            data = np.frombuffer(f.read(n * 12), dtype="<f4").reshape(n, 3)
    return np.asarray(data, np.float32).reshape(n, -1)[:, :3]


def frame_series(output_dir):
    """Sorted list of (frame_number, [ply files of that frame])."""
    files = glob.glob(os.path.join(output_dir, "*.ply"))
    by_frame = {}
    for p in files:
        m = re.search(r"(\d+)\.ply$", os.path.basename(p))
        if m:
            by_frame.setdefault(int(m.group(1)), []).append(p)
    return sorted(by_frame.items())


def domain_box(scene_path):
    if not scene_path or not os.path.exists(scene_path):
        return None
    cfg = json.load(open(scene_path))["Configuration"]
    return np.asarray(cfg["domainStart"], float), \
        np.asarray(cfg["domainEnd"], float)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output_dir")
    ap.add_argument("--scene", default=None, help="scene JSON for the box")
    ap.add_argument("--follow", action="store_true")
    ap.add_argument("--stride", type=int, default=0)
    ap.add_argument("--interval", type=int, default=50)
    args = ap.parse_args()

    import matplotlib
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation

    series = frame_series(args.output_dir)
    if not series and not args.follow:
        print(f"no PLY frames in {args.output_dir}", file=sys.stderr)
        sys.exit(1)

    fig = plt.figure(figsize=(9, 7))
    ax = fig.add_subplot(111, projection="3d")
    box = domain_box(args.scene)
    if box is not None:
        lo, hi = box
        # the reference's 24-segment wireframe box (run_simulation.py:57-74)
        c = np.array([[x, y, z] for x in (lo[0], hi[0])
                      for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
        edges = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6),
                 (5, 7), (0, 4), (1, 5), (2, 6), (3, 7)]
        for a, b in edges:
            ax.plot(*zip(c[a], c[b]), color="0.6", lw=0.8)
        ax.set_xlim(lo[0], hi[0])
        ax.set_ylim(lo[1], hi[1])
        ax.set_zlim(lo[2], hi[2])
    ax.set_box_aspect((1, 1, 1))
    scat = ax.scatter([], [], [], s=1.0, c="#2b7bba", depthshade=False)
    title = ax.set_title("")

    state = {"i": 0, "paused": False, "series": series}

    def load(i):
        frames = state["series"]
        if not frames:
            return None
        i %= len(frames)
        num, paths = frames[i]
        pts = np.concatenate([read_ply_positions(p) for p in sorted(paths)])
        stride = args.stride or max(len(pts) // 20000, 1)
        return num, pts[::stride]

    def draw(_):
        if args.follow:
            state["series"] = frame_series(args.output_dir)
        if state["paused"] or not state["series"]:
            return scat,
        got = load(state["i"])
        if got is None:
            return scat,
        num, pts = got
        scat._offsets3d = (pts[:, 0], pts[:, 1], pts[:, 2])
        title.set_text(f"frame {num}  ({len(pts)} pts shown)")
        state["i"] += 1
        return scat,

    def on_key(ev):
        if ev.key == " ":
            state["paused"] = not state["paused"]
        elif ev.key in ("left", "right") and state["paused"]:
            state["i"] += 1 if ev.key == "right" else -1
            got = load(state["i"])
            if got:
                num, pts = got
                scat._offsets3d = (pts[:, 0], pts[:, 1], pts[:, 2])
                title.set_text(f"frame {num}")
                fig.canvas.draw_idle()

    fig.canvas.mpl_connect("key_press_event", on_key)
    anim = FuncAnimation(fig, draw, interval=args.interval,
                         cache_frame_data=False)
    plt.show()
    return anim


if __name__ == "__main__":
    main()
