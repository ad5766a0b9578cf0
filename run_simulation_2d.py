"""Headless 2D legacy driver (reference legacy/scene.py counterpart).

Dam-break scene with boundary walls, optional adaptive dt, PNG frame
export, and the legacy demo's mid-simulation cube emission at t > 0.4
(legacy/scene.py:59-75).

    python run_simulation_2d.py --method PCISPH --adaptive --save
"""

import argparse
import os
import time

import numpy as np


def main(opt):
    from sph_taichi_tpu.legacy2d import SPHSolver2D, METHODS, \
        MATERIAL_FLUID, MATERIAL_BOUND
    from sph_taichi_tpu.utils.exporters import write_png

    method = METHODS[opt.method]
    res = (400, 400)
    screen_to_world_ratio = 35
    dx = 0.1
    u, b, l, r = np.array([res[1], 0, 0, res[0]]) / screen_to_world_ratio

    sph = SPHSolver2D(res, screen_to_world_ratio, [u, b, l, r],
                      alpha=0.30, dx=dx, max_time=5,
                      max_steps=opt.max_frames,
                      method=method, adaptive_time_step=opt.adaptive,
                      max_num_particles=2 ** 14)

    # dam-break fluid block + boundary walls (legacy/scene.py setup style)
    sph.add_cube(lower_corner=[l + 0.5, b + 0.5],
                 cube_size=[3.0, 5.0], velocity=[0.0, -5.0],
                 density=[1000], material=MATERIAL_FLUID, color=0x068587)

    add = True
    add_cnt = 0.0
    t = 0.0
    frame = 0
    out_dir = f"legacy2d_{opt.method.lower()}_output"
    if opt.save:
        os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    while frame < opt.max_frames and t < sph.max_time:
        dt = sph.step(frame, t, t0)

        if add and add_cnt > 0.40:   # legacy/scene.py:59-75 emission
            sph.add_cube(lower_corner=[6, 6], cube_size=[2.0, 2.0],
                         velocity=[0.0, -5.0], density=[1000.0],
                         color=0xED553B, material=MATERIAL_FLUID)
            sph.add_cube(lower_corner=[3, 8], cube_size=[1.0, 1.0],
                         velocity=[0.0, -10.0], density=[1000.0],
                         color=0xEEEEF0, material=MATERIAL_FLUID)
            add = False

        if opt.save and frame % 50 == 0:
            info = sph.particle_info()
            img = np.zeros((res[1], res[0], 3), np.uint8)
            pix = (info["position"] * screen_to_world_ratio).astype(int)
            ok = ((pix[:, 0] >= 0) & (pix[:, 0] < res[0])
                  & (pix[:, 1] >= 0) & (pix[:, 1] < res[1]))
            pix = pix[ok]
            col = info["color"][ok]
            img[res[1] - 1 - pix[:, 1], pix[:, 0], 0] = (col >> 16) & 0xFF
            img[res[1] - 1 - pix[:, 1], pix[:, 0], 1] = (col >> 8) & 0xFF
            img[res[1] - 1 - pix[:, 1], pix[:, 0], 2] = col & 0xFF
            write_png(os.path.join(out_dir, f"{frame:06d}.png"), img)

        frame += 1
        t += dt
        add_cnt += dt
        if frame % 100 == 0:
            info = sph.particle_info()
            vmax = np.linalg.norm(info["velocity"], axis=1).max()
            print(f"frame {frame} t={t:.3f} dt={dt:.2e} n={len(info['position'])} "
                  f"max|v|={vmax:.2f} iters={sph.it}", flush=True)
    print("done", frame, "frames in", time.time() - t0, "s")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", type=str, default="PCISPH",
                        choices=list(("WCSPH", "PCISPH", "DFSPH")))
    parser.add_argument("--save", action="store_true")
    parser.add_argument("--adaptive", action="store_true")
    parser.add_argument("--dynamic-allocate", action="store_true",
                        help="accepted for legacy CLI parity (capacity is "
                             "preallocated; emission fills padded slots)")
    parser.add_argument("--max_frames", type=int, default=1000)
    opt = parser.parse_args()
    main(opt)
