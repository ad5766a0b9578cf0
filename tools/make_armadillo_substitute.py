"""Generate data/models/armadillo_small.obj — a watertight stand-in body.

The reference mirror is missing armadillo_small.obj (.MISSING_LARGE_BLOBS),
so the armadillo scenes need a substitute mesh of comparable size: a
blobby quadruped-ish shape ~1.6 units tall centered at the origin (the
scenes scale it by 0.25 and translate it into the bath).
"""
import numpy as np


def icosphere(subdiv=4):
    t = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    for _ in range(subdiv):
        edge_mid = {}
        nv = list(v)
        nf = []
        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = (v[a] + v[b]) / 2
                m /= np.linalg.norm(m)
                edge_mid[key] = len(nv)
                nv.append(m)
            return edge_mid[key]
        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.array(nv)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        f = np.array(nf)
    return v, f


def bump(p, center, radius, amount):
    d = np.linalg.norm(p - center, axis=1)
    return amount * np.exp(-(d / radius) ** 2)


v, f = icosphere(4)
n = v.copy()
# ellipsoid body
v = v * np.array([0.55, 0.75, 0.45])
# limbs, head, tail as radial bumps along the unit normal directions
r = np.zeros(len(v))
r += bump(n, np.array([0.5, -0.8, 0.45]) / np.linalg.norm([0.5, -0.8, 0.45]), 0.35, 0.35)
r += bump(n, np.array([-0.5, -0.8, 0.45]) / np.linalg.norm([0.5, 0.8, 0.45]), 0.35, 0.35)
r += bump(n, np.array([0.5, -0.8, -0.45]) / np.linalg.norm([0.5, 0.8, 0.45]), 0.35, 0.35)
r += bump(n, np.array([-0.5, -0.8, -0.45]) / np.linalg.norm([0.5, 0.8, 0.45]), 0.35, 0.35)
r += bump(n, np.array([0.0, 0.95, 0.3]) / np.linalg.norm([0.0, 0.95, 0.3]), 0.4, 0.3)   # head
r += bump(n, np.array([0.0, -0.2, -1.0]) / np.linalg.norm([0.0, 0.2, 1.0]), 0.3, 0.4)   # tail
v = v + n * r[:, None]
v = v - v.mean(axis=0)
v = v / (v[:, 1].max() - v[:, 1].min()) * 1.6   # 1.6 units tall

with open("data/models/armadillo_small.obj", "w") as out:
    out.write("# substitute armadillo (original missing from reference mirror)\n")
    for x, y, z in v:
        out.write(f"v {x:.6f} {y:.6f} {z:.6f}\n")
    for a, b, c in f:
        out.write(f"f {a+1} {b+1} {c+1}\n")
print("verts", len(v), "faces", len(f), "bbox", v.min(0), v.max(0))
