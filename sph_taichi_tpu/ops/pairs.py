"""Pair-interaction traversal engines.

The reference's `for_all_neighbors(p_i, task, ret)` template
(particle_system.py:378-385) is the single abstraction every solver kernel
is written against.  This module is its TPU-native counterpart: a solver
expresses each pair sum as a *term function* over (center fields, neighbor
fields, pair geometry), and an engine evaluates

    out[name][i] = sum_j  term(f_i, f_j, r_ij)[name]
                   over j != i with |x_i - x_j| < support_radius

Two engines implement the same contract:

- GatherEngine (this file): materializes fixed-K neighbor index lists and
  evaluates terms on (N, K) gathered slots.  Irregular gathers are fast on
  CPU, so this is the portable/test backend (and the oracle the Pallas
  engine is validated against).
- BlockEngine (ops/pallas_blocks.py): the TPU production engine.
  Measured TPU behavior shows random gathers/scatters run ~300x slower
  than structured ops, so it never gathers: it DMA-streams contiguous
  spans of the cell-sorted particle array through VMEM and evaluates
  terms on windowed all-pair tiles (see its module docstring).

Term-function contract (shared by both engines):

    term_fn(fi, fj, rvec, rn) -> dict[name, contribution]

- fi / fj: dict of field name -> broadcastable array (center / neighbor
  side).  Vector fields are passed *component-wise* ("vx","vy","vz") so
  the Pallas engine never materializes (..., 3)-trailing tensors (bad TPU
  tiling).  fi/fj always include position components "x0","x1","x2" and
  the global sorted index "gidx".
- rvec: 3-tuple of (component arrays) x_i - x_j; rn = |rvec|.
- contributions: scalar array, or 3-tuple of arrays for vector outputs.
- Contributions are evaluated on every candidate slot and masked by the
  engine (radius / self / validity) with jnp.where — terms may divide by
  garbage on invalid slots.
- Output values are defined for REAL particles only: padding particles
  (material == MATERIAL_PAD, parked in the overflow cell) are never
  traversal centers, and the Pallas engine leaves their output rows
  unwritten.  Callers must mask results by material — every solver does.

MXU mode (opt-in per traversal, ``mode="mxu"``): SPH pair interactions
are *radial* — every vector contribution is a scalar coefficient times
r_ij — and every inner product the terms need ((v_i-v_j)·r_ij, r_ij·r_ij)
is a rank-3 contraction.  In MXU mode the engine never materializes
rvec: it computes d2 and requested pair dots through small matmuls on
the 128x128 systolic array (batch-centered coordinates keep the
|x_i|^2+|x_j|^2-2x_i·x_j expansion accurate in f32), and radial vector
outputs through the decomposition  sum_j c_ij (x_i - x_j) =
(sum_j c_ij) x_i - C @ X_j  (one matmul per output).  The term function
signature becomes

    term_fn(fi, fj, d2, rn, dots) -> dict[name, coef]

with ``dots[u]`` = (u_i - u_j)·(x_i - x_j) for each requested base name
u in ``pair_dots`` (component fields u0,u1,u2 must be in ``fields``),
and out_specs values "scalar" | "radial".  This cuts the VPU op count
of the hot pass roughly in half; the GatherEngine implements the same
contract directly (it has rvec anyway) as the CPU oracle.
"""

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from sph_taichi_tpu.ops.neighbors import build_neighbor_list


def v3(ax, ay, az):
    return (ax, ay, az)


def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vscale(s, a):
    return (s * a[0], s * a[1], s * a[2])


def vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def split_fields(p, params, names):
    """Particles -> flat dict of (N,) f32/i32 component fields."""
    out = {}
    for n in names:
        a = getattr(p, n)
        if a.ndim == 2:
            for d in range(a.shape[1]):
                out[f"{n}{d}"] = a[:, d]
        else:
            out[n] = a
    return out


class GatherEngine:
    """(N, K) neighbor-list engine; fast wherever irregular gathers are."""

    # metric keys of ctx.diag (sharded runs need the structure statically)
    diag_keys = ("max_neighbors", "neighbor_overflow")

    def __init__(self, params):
        self.params = params

    def prepare(self, x, cell_starts):
        params = self.params
        nl = build_neighbor_list(
            x, cell_starts, params.grid_num, params.grid_size,
            params.support_radius, params.neighbor_cap, params.cell_cap,
            dim=params.dim)
        return nl

    def traverse(self, ctx, x, fields: Dict[str, jnp.ndarray],
                 term_fn: Callable, out_specs: Dict[str, str],
                 mode: str = "legacy", pair_dots=()):
        nl = ctx
        params = self.params
        n = x.shape[0]
        idx = nl.idx
        gidx = jnp.arange(n, dtype=jnp.int32)

        fi = {k: v[:, None] for k, v in fields.items()}
        fj = {k: v[idx] for k, v in fields.items()}
        for d in range(params.dim):
            fi[f"x{d}"] = x[:, None, d]
            fj[f"x{d}"] = x[:, d][idx]
        fi["gidx"] = gidx[:, None]
        fj["gidx"] = idx

        rvec = tuple(fi[f"x{d}"] - fj[f"x{d}"] for d in range(params.dim))
        if params.dim == 2:
            rvec = rvec + (jnp.zeros_like(rvec[0]),)
        rn = jnp.sqrt(sum(c * c for c in rvec))
        valid = nl.mask()  # slot < cnt; radius+self already filtered at build

        if mode == "mxu":
            d2 = rn * rn
            # "_inv" = 1/|r| via one rsqrt — term fns use it to skip
            # their per-lane divide (round-4 strength reduction; the
            # Pallas engines provide the same key so engine and oracle
            # shift rounding together, <= 2 ulp)
            dots = {"_inv": jax.lax.rsqrt(jnp.maximum(d2, 1e-38))}
            for u in pair_dots:
                du = tuple(fi[f"{u}{d}"] - fj[f"{u}{d}"] for d in range(3))
                dots[u] = vdot(du, rvec)
            contribs = term_fn(fi, fj, d2, rn, dots)
            outs = {}
            for name, spec in out_specs.items():
                c = jnp.broadcast_to(contribs[name], valid.shape)
                c = jnp.where(valid, c, 0.0)
                if spec == "radial":
                    outs[name] = tuple(jnp.sum(c * rv, axis=1)
                                       for rv in rvec)
                else:
                    outs[name] = jnp.sum(c, axis=1)
            return outs

        contribs = term_fn(fi, fj, rvec, rn)
        outs = {}
        for name, spec in out_specs.items():
            c = contribs[name]
            if spec == "vec":
                outs[name] = tuple(
                    jnp.sum(jnp.where(valid, jnp.broadcast_to(comp, valid.shape), 0.0), axis=1)
                    for comp in c)
            else:
                outs[name] = jnp.sum(
                    jnp.where(valid, jnp.broadcast_to(c, valid.shape), 0.0), axis=1)
        return outs


def make_engine(params):
    backend = params.backend
    if backend == "auto":
        # pallas_blocks (v3) is the production TPU engine: measured
        # bit-exact vs the gather oracle ON REAL TPU at occupancy 58
        # with deep multi-sheet windows (and parity-probed every bench
        # run, bench.py device_parity_probe).
        backend = "pallas_blocks" if jax.default_backend() == "tpu" \
            else "gather"
    if backend in ("pallas", "pallas_interpret"):
        # v2 row engine: DELETED in round 5.  It mis-summed pair
        # contributions on real TPU at high cell occupancy (densities up
        # to 1.45x off the oracle with no capacity flag; interpret mode
        # was exact — a device-only Mosaic lowering issue never root-
        # caused).  History and measurements: docs/DESIGN.md round 3.
        raise ValueError(
            "backend='pallas' (the v2 row engine) was removed: it "
            "produced silently wrong sums on real TPU.  Use "
            "'pallas_blocks' (production) or 'auto'.")
    if backend == "pallas_blocks":     # v3 block engine (round 3)
        from sph_taichi_tpu.ops.pallas_blocks import BlockEngine
        return BlockEngine(params)
    if backend == "pallas_blocks_interpret":
        from sph_taichi_tpu.ops.pallas_blocks import BlockEngine
        return BlockEngine(params, interpret=True)
    if backend == "pallas_slots":
        # v4 slot-dense engine: correct but measured 5.7x SLOWER than
        # blocks end-to-end on device (j84); retired, kept selectable
        # for A/B runs only.
        from sph_taichi_tpu.ops.retired.pallas_slots import SlotEngine
        return SlotEngine(params)
    if backend == "pallas_slots_interpret":
        from sph_taichi_tpu.ops.retired.pallas_slots import SlotEngine
        return SlotEngine(params, interpret=True)
    return GatherEngine(params)
