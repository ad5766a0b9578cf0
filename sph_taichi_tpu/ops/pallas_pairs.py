"""Pallas TPU pair-traversal engine v2: group/span/z-batch row streaming.

.. warning:: round-3 status — NOT the production engine.  On real TPU
   hardware this kernel mis-sums pair contributions at high cell
   occupancy (measured: occupancy-58 clumps give densities 9-68% off the
   gather oracle under both tuned schedules, with no capacity flag
   raised; interpret mode on the same inputs is exact to 1e-5, so the
   logic is right and the Mosaic lowering of something here — suspects:
   dynamic-shift pltpu.roll, the dynamic do_pass fori with CB-sublane
   dynamic slices — is not).  The v3 block engine (ops/pallas_blocks.py)
   measures bit-exact on device under the same adversarial test and is
   what "auto" now selects; v2 is kept for A/B and as the record of the
   round-2 design.

Why this exists: measured TPU behavior (docs/DESIGN.md) is that irregular
gathers and scatters run at ~100-200 ms per 442K-particle traversal while
sorts, shifts and DMA run at full bandwidth, so the TPU hot path never
gathers.  Particles sorted by flat cell id ix*ny*nz + iy*nz + iz make a
grid "row" (fixed ix,iy; all iz) one contiguous slice of every particle
array; the 27-cell neighborhood of any cell lives in the 9 rows
(ix+dx, iy+dy), and — because consecutive iy rows are adjacent both in
rid and in particle order — those 9 rows are 3 *contiguous* y-spans
(one per dx), and the spans of G consecutive rows are 3 contiguous
(G+2)-row spans.

This is the round-2 redesign of the round-1 per-cell kernel, which was
~95% structural overhead (per-cell window assembly + per-row DMA issue +
per-instance grid cost; see VERDICT round 1).  Structural changes:

1. **Row groups.**  One grid instance handles G consecutive raw rows
   (grid = ceil(n_rows/G)); empty rows/groups are skipped by a scalar
   test instead of a prefetched compaction, and per-instance cost
   (grid step, SMEM block fetch, write-back) is amortized G-fold.
2. **Group-level span DMAs.**  Per instance, 3 DMAs fetch the contiguous
   particle spans of rows [rid0+dx*ny-1, rid0+G+dx*ny] — every member
   row's valid 3x3 neighborhood is a subset, so per-row fetches vanish
   (the round-1 kernel issued 9 row-sized DMAs per row = 72x more).
3. **Z-batched center tiles.**  Centers are processed Z grid cells at a
   time: the candidate set is the union z-window [iz0-1, iz0+Z+1) of
   each of the 9 neighbor rows (assembled once per batch), and the
   per-pair radius mask — not per-cell bookkeeping — provides
   correctness.  Center passes are *dynamic* fori loops over
   ceil(cnt/CB), CB = 32 center sublanes per pass, so there is no
   per-cell occupancy cap at all (the round-1 engine silently dropped
   pairs beyond 32/cell).
4. **Per-group center transposes.**  The center side of the pair tile
   needs particles on sublanes; the group's whole contiguous particle
   span is transposed once from the own-span slab in aligned 256-lane
   slabs (no per-batch rolls), and passes slice it at dynamic *sublane*
   offsets, which Mosaic allows unaligned.

All window arithmetic is precomputed into small SMEM tables by
`prepare` (pure structured XLA): per row and z-batch, the 9 candidate
window bounds; per group, the 3 span bounds; per row, the nbatch+1
center boundaries.  Validity masking needs no bookkeeping: the packed
global index row makes `wlo <= gidx_j < whi`, `gidx_j != gidx_i` exact
even on over-fetched lanes.

Mosaic constraints honored (see docs/DESIGN.md): dynamic lane offsets in
DMAs and VMEM vector loads are 128-aligned (aligned slabs + `pltpu.roll`
with dynamic shift); outputs are (rows, 128) so DMA destinations keep a
full lane width.  Output write-back is one chunked sweep per group with
an EXACT tail: the final chunk overlaps backward over this group's own
rows, so no instance ever writes outside its own [grp_lo, grp_hi) range
(round 3; the round-2 forward-overshoot contract wrote stale scratch
rows into the next group's range and was the prime suspect for the
armadillo/z16 TPU INTERNAL faults).

The engine implements the same `traverse` contract as GatherEngine
(ops/pairs.py) and is validated against it by tests/test_pallas.py
(interpret mode on CPU, real kernels on TPU).
"""

import functools
from typing import Dict, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


CB = 64          # center sublanes per pass (default; see engine.cb)
OUT_CHUNK = 512  # output write-back chunk (particles)


class RowCtx(NamedTuple):
    win_tab: jnp.ndarray   # i32[n_rows_pad, 9, 2*nbatch] per-batch window bounds
    span_tab: jnp.ndarray  # i32[n_groups, 3, 2] per-dx group span [lo, hi)
    ctr_tab: jnp.ndarray   # i32[n_rows_pad, nbatch+1] center batch boundaries
    diag: dict


class PallasEngine:
    # metric keys of RowCtx.diag (sharded runs need the structure statically)
    diag_keys = ("max_span_len", "max_window_len", "max_row_len",
                 "max_cell_occupancy_engine",
                 "span_overflow", "window_overflow", "row_overflow",
                 "group_overflow")

    def __init__(self, params, interpret=False):
        assert params.dim == 3, "Pallas engine is 3D; 2D uses GatherEngine"
        self.params = params
        self.interpret = interpret
        nx, ny, nz = params.grid_num
        self.nx, self.ny, self.nz = nx, ny, nz
        self.n_rows = nx * ny
        # static capacities / schedule knobs (config-derived)
        self.z = int(getattr(params, "z_batch", 0) or 6)
        self.nbatch = -(-nz // self.z)
        self.r3 = int(getattr(params, "span_cap", 0) or 4096)      # span lanes
        self.r_max = int(getattr(params, "row_cap", 0) or 1024)    # row lanes
        self.gcap = int(getattr(params, "group_cap", 0) or 4096)   # out rows
        self.g = int(getattr(params, "rows_per_instance", 0) or 8)
        self.assemble = getattr(params, "assemble", "roll") or "roll"
        # candidate lanes per window segment: pass math is proportional to
        # 9*wu, so wu is sized to the (z_batch+2)-cell window population —
        # windows that outgrow it are handled exactly by the sheet loop
        wc = int(getattr(params, "window_cap", 0) or 64)
        self.wu = wc if self.assemble == "roll" else 256
        # aligned slab that must fully contain a window after the roll:
        # worst-case misalignment is 127 lanes, so sl >= wu + 127
        self.sl = -(-(self.wu + 128) // 128) * 128
        self.h2 = params.support_radius * params.support_radius
        self.cb = int(getattr(params, "center_block", 0) or CB)
        self.ablate = ""  # perf-diagnosis hooks, see _kernel

    # ------------------------------------------------------------------
    def prepare(self, x, cell_starts):
        """Build per-row window/span/center tables — structured ops only."""
        nx, ny, nz = self.nx, self.ny, self.nz
        n_rows, z, nbatch = self.n_rows, self.z, self.nbatch
        c = nx * ny * nz

        s = cell_starts[:c].reshape(n_rows, nz)
        row_end = cell_starts[nz:c + 1:nz][:, None]           # starts[(r+1)*nz]
        s_full = jnp.concatenate([s, row_end], axis=1)        # (n_rows, nz+1)

        rid = jnp.arange(n_rows, dtype=jnp.int32)
        ix = rid // ny
        iy = rid % ny

        # static column indices of window bounds per z-batch b
        lo_cols = [max(b * z - 1, 0) for b in range(nbatch)]
        hi_cols = [min(b * z + z + 1, nz) for b in range(nbatch)]

        win_rows = []      # per k: (n_rows, 2*nbatch)
        span_lo = [None] * 3
        span_hi = [None] * 3
        span_any = [None] * 3
        big = jnp.int32(2 ** 30)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                delta = dx * ny + dy
                shifted = jnp.roll(s_full, -delta, axis=0)
                ok = ((ix + dx >= 0) & (ix + dx < nx)
                      & (iy + dy >= 0) & (iy + dy < ny))
                wlo = jnp.where(ok[:, None], shifted[:, lo_cols], 0)
                whi = jnp.where(ok[:, None], shifted[:, hi_cols], 0)
                win_rows.append(
                    jnp.stack([wlo, whi], axis=2).reshape(n_rows, 2 * nbatch))
                d = dx + 1
                lo_k = jnp.where(ok, shifted[:, 0], big)
                hi_k = jnp.where(ok, shifted[:, nz], 0)
                span_lo[d] = lo_k if span_lo[d] is None \
                    else jnp.minimum(span_lo[d], lo_k)
                span_hi[d] = hi_k if span_hi[d] is None \
                    else jnp.maximum(span_hi[d], hi_k)
                span_any[d] = ok if span_any[d] is None else (span_any[d] | ok)
        win_tab = jnp.stack(win_rows, axis=1).astype(jnp.int32)

        ctr_cols = [min(b * z, nz) for b in range(nbatch + 1)]
        ctr_tab = s_full[:, ctr_cols].astype(jnp.int32)            # (n_rows,nb+1)

        # pad the row axis to a multiple of G; pad rows are empty (start ==
        # end == n) so padded groups report grp_len == 0 and are skipped
        n_pad_rows = -(-n_rows // self.g) * self.g - n_rows
        n_total = cell_starts[c]
        if n_pad_rows:
            win_tab = jnp.pad(win_tab, ((0, n_pad_rows), (0, 0), (0, 0)))
            ctr_tab = jnp.concatenate(
                [ctr_tab, jnp.full((n_pad_rows, nbatch + 1), n_total,
                                   jnp.int32)], axis=0)

        # group-level spans: union of member-row spans per dx (valid-aware;
        # member spans are contiguous in rid so min/max is the union)
        span_cols = []
        for d in range(3):
            lo = jnp.pad(span_lo[d], (0, n_pad_rows), constant_values=2 ** 30)
            hi = jnp.pad(span_hi[d], (0, n_pad_rows), constant_values=0)
            any_ = jnp.pad(span_any[d], (0, n_pad_rows), constant_values=False)
            glo = jnp.min(lo.reshape(-1, self.g), axis=1)
            ghi = jnp.max(hi.reshape(-1, self.g), axis=1)
            gany = jnp.any(any_.reshape(-1, self.g), axis=1)
            glo = jnp.where(gany, glo, 0)
            ghi = jnp.where(gany, ghi, 0)
            span_cols.append(jnp.stack([glo, ghi], axis=1))
        span_tab = jnp.stack(span_cols, axis=1).astype(jnp.int32)  # (nG,3,2)

        # diagnostics (binding constraints derived in the module docstring)
        row_len = s_full[:, nz] - s_full[:, 0]
        span_len = span_tab[:, :, 1] - span_tab[:, :, 0]
        max_span = jnp.max(span_len)
        win_len = (win_tab[:n_rows, :, 1::2] - win_tab[:n_rows, :, 0::2])
        max_win = jnp.max(win_len)
        max_row = jnp.max(row_len)
        cell_cnt = cell_starts[1:c + 1] - cell_starts[:c]
        grp = ctr_tab.reshape(-1, self.g, nbatch + 1)
        grp_len = grp[:, -1, nbatch] - grp[:, 0, 0]
        diag = {
            "max_span_len": max_span,
            "max_window_len": max_win,
            "max_row_len": max_row,
            "max_cell_occupancy_engine": jnp.max(cell_cnt),
            # group span slabs + SL-lane aligned window reads must fit in R3
            "span_overflow": max_span > self.r3 - self.sl - 128,
            # informational since window sheets: batches whose windows
            # exceed one tile are processed exactly, sheet by sheet; the
            # flag now marks "multi-sheet batches occurred" (a perf signal,
            # not a correctness loss)
            "window_overflow": max_win > (self.wu if self.assemble == "roll"
                                          else 129),
            # informational (no kernel constraint since the group-level
            # center transpose; binding center capacity is group_cap)
            "row_overflow": max_row > self.r_max,
            "group_overflow": jnp.max(grp_len) > self.gcap,
        }
        return RowCtx(win_tab=win_tab, span_tab=span_tab, ctr_tab=ctr_tab,
                      diag=diag)

    # ------------------------------------------------------------------
    def traverse(self, ctx: RowCtx, x, fields: Dict[str, jnp.ndarray],
                 term_fn, out_specs: Dict[str, str],
                 mode: str = "legacy", pair_dots=()):
        n = x.shape[0]
        field_names = sorted(fields.keys())
        gidx = jnp.arange(n, dtype=jnp.float32)

        cols = [x[:, 0], x[:, 1], x[:, 2], gidx]
        name_to_idx = {"x0": 0, "x1": 1, "x2": 2, "gidx": 3}
        for fn_ in field_names:
            name_to_idx[fn_] = len(cols)
            cols.append(fields[fn_].astype(jnp.float32))
        f_used = len(cols)
        f_pad = max(8, -(-f_used // 8) * 8)
        while len(cols) < f_pad:
            cols.append(jnp.zeros((n,), jnp.float32))

        lanes = jnp.stack(cols, axis=0)    # (F, N) candidate side
        # slack lanes so span DMAs [base, base + R3) never need clamping
        # near the array tail (base <= n always); slack gidx = -1 fails the
        # wlo <= gidx mask on every window
        lanes = jnp.pad(lanes, ((0, 0), (0, self.r3 + 128)))
        lanes = lanes.at[3, n:].set(-1.0)

        out_names = sorted(out_specs.keys())
        out_cols = []
        for o in out_names:
            out_cols.append((o, 3 if out_specs[o] in ("vec", "radial") else 1))
        if mode == "mxu":
            assert all(out_specs[o] in ("scalar", "radial") for o in out_names)
            for u in pair_dots:
                base = name_to_idx[f"{u}0"]
                assert (name_to_idx[f"{u}1"] == base + 1
                        and name_to_idx[f"{u}2"] == base + 2), \
                    f"pair-dot components of {u!r} must pack contiguously"

        n_groups = (self.n_rows + self.g - 1) // self.g
        kernel = functools.partial(
            self._kernel, term_fn=term_fn, name_to_idx=name_to_idx,
            out_cols=out_cols, f_pad=f_pad, mxu=(mode == "mxu"),
            pair_dots=tuple(pair_dots), out_specs=dict(out_specs))

        nb = self.nbatch
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
            grid=(n_groups,),
            in_specs=[
                pl.BlockSpec((self.g, 9, 2 * nb), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3, 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((self.g, nb + 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),   # lanes (HBM)
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((3, f_pad, self.r3), jnp.float32),      # dx spans
                pltpu.VMEM((f_pad + 1, 9 * self.wu), jnp.float32),  # cand tile
                pltpu.VMEM((self.gcap + 256, f_pad), jnp.float32),  # centers
                pltpu.VMEM((self.gcap + OUT_CHUNK, 128), jnp.float32),  # out
                pltpu.SemaphoreType.DMA((4,)),
            ],
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ctx.win_tab, ctx.span_tab, ctx.ctr_tab, lanes)

        outs = {}
        pos = 0
        for o, ncomp in out_cols:
            if ncomp == 3:
                outs[o] = (out[:n, pos], out[:n, pos + 1], out[:n, pos + 2])
            else:
                outs[o] = out[:n, pos]
            pos += ncomp
        return outs

    # ------------------------------------------------------------------
    def _kernel(self, win_ref, span_ref, ctr_ref, lanes_hbm, out_hbm,
                win_scr, cand_scr, ctr_scr, out_scr, sems,
                *, term_fn, name_to_idx, out_cols, f_pad,
                mxu=False, pair_dots=(), out_specs=None):
        G, Z, nb, wu, r3, h2 = self.g, self.z, self.nbatch, self.wu, \
            self.r3, self.h2
        CB = self.cb
        SL = self.sl
        roll_mode = self.assemble == "roll"
        n_ctr = self.gcap + 256

        grp_lo = ctr_ref[0, 0]
        grp_hi = ctr_ref[G - 1, nb]
        grp_len = grp_hi - grp_lo

        bases = []
        for dx in range(3):
            lo = span_ref[0, dx, 0]
            bases.append(pl.multiple_of((lo // 128) * 128, 128))

        @pl.when(grp_len > 0)
        def _run():
            for dx in range(3):
                pltpu.make_async_copy(
                    lanes_hbm.at[:, pl.ds(bases[dx], r3)],
                    win_scr.at[dx], sems.at[dx]).start()
            for dx in range(3):
                pltpu.make_async_copy(
                    lanes_hbm.at[:, pl.ds(bases[dx], r3)],
                    win_scr.at[dx], sems.at[dx]).wait()

            # ---- transpose the group's centers once: aligned 256-lane
            # slabs of the own span [grp_lo, grp_hi) -> (sublanes, F) ----
            loc_g = grp_lo - bases[1]
            la_g = jnp.minimum((loc_g // 128) * 128, jnp.int32(r3 - 256))
            la_g = pl.multiple_of(la_g, 128)
            delta_g = loc_g - la_g

            def t_body(sb, _):
                off = jnp.minimum(la_g + sb * 256, jnp.int32(r3 - 256))
                off = pl.multiple_of(off, 128)
                dst = jnp.minimum(sb * 256, jnp.int32(n_ctr - 256))
                ctr_scr[pl.ds(dst, 256), :] = jnp.transpose(
                    win_scr[1, :, pl.ds(off, 256)])
                return 0

            if self.ablate != "notranspose":
                jax.lax.fori_loop(
                    0, pl.cdiv(delta_g + grp_len, 256), t_body, 0)

            def row_body(g, _):
                row_lo = ctr_ref[g, 0]
                row_hi = ctr_ref[g, nb]
                row_len = row_hi - row_lo

                @pl.when(row_len > 0)
                def _row():
                    def batch_body(b, _):
                        cs = ctr_ref[g, b]
                        ce = ctr_ref[g, b + 1]
                        cnt = ce - cs

                        @pl.when(cnt > 0)
                        def _batch():
                            if self.ablate == "emptybatch":
                                return
                            # sheet stride: positions each assembly pass is
                            # guaranteed to cover per window (roll mode gets
                            # the full WU lanes; slab mode loses up to 127
                            # lanes to alignment)
                            stride = wu if roll_mode else 129
                            out0 = cs - grp_lo
                            ctr0 = delta_g + (cs - grp_lo)

                            # widest window of this batch decides how many
                            # sheets are needed; overflowing windows are
                            # processed exactly, sheet by sheet (no silent
                            # pair drops), the common case pays for one
                            mx = jnp.int32(1)
                            for k in range(9):
                                mx = jnp.maximum(
                                    mx, win_ref[g, k, 2 * b + 1]
                                    - win_ref[g, k, 2 * b])

                            def sheet_body(sh, _):
                                # ---- assemble candidate tile (F+1, 9*WU) --
                                for k in range(9):
                                    if self.ablate == "noassemble":
                                        break
                                    dx = k // 3
                                    wlo = win_ref[g, k, 2 * b]
                                    whi = win_ref[g, k, 2 * b + 1]
                                    ws_lo = wlo + sh * stride
                                    ws_hi = jnp.minimum(ws_lo + stride, whi)
                                    loc = ws_lo - bases[dx]
                                    loc = jnp.clip(loc, 0,
                                                   jnp.int32(r3 - SL))
                                    la = jnp.minimum((loc // 128) * 128,
                                                     jnp.int32(r3 - SL))
                                    la = pl.multiple_of(la, 128)
                                    slab = win_scr[dx, :, pl.ds(la, SL)]
                                    if roll_mode:
                                        slab = pltpu.roll(
                                            slab, SL - (loc - la), axis=1)
                                    seg = slab[:, :wu]
                                    cand_scr[0:f_pad,
                                             k * wu:(k + 1) * wu] = seg
                                    gi = seg[3:4, :]
                                    ok = ((gi >= ws_lo.astype(jnp.float32))
                                          & (gi < ws_hi.astype(jnp.float32)))
                                    cand_scr[f_pad:f_pad + 1,
                                             k * wu:(k + 1) * wu] = \
                                        ok.astype(jnp.float32)

                                cand = cand_scr[...]
                                valid_j = cand[f_pad:f_pad + 1, :] > 0.5

                                if mxu:
                                    # batch-centered coordinates keep the
                                    # |xi|^2+|xj|^2-2xi.xj expansion exact
                                    # enough in f32 (origin = first center)
                                    oc = jnp.minimum(ctr0,
                                                     jnp.int32(n_ctr - 1))
                                    orig = ctr_scr[pl.ds(oc, 1), 0:3]  # (1,3)
                                    cand_xc = (cand[0:3, :]
                                               - jnp.transpose(orig))
                                    x2c_j = jnp.sum(cand_xc * cand_xc,
                                                    axis=0, keepdims=True)
                                    dots_j = {}
                                    for u in pair_dots:
                                        ub = name_to_idx[f"{u}0"]
                                        cu = cand[ub:ub + 3, :]
                                        dots_j[u] = (cu, jnp.sum(
                                            cu * cand_xc, axis=0,
                                            keepdims=True))

                                def do_pass(p, _):
                                    coff = jnp.minimum(ctr0 + p * CB,
                                                       jnp.int32(n_ctr - CB))
                                    cen = ctr_scr[pl.ds(coff, CB), :]
                                    fi = {k_: cen[:, v:v + 1]
                                          for k_, v in name_to_idx.items()}
                                    fj = {k_: cand[v:v + 1, :]
                                          for k_, v in name_to_idx.items()}
                                    if mxu:
                                        cen_xc = cen[:, 0:3] - orig
                                        x2c_i = jnp.sum(cen_xc * cen_xc,
                                                        axis=1, keepdims=True)
                                        cross = jnp.dot(
                                            cen_xc, cand_xc,
                                            preferred_element_type=jnp.float32)
                                        d2 = jnp.maximum(
                                            x2c_i + x2c_j - 2.0 * cross, 0.0)
                                        rn = jnp.sqrt(d2)
                                        dots = {}
                                        for u in pair_dots:
                                            ub = name_to_idx[f"{u}0"]
                                            cen_u = cen[:, ub:ub + 3]
                                            cu, uxc_j = dots_j[u]
                                            uxc_i = jnp.sum(
                                                cen_u * cen_xc, axis=1,
                                                keepdims=True)
                                            dots[u] = (
                                                uxc_i + uxc_j
                                                - jnp.dot(cen_u, cand_xc,
                                                          preferred_element_type=jnp.float32)
                                                - jnp.dot(cen_xc, cu,
                                                          preferred_element_type=jnp.float32))
                                        mask = (valid_j & (d2 < h2)
                                                & (fi["gidx"] != fj["gidx"]))
                                        contribs = term_fn(fi, fj, d2, rn,
                                                           dots)
                                        pieces = []
                                        for o, ncomp in out_cols:
                                            cc = jnp.broadcast_to(
                                                contribs[o], mask.shape)
                                            cc = jnp.where(mask, cc, 0.0)
                                            if ncomp == 3:   # radial
                                                s0 = jnp.sum(cc, axis=1,
                                                             keepdims=True)
                                                s1 = jax.lax.dot_general(
                                                    cc, cand_xc,
                                                    (((1,), (1,)), ((), ())),
                                                    preferred_element_type=jnp.float32)
                                                pieces.append(
                                                    s0 * cen_xc - s1)
                                            else:
                                                pieces.append(jnp.sum(
                                                    cc, axis=1,
                                                    keepdims=True))
                                        res = jnp.concatenate(pieces, axis=1)
                                        pad = 128 - res.shape[1]
                                        if pad:
                                            res = jnp.concatenate(
                                                [res, jnp.zeros(
                                                    (CB, pad), jnp.float32)],
                                                axis=1)
                                        off = out0 + p * CB
                                        off = jnp.minimum(
                                            off, jnp.int32(
                                                self.gcap + OUT_CHUNK - CB))
                                        cur = out_scr[pl.ds(off, CB), :]
                                        out_scr[pl.ds(off, CB), :] = \
                                            jnp.where(sh == 0, res,
                                                      cur + res)
                                        return 0
                                    rvec = (fi["x0"] - fj["x0"],
                                            fi["x1"] - fj["x1"],
                                            fi["x2"] - fj["x2"])
                                    d2 = (rvec[0] * rvec[0]
                                          + rvec[1] * rvec[1]
                                          + rvec[2] * rvec[2])
                                    rn = jnp.sqrt(d2)
                                    mask = (valid_j & (d2 < h2)
                                            & (fi["gidx"] != fj["gidx"]))

                                    contribs = term_fn(fi, fj, rvec, rn)
                                    pieces = []
                                    for o, ncomp in out_cols:
                                        cc = contribs[o]
                                        comps = cc if ncomp == 3 else (cc,)
                                        for comp in comps:
                                            comp = jnp.broadcast_to(
                                                comp, mask.shape)
                                            pieces.append(jnp.sum(
                                                jnp.where(mask, comp, 0.0),
                                                axis=1, keepdims=True))
                                    res = jnp.concatenate(pieces, axis=1)
                                    pad = 128 - res.shape[1]
                                    if pad:
                                        res = jnp.concatenate(
                                            [res,
                                             jnp.zeros((CB, pad),
                                                       jnp.float32)],
                                            axis=1)
                                    off = out0 + p * CB
                                    off = jnp.minimum(
                                        off,
                                        jnp.int32(self.gcap + OUT_CHUNK - CB))
                                    cur = out_scr[pl.ds(off, CB), :]
                                    out_scr[pl.ds(off, CB), :] = jnp.where(
                                        sh == 0, res, cur + res)
                                    return 0

                                jax.lax.fori_loop(0, pl.cdiv(cnt, CB),
                                                  do_pass, 0)
                                return 0

                            jax.lax.fori_loop(0, pl.cdiv(mx, stride),
                                              sheet_body, 0)

                        return 0

                    jax.lax.fori_loop(0, nb, batch_body, 0)

                return 0

            jax.lax.fori_loop(0, G, row_body, 0)

            # ---- one chunked write-back sweep per group ----
            # EXACT tail (round-3): full chunks, then one overlapped
            # chunk covering [L-size, L) — rewriting rows of THIS group
            # with identical data instead of overshooting into the next
            # group's range.  The round-2 forward-overshoot contract
            # assumed strictly sequential instances and wrote stale
            # scratch rows into the next group (VERDICT r2 fault suspect).
            # L clamps to gcap so a group-overflowed run degrades to
            # clamped sums (flagged loudly via group_overflow) instead of
            # an out-of-bounds scratch DMA -> TPU INTERNAL fault.
            if self.ablate == "nowriteback":
                return

            L = jnp.minimum(grp_len, jnp.int32(self.gcap))

            def copy_chunk(src, size):
                pltpu.make_async_copy(
                    out_scr.at[pl.ds(src, size), :],
                    out_hbm.at[pl.ds(grp_lo + src, size), :],
                    sems.at[3]).start()
                pltpu.make_async_copy(
                    out_scr.at[pl.ds(src, size), :],
                    out_hbm.at[pl.ds(grp_lo + src, size), :],
                    sems.at[3]).wait()

            def out_body(c, _):
                copy_chunk(c * OUT_CHUNK, OUT_CHUNK)
                return 0

            jax.lax.fori_loop(0, L // OUT_CHUNK, out_body, 0)

            @pl.when((L % OUT_CHUNK > 0) & (L >= OUT_CHUNK))
            def _tail_overlap():
                copy_chunk(L - OUT_CHUNK, OUT_CHUNK)

            # small-group path (L < OUT_CHUNK): one chunk-size level is
            # enough — full chunks plus one overlapped tail copy, so no
            # write ever lands outside [grp_lo, grp_lo + L)
            for lo, hi, size in ((64, OUT_CHUNK, 64), (8, 64, 8)):
                @pl.when((L >= lo) & (L < hi))
                def _level(size=size):
                    def body(c, _, size=size):
                        copy_chunk(c * size, size)
                        return 0
                    jax.lax.fori_loop(0, L // size, body, 0)

                    @pl.when(L % size > 0)
                    def _ov(size=size):
                        copy_chunk(L - size, size)

            @pl.when(L < 8)
            def _tiny():
                def one(c, _):
                    copy_chunk(c, 1)
                    return 0
                jax.lax.fori_loop(0, L, one, 0)
