"""Pallas TPU pair-traversal engine: row-streaming windowed all-pairs.

Why this exists: measured TPU behavior (see SURVEY §2.4 / bench notes) is
that irregular gathers and scatters run at ~100-200 ms per 442K-particle
traversal — ~300x slower than structured ops — while sorts, shifts and
DMA run at full bandwidth.  So the TPU hot path never gathers.  Instead:

Layout. Particles are sorted by flat cell id ix*ny*nz + iy*nz + iz, so a
"row" (fixed ix,iy; all iz) is one contiguous slice of every particle
array, and the 27-cell neighborhood of any cell is contained in the 9
rows (ix+dx, iy+dy).  Per traversal, the needed per-particle fields are
packed into two f32 matrices: `lanes` (F, N) for the candidate side
(particle axis on TPU lanes) and `subs` (N, F) for the center side
(particle axis on sublanes).

Kernel. One grid instance per occupied row (compacted id list via
PrefetchScalarGridSpec): DMA the 9 neighbor-row slices of `lanes` and the
center-row slice of `subs` into VMEM, then sweep the row's z-cells; for
each center cell, assemble the 9 z-windows [iz-1, iz+2) (each <= WC lanes)
into one (F, 9*WC) candidate tile and evaluate the solver's term function
on (CB, 9*WC) center-broadcast tiles.  Center cells with more than CB
particles take multiple passes.  Validity masking needs no bookkeeping:
the packed global index row makes `wlo <= gidx_j < whi`, `gidx_j !=
gidx_i` exact even on over-fetched lanes.

Outputs are written back with forward-chunked DMAs (grid instances run
sequentially on a TPU core, and instances are ordered by ascending row,
so a chunk overshooting into the next row is rewritten by that row's own
instance; the tail overshoot lands in a slack region of the output).

The engine implements the same `traverse` contract as GatherEngine
(ops/pairs.py) and is validated against it by tests (interpret mode on
CPU, real kernels on TPU).
"""

import functools
from typing import Dict, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


CB = 8          # center block (sublanes per pass)
MAX_PASSES = 4  # max center passes per cell -> supports up to 32/cell
OUT_CHUNK = 64  # output write-back chunk (particles)


class RowCtx(NamedTuple):
    rows_compact: jnp.ndarray   # i32[n_rows] occupied row ids first
    n_occ: jnp.ndarray          # i32[] number of occupied rows
    z_table: jnp.ndarray        # i32[n_rows, 9, nz+3] window starts + z-bounds
    diag: dict


class PallasEngine:
    # metric keys of RowCtx.diag (sharded runs need the structure statically)
    diag_keys = ("max_row_len", "max_window_len", "max_cell_occupancy_engine",
                 "row_overflow", "window_overflow", "cell_overflow")

    def __init__(self, params, interpret=False):
        assert params.dim == 3, "Pallas engine is 3D; 2D uses GatherEngine"
        self.params = params
        self.interpret = interpret
        nx, ny, nz = params.grid_num
        self.nx, self.ny, self.nz = nx, ny, nz
        self.n_rows = nx * ny
        # static capacities (config-derived)
        self.wc = int(getattr(params, "window_cap", 0) or 64)  # lanes per z-window
        self.r_max = int(getattr(params, "row_cap", 0) or 1024)  # particles per row
        self.h2 = params.support_radius * params.support_radius
        self.ablate = ""  # perf-diagnosis hooks, see _kernel

    # ------------------------------------------------------------------
    def prepare(self, x, cell_starts):
        """Build per-row window tables from cell_starts — structured ops only."""
        nx, ny, nz = self.nx, self.ny, self.nz
        n_rows = self.n_rows
        c = nx * ny * nz

        s = cell_starts[:c].reshape(n_rows, nz)
        row_end = cell_starts[nz:c + 1:nz][:, None]           # starts[(r+1)*nz]
        s_full = jnp.concatenate([s, row_end], axis=1)        # (n_rows, nz+1)

        rid = jnp.arange(n_rows, dtype=jnp.int32)
        ix = rid // ny
        iy = rid % ny

        z_rows = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                delta = dx * ny + dy
                shifted = jnp.roll(s_full, -delta, axis=0)
                ok = ((ix + dx >= 0) & (ix + dx < nx)
                      & (iy + dy >= 0) & (iy + dy < ny))
                # invalid neighbor row -> empty window (start == end)
                empty = s_full[:, :1]
                shifted = jnp.where(ok[:, None], shifted,
                                    jnp.broadcast_to(empty, shifted.shape))
                z_rows.append(shifted)
        z_table = jnp.stack(z_rows, axis=1).astype(jnp.int32)  # (n_rows, 9, nz+1)

        # occupied z-range of each (center) row: cells outside it have no
        # centers, so the kernel's z sweep can skip them entirely
        cnts = s_full[:, 1:] - s_full[:, :-1]          # (n_rows, nz)
        occ_z = cnts > 0
        any_z = jnp.any(occ_z, axis=1)
        zmin = jnp.argmax(occ_z, axis=1).astype(jnp.int32)
        zmax = (nz - 1 - jnp.argmax(occ_z[:, ::-1], axis=1)).astype(jnp.int32)
        zmin = jnp.where(any_z, zmin, 0)
        zmax = jnp.where(any_z, zmax + 1, 0)           # exclusive

        # fold the z-bounds into the table: extra columns [nz+1]=zmin,
        # [nz+2]=zmax on every k (SMEM block shapes must equal full dims)
        extra = jnp.stack([zmin, zmax], axis=1)[:, None, :]
        extra = jnp.broadcast_to(extra, (n_rows, 9, 2)).astype(jnp.int32)

        row_len = s_full[:, nz] - s_full[:, 0]
        occupied = row_len > 0
        # compaction via stable sort (no scatter): occupied rows first
        key = jnp.where(occupied, 0, 1).astype(jnp.int32)
        _, rows_compact = jax.lax.sort_key_val(key, rid, is_stable=True)
        n_occ = jnp.sum(occupied.astype(jnp.int32))

        cell_cnt = cell_starts[1:c + 1] - cell_starts[:c]
        # 3-cell z-window lengths for each center cell (edges clamped)
        lo_idx = np.maximum(np.arange(nz) - 1, 0)
        hi_idx = np.minimum(np.arange(nz) + 2, nz)
        win3 = s_full[:, hi_idx] - s_full[:, lo_idx]
        diag = {
            "max_row_len": jnp.max(row_len),
            "max_window_len": jnp.max(win3),
            "max_cell_occupancy_engine": jnp.max(cell_cnt),
            # binding constraint: window offsets must stay un-clamped and
            # the 256-lane roll must not wrap (see _kernel); derivation in
            # docs/DESIGN.md
            # binding constraint is the 256-lane centers slab: loc_c =
            # cs - base[4] <= row_len + 128 must stay <= r_max - 256, and
            # window slabs need row_len + 128 <= r_max - 256 as well
            "row_overflow": jnp.max(row_len) > self.r_max - 384,
            "window_overflow": jnp.max(win3) > self.wc,
            "cell_overflow": jnp.max(cell_cnt) > CB * MAX_PASSES,
        }
        z_table = jnp.concatenate([z_table, extra], axis=2)  # (n_rows,9,nz+3)
        return RowCtx(rows_compact=rows_compact, n_occ=n_occ,
                      z_table=z_table, diag=diag)

    # ------------------------------------------------------------------
    def traverse(self, ctx: RowCtx, x, fields: Dict[str, jnp.ndarray],
                 term_fn, out_specs: Dict[str, str]):
        params = self.params
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
        # slack lanes so window DMAs [base, base + r_max) never need
        # clamping near the array tail (base <= start <= n always); slack
        # gidx = -1 fails the wlo <= gidx mask on every window
        r_max_s = min(self.r_max, n)
        lanes = jnp.pad(lanes, ((0, 0), (0, r_max_s + 256)))
        lanes = lanes.at[3, n:].set(-1.0)

        out_names = sorted(out_specs.keys())
        out_cols = []
        for o in out_names:
            out_cols.append((o, 3 if out_specs[o] == "vec" else 1))
        n_out = sum(c for _, c in out_cols)
        n_out_pad = 128                    # lane-width of the output buffers

        r_max = min(self.r_max, n)
        kernel = functools.partial(
            self._kernel, term_fn=term_fn, name_to_idx=name_to_idx,
            out_cols=out_cols, f_pad=f_pad, n_out_pad=n_out_pad, n=n,
            r_max=r_max)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # rows_compact, n_occ
            grid=(self.n_rows,),
            in_specs=[
                pl.BlockSpec((1, 9, self.nz + 3),
                             lambda i, rows, nocc: (rows[i], 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),   # lanes (HBM)
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((9, f_pad, r_max), jnp.float32),        # windows
                pltpu.VMEM((r_max, 128), jnp.float32),             # out acc
                pltpu.VMEM((f_pad + 1, 9 * self.wc), jnp.float32), # cand tile
                pltpu.SemaphoreType.DMA((12,)),
            ],
        )

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n + r_max, n_out_pad),
                                           jnp.float32),
            grid_spec=grid_spec,
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ctx.rows_compact, jnp.full((1,), ctx.n_occ, jnp.int32),
          ctx.z_table, lanes)

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
    def _kernel(self, rows_ref, nocc_ref, z_ref, lanes_hbm,
                out_hbm, win_scr, out_scr, cand_scr,
                sems, *, term_fn, name_to_idx, out_cols, f_pad, n_out_pad, n,
                r_max):
        wc = self.wc
        nz = self.nz
        h2 = self.h2
        i = pl.program_id(0)

        @pl.when(i < nocc_ref[0])
        def _run():
            row_start = z_ref[0, 4, 0]
            row_end = z_ref[0, 4, nz]

            # ---- DMA all 9 candidate windows ----
            # dynamic lane offsets in DMAs must be 128-aligned (Mosaic).
            # The lanes array carries r_max + 256 slack lanes, so
            # [bk, bk + r_max) is always in bounds without clamping.
            base = []
            for k in range(9):
                bk = z_ref[0, k, 0]
                bk = pl.multiple_of((bk // 128) * 128, 128)
                base.append(bk)
                pltpu.make_async_copy(
                    lanes_hbm.at[:, pl.ds(bk, r_max)],
                    win_scr.at[k], sems.at[k]).start()
            cbase = pl.multiple_of((row_start // 128) * 128, 128)
            for k in range(9):
                pltpu.make_async_copy(
                    lanes_hbm.at[:, pl.ds(base[k], r_max)],
                    win_scr.at[k], sems.at[k]).wait()

            out_scr[...] = jnp.zeros((r_max, 128), jnp.float32)

            def z_body(iz, _):
                cs = z_ref[0, 4, iz]
                ce = z_ref[0, 4, iz + 1]
                cnt = ce - cs

                if self.ablate == "emptyz":
                    return 0

                @pl.when(cnt > 0)
                def _cell():
                    # ---- centers from the row's own window (k=4): roll the
                    # aligned slab so this cell starts at lane 0, transpose
                    loc_c = jnp.minimum(cs - base[4],
                                        jnp.int32(r_max - 256))
                    loc_ca = jnp.minimum((loc_c // 128) * 128,
                                         jnp.int32(r_max - 256))
                    loc_ca = pl.multiple_of(loc_ca, 128)
                    cslab = win_scr[4, :, pl.ds(loc_ca, 256)]
                    cslab = pltpu.roll(cslab, 256 - (loc_c - loc_ca), axis=1)
                    centers_t = jnp.transpose(cslab[:, :CB * MAX_PASSES])
                    # (32, F): rows beyond cnt belong to later cells and are
                    # rewritten by their own passes

                    # ---- assemble candidate tile (F+1, 9*WC) ----
                    # VMEM vector loads need 128-aligned lane offsets, so
                    # read an aligned 256-lane slab and rotate the window
                    # to the front (delta + wc <= 256 holds by the clamp).
                    for k in range(9):
                        if self.ablate == "noassemble":
                            break
                        wlo = z_ref[0, k, jnp.maximum(iz - 1, 0)]
                        whi = z_ref[0, k, jnp.minimum(iz + 2, nz)]
                        loc = jnp.minimum(wlo - base[k],
                                          jnp.int32(r_max - wc))
                        loc = jnp.maximum(loc, 0)
                        if self.ablate == "noslab":
                            seg = win_scr[k, :, 0:wc]
                        else:
                            loc_a = jnp.minimum((loc // 128) * 128,
                                                jnp.int32(r_max - 256))
                            loc_a = pl.multiple_of(loc_a, 128)
                            delta = loc - loc_a
                            slab = win_scr[k, :, pl.ds(loc_a, 256)]  # (F,256)
                            if self.ablate != "noroll":
                                slab = pltpu.roll(slab, 256 - delta, axis=1)
                            seg = slab[:, :wc]                       # (F, WC)
                        cand_scr[0:f_pad, k * wc:(k + 1) * wc] = seg
                        g = seg[3:4, :]                          # gidx row
                        ok = ((g >= wlo.astype(jnp.float32))
                              & (g < whi.astype(jnp.float32)))
                        cand_scr[f_pad:f_pad + 1, k * wc:(k + 1) * wc] = \
                            ok.astype(jnp.float32)

                    cand = cand_scr[...]
                    valid_j = cand[f_pad:f_pad + 1, :] > 0.5   # (1, 9WC)

                    def do_pass(ps):
                        off = cs - cbase + ps * CB
                        off = jnp.minimum(off, jnp.int32(r_max - CB))
                        cen = centers_t[ps * CB:(ps + 1) * CB, :]  # (CB, F)

                        fi = {k_: cen[:, v:v + 1]
                              for k_, v in name_to_idx.items()}
                        fj = {k_: cand[v:v + 1, :]
                              for k_, v in name_to_idx.items()}
                        rvec = (fi["x0"] - fj["x0"],
                                fi["x1"] - fj["x1"],
                                fi["x2"] - fj["x2"])
                        d2 = (rvec[0] * rvec[0] + rvec[1] * rvec[1]
                              + rvec[2] * rvec[2])
                        rn = jnp.sqrt(d2)
                        mask = (valid_j & (d2 < h2)
                                & (fi["gidx"] != fj["gidx"]))   # (CB, 9WC)

                        contribs = term_fn(fi, fj, rvec, rn)
                        pieces = []
                        for o, ncomp in out_cols:
                            c = contribs[o]
                            comps = c if ncomp == 3 else (c,)
                            for comp in comps:
                                comp = jnp.broadcast_to(comp, mask.shape)
                                pieces.append(jnp.sum(
                                    jnp.where(mask, comp, 0.0),
                                    axis=1, keepdims=True))
                        res = jnp.concatenate(pieces, axis=1)   # (CB, n_out)
                        pad = 128 - res.shape[1]
                        if pad:
                            res = jnp.concatenate(
                                [res, jnp.zeros((CB, pad), jnp.float32)],
                                axis=1)
                        out_scr[pl.ds(off, CB), :] = res

                    # static predicated passes: the common case (<= CB
                    # particles per cell) pays for exactly one
                    do_pass(0)
                    n_passes = 1 if self.ablate == "onepass" else MAX_PASSES
                    for ps in range(1, n_passes):
                        @pl.when(cnt > ps * CB)
                        def _more(ps=ps):
                            do_pass(ps)

                return 0

            jax.lax.fori_loop(z_ref[0, 0, nz + 1], z_ref[0, 0, nz + 2],
                              z_body, 0)

            # ---- chunked write-back (forward overshoot rewritten later) ----
            row_len = row_end - row_start
            n_chunks = pl.cdiv(row_len, OUT_CHUNK)

            if self.ablate == "nowriteback":
                return

            def out_body(c, _):
                src_off = (row_start - cbase) + c * OUT_CHUNK
                pltpu.make_async_copy(
                    out_scr.at[pl.ds(src_off, OUT_CHUNK), :],
                    out_hbm.at[pl.ds(row_start + c * OUT_CHUNK, OUT_CHUNK), :],
                    sems.at[10]).start()
                pltpu.make_async_copy(
                    out_scr.at[pl.ds(src_off, OUT_CHUNK), :],
                    out_hbm.at[pl.ds(row_start + c * OUT_CHUNK, OUT_CHUNK), :],
                    sems.at[10]).wait()
                return 0

            jax.lax.fori_loop(0, n_chunks, out_body, 0)
