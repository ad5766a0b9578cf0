"""Pallas TPU pair-traversal engine v3: 2x2-row blocks, exact windows.

Round-3 redesign of the v2 row-streaming kernel (deleted round 5;
history in docs/DESIGN.md),
driven by the measured round-2 cost structure: the v2 pass loop runs at
~full VPU rate on its padded lanes, so the remaining lever is *padding*,
not issue overhead.  v2 evaluates ~1152 candidate lanes per center
(9 row-windows x 128 lanes for a 6-z-cell center batch).  v3 restructures
the tile so each center sees ~512:

1. **2x2-row blocks.**  One grid instance owns a 2x2 tile of grid rows
   (ix0..ix0+1, iy0..iy0+1).  Its 3x3x3-cell neighborhood union is the
   4x4 row tile (ix0-1..ix0+2) x (iy0-1..iy0+2) — 16 row-windows per
   center batch instead of v2's 9, but each is only (Z+2) z-cells wide.
2. **Small z-batches with matched center blocks.**  Z=2 z-cells per
   batch: centers = 4 rows x Z cells ~= 64 sublanes, candidates =
   16 windows x WC=32 lanes = 512.  Round 2's "narrow tiles are slower"
   finding (z2/w64) kept CB=64 center sublanes fixed and was measuring
   center-sublane waste, not lane-width cost.
3. **Exact windows.**  WC=32 covers (Z+2)=4 cells at the rest-lattice
   occupancy of 8/cell exactly (measured: max t=0 occupancy is 8 in both
   headline scenes).  Overflow is handled exactly by the v2 window-sheet
   pattern on the candidate side and a center-sheet loop on the center
   side — capacity costs passes, never pairs.
4. **Column-pair output ranges.**  A 2x2 block's own particles form two
   contiguous ranges (one per ix column: the iy0/iy0+1 rows are rid-
   adjacent).  Each column gets its own out_scr half and its own
   exact-tail writeback sweep (no instance writes outside its ranges).

Mosaic constraints are honored exactly as in v2: dynamic lane offsets in
DMAs and VMEM vector loads are 128-aligned (aligned slabs + pltpu.roll),
span DMAs move full-lane-width (f_pad, SPAN) slabs, center slices use
dynamic *sublane* offsets (alignment-free).

Same ``traverse`` contract as GatherEngine; validated by
tests/test_pallas_blocks.py in interpret mode against the gather oracle.
In mxu mode the pair geometry (d2, pair dots, radial outputs) is
computed directly from rvec — unlike v2 there is no centered-matmul
expansion, so docs/PARITY.md deviation 7 does not apply to this engine.
"""

import functools
from typing import Dict, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


OUT_CHUNK = 512   # output write-back chunk (particles)
CSL = 16          # center sublanes per own row per batch (Z*8 at Z=2)

# Trace-time ablation switch for perf experiments (devserver jobs set
# this then re-trace): "" = production, "nomath" = skip the center-sheet
# pair-math loop, "noasm" = skip the 16-window candidate assembly,
# "norolls" = assemble from the aligned slab base without pltpu.roll
# (wrong results, correct DMA/load volume), "noloop" = skip the whole
# batch loop (DMAs + transposes + writeback only), "nowb" = skip the
# write-back sweeps, "notr" = skip the own-column transposes (garbage
# centers, correct volume), "noepi" = skip the epilogue transform
# (raw pair sums land in the epilogue's output lanes reader — garbage
# results, isolates the epilogue's cost), "dmaonly" = only the span
# DMAs + grid scaffolding run (floor split), "nodma" = skip the span
# DMA start/wait (compute on stale VMEM).  NOTE: "noepi" and "notr"
# FAULT the TPU worker (kernel crash, rounds 3+4), and "nodma" faults
# it too since group compaction landed (j212) — do not run these on
# device.  Never set in production.
ABLATE = ""

# Trace-time switch for the compaction-overflow NaN poison on returned
# columns (devserver A/B cost attribution only — NEVER disable in
# production: without it, a tripped instance cap silently hands
# uninitialized HBM to direct step() callers).
POISON = True

# Trace-time experiment switch (VERDICT r4 item 2b): run the term-fn
# math chain (cubic kernel + coefficients, ~22-30 of the ~75 vector ops
# per candidate lane) in this dtype.  Pair geometry (rvec/d2/mask/rsqrt)
# and the masked products + lane reductions stay f32, so neighbor
# inclusion and summation order are unchanged; only the coefficient
# values round.  Set to jnp.bfloat16 by a devserver A/B job; None =
# production f32.  NOT a shipped knob: bf16 coefficients shift values
# ~1e-2 relative (8-bit mantissa), far outside the golden/parity gates.
MATH_DTYPE = None


class BlockCtx(NamedTuple):
    # n_inst = grid size (instance = G iy-adjacent groups; G = 1 reduces
    # every shape to the round-4 per-group layout)
    len_tab: jnp.ndarray    # i32[n_inst, G*NW, nbz] window lengths (rows
    #                         m*NW+k = member m, window k): the validity
    #                         mask is a lane-iota < cnt compare (the
    #                         rolled slab's lanes [0, cnt) ARE the
    #                         window), replacing per-window f32 gidx
    #                         bound compares — scalar-pipe strength
    #                         reduction, the measured binding resource
    cnt_plane: jnp.ndarray  # i32[n_inst, G*nbz8, NW*WC] countdown rows
    #                         (member-major): lane k*WC+l holds
    #                         len_tab[i, m*NW+k, t] - l, so the whole
    #                         sheet's validity row is ONE vector compare
    #                         (row > sh*WC) + one store instead of NW
    #                         scalar-broadcast iota compares (window
    #                         assembly measured issue-bound at
    #                         ~27ns/window, j104)
    loc_tab: jnp.ndarray    # i32[n_inst, G*NW, nbz] window start lane
    #                         RELATIVE to its instance-column union
    #                         slab's 128-aligned base, pre-clipped to
    #                         [0, SPAN-SL] (kills the subtract+clip
    #                         chain per window-sheet)
    span_tab: jnp.ndarray   # i32[n_inst, 2(B+2), 3] per-ix-col UNION
    #                         span [lo, hi, n_chunks) over the G
    #                         members; first B+2 rows own instance, rest
    #                         the next (for the cross-instance DMA
    #                         prefetch).  n_chunks = ceil((hi -
    #                         align(lo))/dma_chunk): the chunked span
    #                         DMA ships only that many CH-lane chunks of
    #                         the static SPAN slab
    ctr_tab: jnp.ndarray    # i32[n_inst, G*B*BY, nbz+1] center-row batch
    #                         starts (member-major)
    col_tab: jnp.ndarray    # i32[n_inst, 2B, 2] own column UNION
    #                         [lo, hi) (rows 0..B-1) + next instance's
    #                         (rows B..2B-1)
    zrange: jnp.ndarray     # i32[n_inst, 1, 2G] per-member batch range
    #                         [b0, b1) interleaved
    mxt_tab: jnp.ndarray    # i32[n_inst, 2G, nbz] per-(member, batch) max
    #                         window len (rows 2m, clamped >=1) / max
    #                         center count (rows 2m+1, unclamped: 0 lets
    #                         the kernel skip the batch)
    diag: dict


class LanesBuf(NamedTuple):
    """Prebuilt kernel input slab (see BlockEngine.make_lanes)."""
    arr: jnp.ndarray   # f32[f_pad, n + span + 128]
    names: tuple       # sorted traversal field names (rows 4..4+len)
    n: int


class BlockEngine:
    # metric keys of BlockCtx.diag (sharded runs need the structure static)
    diag_keys = ("max_span_len", "max_window_len", "max_batch_centers",
                 "max_cell_occupancy_engine", "max_colgrp_len",
                 "span_overflow", "window_overflow", "group_overflow",
                 "group_compact_overflow", "num_occupied_groups")
    # traverse() accepts an `epilogue` transform applied in-kernel to the
    # finished per-center pair sums before writeback (see traverse docs)
    supports_epilogue = True
    # traverse() accepts a LanesBuf in place of the fields dict; solver
    # Jacobi loops reuse one buffer across iterations (see make_lanes)
    supports_lanes = True

    def __init__(self, params, interpret=False):
        assert params.dim == 3, "Block engine is 3D; 2D uses GatherEngine"
        self.params = params
        self.interpret = interpret
        nx, ny, nz = params.grid_num
        self.nx, self.ny, self.nz = nx, ny, nz
        # Bx x By grid rows per instance (round 4: parametric, possibly
        # asymmetric block size).  Bigger blocks amortize the per-instance
        # fixed cost (DMA chains, transposes, epilogue) over more
        # particles and cut the window count per cell:
        # (Bx+2)(By+2)/(Bx*By).  Evolved dragon: 2x2 -> 2394 instances,
        # 172K window assemblies; 4x4 -> 608 / 109K.  The math-padding
        # trade is ONE-SIDED: each center's candidate half-tile is
        # 3*(Bx+2)*WC lanes — independent of By — so growing By alone
        # (asymmetric blocks) wins instance amortization and 3-vs-4
        # windows/cell WITHOUT widening the pair-math tiles that made
        # square B=4 lose (j105: 53-59 vs 42.3 ms/step).
        self.b = int(getattr(params, "blocks_rows", 0) or 2)
        self.by = int(getattr(params, "blocks_rows_y", 0) or self.b)
        B = self.b
        self.nw = (B + 2) * (self.by + 2)
        self.nbx = -(-nx // B)
        self.nby = -(-ny // self.by)
        self.n_groups = self.nbx * self.nby
        self.z = int(getattr(params, "blocks_z_batch", 0) or 2)
        self.nbz = -(-nz // self.z)
        self.nbz8 = -(-self.nbz // 8) * 8   # countdown-plane DMA sublane pad
        # G iy-adjacent groups per kernel instance (round 5): instance
        # (a, bi) owns groups (a, bi*G .. bi*G+G-1).  Same ix range means
        # each neighbor column's G member spans are ADJACENT rid ranges
        # (iy-minor sorted order within an ix row) — their union is one
        # contiguous HBM slice, shipped as ONE span DMA per column.
        self.gi = int(getattr(params, "blocks_groups_per_inst", 0) or 1)
        self.niy = -(-self.nby // self.gi)
        self.n_inst = self.nbx * self.niy
        # instance-compaction capacity: kernel grid size (0 = off —
        # every instance gets a grid slot, compaction is a no-op)
        gcap = int(getattr(params, "blocks_groups_cap", 0) or 0)
        self.gcap = min(gcap, self.n_inst) if gcap else self.n_inst
        self.wc = int(getattr(params, "blocks_window_cap", 0) or 32)
        self.sl = -(-(self.wc + 128) // 128) * 128   # aligned roll slab
        self.span = int(getattr(params, "blocks_span_cap", 0) or 2048)
        self.half = int(getattr(params, "blocks_col_cap", 0) or 2048)
        self.reduce = getattr(params, "blocks_reduce", "sum") or "sum"
        assert self.reduce in ("sum", "dot", "decomp", "ones"), self.reduce
        # chunked span DMA (round 4, OPT-IN, measured negative): the span
        # scratch stays statically SPAN-sized, but each (group, column)
        # ships only ceil(actual_len/chunk) chunks — j222 measured
        # cap-sized slabs shipping 2.2x (dragon) / 5.1x (DFSPH caps) the
        # occupied bytes.  Device A/B (j224/j225): dragon NEUTRAL, DFSPH
        # 1.5x SLOWER — the floor is descriptor/issue bound and the
        # per-chunk fori_loop adds scalar-pipe work.  Default 0 = off.
        # Lanes past the shipped length hold stale/uninitialized VMEM;
        # every consumer masks them with SELECTS (countdown validity row,
        # iota<cnt center masks, masked-rvec products, writeback row
        # counts), which do not propagate NaNs — except the "dot"/
        # "decomp" reduce modes, whose dot_general contracts the raw
        # candidate tile: those force the full-slab path.
        self.dma_chunk = int(getattr(params, "blocks_dma_chunk", 0) or 0)
        assert self.dma_chunk % 128 == 0, self.dma_chunk
        self.chunked = (0 < self.dma_chunk < self.span
                        and self.reduce in ("sum", "ones"))
        self.reduce_prec = getattr(params, "blocks_reduce_prec",
                                   "highest") or "highest"
        self.tile = getattr(params, "blocks_tile", "half") or "half"
        assert self.tile in ("half", "quarter"), self.tile
        # inner-loop scheduler (round 5): "sheet_outer" = rounds-3/4
        # structure (candidate sheet assembled once, center sheets
        # re-swept per window sheet); "ctr_outer" = macro-assembled
        # sheets with center sheets OUTER and per-piece register
        # accumulators (reduction trees / center assembly / out_scr RMW
        # once per center sheet instead of once per window sheet).
        self.sched = getattr(params, "blocks_sched",
                             "ctr_outer") or "ctr_outer"
        assert self.sched in ("sheet_outer", "ctr_outer"), self.sched
        self.sheet_group = int(getattr(params, "blocks_sheet_group", 0)
                               or 4)
        if self.sched == "ctr_outer" and (self.reduce != "sum"
                                          or self.chunked):
            # the MXU reduce modes contract against the per-sheet
            # candidate tile, and the chunked span DMA is only
            # equivalence-tested under the per-sheet validity-row
            # masking — both keep the sheet-outer structure
            self.sched = "sheet_outer"
        self.h2 = params.support_radius * params.support_radius

    # ------------------------------------------------------------------
    def prepare(self, x, cell_starts):
        """Window/span/center tables for BxBy blocks — structured XLA only."""
        nx, ny, nz = self.nx, self.ny, self.nz
        nbx, nby, z, nbz = self.nbx, self.nby, self.z, self.nbz
        B, BY = self.b, self.by
        c = nx * ny * nz
        big = jnp.int32(2 ** 30)

        s = cell_starts[:c].reshape(nx, ny, nz)
        row_end = cell_starts[nz:c + 1:nz].reshape(nx, ny)
        s_full = jnp.concatenate([s, row_end[..., None]], axis=2)

        # pad the row grid so (B*a+ci, BY*b+ri) for ci in [-1, B],
        # ri in [-1, BY] is a plain strided slice; padded rows are empty
        px = B * nbx - nx + 2    # left pad 1, right pad to multiple + 1
        py = BY * nby - ny + 2
        sp = jnp.pad(s_full, ((1, px), (1, py), (0, 0)))
        valid = jnp.pad(jnp.ones((nx, ny), bool), ((1, px), (1, py)))

        lo_cols = [max(t * z - 1, 0) for t in range(nbz)]
        hi_cols = [min(t * z + z + 1, nz) for t in range(nbz)]
        ctr_cols = [min(t * z, nz) for t in range(nbz + 1)]

        win_rows = []          # per window k: (nbx, nby, 2*nbz)
        span_lo = [None] * (B + 2)
        span_hi = [None] * (B + 2)
        span_any = [None] * (B + 2)
        zlo_all, zhi_all = None, None
        # per-row occupied z range (for batch-loop bounds)
        cnts = sp[:, :, 1:] - sp[:, :, :-1]          # (nx+.., ny+.., nz)
        occ = cnts > 0
        zidx = jnp.arange(nz, dtype=jnp.int32)
        row_zlo = jnp.min(jnp.where(occ, zidx, nz), axis=2)
        row_zhi = jnp.max(jnp.where(occ, zidx, -1), axis=2)

        # window order k = (ri+1)*(B+2) + (ci+1): iy-major, so the
        # 3*(B+2) windows relevant to own iy-row j (ri in {j-1, j, j+1},
        # every ci) are one contiguous slice of the candidate tile.  The
        # out-of-range ci in each ri-group are geometrically dead for
        # part of the centers and are excluded by the d2 < h^2 mask
        # (cell size == support radius, state.py grid_size, so a
        # 2-column gap implies d >= h).
        for ri in range(-1, BY + 1):
            for ci in range(-1, B + 1):
                w = sp[1 + ci::B, 1 + ri::BY][:nbx, :nby]    # (nbx,nby,nz+1)
                ok = valid[1 + ci::B, 1 + ri::BY][:nbx, :nby]
                wlo = jnp.where(ok[..., None], w[:, :, lo_cols], 0)
                whi = jnp.where(ok[..., None], w[:, :, hi_cols], 0)
                win_rows.append(jnp.stack([wlo, whi], axis=3)
                                .reshape(nbx, nby, 2 * nbz))
                d = ci + 1
                lo_k = jnp.where(ok, w[:, :, 0], big)
                hi_k = jnp.where(ok, w[:, :, nz], 0)
                span_lo[d] = lo_k if span_lo[d] is None \
                    else jnp.minimum(span_lo[d], lo_k)
                span_hi[d] = hi_k if span_hi[d] is None \
                    else jnp.maximum(span_hi[d], hi_k)
                span_any[d] = ok if span_any[d] is None \
                    else (span_any[d] | ok)
                if 0 <= ci < B and 0 <= ri < BY:
                    # batch-loop bounds from OWN rows only: batches where
                    # only neighbors are occupied hold no centers and are
                    # skipped anyway (mxt row 1)
                    zl = jnp.where(
                        ok, row_zlo[1 + ci::B, 1 + ri::BY][:nbx, :nby], nz)
                    zh = jnp.where(
                        ok, row_zhi[1 + ci::B, 1 + ri::BY][:nbx, :nby], -1)
                    zlo_all = zl if zlo_all is None \
                        else jnp.minimum(zlo_all, zl)
                    zhi_all = zh if zhi_all is None \
                        else jnp.maximum(zhi_all, zh)

        win_tab = jnp.stack(win_rows, axis=2).astype(jnp.int32) \
            .reshape(self.n_groups, self.nw, 2 * nbz)
        len_tab = (win_tab[:, :, 1::2] - win_tab[:, :, 0::2]) \
            .astype(jnp.int32)

        # center rows (own BxBY): iy-major order — row r has ix column
        # c = r % B, iy row j = r // B, matching the half-tile split in
        # the kernel (centers with iy=j pair against the contiguous
        # ri in {j-1, j, j+1} window slice)
        ctr_rows = []
        col_rows = []
        for ri2 in range(BY):
            for ci2 in range(B):
                w = sp[1 + ci2::B, 1 + ri2::BY][:nbx, :nby]
                ok = valid[1 + ci2::B, 1 + ri2::BY][:nbx, :nby]
                ct = jnp.where(ok[..., None], w[:, :, ctr_cols], 0)
                ctr_rows.append(ct)
        for ci2 in range(B):
            rows_se = []
            for ri2 in range(BY):
                w = sp[1 + ci2::B, 1 + ri2::BY][:nbx, :nby]
                ok = valid[1 + ci2::B, 1 + ri2::BY][:nbx, :nby]
                rows_se.append((jnp.where(ok, w[:, :, 0], 0),
                                jnp.where(ok, w[:, :, nz], 0)))
            # column range [lo, hi): iy0 row start .. iy0+BY-1 row end
            # (the BY rows are rid-adjacent; only TRAILING rows can be
            # invalid, so lo = row0 start and hi = max of valid ends)
            lo = rows_se[0][0]
            hi = rows_se[0][1]
            for ri2 in range(1, BY):
                hi = jnp.maximum(hi, rows_se[ri2][1])
            col_rows.append(jnp.stack([lo, hi], axis=2))
        ctr_tab = jnp.stack(ctr_rows, axis=2).astype(jnp.int32) \
            .reshape(self.n_groups, B * BY, nbz + 1)
        col_tab = jnp.stack(col_rows, axis=2).astype(jnp.int32) \
            .reshape(self.n_groups, B, 2)

        b0 = jnp.minimum(zlo_all // z, nbz).astype(jnp.int32)
        b1 = jnp.minimum((zhi_all // z) + 1, nbz).astype(jnp.int32)
        b1 = jnp.maximum(b1, b0)
        zr_g = jnp.stack([b0, b1], axis=2).astype(jnp.int32) \
            .reshape(self.n_groups, 2)

        # group-level diagnostics (window/batch granularity is unchanged
        # by instance aggregation)
        win_len = win_tab[:, :, 1::2] - win_tab[:, :, 0::2]
        batch_c = ctr_tab[:, :, 1:] - ctr_tab[:, :, :-1]
        cell_cnt = cell_starts[1:c + 1] - cell_starts[:c]

        # per-batch max window length (clamped >= 1: sheet-loop bound) and
        # max center count (unclamped: 0 -> the kernel skips the batch) —
        # replaces 20 SMEM scalar reads + maxes per (group, batch) in-kernel
        mxt_tab = jnp.stack(
            [jnp.maximum(jnp.max(win_len, axis=1), 1),
             jnp.max(batch_c, axis=1)], axis=1).astype(jnp.int32)

        # ---- instance aggregation (round 5) ----
        # Instance (a, bi) owns the G member groups (a, bi*G .. bi*G+G-1):
        # same ix range, consecutive iy blocks.  Member m's neighbor
        # column d covers iy rows [bi*G*BY + m*BY - 1, ... + BY], so the
        # G member spans of one column are overlapping ADJACENT rid
        # ranges — the union [min lo, max hi] is contiguous in the
        # sorted particle array and ships as ONE DMA.  The static member
        # map lets every per-group table be re-laid as (n_inst, G*rows,
        # cols) with plain gathers; members past nby are zero rows
        # (no centers, no windows).
        G, niy, n_inst = self.gi, self.niy, self.n_inst

        def gmem(tab, fill=0):
            """(n_groups, ...) -> (n_inst, G, ...) member re-lay.  The
            member map is a STATIC blocked reindex (instance (a, bi) owns
            groups a*nby + bi*G + m), so this is a pad + reshape — never
            a gather (XLA gathers measured ~ms-scale per table at dragon
            grid sizes; pads/reshapes are layout-only)."""
            t = tab.reshape((nbx, nby) + tab.shape[1:])
            if niy * G > nby:
                pw = ((0, 0), (0, niy * G - nby)) + \
                    ((0, 0),) * (tab.ndim - 1)
                t = jnp.pad(t, pw, constant_values=fill)
            return t.reshape((n_inst, G) + tab.shape[1:])

        # instance union spans per neighbor column (lo sentinel big on
        # raw values so empty member columns drop out of the min)
        inst_lo, inst_hi = [], []
        for d in range(B + 2):
            lo_m = gmem(span_lo[d].reshape(self.n_groups), fill=big)
            hi_m = gmem(span_hi[d].reshape(self.n_groups), fill=0)
            any_m = gmem(span_any[d].reshape(self.n_groups)
                         .astype(jnp.int32), fill=0) > 0
            any_i = jnp.any(any_m, axis=1)
            inst_lo.append(jnp.where(any_i, jnp.min(lo_m, axis=1), 0))
            inst_hi.append(jnp.where(any_i, jnp.max(hi_m, axis=1), 0))
        span_tab = jnp.stack(
            [jnp.stack([inst_lo[d], inst_hi[d]], axis=1)
             for d in range(B + 2)], axis=1).astype(jnp.int32)

        # member window tables: lengths ride through; start lanes are
        # re-based onto the instance-column union slab (scalar-pipe
        # strength reduction: everything movable to prepare() moves here)
        len_i = gmem(len_tab).reshape(n_inst, G * self.nw, nbz)
        wlo_g = jnp.stack(win_rows, axis=2)[..., 0::2] \
            .reshape(self.n_groups, self.nw, nbz).astype(jnp.int32)
        base_i = jnp.stack(
            [(inst_lo[k % (B + 2)] // 128) * 128 for k in range(self.nw)],
            axis=1)                                      # (n_inst, NW)
        loc_i = jnp.clip(
            gmem(wlo_g) - base_i[:, None, :, None],
            0, self.span - self.sl) \
            .astype(jnp.int32).reshape(n_inst, G * self.nw, nbz)

        ctr_i = gmem(ctr_tab).reshape(n_inst, G * B * BY, nbz + 1)
        mxt_i = gmem(mxt_tab).reshape(n_inst, 2 * G, nbz)
        # 3D so the SMEM BlockSpec's trailing two dims equal the array's
        # (Mosaic requires leading-dim-only blocking for SMEM tables)
        zr_i = gmem(zr_g).reshape(n_inst, 1, 2 * G)

        # instance own columns: member 0 is always statically valid and
        # member ranges ascend with iy, so lo = member 0's lo and
        # hi = max over members
        colm = gmem(col_tab)                        # (n_inst, G, B, 2)
        col_lo_i = colm[:, 0, :, 0]
        col_hi_i = jnp.max(colm[:, :, :, 1], axis=1)
        col_i = jnp.stack([col_lo_i, col_hi_i], axis=2).astype(jnp.int32)

        # diagnostics (span/column at instance-union granularity)
        span_len = span_tab[:, :, 1] - span_tab[:, :, 0]
        colgrp_len = col_hi_i - col_lo_i
        diag = {
            "max_span_len": jnp.max(span_len),
            "max_window_len": jnp.max(win_len),
            "max_batch_centers": jnp.max(batch_c),
            "max_cell_occupancy_engine": jnp.max(cell_cnt),
            "max_colgrp_len": jnp.max(colgrp_len),
            # span slabs + SL-lane aligned window reads must fit in SPAN
            "span_overflow": jnp.max(span_len) > self.span - self.sl - 128,
            # informational: sheets make overflow exact (a perf signal)
            "window_overflow": jnp.max(win_len) > self.wc,
            # binding: a column range beyond the out half is clamped
            "group_overflow": jnp.max(colgrp_len) > self.half,
        }

        # ---- instance compaction (round 4, at instance granularity) ----
        # Only ~30% of dragon's groups hold any own particles at t=0
        # (the fluid footprint covers a fraction of the domain's xy
        # plane); empty instances skip all compute via the grp_len guard
        # but still pay per-instance setup (grid sequencing, SMEM scalar
        # reads, branch checks) — the measured per-instance floor.  The
        # kernel reads everything through per-instance tables, so
        # shrinking the grid is pure table surgery: stable-sort occupied
        # instances first, gather every table by that order, truncate to
        # the static blocks_groups_cap.  Tail rows beyond the occupied
        # count are real (empty) instances — natural zero-work
        # sentinels.  An occupied instance beyond the cap means its
        # centers' output rows are never written at all (uninitialized
        # HBM, not just dropped pairs): fatal flag + NaN poison on the
        # returned columns (see traverse).
        occ_g = jnp.any(col_tab[:, :, 1] > col_tab[:, :, 0], axis=1)
        occ_i = jnp.any(gmem(occ_g.astype(jnp.int32)) > 0, axis=1)
        if self.gcap < self.n_inst:
            order = jnp.argsort(jnp.logical_not(occ_i),
                                stable=True).astype(jnp.int32)
            sel = order[:self.gcap]
            len_i = len_i[sel]
            loc_i = loc_i[sel]
            span_tab = span_tab[sel]
            ctr_i = ctr_i[sel]
            col_i = col_i[sel]
            zr_i = zr_i[sel]
            mxt_i = mxt_i[sel]
        n_occ = jnp.sum(occ_i.astype(jnp.int32))
        diag["group_compact_overflow"] = n_occ > self.gcap
        # informational: how tight the compaction cap is (cap sizing
        # aid; counts occupied INSTANCES — == groups when G == 1)
        diag["num_occupied_groups"] = n_occ

        # doubled tables: rows for instance i+1 let instance i prefetch
        # the next instance's span slabs while computing on its own (the
        # kernel double-buffers win_scr; the last instance prefetches
        # nothing).  Built AFTER compaction so "next" means the
        # compacted successor.
        def _nxt(tab):
            return jnp.concatenate(
                [tab[1:], jnp.zeros_like(tab[:1])], axis=0)

        # chunk counts for the chunked span DMA: ship ceil((hi-base)/CH)
        # chunks from each column's 128-aligned slab base (base slack
        # <= 127 lanes).  Computed after compaction so the doubled rows
        # below carry the compacted successor's counts for the prefetch.
        ch = self.dma_chunk if self.chunked else self.span
        s_lo, s_hi = span_tab[:, :, 0], span_tab[:, :, 1]
        nch = jnp.clip(-(-(s_hi - (s_lo // 128) * 128) // ch),
                       0, -(-self.span // ch)).astype(jnp.int32)
        span_tab = jnp.concatenate([span_tab, nch[:, :, None]], axis=2)

        span2 = jnp.concatenate([span_tab, _nxt(span_tab)], axis=1)
        col2 = jnp.concatenate([col_i, _nxt(col_i)], axis=1)

        # countdown-mask plane (see BlockCtx.cnt_plane).  The per-member
        # batch dim is padded to a multiple of 8: the per-instance DMA
        # slices the plane's middle dim whole, and Mosaic requires
        # tiled-memref slice shapes 8-aligned on the sublane dim (device
        # compile error at nbz=25; interpret mode does not check this).
        # Built from the compacted len table (plane rows ride the kernel
        # grid); all G members' planes ship in the ONE instance DMA.
        li = jnp.arange(self.wc, dtype=jnp.int32)
        nbz8 = -(-nbz // 8) * 8
        ncap = len_i.shape[0]
        cnt_plane = (jnp.transpose(
            len_i.reshape(ncap, G, self.nw, nbz), (0, 1, 3, 2))[..., None]
            - li).reshape(ncap, G, nbz, self.nw * self.wc)
        cnt_plane = jnp.pad(cnt_plane,
                            ((0, 0), (0, 0), (0, nbz8 - nbz), (0, 0))) \
            .reshape(ncap, G * nbz8, self.nw * self.wc)

        return BlockCtx(len_tab=len_i, loc_tab=loc_i,
                        cnt_plane=cnt_plane,
                        span_tab=span2, ctr_tab=ctr_i,
                        col_tab=col2, zrange=zr_i, mxt_tab=mxt_i,
                        diag=diag)

    # ------------------------------------------------------------------
    def make_lanes(self, x, fields: Dict[str, jnp.ndarray]) -> LanesBuf:
        """Build the kernel's HBM lanes slab once, for reuse across
        traversals with the same field set (solver Jacobi loops: DFSPH
        runs ~2 traversals x ~10 iterations per substep, and rebuilding
        the full (f_pad, n) stack+pad per traversal is pure XLA-glue
        cost).  Rows that change between iterations are refreshed with
        ``update_lanes`` — one row-sized dynamic_update_slice per changed
        field.  Pass the returned LanesBuf to ``traverse`` in place of
        the fields dict."""
        n = x.shape[0]
        field_names = sorted(fields.keys())
        gidx = jnp.arange(n, dtype=jnp.float32)
        cols = [x[:, 0], x[:, 1], x[:, 2], gidx]
        for fn_ in field_names:
            cols.append(fields[fn_].astype(jnp.float32))
        f_pad = max(8, -(-len(cols) // 8) * 8)
        while len(cols) < f_pad:
            cols.append(jnp.zeros((n,), jnp.float32))
        lanes = jnp.stack(cols, axis=0)
        lanes = jnp.pad(lanes, ((0, 0), (0, self.span + 128)))
        lanes = lanes.at[3, n:].set(-1.0)
        return LanesBuf(arr=lanes, names=tuple(field_names), n=n)

    def update_lanes(self, buf: LanesBuf,
                     updates: Dict[str, jnp.ndarray]) -> LanesBuf:
        """Refresh field rows of a prebuilt LanesBuf in place (the tail
        past n stays zero; candidates there are masked by the gidx row)."""
        arr = buf.arr
        for name, col in updates.items():
            row = 4 + buf.names.index(name)
            arr = jax.lax.dynamic_update_slice(
                arr, col.astype(jnp.float32)[None, :], (row, 0))
        return buf._replace(arr=arr)

    # ------------------------------------------------------------------
    def traverse(self, ctx: BlockCtx, x, fields,
                 term_fn, out_specs: Dict[str, str],
                 mode: str = "legacy", pair_dots=(), epilogue=None):
        """Pair traversal; with ``epilogue`` the per-center pair sums are
        transformed IN-KERNEL before writeback and the transformed values
        are returned instead.

        epilogue = (epi_fn, epi_specs, scalars):
          - ``epi_fn(fi, sums, sc) -> {name: (1, R) array or ncomp-tuple
            of (1, R) arrays}`` runs on LANE-MAJOR chunks of finished
            centers.  ``fi`` maps every traversal field name (plus
            x0/x1/x2/gidx) to its (1, R) center row, ``sums`` maps each
            out_specs name to an ncomp-tuple of (1, R) pair-sum rows,
            ``sc`` is a list of 16 traced scalars from ``scalars``.
            (Row-major since round 4: the old (R, 1) column layout ran
            every transform op at 1/128 VPU lane utilization.)
          - ``epi_specs``: {name: ncomp} for the returned outputs
            (total width <= 64).
          - ``scalars``: f32 vector (<= 16) of traced per-step values
            (e.g. dt) — everything else should be closed over as Python
            constants.

        Purpose: elementwise consumers of traversal outputs (EOS, advect,
        boundary clamp) measured ~10 ms/step at dragon scale as separate
        XLA ops regardless of their flop count (docs/DESIGN.md round 3,
        j48/j50/j73); folding them into the kernel's writeback path
        removes them from the XLA program entirely.
        """
        if isinstance(fields, LanesBuf):
            buf = fields
            n = buf.n
            field_names = list(buf.names)
            lanes = buf.arr
        else:
            buf = self.make_lanes(x, fields)
            n, field_names, lanes = buf.n, list(buf.names), buf.arr
        name_to_idx = {"x0": 0, "x1": 1, "x2": 2, "gidx": 3}
        for i, fn_ in enumerate(field_names):
            name_to_idx[fn_] = 4 + i
        f_pad = max(8, -(-(4 + len(field_names)) // 8) * 8)

        out_names = sorted(out_specs.keys())
        out_cols = []
        for o in out_names:
            out_cols.append((o, 3 if out_specs[o] in ("vec", "radial") else 1))

        sc_arr = jnp.zeros((1, 16), jnp.float32)
        epi_fn, epi_cols = None, None
        if epilogue is not None:
            epi_fn, epi_specs, scalars = epilogue
            epi_cols = [(o, int(epi_specs[o])) for o in sorted(epi_specs)]
            assert sum(nc for _, nc in out_cols) <= 64
            assert sum(nc for _, nc in epi_cols) <= 64
            scalars = jnp.asarray(scalars, jnp.float32).reshape(-1)
            assert scalars.shape[0] <= 15, "scalar 15 is the poison flag"
            sc_arr = sc_arr.at[0, :scalars.shape[0]].set(scalars)
        # compaction-overflow poison flag rides scalar slot 15: when
        # occupied instances exceed the cap, a TAIL grid instance NaNs
        # the whole output buffer (see _kernel) so direct step() callers
        # fail loudly on finite checks instead of consuming the dropped
        # instances' uninitialized rows.  In-kernel because the obvious
        # XLA-side per-column multiply measured 4.3 ms/step at dragon
        # scale (j235) — another instance of the "every standalone
        # elementwise stage costs real time" law; the tail instance
        # costs one grid slot and does nothing unless the flag is set.
        tail_poison = POISON and self.gcap < self.n_inst
        if tail_poison:
            sc_arr = sc_arr.at[0, 15].set(
                ctx.diag["group_compact_overflow"].astype(jnp.float32))

        kernel = functools.partial(
            self._kernel, term_fn=term_fn, name_to_idx=name_to_idx,
            out_cols=out_cols, f_pad=f_pad, mxu=(mode == "mxu"),
            pair_dots=tuple(pair_dots), epi_fn=epi_fn, epi_cols=epi_cols,
            n_out=n, tail_poison=tail_poison)

        nbz = self.nbz
        B, BY, NW, G = self.b, self.by, self.nw, self.gi
        gc1 = self.gcap - 1

        def imap(i):
            # clamp for the poison tail instance (reads are never used
            # there, but the pipeline still fetches a block)
            return (jnp.minimum(i, gc1), 0, 0)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
            grid=(self.gcap + (1 if tail_poison else 0),),
            in_specs=[
                pl.BlockSpec((1, G * NW, nbz), imap,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, G * NW, nbz), imap,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2 * (B + 2), 3), imap,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, G * B * BY, nbz + 1), imap,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2 * B, 2), imap,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 2 * G), imap,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2 * G, nbz), imap,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 16), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),   # epilogue scalars
                pl.BlockSpec(memory_space=pl.ANY),   # countdown plane (HBM)
                pl.BlockSpec(memory_space=pl.ANY),   # lanes (HBM)
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, B + 2, f_pad, self.span),
                           jnp.float32),   # col spans, double-buffered
                # candidate sheets: sheet_outer holds ONE sheet (+ the
                # f32 validity row); ctr_outer holds a macro-group of
                # sheet_group sheets stacked on sublanes (validity is a
                # register-resident countdown compare instead)
                pltpu.VMEM(((self.sheet_group * f_pad, NW * self.wc)
                            if self.sched == "ctr_outer"
                            else (f_pad + 1, NW * self.wc)),
                           jnp.float32),  # cand
                pltpu.VMEM((2 * G * self.nbz8, NW * self.wc), jnp.int32),
                # countdown-mask rows, double-buffered like the spans
                pltpu.VMEM((B * (self.half + 128), f_pad),
                           jnp.float32),                          # centers
                pltpu.VMEM((B * (self.half + 64), 128), jnp.float32),  # out
                pltpu.SemaphoreType.DMA((2 * B + 3,)),
                # B+2 span cols + B writeback cols + countdown plane
            ],
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ctx.len_tab, ctx.loc_tab, ctx.span_tab, ctx.ctr_tab,
          ctx.col_tab, ctx.zrange, ctx.mxt_tab, sc_arr, ctx.cnt_plane,
          lanes)

        # with an epilogue the returned values live in lanes [64, 64+W)
        # (pair sums stay in [0, 64) so the in-place transform is
        # idempotent on the overlapping exact-tail chunk)
        outs = {}
        pos = 64 if epilogue is not None else 0
        for o, ncomp in (epi_cols if epilogue is not None else out_cols):
            if ncomp == 3:
                outs[o] = (out[:n, pos], out[:n, pos + 1], out[:n, pos + 2])
            else:
                outs[o] = out[:n, pos]
            pos += ncomp
        return outs

    # ------------------------------------------------------------------
    def _kernel(self, len_ref, loc_ref, span_ref, ctr_ref, col_ref,
                zr_ref, mxt_ref, sc_ref, plane_hbm, lanes_hbm, out_hbm,
                win_scr, cand_scr, mask_scr, ctr_scr, out_scr, sems, *,
                term_fn, name_to_idx, out_cols, f_pad, mxu=False,
                pair_dots=(), epi_fn=None, epi_cols=None, n_out=0,
                tail_poison=False):
        Z, nbz, WC, SL, SPAN, h2 = self.z, self.nbz, self.wc, self.sl, \
            self.span, self.h2
        B, BY, NW, G = self.b, self.by, self.nw, self.gi
        HALF_CTR = self.half + 128
        HALF_OUT = self.half + 64

        col_lo = [col_ref[0, c, 0] for c in range(B)]
        col_hi = [col_ref[0, c, 1] for c in range(B)]
        col_len = [col_hi[c] - col_lo[c] for c in range(B)]
        grp_len = sum(col_len[1:], col_len[0])
        nxt_len = sum((col_ref[0, B + c, 1] - col_ref[0, B + c, 0])
                      for c in range(B))

        i_g = pl.program_id(0)
        buf = jax.lax.rem(i_g, jnp.int32(2))
        nbuf = jnp.int32(1) - buf
        # with the tail-poison instance appended, every normal-work guard
        # also requires i_g < gcap (the tail reads instance gcap-1's
        # clamped tables, whose DMAs were consumed by gcap-1 itself —
        # re-running them would deadlock on the span semaphores)
        live = i_g < jnp.int32(self.gcap)
        if tail_poison:
            grp_len = jnp.where(live, grp_len, 0)
            nxt_len = jnp.where(live, nxt_len, 0)

            # the tail instance NaNs the WHOLE output buffer when the
            # compaction-overflow flag (scalar 15) is set: dropped
            # occupied instances mean unwritten output rows, and callers
            # must see NaN, not uninitialized HBM.  Pays only on actual
            # overflow, which is fatal-and-recovered anyway.
            @pl.when((i_g == jnp.int32(self.gcap)) & (sc_ref[0, 15] > 0.5))
            def _poison():
                out_scr[0:OUT_CHUNK, :] = jnp.full(
                    (OUT_CHUNK, 128), jnp.nan, jnp.float32)

                def body(k, _):
                    src = jnp.minimum(k * OUT_CHUNK,
                                      jnp.int32(max(n_out - OUT_CHUNK, 0)))
                    cp = pltpu.make_async_copy(
                        out_scr.at[pl.ds(0, min(OUT_CHUNK, n_out)), :],
                        out_hbm.at[pl.ds(src, min(OUT_CHUNK, n_out)), :],
                        sems.at[2 * B + 2])
                    cp.start()
                    cp.wait()
                    return 0

                jax.lax.fori_loop(0, pl.cdiv(n_out, OUT_CHUNK), body, 0)

        def span_base(row):
            lo = span_ref[0, row, 0]
            return pl.multiple_of((lo // 128) * 128, 128)

        bases = [span_base(c) for c in range(B + 2)]
        nbases = [span_base(B + 2 + c) for c in range(B + 2)]

        def span_copy(b, base, c):
            return pltpu.make_async_copy(
                lanes_hbm.at[:, pl.ds(base, SPAN)],
                win_scr.at[b, c], sems.at[c])

        CH = self.dma_chunk

        def span_io(b, base, row, c, wait):
            """Start (or wait) one column's span DMA chain.  Chunked mode
            ships ceil(len/CH) CH-lane chunks instead of the full SPAN
            slab (j222: 2.2-5.1x byte cut); the start side (prefetching
            instance g-1, doubled-table rows B+2+c) and the wait side
            (instance g, rows c) read the SAME table values, so the
            descriptor counts agree.  Lanes past the shipped length are
            stale scratch — every consumer masks them with selects."""
            if not self.chunked:
                cp = span_copy(b, base, c)
                (cp.wait if wait else cp.start)()
                return

            def body(i, _):
                off = jnp.minimum(i * CH, jnp.int32(SPAN - CH))
                off = pl.multiple_of(off, 128)
                cp = pltpu.make_async_copy(
                    lanes_hbm.at[:, pl.ds(base + off, CH)],
                    win_scr.at[b, c, :, pl.ds(off, CH)], sems.at[c])
                (cp.wait if wait else cp.start)()
                return 0

            jax.lax.fori_loop(0, span_ref[0, row, 2], body, 0)

        NBZ8 = self.nbz8
        GNBZ8 = G * NBZ8   # all G members' countdown planes, one DMA

        def plane_copy(b, g):
            return pltpu.make_async_copy(
                plane_hbm.at[g],
                mask_scr.at[pl.ds(b * GNBZ8, GNBZ8), :], sems.at[2 * B + 2])

        # cross-group double buffering: group g's 4 span DMAs are started
        # by instance g-1 (into buf g%2) while g-1 computes on buf (g-1)%2;
        # instance g only waits.  The 4 sems alternate start->wait->start
        # across instances, so start/wait guards must agree: both sides
        # test grp_len(g) > 0 (from the doubled col table).
        @pl.when((i_g == 0) & (grp_len > 0))
        def _seed():
            for c in (() if ABLATE == "nodma" else range(B + 2)):
                span_io(buf, bases[c], c, c, wait=False)
            if ABLATE != "nodma":
                plane_copy(buf, i_g).start()

        @pl.when(grp_len > 0)
        def _wait():
            for c in (() if ABLATE == "nodma" else range(B + 2)):
                span_io(buf, bases[c], c, c, wait=True)
            if ABLATE != "nodma":
                plane_copy(buf, i_g).wait()

        @pl.when((nxt_len > 0) & (i_g + 1 < self.gcap))
        def _prefetch():
            for c in (() if ABLATE == "nodma" else range(B + 2)):
                span_io(nbuf, nbases[c], B + 2 + c, c, wait=False)
            if ABLATE != "nodma":
                plane_copy(nbuf, jnp.minimum(
                    i_g + 1, jnp.int32(self.gcap - 1))).start()

        @pl.when(grp_len > 0)
        def _run():
            # ---- transpose each own column's particles to sublanes ----
            delta_c = []
            la_c = []
            for c in range(B):
                loc_g = col_lo[c] - bases[c + 1]
                la_g = jnp.minimum((loc_g // 128) * 128,
                                   jnp.int32(SPAN - 256))
                la_g = pl.multiple_of(la_g, 128)
                delta_g = loc_g - la_g
                delta_c.append(delta_g)
                la_c.append(la_g)

                def t_body(sb, _, c=c, la_g=la_g):
                    off = jnp.minimum(la_g + sb * 256, jnp.int32(SPAN - 256))
                    off = pl.multiple_of(off, 128)
                    dst = jnp.minimum(c * HALF_CTR + sb * 256,
                                      jnp.int32(B * HALF_CTR - 256))
                    ctr_scr[pl.ds(dst, 256), :] = jnp.transpose(
                        win_scr[buf, c + 1, :, pl.ds(off, 256)])
                    return 0

                if ABLATE not in ("notr", "dmaonly"):
                    jax.lax.fori_loop(
                        0, pl.cdiv(delta_g + col_len[c], 256), t_body, 0)

            # member loop: each of the G iy-adjacent groups runs its own
            # batch/sheet/math sweep against the SHARED union span slabs
            # (the pair-math tile geometry is exactly the G=1 kernel's);
            # only the per-member tables and countdown-plane rows differ.
            # Python-unrolled (static m): every table row index stays a
            # compile-time constant and G=1 compiles to exactly the
            # round-4 structure.
            def member_body(m):
                b0 = zr_ref[0, 0, 2 * m]
                b1 = zr_ref[0, 0, 2 * m + 1]

                def batch_body(t, _):
                    # widest window and center count of this batch decide
                    # the sheet loops; overflow is processed exactly,
                    # sheet by sheet (no silent pair drops).  Both maxima
                    # are precomputed per batch in prepare() (mxt_tab); a
                    # batch with zero own centers is skipped whole — its
                    # masked stores were no-ops anyway.
                    mx = mxt_ref[0, 2 * m, t]
                    mxc_real = mxt_ref[0, 2 * m + 1, t]
                    mxc = jnp.maximum(mxc_real, 1)

                    @pl.when(mxc_real > 0)
                    def _batch():
                        ctr_off = []
                        ctr_cnt = []
                        for r in range(B * BY):
                            cs = ctr_ref[0, m * B * BY + r, t]
                            ce = ctr_ref[0, m * B * BY + r, t + 1]
                            ctr_off.append(cs)
                            ctr_cnt.append(ce - cs)

                        sheet_loop(m, t, mx, mxc, ctr_off, ctr_cnt)
                    return 0

                jax.lax.fori_loop(b0, b1, batch_body, 0)

            # ---- shared tile helpers (both schedulers) ----
            def build_cen(ctr_off, ctr_cnt, cs_i):
                """Assemble the center tile (B*BY*CSL, f_pad)."""
                cen_rows = []
                for r in range(B * BY):
                    c = r % B      # iy-major row order
                    off = (delta_c[c] + ctr_off[r] + cs_i * CSL
                           - col_lo[c] + c * HALF_CTR)
                    off = jnp.clip(off, c * HALF_CTR,
                                   jnp.int32((c + 1) * HALF_CTR - CSL))
                    seg = ctr_scr[pl.ds(off, CSL), :]
                    cnt = ctr_cnt[r] - cs_i * CSL
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (CSL, f_pad), 0)
                    # lane-select, not .at[].set: scatter has no
                    # Mosaic lowering inside the kernel
                    li = jax.lax.broadcasted_iota(
                        jnp.int32, (CSL, f_pad), 1)
                    inv = jnp.where(
                        li == 0, jnp.float32(1e9),
                        jnp.where(li == 3, jnp.float32(-1.0), 0.0))
                    seg = jnp.where(iota < cnt, seg, inv)
                    cen_rows.append(seg)
                return jnp.concatenate(cen_rows, axis=0)

            # tile pair-math geometry.  "half" (default): own iy-row j
            # centers (cen rows 2j*CSL..) only see the 12 windows with
            # ri in {j-1, j, j+1} — one contiguous 12*WC-lane slice in
            # iy-major window order.  Two (2*CSL, 12*WC) tiles instead
            # of one (4*CSL, 16*WC): 25% less padded pair math for the
            # same pairs.  "quarter" (round 4): each own row (c, j)
            # additionally drops its dead ci column — its 9 true windows
            # are 3 contiguous 3*WC chunks (one per ri group, offset
            # c*WC in ci-minor order), concatenated into a (CSL, 9*WC)
            # tile: another 25% less padded math for 3 static slices +
            # a lane concat per quarter.  Geometrically dead lanes that
            # remain are excluded by d2 < h2 (cell size == h exactly,
            # state.py grid_size).  Each tile carries a `take` lane
            # slicer so both the candidate rows and (ctr_outer) the
            # validity row can be cut the same way.
            def tile_split(cen):
                tiles = []
                if self.tile == "quarter":
                    for r in range(B * BY):
                        c_q, j_q = r % B, r // B

                        def take(arr, c_q=c_q, j_q=j_q):
                            return jnp.concatenate(
                                [arr[:, ((j_q + g) * (B + 2) + c_q) * WC:
                                     ((j_q + g) * (B + 2) + c_q) * WC
                                     + 3 * WC] for g in range(3)],
                                axis=1)

                        tiles.append(
                            (cen[r * CSL:(r + 1) * CSL, :], take, CSL))
                else:
                    for hj in range(BY):
                        lo_l = hj * (B + 2) * WC

                        def take(arr, lo_l=lo_l):
                            return arr[:, lo_l:lo_l + 3 * (B + 2) * WC]

                        tiles.append(
                            (cen[hj * B * CSL:(hj + 1) * B * CSL, :],
                             take, B * CSL))
                return tiles

            def pair_rows(cen_h, cq_t, vld):
                """Masked per-pair product rows for one tile.

                ``vld`` is the (1, TW) window-validity row (lane <
                window length).  Returns (rows_l, post, fi): each
                rows_l[i] is an (RH, TW) f32 row whose lane sum is one
                output piece, in out_cols order (radial/vec: 3 pieces);
                ``post`` records the piece kinds for the MXU reduce
                modes; ``fi`` is the center field dict (the decomp
                rebuild reads it)."""
                fi = {k_: cen_h[:, v:v + 1]
                      for k_, v in name_to_idx.items()}
                fj = {k_: cq_t[v:v + 1, :]
                      for k_, v in name_to_idx.items()}
                rvec = (fi["x0"] - fj["x0"],
                        fi["x1"] - fj["x1"],
                        fi["x2"] - fj["x2"])
                d2 = (rvec[0] * rvec[0] + rvec[1] * rvec[1]
                      + rvec[2] * rvec[2])
                mask = (vld & (d2 < h2)
                        & (fi["gidx"] != fj["gidx"]))
                # masked rvec for the radial c*rvec products: a masked
                # coefficient times a RAW rvec still propagates
                # NaN/garbage from lanes past the chunked span DMA's
                # shipped length (0*NaN = NaN); select here, once per
                # tile, instead of per output row
                rvm = tuple(jnp.where(mask, rv, 0.0) for rv in rvec)

                if mxu:
                    # one rsqrt replaces sqrt + the term fns' divide
                    # (rn = d2*inv, <= 2 ulp; GatherEngine ships the
                    # same "_inv")
                    inv = jax.lax.rsqrt(
                        jnp.maximum(d2, jnp.float32(1e-38)))
                    rn = d2 * inv
                    dots = {"_inv": inv}
                    for u in pair_dots:
                        du = tuple(fi[f"{u}{dd}"] - fj[f"{u}{dd}"]
                                   for dd in range(3))
                        dots[u] = (du[0] * rvec[0] + du[1] * rvec[1]
                                   + du[2] * rvec[2])
                    if MATH_DTYPE is not None:
                        md = MATH_DTYPE
                        contribs = term_fn(
                            {k_: v_.astype(md) for k_, v_ in fi.items()},
                            {k_: v_.astype(md) for k_, v_ in fj.items()},
                            d2.astype(md), rn.astype(md),
                            {k_: v_.astype(md)
                             for k_, v_ in dots.items()})
                        contribs = {
                            k_: (tuple(c.astype(jnp.float32) for c in v_)
                                 if isinstance(v_, tuple)
                                 else v_.astype(jnp.float32))
                            for k_, v_ in contribs.items()}
                    else:
                        contribs = term_fn(fi, fj, d2, rn, dots)
                else:
                    rn = jnp.sqrt(d2)
                    contribs = term_fn(fi, fj, rvec, rn)

                rows_l, post = [], []
                for o, ncomp in out_cols:
                    cc = contribs[o]
                    if (ncomp == 3 and mxu
                            and self.reduce == "decomp"):
                        cm = jnp.where(
                            mask, jnp.broadcast_to(cc, mask.shape), 0.0)
                        rows_l.append(cm)
                        post.append((o, "decomp"))
                    elif ncomp == 3 and mxu:
                        cm = jnp.where(
                            mask, jnp.broadcast_to(cc, mask.shape), 0.0)
                        for rv in rvm:
                            rows_l.append(cm * rv)
                        post.append((o, "sum3"))
                    else:
                        comps = cc if ncomp == 3 else (cc,)
                        for comp in comps:
                            rows_l.append(jnp.where(
                                mask, jnp.broadcast_to(comp, mask.shape),
                                0.0))
                        post.append((o, "sum%d" % len(comps)))
                return rows_l, post, fi

            def store_res(res, ctr_off, ctr_cnt, cs_i, first):
                """Accumulate one center sheet's (B*BY*CSL, 128) result
                block into out_scr.  MASKED-exact per-row copies: only
                rows holding this row-batch's real centers are touched
                (a plain 16-row copy would overshoot a row's final
                batch into the *other* own row's already-written early
                rows).  ``first`` selects init-vs-accumulate."""
                pad = 128 - res.shape[1]
                if pad:
                    res = jnp.concatenate(
                        [res, jnp.zeros((B * BY * CSL, pad), jnp.float32)],
                        axis=1)
                for r in range(B * BY):
                    c = r % B      # iy-major row order
                    off = (ctr_off[r] + cs_i * CSL - col_lo[c]
                           + c * HALF_OUT)
                    off = jnp.clip(off, c * HALF_OUT,
                                   jnp.int32((c + 1) * HALF_OUT - CSL))
                    cnt = ctr_cnt[r] - cs_i * CSL
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (CSL, 128), 0)
                    rr = res[r * CSL:(r + 1) * CSL, :]
                    cur = out_scr[pl.ds(off, CSL), :]
                    val = jnp.where(first, rr, cur + rr)
                    out_scr[pl.ds(off, CSL), :] = jnp.where(
                        iota < cnt, val, cur)

            def asm_window(m, t, sho, k):
                """Assemble window k's sheet at offset ``sho`` -> the
                (f_pad, WC) segment.  Scalar-pipe minimal: start lanes
                are table-stored span-relative + pre-clipped (loc_tab);
                per window-sheet only the sheet shift, alignment AND,
                and roll amount remain on the scalar unit."""
                cspan = k % (B + 2)   # window order is iy-major
                loc = jnp.minimum(loc_ref[0, m * NW + k, t] + sho,
                                  jnp.int32(SPAN - SL))
                la = pl.multiple_of((loc // 128) * 128, 128)
                slab = win_scr[buf, cspan, :, pl.ds(la, SL)]
                if ABLATE != "norolls":
                    slab = pltpu.roll(slab, SL - (loc - la), axis=1)
                return slab[:, :WC]

            def sheet_loop(m, t, mx, mxc, ctr_off, ctr_cnt):
                """Window-sheet-outer scheduler (rounds 3-4 structure):
                assemble one candidate sheet, sweep every center sheet
                against it, accumulate across sheets through out_scr."""
                def sheet_body(sh, _):
                    sho = sh * WC
                    # whole-sheet validity row: ONE vector compare against
                    # the DMA'd countdown plane (row > sho <=> lane-iota <
                    # len - sho) instead of NW scalar-broadcast compares
                    if ABLATE != "noasm":
                        mrow = mask_scr[buf * GNBZ8 + m * NBZ8 + t, :]
                        cand_scr[f_pad:f_pad + 1, :] = \
                            (mrow > sho).astype(jnp.float32)[None, :]
                    for k in (() if ABLATE == "noasm" else range(NW)):
                        cand_scr[0:f_pad, k * WC:(k + 1) * WC] = \
                            asm_window(m, t, sho, k)

                    cand = cand_scr[...]

                    def ctr_sheet(cs_i, _):
                        cen = build_cen(ctr_off, ctr_cnt, cs_i)
                        half_res = []
                        for cen_h, take, RH in tile_split(cen):
                            cq_t = take(cand)
                            vld = cq_t[f_pad:f_pad + 1, :] > 0.5
                            rows_l, post, fi = pair_rows(cen_h, cq_t, vld)
                            if self.reduce == "sum":
                                pieces = [jnp.sum(r_, axis=1,
                                                  keepdims=True)
                                          for r_ in rows_l]
                            else:
                                # MXU lane reduction (round 4): stack every
                                # output's masked coefficient rows into one
                                # (R, 12*WC) tile and contract the lane axis
                                # against the candidate tile itself in a
                                # single dot_general (j84z/j85z microbench:
                                # 0.56-1.25 us vs 2.0 us for the cross-lane
                                # roll tree at (256,128)->8).  Column f_pad
                                # of the rhs is the window-validity row
                                # (0/1); C rows are pre-masked, so
                                # contracting against it is the plain pair
                                # sum.  "decomp": a radial output ships ONE
                                # row (the masked scalar coefficient c) and
                                # its vector sum sum_j c*(xi-xj) is rebuilt
                                # as xi*S0 - S_x, with S_x = sum_j c*xj
                                # riding rhs columns 0..2 of the SAME
                                # matmul (cancellation changes rounding;
                                # gated by the device parity probe).
                                # "dot": the exact per-pair products
                                # c*rvec_k stay as 3 rows (reference
                                # summation values) and only the mask
                                # column is read.
                                prec = (jax.lax.Precision.HIGHEST
                                        if self.reduce_prec == "highest"
                                        else jax.lax.Precision.DEFAULT)
                                C = jnp.concatenate(rows_l, axis=0)
                                if self.reduce == "ones":
                                    # standard-orientation matmul against
                                    # a constant ones rhs: plain lane sum
                                    # with no transposed-operand lowering
                                    S = jax.lax.dot_general(
                                        C, jnp.ones((cq_t.shape[1], 8),
                                                    jnp.float32),
                                        dimension_numbers=(((1,), (0,)),
                                                           ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=prec)
                                    f_col = 0
                                else:
                                    S = jax.lax.dot_general(
                                        C, cq_t,
                                        dimension_numbers=(((1,), (1,)),
                                                           ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=prec)
                                    f_col = f_pad
                                pieces, r0 = [], 0
                                for o, kind in post:
                                    if kind == "decomp":
                                        blk = S[r0:r0 + RH, :]
                                        s0 = blk[:, f_col:f_col + 1]
                                        for k in range(3):
                                            pieces.append(
                                                fi["x%d" % k] * s0
                                                - blk[:, k:k + 1])
                                        r0 += RH
                                    else:
                                        for _ in range(int(kind[3:])):
                                            pieces.append(
                                                S[r0:r0 + RH,
                                                  f_col:f_col + 1])
                                            r0 += RH
                            half_res.append(
                                jnp.concatenate(pieces, axis=1))
                        res = jnp.concatenate(half_res, axis=0)
                        store_res(res, ctr_off, ctr_cnt, cs_i, sh == 0)
                        return 0

                    if ABLATE != "nomath":
                        jax.lax.fori_loop(0, pl.cdiv(mxc, CSL), ctr_sheet, 0)
                    return 0

                jax.lax.fori_loop(0, pl.cdiv(mx, WC), sheet_body, 0)

            def sheet_loop_co(m, t, mx, mxc, ctr_off, ctr_cnt):
                """Center-sheet-outer scheduler (round 5,
                blocks_sched="ctr_outer"): assemble a MACRO-GROUP of up
                to SMG window sheets once (sheet s2 on sublane rows
                [s2*f_pad, ..)), then for each center sheet run the
                window sheets INNER with per-piece (RH, 128) register
                accumulators — cross-lane reduction trees, center
                assembly, and the out_scr read-modify-write all drop
                from per-(window-sheet x center-sheet) to per
                center-sheet; the inner loop pays only a cheap TW->128
                lane fold per piece.  Macro-groups keep capacity exact:
                batches wider than SMG*WC lanes accumulate across
                macros through out_scr exactly like the sheet-outer
                scheduler accumulates across sheets."""
                SMG = self.sheet_group
                n_sh = pl.cdiv(mx, WC)
                # validity source: the countdown plane row holds
                # len - lane per window; > sho is the sheet-sh validity
                mrow2 = mask_scr[buf * GNBZ8 + m * NBZ8 + t, :][None, :]

                def mac_body(mac, _):
                    sh0 = mac * SMG
                    loc_n = jnp.minimum(n_sh - sh0, SMG)

                    def asm_body(s2, _):
                        sho = (sh0 + s2) * WC
                        dst = s2 * f_pad
                        for k in range(NW):
                            cand_scr[pl.ds(dst, f_pad),
                                     k * WC:(k + 1) * WC] = \
                                asm_window(m, t, sho, k)
                        return 0

                    if ABLATE != "noasm":
                        jax.lax.fori_loop(0, loc_n, asm_body, 0)

                    def ctr_body(cs_i, _):
                        cen = build_cen(ctr_off, ctr_cnt, cs_i)
                        tiles = tile_split(cen)
                        accs0 = tuple(
                            tuple(jnp.zeros((RH, 128), jnp.float32)
                                  for _p in range(n_pieces))
                            for _c, _t, RH in tiles)

                        def fold128(row):
                            tw = row.shape[1]
                            nfull = tw // 128
                            acc = row[:, :128]
                            for i in range(1, nfull):
                                acc = acc + row[:, i * 128:(i + 1) * 128]
                            rem = tw - nfull * 128
                            if rem:
                                acc = acc + jnp.concatenate(
                                    [row[:, nfull * 128:],
                                     jnp.zeros((row.shape[0], 128 - rem),
                                               jnp.float32)], axis=1)
                            return acc

                        def sh_body(s2, accs):
                            cand = cand_scr[pl.ds(s2 * f_pad, f_pad), :]
                            sho = (sh0 + s2) * WC
                            vld_full = mrow2 > sho
                            new = []
                            for ti, (cen_h, take, RH) in enumerate(tiles):
                                cq_t = take(cand)
                                vld = take(vld_full)
                                rows_l, _post, _fi = pair_rows(
                                    cen_h, cq_t, vld)
                                new.append(tuple(
                                    accs[ti][pi] + fold128(r_)
                                    for pi, r_ in enumerate(rows_l)))
                            return tuple(new)

                        accs = jax.lax.fori_loop(0, loc_n, sh_body, accs0)
                        half_res = [
                            jnp.concatenate(
                                [jnp.sum(a_, axis=1, keepdims=True)
                                 for a_ in accs[ti]], axis=1)
                            for ti in range(len(tiles))]
                        res = jnp.concatenate(half_res, axis=0)
                        store_res(res, ctr_off, ctr_cnt, cs_i, mac == 0)
                        return 0

                    if ABLATE != "nomath":
                        jax.lax.fori_loop(0, pl.cdiv(mxc, CSL), ctr_body, 0)
                    return 0

                jax.lax.fori_loop(0, pl.cdiv(n_sh, SMG), mac_body, 0)

            if self.sched == "ctr_outer":
                # static piece count per tile (reduce == "sum" asserted
                # at init: the MXU reduce modes contract against the
                # candidate tile and cannot accumulate across sheets)
                n_pieces = sum(3 if ncomp == 3 else 1
                               for _o, ncomp in out_cols)
                sheet_loop = sheet_loop_co

            if ABLATE not in ("noloop", "dmaonly"):
                for m in range(G):
                    member_body(m)

            # ---- in-kernel epilogue on finished per-center sums ----
            # LANE-MAJOR row-chunk sweep per own column (round 4): the
            # user transform runs on (1, EPR) ROWS — center fields are
            # read straight off the span slab (fields on sublanes,
            # particles on lanes: the lanes layout IS row-major) with one
            # 128-aligned slice + roll, and the pair sums are transposed
            # once per chunk.  The previous (EPR, 1) column layout ran
            # every user op at 1/128 lane utilization (~5.7 ms/traversal
            # at dragon scale, j42/j78 fused-minus-unfused delta); here
            # the per-op cost is 2 vregs instead of 32.
            # The exact-tail chunk (q clamped to L - EPR) re-reads only
            # untransformed sum lanes, so re-applying it is idempotent.
            # Rows past L compute garbage that the writeback never ships.
            if epi_fn is not None and ABLATE not in ("noepi", "dmaonly"):
                EPR = min(256, self.half)
                sc_vals = [sc_ref[0, j] for j in range(16)]

                def epi_chunk(k, _, c, L):
                    q = jnp.maximum(jnp.minimum(k * EPR, L - EPR), 0)
                    off_o = c * HALF_OUT + q
                    srow = out_scr[pl.ds(off_o, EPR), :]
                    lq = delta_c[c] + q
                    la2 = pl.multiple_of((lq // 128) * 128, 128)
                    base = jnp.minimum(la_c[c] + la2,
                                       jnp.int32(SPAN - EPR - 128))
                    base = pl.multiple_of(base, 128)
                    slab = win_scr[buf, c + 1, :, pl.ds(base, EPR + 128)]
                    slab = pltpu.roll(slab, EPR + 128 - (lq - la2), axis=1)
                    fi = {nm: slab[v:v + 1, :EPR]
                          for nm, v in name_to_idx.items()}
                    sumsT = jnp.transpose(srow)        # (128, EPR)
                    sums = {}
                    pos = 0
                    for o, ncomp in out_cols:
                        sums[o] = tuple(sumsT[pos + i:pos + i + 1, :]
                                        for i in range(ncomp))
                        pos += ncomp
                    res = epi_fn(fi, sums, sc_vals)
                    rows = []
                    for o, _nc in epi_cols:
                        comps = res[o] if isinstance(res[o], tuple) \
                            else (res[o],)
                        rows.extend(comps)
                    packedT = jnp.concatenate(rows, axis=0)   # (pw, EPR)
                    pw = packedT.shape[0]
                    packed = jnp.transpose(packedT)
                    out_scr[pl.ds(off_o, EPR), :] = jnp.concatenate(
                        [srow[:, :64], packed,
                         jnp.zeros((EPR, 64 - pw), jnp.float32)], axis=1)
                    return 0

                for c in range(B):
                    L = jnp.minimum(col_len[c], jnp.int32(self.half))
                    jax.lax.fori_loop(
                        0, pl.cdiv(jnp.maximum(L, 1), EPR),
                        functools.partial(epi_chunk, c=c, L=L), 0)

            # ---- exact-tail writeback, one sweep per own column ----
            # Two phases: start every chunk DMA for both columns, then
            # wait them all.  One sem per column accumulates the bytes of
            # all its copies (uniform size within each structural level),
            # so the latency of the ~6 per-group copies overlaps instead
            # of serializing (the serial start+wait version measured
            # ~2.1 ms per traversal at dragon scale, j67 "nowb").  The
            # exact-tail chunk overlaps the final full chunk's range with
            # IDENTICAL source rows, so concurrent writes are benign.
            def wb_copy(c, src, size):
                return pltpu.make_async_copy(
                    out_scr.at[pl.ds(c * HALF_OUT + src, size), :],
                    out_hbm.at[pl.ds(col_lo[c] + src, size), :],
                    sems.at[B + 2 + c])

            def wb_phase(do):
                for c in range(B):
                    L = jnp.minimum(col_len[c], jnp.int32(self.half))

                    def out_body(k, _, c=c):
                        do(wb_copy(c, k * OUT_CHUNK, OUT_CHUNK))
                        return 0

                    jax.lax.fori_loop(0, L // OUT_CHUNK, out_body, 0)

                    @pl.when((L % OUT_CHUNK > 0) & (L >= OUT_CHUNK))
                    def _tail(c=c, L=L):
                        do(wb_copy(c, L - OUT_CHUNK, OUT_CHUNK))

                    for lo, hi, size in ((64, OUT_CHUNK, 64), (8, 64, 8)):
                        @pl.when((L >= lo) & (L < hi))
                        def _level(c=c, L=L, size=size):
                            def body(k, _, c=c, size=size):
                                do(wb_copy(c, k * size, size))
                                return 0
                            jax.lax.fori_loop(0, L // size, body, 0)

                            @pl.when(L % size > 0)
                            def _ov(c=c, L=L, size=size):
                                do(wb_copy(c, L - size, size))

                    @pl.when(L < 8)
                    def _tiny(c=c, L=L):
                        def one(k, _, c=c):
                            do(wb_copy(c, k, 1))
                            return 0
                        jax.lax.fori_loop(0, L, one, 0)

            if ABLATE not in ("nowb", "dmaonly"):
                wb_phase(lambda cp: cp.start())
                wb_phase(lambda cp: cp.wait())
