"""Pallas TPU kernel for batched banded marker alignment.

The jnp reference implementation (shasta_tpu.ops.align._banded_forward
+ traceback) expresses the DP as a lax.scan over rows: every row is a
separate XLA op dispatch on a small (B, W) slab, which makes the whole
alignment latency-bound. This kernel keeps the entire DP in VMEM and
loops over rows *inside* one kernel launch. Design notes (measured at
16.9 Gcells/s on the target chip, ~7x the first-generation kernel):

- NO gathers inside the kernel. Band normalization happens in the
  batch-building gather that feeds the kernel (bnorm[t] = b[t +
  band_min], one XLA gather fused with the CSR row gather), so the
  kernel's b block is only LA - R + 2W lanes wide and every
  sliding-window refill is a single 128-aligned 2D slice shared by
  all pairs (no per-pair scalar loops in the kernel).
- Wide pair blocks (BB up to 128): per-instruction overhead dominates
  at this tile size, so more lanes of work per vector instruction is
  the main throughput lever.
- The banded row update is pure VPU work on (BB, W) tiles: the in-row
  gap dependency is a log2(W)-step prefix max.
- Best-end tracking is a per-lane accumulator (value + packed
  2*row + col/row priority), folded once after the forward loop; the
  fold reproduces the reference tie-breaking exactly (max score, then
  earliest row, then last-column before last-row, then lowest lane).
- Traceback state is 2 bits/cell — exactly four states are needed
  (DIAG-match, DIAG-mismatch, UP, LEFT) — packed 16 rows per int32
  word in the dirs scratch. That cuts dirs VMEM traffic 4x vs the
  round-3 int8 layout AND replaces every int8 store/load (which costs
  a (32, 128)->(8, 128) relayout on TPU) with one native int32 access
  per 16 rows.
- The traceback walks a per-pair entry-lane COLUMN and resolves each
  row with ONE packed max-reduce (lane*8 + dircode) over the eligible
  lanes below the entry; LEFT runs consist of valid cells bounded by
  the j==0 terminal, so the maximum eligible lane IS the exit cell.
- AlignmentInfo metrics are computed OUTSIDE the kernel from the mj
  match matrix with plain XLA ops in the same jit (cummax pairs each
  match with its predecessor for skip/drift).

Semantics are identical to the jnp kernel (same scores, same
tie-breaking); tests assert equality of the emitted ordinals.
Reference for the algorithm: src/AssemblerAlign3.cpp (method 3
banded alignment semantics).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shasta_tpu.utils import jaxsetup  # noqa: F401

NEG_INF = np.int32(-(2**30))
BIG = np.int32(1 << 29)
STOP, DIAG, UP, LEFT = 0, 1, 2, 3

# VPU work per DP band cell, for the roofline comparison (bench.py
# reports kernel_pct_peak = cells/s * this / measured VPU ops/s).
# Counted from _kernel's per-(BB, W)-slab ops at W=128:
# forward_row ~50 elementwise int32 ops/cell — window advance 2,
# match+sub 2, j 1, valid mask 5, at_j0 1, shift 1, diag/up/base 3,
# j0 clamp 2, run 1, prefix-max 2*log2(W)=14 (the dominant term),
# V+mask 2, direction select 5, 2-bit pack shift+or 2 (store
# amortized 1/16), end-cell accumulation 9 — plus the traceback pass
# (~12 ops/cell: code unpack shift+mask 2, j_row 1, terminal remap 2,
# eligibility 3, key 2, lane max-reduce ~2; loads amortized 1/16,
# (BB, 1)-wide decode ~0). The count scales with log2(W); treat it
# as W=128-accurate.
KERNEL_OPS_PER_CELL = 62

_VMEM_BUDGET = int(os.environ.get("SHASTA_TPU_VMEM", 12 * 1024 * 1024 + 512 * 1024))


def _round128(x: int) -> int:
    return ((x + 127) // 128) * 128


@functools.lru_cache(None)
def _log_shape_once(LA, LB, W, BB, chunked):
    import sys

    print(
        f"[align shape] LA={LA} LB={LB} W={W} BB={BB} chunked={chunked} "
        f"est={_block_bytes(LA, LB, W, max(BB, 8)) / 2**20:.1f}MiB",
        file=sys.stderr, flush=True,
    )


def _geometry(LA: int, LB: int, W: int):
    # b arrives already band-normalized (bnorm[t] = b[t + band_min],
    # computed by the device-side gather that builds the batch), so the
    # kernel's b block only needs the lanes its sliding window reads:
    # group g reads [g*R, g*R + 2W), g < LA/R.
    LEFTPAD = LA + W
    R = min(W, LA)
    LBP = _round128(LA - R + 2 * W)
    LAP = LA + 2 * R
    return LEFTPAD, R, LBP, LAP


def _unroll_temp_bytes(BB: int, W: int) -> int:
    """Stack bytes for the 16-row unrolled loop bodies: the compiler
    keeps ~3 live (BB, W) int32 temporaries per unrolled row (measured:
    scoped-vmem OOM at (LA=512, W=1344, BB=32) with 18.05M actual vs
    7.8M accounted before this term)."""
    return 16 * 3 * max(BB, 8) * ((W + 127) // 128) * 128 * 4


def _block_bytes(LA: int, LB: int, W: int, BB: int) -> int:
    """VMEM bytes for one BB-pair block. The 2-bit-packed dirs scratch
    (LA/16, BB, W) int32 is tiled (8, 128) on its last two dims, so
    BB < 8 still allocates 8 sublanes — small blocks do NOT shrink it
    (observed: scoped-vmem OOM at LA=8192, BB=8 with naive per-pair
    accounting)."""
    LEFTPAD, R, LBP, LAP = _geometry(LA, LB, W)
    dirs = (LA // 16) * max(BB, 8) * ((W + 127) // 128) * 128 * 4
    return dirs + _unroll_temp_bytes(BB, W) + BB * (
        8 * LBP + 8 * LAP + 8 * LA + 4 * (2 * W + 2 * R + 2 * W)
    )


def _block_pairs(LA: int, W: int, LB: int | None = None) -> int:
    if LB is None:
        LB = LA
    if LA >= 8192:
        # The monolithic dirs scratch at LA >= 8192 leaves too little
        # VMEM headroom for Mosaic's stack (measured: 16.09M demand
        # vs the 16M limit at (8192, 512, BB=8) even though the
        # static accounting fit) — ultra-long shapes stream through
        # the chunked kernel, as in round 3.
        return 0
    cap = int(os.environ.get("SHASTA_TPU_BB", "128"))
    if W >= 1024:
        # Wide bands inflate Mosaic's stack beyond the static model
        # (measured: 18.05M actual vs ~11M accounted at
        # (512, W=2048, BB=32)); keep wide-band blocks narrow.
        cap = min(cap, 8)
    for cand in (256, 128, 64, 32, 16, 8):
        if cap >= cand and _block_bytes(LA, LB, W, cand) <= _VMEM_BUDGET:
            return cand
    return 0


def supported(LA: int, W: int) -> bool:
    return (
        _block_pairs(LA, W) >= 1
        or _chunked_block_pairs(LA, LA, W, _CHUNK_R) >= 1
    )


def _kernel(
    a_ref,  # (BB, LAP) int32: a right-padded (pad -1)
    bnorm_ref,  # (BB, LBP) int32: band-normalized b (bnorm[t] = b[t+band_min])
    a_len_ref,  # (1, BB, 1) int32
    b_len_ref,  # (1, BB, 1) int32
    band_min_ref,  # (1, BB, 1) int32 (pre-clamped by the host)
    mj_ref,  # (1, LA, BB) int32 out: per-row matched ordinal1 or -1
    best_ref,  # (1, BB, 1) int32 out
    dirs_ref,  # (LA//16, BB, W) int32 scratch: 16 rows x 2-bit codes
    w_ref,  # (BB, 2W) int32 scratch: shared-slide b window
    aw_ref,  # (BB, 2R) int32 scratch: sliding a window
    bv_ref,  # (BB, W) int32 scratch: per-lane best end value
    bim_ref,  # (BB, W) int32 scratch: per-lane packed 2*i + (1-iscol)
    *,
    LA: int,
    LB: int,
    W: int,
    LEFTPAD: int,
    match: int,
    mismatch: int,
    gap: int,
):
    BB = a_ref.shape[0]
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (BB, W), 1)
    dgap = d_idx * jnp.int32(gap)
    d8 = d_idx * 8
    neg = jnp.full((BB, W), NEG_INF, jnp.int32)
    gap_i = jnp.int32(gap)
    a_len = a_len_ref[0, :, :]
    b_len = b_len_ref[0, :, :]
    band_min = band_min_ref[0, :, :]
    R = min(W, LA)

    bv_ref[...] = neg
    bim_ref[...] = jnp.zeros((BB, W), jnp.int32)

    # Row 0: V[0][j] = 0 for 0 <= j <= b_len inside the band.
    j0 = band_min + d_idx
    prev0 = jnp.where((j0 >= 0) & (j0 <= b_len), 0, NEG_INF).astype(jnp.int32)

    def forward_row(i, prev):
        win = w_ref[...]
        bj = win[:, :W]  # b[j-1] for this row's band cells
        aw = aw_ref[...]
        av = aw[:, :1]  # a[i-1]
        # Advance both windows one lane for the next row.
        w_ref[...] = jnp.concatenate(
            [win[:, 1:], jnp.full((BB, 1), -2, jnp.int32)], axis=1
        )
        aw_ref[...] = jnp.concatenate(
            [aw[:, 1:], jnp.full((BB, 1), -1, jnp.int32)], axis=1
        )
        m = bj == av
        sub = jnp.where(m, jnp.int32(match), jnp.int32(mismatch))
        j = i + band_min + d_idx  # (BB, W)
        valid = (j >= 0) & (j <= b_len) & (i <= a_len)
        at_j0 = j == 0

        prev_up = jnp.concatenate([prev[:, 1:], neg[:, :1]], axis=1)
        diag_cand = prev + sub
        up_cand = prev_up + gap_i
        base = jnp.maximum(diag_cand, up_cand)
        base = jnp.where(at_j0, jnp.maximum(base, 0), base)

        # Prefix max along lanes: V[d] = max_{d'<=d} base[d'] + (d-d')*gap.
        run = base - dgap
        stp = 1
        while stp < W:
            shifted = jnp.concatenate([neg[:, :stp], run[:, :-stp]], axis=1)
            run = jnp.maximum(run, shifted)
            stp *= 2
        V = run + dgap
        V = jnp.where(valid, V, NEG_INF)

        # 2-bit direction code. Exactly four states are ever consulted
        # by the traceback: DIAG with a k-mer match (0), DIAG without
        # (1), UP (2), LEFT (3) — the j==0 terminal is recomputed from
        # jb at traceback time, so it needs no stored state. Invalid
        # lanes can carry garbage codes: the traceback only inspects
        # lanes between the path and the j==0 terminal, which are
        # always valid cells, so no masking is needed here.
        came_left = V > base
        d2 = jnp.where(
            came_left,
            jnp.int32(LEFT),
            jnp.where(
                base == diag_cand,
                jnp.where(m, jnp.int32(0), jnp.int32(1)),
                jnp.int32(UP),
            ),
        )

        # Best-end accumulator: end cells are the last column
        # (j == b_len) and the last row (i == a_len). bim packs
        # (2*i + 1-iscol): min bim = earliest row, col beats row.
        iscol = (j == b_len) & valid
        endm = iscol | ((i == a_len) & valid)
        mv = jnp.where(endm, V, NEG_INF)
        bv = bv_ref[...]
        bt = mv > bv
        bv_ref[...] = jnp.where(bt, mv, bv)
        bim_new = jnp.where(iscol, 2 * i, 2 * i + 1)
        bim_ref[...] = jnp.where(bt, bim_new, bim_ref[...])
        return V, d2

    # Group structure: refill both windows every R rows from aligned
    # slices shared by all pairs; rows run with a manual 16x unroll so
    # each 16-row group's 2-bit codes pack into ONE int32 store.
    assert LA % R == 0 and R % 128 == 0

    def group(g, prev):
        w_ref[...] = bnorm_ref[:, pl.ds(pl.multiple_of(g * R, 128), 2 * W)]
        aw_ref[...] = a_ref[:, pl.ds(pl.multiple_of(g * R, 128), 2 * R)]
        i0 = g * R + 1

        def rows16(t16, prev):
            base_i = i0 + t16 * 16
            prev, packed = forward_row(base_i, prev)
            for t in range(1, 16):
                prev, d2 = forward_row(base_i + t, prev)
                packed = packed | (d2 << (2 * t))
            dirs_ref[(base_i - 1) // 16] = packed
            return prev

        return jax.lax.fori_loop(0, R // 16, rows16, prev)

    jax.lax.fori_loop(0, LA // R, group, prev0)

    # ---- Pick the best end: (max V, then min packed bim = earliest
    # row with column-end priority, then min lane).
    bestv = bv_ref[...]
    bestim = bim_ref[...]
    maxv = jnp.max(bestv, axis=1, keepdims=True)
    cand = bestv == maxv
    mini = jnp.min(jnp.where(cand, bestim, BIG), axis=1, keepdims=True)
    cand2 = cand & (bestim == mini)
    bi = mini >> 1
    bd = jnp.min(jnp.where(cand2, d_idx, W), axis=1, keepdims=True)
    best_ref[0, :, :] = maxv

    # ---- Traceback: per-pair entry-lane column walk. Each row is
    # resolved with ONE packed reduce: among lanes d <= entry_d that
    # are not LEFT, the maximum d is the exit cell (LEFT runs always
    # consist of valid cells, and the j==0 terminal bounds them).
    # Codes: 0 = DIAG match, 1 = DIAG mismatch, 2 = UP, 3 = LEFT;
    # j == 0 cells are remapped to terminal code 4 before the reduce.
    def tb_row(i, carry, code2):
        entry_d, jb = carry  # (BB, 1) each; jb = band_min + i
        entry_d = jnp.where(i == bi, bd, entry_d)
        j_row = jb + d_idx
        adj = jnp.where(j_row == 0, jnp.int32(4), code2)
        elig = (d_idx <= entry_d) & (adj != jnp.int32(LEFT))
        key = jnp.where(elig, d8 + adj, -1)
        kmax = jnp.max(key, axis=1, keepdims=True)  # (BB, 1)
        exit_d = kmax >> 3
        acode = kmax & 7
        j_exit = jb + exit_d
        is_match = (acode == 0) & (j_exit > 0)
        mj_ref[0, pl.ds(i - 1, 1), :] = jnp.where(
            is_match, j_exit - 1, -1
        ).reshape(1, BB)
        entry_d = jnp.where(
            acode <= 1, exit_d, jnp.where(acode == 2, exit_d + 1, -1)
        )
        entry_d = jnp.where(entry_d >= W, -1, entry_d)
        return entry_d, jb - 1

    tb_init = (
        jnp.full((BB, 1), -1, jnp.int32),
        band_min + LA,
    )

    def tb_rows16(t16, carry):
        base = t16 * 16
        packed = dirs_ref[(LA - base) // 16 - 1]
        for t in range(16):
            # i - 1 = LA - base - 1 - t, so (i - 1) % 16 == 15 - t.
            code2 = (packed >> (2 * (15 - t))) & 3
            carry = tb_row(LA - (base + t), carry, code2)
        return carry

    jax.lax.fori_loop(0, LA // 16, tb_rows16, tb_init)


def _kernel_waves(
    a_ref,
    bnorm_ref,
    a_len_ref,
    b_len_ref,
    band_min_ref,
    mj_ref,
    best_ref,
    dirs_ref,
    w_ref,
    aw_ref,
    bv_ref,
    bim_ref,
    *,
    LA: int,
    LB: int,
    W: int,
    LEFTPAD: int,
    match: int,
    mismatch: int,
    gap: int,
    waves: int,
):
    """Interleaved-row-wave variant of :func:`_kernel` (VERDICT r4
    item 4): the BB-pair block splits into ``waves`` independent
    sub-slabs whose row updates are emitted INTERLEAVED — each step of
    the log2(W) prefix-max (the row's longest dependent chain)
    alternates between slabs in program order, so one slab's
    chain-latency stalls are filled by the other slab's issue slots.
    The traceback's serial per-row reduce interleaves the same way.
    Semantics are identical to _kernel (equality-tested); kept as a
    separate function so the default path's traced HLO — and with it
    the persistent compile cache — is untouched."""
    BB = a_ref.shape[0]
    H = BB // waves
    slabs = [slice(s * H, (s + 1) * H) for s in range(waves)]
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    dgap = d_idx * jnp.int32(gap)
    d8 = d_idx * 8
    neg = jnp.full((H, W), NEG_INF, jnp.int32)
    gap_i = jnp.int32(gap)
    a_len = [a_len_ref[0, sl, :] for sl in slabs]
    b_len = [b_len_ref[0, sl, :] for sl in slabs]
    band_min = [band_min_ref[0, sl, :] for sl in slabs]
    R = min(W, LA)

    bv_ref[...] = jnp.full((BB, W), NEG_INF, jnp.int32)
    bim_ref[...] = jnp.zeros((BB, W), jnp.int32)

    prev0 = []
    for s in range(waves):
        j0 = band_min[s] + d_idx
        prev0.append(
            jnp.where((j0 >= 0) & (j0 <= b_len[s]), 0, NEG_INF).astype(
                jnp.int32
            )
        )

    def forward_row(i, prevs):
        win = w_ref[...]
        aw = aw_ref[...]
        w_ref[...] = jnp.concatenate(
            [win[:, 1:], jnp.full((BB, 1), -2, jnp.int32)], axis=1
        )
        aw_ref[...] = jnp.concatenate(
            [aw[:, 1:], jnp.full((BB, 1), -1, jnp.int32)], axis=1
        )
        pre = []
        for s, sl in enumerate(slabs):
            bj = win[sl, :W]
            av = aw[sl, :1]
            m = bj == av
            sub = jnp.where(m, jnp.int32(match), jnp.int32(mismatch))
            j = i + band_min[s] + d_idx
            valid = (j >= 0) & (j <= b_len[s]) & (i <= a_len[s])
            at_j0 = j == 0
            prev_up = jnp.concatenate([prevs[s][:, 1:], neg[:, :1]], axis=1)
            diag_cand = prevs[s] + sub
            base = jnp.maximum(diag_cand, prev_up + gap_i)
            base = jnp.where(at_j0, jnp.maximum(base, 0), base)
            pre.append((m, j, valid, base, diag_cand))
        # The interleave: every prefix-max step issues for slab 0,
        # slab 1, ... before the next dependent step.
        runs = [p[3] - dgap for p in pre]
        stp = 1
        while stp < W:
            runs = [
                jnp.maximum(
                    r, jnp.concatenate([neg[:, :stp], r[:, :-stp]], axis=1)
                )
                for r in runs
            ]
            stp *= 2
        Vs, d2s = [], []
        for s, sl in enumerate(slabs):
            m, j, valid, base, diag_cand = pre[s]
            V = runs[s] + dgap
            V = jnp.where(valid, V, NEG_INF)
            came_left = V > base
            d2 = jnp.where(
                came_left,
                jnp.int32(LEFT),
                jnp.where(
                    base == diag_cand,
                    jnp.where(m, jnp.int32(0), jnp.int32(1)),
                    jnp.int32(UP),
                ),
            )
            iscol = (j == b_len[s]) & valid
            endm = iscol | ((i == a_len[s]) & valid)
            mv = jnp.where(endm, V, NEG_INF)
            bv = bv_ref[sl]
            bt = mv > bv
            bv_ref[sl] = jnp.where(bt, mv, bv)
            bim_new = jnp.where(iscol, 2 * i, 2 * i + 1)
            bim_ref[sl] = jnp.where(bt, bim_new, bim_ref[sl])
            Vs.append(V)
            d2s.append(d2)
        return tuple(Vs), d2s

    assert LA % R == 0 and R % 128 == 0

    def group(g, prevs):
        w_ref[...] = bnorm_ref[:, pl.ds(pl.multiple_of(g * R, 128), 2 * W)]
        aw_ref[...] = a_ref[:, pl.ds(pl.multiple_of(g * R, 128), 2 * R)]
        i0 = g * R + 1

        def rows16(t16, prevs):
            base_i = i0 + t16 * 16
            prevs, packeds = forward_row(base_i, prevs)
            for t in range(1, 16):
                prevs, d2s = forward_row(base_i + t, prevs)
                packeds = [
                    p | (d << (2 * t)) for p, d in zip(packeds, d2s)
                ]
            dirs_ref[(base_i - 1) // 16] = jnp.concatenate(packeds, axis=0)
            return prevs

        return jax.lax.fori_loop(0, R // 16, rows16, prevs)

    jax.lax.fori_loop(0, LA // R, group, tuple(prev0))

    # Best-end fold per slab; one concatenated store.
    maxvs, bis, bds = [], [], []
    for s, sl in enumerate(slabs):
        bestv = bv_ref[sl]
        bestim = bim_ref[sl]
        maxv = jnp.max(bestv, axis=1, keepdims=True)
        cand = bestv == maxv
        mini = jnp.min(jnp.where(cand, bestim, BIG), axis=1, keepdims=True)
        cand2 = cand & (bestim == mini)
        maxvs.append(maxv)
        bis.append(mini >> 1)
        bds.append(jnp.min(jnp.where(cand2, d_idx, W), axis=1, keepdims=True))
    best_ref[0, :, :] = jnp.concatenate(maxvs, axis=0)

    def tb_row(i, carrys, code2s):
        vals = []
        new = []
        for s in range(waves):
            entry_d, jb = carrys[s]
            entry_d = jnp.where(i == bis[s], bds[s], entry_d)
            j_row = jb + d_idx
            adj = jnp.where(j_row == 0, jnp.int32(4), code2s[s])
            elig = (d_idx <= entry_d) & (adj != jnp.int32(LEFT))
            key = jnp.where(elig, d8 + adj, -1)
            kmax = jnp.max(key, axis=1, keepdims=True)
            exit_d = kmax >> 3
            acode = kmax & 7
            j_exit = jb + exit_d
            is_match = (acode == 0) & (j_exit > 0)
            vals.append(jnp.where(is_match, j_exit - 1, -1))
            entry_d = jnp.where(
                acode <= 1, exit_d, jnp.where(acode == 2, exit_d + 1, -1)
            )
            entry_d = jnp.where(entry_d >= W, -1, entry_d)
            new.append((entry_d, jb - 1))
        mj_ref[0, pl.ds(i - 1, 1), :] = jnp.concatenate(
            vals, axis=0
        ).reshape(1, BB)
        return tuple(new)

    tb_init = tuple(
        (jnp.full((H, 1), -1, jnp.int32), band_min[s] + LA)
        for s in range(waves)
    )

    def tb_rows16(t16, carrys):
        base = t16 * 16
        packed = dirs_ref[(LA - base) // 16 - 1]
        for t in range(16):
            code2 = (packed >> (2 * (15 - t))) & 3
            code2s = [code2[sl] for sl in slabs]
            carrys = tb_row(LA - (base + t), carrys, code2s)
        return carrys

    jax.lax.fori_loop(0, LA // 16, tb_rows16, tb_init)


_CHUNK_R = 128  # default row-chunk of the streamed (chunked) kernel


def _chunk_r_default() -> int:
    """Row-chunk size R of the chunked kernel. SHASTA_TPU_CHUNK_R
    overrides for experiments (must be a multiple of 128; larger R
    amortizes per-block overheads over more rows at the cost of a
    bigger dirs block in VMEM)."""
    return int(os.environ.get("SHASTA_TPU_CHUNK_R", str(_CHUNK_R)))


def _chunked_block_pairs(LA: int, LB: int, W: int, R: int = 0) -> int:
    """Pair-block width for the chunked kernel (2-bit-packed dirs
    streamed to HBM per R-row block, so VMEM holds only the full
    a/bnorm rows and one dirs block). 0 if even that does not fit."""
    R = R or _chunk_r_default()
    # R beyond 2*min(W, LA) overruns the padded-a geometry (LAP =
    # LA + 2*min(W, LA) must cover the last block's 2R-lane window).
    if LA % R or W > 2048 or R % 128 or R > 2 * min(W, LA):
        return 0
    LEFTPAD, R0, LBP, LAP = _geometry(LA, LB, W)
    cap = int(os.environ.get("SHASTA_TPU_BB", "128"))
    if W >= 1024:
        cap = min(cap, 8)  # same wide-band stack inflation as above
    for BB in (128, 64, 32, 16, 8):
        if cap < BB:
            continue
        dirs_blk = (
            2 * (R // 16) * max(BB, 8) * ((W + 127) // 128) * 128 * 4
        )
        # Mosaic double-buffers the full-row input blocks (measured:
        # 16.48M actual at (32768, 128, BB=32) where single-buffered
        # accounting said 9.6M).
        rows = BB * (8 * LBP + 8 * LAP)
        small = BB * (4 * (W + 128) + 4 * (2 * R) + 12 * W)
        mj_blk = 2 * R * BB * 4
        temps = _unroll_temp_bytes(BB, W)
        if dirs_blk + rows + small + mj_blk + temps <= _VMEM_BUDGET:
            return BB
    return 0


def _fwd_chunked_kernel(
    a_ref,  # (BB, LAP) int32, block per i
    bnorm_ref,  # (BB, LBP) int32, block per i
    a_len_ref,  # (1, BB, 1)
    b_len_ref,  # (1, BB, 1)
    band_min_ref,  # (1, BB, 1)
    dirs_ref,  # (1, R//16, BB, W) int32 OUT block per (i, g), 2-bit packed
    best_ref,  # (1, BB, 1) int32 OUT
    bi_ref,  # (1, BB, 1) int32 OUT (best end row)
    bd_ref,  # (1, BB, 1) int32 OUT (best end lane)
    prev_ref,  # (BB, W) int32 scratch, persists across g
    w_ref,  # (BB, 2W) scratch
    aw_ref,  # (BB, 2R0) scratch
    bv_ref,  # (BB, W) scratch
    bim_ref,  # (BB, W) scratch
    *,
    LA: int,
    LB: int,
    W: int,
    match: int,
    mismatch: int,
    gap: int,
    R: int = _CHUNK_R,
):
    """Forward DP only, dirs streamed to HBM one R-row block per grid
    step. Same row update as the monolithic kernel; the carry (prev
    row, best accumulators) lives in scratch, which persists across
    the sequential TPU grid."""
    BB = a_ref.shape[0]
    g = pl.program_id(1)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (BB, W), 1)
    dgap = d_idx * jnp.int32(gap)
    neg = jnp.full((BB, W), NEG_INF, jnp.int32)
    gap_i = jnp.int32(gap)
    a_len = a_len_ref[0, :, :]
    b_len = b_len_ref[0, :, :]
    band_min = band_min_ref[0, :, :]

    @pl.when(g == 0)
    def _init():
        j0 = band_min + d_idx
        prev_ref[...] = jnp.where(
            (j0 >= 0) & (j0 <= b_len), 0, NEG_INF
        ).astype(jnp.int32)
        bv_ref[...] = neg
        bim_ref[...] = jnp.zeros((BB, W), jnp.int32)

    # Refill the sliding windows for this row block (128-aligned
    # slices shared by all pairs; R is a multiple of 128). The b
    # window covers W + R lanes — the rows of one block drift at most
    # R lanes — which always fits the monolithic LBP geometry even
    # when W exceeds min(W, LA).
    w_ref[...] = bnorm_ref[:, pl.ds(pl.multiple_of(g * R, 128), W + R)]
    aw_ref[...] = a_ref[:, pl.ds(pl.multiple_of(g * R, 128), 2 * R)]

    def forward_row(r, prev):
        i = g * R + r + 1
        win = w_ref[...]
        bj = win[:, :W]
        aw = aw_ref[...]
        av = aw[:, :1]
        w_ref[...] = jnp.concatenate(
            [win[:, 1:], jnp.full((BB, 1), -2, jnp.int32)], axis=1
        )
        aw_ref[...] = jnp.concatenate(
            [aw[:, 1:], jnp.full((BB, 1), -1, jnp.int32)], axis=1
        )
        m = bj == av
        sub = jnp.where(m, jnp.int32(match), jnp.int32(mismatch))
        j = i + band_min + d_idx
        valid = (j >= 0) & (j <= b_len) & (i <= a_len)
        at_j0 = j == 0

        prev_up = jnp.concatenate([prev[:, 1:], neg[:, :1]], axis=1)
        diag_cand = prev + sub
        up_cand = prev_up + gap_i
        base = jnp.maximum(diag_cand, up_cand)
        base = jnp.where(at_j0, jnp.maximum(base, 0), base)
        run = base - dgap
        stp = 1
        while stp < W:
            shifted = jnp.concatenate([neg[:, :stp], run[:, :-stp]], axis=1)
            run = jnp.maximum(run, shifted)
            stp *= 2
        V = run + dgap
        V = jnp.where(valid, V, NEG_INF)

        came_left = V > base
        d2 = jnp.where(
            came_left,
            jnp.int32(LEFT),
            jnp.where(
                base == diag_cand,
                jnp.where(m, jnp.int32(0), jnp.int32(1)),
                jnp.int32(UP),
            ),
        )

        iscol = (j == b_len) & valid
        endm = iscol | ((i == a_len) & valid)
        mv = jnp.where(endm, V, NEG_INF)
        bv = bv_ref[...]
        bt = mv > bv
        bv_ref[...] = jnp.where(bt, mv, bv)
        bim_new = jnp.where(iscol, 2 * i, 2 * i + 1)
        bim_ref[...] = jnp.where(bt, bim_new, bim_ref[...])
        return V, d2

    def rows16(t16, prev):
        base_r = t16 * 16
        prev, packed = forward_row(base_r, prev)
        for t in range(1, 16):
            prev, d2 = forward_row(base_r + t, prev)
            packed = packed | (d2 << (2 * t))
        dirs_ref[0, t16] = packed
        return prev

    prev_ref[...] = jax.lax.fori_loop(0, R // 16, rows16, prev_ref[...])

    # Best-end selection (cheap; rewritten every block, last wins).
    bestv = bv_ref[...]
    bestim = bim_ref[...]
    maxv = jnp.max(bestv, axis=1, keepdims=True)
    cand = bestv == maxv
    mini = jnp.min(jnp.where(cand, bestim, BIG), axis=1, keepdims=True)
    cand2 = cand & (bestim == mini)
    best_ref[0, :, :] = maxv
    bi_ref[0, :, :] = mini >> 1
    bd_ref[0, :, :] = jnp.min(
        jnp.where(cand2, d_idx, W), axis=1, keepdims=True
    )


def _tb_chunked_kernel(
    bi_ref,  # (1, BB, 1) int32
    bd_ref,  # (1, BB, 1)
    band_min_ref,  # (1, BB, 1)
    dirs_ref,  # (1, R//16, BB, W) int32, 2-bit packed, REVERSE g order
    mj_ref,  # (1, R, BB) int32 OUT, same reverse order
    entry_ref,  # (BB, 1) int32 scratch (persists across g)
    jb_ref,  # (BB, 1) int32 scratch
    *,
    LA: int,
    W: int,
    R: int = _CHUNK_R,
):
    """Traceback over the streamed dirs blocks, walked in reverse row
    order (the grid's second axis maps to LA//R - 1 - g). Codes as in
    _kernel's traceback: 0 = DIAG match, 1 = DIAG mismatch, 2 = UP,
    3 = LEFT; j == 0 remaps to terminal 4."""
    BB = bi_ref.shape[1]
    g = pl.program_id(1)
    nG = LA // R
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (BB, W), 1)
    d8 = d_idx * 8
    bi = bi_ref[0, :, :]
    bd = bd_ref[0, :, :]
    band_min = band_min_ref[0, :, :]

    @pl.when(g == 0)
    def _init():
        entry_ref[...] = jnp.full((BB, 1), -1, jnp.int32)
        jb_ref[...] = band_min + LA

    def tb_row(r, carry, code2):
        entry_d, jb = carry
        i = (nG - 1 - g) * R + r + 1  # global row
        entry_d = jnp.where(i == bi, bd, entry_d)
        j_row = jb + d_idx
        adj = jnp.where(j_row == 0, jnp.int32(4), code2)
        elig = (d_idx <= entry_d) & (adj != jnp.int32(LEFT))
        key = jnp.where(elig, d8 + adj, -1)
        kmax = jnp.max(key, axis=1, keepdims=True)
        exit_d = kmax >> 3
        acode = kmax & 7
        j_exit = jb + exit_d
        is_match = (acode == 0) & (j_exit > 0)
        mj_ref[0, pl.ds(r, 1), :] = jnp.where(
            is_match, j_exit - 1, -1
        ).reshape(1, BB)
        entry_d = jnp.where(
            acode <= 1, exit_d, jnp.where(acode == 2, exit_d + 1, -1)
        )
        entry_d = jnp.where(entry_d >= W, -1, entry_d)
        return entry_d, jb - 1

    def tb_rows16(t16, carry):
        base = t16 * 16
        packed = dirs_ref[0, (R - base) // 16 - 1]
        for t in range(16):
            r = R - 1 - (base + t)  # r % 16 == 15 - t
            code2 = (packed >> (2 * (15 - t))) & 3
            carry = tb_row(r, carry, code2)
        return carry

    entry, jb = jax.lax.fori_loop(
        0, R // 16, tb_rows16, (entry_ref[...], jb_ref[...])
    )
    entry_ref[...] = entry
    jb_ref[...] = jb


def _invoke_chunked(
    a_pad, b_pad, a_len, b_len, band_min, B0, BB,
    *, LA, LB, W, match, mismatch, gap, pack_u8=False, chunk_r=_CHUNK_R
):
    """Two-kernel launch for shapes whose dirs scratch exceeds VMEM:
    the forward kernel streams dirs to HBM, the traceback kernel walks
    the blocks back in reverse. Output identical to :func:`_invoke`."""
    B = a_pad.shape[0]
    LEFTPAD, R0, LBP, LAP = _geometry(LA, LB, W)
    R = chunk_r
    nB, nG = B // BB, LA // R
    fwd = functools.partial(
        _fwd_chunked_kernel, LA=LA, LB=LB, W=W, match=match,
        mismatch=mismatch, gap=gap, R=R,
    )
    lens3 = lambda x: x.reshape(nB, BB, 1)  # noqa: E731
    dirs, best, bi, bd = pl.pallas_call(
        fwd,
        grid=(nB, nG),
        in_specs=[
            pl.BlockSpec((BB, LAP), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, LBP), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, R // 16, BB, W), lambda i, g: (i * nG + g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, BB, 1), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nB * nG, R // 16, BB, W), jnp.int32),
            jax.ShapeDtypeStruct((nB, BB, 1), jnp.int32),
            jax.ShapeDtypeStruct((nB, BB, 1), jnp.int32),
            jax.ShapeDtypeStruct((nB, BB, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, W), jnp.int32),
            pltpu.VMEM((BB, W + R), jnp.int32),
            pltpu.VMEM((BB, 2 * R), jnp.int32),
            pltpu.VMEM((BB, W), jnp.int32),
            pltpu.VMEM((BB, W), jnp.int32),
        ],
    )(
        a_pad,
        b_pad,
        lens3(a_len),
        lens3(b_len),
        lens3(band_min),
    )

    tbk = functools.partial(_tb_chunked_kernel, LA=LA, W=W, R=R)
    mj = pl.pallas_call(
        tbk,
        grid=(nB, nG),
        in_specs=[
            pl.BlockSpec((1, BB, 1), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, R // 16, BB, W),
                lambda i, g, nG=nG: (i * nG + (nG - 1 - g), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, R, BB),
            lambda i, g, nG=nG: (i * nG + (nG - 1 - g), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nB * nG, R, BB), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BB, 1), jnp.int32),
            pltpu.VMEM((BB, 1), jnp.int32),
        ],
    )(bi, bd, lens3(band_min), dirs)

    # (nB*nG, R, BB) -> (LA, B)
    mj = jnp.transpose(
        mj.reshape(nB, LA, BB), (1, 0, 2)
    ).reshape(LA, B)
    best = best.reshape(B)
    return _fuse_outputs(
        mj, best, band_min, B0, LA=LA, LB=LB, W=W, match=match,
        pack_u8=pack_u8,
    )


def _metrics_from_mj(mj, best, LA):
    """AlignmentInfo metrics from the (LA, B) match matrix, plain XLA.

    Same registers as the reference AlignmentInfo (src/Alignment.hpp):
    [count, min_o0, max_o0, min_o1, max_o1, min_offset, max_offset,
    max_skip, max_drift, best_score, 0 x 6].
    """
    Bn = mj.shape[1]
    valid = mj >= 0
    iota = jnp.arange(LA, dtype=jnp.int32)[:, None]
    count = jnp.sum(valid, axis=0, dtype=jnp.int32)
    mn0 = jnp.min(jnp.where(valid, iota, BIG), axis=0)
    mx0 = jnp.max(jnp.where(valid, iota, -BIG), axis=0)
    mn1 = jnp.min(jnp.where(valid, mj, BIG), axis=0)
    mx1 = jnp.max(jnp.where(valid, mj, -BIG), axis=0)
    off = iota - mj
    mnoff = jnp.min(jnp.where(valid, off, BIG), axis=0)
    mxoff = jnp.max(jnp.where(valid, off, -BIG), axis=0)
    # Consecutive-match skip/drift: pack (o0 << 16 | o1), cummax gives
    # each row the latest match at or above it; shift by one row for
    # the previous match.
    key = jnp.where(valid, (iota << 16) | mj, -1)
    ck = jax.lax.cummax(key, axis=0)
    pk = jnp.concatenate(
        [jnp.full((1, Bn), -1, jnp.int32), ck[:-1]], axis=0
    )
    pv = valid & (pk >= 0)
    pi = pk >> 16
    po1 = pk & 0xFFFF
    skip = jnp.max(
        jnp.where(pv, jnp.maximum(iota - pi, jnp.abs(mj - po1)), 0), axis=0
    )
    drift = jnp.max(jnp.where(pv, jnp.abs(off - (pi - po1)), 0), axis=0)
    zero = jnp.zeros_like(count)
    return jnp.stack(
        [count, mn0, mx0, mn1, mx1, mnoff, mxoff, skip, drift, best]
        + [zero] * 6,
        axis=1,
    )


def _band_normalize(b, band_min, *, LA, LB, W):
    """Band-normalized b: b_norm[t] = b[t + band_min] (pad -2 outside
    [0, LB)), built with log-step masked lane shifts — pure vector
    ops. A per-row take_along_axis gather here lowers to a scalar XLA
    gather that costs more than the whole DP (measured 2.7x end-to-end
    kernel slowdown); the masked shifts run at vector-copy speed."""
    B = b.shape[0]
    LEFTPAD, R, LBP, LAP = _geometry(LA, LB, W)
    PADW = _round128(LEFTPAD + LB)
    b_wide = jnp.full((B, PADW), -2, jnp.int32)
    b_wide = jax.lax.dynamic_update_slice(b_wide, b, (0, LEFTPAD))
    s = (band_min + LEFTPAD)[:, None]  # in [0, LB + LEFTPAD]
    k = 1
    while k * 2 <= LB + LEFTPAD:
        k *= 2
    while k >= 1:
        sh = jnp.concatenate(
            [b_wide[:, k:], jnp.full((B, k), -2, jnp.int32)], axis=1
        )
        b_wide = jnp.where((s & k) != 0, sh, b_wide)
        k //= 2
    return b_wide[:, :LBP]


@functools.partial(
    jax.jit,
    static_argnames=(
        "LA", "LB", "W", "match", "mismatch", "gap", "pack_u8",
        "force_chunked", "chunk_r", "waves",
    ),
)
def banded_align_pairs(
    a, a_len, b, b_len, band_min, *, LA, LB, W, match, mismatch, gap,
    pack_u8=False, force_chunked=False, chunk_r=None, waves=None
):
    """Forward + traceback for a batch of candidate pairs.

    a: (B, LA) int32 (pad -1), b: (B, LB) int32 (pad -2).
    Returns one int32 array (B, 16 + LA):
    - columns 0..15: metrics [count, min_o0, max_o0, min_o1, max_o1,
      min_offset, max_offset, max_skip, max_drift, best_score, 0...]
      (the reference AlignmentInfo fields, src/Alignment.hpp);
    - column 16 + i: the matched ordinal1 for ordinal0 == i, or -1
      (at most one match per ordinal0 on a banded path).
    """
    B0 = a.shape[0]
    BB = 0 if force_chunked else _block_pairs(LA, W, LB)
    chunked = BB == 0
    if os.environ.get("SHASTA_TPU_PROF"):
        _log_shape_once(LA, LB, W, BB, chunked)
    if chunked:
        chunk_r = chunk_r or _chunk_r_default()
        BB = _chunked_block_pairs(LA, LB, W, chunk_r)
        if BB == 0 and chunk_r != _CHUNK_R:
            chunk_r = _CHUNK_R  # experimental R invalid for this shape
            BB = _chunked_block_pairs(LA, LB, W, chunk_r)
    else:
        chunk_r = _CHUNK_R
    if BB == 0:
        raise ValueError(f"shape (LA={LA}, W={W}) too large for the kernel")
    # Pad the batch to a block multiple (padded pairs have length 0).
    B = ((B0 + BB - 1) // BB) * BB
    if B != B0:
        pad = B - B0
        a = jnp.concatenate([a, jnp.full((pad, LA), -1, a.dtype)])
        b = jnp.concatenate([b, jnp.full((pad, LB), -2, b.dtype)])
        a_len = jnp.concatenate([a_len, jnp.zeros(pad, a_len.dtype)])
        b_len = jnp.concatenate([b_len, jnp.zeros(pad, b_len.dtype)])
        band_min = jnp.concatenate([band_min, jnp.zeros(pad, band_min.dtype)])
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    a_len = a_len.astype(jnp.int32)
    b_len = b_len.astype(jnp.int32)
    band_min = band_min.astype(jnp.int32)

    # Bands entirely outside the matrix would break the window
    # arithmetic; mark those pairs empty and clamp.
    LEFTPAD, R, LBP, LAP = _geometry(LA, LB, W)
    band_ok = (band_min >= -LEFTPAD) & (band_min <= LB)
    a_len = jnp.where(band_ok, a_len, 0)
    band_min = jnp.clip(band_min, -LEFTPAD, LB)

    b_pad = _band_normalize(b, band_min, LA=LA, LB=LB, W=W)

    # a right-padded so every window refill slice stays in bounds.
    a_pad = jnp.full((B, LAP), -1, jnp.int32)
    a_pad = jax.lax.dynamic_update_slice(a_pad, a, (0, 0))

    if chunked:
        return _invoke_chunked(
            a_pad, b_pad, a_len, b_len, band_min, B0, BB,
            LA=LA, LB=LB, W=W, match=match, mismatch=mismatch, gap=gap,
            pack_u8=pack_u8, chunk_r=chunk_r,
        )
    if waves is None:
        waves = int(os.environ.get("SHASTA_TPU_WAVES", "1"))
    return _invoke(
        a_pad, b_pad, a_len, b_len, band_min, B0, BB,
        LA=LA, LB=LB, W=W, match=match, mismatch=mismatch, gap=gap,
        pack_u8=pack_u8, waves=waves,
    )


@functools.partial(jax.jit, static_argnames=("fill",))
def _take_rows(mat, row, lens, *, fill):
    """Whole-row take from a class matrix, re-filled beyond each row's
    length. XLA-only — compiles fast and keeps the class-matrix row
    count out of the DP kernel's jit signature (which is shared with
    the host-padded path and lives in the persistent compile cache)."""
    t = jnp.arange(mat.shape[1], dtype=jnp.int32)[None, :]
    x = jnp.take(mat, row.astype(jnp.int32), axis=0)
    return jnp.where(t < lens[:, None], x, jnp.int32(fill))


def banded_align_pairs_take(
    mat_a, rowa, mat_b, rowb, a_len, b_len, band_min, n_real,
    *, LA, LB, W, match, mismatch, gap, pack_u8=False
):
    """Forward + traceback with DEVICE-side batch construction via
    whole-row takes from per-length-class padded marker matrices.

    mat_a/mat_b are device-resident (n_class_rows, LA/LB) matrices of
    marker k-mer ids (-1-filled beyond each row's length, built once
    per stage per length class); rowa/rowb are class-local row ids.
    Only the tiny id/length arrays cross the host->device relay per
    batch. A whole-row take lowers to fast contiguous HBM reads
    (measured 40+ GB/s) where an index-matrix gather from the flat CSR
    runs at ~0.6 GB/s — in an interleaved on-chip A/B the take feed
    runs feed+DP at the bare-kernel roofline. Output is identical to
    :func:`banded_align_pairs` on the gathered rows.
    """
    rowa = np.asarray(rowa)
    rowb = np.asarray(rowb)
    a_len = np.array(a_len, np.int32)
    b_len = np.array(b_len, np.int32)
    band_min = np.asarray(band_min, np.int32)
    n = int(n_real)
    a_len[n:] = 0
    b_len[n:] = 0
    a = _take_rows(mat_a, jnp.asarray(rowa), jnp.asarray(a_len), fill=-1)
    b = _take_rows(mat_b, jnp.asarray(rowb), jnp.asarray(b_len), fill=-2)
    return banded_align_pairs(
        a, a_len, b, b_len, band_min,
        LA=LA, LB=LB, W=W, match=match, mismatch=mismatch, gap=gap,
        pack_u8=pack_u8,
    )


def band_reduce(o1_of_o0, band_min, orda, ordb, *, packed):
    """Per-pair band bounds from the kernel's matched pairs, ON DEVICE.

    Band discovery (method-3 phase 1) only needs, per pair, the
    min/max ordinal offset over the matched downsampled markers
    (reference: AssemblerAlign3.cpp:233-239 computes the same range
    from the SeqAn alignment). Reducing it on device means a phase-1
    batch fetches 3 ints per pair instead of the (B, LA) match matrix
    — ~50x less traffic through the host relay.

    o1_of_o0: packed (B, LA) uint8 deltas (255 = no match; matched
    column j = delta + i + band_min) or fused int32 (B, LA) matched
    j per i (-1 = no match). orda/ordb map downsampled indices back
    to original marker ordinals ((B, LA)/(B, LB), any fill).
    Returns (B, 3) int32 [match_count, min_offset, max_offset] with
    offset = orda[i] - ordb[j].
    """
    B, LA = o1_of_o0.shape
    LB = ordb.shape[1]
    if packed:
        matched = o1_of_o0 != jnp.uint8(255)
        i_idx = jnp.arange(LA, dtype=jnp.int32)[None, :]
        j = o1_of_o0.astype(jnp.int32) + i_idx + band_min[:, None]
    else:
        matched = o1_of_o0 >= 0
        j = o1_of_o0
    jc = jnp.clip(j, 0, LB - 1)
    ob = jnp.take_along_axis(ordb, jc, axis=1)
    off = orda.astype(jnp.int32) - ob.astype(jnp.int32)
    big = jnp.int32(2**30)
    omin = jnp.min(jnp.where(matched, off, big), axis=1)
    omax = jnp.max(jnp.where(matched, off, -big), axis=1)
    cnt = matched.sum(axis=1).astype(jnp.int32)
    return jnp.stack([cnt, omin, omax], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("LA", "LB", "W", "match", "mismatch", "gap"),
)
def _band_take_jit(
    mat_a, rowa, ord_mat_a, mat_b, rowb, ord_mat_b,
    a_len, b_len, band_min,
    *, LA, LB, W, match, mismatch, gap,
):
    a = _take_rows(mat_a, rowa, a_len, fill=-1)
    b = _take_rows(mat_b, rowb, b_len, fill=-2)
    pack = W <= 254
    out = banded_align_pairs(
        a, a_len, b, b_len, band_min,
        LA=LA, LB=LB, W=W, match=match, mismatch=mismatch, gap=gap,
        pack_u8=pack,
    )
    orda = _take_rows(ord_mat_a, rowa, a_len, fill=0)
    ordb = _take_rows(ord_mat_b, rowb, b_len, fill=0)
    if pack:
        _met, delta = out
        return band_reduce(delta, band_min, orda, ordb, packed=True)
    return band_reduce(out[:, 16:], band_min, orda, ordb, packed=False)


def banded_align_band_take(
    mat_a, rowa, ord_mat_a, mat_b, rowb, ord_mat_b,
    a_len, b_len, band_min, n_real,
    *, LA, LB, W, match, mismatch, gap,
):
    """Band-discovery launch: take-feed -> banded DP -> on-device band
    reduction, one fused device program. Returns (B, 3) int32
    [match_count, min_offset, max_offset] per pair (pairs beyond
    n_real report count 0)."""
    rowa = np.asarray(rowa)
    rowb = np.asarray(rowb)
    a_len = np.array(a_len, np.int32)
    b_len = np.array(b_len, np.int32)
    band_min = np.asarray(band_min, np.int32)
    n = int(n_real)
    a_len[n:] = 0
    b_len[n:] = 0
    return _band_take_jit(
        mat_a, jnp.asarray(rowa), ord_mat_a,
        mat_b, jnp.asarray(rowb), ord_mat_b,
        jnp.asarray(a_len), jnp.asarray(b_len), jnp.asarray(band_min),
        LA=LA, LB=LB, W=W, match=match, mismatch=mismatch, gap=gap,
    )


def _invoke(
    a_pad, b_pad, a_len, b_len, band_min, B0, BB,
    *, LA, LB, W, match, mismatch, gap, pack_u8=False, waves=1
):
    """Launch the kernel on pre-padded inputs and fuse the outputs."""
    B = a_pad.shape[0]
    LEFTPAD, R, LBP, LAP = _geometry(LA, LB, W)
    grid = (B // BB,)
    if waves > 1 and BB // waves >= 8 and BB % waves == 0:
        kernel = functools.partial(
            _kernel_waves, LA=LA, LB=LB, W=W, LEFTPAD=LEFTPAD,
            match=match, mismatch=mismatch, gap=gap, waves=waves,
        )
    else:
        kernel = functools.partial(
            _kernel, LA=LA, LB=LB, W=W, LEFTPAD=LEFTPAD, match=match,
            mismatch=mismatch, gap=gap,
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, LAP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, LBP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, LA, BB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B // BB, LA, BB), jnp.int32),
            jax.ShapeDtypeStruct((B // BB, BB, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LA // 16, BB, W), jnp.int32),
            pltpu.VMEM((BB, 2 * W), jnp.int32),
            pltpu.VMEM((BB, 2 * R), jnp.int32),
            pltpu.VMEM((BB, W), jnp.int32),
            pltpu.VMEM((BB, W), jnp.int32),
        ],
    )(
        a_pad,
        b_pad,
        a_len.reshape(B // BB, BB, 1),
        b_len.reshape(B // BB, BB, 1),
        band_min.reshape(B // BB, BB, 1),
    )
    mj, best = out
    mj = jnp.transpose(mj, (1, 0, 2)).reshape(LA, B)
    return _fuse_outputs(
        mj, best.reshape(B), band_min, B0, LA=LA, LB=LB, W=W, match=match,
        pack_u8=pack_u8,
    )


def _fuse_outputs(mj, best, band_min, B0, *, LA, LB, W, match, pack_u8):
    """Metrics + transfer packing shared by the monolithic and chunked
    launch paths."""
    metrics = _metrics_from_mj(mj, best, LA)
    int16_ok = (
        LA <= 2048 and LB <= 2048 and W <= 2048 and LA * match <= 32000
        and os.environ.get("SHASTA_TPU_INT16", "1") != "0"
    )
    if pack_u8 and W <= 254:
        # Band-relative packing: the kernel only matches within the
        # band j - i - band_min in [0, W), so the matched ordinal1 is
        # stored as that uint8 offset (255 = no match) — a 2-4x
        # smaller device->host transfer than absolute int16/int32
        # ordinals. Decoded host-side as delta + i + band_min.
        mjT = mj.T[:B0]
        delta = mjT - jnp.arange(LA, dtype=jnp.int32)[None, :] - band_min[:B0, None]
        packed = jnp.where(mjT >= 0, delta, 255).astype(jnp.uint8)
        met = metrics[:B0]
        if int16_ok:
            met = met.astype(jnp.int16)
        return met, packed
    if pack_u8 and W <= 65534:
        # Wide bands (W > 254) pack the same band-relative delta as
        # uint16 (65535 = no match). Same bytes as the int16 fused
        # output, but the DELTA layout is what the device-side
        # kept-pair compaction consumes (_compact_kept) — making wide
        # classes compactable/drainable keeps phase-2 HBM residency
        # bounded at 100 Mb-scale runs (the int16 fused outputs of
        # every W=512 batch co-resident was part of the SCALE=100
        # RESOURCE_EXHAUSTED).
        mjT = mj.T[:B0]
        delta = mjT - jnp.arange(LA, dtype=jnp.int32)[None, :] - band_min[:B0, None]
        packed = jnp.where(mjT >= 0, delta, 65535).astype(jnp.uint16)
        met = metrics[:B0]
        if int16_ok:
            met = met.astype(jnp.int16)
        return met, packed
    # mj is (LA, B): row i holds the matched ordinal1 for ordinal0 = i
    # (or -1). Row order IS path order, no sort needed. Metrics and
    # matches are fused into ONE output array: device->host
    # round-trips through a tunneled TPU have ~150 ms latency each.
    fused = jnp.concatenate([metrics, mj.T], axis=1)[:B0]
    if int16_ok:
        # Every fused value (ordinals, offsets, skip/drift, score)
        # provably fits int16 at these shapes; halving the bytes
        # roughly halves the tunneled device->host transfer time.
        fused = fused.astype(jnp.int16)
    return fused
