"""Pallas TPU kernel for batched banded marker alignment.

The jnp reference implementation (shasta_tpu.ops.align._banded_forward
+ traceback) expresses the DP as a lax.scan over rows: every row is a
separate XLA op dispatch on a small (B, W) slab, which makes the whole
alignment latency-bound (~150 ms per batch where the arithmetic is
~1 ms). This kernel keeps the entire DP in VMEM and loops over rows
*inside* one kernel launch:

- NO gathers anywhere: the banded b-window advances by exactly one
  lane per row, so each pair keeps a (2W,) sliding window in VMEM that
  shifts once per row and refills every min(W, LA) rows from an
  ALIGNED slice (lane start rounded down to 128) followed by a
  log-step masked shift — XLA's element gather for the same banded
  extraction costs ~15x the whole DP;
- grid over pair-blocks of BB pairs; the per-block direction matrix
  (BB, LA, W) lives in VMEM scratch;
- the banded row update is pure VPU work on (BB, W) tiles: the in-row
  gap dependency is a log2(W)-step prefix max (the same cummax trick
  as the jnp kernel);
- the traceback runs in-kernel over the VMEM direction matrix and
  emits matched ordinal pairs directly.

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
STOP, DIAG, UP, LEFT = 0, 1, 2, 3

# VMEM budget: sub block (double-buffered) + dirs scratch, int32 each.
_VMEM_BUDGET = 10 * 1024 * 1024


def _block_pairs(LA: int, W: int) -> int:
    # dirs scratch (1 byte/cell) dominates; keep headroom for the
    # window, a/b blocks and double buffering. Blocks below 8 pairs
    # violate the sublane tiling constraints of the 2D input blocks,
    # so oversized shapes fall back to the jnp path (0 = unsupported).
    bb = _VMEM_BUDGET // max(1, 2 * LA * W)
    for cand in (32, 16, 8):
        if bb >= cand:
            return cand
    return 0


def supported(LA: int, W: int) -> bool:
    return _block_pairs(LA, W) >= 1


def _kernel(
    a_ref,  # (BB, LAP) int32: a right-padded to LA + R lanes
    b_ref,  # (BB, LBP) int32: left-padded b (pad value -2)
    a_len_ref,  # (1, BB, 1) int32
    b_len_ref,  # (1, BB, 1) int32
    band_min_ref,  # (1, BB, 1) int32 (pre-clamped by the host)
    mj_ref,  # (1, LA, BB) int32 out: per-row matched ordinal1 or -1
    best_ref,  # (1, BB, 1) int32 out
    metrics_ref,  # (1, BB, 16) int32 out: AlignmentInfo computed in-kernel
    dirs_ref,  # (LA, BB, W) int8 scratch: dir code | match bit
    w_ref,  # (BB, 2W) int32 scratch: per-pair sliding b window
    aw_ref,  # (BB, 2R) int32 scratch: sliding a window
    *,
    LA: int,
    W: int,
    LEFTPAD: int,
    match: int,
    mismatch: int,
    gap: int,
):
    BB = a_ref.shape[0]
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (BB, W), 1)
    neg = jnp.full((BB, W), NEG_INF, jnp.int32)
    gap_i = jnp.int32(gap)
    a_len = a_len_ref[0, :, :]
    b_len = b_len_ref[0, :, :]
    band_min = band_min_ref[0, :, :]
    CH = 2 * W + 128  # refill chunk width (aligned slice)

    # Row 0: V[0][j] = 0 for 0 <= j <= b_len inside the band.
    j0 = band_min + d_idx
    prev0 = jnp.where((j0 >= 0) & (j0 <= b_len), 0, NEG_INF).astype(jnp.int32)

    def refill(i0, g, R):
        """Load each pair's b window b_pad[base .. base + 2W) where
        base = band_min + (i0 - 1) + LEFTPAD: one ALIGNED dynamic
        slice per pair plus a log-step masked shift by base % 128.
        The a window refills with one aligned slice for all pairs."""
        aw_ref[...] = a_ref[:, pl.ds(pl.multiple_of(g * R, 128), 2 * R)]
        for p in range(BB):
            base = band_min_ref[0, p, 0] + (i0 - 1) + LEFTPAD
            astart = (base // 128) * 128
            sh = base - astart
            chunk = b_ref[p, pl.ds(pl.multiple_of(astart, 128), CH)]
            chunk = chunk.reshape(1, CH)
            k = 64
            while k >= 1:
                shifted = jnp.concatenate(
                    [chunk[:, k:], jnp.zeros((1, k), jnp.int32)], axis=1
                )
                chunk = jnp.where((sh & k) != 0, shifted, chunk)
                k //= 2
            w_ref[pl.ds(p, 1), :] = chunk[:, : 2 * W]

    def forward_row(i, carry):
        prev, best_val, best_i, best_d = carry

        win = w_ref[...]
        bj = win[:, :W]  # b[j-1] for this row's band cells
        aw = aw_ref[...]
        av = aw[:, :1]  # a[i-1], first lane of the sliding a window
        # Advance both windows one lane for the next row.
        w_ref[...] = jnp.concatenate(
            [win[:, 1:], jnp.full((BB, 1), -2, jnp.int32)], axis=1
        )
        aw_ref[...] = jnp.concatenate(
            [aw[:, 1:], jnp.full((BB, 1), -1, jnp.int32)], axis=1
        )
        sub = jnp.where(bj == av, jnp.int32(match), jnp.int32(mismatch))
        j = i + band_min + d_idx  # (BB, W)
        valid = (j >= 0) & (j <= b_len) & (i <= a_len)
        at_j0 = j == 0

        prev_up = jnp.concatenate([prev[:, 1:], neg[:, :1]], axis=1)
        diag_cand = prev + sub
        up_cand = prev_up + gap_i
        base = jnp.maximum(diag_cand, up_cand)
        base = jnp.where(at_j0, jnp.maximum(base, 0), base)

        # Prefix max along lanes: V[d] = max_{d'<=d} base[d'] + (d-d')*gap.
        run = base - d_idx * gap_i
        s = 1
        while s < W:
            shifted = jnp.concatenate([neg[:, :s], run[:, :-s]], axis=1)
            run = jnp.maximum(run, shifted)
            s *= 2
        V = run + d_idx * gap_i
        V = jnp.where(valid, V, NEG_INF)

        came_left = V > base
        dirs = jnp.where(
            came_left,
            jnp.int32(LEFT),
            jnp.where(base == diag_cand, jnp.int32(DIAG), jnp.int32(UP)),
        )
        dirs = jnp.where(at_j0 & (V == 0), jnp.int32(STOP), dirs)
        dirs = jnp.where(valid, dirs, jnp.int32(STOP))
        # Pack the cell's match flag into bit 2 so the traceback needs
        # a single memory read per step.
        dirs = dirs | jnp.where(sub == jnp.int32(match), jnp.int32(4), 0)
        dirs_ref[i - 1] = dirs.astype(jnp.int8)

        # Best end over the last column (j == b_len)...
        in_last_col = (j == b_len) & valid
        col_vals = jnp.where(in_last_col, V, NEG_INF)
        col_best = jnp.max(col_vals, axis=1, keepdims=True)
        col_best_d = jnp.min(
            jnp.where(col_vals == col_best, d_idx, W), axis=1, keepdims=True
        )
        better = col_best > best_val
        best_val = jnp.where(better, col_best, best_val)
        best_i = jnp.where(better, i, best_i)
        best_d = jnp.where(better, col_best_d, best_d)

        # ... and the last row (i == a_len).
        at_last_row = (i == a_len) & valid
        row_vals = jnp.where(at_last_row, V, NEG_INF)
        row_best = jnp.max(row_vals, axis=1, keepdims=True)
        row_best_d = jnp.min(
            jnp.where(row_vals == row_best, d_idx, W), axis=1, keepdims=True
        )
        better2 = row_best > best_val
        best_val = jnp.where(better2, row_best, best_val)
        best_i = jnp.where(better2, i, best_i)
        best_d = jnp.where(better2, row_best_d, best_d)

        return V, best_val, best_i, best_d

    zero1 = jnp.zeros((BB, 1), jnp.int32)
    init = (prev0, jnp.full((BB, 1), NEG_INF, jnp.int32), zero1, zero1)

    # Group structure: refill the window every R rows; rows run with a
    # manual 8x unroll (per-iteration scalar/control overhead is
    # significant at this row size).
    R = min(W, LA)
    assert LA % R == 0 and R % 8 == 0 and R % 128 == 0

    def group(g, carry):
        i0 = g * R + 1
        refill(i0, g, R)

        def rows8(t8, carry):
            base_i = i0 + t8 * 8
            for t in range(8):
                carry = forward_row(base_i + t, carry)
            return carry

        return jax.lax.fori_loop(0, R // 8, rows8, carry)

    V, best_val, best_i, best_d = jax.lax.fori_loop(0, LA // R, group, init)
    best_ref[0, :, :] = best_val

    # ---- Traceback: vectorized backward row sweep ----
    # The optimal path crosses each row boundary exactly once, so each
    # row holds at most one DIAG step (one match). Sweeping rows from
    # the bottom, the path's cells inside a row are the entry cell
    # plus its LEFT-run, resolved with log-step propagation — all
    # (BB, W) vector ops, no per-pair scalar walks.
    BIG = jnp.int32(1 << 29)
    zcol = jnp.zeros((BB, 1), jnp.int32)

    def shift_down(x, k):
        # y[d] = x[d + k] (toward lower lanes), zero-filled.
        return jnp.concatenate(
            [x[:, k:], jnp.zeros((BB, k), x.dtype)], axis=1
        )

    def shift_up(x, k):
        # y[d] = x[d - k].
        return jnp.concatenate(
            [jnp.zeros((BB, k), x.dtype), x[:, :-k]], axis=1
        )

    def tb_row(t, carry):
        (entry, count, mn0, mx0, mn1, mx1, mnoff, mxoff,
         mxskip, mxdrift, l0, l1, loff) = carry
        i = LA - t  # row index, LA down to 1
        row = dirs_ref[i - 1].astype(jnp.int32)  # (BB, W)
        j_row = i + band_min + d_idx

        # Activate pairs whose best end is in this row.
        entry = entry | ((d_idx == best_d) & (i == best_i)).astype(jnp.int32)

        # Cells with j == 0 are terminal (the walk stops there).
        row = jnp.where(j_row == 0, 0, row)
        code = row & 3
        is_left = (code == LEFT).astype(jnp.int32)

        # Propagate the entry through LEFT runs (pointer doubling).
        v = entry
        run = shift_down(is_left, 1)  # run[d] = LEFT at d+1
        k = 1
        while k < W:
            v = v | (shift_down(v, k) & run)
            run = run & shift_down(run, k)
            k *= 2

        exit_mask = (v == 1) & (code != LEFT)
        code_exit = jnp.max(jnp.where(exit_mask, row, 0), axis=1, keepdims=True)
        j_exit = jnp.max(
            jnp.where(exit_mask, j_row, -BIG), axis=1, keepdims=True
        )
        dc = code_exit & 3
        is_match = (dc == DIAG) & ((code_exit & 4) != 0) & (j_exit > 0)

        # Emit this row's match (o0 = i-1 implicit, o1 = j_exit - 1).
        mj_ref[0, pl.ds(i - 1, 1), :] = jnp.where(
            is_match, j_exit - 1, -1
        ).reshape(1, BB)

        # AlignmentInfo registers (reverse path order visits).
        o0 = jnp.full((BB, 1), i - 1, jnp.int32)
        o1 = j_exit - 1
        off = o0 - o1
        has_prev = is_match & (count > 0)
        skip = jnp.maximum(jnp.abs(l0 - o0), jnp.abs(l1 - o1))
        drift = jnp.abs(loff - off)
        mxskip = jnp.where(has_prev, jnp.maximum(mxskip, skip), mxskip)
        mxdrift = jnp.where(has_prev, jnp.maximum(mxdrift, drift), mxdrift)
        mn0 = jnp.where(is_match, jnp.minimum(mn0, o0), mn0)
        mx0 = jnp.where(is_match, jnp.maximum(mx0, o0), mx0)
        mn1 = jnp.where(is_match, jnp.minimum(mn1, o1), mn1)
        mx1 = jnp.where(is_match, jnp.maximum(mx1, o1), mx1)
        mnoff = jnp.where(is_match, jnp.minimum(mnoff, off), mnoff)
        mxoff = jnp.where(is_match, jnp.maximum(mxoff, off), mxoff)
        l0 = jnp.where(is_match, o0, l0)
        l1 = jnp.where(is_match, o1, l1)
        loff = jnp.where(is_match, off, loff)
        count = count + is_match.astype(jnp.int32)

        # Next row's entry: DIAG keeps d, UP moves to d+1 (i.e. the
        # next row's entry lane is d_exit [DIAG] or d_exit + 1 [UP]).
        em = exit_mask.astype(jnp.int32)
        diag_next = em * (dc == DIAG).astype(jnp.int32)
        up_next = em * (dc == UP).astype(jnp.int32)
        entry = diag_next | shift_up(up_next, 1)
        return (entry, count, mn0, mx0, mn1, mx1, mnoff, mxoff,
                mxskip, mxdrift, l0, l1, loff)

    tb_init = (
        jnp.zeros((BB, W), jnp.int32), zcol, zcol + BIG, zcol - BIG,
        zcol + BIG, zcol - BIG, zcol + BIG, zcol - BIG, zcol, zcol,
        zcol, zcol, zcol,
    )

    def tb_rows8(t8, carry):
        base = t8 * 8
        for t in range(8):
            carry = tb_row(base + t, carry)
        return carry

    out = jax.lax.fori_loop(0, LA // 8, tb_rows8, tb_init)
    (_, count, mn0, mx0, mn1, mx1, mnoff, mxoff,
     mxskip, mxdrift, _, _, _) = out
    metrics = jnp.concatenate(
        [count, mn0, mx0, mn1, mx1, mnoff, mxoff, mxskip, mxdrift, best_val,
         zcol, zcol, zcol, zcol, zcol, zcol],
        axis=1,
    )
    metrics_ref[0, :, :] = metrics


@functools.partial(
    jax.jit, static_argnames=("LA", "LB", "W", "match", "mismatch", "gap")
)
def banded_align_pairs(
    a, a_len, b, b_len, band_min, *, LA, LB, W, match, mismatch, gap
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
    BB = _block_pairs(LA, W)
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
    LEFTPAD = LA + W
    band_ok = (band_min >= -LEFTPAD) & (band_min <= LB)
    a_len = jnp.where(band_ok, a_len, 0)
    band_min = jnp.clip(band_min, -LEFTPAD, LB)

    # Left-padded b: value at lane LEFTPAD + t is b[t]; pad = -2.
    CH = 2 * W + 128
    max_astart = LA - 1 + LB + LEFTPAD
    LBP = ((max_astart + CH + 127) // 128) * 128
    b_pad = jnp.full((B, LBP), -2, jnp.int32)
    b_pad = jax.lax.dynamic_update_slice(b_pad, b, (0, LEFTPAD))

    # a right-padded so every window refill slice stays in bounds.
    R = min(W, LA)
    LAP = LA + 2 * R
    a_pad = jnp.full((B, LAP), -1, jnp.int32)
    a_pad = jax.lax.dynamic_update_slice(a_pad, a, (0, 0))

    grid = (B // BB,)
    kernel = functools.partial(
        _kernel, LA=LA, W=W, LEFTPAD=LEFTPAD, match=match,
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
            pl.BlockSpec((1, BB, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B // BB, LA, BB), jnp.int32),
            jax.ShapeDtypeStruct((B // BB, BB, 1), jnp.int32),
            jax.ShapeDtypeStruct((B // BB, BB, 16), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LA, BB, W), jnp.int8),
            pltpu.VMEM((BB, 2 * W), jnp.int32),
            pltpu.VMEM((BB, 2 * R), jnp.int32),
        ],
    )(
        a_pad,
        b_pad,
        a_len.reshape(B // BB, BB, 1),
        b_len.reshape(B // BB, BB, 1),
        band_min.reshape(B // BB, BB, 1),
    )
    mj, best, metrics = out
    mj = jnp.transpose(mj, (1, 0, 2)).reshape(LA, B)
    metrics = metrics.reshape(B, 16)
    # mj is (LA, B): row i holds the matched ordinal1 for ordinal0 = i
    # (or -1). Row order IS path order, no sort needed. Metrics and
    # matches are fused into ONE output array: device->host
    # round-trips through a tunneled TPU have ~150 ms latency each.
    fused = jnp.concatenate([metrics, mj.T], axis=1)[:B0]
    if (
        LA <= 2048 and LB <= 2048 and W <= 2048 and LA * match <= 32000
        and os.environ.get("SHASTA_TPU_INT16", "1") != "0"
    ):
        # Every fused value (ordinals, offsets, skip/drift, score)
        # provably fits int16 at these shapes; halving the bytes
        # roughly halves the tunneled device->host transfer time.
        fused = fused.astype(jnp.int16)
    return fused
