"""Pallas TPU kernel for batched banded marker alignment.

The jnp reference implementation (shasta_tpu.ops.align._banded_forward
+ traceback) expresses the DP as a lax.scan over rows: every row is a
separate XLA op dispatch on a small (B, W) slab, which makes the whole
alignment latency-bound (~150 ms per batch where the arithmetic is
~1 ms). This kernel keeps the entire DP in VMEM and loops over rows
*inside* one kernel launch:

- the substitution matrix in band coordinates, sub[p, i-1, d] =
  match if a[p, i-1] == b[p, i-1+band_min[p]+d] else mismatch, is
  precomputed OUTSIDE the kernel by one vectorized XLA gather+compare
  (Mosaic cannot do lane-unaligned dynamic slices in-kernel, and this
  also removes every gather from the hot loop); band masks are cheap
  vector ops recomputed in-kernel from the per-pair scalars;
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
    bb = _VMEM_BUDGET // max(1, 3 * LA * W * 4)
    for cand in (8, 4, 2, 1):
        if bb >= cand:
            return cand
    return 0


def supported(LA: int, W: int) -> bool:
    return _block_pairs(LA, W) >= 1


def _kernel(
    sub_ref,  # (BB, LA, W) int32: match/mismatch score per band cell
    a_len_ref,  # (1, BB, 1) int32
    b_len_ref,  # (1, BB, 1) int32
    band_min_ref,  # (1, BB, 1) int32
    m0_ref,  # (1, NSTEPS, BB) int32 out
    m1_ref,  # (1, NSTEPS, BB) int32 out
    best_ref,  # (1, BB, 1) int32 out
    metrics_ref,  # (1, BB, 16) int32 out: AlignmentInfo computed in-kernel
    dirs_ref,  # (BB, LA, W) int32 scratch
    *,
    LA: int,
    W: int,
    NSTEPS: int,
    match: int,
    gap: int,
):
    BB = sub_ref.shape[0]
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (BB, W), 1)
    neg = jnp.full((BB, W), NEG_INF, jnp.int32)
    gap_i = jnp.int32(gap)
    a_len = a_len_ref[0, :, :]
    b_len = b_len_ref[0, :, :]
    band_min = band_min_ref[0, :, :]

    # Row 0: V[0][j] = 0 for 0 <= j <= b_len inside the band.
    j0 = band_min + d_idx
    prev0 = jnp.where((j0 >= 0) & (j0 <= b_len), 0, NEG_INF).astype(jnp.int32)

    def forward_row(i, carry):
        prev, best_val, best_i, best_d = carry

        sub = sub_ref[:, i - 1, :]
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
        dirs_ref[:, i - 1, :] = dirs

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
    V, best_val, best_i, best_d = jax.lax.fori_loop(1, LA + 1, forward_row, init)
    best_ref[0, :, :] = best_val

    # ---- Traceback ----
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    match_i = jnp.int32(match)

    BIG = jnp.int32(1 << 29)

    def tb_step(step, carry):
        (ii, dd, active_i, count, mn0, mx0, mn1, mx1, mnoff, mxoff,
         mxskip, mxdrift, l0, l1, loff) = carry
        active = active_i != 0
        jj = ii + band_min + dd

        dcodes = []
        subs = []
        for p in range(BB):
            row_i = jnp.clip(ii[p, 0] - 1, 0, LA - 1)
            drow = dirs_ref[p, row_i, :][None, :]
            srow = sub_ref[p, row_i, :][None, :]
            sel = lane == dd[p, 0]
            dcodes.append(jnp.max(jnp.where(sel, drow, 0), axis=1, keepdims=True))
            subs.append(
                jnp.max(jnp.where(sel, srow, NEG_INF), axis=1, keepdims=True)
            )
        dcode = jnp.concatenate(dcodes, axis=0)  # (BB, 1)
        subv = jnp.concatenate(subs, axis=0)

        active = active & (ii > 0) & (jj > 0) & (dcode != STOP)
        is_match = active & (dcode == DIAG) & (subv == match_i)

        m0_ref[0, pl.ds(step, 1), :] = jnp.where(is_match, ii - 1, -1).reshape(1, BB)
        m1_ref[0, pl.ds(step, 1), :] = jnp.where(is_match, jj - 1, -1).reshape(1, BB)

        # AlignmentInfo registers (reference: src/Alignment.cpp:4-29).
        # Matches are visited in reverse path order; skip/drift deltas
        # between consecutive visits equal the path-order deltas.
        o0 = ii - 1
        o1 = jj - 1
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

        di = jnp.where((dcode == DIAG) | (dcode == UP), 1, 0)
        dd_delta = jnp.where(dcode == UP, 1, jnp.where(dcode == LEFT, -1, 0))
        ii = jnp.where(active, ii - di, ii)
        dd = jnp.where(active, dd + dd_delta, dd)
        return (ii, dd, active.astype(jnp.int32), count, mn0, mx0, mn1, mx1,
                mnoff, mxoff, mxskip, mxdrift, l0, l1, loff)

    ones = jnp.ones((BB, 1), jnp.int32)
    z = jnp.zeros((BB, 1), jnp.int32)
    carry0 = (best_i, best_d, ones, z, z + BIG, z - BIG, z + BIG, z - BIG,
              z + BIG, z - BIG, z, z, z, z, z)
    out = jax.lax.fori_loop(0, NSTEPS, tb_step, carry0)
    (_, _, _, count, mn0, mx0, mn1, mx1, mnoff, mxoff,
     mxskip, mxdrift, _, _, _) = out
    metrics = jnp.concatenate(
        [count, mn0, mx0, mn1, mx1, mnoff, mxoff, mxskip, mxdrift, best_val,
         z, z, z, z, z, z],
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
    Returns one int32 array (B, 16 + min(LA, LB)):
    - columns 0..15: metrics [count, min_o0, max_o0, min_o1, max_o1,
      min_offset, max_offset, max_skip, max_drift, best_score, 0...]
      (the reference AlignmentInfo fields, src/Alignment.hpp);
    - columns 16..: matched ordinal pairs (ord0 << 16) | ord1 in path
      order; entries beyond the match count are INT32_MAX.
    """
    B = a.shape[0]
    BB = _block_pairs(LA, W)
    if BB == 0:
        raise ValueError(f"shape (LA={LA}, W={W}) too large for the kernel")
    if B % BB:
        raise ValueError(f"batch {B} not divisible by block {BB}")
    NSTEPS = LA + LB

    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    a_len = a_len.astype(jnp.int32)
    b_len = b_len.astype(jnp.int32)
    band_min = band_min.astype(jnp.int32)

    # Band-coordinate substitution matrix (one fused gather + compare).
    i_idx = jnp.arange(1, LA + 1, dtype=jnp.int32)[None, :, None]
    d_idx = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    jm1 = i_idx + band_min[:, None, None] + d_idx - 1  # (B, LA, W)
    bj = jnp.take_along_axis(
        b, jnp.clip(jm1, 0, LB - 1).reshape(B, LA * W), axis=1
    ).reshape(B, LA, W)
    bj = jnp.where((jm1 >= 0) & (jm1 < LB), bj, -2)
    sub = jnp.where(bj == a[:, :, None], jnp.int32(match), jnp.int32(mismatch))

    grid = (B // BB,)
    kernel = functools.partial(
        _kernel, LA=LA, W=W, NSTEPS=NSTEPS, match=match, gap=gap
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, LA, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, NSTEPS, BB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, NSTEPS, BB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, BB, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B // BB, NSTEPS, BB), jnp.int32),
            jax.ShapeDtypeStruct((B // BB, NSTEPS, BB), jnp.int32),
            jax.ShapeDtypeStruct((B // BB, BB, 1), jnp.int32),
            jax.ShapeDtypeStruct((B // BB, BB, 16), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((BB, LA, W), jnp.int32)],
    )(
        sub,
        a_len.reshape(B // BB, BB, 1),
        b_len.reshape(B // BB, BB, 1),
        band_min.reshape(B // BB, BB, 1),
    )
    m0, m1, best, metrics = out
    metrics = metrics.reshape(B, 16)
    # (nblocks, NSTEPS, BB) -> (B, NSTEPS); pack pairs into one int32
    # (ordinals < 2^15) and sort ascending: strictly increasing
    # ordinals mean sorted packed values ARE the path order, with pads
    # (INT32 max) at the end. Only the first MAXM columns can hold
    # matches. Metrics and packed ordinals are fused into ONE output
    # array: device->host round-trips through a tunneled TPU have
    # ~150 ms latency each, so one fetch per batch, not three.
    m0 = jnp.transpose(m0, (0, 2, 1)).reshape(B, NSTEPS)
    m1 = jnp.transpose(m1, (0, 2, 1)).reshape(B, NSTEPS)
    packed = jnp.where(
        m0 >= 0, (m0 << 16) | m1, jnp.int32(np.iinfo(np.int32).max)
    )
    packed = jnp.sort(packed, axis=1)
    MAXM = min(LA, LB)
    return jnp.concatenate([metrics, packed[:, :MAXM]], axis=1)
