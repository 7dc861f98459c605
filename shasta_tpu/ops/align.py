"""Batched banded marker-sequence alignment (method 3 semantics).

TPU-native counterpart of the reference's production alignment method 3
(reference: src/AssemblerAlign3.cpp): a two-step scheme —

1. find a diagonal band from matches between *downsampled* markers
   (markers whose strand-symmetric k-mer hash is below
   downsamplingFactor * 2^32, reference: AssemblerAlign3.cpp:70-82);
2. run a *banded* overlap alignment (global with free ends, linear
   gaps, match/mismatch/gap scores) over the full marker sequences and
   collect the ordinal pairs of matching markers on the optimal path
   (reference: AssemblerAlign3.cpp:243-299).

The reference computes the band by running SeqAn on the downsampled
sequences; we run the same banded DP kernel on the downsampled
sequences (band seeded from the diagonal range of exact k-mer matches,
which necessarily contains every matched pair of any alignment), then
use the matched pairs' ordinal offsets exactly like the reference
(offset range +- bandExtend, reject if wider than maxBand).

The DP kernel is the throughput-critical inner loop of the whole
assembler (the reference spends ~half its runtime here, see
BASELINE.md). Design for the TPU:

- a batch of B pairs is processed at once; the DP state is a (B, W)
  score slab swept over rows with ``lax.scan`` — W is the band width,
  padded to lane multiples;
- the within-row gap dependency (left moves) is solved with a
  prefix-max: V[d] = cummax(base[d'] - d'*gap) + d*gap, turning the
  sequential inner loop of CPU DP into one vectorized ``lax.cummax``;
- 2-bit traceback directions are stored as int8 (B, LA, W) in HBM and
  walked back with a batched ``lax.scan``.

Everything is jittable; buckets of (LA, LB, W) shapes keep compilation
cached and tiles aligned.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shasta_tpu.utils import jaxsetup  # noqa: F401  (persistent XLA cache)

_PALLAS_ENV = os.environ.get("SHASTA_TPU_USE_PALLAS", "auto")


@functools.lru_cache(None)
def _pallas_available() -> bool:
    """Use the Pallas kernel on TPU backends (it is compiled, not
    interpreted, only there); the jnp scan path remains the CPU/test
    implementation and the fallback for oversized shapes."""
    if _PALLAS_ENV == "0":
        return False
    if _PALLAS_ENV == "1":
        return True
    return jax.default_backend() == "tpu"


NEG_INF = np.int32(-(2**30))

# Traceback direction codes.
STOP, DIAG, UP, LEFT = 0, 1, 2, 3


@dataclass
class AlignParams:
    """Scoring and banding parameters; defaults follow the reference
    Align section defaults (reference: src/AssemblerOptions.cpp)."""

    match_score: int = 6
    mismatch_score: int = -1
    gap_score: int = -1
    downsampling_factor: float = 0.1
    band_extend: int = 10
    max_band: int = 1000
    # Filters (applied by the caller after alignment):
    min_aligned_marker_count: int = 100
    min_aligned_fraction: float = 0.0
    max_skip: int = 30
    max_drift: int = 30
    max_trim: int = 30
    # Drop containment alignments: one read entirely covered by the
    # other, up to max_trim on both of its ends (reference:
    # Align.suppressContainments, AlignmentInfo classification).
    suppress_containments: bool = False


# ---------------------------------------------------------------------------
# Core banded DP kernel
# ---------------------------------------------------------------------------


def _banded_forward(a, a_len, b, b_len, band_min, W, match, mismatch, gap):
    """Banded overlap alignment forward pass.

    DP matrix V[i, j], i in [0, a_len], j in [0, b_len];
    V[0, j] = V[i, 0] = 0 (free start); score = max over last row/col.
    Band: j - i in [band_min, band_min + W - 1], W static.

    Returns (dirs int8 (B, LA, W), best_i, best_d, best_score).
    """
    B, LA = a.shape
    LB = b.shape[1]
    d_idx = jnp.arange(W, dtype=jnp.int32)  # (W,)

    gap_i = jnp.int32(gap)

    def row_step(carry, i):
        prev, best_val, best_i, best_d = carry
        # j for each band cell in this row: j = i + band_min + d
        j = i + band_min[:, None] + d_idx[None, :]  # (B, W)
        jm1 = j - 1

        # Gather b[j-1] (the base compared at cell (i, j)).
        jb = jnp.clip(jm1, 0, LB - 1)
        bj = jnp.take_along_axis(b, jb, axis=1)
        bj = jnp.where((jm1 >= 0) & (jm1 < LB), bj, -2)

        ai = jnp.take_along_axis(a, jnp.broadcast_to(i[None, None] - 1, (B, 1)).clip(0, LA - 1), axis=1)
        sub = jnp.where(bj == ai, jnp.int32(match), jnp.int32(mismatch))

        # prev row is indexed so that diag (i-1, j-1) -> prev[d],
        # up (i-1, j) -> prev[d+1].
        prev_up = jnp.concatenate(
            [prev[:, 1:], jnp.full((B, 1), NEG_INF, jnp.int32)], axis=1
        )
        diag_cand = prev + sub
        up_cand = prev_up + gap_i
        base = jnp.maximum(diag_cand, up_cand)
        # Free start at j == 0 (V[i][0] = 0).
        at_j0 = j == 0
        base = jnp.where(at_j0, jnp.maximum(base, 0), base)

        # In-row left dependency via prefix max:
        # V[d] = max_{d'<=d} base[d'] + (d-d')*gap
        shifted = base - d_idx[None, :] * gap_i
        run = jax.lax.cummax(shifted, axis=1)
        V = run + d_idx[None, :] * gap_i

        # Invalidate cells outside the matrix for this pair.
        valid = (j >= 0) & (j <= b_len[:, None]) & (i <= a_len)[:, None]
        V = jnp.where(valid, V, NEG_INF)

        came_left = V > base
        dirs = jnp.where(
            came_left,
            jnp.int8(LEFT),
            jnp.where(base == diag_cand, jnp.int8(DIAG), jnp.int8(UP)),
        )
        dirs = jnp.where(at_j0 & (V == 0), jnp.int8(STOP), dirs)
        dirs = jnp.where(valid, dirs, jnp.int8(STOP))

        # Track best over the last column (j == b_len) and last row.
        in_last_col = (j == b_len[:, None]) & valid
        col_vals = jnp.where(in_last_col, V, NEG_INF)
        col_best_d = jnp.argmax(col_vals, axis=1).astype(jnp.int32)
        col_best = jnp.take_along_axis(col_vals, col_best_d[:, None], axis=1)[:, 0]
        better = col_best > best_val
        best_val = jnp.where(better, col_best, best_val)
        best_i = jnp.where(better, i, best_i)
        best_d = jnp.where(better, col_best_d, best_d)

        # Last row (i == a_len): any cell may end the alignment.
        at_last_row = (i == a_len)[:, None] & valid
        row_vals = jnp.where(at_last_row, V, NEG_INF)
        row_best_d = jnp.argmax(row_vals, axis=1).astype(jnp.int32)
        row_best = jnp.take_along_axis(row_vals, row_best_d[:, None], axis=1)[:, 0]
        better2 = row_best > best_val
        best_val = jnp.where(better2, row_best, best_val)
        best_i = jnp.where(better2, i, best_i)
        best_d = jnp.where(better2, row_best_d, best_d)

        return (V, best_val, best_i, best_d), dirs

    # Row 0: V[0][j] = 0 for j in [0, b_len] (within band of row 0).
    j0 = band_min[:, None] + d_idx[None, :]
    prev0 = jnp.where((j0 >= 0) & (j0 <= b_len[:, None]), 0, NEG_INF).astype(jnp.int32)

    init = (
        prev0,
        jnp.full((B,), NEG_INF, jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    rows = jnp.arange(1, LA + 1, dtype=jnp.int32)
    (prev, best_val, best_i, best_d), dirs = jax.lax.scan(row_step, init, rows)
    # dirs: (LA, B, W) -> (B, LA, W)
    dirs = jnp.transpose(dirs, (1, 0, 2))
    return dirs, best_i, best_d, best_val


@functools.partial(jax.jit, static_argnames=("W", "match", "mismatch", "gap"))
def banded_forward(a, a_len, b, b_len, band_min, *, W, match, mismatch, gap):
    return _banded_forward(a, a_len, b, b_len, band_min, W, match, mismatch, gap)


@functools.partial(jax.jit, static_argnames=("n_steps",))
def traceback(
    dirs: jnp.ndarray,  # (B, LA, W) int8
    a: jnp.ndarray,  # (B, LA) int32
    b: jnp.ndarray,  # (B, LB) int32
    band_min: jnp.ndarray,  # (B,)
    best_i: jnp.ndarray,  # (B,)
    best_d: jnp.ndarray,  # (B,)
    *,
    n_steps: int,
):
    """Walk the traceback; emit matched ordinal pairs.

    Returns (m0, m1) int32 (n_steps, B): for each traceback step, the
    matched (ordinal0, ordinal1) pair or (-1, -1). The path is emitted
    in reverse (descending ordinals); the caller compacts and reverses.
    A matched pair is emitted for DIAG steps where the k-mers are equal
    (reference: AssemblerAlign3.cpp:283-292).
    """
    B, LA, W = dirs.shape
    LB = b.shape[1]
    dirs_flat = dirs.reshape(B, LA * W)

    def step(carry, _):
        i, d, active = carry
        j = i + band_min + d
        cell = jnp.clip((i - 1) * W + d, 0, LA * W - 1)
        dcode = jnp.take_along_axis(dirs_flat, cell[:, None], axis=1)[:, 0]
        active = active & (i > 0) & (j > 0) & (dcode != STOP)

        is_diag = active & (dcode == DIAG)
        ai = jnp.take_along_axis(a, jnp.clip(i - 1, 0, LA - 1)[:, None], axis=1)[:, 0]
        bj = jnp.take_along_axis(b, jnp.clip(j - 1, 0, LB - 1)[:, None], axis=1)[:, 0]
        is_match = is_diag & (ai == bj)

        m0 = jnp.where(is_match, i - 1, -1)
        m1 = jnp.where(is_match, j - 1, -1)

        # Move: DIAG -> (i-1, d); UP -> (i-1, d+1); LEFT -> (i, d-1).
        di = jnp.where((dcode == DIAG) | (dcode == UP), 1, 0)
        dd = jnp.where(dcode == UP, 1, jnp.where(dcode == LEFT, -1, 0))
        i = jnp.where(active, i - di, i)
        d = jnp.where(active, d + dd, d)
        return (i, d, active), (m0, m1)

    init = (
        best_i.astype(jnp.int32),
        best_d.astype(jnp.int32),
        jnp.ones((B,), bool),
    )
    _, (m0, m1) = jax.lax.scan(step, init, None, length=n_steps)
    return m0, m1


# ---------------------------------------------------------------------------
# Shape bucketing
# ---------------------------------------------------------------------------

# Coarse buckets: every distinct (LA, LB, W) combination compiles its
# own XLA kernel (~10-30 s each on TPU), so bucket sparsity matters more
# than padding waste. Coarse steps keep the worst-case pad bounded while
# capping the kernel zoo at |LEN|^2 * |W| shapes (shared across runs via
# the persistent compilation cache enabled in shasta_tpu/__init__.py).
# The 1024 step exists because 10 kb reads at 10% marker density are
# ~750 markers — the dominant production shape — and would otherwise
# pad 2.7x to 2048.
_LEN_BUCKETS = [128, 512, 1024, 2048, 4096, 8192, 32768]
_W_BUCKETS = [128, 512, 2048]


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    # Beyond the precomputed buckets (ultra-long reads / very wide
    # phase-1 bands) extend in power-of-2 steps instead of silently
    # clamping — clamping would crash _pad_rows (length) or clip the
    # band so discovery misses the true diagonal (width). Each new
    # size is a one-time kernel compile, amortized by the persistent
    # compilation cache.
    b = buckets[-1]
    while b < n:
        b *= 2
    return b


# ---------------------------------------------------------------------------
# Downsampled band finding (phase 1)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=())
def _dot_diag_range(a, b):
    """Per-pair min/max diagonal (i - j) over exact k-mer matches of the
    padded downsampled sequences. Pads (-1 / -2) never match.

    Returns one int32 (B, 3) array [dmin, dmax, n_dots] — fused into a
    single output so the caller pays one device->host fetch."""
    B, LA = a.shape
    LB = b.shape[1]
    eq = a[:, :, None] == b[:, None, :]  # (B, LA, LB)
    ii = jnp.arange(LA, dtype=jnp.int32)[None, :, None]
    jj = jnp.arange(LB, dtype=jnp.int32)[None, None, :]
    diag = ii - jj
    big = jnp.int32(1 << 20)
    dmin = jnp.min(jnp.where(eq, diag, big), axis=(1, 2))
    dmax = jnp.max(jnp.where(eq, diag, -big), axis=(1, 2))
    n_dots = jnp.sum(eq, axis=(1, 2)).astype(jnp.int32)
    return jnp.stack([dmin, dmax, n_dots], axis=1)


# ---------------------------------------------------------------------------
# Alignment store + metrics
# ---------------------------------------------------------------------------


@dataclass
class AlignmentStore:
    """Accepted alignments and their metrics.

    Mirrors the reference's alignmentData + compressedAlignments
    (reference: src/Assembler.hpp:942-976): per alignment the read pair
    (read_id0 < read_id1, strand convention: oriented read 0 is
    (read_id0, 0), oriented read 1 is (read_id1, 0 if same_strand
    else 1)), the AlignmentInfo-style metrics, and the matched marker
    ordinal pairs stored flat + CSR offsets.
    """

    read_id0: np.ndarray  # int32 [n]
    read_id1: np.ndarray  # int32 [n]
    same_strand: np.ndarray  # bool [n]
    marker_count: np.ndarray  # int32 [n]  (matched markers)
    n_markers0: np.ndarray  # int32 [n]  (total markers in oriented read 0)
    n_markers1: np.ndarray  # int32 [n]
    first0: np.ndarray  # int32 [n]
    last0: np.ndarray  # int32 [n]
    first1: np.ndarray  # int32 [n]
    last1: np.ndarray  # int32 [n]
    min_offset: np.ndarray  # int32 [n]
    max_offset: np.ndarray  # int32 [n]
    max_skip_v: np.ndarray  # int32 [n]
    max_drift_v: np.ndarray  # int32 [n]
    ord0: np.ndarray  # uint16 (uint32 for >64k-marker reads) flat
    ord1: np.ndarray  # uint16/uint32 flat
    offsets: np.ndarray  # int64 [n+1]

    @property
    def count(self) -> int:
        return self.read_id0.shape[0]

    def ordinals(self, i: int):
        lo, hi = self.offsets[i], self.offsets[i + 1]
        return self.ord0[lo:hi], self.ord1[lo:hi]

    def check_strictly_increasing(self) -> bool:
        """Audit: within every alignment, both ordinal sequences are
        strictly increasing (reference: Alignment::
        checkStrictlyIncreasing, src/Alignment.hpp:48). One vectorized
        pass — within-alignment adjacency = consecutive flat entries
        not crossing a CSR boundary."""
        if self.ord0.shape[0] < 2:
            return True
        inc = (self.ord0[1:] > self.ord0[:-1]) & (
            self.ord1[1:] > self.ord1[:-1]
        )
        starts = np.zeros(self.ord0.shape[0], bool)
        starts[self.offsets[1:-1]] = True
        return bool((inc | starts[1:]).all())

    def arrays(self) -> Dict[str, np.ndarray]:
        return {k: getattr(self, k) for k in self.__dataclass_fields__}

    @classmethod
    def from_arrays(cls, a) -> "AlignmentStore":
        return cls(**{k: a[k] for k in cls.__dataclass_fields__})

    # Trim helpers (reference: Alignment.hpp:279-287)
    def left_trim(self) -> np.ndarray:
        return np.minimum(self.first0, self.first1)

    def right_trim(self) -> np.ndarray:
        return np.minimum(
            self.n_markers0 - 1 - self.last0, self.n_markers1 - 1 - self.last1
        )

    def aligned_fraction_min(self) -> np.ndarray:
        r0 = (self.last0 + 1 - self.first0).astype(np.float64)
        r1 = (self.last1 + 1 - self.first1).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            f0 = np.where(r0 > 0, self.marker_count / r0, 0.0)
            f1 = np.where(r1 > 0, self.marker_count / r1, 0.0)
        return np.minimum(f0, f1)


def _metrics_from_ordinals(ord0: np.ndarray, ord1: np.ndarray) -> Tuple[int, ...]:
    """(max_skip, max_drift, min_off, max_off) for one alignment
    (reference: src/Alignment.cpp:4-29)."""
    if ord0.shape[0] == 0:
        return 0, 0, 0, 0
    o0 = ord0.astype(np.int64)
    o1 = ord1.astype(np.int64)
    off = o0 - o1
    if o0.shape[0] == 1:
        return 0, 0, int(off[0]), int(off[0])
    d0 = np.abs(np.diff(o0))
    d1 = np.abs(np.diff(o1))
    max_skip = int(np.maximum(d0, d1).max())
    max_drift = int(np.abs(np.diff(off)).max())
    return max_skip, max_drift, int(off.min()), int(off.max())


# ---------------------------------------------------------------------------
# Host-side driver: pad, bucket, run, compact
# ---------------------------------------------------------------------------

# HBM budget for the traceback-direction slab per kernel invocation
# (jnp fallback path only; the Pallas path keeps directions in VMEM).
_DIRS_BYTE_BUDGET = 1 << 29
_MAX_BATCH = 1024

# Batch sizes are padded up to one of these so that every kernel
# invocation reuses a cached compilation (B is part of the XLA shape).
_BATCH_BUCKETS = [8, 64, 256, 1024, 4096]


def _pad_rows(rows: List[np.ndarray], width: int, pad: int) -> np.ndarray:
    out = np.full((len(rows), width), pad, dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, : r.shape[0]] = r
    return out


def _pad_from_csr(
    flat: np.ndarray,
    off: np.ndarray,
    lens: np.ndarray,
    ids: np.ndarray,
    L: int,
    pad: int,
) -> np.ndarray:
    """Padded (len(ids), L) int32 matrix of CSR rows ``ids`` — one
    vectorized gather instead of a per-row Python loop (the reference
    hands each thread contiguous marker spans; here the batch is built
    in one shot, reference: AssemblerAlign.cpp:308 work distribution)."""
    ids = np.asarray(ids, np.int64)
    ar = np.arange(L, dtype=np.int64)
    idx = off[ids][:, None] + ar[None, :]
    valid = ar[None, :] < lens[ids][:, None]
    np.minimum(idx, max(flat.shape[0] - 1, 0), out=idx)
    if flat.shape[0] == 0:
        return np.full((ids.shape[0], L), pad, np.int32)
    return np.where(valid, flat[idx], np.int32(pad)).astype(np.int32, copy=False)


def _bucket_vec(n: np.ndarray, buckets) -> np.ndarray:
    """Vectorized _bucket: smallest bucket >= n, extending past the
    table in power-of-2 steps."""
    b = np.asarray(buckets, np.int64)
    n = np.asarray(n, np.int64)
    idx = np.searchsorted(b, n)
    out = b[np.minimum(idx, len(b) - 1)]
    over = n > b[-1]
    if over.any():
        steps = np.ceil(np.log2(n[over] / b[-1])).astype(np.int64)
        out = out.copy()
        out[over] = b[-1] * (1 << steps)
    return out


def _dot_diag_band(ids_a, ids_b, flat, off, lens, max_width=None):
    """Per-pair diagonal range of exact k-mer matches ("dots") between
    two CSR rows, vectorized across pairs.

    Any DP matched pair is an exact k-mer match, and between two dots
    an optimal linear-gap path has an equal-scoring reordering whose
    intermediate diagonals stay inside the dots' diagonal range, so a
    band covering [dmin-1, dmax+1] preserves the optimal score of the
    unbanded alignment. Returns (dmin, dmax, has_dots); diagonals are
    j - i (b ordinal minus a ordinal).

    ``max_width``: when set and a pair's full dot range needs a band
    wider than this, the range narrows to the DENSEST window of dot
    diagonals whose band still fits (dmax-dmin+3 <= max_width). For
    ultra-long pairs the full range is inflated by spurious shared
    markers scattered across the whole dot plane, while any alignment
    the downstream maxBand filter (reference default 1000 original
    ordinals ~= 50 downsampled at downsamplingFactor 0.05,
    conf/Nanopore-May2022.conf) could accept concentrates its dots in
    a window far narrower than the kernel's widest band — so banding
    the densest window preserves every acceptable alignment while
    keeping the pair on the Pallas kernel instead of falling to an
    unbanded path no TPU kernel shape supports."""
    n = ids_a.shape[0]
    la = lens[ids_a].astype(np.int64)
    lb = lens[ids_b].astype(np.int64)

    def _per_key(ids, counts):
        # (pair, kmer) -> (min_ordinal, max_ordinal), sorted by key.
        pair_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        starts = off[ids].astype(np.int64)
        iota = np.arange(pair_of.shape[0], dtype=np.int64)
        cum = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=cum[1:])
        ordi = iota - cum[pair_of]
        pos = np.repeat(starts - cum[:-1], counts) + iota
        km = flat[pos].astype(np.int64)
        order = np.lexsort((km, pair_of))
        p_s, k_s, o_s = pair_of[order], km[order], ordi[order]
        new = np.empty(order.shape[0], bool)
        if order.shape[0]:
            new[0] = True
            new[1:] = (p_s[1:] != p_s[:-1]) | (k_s[1:] != k_s[:-1])
        grp = np.flatnonzero(new)
        gmin = np.minimum.reduceat(o_s, grp) if grp.shape[0] else o_s[:0]
        gmax = np.maximum.reduceat(o_s, grp) if grp.shape[0] else o_s[:0]
        return p_s[grp], k_s[grp], gmin, gmax

    pa, ka, amin, amax = _per_key(ids_a, la)
    pb, kb, bmin_o, bmax_o = _per_key(ids_b, lb)
    # Merge-join the two sorted (pair, kmer) streams.
    # Pack into a single sortable key (kmer < 4^16 fits; pair small).
    KM = max(int(ka.max(initial=0)), int(kb.max(initial=0))) + 1
    keya = pa * KM + ka
    keyb = pb * KM + kb
    ia = np.searchsorted(keyb, keya)
    ia = np.minimum(ia, keyb.shape[0] - 1) if keyb.shape[0] else ia
    shared = keyb.shape[0] > 0
    dmin = np.full(n, np.iinfo(np.int64).max, np.int64)
    dmax = np.full(n, np.iinfo(np.int64).min, np.int64)
    if shared and keya.shape[0]:
        hit = keyb[ia] == keya
        ha = np.flatnonzero(hit)
        hb = ia[ha]
        p = pa[ha]
        lo = bmin_o[hb] - amax[ha]  # min diagonal for this kmer
        hi = bmax_o[hb] - amin[ha]  # max diagonal
        np.minimum.at(dmin, p, lo)
        np.maximum.at(dmax, p, hi)
        if max_width is not None:
            over = (dmax - dmin + 3) > max_width
            if over.any():
                maxw = int(max_width) - 3
                mid = (lo + hi) >> 1
                sel = over[p]
                ps, ms = p[sel], mid[sel]
                order = np.lexsort((ms, ps))
                ps, ms = ps[order], ms[order]
                # Count dots in [m, m+maxw] per starting dot with one
                # global searchsorted (keys strictly separate pairs).
                base = ms - ms.min()
                span = int(base.max()) + maxw + 2
                key = ps * span + base
                upper = np.searchsorted(key, key + maxw, side="right")
                cnt = upper - np.arange(ps.shape[0])
                new_grp = np.empty(ps.shape[0], bool)
                new_grp[0] = True
                np.not_equal(ps[1:], ps[:-1], out=new_grp[1:])
                grp = np.flatnonzero(new_grp)
                gid = np.cumsum(new_grp) - 1
                gbest = np.maximum.reduceat(cnt, grp)
                at_best = cnt == gbest[gid]
                idx = np.where(
                    at_best,
                    np.arange(ps.shape[0], dtype=np.int64),
                    np.iinfo(np.int64).max,
                )
                gfirst = np.minimum.reduceat(idx, grp)
                pair_ids = ps[grp]
                start = ms[gfirst]
                dmin[pair_ids] = np.maximum(dmin[pair_ids], start)
                dmax[pair_ids] = np.minimum(dmax[pair_ids], start + maxw)
    has = dmax >= dmin
    return dmin, dmax, has


from shasta_tpu.utils.perf import StageProf


class _ProfTimer(StageProf):
    """align_candidates' stage timer (shared StageProf with the
    pairs-count report format)."""

    def __init__(self):
        super().__init__("align")

    def report(self, n_pairs: int) -> None:  # type: ignore[override]
        super().report(extra=f"pairs={n_pairs}")


def _dispatch_bucket(
    a_rows: List[np.ndarray],
    b_rows: List[np.ndarray],
    band_mins: np.ndarray,
    W: int,
    params: AlignParams,
):
    """Launch forward+traceback kernels for same-shape-bucket pairs.

    Returns a list of (device_future, batch_meta) — fetching is
    deferred so that all buckets/batches overlap on device and each
    batch costs exactly one device->host round trip.
    """
    LA = _bucket(max(r.shape[0] for r in a_rows), _LEN_BUCKETS)
    LB = _bucket(max(r.shape[0] for r in b_rows), _LEN_BUCKETS)
    n = len(a_rows)
    use_pallas, mesh, mesh_d = _dispatch_mode(LA, W)

    pending = []
    for lo, hi, B in _batch_plan(n, LA, LB, W, use_pallas, mesh_d):
        pad = B - (hi - lo)
        a = _pad_rows(a_rows[lo:hi] + [np.zeros(0, np.int32)] * pad, LA, -1)
        b = _pad_rows(b_rows[lo:hi] + [np.zeros(0, np.int32)] * pad, LB, -2)
        a_len = np.array(
            [r.shape[0] for r in a_rows[lo:hi]] + [0] * pad, np.int32
        )
        b_len = np.array(
            [r.shape[0] for r in b_rows[lo:hi]] + [0] * pad, np.int32
        )
        bm = np.concatenate([band_mins[lo:hi], np.zeros(pad)]).astype(np.int32)
        pending.append(
            _dispatch_padded(
                a, a_len, b, b_len, bm, LA, LB, W, hi - lo, params,
                use_pallas, mesh, mesh_d,
            )
        )
    return pending


def _dispatch_mode(LA: int, W: int):
    """(use_pallas, mesh, mesh_devices) for a shape bucket."""
    from shasta_tpu.ops import align_pallas
    from shasta_tpu.parallel.context import current_mesh

    use_pallas = _pallas_available() and align_pallas.supported(LA, W)
    mesh = current_mesh()
    mesh_d = mesh.devices.size if mesh is not None else 1
    return use_pallas, mesh, mesh_d


def _batch_plan(n: int, LA: int, LB: int, W: int, use_pallas: bool, mesh_d: int):
    """Chunk n pairs into (lo, hi, padded_B) batches."""
    if n == 0:
        return
    if use_pallas:
        # The Pallas kernel streams blocks through VMEM, so HBM would
        # allow much larger batches — but every distinct batch size is
        # a separate (slow) kernel compilation, so batch sizes stay
        # coarse and rely on the persistent compilation cache. Small
        # shapes (e.g. band discovery at (128,128,128)) scale the batch
        # up so a launch carries comparable work to the full-alignment
        # shapes, reducing per-launch relay overhead.
        max_b = int(os.environ.get("SHASTA_TPU_MAXBATCH", _MAX_BATCH))
        if os.environ.get("SHASTA_TPU_BIGBATCH", "1") != "0":
            # Per-launch overhead through the relay (measured 0.5-1.5 s
            # round trip) dwarfs the kernel (~4 ms/1024 pairs at
            # (512,512,128)), so launches carry as much work as
            # possible: small shapes (phase-1 band discovery at
            # (128,128,128)) batch up to 16k pairs per launch — the
            # kernel streams blocks through VMEM, so batch size only
            # costs HBM, and one (B, LA, LB, W) compile is a one-time
            # cached cost.
            factor = max(1, (4 * 512 * 512 * 128) // max(1, LA * LB * W))
            max_b = min(16384, _MAX_BATCH * factor)
        from shasta_tpu.ops import align_pallas

        if align_pallas._block_pairs(LA, W, LB) == 0:
            # Chunked launch: dirs stream through a B*LA*W/4-byte HBM
            # intermediate (2-bit packed); cap it at ~2 GiB — and at
            # ~512 MiB for ultra-long classes (LA >= 16384), whose
            # launches are additionally retired synchronously: at
            # SCALE=100 ONT, a 2 GiB dirs co-resident with the take
            # matrices and queued batch outputs exhausted HBM
            # (RESOURCE_EXHAUSTED at (32768, 32768, 512) B=512).
            budget = (1 << 31) if LA >= 16384 else (1 << 33)
            max_b = max(32, min(max_b, budget // max(1, LA * W)))
    else:
        max_b = max(8, min(_MAX_BATCH, _DIRS_BYTE_BUDGET // max(1, LA * W)))
    max_b -= max_b % 8
    if mesh_d > 1:
        # Pairs shard data-parallel over the mesh: per-batch size must
        # divide evenly across devices.
        max_b = max(mesh_d, max_b - (max_b % mesh_d))
    for lo in range(0, n, max_b):
        hi = min(lo + max_b, n)
        if hi - lo == max_b:
            B = max_b
        elif lo == 0:
            # Single partial batch: bucket to limit padding waste.
            B = _bucket(hi - lo, _BATCH_BUCKETS)
        else:
            # Trailing partial batch: pad to the full batch size so it
            # reuses the SAME compiled kernel as the full batches —
            # each new (B, LA, LB, W) shape costs a fresh compilation.
            B = max_b
        if mesh_d > 1 and B % mesh_d:
            B += mesh_d - (B % mesh_d)
        yield lo, hi, B


def _csr_bucket(n: int) -> int:
    """Smallest value >= n on a 4-per-octave geometric grid (x1,
    x1.25, x1.5, x1.75 per power of two). The jitted CSR kernel
    specializes on the CSR array lengths, so an exact-length upload
    makes EVERY new dataset recompile every kernel shape (~45 s per
    executable through the remote-compile relay, measured); padding to
    a coarse grid lets datasets of similar size reuse the persistent
    compile cache at <=25% HBM overhead."""
    if n <= 1024:
        return 1024
    k = int(n - 1).bit_length() - 1
    base = 1 << k
    for num in (4, 5, 6, 7, 8):
        v = (base * num) >> 2
        if v >= n:
            return v
    return base << 1


class _DeviceCsr:
    """Device-resident per-length-class padded marker matrices.

    Batch inputs are built on device with whole-row ``jnp.take`` from a
    (n_class_rows, L) matrix per length class — contiguous HBM reads at
    40+ GB/s, where an index-matrix gather from the flat CSR measured
    ~0.6 GB/s and dominated alignment wall-clock. A batch's rows all
    share one class by construction: the batch key IS the length
    bucket. Matrices build lazily (one gather per class per stage) and
    row counts are padded to the :func:`_csr_bucket` grid so compiled
    take shapes stay stable across datasets."""

    def __init__(
        self,
        flat: np.ndarray,
        off: np.ndarray,
        lens: np.ndarray,
        aux: Optional[np.ndarray] = None,
        mesh=None,
    ):
        import jax.numpy as jnp

        # Multi-device mesh: class matrices replicate over the mesh
        # (read-only shared data, the analog of the reference's
        # shared-memory reads, src/MemoryMappedVector.hpp:72-97).
        self.mesh = mesh if mesh is not None and mesh.devices.size > 1 else None

        nf = _csr_bucket(max(flat.shape[0], 1))
        flat_p = np.full(nf, -3, np.int32)
        flat_p[: flat.shape[0]] = flat
        self.flat_dev = jnp.asarray(flat_p)
        # Optional parallel per-item array (e.g. the original marker
        # ordinal of each downsampled marker) served as padded class
        # matrices alongside the k-mer matrices.
        self.aux_dev = None
        if aux is not None:
            aux_p = np.zeros(nf, np.int32)
            aux_p[: aux.shape[0]] = aux
            self.aux_dev = jnp.asarray(aux_p)
        self._aux_mats: Dict[int, object] = {}
        self.lens = np.asarray(lens, np.int64)
        self.off = np.asarray(off, np.int64)
        # Class-local row index (class = length bucket, matching the
        # batch keys built from the same lens with the same buckets).
        cls = _bucket_vec(np.maximum(self.lens, 1), _LEN_BUCKETS)
        self.cls = cls
        order = np.argsort(cls, kind="stable")
        sorted_cls = cls[order]
        starts = np.searchsorted(sorted_cls, sorted_cls, side="left")
        local_sorted = np.arange(order.shape[0], dtype=np.int64) - starts
        self.local = np.empty(order.shape[0], np.int64)
        self.local[order] = local_sorted
        self._members = {
            int(c): order[sorted_cls == c] for c in np.unique(sorted_cls)
        }
        # LRU class-matrix cache with an HBM byte budget: at 200 Mb
        # ONT the flat array (~5.6 GB) PLUS every class matrix
        # (~flat x 1.3-1.7 padding) kept resident exhausted the
        # 16 GB chip (RESOURCE_EXHAUSTED mid phase 2). Rebuilding an
        # evicted class costs one device gather from flat_dev; the
        # hottest (median-length) classes stay cached. The phase-1
        # downsampled CSR (aux present) gets a quarter budget — its
        # matrices are ~10x smaller.
        from collections import OrderedDict

        budget_mb = int(os.environ.get("SHASTA_TPU_MAT_MB", "3072"))
        if aux is not None:
            budget_mb //= 4
        self._mat_budget = budget_mb << 20
        self._cache: "OrderedDict[Tuple[str, int], Tuple[object, int]]" = (
            OrderedDict()
        )

    def _class_matrix(self, kind: str, src, L: int):
        key = (kind, L)
        entry = self._cache.get(key)
        if entry is not None:
            self._cache.move_to_end(key)
            return entry[0]
        import jax.numpy as jnp

        ids = self._members.get(L, np.zeros(0, np.int64))
        n_pad = _csr_bucket(max(ids.shape[0], 1))
        nbytes = n_pad * L * 4
        total = sum(b for _, b in self._cache.values()) + nbytes
        if total > self._mat_budget and self._cache:
            # Retire the execution queue BEFORE evicting: queued (not
            # yet executed) take launches hold references to cached
            # matrices, so an eviction without this barrier leaves the
            # old copy pinned while the rebuild allocates a second one
            # — measured RESOURCE_EXHAUSTED at 200 Mb ONT. A 1-element
            # fetch of a freshly enqueued op drains everything queued
            # before it (~1 relay round trip).
            np.asarray(self.flat_dev[:1] + jnp.int32(0))
            while total > self._mat_budget and self._cache:
                k_old, (_m_old, b_old) = next(iter(self._cache.items()))
                del self._cache[k_old]
                total -= b_old
        off_sel = np.zeros(n_pad, np.int32)
        len_sel = np.zeros(n_pad, np.int32)
        off_sel[: ids.shape[0]] = self.off[ids]
        len_sel[: ids.shape[0]] = self.lens[ids]
        m = _build_class_matrix(
            src, jnp.asarray(off_sel), jnp.asarray(len_sel), L=L
        )
        if self.mesh is not None:
            from shasta_tpu.parallel.mesh import put_replicated

            m = put_replicated(m, self.mesh)
        self._cache[key] = (m, nbytes)
        return m

    def matrix(self, L: int):
        return self._class_matrix("m", self.flat_dev, L)

    def aux_matrix(self, L: int):
        return self._class_matrix("aux", self.aux_dev, L)


@functools.partial(jax.jit, static_argnames=("L",))
def _build_class_matrix(flat, off, lens, *, L):
    """One-time padded matrix build for a length class (fill -1)."""
    nf = flat.shape[0]
    t = jnp.arange(L, dtype=jnp.int32)[None, :]
    pos = off[:, None] + t
    mask = t < lens[:, None]
    return jnp.where(mask, flat[jnp.clip(pos, 0, nf - 1)], jnp.int32(-1))


def _to_device_csr(
    flat: np.ndarray,
    off: np.ndarray,
    lens: np.ndarray,
    aux: Optional[np.ndarray] = None,
):
    """Build the device-side batch-construction structure, or None when
    the Pallas path is off. Under a multi-device mesh the class
    matrices are placed replicated over the mesh and the take shards
    over pairs (parallel/mesh.py:sharded_align_take) — the mesh keeps
    the fast feed instead of falling back to host-side row padding."""
    from shasta_tpu.parallel.context import current_mesh

    if not _pallas_available():
        return None
    return _DeviceCsr(flat, off, lens, aux=aux, mesh=current_mesh())


def _dispatch_csr(
    flat: np.ndarray,
    off: np.ndarray,
    lens: np.ndarray,
    ids_a: np.ndarray,
    ids_b: np.ndarray,
    band_mins: np.ndarray,
    W: int,
    LA: int,
    LB: int,
    params: AlignParams,
    dev_csr=None,
    band_fused: bool = False,
):
    """CSR-driven dispatch: builds each padded batch with one gather
    (no per-pair Python). ids_a/ids_b index rows of the (flat, off,
    lens) CSR; all pairs share the (LA, LB, W) shape bucket.

    With ``band_fused`` (band discovery, dev_csr built with an aux
    ordinal array), the per-pair band reduction runs ON DEVICE fused
    with the DP, and each entry is ("band", (B, 3) int32, n_real) —
    3 ints/pair cross the relay instead of the (B, LA) match matrix.

    With ``dev_csr`` (from :func:`_to_device_csr`), the gather runs ON
    DEVICE: only the pair ids cross the relay per batch, removing the
    multi-MB padded-input upload from the per-batch critical path."""
    from shasta_tpu.ops import align_pallas

    n = ids_a.shape[0]
    use_pallas, mesh, mesh_d = _dispatch_mode(LA, W)
    device_gather = dev_csr is not None and use_pallas
    pending = []
    for lo, hi, B in _batch_plan(n, LA, LB, W, use_pallas, mesh_d):
        pad = B - (hi - lo)
        if device_gather:
            if __debug__ and hi > lo:
                # A batch's rows all belong to one length class (the
                # batch key IS the length bucket) — the take matrices
                # rely on it.
                assert (
                    _bucket_vec(dev_csr.lens[ids_a[lo:hi]], _LEN_BUCKETS) == LA
                ).all() and (
                    _bucket_vec(dev_csr.lens[ids_b[lo:hi]], _LEN_BUCKETS) == LB
                ).all()
            ia = np.concatenate(
                [ids_a[lo:hi], np.zeros(pad, np.int64)]
            ).astype(np.int64)
            ib = np.concatenate(
                [ids_b[lo:hi], np.zeros(pad, np.int64)]
            ).astype(np.int64)
            bm = np.concatenate(
                [band_mins[lo:hi], np.zeros(pad)]
            ).astype(np.int32)
            rowa = dev_csr.local[ia].astype(np.int32)
            rowb = dev_csr.local[ib].astype(np.int32)
            a_len = dev_csr.lens[ia].astype(np.int32)
            b_len = dev_csr.lens[ib].astype(np.int32)
            if pad:
                a_len[hi - lo :] = 0
                b_len[hi - lo :] = 0
                rowa[hi - lo :] = 0
                rowb[hi - lo :] = 0
            if band_fused and dev_csr.aux_dev is not None:
                if mesh_d > 1:
                    from shasta_tpu.parallel.mesh import sharded_band_take

                    out = sharded_band_take(
                        mesh,
                        dev_csr.matrix(LA), rowa, dev_csr.aux_matrix(LA),
                        dev_csr.matrix(LB), rowb, dev_csr.aux_matrix(LB),
                        a_len, b_len, bm,
                        LA=LA, LB=LB, W=W,
                        match=params.match_score,
                        mismatch=params.mismatch_score,
                        gap=params.gap_score,
                    )
                else:
                    out = align_pallas.banded_align_band_take(
                        dev_csr.matrix(LA), rowa, dev_csr.aux_matrix(LA),
                        dev_csr.matrix(LB), rowb, dev_csr.aux_matrix(LB),
                        a_len, b_len, bm, np.int32(hi - lo),
                        LA=LA, LB=LB, W=W,
                        match=params.match_score,
                        mismatch=params.mismatch_score,
                        gap=params.gap_score,
                    )
                pending.append(("band", out, hi - lo))
                _retire_giant_chunked(out, LA, LB, W)
                continue
            # Band-relative delta packing: u8 below W=254, u16 above
            # (align_pallas._fuse_outputs) — every packed batch is
            # device-compactable, so the runner can drain HBM early.
            pack = (
                W <= 65534
                and os.environ.get("SHASTA_TPU_PACKU8", "1") != "0"
            )
            if mesh_d > 1:
                from shasta_tpu.parallel.mesh import sharded_align_take

                out = sharded_align_take(
                    mesh,
                    dev_csr.matrix(LA), rowa, dev_csr.matrix(LB), rowb,
                    a_len, b_len, bm,
                    LA=LA, LB=LB, W=W,
                    match=params.match_score,
                    mismatch=params.mismatch_score,
                    gap=params.gap_score,
                    pack_u8=pack,
                )
            else:
                out = align_pallas.banded_align_pairs_take(
                    dev_csr.matrix(LA), rowa, dev_csr.matrix(LB), rowb,
                    a_len, b_len, bm, np.int32(hi - lo),
                    LA=LA, LB=LB, W=W,
                    match=params.match_score,
                    mismatch=params.mismatch_score,
                    gap=params.gap_score,
                    pack_u8=pack,
                )
            if pack:
                met_dev, delta_dev = out
                pending.append(("p2", (met_dev, delta_dev, bm), hi - lo))
            else:
                pending.append(("pallas", out, hi - lo))
            _retire_giant_chunked(out, LA, LB, W)
            continue
        ia = np.concatenate([ids_a[lo:hi], np.zeros(pad, np.int64)])
        ib = np.concatenate([ids_b[lo:hi], np.zeros(pad, np.int64)])
        a = _pad_from_csr(flat, off, lens, ia, LA, -1)
        b = _pad_from_csr(flat, off, lens, ib, LB, -2)
        a_len = lens[ia].astype(np.int32)
        b_len = lens[ib].astype(np.int32)
        if pad:
            a_len[hi - lo :] = 0
            b_len[hi - lo :] = 0
            a[hi - lo :] = -1
            b[hi - lo :] = -2
        bm = np.concatenate(
            [band_mins[lo:hi], np.zeros(pad)]
        ).astype(np.int32)
        pending.append(
            _dispatch_padded(
                a, a_len, b, b_len, bm, LA, LB, W, hi - lo, params,
                use_pallas, mesh, mesh_d,
            )
        )
    return pending


def _retire_giant_chunked(out, LA, LB, W) -> None:
    """Force an ultra-long-class chunked launch to finish before more
    work is dispatched: its multi-hundred-MB HBM dirs intermediate
    must not co-reside with the next launch's (measured
    RESOURCE_EXHAUSTED at SCALE=100 ONT). A 1-element fetch blocks on
    the whole execution; giant classes are tail-rare, so the ~150 ms
    relay round trip is noise."""
    if LA < 16384:
        return
    from shasta_tpu.ops import align_pallas

    if align_pallas._block_pairs(LA, W, LB) != 0:
        return
    arr = out[0] if isinstance(out, tuple) else out
    try:
        np.asarray(arr[:1, :1])
    except Exception:
        pass


def _dispatch_padded(
    a: np.ndarray,
    a_len: np.ndarray,
    b: np.ndarray,
    b_len: np.ndarray,
    bm: np.ndarray,
    LA: int,
    LB: int,
    W: int,
    n_real: int,
    params: AlignParams,
    use_pallas: bool,
    mesh,
    mesh_d: int,
):
    """Dispatch one already-padded batch; returns a pending entry."""
    from shasta_tpu.ops import align_pallas

    if True:
        if use_pallas:
            if mesh_d > 1:
                # Pairs shard over the mesh; each device runs the same
                # Pallas kernel on its 1/D slice of the batch.
                from shasta_tpu.parallel.mesh import sharded_pallas_align

                fused = sharded_pallas_align(
                    mesh, a, a_len, b, b_len, bm,
                    LA=LA, LB=LB, W=W,
                    match=params.match_score,
                    mismatch=params.mismatch_score,
                    gap=params.gap_score,
                )
            else:
                fused = align_pallas.banded_align_pairs(
                    a,
                    a_len,
                    b,
                    b_len,
                    bm,
                    LA=LA,
                    LB=LB,
                    W=W,
                    match=params.match_score,
                    mismatch=params.mismatch_score,
                    gap=params.gap_score,
                )
            return ("pallas", fused, n_real)
        elif mesh_d > 1:
            from shasta_tpu.parallel.mesh import sharded_forward_traceback

            m0, m1 = sharded_forward_traceback(
                mesh, a, a_len, b, b_len, bm,
                W=W,
                match=params.match_score,
                mismatch=params.mismatch_score,
                gap=params.gap_score,
                n_steps=int(LA + LB),
            )
            return ("jnp", (m0, m1), n_real)
        else:
            # The row-scan jnp path dispatches one op per DP row; on a
            # remote-relay TPU that is catastrophic (~150 ms/dispatch),
            # so force it onto the host CPU backend when available.
            import contextlib

            import jax as _jax

            from shasta_tpu.utils.jaxsetup import cpu_device

            dev = cpu_device()
            if dev is None and _jax.default_backend() != "cpu":
                # No CPU backend registered (axon-pinned platform):
                # the scan + traceback run THROUGH the relay. This
                # stalled a 25 Mb ONT run for >1 h before the ph1
                # densest-dot-window banding removed the only caller
                # with shapes beyond the kernel table — keep it loud.
                print(
                    f"[align fallback] jnp path on non-CPU backend: "
                    f"LA={LA} LB={LB} W={W} B={a.shape[0]}",
                    flush=True,
                )
            ctx = (
                _jax.default_device(dev)
                if dev is not None and _jax.default_backend() != "cpu"
                else contextlib.nullcontext()
            )
            with ctx:
                dirs, best_i, best_d, best_val = banded_forward(
                    a,
                    a_len,
                    b,
                    b_len,
                    bm,
                    W=W,
                    match=params.match_score,
                    mismatch=params.mismatch_score,
                    gap=params.gap_score,
                )
                n_steps = int(LA + LB)
                m0, m1 = traceback(
                    dirs, a, b, bm, best_i, best_d, n_steps=n_steps
                )
            return ("jnp", (m0, m1), n_real)


def _collect_bucket(pending):
    """Fetch dispatched batches. Returns (results, metrics):
    results[i] = (ord0, ord1) matched ordinals; metrics (n, 10) int64
    rows [count, first0, last0, first1, last1, min_off, max_off,
    max_skip, max_drift, score] — straight from the kernel registers
    on the pallas path, recomputed on host on the jnp path."""
    results: List[Tuple[np.ndarray, np.ndarray]] = []
    mets: List[np.ndarray] = []
    for kind, payload, n_real in pending:
        if kind == "p2":
            met, rows, cols, vals = _entry_to_flat((kind, payload, n_real))
            counts = np.bincount(rows, minlength=n_real)
            starts = np.zeros(n_real + 1, np.int64)
            np.cumsum(counts, out=starts[1:])
            for t in range(n_real):
                lo, hi = starts[t], starts[t + 1]
                results.append(
                    (cols[lo:hi].astype(np.uint32), vals[lo:hi].astype(np.uint32))
                )
            mets.extend(met)
            continue
        if kind == "pallas":
            fused = np.asarray(payload)
            mjrows = fused[:n_real, 16:]
            # One vectorized decode for the whole batch.
            rows, cols = np.nonzero(mjrows >= 0)
            vals = mjrows[rows, cols]
            starts = np.searchsorted(rows, np.arange(n_real + 1))
            for t in range(n_real):
                lo, hi = starts[t], starts[t + 1]
                results.append(
                    (cols[lo:hi].astype(np.uint32), vals[lo:hi].astype(np.uint32))
                )
            mets.extend(fused[:n_real, :10].astype(np.int64))
        else:
            # jnp fallback: one flat decode, then per-pair views.
            met, rows, cols, vals = _entry_to_flat((kind, payload, n_real))
            starts = np.searchsorted(rows, np.arange(n_real + 1))
            for t in range(n_real):
                lo, hi = starts[t], starts[t + 1]
                results.append(
                    (cols[lo:hi].astype(np.uint32), vals[lo:hi].astype(np.uint32))
                )
            mets.extend(met)
    metrics = (
        np.stack(mets) if mets else np.zeros((0, 10), np.int64)
    )
    return results, metrics


def _run_bucket(
    a_rows: List[np.ndarray],
    b_rows: List[np.ndarray],
    band_mins: np.ndarray,
    W: int,
    params: AlignParams,
):
    return _collect_bucket(_dispatch_bucket(a_rows, b_rows, band_mins, W, params))


def _dispatch_grouped(
    a_rows: List[np.ndarray],
    b_rows: List[np.ndarray],
    band_mins: np.ndarray,
    widths: np.ndarray,
    params: AlignParams,
):
    """Group pairs into (LA, LB, W) shape buckets and dispatch every
    batch asynchronously. Returns a list of (pair_indices, pending)
    where each pending entry is a single dispatched batch."""
    n = len(a_rows)
    keys = []
    for i in range(n):
        la = _bucket(a_rows[i].shape[0], _LEN_BUCKETS)
        lb = _bucket(b_rows[i].shape[0], _LEN_BUCKETS)
        w = _bucket(int(widths[i]), _W_BUCKETS)
        keys.append((la, lb, w))
    order: Dict[Tuple[int, int, int], List[int]] = {}
    for i, k in enumerate(keys):
        order.setdefault(k, []).append(i)

    dispatched = []
    for (la, lb, w), idxs in sorted(order.items()):
        # Centre each pair's band inside the padded width.
        bm = np.empty(len(idxs), np.int32)
        for t, i in enumerate(idxs):
            extra = w - int(widths[i])
            bm[t] = int(band_mins[i]) - extra // 2
        pending = _dispatch_bucket(
            [a_rows[i] for i in idxs], [b_rows[i] for i in idxs], bm, w, params
        )
        # Split the bucket's pending batches back into per-batch index
        # slices (the dispatch covers idxs in order).
        lo = 0
        for entry in pending:
            n_real = entry[2]
            dispatched.append((idxs[lo : lo + n_real], [entry]))
            lo += n_real
    return dispatched


def _grouped_run(
    a_rows: List[np.ndarray],
    b_rows: List[np.ndarray],
    band_mins: np.ndarray,
    widths: np.ndarray,
    params: AlignParams,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Group pairs into (LA, LB, W) shape buckets and run each bucket."""
    n = len(a_rows)
    results: List[Optional[Tuple[np.ndarray, np.ndarray]]] = [None] * n
    metrics = np.zeros((n, 10), np.int64)
    for idxs, pending in _dispatch_grouped(a_rows, b_rows, band_mins, widths, params):
        res, mets = _collect_bucket(pending)
        for t, i in enumerate(idxs):
            results[i] = res[t]
        metrics[np.asarray(idxs)] = mets
    return results, metrics  # type: ignore[return-value]


class _CsrStreamingRunner:
    """Accumulates pair row-ids (into a shared CSR of marker
    sequences) per shape bucket and dispatches a batch as soon as a
    bucket fills, so downstream stages can overlap the device work of
    earlier stages. Batches are built with one gather per batch — no
    per-pair Python array handling."""

    def __init__(self, flat, off, lens, params: AlignParams, keep_fn=None):
        self.flat, self.off, self.lens = flat, off, lens
        self.params = params
        self.dev_csr = _to_device_csr(flat, off, lens)
        # key -> list of (ids_a, ids_b, band_min, width, tags) column chunks
        self.buffers: Dict[Tuple[int, int, int], List] = {}
        self.counts: Dict[Tuple[int, int, int], int] = {}
        self.batches: List = []
        self._staged: List = []
        # Early-drain state: with ``keep_fn`` provided, dispatched
        # batches whose estimated device residency exceeds the budget
        # are metric-fetched + device-compacted DURING dispatch (oldest
        # first) instead of all at collection time — at SCALE=100 the
        # queued (B, LA) outputs of every phase-2 batch exhausted the
        # 16 GB HBM (RESOURCE_EXHAUSTED; VERDICT r4 item 1 run).
        self.keep_fn = keep_fn
        self._dev_bytes = 0
        self._drain_budget = (
            int(os.environ.get("SHASTA_TPU_DEVQ_MB", "2560")) << 20
        )
        self._early: Dict[int, Tuple] = {}
        self._batch_bytes: List[int] = []
        self._drain_ptr = 0

    def add_many(self, ids_a, ids_b, band_mins, widths, tags):
        ids_a = np.asarray(ids_a, np.int64)
        ids_b = np.asarray(ids_b, np.int64)
        band_mins = np.asarray(band_mins, np.int64)
        widths = np.asarray(widths, np.int64)
        tags = np.asarray(tags, np.int64)
        key_mat = np.stack(
            [
                _bucket_vec(self.lens[ids_a], _LEN_BUCKETS),
                _bucket_vec(self.lens[ids_b], _LEN_BUCKETS),
                _bucket_vec(widths, _W_BUCKETS),
            ],
            axis=1,
        )
        uk, inv = np.unique(key_mat, axis=0, return_inverse=True)
        for ki in range(uk.shape[0]):
            sel = np.flatnonzero(inv == ki)
            key = tuple(int(x) for x in uk[ki])
            self.buffers.setdefault(key, []).append(
                (ids_a[sel], ids_b[sel], band_mins[sel], widths[sel], tags[sel])
            )
            self.counts[key] = self.counts.get(key, 0) + sel.shape[0]
            if self.counts[key] >= _MAX_BATCH:
                self._flush(key)

    def _flush(self, key):
        buf = self.buffers.pop(key, None)
        self.counts.pop(key, None)
        if not buf:
            return
        la_k, lb_k, w_k = key
        ids_a = np.concatenate([c[0] for c in buf])
        ids_b = np.concatenate([c[1] for c in buf])
        bmins = np.concatenate([c[2] for c in buf])
        widths = np.concatenate([c[3] for c in buf])
        tags = np.concatenate([c[4] for c in buf])
        # Centre each band inside the padded width.
        bm = (bmins - (w_k - widths) // 2).astype(np.int32)
        pending = _dispatch_csr(
            self.flat, self.off, self.lens,
            ids_a, ids_b, bm, w_k, la_k, lb_k, self.params,
            dev_csr=self.dev_csr,
        )
        lo = 0
        for entry in pending:
            n_real = entry[2]
            self.batches.append((tags[lo : lo + n_real], [entry]))
            est = _entry_dev_bytes(entry)
            self._batch_bytes.append(est)
            self._dev_bytes += est
            lo += n_real
        if self.keep_fn is not None:
            self._maybe_drain()

    def _compactable(self, entry):
        kind, payload, _n = entry
        return (
            os.environ.get("SHASTA_TPU_COMPACT", "1") != "0"
            and kind == "p2"
            and not isinstance(payload[1], np.ndarray)
        )

    def _compact_batch(self, tags, pending):
        """Fetch one batch's (tiny) metric block, apply the acceptance
        filters, dispatch the device-side compaction of the kept
        pairs' matches (LA/8 + count bytes per kept pair), and release
        the batch's uncompacted device output."""
        import jax.numpy as jnp

        entry = pending[0]
        met_dev, delta_dev, bm = entry[1]
        n_real = entry[2]
        itemsize = np.dtype(delta_dev.dtype).itemsize
        met = np.asarray(met_dev)[:n_real, :10].astype(np.int64)
        keep = np.asarray(self.keep_fn(tags, met), bool)
        sel = np.flatnonzero(keep)
        # Coarse power-of-2 shape grid: every distinct (BK, K) is a
        # separate remote compile (~10-45 s first time); <=2x padding
        # on a bitmap/byte stream is cheap.
        BK = 1 << max(int(sel.shape[0] - 1).bit_length(), 3)
        K = 1 << max(int(met[sel, 0].sum() - 1).bit_length(), 10)
        selp = np.full(BK, -1, np.int32)
        selp[: sel.shape[0]] = sel
        out = _compact_kept(delta_dev, jnp.asarray(selp), K=K)
        # Release the uncompacted device output (and its relay-client
        # host mirror) NOW.
        pending[0] = None
        del entry, met_dev, delta_dev
        new_bytes = int(out[0].shape[0]) * int(out[0].shape[1]) + K * itemsize
        return met, (met, sel, bm), out, new_bytes

    def _maybe_drain(self):
        while (
            self._dev_bytes > self._drain_budget
            and self._drain_ptr < len(self.batches)
        ):
            i = self._drain_ptr
            self._drain_ptr += 1
            tags, pending = self.batches[i]
            if not self._compactable(pending[0]):
                continue
            met, meta, payload, new_bytes = self._compact_batch(tags, pending)
            self._early[i] = (met, meta, payload)
            self._dev_bytes -= self._batch_bytes[i] - new_bytes
            self._batch_bytes[i] = new_bytes

    def flush_all(self):
        for key in list(self.buffers):
            self._flush(key)

    def collect(self):
        for tags, pending in self.batches:
            res, mets = _collect_bucket(pending)
            yield tags, res, mets

    def collect_fused(self):
        """Start every batch's device->host copy asynchronously before
        decoding any of them: the tunneled TPU pays ~70-150 ms latency
        per round trip, and overlapped copies pay it once (measured
        2.8x over serial per-batch fetches)."""
        _prefetch_batches(self.batches)
        for tags, pending in self.batches:
            res, mets = _collect_bucket(pending)
            yield tags, res, mets

    def collect_flat(self):
        """Like collect_fused but NEVER materializes per-pair arrays:
        yields (tags, met, rows, cols, vals) with batch-flat match
        arrays (rows = batch-local pair index, ascending; cols/vals the
        matched ordinal pairs in path order). Slicing 50k+ pairs into
        per-pair arrays costs more host time than the DP costs device
        time, so the caller scatters straight into the output CSR."""
        _prefetch_batches(self.batches)
        for tags, pending in self.batches:
            yield (tags, *_entry_to_flat(pending[0]))

    def collect_filtered_metrics(self, keep_fn):
        """Sweep 1 of the filtered collection: fetch each batch's
        (tiny) metric block, ask ``keep_fn(tags, met)`` which pairs
        survive the acceptance filters, dispatch the device-side match
        compaction of ONLY those pairs (:func:`_compact_kept` — LA/8 +
        count bytes per kept pair instead of LA bytes per pair), and
        release the batch's uncompacted device output. Returns a list
        of (tags, met) covering every batch; the match decode is
        deferred to :meth:`collect_filtered_matches` so the caller can
        size its output CSR from the metrics FIRST and scatter each
        batch's matches on arrival — accumulating decoded int64 match
        chunks across 2.5M pairs was a ~24 GB transient at SCALE=50
        (the computeAlignments 35.6 GB RSS peak, memprof r4).

        Entries that are not packed device outputs (jnp fallback,
        multiprocess pre-fetched) stage their fetched payload whole
        and decode in sweep 2. Batches already compacted by the
        early drain pass through untouched."""
        if self.keep_fn is None:
            self.keep_fn = keep_fn
        for i, (tags, pending) in enumerate(self.batches):
            if i in self._early:
                continue
            entry = pending[0]
            if self._compactable(entry):
                try:
                    entry[1][0].copy_to_host_async()
                except AttributeError:
                    pass
            else:
                _prefetch_batches([(tags, pending)])
        staged = []
        metas = []
        for i, (tags, pending) in enumerate(self.batches):
            if i in self._early:
                met, meta, payload = self._early[i]
                metas.append((tags, met))
                staged.append((tags, meta, payload))
                continue
            entry = pending[0]
            if not self._compactable(entry):
                met, rows, cols, vals = _entry_to_flat(entry)
                metas.append((tags, met))
                staged.append((tags, None, (rows, cols, vals)))
                continue
            met, meta, payload, _nb = self._compact_batch(tags, pending)
            metas.append((tags, met))
            staged.append((tags, meta, payload))
        for _tags, _meta, out in staged:
            if _meta is not None:
                for x in out:
                    try:
                        x.copy_to_host_async()
                    except AttributeError:
                        pass
        self._staged = staged
        self._early = {}
        return metas

    def collect_filtered_matches(self):
        """Sweep 2: decode each staged batch's compacted matches and
        yield (tags, rows, cols, vals) — rows batch-local ascending,
        cols/vals the matched ordinal pairs in path order, restricted
        to kept pairs. The caller scatters each batch immediately;
        nothing accumulates here."""
        staged = self._staged
        self._staged = []
        for tags, meta, payload in staged:
            if meta is None:
                yield (tags, *payload)
                continue
            met, sel, bm = meta
            bitmap_dev, vals_dev = payload
            bitmap = np.asarray(bitmap_dev)[: sel.shape[0]]
            vals = np.asarray(vals_dev)
            bits = np.unpackbits(bitmap, axis=1, bitorder="little")
            rows_k, cols = np.nonzero(bits)
            rows = sel[rows_k]
            if __debug__:
                assert rows_k.shape[0] == int(met[sel, 0].sum())
            v = vals[: rows.shape[0]].astype(np.int64) + cols + bm[rows]
            yield (tags, rows.astype(np.int64), cols.astype(np.int64), v)

    def collect_filtered(self, keep_fn):
        """Two-sweep filtered collection as one generator of
        (tags, met, rows, cols, vals) — compatibility wrapper over
        collect_filtered_metrics + collect_filtered_matches (large
        runs should use the split API and scatter per batch)."""
        metas = self.collect_filtered_metrics(keep_fn)
        for (tags, met), (_t, rows, cols, vals) in zip(
            metas, self.collect_filtered_matches()
        ):
            yield tags, met, rows, cols, vals


def _entry_dev_bytes(entry) -> int:
    """Estimated device-resident bytes of one pending batch entry
    (device arrays only; already-fetched numpy payloads count 0)."""
    _kind, payload, _n = entry
    arrs = payload if isinstance(payload, (tuple, list)) else (payload,)
    total = 0
    for x in arrs:
        shp = getattr(x, "shape", None)
        if shp is None or isinstance(x, np.ndarray):
            continue
        total += int(np.prod(shp)) * np.dtype(x.dtype).itemsize
    return total


@functools.partial(jax.jit, static_argnames=("K",))
def _compact_kept(delta, sel, *, K):
    """Device-side compaction of the packed match rows of KEPT pairs.

    delta: (B, LA) uint8 band-relative match rows (255 = no match);
    sel: (BK,) int32 batch-local ids of the pairs that survive the
    acceptance filters, padded with -1. Returns
    (bitmap (BK, LA//8) uint8, vals (K,) uint8): bitmap row t holds the
    matched-position bits of pair sel[t] (little-endian within each
    byte); vals holds the matched delta bytes of all kept pairs
    concatenated in (t, position) order. Together they transfer
    LA/8 + count bytes per KEPT pair — and nothing for dropped pairs —
    where the round-3 path fetched LA bytes for EVERY pair (the
    reference byte-compresses stored alignments for the same reason,
    reference: src/compressAlignment.cpp)."""
    B, LA = delta.shape
    sent = jnp.array(255 if delta.dtype == jnp.uint8 else 65535, delta.dtype)
    rows = jnp.take(delta, jnp.clip(sel, 0, B - 1), axis=0)
    matched = (rows != sent) & (sel >= 0)[:, None]
    bitmap = jnp.packbits(matched, axis=1, bitorder="little")
    flat = matched.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    idx = jnp.where(flat, pos, K)
    vals = jnp.zeros(K, delta.dtype).at[idx].set(rows.reshape(-1), mode="drop")
    return bitmap, vals


def _keep_mask_from_metrics(metrics, n0, n1, params: AlignParams):
    """The reference's alignment acceptance filters as one vectorized
    pass over the in-kernel metrics (reference:
    AssemblerAlign.cpp:437-470). metrics: (n, >=9) int rows
    [count, first0, last0, first1, last1, min_off, max_off, max_skip,
    max_drift, ...]; n0/n1 the total marker counts of each pair's
    oriented reads."""
    mc = metrics[:, 0]
    first0, last0 = metrics[:, 1], metrics[:, 2]
    first1, last1 = metrics[:, 3], metrics[:, 4]
    mskip, mdrift = metrics[:, 7], metrics[:, 8]
    with np.errstate(divide="ignore", invalid="ignore"):
        range0 = np.maximum(last0 + 1 - first0, 1)
        range1 = np.maximum(last1 + 1 - first1, 1)
        frac = np.minimum(mc / range0, mc / range1)
    keep = (
        (mc >= params.min_aligned_marker_count)
        & (frac >= params.min_aligned_fraction)
        & (np.minimum(first0, first1) <= params.max_trim)
        & (np.minimum(n0 - 1 - last0, n1 - 1 - last1) <= params.max_trim)
        & (mskip <= params.max_skip)
        & (mdrift <= params.max_drift)
    )
    if params.suppress_containments:
        contained0 = (first0 <= params.max_trim) & (
            n0 - 1 - last0 <= params.max_trim
        )
        contained1 = (first1 <= params.max_trim) & (
            n1 - 1 - last1 <= params.max_trim
        )
        keep &= ~(contained0 | contained1)
    return keep


def _prefetch_batches(batches) -> None:
    """Issue copy_to_host_async for every pending device payload so the
    relay overlaps the transfers; subsequent np.asarray calls find the
    bytes already in flight (or landed)."""
    for _tags, pending in batches:
        for kind, payload, _n_real in pending:
            try:
                if kind in ("pallas", "band"):
                    payload.copy_to_host_async()
                else:
                    payload[0].copy_to_host_async()
                    payload[1].copy_to_host_async()
            except AttributeError:
                pass  # already a host array (CPU/interpret path)


def _entry_to_flat(entry):
    """Decode one pending batch into flat arrays — no per-pair Python.

    Returns (metrics, rows, cols, vals): metrics (n_real, 10) int64;
    rows are batch-local pair indices, cols the matched ordinal0 and
    vals the matched ordinal1, in path order within each pair."""
    kind, payload, n_real = entry
    if kind == "p2":
        met_dev, delta_dev, bm = payload
        met = np.asarray(met_dev)[:n_real, :10].astype(np.int64)
        dm = np.asarray(delta_dev)[:n_real]
        sent = 255 if dm.dtype == np.uint8 else 65535
        rows, cols = np.nonzero(dm != sent)
        vals = dm[rows, cols].astype(np.int64) + cols + bm[rows]
        return met, rows, cols.astype(np.int64), vals
    if kind == "pallas":
        fused = np.asarray(payload)[:n_real]
        met = fused[:, :10].astype(np.int64)
        mjrows = fused[:, 16:]
        rows, cols = np.nonzero(mjrows >= 0)
        vals = mjrows[rows, cols].astype(np.int64)
        return met, rows, cols.astype(np.int64), vals
    # jnp fallback: (n_steps, B) traceback columns, reversed path order.
    m0, m1 = payload
    m0 = np.asarray(m0)[:, :n_real]
    m1 = np.asarray(m1)[:, :n_real]
    m0r = m0[::-1].T  # (n_real, n_steps), ascending path order
    m1r = m1[::-1].T
    rows, kidx = np.nonzero(m0r >= 0)
    cols = m0r[rows, kidx].astype(np.int64)
    vals = m1r[rows, kidx].astype(np.int64)
    met = np.zeros((n_real, 10), np.int64)
    counts = np.bincount(rows, minlength=n_real)
    starts = np.zeros(n_real + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for t in range(n_real):
        lo, hi = starts[t], starts[t + 1]
        if hi > lo:
            o0 = cols[lo:hi].astype(np.uint32)
            o1 = vals[lo:hi].astype(np.uint32)
            ms, md, omin, omax = _metrics_from_ordinals(o0, o1)
            met[t] = [hi - lo, o0[0], o0[-1], o1[0], o1[-1],
                      omin, omax, ms, md, 0]
    return met, rows, cols, vals


def align_candidates(
    markers,
    read_id0: np.ndarray,
    read_id1: np.ndarray,
    same_strand: np.ndarray,
    params: AlignParams,
    ds_hash_table: np.ndarray,
    progress: Optional[object] = None,
) -> AlignmentStore:
    """Align all candidate pairs (method 3 semantics) and apply the
    reference's acceptance filters (reference: AssemblerAlign.cpp:437-470).

    The first oriented read of each pair is (read_id0, strand 0); the
    second is (read_id1, strand 0) for same-strand candidates and
    (read_id1, strand 1) otherwise — matching the reference convention
    (reference: AssemblerAlign.cpp:380-384).
    """
    n_pairs = read_id0.shape[0]
    or0 = (read_id0.astype(np.int64) << 1)
    or1 = (read_id1.astype(np.int64) << 1) | (~same_strand).astype(np.int64)

    koff = np.asarray(markers.offsets, np.int64)
    klen = np.diff(koff)
    kmer_flat = markers.kmer_ids.astype(np.int32)
    n_or = markers.oriented_read_count

    # Downsampled marker selection (strand-symmetric hash threshold),
    # as one global CSR: ds_kmer_flat/ds_off index downsampled markers
    # per oriented read; ds_ord_flat maps each back to its original
    # ordinal (reference keeps (ordinal, kmer) pairs per read:
    # AssemblerAlign3.cpp:76-80). All array passes — no per-pair
    # Python prep, so host time stays flat as candidates grow.
    _prof = _ProfTimer()
    ds_threshold = np.uint32(
        min(int(params.downsampling_factor * float(2**32)), 2**32 - 1)
    )
    ds_sel = np.flatnonzero(ds_hash_table[markers.kmer_ids] < ds_threshold)
    orid_of_sel = np.searchsorted(koff, ds_sel, side="right") - 1
    ds_kmer_flat = kmer_flat[ds_sel]
    ds_ord_flat = ds_sel - koff[orid_of_sel]
    ds_len = np.bincount(orid_of_sel, minlength=n_or).astype(np.int64)
    ds_off = np.zeros(n_or + 1, np.int64)
    np.cumsum(ds_len, out=ds_off[1:])

    la_ds = ds_len[or0]
    lb_ds = ds_len[or1]
    run_idx = np.flatnonzero((la_ds > 0) & (lb_ds > 0))

    # ---- Pipelined phase 1 -> phase 2 ----
    # Phase-1 batches are dispatched all at once; as each batch's
    # results arrive, the bands are computed and the corresponding
    # phase-2 (banded full-sequence) batches dispatch immediately, so
    # the phase-1 fetches and band mapping overlap the device work of
    # phase 2. The DP i axis is oriented read 0, j axis is oriented
    # read 1; the band is on j - i = ordinal1 - ordinal0 = -offset.
    _prof.mark("ds_prep")

    def _early_keep_fn(tags, met):
        # The same acceptance mask the filtered collection applies —
        # known up front, so the runner can compact batches during
        # dispatch when device residency exceeds its budget.
        return _keep_mask_from_metrics(
            met, klen[or0[tags]], klen[or1[tags]], params
        )

    runner = _CsrStreamingRunner(
        kmer_flat, koff, klen, params, keep_fn=_early_keep_fn
    )
    if run_idx.shape[0]:
        # Full-matrix band for phase 1: j - i ranges over [-LA, LB]
        # (the reference aligns the downsampled sequences unbanded,
        # AssemblerAlign3.cpp:96-130).
        widths_ds = la_ds[run_idx] + lb_ds[run_idx] + 1
        bmins_ds = -la_ds[run_idx]
        # Ultra-long pairs whose full width exceeds the widest kernel
        # band get a band seeded from the exact-match diagonal range
        # instead (score-preserving — every DP match is an exact k-mer
        # match, and co-optimal paths reorder to stay inside the dot
        # range; deviation: tie-broken matched pairs may differ from
        # the unbanded path, absorbed by bandExtend downstream).
        # Pairs without any shared k-mer cannot align at all and are
        # dropped here, like an empty unbanded alignment would be.
        wide = widths_ds > _W_BUCKETS[-1]
        if wide.any():
            wsel = np.flatnonzero(wide)
            dmin, dmax, has = _dot_diag_band(
                or0[run_idx[wsel]], or1[run_idx[wsel]],
                ds_kmer_flat, ds_off, ds_len,
                max_width=_W_BUCKETS[-1],
            )
            w2 = dmax - dmin + 3
            use = has & (w2 <= _W_BUCKETS[-1])
            bmins_ds[wsel[use]] = dmin[use] - 1
            widths_ds[wsel[use]] = w2[use]
            drop = wsel[~has]
            if drop.shape[0]:
                keep_mask = np.ones(run_idx.shape[0], bool)
                keep_mask[drop] = False
                run_idx = run_idx[keep_mask]
                widths_ds = widths_ds[keep_mask]
                bmins_ds = bmins_ds[keep_mask]
        key_mat = np.stack(
            [
                _bucket_vec(la_ds[run_idx], _LEN_BUCKETS),
                _bucket_vec(lb_ds[run_idx], _LEN_BUCKETS),
                _bucket_vec(widths_ds, _W_BUCKETS),
            ],
            axis=1,
        )
        uk, inv = np.unique(key_mat, axis=0, return_inverse=True)
        ph1 = []
        ds_dev_csr = _to_device_csr(
            ds_kmer_flat, ds_off, ds_len, aux=ds_ord_flat.astype(np.int32)
        )
        band_fused = os.environ.get("SHASTA_TPU_BAND_FUSE", "1") != "0"
        for ki in range(uk.shape[0]):
            sel = np.flatnonzero(inv == ki)
            idxs = run_idx[sel]
            la_k, lb_k, w_k = (int(x) for x in uk[ki])
            # Centre each pair's band inside the padded width.
            bm = (bmins_ds[sel] - (w_k - widths_ds[sel]) // 2).astype(np.int32)
            pending = _dispatch_csr(
                ds_kmer_flat, ds_off, ds_len,
                or0[idxs], or1[idxs], bm, w_k, la_k, lb_k, params,
                dev_csr=ds_dev_csr,
                band_fused=band_fused,
            )
            lo = 0
            for entry in pending:
                n_real = entry[2]
                ph1.append((idxs[lo : lo + n_real], [entry]))
                lo += n_real
        _prof.mark("ph1_dispatch")
        _prefetch_batches(ph1)
        for idx_arr, pending in ph1:
            if pending[0][0] == "band":
                # On-device band reduction: 3 ints/pair, already mapped
                # to original-ordinal offsets.
                arr = np.asarray(pending[0][1])[: idx_arr.shape[0]]
                _prof.mark("ph1_collect", accumulate=True)
                cnt = arr[:, 0].astype(np.int64)
                bmin = arr[:, 1].astype(np.int64) - params.band_extend
                bmax = arr[:, 2].astype(np.int64) + params.band_extend
                # reference: AssemblerAlign3.cpp:233-239
                ok = (cnt > 0) & (bmax - bmin <= params.max_band)
                sel = np.flatnonzero(ok)
                if sel.shape[0]:
                    ps = idx_arr[sel]
                    runner.add_many(
                        or0[ps], or1[ps],
                        -bmax[sel],
                        bmax[sel] - bmin[sel] + 1,
                        ps,
                    )
                _prof.mark("ph1_bands_ph2_dispatch", accumulate=True)
                continue
            _met, rows, cols, vals = _entry_to_flat(pending[0])
            _prof.mark("ph1_collect", accumulate=True)
            # Vectorized band mapping: one flat pass over every matched
            # ordinal of the whole batch, per-pair min/max via reduceat.
            n_real = idx_arr.shape[0]
            counts = np.bincount(rows, minlength=n_real)
            bands = np.zeros((n_real, 2), np.int64)
            ok = counts > 0
            if ok.any():
                p_of = idx_arr[rows]
                off = (
                    ds_ord_flat[ds_off[or0[p_of]] + cols]
                    - ds_ord_flat[ds_off[or1[p_of]] + vals]
                )
                starts = np.zeros(n_real + 1, np.int64)
                np.cumsum(counts, out=starts[1:])
                nz = np.flatnonzero(ok)
                bmin = np.minimum.reduceat(off, starts[nz]) - params.band_extend
                bmax = np.maximum.reduceat(off, starts[nz]) + params.band_extend
                # reference: AssemblerAlign3.cpp:233-239
                fits = bmax - bmin <= params.max_band
                bands[nz[fits], 0] = bmin[fits]
                bands[nz[fits], 1] = bmax[fits]
                ok[nz[~fits]] = False
            sel = np.flatnonzero(ok)
            if sel.shape[0]:
                ps = idx_arr[sel]
                runner.add_many(
                    or0[ps], or1[ps],
                    -bands[sel, 1],
                    bands[sel, 1] - bands[sel, 0] + 1,
                    ps,
                )
            _prof.mark("ph1_bands_ph2_dispatch", accumulate=True)
    runner.flush_all()
    _prof.mark("ph2_flush")

    # Filtered phase-2 collection, split in two sweeps: the metrics
    # land first (tiny), the output CSR is sized from them, and then
    # each batch's device-compacted matches scatter straight into the
    # final ordinal arrays on arrival — nothing accumulates (the
    # decoded-chunk accumulation this replaces was a ~24 GB transient
    # at SCALE=50, the run's RSS peak).
    met_of = np.zeros((n_pairs, 10), np.int64)
    seen = np.zeros(n_pairs, bool)

    def _keep_fn(tags, met):
        return _keep_mask_from_metrics(
            met, klen[or0[tags]], klen[or1[tags]], params
        )

    for tags, met in runner.collect_filtered_metrics(_keep_fn):
        met_of[tags] = met
        seen[tags] = True
    _prof.mark("ph2_metrics")

    full_idx = np.flatnonzero(seen)
    metrics = met_of[full_idx] if full_idx.shape[0] else np.zeros((0, 10), np.int64)

    # ---- Filters, vectorized over the in-kernel metrics (the same
    # mask the metric sweep used to restrict the match fetch) ----
    mc = metrics[:, 0]
    first0, last0 = metrics[:, 1], metrics[:, 2]
    first1, last1 = metrics[:, 3], metrics[:, 4]
    omin, omax = metrics[:, 5], metrics[:, 6]
    mskip, mdrift = metrics[:, 7], metrics[:, 8]
    n0 = klen[or0[full_idx]] if full_idx.shape[0] else np.zeros(0, np.int64)
    n1 = klen[or1[full_idx]] if full_idx.shape[0] else np.zeros(0, np.int64)

    keep = _keep_mask_from_metrics(metrics, n0, n1, params)
    kept_t = np.flatnonzero(keep)
    kept_p = full_idx[kept_t]

    offs = np.zeros(kept_t.shape[0] + 1, np.int64)
    np.cumsum(mc[kept_t], out=offs[1:])
    # Ordinals are within-read marker indices: uint16 suffices below
    # 65,536 markers/read (= reads under ~650 kb raw at 10% marker
    # density), halving the largest persistent alignment arrays
    # (reference analog: the byte-compressed alignment storage,
    # src/compressAlignment.cpp).
    ord_dtype = (
        np.uint16 if int(klen.max(initial=0)) <= 0xFFFF else np.uint32
    )
    ord0 = np.empty(int(offs[-1]), ord_dtype)
    ord1 = np.empty(int(offs[-1]), ord_dtype)
    # Vectorized scatter: every match lands at the kept pair's CSR
    # offset plus its within-pair path position (matches of one pair
    # are contiguous and path-ordered within their batch chunk).
    rank = np.full(n_pairs, -1, np.int64)
    rank[kept_p] = np.arange(kept_p.shape[0])
    for tags, rows, cols, vals in runner.collect_filtered_matches():
        if rows.shape[0] == 0:
            continue
        pr = rank[tags[rows]]
        m = pr >= 0
        if not m.any():
            continue
        starts = np.searchsorted(rows, np.arange(tags.shape[0] + 1))
        within = np.arange(rows.shape[0], dtype=np.int64) - starts[rows]
        pos = offs[pr[m]] + within[m]
        ord0[pos] = cols[m]
        ord1[pos] = vals[m]
    _prof.mark("ph2_collect")
    _prof.report(n_pairs)

    return AlignmentStore(
        read_id0=read_id0[kept_p].astype(np.int32),
        read_id1=read_id1[kept_p].astype(np.int32),
        same_strand=same_strand[kept_p].astype(bool),
        marker_count=mc[kept_t].astype(np.int32),
        n_markers0=n0[kept_t].astype(np.int32),
        n_markers1=n1[kept_t].astype(np.int32),
        first0=first0[kept_t].astype(np.int32),
        last0=last0[kept_t].astype(np.int32),
        first1=first1[kept_t].astype(np.int32),
        last1=last1[kept_t].astype(np.int32),
        min_offset=omin[kept_t].astype(np.int32),
        max_offset=omax[kept_t].astype(np.int32),
        max_skip_v=mskip[kept_t].astype(np.int32),
        max_drift_v=mdrift[kept_t].astype(np.int32),
        ord0=ord0,
        ord1=ord1,
        offsets=offs,
    )
