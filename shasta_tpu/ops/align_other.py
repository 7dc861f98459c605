"""Alignment methods 0, 1 and 4 (method 3 is the production default,
implemented in shasta_tpu.ops.align / align_pallas).

- Method 0 (reference: src/AlignmentGraph.{hpp,cpp}): the legacy
  alignment. Matching marker pairs ("dots", restricted to markers that
  occur at most maxMarkerFrequency times in each read) are chained
  into the best strictly-increasing path under maxSkip/maxDrift
  constraints. The reference finds this path via a boost Dijkstra over
  a graph of dots; an equivalent heaviest-increasing-chain DP is used
  here (same constraints, same matches-maximizing objective).
- Method 1 (reference: src/AssemblerAlign1.cpp): SeqAn global/overlap
  alignment over the full marker sequences, O(N^2). Implemented as the
  same NW (free-end overlap scoring) on host; intended for short
  sequences and debugging, exactly like the reference.
- Method 4 (reference: src/Align4.{hpp,cpp}): band discovery from
  downsampled matching markers followed by banded alignment. This is
  structurally the two-phase scheme the method-3 engine already
  implements (band from downsampled dots -> banded DP), so method 4
  dispatches to that engine.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def dots_between(
    a: np.ndarray, b: np.ndarray, max_marker_frequency: int = 10
) -> Tuple[np.ndarray, np.ndarray]:
    """All (i, j) with a[i] == b[j], for k-mers occurring at most
    max_marker_frequency times in each sequence; sorted by (i, j)."""
    ua, ca = np.unique(a, return_counts=True)
    ub, cb = np.unique(b, return_counts=True)
    ok_a = set(ua[ca <= max_marker_frequency].tolist())
    ok_b = set(ub[cb <= max_marker_frequency].tolist())
    ok = ok_a & ok_b
    ii = []
    jj = []
    pos_b = {}
    for j, kb in enumerate(b):
        if int(kb) in ok:
            pos_b.setdefault(int(kb), []).append(j)
    for i, ka in enumerate(a):
        for j in pos_b.get(int(ka), ()):
            ii.append(i)
            jj.append(j)
    order = np.lexsort((jj, ii)) if ii else np.zeros(0, np.int64)
    return (
        np.array(ii, np.int64)[order] if ii else np.zeros(0, np.int64),
        np.array(jj, np.int64)[order] if jj else np.zeros(0, np.int64),
    )


def align_method0(
    a: np.ndarray,
    b: np.ndarray,
    max_skip: int = 30,
    max_drift: int = 30,
    max_marker_frequency: int = 10,
) -> Tuple[np.ndarray, np.ndarray]:
    """Heaviest strictly-increasing chain of matching marker dots
    under skip/drift constraints. Returns (ord0, ord1)."""
    ii, jj = dots_between(a, b, max_marker_frequency)
    n = ii.shape[0]
    if n == 0:
        return np.zeros(0, np.uint32), np.zeros(0, np.uint32)
    best = np.ones(n, np.int64)
    prev = np.full(n, -1, np.int64)
    for t in range(n):
        for s in range(t - 1, -1, -1):
            if ii[t] - ii[s] > max_skip:
                break  # sorted by i: no earlier dot can be closer
            if ii[s] >= ii[t] or jj[s] >= jj[t]:
                continue
            if jj[t] - jj[s] > max_skip:
                continue
            drift = abs((ii[t] - jj[t]) - (ii[s] - jj[s]))
            if drift > max_drift:
                continue
            if best[s] + 1 > best[t]:
                best[t] = best[s] + 1
                prev[t] = s
    end = int(np.argmax(best))
    path = []
    while end >= 0:
        path.append(end)
        end = int(prev[end])
    path.reverse()
    return ii[path].astype(np.uint32), jj[path].astype(np.uint32)


def align_candidates_method(
    markers,
    read_id0: np.ndarray,
    read_id1: np.ndarray,
    same_strand: np.ndarray,
    params,
    method: int,
):
    """Align candidates with method 0 or 1 and apply the reference's
    acceptance filters; returns an AlignmentStore (host loop — these
    methods exist for parity/debugging, the production path is the
    batched method 3 engine)."""
    from shasta_tpu.ops.align import AlignmentStore, _metrics_from_ordinals

    koff = markers.offsets
    kmer_flat = markers.kmer_ids.astype(np.int32)
    or0 = read_id0.astype(np.int64) << 1
    or1 = (read_id1.astype(np.int64) << 1) | (~same_strand).astype(np.int64)

    keep_rows = []
    for p in range(read_id0.shape[0]):
        a = kmer_flat[koff[or0[p]] : koff[or0[p] + 1]]
        b = kmer_flat[koff[or1[p]] : koff[or1[p] + 1]]
        if method == 0:
            o0, o1 = align_method0(
                a, b, max_skip=params.max_skip, max_drift=params.max_drift
            )
        else:
            o0, o1 = align_method1(
                a, b, params.match_score, params.mismatch_score, params.gap_score
            )
        mc = o0.shape[0]
        if mc < params.min_aligned_marker_count:
            continue
        n0, n1 = a.shape[0], b.shape[0]
        first0, last0 = int(o0[0]), int(o0[-1])
        first1, last1 = int(o1[0]), int(o1[-1])
        if (
            min(mc / (last0 + 1 - first0), mc / (last1 + 1 - first1))
            < params.min_aligned_fraction
        ):
            continue
        if (
            min(first0, first1) > params.max_trim
            or min(n0 - 1 - last0, n1 - 1 - last1) > params.max_trim
        ):
            continue
        max_skip, max_drift, omin, omax = _metrics_from_ordinals(o0, o1)
        if max_skip > params.max_skip or max_drift > params.max_drift:
            continue
        keep_rows.append(
            (p, mc, n0, n1, first0, last0, first1, last1, omin, omax,
             max_skip, max_drift, o0, o1)
        )

    n_keep = len(keep_rows)
    offs = np.zeros(n_keep + 1, np.int64)
    for i, row in enumerate(keep_rows):
        offs[i + 1] = offs[i] + row[1]
    ord0 = np.empty(int(offs[-1]), np.uint32)
    ord1 = np.empty(int(offs[-1]), np.uint32)
    for i, row in enumerate(keep_rows):
        ord0[offs[i] : offs[i + 1]] = row[12]
        ord1[offs[i] : offs[i + 1]] = row[13]

    def col(j, dtype=np.int32):
        return np.array([r[j] for r in keep_rows], dtype)

    kept_p = col(0, np.int64)
    return AlignmentStore(
        read_id0=read_id0[kept_p].astype(np.int32),
        read_id1=read_id1[kept_p].astype(np.int32),
        same_strand=same_strand[kept_p].astype(bool),
        marker_count=col(1),
        n_markers0=col(2),
        n_markers1=col(3),
        first0=col(4),
        last0=col(5),
        first1=col(6),
        last1=col(7),
        min_offset=col(8),
        max_offset=col(9),
        max_skip_v=col(10),
        max_drift_v=col(11),
        ord0=ord0,
        ord1=ord1,
        offsets=offs,
    )


def align_method1(
    a: np.ndarray, b: np.ndarray, match: int = 6, mismatch: int = -1, gap: int = -1
) -> Tuple[np.ndarray, np.ndarray]:
    """Full (unbanded) overlap alignment over marker sequences;
    returns matched ordinal pairs on the optimal path."""
    from shasta_tpu.consensus.msa import nw_align

    # nw_align is global NW with the same move preferences; free-end
    # behavior is approximated by trimming end gaps from the result.
    a0, b0 = nw_align(a.astype(np.int64), b.astype(np.int64), match, mismatch, gap)
    o0 = []
    o1 = []
    for i, j in zip(a0, b0):
        if i >= 0 and j >= 0 and a[i] == b[j]:
            o0.append(i)
            o1.append(j)
    return np.array(o0, np.uint32), np.array(o1, np.uint32)
