"""Palindromic read detection.

TPU-native counterpart of the reference flagPalindromicReads
(reference: src/AssemblerAlign.cpp:652-780): align each read against
its own reverse complement in marker space; the read is palindromic if
the aligned fraction and the fraction of matches near the main
diagonal (|ordinal0 - ordinal1| < deltaThreshold) both exceed their
thresholds.

Deviation from the reference: the reference uses the unbanded method-0
alignment; here the self-RC alignment runs the banded DP kernel with
the band centered on the diagonal (±deltaThreshold). A palindromic
read's self-RC alignment lies near the diagonal by construction, so
the banded alignment captures the same signal; matches outside the
band would be discarded by the near-diagonal criterion anyway.
"""

from __future__ import annotations

import numpy as np

from shasta_tpu.data.markers import MarkerStore
from shasta_tpu.ops.align import AlignParams, _grouped_run


def flag_palindromic_reads(
    markers: MarkerStore,
    aligned_fraction_threshold: float = 0.1,
    near_diagonal_fraction_threshold: float = 0.1,
    delta_threshold: int = 100,
) -> np.ndarray:
    """Returns is_palindromic: bool [n_reads]."""
    n_or = markers.oriented_read_count
    n_reads = n_or // 2
    out = np.zeros(n_reads, dtype=bool)
    if n_reads == 0:
        return out

    koff = markers.offsets
    kmer_flat = markers.kmer_ids.astype(np.int32)

    # Pre-filter: the DP path's match count is bounded above by the
    # multiset intersection of the read's marker k-mers with its RC's,
    # so a read whose common-k-mer fraction is below either threshold
    # cannot satisfy both criteria and needs no alignment. (On typical
    # data this eliminates nearly every read; the reference instead
    # aligns all of them.)
    counts = np.diff(koff)
    n_pos = kmer_flat.shape[0]
    orid_of_p = np.repeat(np.arange(n_or, dtype=np.int64), counts)
    read_of_p = orid_of_p >> 1
    order = np.lexsort((kmer_flat, orid_of_p))
    sk = kmer_flat[order]
    so = orid_of_p[order]
    # Group by (orid, kmer): multiplicity of each kmer on each strand.
    new_grp = np.empty(n_pos, dtype=bool)
    if n_pos:
        new_grp[0] = True
        new_grp[1:] = (sk[1:] != sk[:-1]) | (so[1:] != so[:-1])
        gid = np.cumsum(new_grp) - 1
        mult = np.bincount(gid)
        g_orid = so[new_grp]
        g_kmer = sk[new_grp]
        # Match strand-0 groups against strand-1 groups of the same read.
        key_read = g_orid >> 1
        # Sort groups by (read, kmer, strand) so a read's matching
        # 0/1-strand groups are adjacent.
        gorder = np.lexsort((g_orid & 1, g_kmer, key_read))
        kr, kk, st, mu = (
            key_read[gorder], g_kmer[gorder], (g_orid & 1)[gorder], mult[gorder]
        )
        common = np.zeros(n_reads, dtype=np.int64)
        if kr.shape[0] > 1:
            pairm = (
                (kr[1:] == kr[:-1]) & (kk[1:] == kk[:-1])
                & (st[:-1] == 0) & (st[1:] == 1)
            )
            np.add.at(
                common, kr[1:][pairm], np.minimum(mu[1:][pairm], mu[:-1][pairm])
            )
        total0 = counts[0::2]
        frac_cap = np.where(total0 > 0, common / np.maximum(total0, 1), 0.0)
        # Both criteria must hold, and each is bounded by frac_cap, so
        # only reads reaching the larger threshold can qualify.
        candidates = np.flatnonzero(
            frac_cap
            >= max(aligned_fraction_threshold, near_diagonal_fraction_threshold)
        )
    else:
        candidates = np.zeros(0, dtype=np.int64)
    if candidates.shape[0] == 0:
        return out

    a_rows = []
    b_rows = []
    for r in candidates:
        a_rows.append(kmer_flat[koff[2 * r] : koff[2 * r + 1]])
        b_rows.append(kmer_flat[koff[2 * r + 1] : koff[2 * r + 2]])

    W = 2 * delta_threshold
    band_mins = np.full(candidates.shape[0], -delta_threshold, dtype=np.int64)
    widths = np.full(candidates.shape[0], W, dtype=np.int64)
    params = AlignParams()
    results, _metrics = _grouped_run(a_rows, b_rows, band_mins, widths, params)

    for i, r in enumerate(candidates):
        o0, o1 = results[i]
        total = a_rows[i].shape[0]
        if total == 0 or o0.shape[0] == 0:
            continue
        aligned_fraction = o0.shape[0] / total
        if aligned_fraction < aligned_fraction_threshold:
            continue
        delta = np.abs(o0.astype(np.int64) - o1.astype(np.int64))
        near = int((delta < delta_threshold).sum())
        if near / total >= near_diagonal_fraction_threshold:
            out[r] = True
    return out
