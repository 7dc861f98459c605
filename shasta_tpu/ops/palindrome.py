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
    # The strand-1 marker multiset is exactly the reverse complement of
    # the strand-0 multiset, so the read-vs-own-RC common count is the
    # multiset intersection of the strand-0 k-mers with their own
    # reverse complements — computable with ONE single-key sort over
    # the strand-0 half of the markers.
    from shasta_tpu.data.kmers import reverse_complement_kmers

    n_pos0 = int(counts[0::2].sum())
    if n_pos0:
        read_of0 = np.repeat(
            np.arange(n_reads, dtype=np.int64), counts[0::2]
        )
        # Flat indices of all strand-0 markers: per-read range starts
        # repeated plus within-range offsets (pure arithmetic, no
        # full-length mask).
        counts0 = counts[0::2]
        cum0 = np.concatenate(([0], np.cumsum(counts0)))[:-1]
        pos0 = (
            np.repeat(koff[0:n_or:2] - cum0, counts0)
            + np.arange(n_pos0, dtype=np.int64)
        )
        k0 = markers.kmer_ids[pos0].astype(np.uint64)
        rc0 = reverse_complement_kmers(k0.astype(np.uint32), markers.k).astype(
            np.uint64
        )
        # Pack the side flag into the low bit so ONE value sort (no
        # argsort + gathers) groups (read, kmer) with sides adjacent.
        r64 = read_of0.astype(np.uint64) << np.uint64(33)
        both = np.concatenate(
            [r64 | (k0 << np.uint64(1)), r64 | (rc0 << np.uint64(1)) | np.uint64(1)]
        )
        both.sort()
        vals = both >> np.uint64(1)
        bits = both & np.uint64(1)
        new_grp = np.empty(vals.shape[0], bool)
        new_grp[0] = True
        new_grp[1:] = vals[1:] != vals[:-1]
        bounds = np.flatnonzero(new_grp)
        tot_per = np.empty(bounds.shape[0], np.int64)
        tot_per[:-1] = np.diff(bounds)
        tot_per[-1] = vals.shape[0] - bounds[-1]
        n_b = np.add.reduceat(bits, bounds).astype(np.int64)
        n_a = tot_per - n_b
        g_read = (vals[bounds] >> np.uint64(32)).astype(np.int64)
        common = np.bincount(
            g_read, weights=np.minimum(n_a, n_b), minlength=n_reads
        ).astype(np.int64)
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
