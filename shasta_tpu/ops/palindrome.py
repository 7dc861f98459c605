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

    a_rows = []
    b_rows = []
    for r in range(n_reads):
        a_rows.append(kmer_flat[koff[2 * r] : koff[2 * r + 1]])
        b_rows.append(kmer_flat[koff[2 * r + 1] : koff[2 * r + 2]])

    W = 2 * delta_threshold
    band_mins = np.full(n_reads, -delta_threshold, dtype=np.int64)
    widths = np.full(n_reads, W, dtype=np.int64)
    params = AlignParams()
    results, _metrics = _grouped_run(a_rows, b_rows, band_mins, widths, params)

    for r in range(n_reads):
        o0, o1 = results[r]
        total = a_rows[r].shape[0]
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
