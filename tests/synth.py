"""Synthetic genome / read-set generation for tests and benchmarks.

Gives ground truth to validate the assembler end-to-end: sample a
random genome, draw overlapping reads (optionally with errors and from
both strands), and check that the assembled contigs reconstruct the
genome.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from shasta_tpu.data import bases as B

ALPHA = "ACGT"


def random_genome(length: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4, size=length, endpoint=False).astype(np.uint8)


def sample_reads(
    genome: np.ndarray,
    n_reads: int,
    read_length: int,
    seed: int = 1,
    error_rate: float = 0.0,
    both_strands: bool = True,
    circular: bool = False,
) -> List[np.ndarray]:
    """Sample reads uniformly from the genome (code arrays)."""
    rng = np.random.default_rng(seed)
    g_len = genome.shape[0]
    reads = []
    max_start = g_len if circular else g_len - read_length
    starts = rng.integers(0, max(1, max_start), size=n_reads)
    for s in starts:
        if circular:
            idx = (np.arange(read_length) + s) % g_len
            r = genome[idx]
        else:
            r = genome[s : s + read_length].copy()
        if error_rate > 0:
            r = apply_errors(r, rng, error_rate)
        if both_strands and rng.random() < 0.5:
            r = B.reverse_complement(r)
        reads.append(r)
    return reads


def apply_errors(read: np.ndarray, rng, rate: float) -> np.ndarray:
    """Apply substitution/insertion/deletion errors (1/3 each)."""
    out = []
    i = 0
    n = read.shape[0]
    err = rng.random(2 * n)
    kinds = rng.integers(0, 3, size=2 * n)
    subs = rng.integers(1, 4, size=2 * n)
    j = 0
    while i < n:
        if err[j] < rate:
            kind = kinds[j]
            if kind == 0:  # substitution
                out.append((read[i] + subs[j]) % 4)
                i += 1
            elif kind == 1:  # insertion
                out.append(subs[j] % 4)
            else:  # deletion
                i += 1
        else:
            out.append(read[i])
            i += 1
        j += 1
    return np.array(out, dtype=np.uint8)


def write_fasta(path: str, reads: List[np.ndarray], prefix: str = "read") -> None:
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">{prefix}-{i}\n")
            f.write(B.decode_to_str(r))
            f.write("\n")
