"""Iterative assembly: refine the read graph using pseudo-paths.

TPU-era counterpart of the reference's iterative assembly option
(reference: srcMain/main.cpp:851-906,
src/AssemblerCreateReadGraphUsingPseudoPaths.cpp): after an initial
assembly, each oriented read's *pseudo-path* (its journey through the
assembly graph segments — the same object mode 3 calls a journey) is
computed; each alignment's two pseudo-paths are aligned (NW over
segment ids, match 1 / mismatch -1 / gap -1); alignments whose
pseudo-paths disagree are dropped (score threshold with a quadratic
mismatch penalty, reference's mismatchSquareFactor); the read graph is
rebuilt from the survivors and the marker graph is recomputed. Repeat.

This separates reads from different repeat copies / haplotypes that
sequence-level alignment alone cannot distinguish.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from shasta_tpu.consensus.msa import nw_align
from shasta_tpu.graph import marker_graph as MG
from shasta_tpu.graph import read_graph as RG
from shasta_tpu.graph.mode3 import create_mode3_graph


def score_alignment_pseudo_paths(
    journey0: np.ndarray,
    journey1: np.ndarray,
    mismatch_square_factor: float = 3.0,
    match_score: int = 1,
    mismatch_score: int = -1,
    gap_score: int = -1,
) -> float:
    """Alignment score of two pseudo-paths (reference semantics:
    match 1, mismatch -1, gap -1, final score penalized by
    mismatchSquareFactor * mismatches^2)."""
    if journey0.shape[0] == 0 or journey1.shape[0] == 0:
        return 0.0
    a0, a1 = nw_align(
        journey0.astype(np.int64), journey1.astype(np.int64),
        match_score, mismatch_score, gap_score,
    )
    matches = 0
    mismatches = 0
    for i, j in zip(a0, a1):
        if i >= 0 and j >= 0:
            if journey0[i] == journey1[j]:
                matches += 1
            else:
                mismatches += 1
    return matches - mismatch_square_factor * mismatches * mismatches


def refine_read_graph_with_pseudo_paths(
    assembler,
    min_score: float = 1.0,
    mismatch_square_factor: float = 3.0,
) -> Tuple[int, int]:
    """One refinement round: compute journeys from the current marker
    graph, drop read-graph alignments with discordant pseudo-paths,
    rebuild read graph + marker graph. Returns (kept, dropped)."""
    mg = assembler.marker_graph
    markers = assembler.markers
    al = assembler.alignments
    m3 = create_mode3_graph(markers, mg, min_link_coverage=1)

    # Score each alignment currently usable.
    n = al.count
    keep = np.zeros(n, dtype=bool)
    aopt = assembler.config.assembly
    for i in range(n):
        orid0 = int(al.read_id0[i]) * 2
        orid1 = int(al.read_id1[i]) * 2 + (0 if al.same_strand[i] else 1)
        s = score_alignment_pseudo_paths(
            m3.journey(orid0), m3.journey(orid1), mismatch_square_factor,
            aopt.iterative_pseudo_path_align_match_score,
            aopt.iterative_pseudo_path_align_mismatch_score,
            aopt.iterative_pseudo_path_align_gap_score,
        )
        keep[i] = s >= min_score

    dropped = int((~keep).sum())

    # Rebuild the read graph from surviving alignments with the usual
    # kNN selection restricted to the survivors.
    sub = np.flatnonzero(keep)
    knn_keep = RG.select_alignments_knn(
        _subset_alignments(al, sub), assembler.reads.read_count,
        assembler.config.assembly.iterative_max_alignment_count,
    )
    final_keep = np.zeros(n, dtype=bool)
    final_keep[sub[knn_keep]] = True
    assembler.read_graph = RG.build_read_graph(
        al, assembler.reads.read_count, final_keep
    )

    # Recompute marker graph vertices + edges.
    assembler.create_marker_graph_vertices()
    assembler.create_marker_graph_edges()
    return int(final_keep.sum()), dropped


def _subset_alignments(al, idx: np.ndarray):
    """A lightweight view with only the fields kNN selection needs."""

    class _View:
        pass

    v = _View()
    v.count = idx.shape[0]
    v.read_id0 = al.read_id0[idx]
    v.read_id1 = al.read_id1[idx]
    v.marker_count = al.marker_count[idx]
    return v
