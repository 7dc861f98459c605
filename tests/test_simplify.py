"""Bubble/superbubble removal + noisy-read end-to-end assembly."""

import os

import numpy as np
import pytest

from shasta_tpu.data import bases as B
from shasta_tpu.data.markers import MarkerStore
from shasta_tpu.graph import marker_graph as MG
from shasta_tpu.graph.simplify import simplify_marker_graph
from shasta_tpu.pipeline.assemble import run_assembly

from tests import synth
from tests.test_assembly_e2e import read_fasta_codes, small_config
from tests.test_marker_graph import make_markers


def test_bubble_removal_keeps_best_branch():
    # Two reads agree on a path; one read takes a detour in the middle
    # -> a bubble. The low-coverage branch must be removed.
    # Build a synthetic marker graph directly.
    # Oriented reads: r0s0, r0s1, r1s0, r1s1, r2s0, r2s1.
    # Main path vertices A-B-C-D (coverage 3 through B-C for reads 0,1;
    # read 2 takes B-X-C).
    m = make_markers(
        [
            [1, 2, 3, 4],
            [9, 9, 9, 9],
            [1, 2, 3, 4],
            [9, 9, 9, 9],
            [1, 2, 5, 3, 4],
            [9, 9, 9, 9, 9],
        ]
    )
    # Unite markers at ordinals: reads 0,1 fully; read 2 shares 1,2 and 3,4.
    # marker ids: r0s0: 0-3, r0s1: 4-7, r1s0: 8-11, r1s1: 12-15,
    # r2s0: 16-20, r2s1: 21-25
    u = np.array([0, 1, 2, 3, 0, 1, 2, 3, 7, 6, 5, 4, 7, 6, 5, 4])
    v = np.array([8, 9, 10, 11, 16, 17, 19, 20, 15, 14, 13, 12, 25, 24, 22, 21])
    mg = MG.create_marker_graph_vertices(m, u, v, min_coverage=1, max_coverage=10)
    MG.create_marker_graph_edges(m, mg)
    assert MG.check_strand_symmetry(mg)

    alive_before = int(mg.alive().sum())
    simplify_marker_graph(mg, [10])
    alive_after = int(mg.alive().sum())
    # The detour branch (B->X->C and its RC) must be gone.
    assert alive_after < alive_before
    # The main path must survive: per strand 3 edges.
    assert alive_after == 6


@pytest.mark.slow
def test_e2e_with_errors(tmp_path):
    genome = synth.random_genome(20000, seed=21)
    reads = synth.sample_reads(
        genome, 140, 2500, seed=22, error_rate=0.01, both_strands=True
    )
    fasta_path = os.path.join(tmp_path, "reads.fasta")
    synth.write_fasta(fasta_path, reads)

    cfg = small_config()
    run_dir = os.path.join(tmp_path, "run")
    summary = run_assembly([fasta_path], run_dir, cfg)
    assert summary["assembledSegmentCount"] >= 1
    total = summary["totalAssembledSegmentLength"]
    assert total > 0.7 * 20000

    # Contigs must align to the genome with high identity: check that
    # a large fraction of 20-mers of each contig occur in the genome.
    gs = B.decode_to_str(genome)
    gs_rc = B.decode_to_str(B.reverse_complement(genome))
    kmers = set()
    K = 20
    for s in (gs, gs_rc):
        for i in range(len(s) - K + 1):
            kmers.add(s[i : i + K])
    for c in read_fasta_codes(os.path.join(run_dir, "Assembly.fasta")):
        cs = B.decode_to_str(c)
        hits = sum(
            1 for i in range(0, len(cs) - K + 1, K) if cs[i : i + K] in kmers
        )
        total_k = max(1, (len(cs) - K + 1 + K - 1) // K)
        assert hits / total_k > 0.9, (len(cs), hits, total_k)
