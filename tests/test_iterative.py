"""Iterative assembly: pseudo-path scoring + pipeline round trip."""

import os

import numpy as np
import pytest

from shasta_tpu.pipeline.iterative import score_alignment_pseudo_paths

from tests import synth
from tests.test_assembly_e2e import small_config


def test_score_concordant_paths():
    j0 = np.array([1, 2, 3, 4])
    j1 = np.array([2, 3, 4, 5])
    assert score_alignment_pseudo_paths(j0, j1) >= 3


def test_score_discordant_paths():
    j0 = np.array([1, 2, 3, 4])
    j1 = np.array([1, 9, 8, 4])
    # two mismatches -> 2 - 3*4 = heavily negative
    assert score_alignment_pseudo_paths(j0, j1) < 0


@pytest.mark.slow
def test_iterative_pipeline(tmp_path):
    from shasta_tpu.pipeline.assemble import run_assembly

    genome = synth.random_genome(20000, seed=71)
    reads = synth.sample_reads(genome, 120, 3000, seed=72, both_strands=True)
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, reads)
    cfg = small_config()
    cfg.assembly.iterative = True
    cfg.assembly.iterative_iteration_count = 2
    s = run_assembly([fa], os.path.join(tmp_path, "run"), cfg)
    assert s["assembledSegmentCount"] >= 1
    assert s["totalAssembledSegmentLength"] > 0.8 * 20000
    log = open(os.path.join(tmp_path, "run", "performance.log")).read()
    assert "iterativeAssembly-0" in log


def test_batched_nw_matches_loop_scoring():
    """score_pseudo_path_batch (vectorized NW over all alignment pairs)
    must reproduce score_alignment_pseudo_paths (per-pair nw_align
    loop) exactly, across ragged lengths, ties, and empty journeys."""
    import numpy as np

    from shasta_tpu.pipeline.iterative import score_pseudo_path_batch

    rng = np.random.default_rng(11)
    journeys = []
    for _ in range(40):
        L = int(rng.integers(0, 90))
        journeys.append(rng.integers(0, 12, L).astype(np.int64))
    # Some near-duplicates to force long matched runs and ties.
    for t in range(0, 30, 3):
        j = journeys[t].copy()
        if j.shape[0] > 4:
            j[rng.integers(0, j.shape[0], 2)] = rng.integers(0, 12, 2)
        journeys.append(j)
    off = np.zeros(len(journeys) + 1, np.int64)
    np.cumsum([j.shape[0] for j in journeys], out=off[1:])
    flat = (
        np.concatenate(journeys)
        if off[-1]
        else np.zeros(0, np.int64)
    )
    n_pairs = 300
    o0 = rng.integers(0, len(journeys), n_pairs)
    o1 = rng.integers(0, len(journeys), n_pairs)
    msf = 3.0
    got = score_pseudo_path_batch(flat, off, o0, o1, msf)
    for t in range(n_pairs):
        want = score_alignment_pseudo_paths(
            journeys[int(o0[t])], journeys[int(o1[t])], msf
        )
        assert got[t] == want, (t, got[t], want)
