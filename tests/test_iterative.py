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
