"""The LowHash starvation / alignment-quality feedback loop
(reference: per-read LowHash statistics at src/LowHash0.cpp:57 and
the post-run rules of scripts/GenerateFeedback.py — the reference
records the statistics and diagnoses starved runs after the fact;
here the pipeline itself warns and reports, VERDICT r4 item 7)."""

import os

import numpy as np
import pytest

from tests import synth
from shasta_tpu.ops import lowhash as LH
from shasta_tpu.pipeline.assemble import run_assembly
from shasta_tpu.pipeline.config import AssemblyConfig
from shasta_tpu.pipeline.configurations import get_configuration


def _pairs(r0, r1, n_extra=0):
    r0 = np.asarray(r0, np.int32)
    r1 = np.asarray(r1, np.int32)
    return LH.CandidatePairs(
        read_id0=r0,
        read_id1=r1,
        same_strand=np.ones(r0.shape[0], bool),
        frequency=np.full(r0.shape[0], 2, np.int32),
    )


def test_candidate_feedback_starved():
    # 100 reads, 3 candidates total: far below the 20/read bar.
    cand = _pairs([0, 1, 2], [5, 6, 7])
    msgs, stats = LH.candidate_feedback(cand, 100, m=4)
    assert len(msgs) == 1
    assert "LowHash starvation" in msgs[0]
    assert "MinHash.minHashIterationCount" in msgs[0]
    assert "MinHash.m" in msgs[0]  # m=4 adds the m-reduction hint
    assert stats["isolatedReadCount"] == 94
    assert stats["candidatesPerRead"] == 0.03


def test_candidate_feedback_healthy():
    rng = np.random.default_rng(0)
    n = 40
    r0 = rng.integers(0, n, 25 * n)
    r1 = (r0 + rng.integers(1, n, 25 * n)) % n
    cand = _pairs(np.minimum(r0, r1), np.maximum(r0, r1))
    msgs, stats = LH.candidate_feedback(cand, n, m=4)
    assert msgs == []
    assert stats["candidatesPerRead"] >= 20
    assert stats["isolatedReadFraction"] == 0.0


@pytest.mark.slow
def test_starved_run_fires_diagnosis(tmp_path):
    """The 7%-uniform-indel regime (hb=0 leaves ~5.8% post-RLE error,
    beyond any LowHash parameterization the reference ships —
    SCALE_r04.json scale1_ont_harsh_profile): the run must complete
    AND print/record an actionable starvation diagnosis."""
    genome = synth.random_genome(120000, seed=130)
    reads = synth.sample_reads_ont(
        genome, 15.0, seed=131, error_rate=0.07,
        mix=(1 / 3, 1 / 3, 1 / 3), homopolymer_bias=0.0,
        median_length=12000, sigma=0.4, min_length=8000,
    )
    fa = os.path.join(tmp_path, "reads.fasta")
    synth.write_fasta(fa, reads)
    cfg = AssemblyConfig.from_conf_text(get_configuration("Nanopore-May2022"))
    run_dir = os.path.join(tmp_path, "run")
    s = run_assembly([fa], run_dir, cfg)
    assert "lowHashStatistics" in s, s
    assert any("LowHash starvation" in m for m in s.get("feedback", [])), s
    # The warning lands in the run's performance.log too.
    with open(os.path.join(run_dir, "performance.log")) as f:
        assert "LowHash starvation" in f.read()
