"""Mode 3: segments, journeys, links."""

import os

import numpy as np
import pytest

from shasta_tpu.graph.mode3 import create_mode3_graph, find_assembly_paths, write_mode3_gfa

from tests.test_marker_graph import full_pipeline_to_marker_graph
from shasta_tpu.graph import marker_graph as MG


@pytest.mark.slow
def test_mode3_segments_journeys_links(tmp_path):
    store, markers, mg = full_pipeline_to_marker_graph()
    MG.transitive_reduction(mg, low_coverage_threshold=1, max_distance=30)
    MG.prune(mg, iteration_count=3)
    m3 = create_mode3_graph(markers, mg, min_link_coverage=3)

    assert m3.segment_count > 0
    # Journeys exist for most oriented reads with markers.
    journey_lengths = np.diff(m3.journey_offsets)
    assert (journey_lengths > 0).mean() > 0.8

    # Every link's transition occurs in >= 3 journeys by construction.
    assert (m3.link_coverage >= 3).all()

    # Segment sequence within a journey contains no immediate repeats.
    for orid in range(0, m3.journey_offsets.shape[0] - 1, 37):
        j = m3.journey(orid)
        if j.shape[0] > 1:
            assert (j[1:] != j[:-1]).all()

    # Paths: every segment appears in exactly one path.
    paths = find_assembly_paths(m3)
    seen = np.concatenate(paths) if paths else np.zeros(0)
    assert np.array_equal(np.sort(seen), np.arange(m3.segment_count))

    # GFA writes.
    p = os.path.join(tmp_path, "m3.gfa")
    write_mode3_gfa(p, m3)
    lines = open(p).read().splitlines()
    assert sum(1 for l in lines if l.startswith("S")) == m3.segment_count
    assert sum(1 for l in lines if l.startswith("L")) == m3.link_count


@pytest.mark.slow
def test_mode3_pipeline(tmp_path):
    from tests import synth
    from tests.test_assembly_e2e import small_config
    from shasta_tpu.pipeline.assemble import run_assembly

    genome = synth.random_genome(20000, seed=91)
    reads = synth.sample_reads(genome, 120, 3000, seed=92, both_strands=True)
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, reads)
    cfg = small_config()
    cfg.assembly.mode = 3
    s = run_assembly([fa], os.path.join(tmp_path, "run"), cfg)
    assert s["mode3SegmentCount"] >= 1
    assert os.path.exists(os.path.join(tmp_path, "run", "Mode3-Assembly.gfa"))
