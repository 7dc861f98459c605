"""CLI command surface: assemble end-to-end, list/config commands,
explorer pages over the finished run."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from shasta_tpu.__main__ import main

from tests import synth


def test_list_commands(capsys):
    assert main(["--command", "listCommands"]) == 0
    out = capsys.readouterr().out
    assert "assemble" in out and "explore" in out


def test_list_configurations(capsys):
    assert main(["--command", "listConfigurations"]) == 0
    out = capsys.readouterr().out.split()
    assert "Nanopore-May2022" in out
    assert "HiFi-Oct2021" in out
    assert len(out) >= 5


def test_list_configuration(capsys):
    assert main(["--command", "listConfiguration", "--config", "HiFi-Oct2021"]) == 0
    out = capsys.readouterr().out
    assert "consensusCaller = Modal" in out


def test_assemble_requires_config(tmp_path, capsys):
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, [np.zeros(10, np.uint8)])
    assert main(["--command", "assemble", "--input", fa,
                 "--assemblyDirectory", os.path.join(tmp_path, "run")]) == 1
    assert "config" in capsys.readouterr().err


@pytest.mark.slow
def test_assemble_cli_end_to_end(tmp_path, capsys):
    genome = synth.random_genome(20000, seed=3)
    reads = synth.sample_reads(genome, 100, 3000, seed=4, both_strands=True)
    fa = os.path.join(tmp_path, "reads.fasta")
    synth.write_fasta(fa, reads)
    run_dir = os.path.join(tmp_path, "run")

    rc = main([
        "--command", "assemble",
        "--input", fa,
        "--config", "HiFi-Oct2021",
        "--assemblyDirectory", run_dir,
        # Overrides for the tiny synthetic test set.
        "--Reads.minReadLength", "500",
        "--Kmers.k", "8",
        "--MinHash.hashFraction", "0.05",
        "--MinHash.minHashIterationCount", "6",
        "--MinHash.minFrequency", "2",
        "--Align.minAlignedMarkerCount", "20",
        "--Align.minAlignedFraction", "0.5",
        "--Align.maxSkip", "60",
        "--Align.maxDrift", "60",
        "--Align.maxTrim", "60",
        "--ReadGraph.maxAlignmentCount", "8",
        "--MarkerGraph.minCoverage", "3",
        "--Assembly.consensusCaller", "Modal",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary["assembledSegmentCount"] >= 1
    assert os.path.exists(os.path.join(run_dir, "Assembly.fasta"))

    # Refuse to reuse a non-empty directory (reference behavior).
    rc2 = main([
        "--command", "assemble", "--input", fa, "--config", "HiFi-Oct2021",
        "--assemblyDirectory", run_dir,
    ])
    assert rc2 == 1

    # Explorer over the finished run.
    from shasta_tpu.http.explore import Explorer, make_handler
    from http.server import HTTPServer

    server = HTTPServer(("127.0.0.1", 0), make_handler(Explorer(run_dir)))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        for path in ("/", "/read?readId=0&strand=0", "/alignments?readId=0",
                     # Read lookup by NAME (reference: exploreRead accepts
                     # a name via readIdsSortedByName).
                     "/read?readId=read-0&strand=0",
                     "/readGraph?readId=0", "/markerGraph?vertexId=0",
                     "/localReadGraph?readId=0&strand=0",
                     "/localMarkerGraph?vertexId=0&maxDistance=2",
                     "/localMarkerGraph?vertexId=0&maxDistance=2"
                     "&label=sequence&color=distance",
                     "/alignmentMatrix?readId0=0&readId1=1",
                     "/assemblyGraph?segment=0&maxDistance=2",
                     "/alignment?readId0=0&strand0=0&readId1=1&strand1=0",
                     # Extended endpoint families (reference names,
                     # src/AssemblerHttpServer.cpp:216-250).
                     "/blastRead?readId=0&strand=0&beginPosition=0&endPosition=400",
                     "/exploreAlignmentCoverage?readId=0&strand=0",
                     "/computeAllAlignments?readId=0",
                     "/exploreAlignmentCandidateGraph?readId=0",
                     "/exploreAlignmentGraph?readId=0",
                     "/alignSequencesInBaseRepresentation?sequence0=ACGTACGT&sequence1=ACGGACGT",
                     "/assessAlignments",
                     "/markerGraphEdge?edgeId=0",
                     "/exploreMarkerCoverage?readId=0&strand=0",
                     "/inducedAlignment?readId0=0&readId1=1",
                     "/followReadInMarkerGraph?readId=0&strand=0",
                     "/exploreMarkerConnectivity?readId=0&strand=0&ordinal=0",
                     "/assemblyGraphEdge?edgeId=0",
                     "/exploreAssemblyGraphEdgesSupport?edgeId=0",
                     "/compressedAssemblyGraph?edgeId=0",
                     "/assemblySummary.json"):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                assert r.status == 200
                body = r.read()
                assert len(body) > 0
        # The local read graph view is styled and clickable
        # (reference: LocalReadGraph.cpp).
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/localReadGraph?readId=0&strand=0"
            "&maxDistance=2"
        ) as r:
            body = r.read()
            assert b"aligned markers" in body
            assert b'href="read?readId=' in body
            assert b'href="alignment?readId0=' in body
        # The local marker graph view renders directed, clickable,
        # coverage-styled SVG (reference: LocalMarkerGraph-Write.cpp).
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/localMarkerGraph?vertexId=0"
            "&maxDistance=2&label=sequence"
        ) as r:
            body = r.read()
            assert b'marker-end="url(#arrow)"' in body
            assert b"exploreMarkerGraphVertex?vertexId=" in body
            assert b"exploreMarkerGraphEdge?edgeId=" in body
            assert b"coverage" in body
        # Name lookup resolves to the right read.
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/read?readId=read-1&strand=0"
        ) as r:
            assert b"Read 1-0" in r.read()
    finally:
        server.shutdown()


def test_save_and_cleanup_binary_data(tmp_path, capsys):
    import os
    import shutil

    from shasta_tpu.__main__ import main

    run_dir = str(tmp_path / "run")
    fa = str(tmp_path / "in.fasta")
    genome = synth.random_genome(20000, seed=91)
    synth.write_fasta(fa, synth.sample_reads(genome, 80, 3000, seed=92, both_strands=True))
    assert (
        main([
            "--input", fa, "--config", "Nanopore-May2022",
            "--assemblyDirectory", run_dir,
            "--Reads.minReadLength", "500",
            "--Kmers.k", "8", "--Kmers.probability", "0.1",
            "--MinHash.maxBucketSize", "60",
            "--Align.minAlignedMarkerCount", "20",
            "--MarkerGraph.minCoverage", "3",
        ])
        == 0
    )
    assert main(["--command", "saveBinaryData", "--assemblyDirectory", run_dir]) == 0
    assert os.path.isdir(os.path.join(run_dir, "DataOnDisk"))
    assert main(["--command", "cleanupBinaryData", "--assemblyDirectory", run_dir]) == 0
    assert os.path.islink(os.path.join(run_dir, "Data"))
    # Stage data still reachable through the symlink.
    from shasta_tpu.data.store import RunStore
    from shasta_tpu.data.reads import ReadStore

    store = RunStore(run_dir, create=False)
    reads = ReadStore.from_arrays(store.load_stage("Reads"))
    assert reads.read_count > 0


def test_new_option_keys_map_to_fields():
    """Reference conf keys added in round 2 must round-trip into
    config fields (a silently-ignored key regression guard)."""
    from shasta_tpu.pipeline.config import AssemblyConfig

    cfg = AssemblyConfig.from_conf_text(
        """
[Reads]
palindromicReads.skipFlagging = True
palindromicReads.deltaThreshold = 77

[Kmers]
enrichmentThreshold = 55.5
distanceThreshold = 333

[MinHash]
allPairs = True
alignmentCandidatesPerRead = 7.5

[Align]
maxMarkerFrequency = 4
suppressContainments = True

[ReadGraph]
flagInconsistentAlignments = True
markerCountPercentile = 0.5

[MarkerGraph]
peakFinder.minAreaFraction = 0.2
peakFinder.areaStartIndex = 3
secondaryEdges.maxSkip = 123
secondaryEdges.split.errorRateThreshold = 0.5
secondaryEdges.split.minCoverage = 9
reverseTransitiveReduction = True

[Assembly]
detangle.offDiagonalRatio = 0.9
iterative.mismatchSquareFactor = 5.5
iterative.maxAlignmentCount = 11
storeCoverageData = True
writeReadsByAssembledSegment = True
"""
    )
    assert cfg.reads.palindromic_reads_skip_flagging is True
    assert cfg.reads.palindromic_reads_delta_threshold == 77
    assert cfg.kmers.enrichment_threshold == 55.5
    assert cfg.kmers.distance_threshold == 333
    assert cfg.min_hash.all_pairs is True
    assert cfg.min_hash.alignment_candidates_per_read == 7.5
    assert cfg.align.max_marker_frequency == 4
    assert cfg.align.suppress_containments is True
    assert cfg.read_graph.flag_inconsistent_alignments is True
    assert cfg.read_graph.marker_count_percentile == 0.5
    assert cfg.marker_graph.peak_finder_min_area_fraction == 0.2
    assert cfg.marker_graph.peak_finder_area_start_index == 3
    assert cfg.marker_graph.secondary_edges_max_skip == 123
    assert cfg.marker_graph.secondary_edges_split_error_rate_threshold == 0.5
    assert cfg.marker_graph.secondary_edges_split_min_coverage == 9
    assert cfg.marker_graph.reverse_transitive_reduction is True
    assert cfg.assembly.detangle_off_diagonal_ratio == 0.9
    assert cfg.assembly.iterative_mismatch_square_factor == 5.5
    assert cfg.assembly.iterative_max_alignment_count == 11
    assert cfg.assembly.store_coverage_data is True
    assert cfg.assembly.write_reads_by_assembled_segment is True


def test_all_pairs_and_candidate_cap():
    import numpy as np
    from shasta_tpu.ops.lowhash import (
        CandidatePairs,
        all_pairs_candidates,
        cap_candidates,
    )

    c = all_pairs_candidates(4)
    assert c.count == 12  # C(4,2) pairs x 2 strands
    pal = np.array([False, True, False, False])
    c2 = all_pairs_candidates(4, pal)
    assert c2.count == 6  # C(3,2) x 2

    pairs = CandidatePairs(
        read_id0=np.arange(5, dtype=np.int32),
        read_id1=np.arange(5, 10, dtype=np.int32),
        same_strand=np.ones(5, bool),
        frequency=np.array([1, 5, 3, 5, 2], np.int32),
    )
    capped = cap_candidates(pairs, 3)
    assert capped.count == 3
    assert sorted(capped.frequency.tolist()) == [3, 5, 5]
    # Original relative order preserved among kept.
    assert capped.read_id0.tolist() == sorted(capped.read_id0.tolist())


def test_svg_segment_graph_hooks_and_budget():
    """The shared laid-out renderer draws each adjacency once in the
    direction link_info approves, carries per-link width/title and
    per-segment title hooks, and returns None past the force-layout
    segment budget (callers fall back to the layered view)."""
    from shasta_tpu.http import explore as E

    levels = [[0], [1, 2], [3]]
    # BFS emits both orientations; link_info keeps the real ones.
    edges = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 3), (3, 1)]
    real = {(0, 1), (0, 2), (1, 3)}

    def link_info(u, v):
        return (2.0, f"cov {u}->{v}") if (u, v) in real else None

    svg = E._svg_segment_graph(
        levels, edges,
        seg_len=lambda s: 4 * (s + 1),
        seg_color=lambda s: "#2a6",
        highlight=0,
        href="x?id=",
        link_info=link_info,
        seg_title=lambda s: f", extra{s}",
    )
    assert svg.count("<path") == len(real)
    assert "cov 0-&gt;1" in svg or "cov 0->1" in svg
    assert ", extra1" in svg
    # Budget: a neighborhood past the cap returns None.
    big = [list(range(E._FORCE_LAYOUT_MAX_SEGMENTS + 1))]
    assert E._svg_segment_graph(
        big, [], seg_len=lambda s: 1, seg_color=lambda s: "#2a6"
    ) is None
