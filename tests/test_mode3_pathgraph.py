"""Mode-3 PathGraph: journey-snippet clustering and detangling
(reference: src/mode3-PathGraph.cpp)."""

import os

import numpy as np
import pytest

from shasta_tpu.graph.mode3_pathgraph import (
    PathGraph,
    _linear_vertex_chains,
    _tarjan_scc,
    _transitive_reduction_dag,
    create_mode3_path_graph,
)


def _journeys_to_csr(journeys):
    offsets = np.zeros(len(journeys) + 1, np.int64)
    np.cumsum([len(j) for j in journeys], out=offsets[1:])
    flat = np.concatenate([np.asarray(j, np.int64) for j in journeys]) if journeys else np.zeros(0, np.int64)
    return offsets, flat


def test_tarjan_scc():
    # 0->1->2->0 cycle plus 2->3, 3->4.
    comp = _tarjan_scc(5, [[1], [2], [0, 3], [4], []])
    assert comp[0] == comp[1] == comp[2]
    assert len({comp[0], comp[3], comp[4]}) == 3


def test_transitive_reduction_dag():
    edges = {(0, 1), (1, 2), (0, 2)}
    assert _transitive_reduction_dag(3, edges) == {(0, 1), (1, 2)}


def test_linear_vertex_chains():
    # 0->1->2 then fork 2->3, 2->4.
    chains = _linear_vertex_chains(5, [(0, 1), (1, 2), (2, 3), (2, 4)])
    chains = sorted(map(tuple, chains))
    assert (0, 1, 2) in chains
    assert (3,) in chains and (4,) in chains


def _two_haplotype_journeys(n_per_path=6):
    # Two paths through a shared middle: 0-2-3-4-5 and 1-2-3-4-6.
    j = []
    for _ in range(n_per_path):
        j.append([0, 2, 3, 4, 5])
    for _ in range(n_per_path):
        j.append([1, 2, 3, 4, 6])
    return j


def test_pathgraph_initial_structure():
    offsets, flat = _journeys_to_csr(_two_haplotype_journeys())
    pg = PathGraph(7, offsets, flat)
    assert len(pg.vertices) == 7
    # Edges along both traversals, each with coverage 6.
    assert pg.edges[(0, 2)] == 6
    assert pg.edges[(2, 3)] == 12  # both paths share it
    assert pg.edges[(4, 6)] == 6
    # Journeys mirror the input.
    assert pg.journeys[0] == [0, 2, 3, 4, 5]
    assert pg.journeys[11] == [1, 2, 3, 4, 6]


def test_pathgraph_detangle_separates_haplotypes():
    """The journey-snippet clustering must pull the two read classes
    through the shared middle, yielding one path vertex per
    haplotype (the PathGraph's purpose, mode3-PathGraph.cpp:655)."""
    offsets, flat = _journeys_to_csr(_two_haplotype_journeys())
    pg = PathGraph(7, offsets, flat)
    pg.partition()
    assert (pg.subgraph_of >= 0).all()
    created = pg.detangle()
    assert created == 2
    paths = sorted(tuple(v.path) for v in pg.vertices)
    assert paths == [(0, 2, 3, 4, 5), (1, 2, 3, 4, 6)]
    # After detangling, each oriented read's journey is ONE vertex and
    # the intervals were merged to cover the whole traversal.
    for orid in range(offsets.shape[0] - 1):
        assert len(pg.journeys[orid]) == 1
    for v in pg.vertices:
        assert all(f == 0 and l == 4 for (_o, f, l) in v.intervals)
        assert len(v.intervals) == 6


def test_pathgraph_min_cluster_coverage():
    """Clusters below minClusterCoverage are discarded, so nothing is
    detangled at coverage 5 (reference hardwired constant 6)."""
    offsets, flat = _journeys_to_csr(_two_haplotype_journeys(5))
    pg = PathGraph(7, offsets, flat)
    pg.partition()
    assert pg.detangle() == 0


def test_partition_bounded_bfs_and_merge():
    # A 30-vertex chain with coverage 3 everywhere.
    journeys = [list(range(30))] * 3
    offsets, flat = _journeys_to_csr(journeys)
    pg = PathGraph(30, offsets, flat, partition_max_distance=10)
    pg.partition()
    assert (pg.subgraph_of >= 0).all()
    sizes = sorted(len(s) for s in pg.subgraphs if s)
    assert sum(sizes) == 30
    # Bounded BFS: no subgraph exceeds maxDistance + 1 vertices by much
    # and small remainders merge into neighbours (>= min_subgraph_size).
    assert all(s >= 8 for s in sizes)


def test_create_mode3_path_graph_outputs(tmp_path):
    class _M3:
        segment_count = 7

    m3 = _M3()
    offsets, flat = _journeys_to_csr(_two_haplotype_journeys())
    m3.journey_offsets = offsets
    m3.journey_segments = flat
    pg = create_mode3_path_graph(m3, out_dir=str(tmp_path))
    for name in (
        "PathGraphJourneys.csv",
        "PathGraph.gfa",
        "PathGraphDetailed.csv",
        "PathGraphSubgraphHistogram.csv",
        "PathGraphJourneys-1.csv",
        "PathGraph-1.gfa",
        "PathGraphDetailed-1.csv",
    ):
        assert os.path.exists(tmp_path / name), name
    gfa = (tmp_path / "PathGraph-1.gfa").read_text()
    assert gfa.count("\nS\t") + gfa.startswith("S\t") == 2 or len(pg.vertices) == 2


def test_pathgraph_on_pipeline_mode3(tmp_path):
    """PathGraph built from a real mode-3 run on synthetic data."""
    from tests import synth
    from shasta_tpu.pipeline.assemble import run_assembly
    from shasta_tpu.pipeline.config import AssemblyConfig
    from shasta_tpu.graph.mode3 import Mode3Graph
    from shasta_tpu.data.store import RunStore

    genome = synth.random_genome(20000, seed=55)
    reads = synth.sample_reads(genome, 120, 2500, seed=56, both_strands=True)
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, reads)
    cfg = AssemblyConfig()
    cfg.assembly.mode = 3
    cfg.reads.min_read_length = 500
    cfg.kmers.k = 8
    cfg.kmers.probability = 0.1
    cfg.min_hash.hash_fraction = 0.05
    cfg.min_hash.min_hash_iteration_count = 6
    cfg.min_hash.max_bucket_size = 60
    cfg.align.min_aligned_marker_count = 20
    cfg.align.max_skip = 60
    cfg.align.max_drift = 60
    cfg.align.max_trim = 60
    cfg.read_graph.max_alignment_count = 8
    cfg.marker_graph.min_coverage = 3
    run_dir = os.path.join(tmp_path, "run")
    run_assembly([fa], run_dir, cfg)
    store = RunStore(run_dir, create=False)
    m3 = Mode3Graph.from_arrays(store.load_stage("Mode3"))
    pg = create_mode3_path_graph(m3, out_dir=str(tmp_path))
    assert len(pg.vertices) >= 1
    # Every path must reference valid segments.
    for v in pg.vertices:
        assert all(0 <= s < m3.segment_count for s in v.path)


def test_flag_back_segments():
    """A segment whose single incoming and single outgoing links both
    connect to the same segment is a back-segment (reference:
    flagBackSegments, src/mode3.cpp:788)."""
    from shasta_tpu.graph.mode3 import Mode3Graph, flag_back_segments

    class _M3:
        segment_count = 3
        link_count = 3
        # 0 -> 1 (back), 1 -> 0, 0 -> 2
        link_source = np.array([0, 1, 0], np.int64)
        link_target = np.array([1, 0, 2], np.int64)

    back = flag_back_segments(_M3())
    assert back.tolist() == [False, True, False]
