"""Detangle: repeat resolution via tangle matrices of shared reads."""

import os

import numpy as np
import pytest

from shasta_tpu.data import bases as B
from shasta_tpu.graph.assembly_graph import AssemblyGraph
from shasta_tpu.graph.detangle import _solve_tangle, _PathGraph, _PEdge
from shasta_tpu.pipeline.assemble import run_assembly

from tests import synth
from tests.test_assembly_e2e import small_config


def make_graph_with_tangle(m_extra=0):
    """in-edges A(0), B(1) -> v0; tangle v0->v1 (2); out-edges v1 ->
    C(3), D(4). Reads 0..9 support A-C; reads 10..19 support B-D."""
    g = _PathGraph()
    ra = np.arange(0, 10)
    rb = np.arange(10, 20)
    ids = []
    ids.append(g.add_edge(_PEdge(src=0, tgt=2, path=[0], path_length=5, orients=ra)))
    ids.append(g.add_edge(_PEdge(src=1, tgt=2, path=[1], path_length=5, orients=rb)))
    ids.append(g.add_edge(_PEdge(src=2, tgt=3, path=[2], path_length=2,
                                 orients=np.arange(0, 20))))
    ids.append(g.add_edge(_PEdge(src=3, tgt=4, path=[3], path_length=5, orients=ra)))
    ids.append(g.add_edge(_PEdge(src=3, tgt=5, path=[4], path_length=5, orients=rb)))
    return g, ids


def test_solve_tangle_permutation():
    g, ids = make_graph_with_tangle()
    sol = _solve_tangle(g, [ids[0], ids[1]], [ids[3], ids[4]], 6, 2, 0.3)
    assert sol is not None
    match, priority = sol
    assert match == [0, 1]
    assert priority == 10


def test_solve_tangle_rejects_ambiguous():
    g, ids = make_graph_with_tangle()
    # Make both in-edges share the same reads -> no dominant diagonal.
    g.edges[ids[1]].orients = g.edges[ids[0]].orients
    sol = _solve_tangle(g, [ids[0], ids[1]], [ids[3], ids[4]], 6, 2, 0.3)
    assert sol is None


def make_tangle_assembly_graph():
    """Hand-built X-shape: in-edges A(0),B(1) -> v0; tangle v0->v1 (2);
    out-edges v1->C(3), v1->D(4); reverse complements 5..9. Reads 0-9
    support A and C; 10-19 support B and D; the tangle edge carries all."""
    import numpy as np
    from shasta_tpu.graph.marker_graph import MarkerGraph
    from shasta_tpu.graph.assembly_graph import AssemblyGraph

    ra = list(range(0, 10))
    rb = list(range(10, 20))
    # rc reads: orid ^ 1 (same read other strand)
    ra_rc = [r ^ 1 for r in ra]
    rb_rc = [r ^ 1 for r in rb]
    edge_reads = [ra, rb, ra + rb, ra, rb, ra_rc, rb_rc, ra_rc + rb_rc, ra_rc, rb_rc]
    interval_offsets = np.zeros(11, np.int64)
    for i, rr in enumerate(edge_reads):
        interval_offsets[i + 1] = interval_offsets[i] + len(rr)
    interval_orid = np.concatenate([np.array(r, np.int64) for r in edge_reads])

    mg = MarkerGraph(
        vertex_table=np.zeros(0, np.int64),
        vertex_offsets=np.zeros(13, np.int64),
        vertex_markers=np.zeros(0, np.int64),
        rc_vertex=np.array([6, 7, 8, 9, 10, 11, 0, 1, 2, 3, 4, 5], np.int64),
        source=np.array([0, 1, 2, 3, 3, 10, 11, 8, 9, 9], np.int64),
        target=np.array([2, 2, 3, 4, 5, 8, 8, 9, 10, 11], np.int64),
        coverage=np.array([10, 10, 20, 10, 10, 10, 10, 20, 10, 10], np.int32),
        rc_edge=np.array([5, 6, 7, 8, 9, 0, 1, 2, 3, 4], np.int64),
        removed_tr=np.zeros(10, bool),
        pruned=np.zeros(10, bool),
        superbubble=np.zeros(10, bool),
        low_coverage_cross=np.zeros(10, bool),
        interval_offsets=interval_offsets,
        interval_orid=interval_orid,
        interval_ord0=np.zeros(interval_orid.shape[0], np.int32),
        interval_ord1=np.ones(interval_orid.shape[0], np.int32),
    )
    ag = AssemblyGraph(
        chain_offsets=np.arange(11, dtype=np.int64),
        chains=np.arange(10, dtype=np.int64),
        rc_edge=np.array([5, 6, 7, 8, 9, 0, 1, 2, 3, 4], np.int64),
        source_v=mg.source.copy(),
        target_v=mg.target.copy(),
        is_circular=np.zeros(10, bool),
    )
    return ag, mg


def test_detangle_assembly_graph_merges_paths():
    from shasta_tpu.graph.detangle import detangle_assembly_graph

    ag, mg = make_tangle_assembly_graph()
    new_ag = detangle_assembly_graph(ag, mg, diagonal_read_count_min=6)
    # 10 edges (5 per strand) -> 4 (2 per strand):
    # {A,B,mid,C,D} -> {A-mid-C, B-mid-D}, same for the rc copies.
    assert new_ag.edge_count == 4
    chains = sorted(tuple(new_ag.chain(e)) for e in range(new_ag.edge_count))
    assert (0, 2, 3) in chains  # A-mid-C
    assert (1, 2, 4) in chains  # B-mid-D
    # The rc X-shape got merged too (the tangle edge is duplicated).
    assert sum(7 in c for c in chains) == 2


@pytest.mark.slow
def test_detangle_resolves_repeat(tmp_path):
    # Genome with an exact internal repeat R: A R B ... C R D.
    # Reads (3 kb) span the 1 kb repeat, so tangle matrices resolve it.
    rng = np.random.default_rng(77)
    R = rng.integers(0, 4, 1000).astype(np.uint8)
    A = rng.integers(0, 4, 6000).astype(np.uint8)
    Bseg = rng.integers(0, 4, 6000).astype(np.uint8)
    C = rng.integers(0, 4, 6000).astype(np.uint8)
    D = rng.integers(0, 4, 6000).astype(np.uint8)
    genome = np.concatenate([A, R, Bseg, C, R, D])

    reads = synth.sample_reads(genome, 220, 3000, seed=78, both_strands=True)
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, reads)

    cfg = small_config()
    cfg.assembly.detangle_method = 2
    # Plenty of reads span the repeat; keep the default detangle
    # thresholds.
    run_dir = os.path.join(tmp_path, "run")
    summary = run_assembly([fa], run_dir, cfg)

    # The repeat structure without detangling yields >= 5 segments
    # (A, B..C, D, R as a collapsed repeat, x2 strands -> >=4 one
    # strand). With successful detangling the graph merges across the
    # repeat; expect fewer, longer segments with good total length.
    assert summary["totalAssembledSegmentLength"] > 0.85 * genome.shape[0]
    assert summary["assembledSegmentN50"] > 6000
