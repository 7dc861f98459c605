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


def test_solve_tangle_method1_permutation_only():
    from shasta_tpu.graph.detangle import _solve_tangle_method1

    g, ids = make_graph_with_tangle()
    sol = _solve_tangle_method1(g, [ids[0], ids[1]], [ids[3], ids[4]])
    assert sol is not None
    match, priority = sol
    assert match == [0, 1]
    assert priority == 10

    # One stray shared read (A also shares read 10 with D): method 2
    # tolerates it as off-diagonal noise, method 1 does not.
    g2, ids2 = make_graph_with_tangle()
    g2.edges[ids2[0]].orients = np.arange(0, 11)  # reads 0..9 + 10
    assert _solve_tangle_method1(
        g2, [ids2[0], ids2[1]], [ids2[3], ids2[4]]
    ) is None
    assert _solve_tangle(
        g2, [ids2[0], ids2[1]], [ids2[3], ids2[4]], 6, 2, 0.3
    ) is not None

    # Non-square tangle is never method-1 solvable.
    assert _solve_tangle_method1(g, [ids[0]], [ids[3], ids[4]]) is None


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


def test_apply_detangle_colliding_pair():
    from shasta_tpu.graph.detangle import _apply_detangle_colliding

    # Chain: ins -> T0(2->3) -> middles(3->4) -> T1(4->5) -> outs.
    # T1 is the reverse complement tangle of T0 and their edge sets
    # collide (T0's out-edges are T1's in-edges).
    g = _PathGraph()
    ra = np.arange(0, 10)
    rb = np.arange(10, 20)
    i1 = g.add_edge(_PEdge(src=0, tgt=2, path=[0], path_length=5, orients=ra))
    i2 = g.add_edge(_PEdge(src=1, tgt=2, path=[1], path_length=5, orients=rb))
    t0 = g.add_edge(_PEdge(src=2, tgt=3, path=[2], path_length=2,
                           orients=np.arange(0, 20)))
    m1 = g.add_edge(_PEdge(src=3, tgt=4, path=[3], path_length=4, orients=ra))
    m2 = g.add_edge(_PEdge(src=3, tgt=4, path=[4], path_length=4, orients=rb))
    t1 = g.add_edge(_PEdge(src=4, tgt=5, path=[5], path_length=2,
                           orients=np.arange(0, 20)))
    o1 = g.add_edge(_PEdge(src=5, tgt=6, path=[6], path_length=5, orients=ra))
    o2 = g.add_edge(_PEdge(src=5, tgt=7, path=[7], path_length=5, orients=rb))

    new_ids = _apply_detangle_colliding(
        g,
        t0, [i1, i2], [m1, m2], [0, 1],
        t1, [m1, m2], [o1, o2], [0, 1],
    )
    assert new_ids is not None and len(new_ids) == 2
    paths = sorted(g.edges[e].path for e in new_ids)
    # Each triplet merges (in, T0, middle, T1, out).
    assert paths == [[0, 2, 3, 5, 6], [1, 2, 4, 5, 7]]
    for e in new_ids:
        pe = g.edges[e]
        assert pe.path_length == 5 + 2 + 4 + 2 + 5
    # All constituent edges are gone.
    for e in (i1, i2, t0, m1, m2, t1, o1, o2):
        assert e not in g.edges
    # Reads of the tangle edges are excluded from the merged edges.
    merged_reads = sorted(
        tuple(g.edges[e].orients.tolist()) for e in new_ids
    )
    assert merged_reads == [tuple(ra.tolist()), tuple(rb.tolist())]


def test_apply_detangle_colliding_rejects_mutual():
    from shasta_tpu.graph.detangle import _apply_detangle_colliding

    # Degenerate 2-cycle where each tangle follows the other: the
    # reference marks these unsolvable.
    g = _PathGraph()
    ra = np.arange(0, 10)
    a = g.add_edge(_PEdge(src=0, tgt=1, path=[0], path_length=3, orients=ra))
    b = g.add_edge(_PEdge(src=1, tgt=0, path=[1], path_length=3, orients=ra))
    t0 = g.add_edge(_PEdge(src=0, tgt=1, path=[2], path_length=1, orients=ra))
    t1 = g.add_edge(_PEdge(src=1, tgt=0, path=[3], path_length=1, orients=ra))
    assert (
        _apply_detangle_colliding(g, t0, [b], [a], [0], t1, [a], [b], [0]) is None
    )
