"""Analysis structures: induced alignments, marker connectivity,
compressed assembly graph."""

import numpy as np

from shasta_tpu.graph.analysis import (
    compress_assembly_graph,
    induced_alignment,
    marker_connectivity_pairs,
)
from shasta_tpu.graph.assembly_graph import AssemblyGraph
from shasta_tpu.graph import marker_graph as MG

from tests.test_marker_graph import make_markers


def make_simple_mg():
    m = make_markers([[1, 2, 3], [9, 9, 9], [1, 2, 3], [9, 9, 9]])
    u = np.array([0, 1, 2, 9, 10, 11])
    v = np.array([6, 7, 8, 3, 4, 5])
    mg = MG.create_marker_graph_vertices(m, u, v, min_coverage=2, max_coverage=10)
    return m, mg


def test_induced_alignment():
    m, mg = make_simple_mg()
    o0, o1 = induced_alignment(m, mg, 0, 2)
    # Reads 0 and 1 (strand 0 = orids 0 and 2) share all 3 vertices.
    assert np.array_equal(o0, [0, 1, 2])
    assert np.array_equal(o1, [0, 1, 2])
    # No shared vertices between strand 0 of read 0 and strand 1 of read 1.
    o0b, o1b = induced_alignment(m, mg, 0, 3)
    assert o0b.shape[0] == 0


def test_marker_connectivity():
    m, mg = make_simple_mg()
    u, v = marker_connectivity_pairs(m, mg)
    # 6 vertices x (2 markers -> 1 chain pair each).
    assert u.shape[0] == 6
    # Every pair shares a vertex.
    assert np.array_equal(mg.vertex_table[u], mg.vertex_table[v])


def test_compress_assembly_graph():
    # Chain with one bubble: A -> (b1|b2) -> C
    ag = AssemblyGraph(
        chain_offsets=np.arange(5, dtype=np.int64),
        chains=np.arange(4, dtype=np.int64),
        rc_edge=np.arange(4, dtype=np.int64),
        source_v=np.array([0, 1, 1, 2], np.int64),
        target_v=np.array([1, 2, 2, 3], np.int64),
        is_circular=np.zeros(4, bool),
    )
    cg = compress_assembly_graph(ag)
    # Whole thing condenses to ONE compressed edge 0 -> 3 with all 4
    # assembly edges as members.
    assert cg.edge_count == 1
    assert cg.source_v[0] == 0 and cg.target_v[0] == 3
    assert set(cg.members_of(0)) == {0, 1, 2, 3}
