"""Read graph: kNN alignment selection, RC-paired edges, chimera flags."""

import numpy as np

from shasta_tpu.graph import read_graph as RG
from shasta_tpu.ops.align import AlignmentStore


def make_alignments(rows):
    """rows: list of (r0, r1, same_strand, marker_count)."""
    n = len(rows)
    z = np.zeros(n, np.int32)
    return AlignmentStore(
        read_id0=np.array([r[0] for r in rows], np.int32),
        read_id1=np.array([r[1] for r in rows], np.int32),
        same_strand=np.array([r[2] for r in rows], bool),
        marker_count=np.array([r[3] for r in rows], np.int32),
        n_markers0=z + 100,
        n_markers1=z + 100,
        first0=z,
        last0=z + 99,
        first1=z,
        last1=z + 99,
        min_offset=z,
        max_offset=z,
        max_skip_v=z,
        max_drift_v=z,
        ord0=np.zeros(0, np.uint32),
        ord1=np.zeros(0, np.uint32),
        offsets=np.zeros(n + 1, np.int64),
    )


def test_knn_selection_keeps_best_per_read():
    # read 0 has 3 alignments; with max=2 the weakest is dropped unless
    # the partner keeps it.
    al = make_alignments(
        [
            (0, 1, True, 50),
            (0, 2, True, 40),
            (0, 3, True, 30),  # weakest for read 0, but best for read 3
        ]
    )
    keep = RG.select_alignments_knn(al, n_reads=4, max_alignment_count=2)
    assert keep.tolist() == [True, True, True]  # read 3 rescues the third

    al2 = make_alignments(
        [
            (0, 1, True, 50),
            (0, 2, True, 40),
            (0, 3, True, 30),
            (3, 4, True, 60),
            (3, 5, True, 55),
        ]
    )
    keep2 = RG.select_alignments_knn(al2, n_reads=6, max_alignment_count=2)
    # now (0,3) is dropped by both reads
    assert keep2.tolist() == [True, True, False, True, True]


def test_edges_are_rc_pairs():
    al = make_alignments([(0, 1, True, 50), (1, 2, False, 40)])
    g, keep = RG.create_read_graph(al, n_reads=3, max_alignment_count=6)
    assert g.edge_count == 4
    # Edge 0: (0,0)-(2,0); edge 1 is its strand flip (1,0)-(3,0)... as orids:
    assert g.orid0[0] == 0 and g.orid1[0] == 2
    assert g.orid0[1] == 1 and g.orid1[1] == 3
    # Opposite strand alignment: (2,0)-(4,1)=orid 5; RC: (3)-(4,0)=4
    assert g.orid0[2] == 2 and g.orid1[2] == 5
    assert g.orid0[3] == 3 and g.orid1[3] == 4
    # RC pairing: flipping strands of edge 2i gives edge 2i+1.
    for i in range(0, g.edge_count, 2):
        ends_a = {g.orid0[i] ^ 1, g.orid1[i] ^ 1}
        ends_b = {g.orid0[i + 1], g.orid1[i + 1]}
        assert ends_a == ends_b


def test_chimera_flagging():
    # Two clusters {0..3} and {4..7} joined only through read 8:
    # read 8 is chimeric.
    rows = []
    for a in range(4):
        for b in range(a + 1, 4):
            rows.append((a, b, True, 50))
    for a in range(4, 8):
        for b in range(a + 1, 8):
            rows.append((a, b, True, 50))
    rows.append((0, 8, True, 50))
    rows.append((4, 8, True, 50))
    al = make_alignments(rows)
    g, _ = RG.create_read_graph(al, n_reads=9, max_alignment_count=10)
    chim = RG.flag_chimeric_reads(g, n_reads=9, max_distance=2)
    assert chim[8]
    assert not chim[:8].any()


def test_connected_components():
    al = make_alignments([(0, 1, True, 50), (2, 3, True, 40)])
    g, _ = RG.create_read_graph(al, n_reads=5, max_alignment_count=6)
    label = RG.connected_components(g)
    assert label[0] == label[2]  # (0,0) with (1,0)
    assert label[4] != label[0]  # (2,0) in its own component
    assert label[8] == 8  # isolated read 4
