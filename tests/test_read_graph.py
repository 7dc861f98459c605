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


def make_alignments_with_offsets(rows):
    """rows: list of (r0, r1, same_strand, marker_count, avg_offset).

    Ordinal pairs are synthesized so that mean(ord0 - ord1) equals
    avg_offset exactly.
    """
    n = len(rows)
    z = np.zeros(n, np.int32)
    ord0, ord1, offs = [], [], [0]
    for _, _, _, mc, d in rows:
        o1 = np.arange(10, dtype=np.uint32)
        ord1.append(o1)
        ord0.append((o1.astype(np.int64) + d).astype(np.uint32))
        offs.append(offs[-1] + 10)
    return AlignmentStore(
        read_id0=np.array([r[0] for r in rows], np.int32),
        read_id1=np.array([r[1] for r in rows], np.int32),
        same_strand=np.array([r[2] for r in rows], bool),
        marker_count=np.array([r[3] for r in rows], np.int32),
        n_markers0=z + 1000,
        n_markers1=z + 1000,
        first0=z,
        last0=z + 999,
        first1=z,
        last1=z + 999,
        min_offset=z,
        max_offset=z,
        max_skip_v=z,
        max_drift_v=z,
        ord0=np.concatenate(ord0) if n else np.zeros(0, np.uint32),
        ord1=np.concatenate(ord1) if n else np.zeros(0, np.uint32),
        offsets=np.array(offs, np.int64),
    )


def test_flag_cross_strand_edges1():
    # Two alignments between reads 0 and 1 with conflicting relative
    # strands: one same-strand, one opposite-strand. Their union links
    # (0,0) to (0,1) within 2 edges -> a strand-jump region; the
    # weaker alignment must be flagged cross-strand.
    al = make_alignments([(0, 1, True, 50), (0, 1, False, 40), (1, 2, True, 60)])
    g = RG.build_read_graph(al, 3, np.ones(3, bool))
    flagged = RG.flag_cross_strand_edges1(g, al, 3, max_distance=3)
    assert flagged == 2
    # The flagged pair is the weaker (opposite-strand) alignment.
    assert set(g.alignment_id[g.crosses_strands]) == {1}
    # The stronger alignments survive.
    assert not g.crosses_strands[0] and not g.crosses_strands[1]

    # max_distance=0 clears and flags nothing.
    assert RG.flag_cross_strand_edges1(g, al, 3, max_distance=0) == 0
    assert not g.crosses_strands.any()


def test_flag_cross_strand_edges1_no_jump():
    # A clean same-strand chain has no strand-jump regions.
    al = make_alignments([(0, 1, True, 50), (1, 2, True, 60)])
    g = RG.build_read_graph(al, 3, np.ones(2, bool))
    assert RG.flag_cross_strand_edges1(g, al, 3, max_distance=6) == 0


def test_edge_average_offsets_orientation():
    al = make_alignments_with_offsets([(0, 1, True, 10, 25)])
    g = RG.build_read_graph(al, 2, np.ones(1, bool))
    off = RG.edge_average_offsets(g, al)
    # Direct edge (0, 2): offset +25 from orid 0 to orid 2.
    assert off[0] == 25.0
    # RC edge (1, 3): ordinals reflect, n0 == n1 -> offset -25.
    assert off[1] == -25.0


def test_flag_inconsistent_alignments_triangle():
    # Triangle 0-1-2 with offsets 10, 10 and a wildly wrong 700 on the
    # closing 0-2 alignment: closure error 680 >= 200 triggers the
    # least-squares pass, which flags the worst-residual edge pair.
    al = make_alignments_with_offsets(
        [(0, 1, True, 50, 10), (1, 2, True, 50, 10), (0, 2, True, 50, 700)]
    )
    g = RG.build_read_graph(al, 3, np.ones(3, bool))
    n_flagged = RG.flag_inconsistent_alignments(
        g, al, 3,
        triangle_error_threshold=200,
        least_square_error_threshold=200,
        least_square_max_distance=1,
    )
    assert n_flagged == 2
    assert g.inconsistent.sum() == 2
    # Exactly one alignment's RC edge pair is flagged, and the two
    # flagged edges are mates.
    bad = np.flatnonzero(g.inconsistent)
    assert bad[1] == (bad[0] ^ 1)


def test_flag_inconsistent_alignments_consistent_triangle():
    # Consistent offsets: closure error 0, nothing flagged.
    al = make_alignments_with_offsets(
        [(0, 1, True, 50, 10), (1, 2, True, 50, 10), (0, 2, True, 50, 20)]
    )
    g = RG.build_read_graph(al, 3, np.ones(3, bool))
    assert RG.flag_inconsistent_alignments(g, al, 3) == 0
    assert not g.inconsistent.any()


def test_remove_read_graph_bridges():
    # A dense 5-read clique with a single pendant read hanging off one
    # member: from that member's viewpoint the pendant is a size-1
    # secondary component, so the bridge alignment is removed and the
    # clique survives intact.
    rows = []
    for i in range(5):
        for j in range(i + 1, 5):
            rows.append((i, j, True, 50))
    rows.append((4, 5, True, 40))  # the bridge to the pendant read
    al = make_alignments(rows)
    g = RG.build_read_graph(al, 6, np.ones(len(rows), bool))

    g2, keep, removed = RG.remove_read_graph_bridges(g, al, 6, max_distance=2)
    assert removed == 1
    bridge_id = len(rows) - 1
    assert not keep[bridge_id]
    assert keep[:bridge_id].all()
    assert g2.edge_count == 2 * int(keep.sum())


def _flag_inconsistent_oracle(
    graph, alignments, n_reads, is_chimeric=None,
    triangle_error_threshold=200, least_square_error_threshold=200,
    least_square_max_distance=1,
):
    """Sequential nested-loop reference for flag_inconsistent_alignments
    (the pre-vectorization implementation, kept as the test oracle)."""
    offsets = RG.edge_average_offsets(graph, alignments)
    adj_off, adj_e = graph.adj_offsets, graph.adj_edges
    orid0, orid1 = graph.orid0, graph.orid1

    def other(ei, v):
        return int(orid1[ei]) if orid0[ei] == v else int(orid0[ei])

    def oriented(ei, u):
        v = other(ei, u)
        return offsets[ei] if u < v else -offsets[ei]

    flagged_ids = set()
    for read0 in range(n_reads):
        if is_chimeric is not None and is_chimeric[read0]:
            continue
        v0 = 2 * read0
        for e01 in adj_e[adj_off[v0]:adj_off[v0 + 1]]:
            e01 = int(e01)
            v1 = other(e01, v0)
            if v1 < v0:
                continue
            if is_chimeric is not None and is_chimeric[v1 >> 1]:
                continue
            if graph.crosses_strands[e01] or graph.inconsistent[e01] or e01 in flagged_ids:
                continue
            off01 = oriented(e01, v0)
            for e12 in adj_e[adj_off[v1]:adj_off[v1 + 1]]:
                e12 = int(e12)
                v2 = other(e12, v1)
                if v2 < v1:
                    continue
                if is_chimeric is not None and is_chimeric[v2 >> 1]:
                    continue
                if graph.crosses_strands[e12] or graph.inconsistent[e12] or e12 in flagged_ids:
                    continue
                off12 = oriented(e12, v1)
                for e20 in adj_e[adj_off[v2]:adj_off[v2 + 1]]:
                    e20 = int(e20)
                    if graph.crosses_strands[e20] or graph.inconsistent[e20] or e20 in flagged_ids:
                        continue
                    if other(e20, v2) != v0:
                        continue
                    err = off01 + off12 + oriented(e20, v2)
                    if abs(err) < triangle_error_threshold:
                        continue
                    dead = graph.crosses_strands | graph.inconsistent
                    for fe in flagged_ids:
                        dead[fe] = True
                    verts, edges = RG._local_neighborhood(
                        graph, (v0, v1, v2), least_square_max_distance,
                        is_chimeric, dead,
                    )
                    edges = [e for e in edges if not dead[e]]
                    if not edges:
                        continue
                    vindex = {v: i for i, v in enumerate(verts)}
                    while edges:
                        x = RG._least_square_positions(vindex, edges, graph, offsets)
                        worst, worst_res = None, -1.0
                        for ei in edges:
                            u, w = int(orid0[ei]), int(orid1[ei])
                            if u > w:
                                u, w = w, u
                            res = abs((x[vindex[w]] - x[vindex[u]]) + offsets[ei])
                            if res > worst_res:
                                worst, worst_res = ei, res
                        if worst_res < least_square_error_threshold:
                            break
                        flagged_ids.add(worst)
                        flagged_ids.add(worst ^ 1)
                        edges = [e for e in edges if e != worst and e != (worst ^ 1)]
    for ei in flagged_ids:
        graph.inconsistent[ei] = True
    return len(flagged_ids)


def test_flag_inconsistent_vectorized_matches_oracle():
    # Randomized graphs with mostly-consistent offsets plus injected
    # outliers: the vectorized triangle enumeration + ordered replay
    # must match the sequential nested-loop oracle exactly.
    rng = np.random.default_rng(11)
    n_reads = 25
    pos = rng.integers(0, 2000, n_reads)  # latent positions
    rows = []
    seen = set()
    for _ in range(150):
        r0, r1 = sorted(rng.integers(0, n_reads, 2).tolist())
        if r0 == r1 or (r0, r1) in seen:
            continue
        seen.add((r0, r1))
        d = int(pos[r0] - pos[r1])
        if rng.random() < 0.15:
            d += int(rng.integers(300, 900))  # inconsistent outlier
        rows.append((r0, r1, True, int(rng.integers(20, 200)), d))
    al = make_alignments_with_offsets(rows)
    chim = rng.random(n_reads) < 0.1

    g_vec = RG.build_read_graph(al, n_reads, np.ones(len(rows), bool))
    g_ora = RG.build_read_graph(al, n_reads, np.ones(len(rows), bool))
    n_vec = RG.flag_inconsistent_alignments(g_vec, al, n_reads, chim)
    n_ora = _flag_inconsistent_oracle(g_ora, al, n_reads, chim)
    assert n_vec == n_ora
    assert np.array_equal(g_vec.inconsistent, g_ora.inconsistent)
