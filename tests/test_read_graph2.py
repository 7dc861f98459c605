"""Method-2 read graph (adaptive criteria), palindromic flagging,
cross-edge removal."""

import numpy as np

from shasta_tpu.graph import read_graph as RG
from shasta_tpu.graph import marker_graph as MG
from shasta_tpu.graph import assembly_graph as AG
from shasta_tpu.ops.palindrome import flag_palindromic_reads
from shasta_tpu.data.markers import find_markers
from shasta_tpu.data.reads import build_read_store
from shasta_tpu.data.kmers import select_kmers_random
from shasta_tpu.io.fasta import parse_fasta_bytes
from shasta_tpu.data import bases as B

from tests import synth
from tests.test_read_graph import make_alignments
from tests.test_marker_graph import make_markers


def test_histogram_threshold():
    v = np.array([0.5] * 88 + [0.9] * 12)
    # 12% of mass at 0.9; percentile 0.12 reaches in the 0.5 bin.
    t = RG._histogram_threshold(v, 0, 1, 100, 0.12)
    assert abs(t - 0.505) < 1e-9
    t2 = RG._histogram_threshold(v, 0, 1, 100, 0.95)
    assert abs(t2 - 0.905) < 1e-9


def test_create_read_graph2_filters_bad_alignments():
    # 20 good alignments (many markers, clean) + 2 bad ones (few
    # markers). The adaptive criteria put the marker-count cutoff
    # above the bad alignments.
    rng = np.random.default_rng(0)
    rows = []
    for i in range(40):
        rows.append((i, i + 1, True, int(rng.integers(400, 1500))))
    rows.append((0, 41, True, 8))
    rows.append((1, 42, True, 9))
    al = make_alignments(rows)
    g, keep, criteria = RG.create_read_graph2(
        al, n_reads=43, max_alignment_count=6, marker_count_percentile=0.1
    )
    # The cutoff lands in the low tail: above the junk, below the bulk.
    assert 9 < criteria["min_aligned_marker_count"] < 600
    assert keep[:40].sum() >= 35  # all but the low tail survive
    assert not keep[40] and not keep[41]


def test_flag_palindromic_reads():
    # A palindromic read: s + rc(s) aligns to its own RC on the diagonal.
    rng = np.random.default_rng(5)
    s = rng.integers(0, 4, 2000).astype(np.uint8)
    palindrome = np.concatenate([s, B.reverse_complement(s)])
    normal = rng.integers(0, 4, 4000).astype(np.uint8)
    fasta = (
        b">p\n" + B.decode_to_str(palindrome).encode()
        + b"\n>n\n" + B.decode_to_str(normal).encode() + b"\n"
    )
    store = build_read_store(parse_fasta_bytes(fasta))
    kt = select_kmers_random(8, 0.1, seed=231)
    markers = find_markers(store, kt)
    flags = flag_palindromic_reads(markers)
    assert bool(flags[0]) is True
    assert bool(flags[1]) is False


def test_remove_low_coverage_cross_edges():
    # X-shape: two high coverage paths A->M, B->M, M->C, M->D plus a
    # middle structure; build via marker graph with a low-coverage
    # cross edge. Simplest: chain graph where one parallel low-coverage
    # edge crosses between two junction vertices.
    m = make_markers(
        [
            [1, 2, 3, 4],
            [9, 9, 9, 9],
            [1, 2, 3, 4],
            [9, 9, 9, 9],
            [5, 2, 3, 6],
            [9, 9, 9, 9],
        ]
    )
    # Reads 0,1 same path; read 2 shares only middle vertices 2,3.
    u = np.array([0, 1, 2, 3, 1, 2, 7, 6, 5, 4, 6, 5])
    v = np.array([8, 9, 10, 11, 17, 18, 15, 14, 13, 12, 22, 21])
    mg = MG.create_marker_graph_vertices(m, u, v, min_coverage=1, max_coverage=10)
    MG.create_marker_graph_edges(m, mg)
    ag = AG.create_assembly_graph(mg)
    # The middle segment (2->3) has coverage 3; branches coverage <= 2.
    n = AG.remove_low_coverage_cross_edges(ag, mg, threshold=3)
    # Cross-edge criteria need out-degree>1 AND in-degree>1; here the
    # structure makes the middle segment the only candidate (both
    # junctions have degree 2) but its removal order is by coverage.
    # Just assert no crash and the flags stay consistent.
    assert n >= 0
    assert mg.low_coverage_cross.dtype == bool


def test_flag_cross_strand_edges2():
    # A palindromic-ish situation: read 2 aligns to read 0 AND to the
    # reverse complement of read 0 through read 1; strand separation
    # must flag the weaker bridge that would merge a component with
    # its own reverse complement.
    from tests.test_read_graph import make_alignments

    rows = [
        (0, 1, True, 100),   # strong same-strand
        (1, 2, True, 90),    # strong same-strand
        (0, 2, False, 10),   # weak opposite-strand: closes the loop
    ]
    al = make_alignments(rows)
    g, _ = RG.create_read_graph(al, n_reads=3, max_alignment_count=6)
    flagged = RG.flag_cross_strand_edges2(g, al, n_reads=3)
    assert flagged == 2
    # The flagged pair is the weak alignment's edge pair.
    bad = np.flatnonzero(g.crosses_strands)
    assert g.alignment_id[bad[0]] == 2
    # With the cross edges excluded, (0,0) and (0,1) are disconnected.
    label = RG.connected_components_excluding_cross(g)
    assert label[0] != label[1]


def test_cross_strand_edges2_native_parity():
    # The native DSU sweep must match the Python implementation flag
    # for flag on a randomized dense graph.
    import pytest

    from shasta_tpu import native
    from tests.test_read_graph import make_alignments

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    n_reads = 60
    rows = []
    seen = set()
    for _ in range(400):
        r0, r1 = sorted(rng.integers(0, n_reads, 2).tolist())
        if r0 == r1 or (r0, r1) in seen:
            continue
        seen.add((r0, r1))
        rows.append((r0, r1, bool(rng.integers(0, 2)), int(rng.integers(1, 200))))
    al = make_alignments(rows)
    g_native, _ = RG.create_read_graph(al, n_reads=n_reads, max_alignment_count=8)
    g_py, _ = RG.create_read_graph(al, n_reads=n_reads, max_alignment_count=8)

    f_native = RG.flag_cross_strand_edges2(g_native, al, n_reads=n_reads)

    saved = native.cross_strand_edges2_native
    native.cross_strand_edges2_native = lambda *a, **k: None
    try:
        f_py = RG.flag_cross_strand_edges2(g_py, al, n_reads=n_reads)
    finally:
        native.cross_strand_edges2_native = saved

    assert f_native == f_py
    assert np.array_equal(g_native.crosses_strands, g_py.crosses_strands)
