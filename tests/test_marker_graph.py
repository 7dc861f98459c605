"""Marker graph: union-find, vertex filtering, edges, reduction, prune."""

import numpy as np
import pytest

from shasta_tpu.data.kmers import select_kmers_random
from shasta_tpu.data.markers import MarkerStore, find_markers
from shasta_tpu.data.reads import build_read_store
from shasta_tpu.graph import marker_graph as MG
from shasta_tpu.graph import read_graph as RG
from shasta_tpu.io.fasta import parse_fasta_bytes
from shasta_tpu.ops import lowhash as LH
from shasta_tpu.ops.align import AlignParams, align_candidates

from tests import synth
from shasta_tpu.data import bases as B


def test_union_find_labels():
    # 0-1-2 chain, 3-4, 5 isolated
    u = np.array([0, 1, 3])
    v = np.array([1, 2, 4])
    label = MG.union_find_labels(6, u, v)
    assert label.tolist() == [0, 0, 0, 3, 3, 5]


def test_union_find_large_random():
    rng = np.random.default_rng(0)
    n = 5000
    # Random unions within blocks of 10 -> each block one component.
    base = np.arange(0, n, 10).repeat(9)
    off1 = np.tile(np.arange(0, 9), n // 10)
    off2 = np.tile(np.arange(1, 10), n // 10)
    label = MG.union_find_labels(n, base + off1, base + off2)
    assert np.array_equal(label, (np.arange(n) // 10) * 10)


def make_markers(seqs):
    """MarkerStore from explicit per-oriented-read kmer id lists
    (positions = 3*ordinal)."""
    offsets = np.zeros(len(seqs) + 1, np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    kmer_ids = np.concatenate([np.asarray(s, np.uint32) for s in seqs])
    positions = np.concatenate(
        [3 * np.arange(len(s), dtype=np.uint32) for s in seqs]
    )
    return MarkerStore(k=4, kmer_ids=kmer_ids, positions=positions, offsets=offsets)


def test_vertex_filtering_duplicate_and_coverage():
    # 2 reads (4 oriented reads), each with 3 markers.
    m = make_markers([[1, 2, 3], [4, 5, 6], [1, 2, 3], [4, 5, 6]])
    # Unite (read0 strand0, ord i) with (read1 strand0, ord i), plus RCs.
    u = np.array([0, 1, 2, 9, 10, 11])
    v = np.array([6, 7, 8, 3, 4, 5])
    mg = MG.create_marker_graph_vertices(m, u, v, min_coverage=2, max_coverage=10)
    assert mg.vertex_count == 6  # 3 per strand
    assert MG.check_strand_symmetry(mg)
    cov = mg.vertex_coverage()
    assert np.all(cov == 2)

    # With min_coverage=3, nothing survives.
    mg2 = MG.create_marker_graph_vertices(m, u, v, min_coverage=3, max_coverage=10)
    assert mg2.vertex_count == 0

    # Duplicate markers from the same read kill the set.
    u3 = np.array([0])
    v3 = np.array([1])  # same oriented read 0 -> same read
    mg3 = MG.create_marker_graph_vertices(m, u3, v3, min_coverage=2, max_coverage=10)
    assert mg3.vertex_count == 0


def test_edges_and_prune():
    # Linear chain with all vertices surviving: edges follow reads.
    m = make_markers([[1, 2, 3, 4], [9, 9, 9, 9], [1, 2, 3, 4], [9, 9, 9, 9]])
    u = np.array([0, 1, 2, 3, 13, 14, 15, 12])
    v = np.array([8, 9, 10, 11, 5, 6, 7, 4])
    mg = MG.create_marker_graph_vertices(m, u, v, min_coverage=2, max_coverage=10)
    MG.create_marker_graph_edges(m, mg)
    assert mg.vertex_count == 8
    # Each oriented read contributes 3 consecutive-pairs; reads agree,
    # so 3 edges per strand.
    assert mg.edge_count == 6
    assert np.all(mg.coverage == 2)
    # RC pairing is a valid involution.
    assert np.all(mg.rc_edge >= 0)
    assert np.array_equal(mg.rc_edge[mg.rc_edge], np.arange(6))
    MG.transitive_reduction(mg, low_coverage_threshold=0, max_distance=5)
    assert not mg.removed_tr.any()
    MG.prune(mg, iteration_count=1)
    # A pure linear chain is all leaves-edges eventually, but one prune
    # iteration only removes the terminal edges.
    assert mg.pruned.sum() == 4  # first and last edge of each strand


def full_pipeline_to_marker_graph(
    genome_size=20000, n_reads=120, read_len=3000, seed=3, error_rate=0.0
):
    genome = synth.random_genome(genome_size, seed=seed)
    reads = synth.sample_reads(
        genome, n_reads, read_len, seed=seed + 1, error_rate=error_rate
    )
    fasta = b"".join(
        b">r%d\n%s\n" % (i, B.decode_to_str(r).encode()) for i, r in enumerate(reads)
    )
    parsed = parse_fasta_bytes(fasta)
    store = build_read_store(parsed, min_read_length=500)
    kt = select_kmers_random(8, 0.1, seed=231)
    markers = find_markers(store, kt)
    cand = LH.find_candidates_lowhash(
        markers,
        LH.LowHashParams(
            m=4,
            hash_fraction=0.05,
            iteration_count=6,
            min_frequency=2,
            # Error-free reads give identical features; the bucket-size
            # cap must exceed coverage or candidates vanish.
            max_bucket_size=60,
        ),
    )
    params = AlignParams(min_aligned_marker_count=20, max_skip=60, max_drift=60, max_trim=60)
    al = align_candidates(
        markers,
        cand.read_id0,
        cand.read_id1,
        cand.same_strand,
        params,
        kt.downsampling_hash_table(),
    )
    rg, keep = RG.create_read_graph(al, store.read_count, max_alignment_count=8)
    chim = RG.flag_chimeric_reads(rg, store.read_count, max_distance=2)
    u, v = MG.gather_unite_pairs(markers, rg, al, chim)
    mg = MG.create_marker_graph_vertices(
        markers, u, v, min_coverage=3, max_coverage=200
    )
    MG.create_marker_graph_edges(markers, mg)
    return store, markers, mg


@pytest.mark.slow
def test_marker_graph_integration():
    store, markers, mg = full_pipeline_to_marker_graph()
    assert mg.vertex_count > 100
    assert MG.check_strand_symmetry(mg)
    # Edges exist and are strand-symmetric.
    assert mg.edge_count > 100
    ok = mg.rc_edge >= 0
    assert ok.mean() > 0.99
    idx = np.flatnonzero(ok)
    assert np.array_equal(mg.rc_edge[mg.rc_edge[idx]], idx)
    # After reduction + prune the alive subgraph should be mostly a
    # linear chain (error-free reads): most vertices have degree <= 1.
    MG.transitive_reduction(mg, low_coverage_threshold=1, max_distance=30)
    MG.prune(mg, iteration_count=3)
    alive = mg.alive()
    out_deg = np.bincount(mg.source[alive], minlength=mg.vertex_count)
    assert (out_deg <= 1).mean() > 0.95


def test_union_find_stress_vs_sequential():
    """Randomized union-find stress (the reference ships a similar
    multithreaded DSU stress test, scripts/dset64Test.py)."""
    rng = np.random.default_rng(12345)
    n = 2000
    u = rng.integers(0, n, 3000)
    v = rng.integers(0, n, 3000)
    label = MG.union_find_labels(n, u, v)

    # Sequential oracle.
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(u, v):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    oracle = np.array([find(i) for i in range(n)])
    # Min-label invariant: representative of each component is its
    # minimum member.
    roots = {}
    for i in range(n):
        r = oracle[i]
        roots.setdefault(r, i)
    # Compare component partitions (labels may differ, partition must match).
    assert np.array_equal(label == label[None].T, oracle == oracle[None].T) or (
        np.array_equal(
            np.unique(label, return_inverse=True)[1],
            np.unique(oracle, return_inverse=True)[1],
        )
    )


def test_cleanup_duplicate_markers_pattern1():
    # 4 reads, 3 markers each. One bad vertex merges r0's markers 0 AND
    # 1 (duplicates) with one marker each from r1, r2, r3 -> duplicate
    # ratio 2/5 < 0.5 -> pattern 1 drops the duplicates and keeps the
    # rest.
    m = make_markers([[i + 1, i + 2, i + 3] for i in range(8)])
    u = np.array([0, 1, 6, 6, 5, 4, 11, 11])
    v = np.array([6, 6, 12, 18, 11, 11, 17, 23])
    mg = MG.create_marker_graph_vertices(
        m, u, v, min_coverage=2, max_coverage=100, allow_duplicate_markers=True
    )
    assert mg.vertex_count == 2  # the bad set and its reverse complement
    assert np.diff(mg.vertex_offsets).tolist() == [5, 5]

    out = MG.cleanup_duplicate_markers(
        m, mg, u, v, min_coverage=2, pattern1_threshold=0.5
    )
    assert out.cleanup_stats == {"bad": 2, "pattern1": 2, "pattern2": 0}
    assert out.vertex_count == 2
    # Duplicates (markers 0, 1 and their RCs 5, 4) are unassigned.
    for dropped in (0, 1, 4, 5):
        assert out.vertex_table[dropped] == -1
    # The trimmed vertex keeps r1, r2, r3 markers.
    v0 = out.vertex_markers[out.vertex_offsets[0] : out.vertex_offsets[1]]
    assert v0.tolist() == [6, 12, 18]
    assert MG.check_strand_symmetry(out)


def test_cleanup_duplicate_markers_pattern2():
    # 3 reads. Bad vertex: r0 ordinals 0,1 + r1 ordinals 0,1 + r2 -> 4/5
    # duplicates >= 0.5 -> pattern 2. Connectivity restricted to
    # duplicate markers has components {0,6} and {1,7} (clean, coverage
    # 2) and the singleton {12} (dropped).
    m = make_markers([[i + 1, i + 2, i + 3] for i in range(6)])
    u = np.array([0, 1, 0, 1, 5, 4, 5, 4])
    v = np.array([6, 7, 12, 12, 11, 10, 17, 17])
    mg = MG.create_marker_graph_vertices(
        m, u, v, min_coverage=2, max_coverage=100, allow_duplicate_markers=True
    )
    assert mg.vertex_count == 2
    assert np.diff(mg.vertex_offsets).tolist() == [5, 5]

    out = MG.cleanup_duplicate_markers(
        m, mg, u, v, min_coverage=2, pattern1_threshold=0.5
    )
    assert out.cleanup_stats == {"bad": 2, "pattern1": 0, "pattern2": 2}
    # Two clean components per strand.
    assert out.vertex_count == 4
    sets = sorted(
        out.vertex_markers[out.vertex_offsets[i] : out.vertex_offsets[i + 1]].tolist()
        for i in range(4)
    )
    assert sets == [[0, 6], [1, 7], [4, 10], [5, 11]]
    assert out.vertex_table[12] == -1 and out.vertex_table[17] == -1
    assert MG.check_strand_symmetry(out)


def test_cleanup_duplicate_markers_noop_when_clean():
    m = make_markers([[1, 2, 3], [4, 5, 6], [1, 2, 3], [4, 5, 6]])
    u = np.array([0, 1, 2, 9, 10, 11])
    v = np.array([6, 7, 8, 3, 4, 5])
    mg = MG.create_marker_graph_vertices(m, u, v, min_coverage=2, max_coverage=10)
    out = MG.cleanup_duplicate_markers(m, mg, u, v, min_coverage=2)
    assert out is mg


def test_cleanup_duplicate_markers_create_singletons():
    # With createNewVertices allowed (minCoverage <= 1), pattern-1
    # duplicates become singleton vertices instead of disappearing.
    m = make_markers([[i + 1, i + 2, i + 3] for i in range(8)])
    u = np.array([0, 1, 6, 6, 5, 4, 11, 11])
    v = np.array([6, 6, 12, 18, 11, 11, 17, 23])
    mg = MG.create_marker_graph_vertices(
        m, u, v, min_coverage=2, max_coverage=100, allow_duplicate_markers=True
    )
    out = MG.cleanup_duplicate_markers(
        m, mg, u, v, min_coverage=1, pattern1_threshold=0.5,
        pattern1_create_new_vertices=True,
    )
    # Duplicates 0, 1 (and RCs 5, 4) each got their own vertex.
    for dup in (0, 1, 4, 5):
        assert out.vertex_table[dup] >= 0
    # Each singleton vertex holds exactly one marker.
    cov = np.diff(out.vertex_offsets)
    assert (cov == 1).sum() >= 4
    assert MG.check_strand_symmetry(out)


def test_audit_strand_symmetry_catches_corruption():
    # The in-pipeline audit must catch a broken rc involution
    # (vertex level) and broken rc edge pairing (edge level).
    import pytest

    _, _, mg = full_pipeline_to_marker_graph(
        genome_size=8000, n_reads=60, read_len=2000, seed=5
    )
    MG.audit_strand_symmetry(mg, "test")  # clean graph passes

    rc_save = mg.rc_vertex.copy()
    if mg.vertex_count >= 2:
        mg.rc_vertex[0], mg.rc_vertex[1] = mg.rc_vertex[1], mg.rc_vertex[0]
        if not MG.check_strand_symmetry(mg):
            with pytest.raises(RuntimeError):
                MG.audit_strand_symmetry(mg, "test")
        mg.rc_vertex = rc_save
    if mg.rc_edge is not None and mg.rc_edge.shape[0] >= 1:
        mg.rc_edge = mg.rc_edge.copy()
        mg.rc_edge[0] = -1
        with pytest.raises(RuntimeError):
            MG.audit_strand_symmetry(mg, "test")


def test_check_marker_graph_vertices_audit():
    """The vertexTable/vertices audit passes on a real graph and
    catches a corrupted table (reference: checkMarkerGraphVertices)."""
    import numpy as np

    from shasta_tpu.graph.marker_graph import (
        MarkerGraph,
        check_marker_graph_vertices,
    )

    vt = np.array([0, -1, 0, 1, 1, -1], np.int64)
    mg = MarkerGraph(
        vertex_table=vt,
        vertex_offsets=np.array([0, 2, 4], np.int64),
        vertex_markers=np.array([0, 2, 3, 4], np.int64),
        rc_vertex=np.array([1, 0], np.int64),
    )
    assert check_marker_graph_vertices(mg)
    mg.vertex_table[2] = 1  # corrupt
    assert not check_marker_graph_vertices(mg)


def test_check_strictly_increasing():
    import numpy as np

    from shasta_tpu.ops.align import AlignmentStore

    def store(ord0, ord1, offs):
        z = np.zeros(len(offs) - 1, np.int32)
        return AlignmentStore(
            read_id0=z, read_id1=z, same_strand=z.astype(bool),
            marker_count=z, n_markers0=z, n_markers1=z, first0=z,
            last0=z, first1=z, last1=z, min_offset=z, max_offset=z,
            max_skip_v=z, max_drift_v=z,
            ord0=np.asarray(ord0, np.uint32),
            ord1=np.asarray(ord1, np.uint32),
            offsets=np.asarray(offs, np.int64),
        )

    assert store([0, 2, 5, 0, 1], [1, 3, 4, 7, 9], [0, 3, 5]).check_strictly_increasing()
    # Non-increasing inside the second alignment.
    assert not store([0, 2, 5, 3, 1], [1, 3, 4, 7, 9], [0, 3, 5]).check_strictly_increasing()


def test_streaming_unite_labels_match_gathered():
    """union_find_labels_from_alignments (native streaming DSU, no
    materialized pair arrays) must produce labels identical to
    gather_unite_pairs + union_find_labels."""
    import numpy as np

    from shasta_tpu import native
    from shasta_tpu.data.markers import MarkerStore
    from shasta_tpu.graph import marker_graph as MG
    from shasta_tpu.graph.read_graph import ReadGraph
    from shasta_tpu.ops.align import AlignmentStore

    if native.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(97)
    n_reads = 12
    counts = np.repeat(rng.integers(30, 80, n_reads), 2).astype(np.int64)
    offsets = np.zeros(2 * n_reads + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    markers = MarkerStore(
        k=8,
        kmer_ids=rng.integers(0, 4000, offsets[-1]).astype(np.uint32),
        positions=np.zeros(offsets[-1], np.uint32),
        offsets=offsets,
    )
    # Random alignments between read pairs.
    n_al = 20
    r0 = rng.integers(0, n_reads - 1, n_al).astype(np.int32)
    r1 = (r0 + 1 + rng.integers(0, n_reads - 1 - r0)).astype(np.int32)
    same = rng.random(n_al) < 0.5
    ords0, ords1, offs = [], [], [0]
    for t in range(n_al):
        o0r = 2 * int(r0[t])
        o1r = 2 * int(r1[t]) + (0 if same[t] else 1)
        m = int(rng.integers(3, 15))
        a = np.sort(rng.choice(int(counts[o0r]), m, replace=False))
        b = np.sort(rng.choice(int(counts[o1r]), m, replace=False))
        ords0.append(a.astype(np.uint32))
        ords1.append(b.astype(np.uint32))
        offs.append(offs[-1] + m)
    al = AlignmentStore(
        read_id0=r0, read_id1=r1, same_strand=same,
        marker_count=np.diff(offs).astype(np.int32),
        n_markers0=counts[2 * r0].astype(np.int32),
        n_markers1=counts[2 * r1].astype(np.int32),
        first0=np.zeros(n_al, np.int32), last0=np.zeros(n_al, np.int32),
        first1=np.zeros(n_al, np.int32), last1=np.zeros(n_al, np.int32),
        min_offset=np.zeros(n_al, np.int32),
        max_offset=np.zeros(n_al, np.int32),
        max_skip_v=np.zeros(n_al, np.int32),
        max_drift_v=np.zeros(n_al, np.int32),
        ord0=np.concatenate(ords0), ord1=np.concatenate(ords1),
        offsets=np.array(offs, np.int64),
    )
    # Read graph: each alignment as an RC edge pair (even = direct).
    orid0 = 2 * r0.astype(np.int64)
    orid1 = 2 * r1.astype(np.int64) + np.where(same, 0, 1)
    g = ReadGraph(
        orid0=np.repeat(orid0, 2),
        orid1=np.repeat(orid1, 2),
        alignment_id=np.repeat(np.arange(n_al, dtype=np.int64), 2),
        crosses_strands=np.zeros(2 * n_al, bool),
        n_oriented_reads=2 * n_reads,
    )
    chim = np.zeros(n_reads, bool)
    chim[3] = True

    u, v = MG.gather_unite_pairs(markers, g, al, chim)
    want = MG.union_find_labels(markers.total_count, u, v)
    got = MG.union_find_labels_from_alignments(markers, g, al, chim)
    assert got is not None
    assert np.array_equal(got, want)
