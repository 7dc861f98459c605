"""Alignment methods 0 and 1 vs the banded method-3 engine."""

import numpy as np

from shasta_tpu.ops.align_other import align_method0, align_method1, dots_between


def test_dots_and_frequency_filter():
    a = np.array([1, 2, 3, 2, 9])
    b = np.array([2, 3, 7, 2])
    ii, jj = dots_between(a, b, max_marker_frequency=10)
    assert set(zip(ii.tolist(), jj.tolist())) == {
        (1, 0), (1, 3), (3, 0), (3, 3), (2, 1)
    }
    # With frequency cap 1, marker 2 (twice in both) is excluded.
    ii2, jj2 = dots_between(a, b, max_marker_frequency=1)
    assert set(zip(ii2.tolist(), jj2.tolist())) == {(2, 1)}


def test_method0_chains_increasing():
    rng = np.random.default_rng(0)
    g = rng.integers(0, 5000, 120)
    a = g[:100]
    b = g[20:]
    o0, o1 = align_method0(a, b, max_skip=30, max_drift=30)
    assert o0.shape[0] >= 75
    assert np.all(np.diff(o0) > 0) and np.all(np.diff(o1) > 0)
    assert np.all(a[o0] == b[o1])
    # Offsets consistent with the 20-marker shift.
    assert np.all(o0 - o1 == 20)


def test_method1_full_overlap():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 5000, 150)
    a = g[:120]
    b = g[40:]
    o0, o1 = align_method1(a, b)
    assert o0.shape[0] >= 75
    assert np.all(a[o0] == b[o1])
    assert np.all(np.diff(o0) > 0) and np.all(np.diff(o1) > 0)


def test_align4_bands_finds_diagonal():
    from shasta_tpu.ops.align_other import align4_bands

    rng = np.random.default_rng(3)
    shared = rng.integers(0, 1 << 28, 600).astype(np.int32)
    # b = shared with an offset of 100 unique leading markers.
    lead = rng.integers(1 << 28, 1 << 29, 100).astype(np.int32)
    a = shared
    b = np.concatenate([lead, shared])
    bands = align4_bands(a, b, delta_x=200, delta_y=10,
                         min_entry_count=10, max_distance_from_boundary=100)
    assert bands, "expected at least one band"
    # True offset x - y = -100 must be inside some band.
    assert any(bmin <= -100 <= bmax for bmin, bmax in bands)


def test_align4_bands_empty_on_no_matches():
    from shasta_tpu.ops.align_other import align4_bands

    a = np.arange(100, dtype=np.int32)
    b = np.arange(1000, 1100, dtype=np.int32)
    assert align4_bands(a, b) == []


def test_align_candidates_method4_end_to_end():
    from shasta_tpu.ops.align import AlignParams, align_candidates
    from shasta_tpu.ops.align_other import align_candidates_method4
    from shasta_tpu.data.kmers import select_kmers_random
    from shasta_tpu.data.markers import find_markers
    from shasta_tpu.data.reads import build_read_store
    from shasta_tpu.io.fasta import parse_fasta_bytes
    from shasta_tpu.data import bases as B
    from tests import synth

    genome = synth.random_genome(20000, seed=31)
    reads = synth.sample_reads(genome, 40, 4000, seed=32, both_strands=True)
    fasta = b"".join(
        b">r%d\n%s\n" % (i, B.decode_to_str(r).encode())
        for i, r in enumerate(reads)
    )
    store = build_read_store(parse_fasta_bytes(fasta))
    kt = select_kmers_random(8, 0.1, seed=231)
    markers = find_markers(store, kt)
    from shasta_tpu.ops import lowhash as LH

    cand = LH.find_candidates_lowhash(
        markers, LH.LowHashParams(max_bucket_size=60, min_frequency=2)
    )
    assert cand.count > 0
    params = AlignParams(min_aligned_marker_count=40)
    st4 = align_candidates_method4(
        markers, cand.read_id0, cand.read_id1, cand.same_strand, params
    )
    st3 = align_candidates(
        markers, cand.read_id0, cand.read_id1, cand.same_strand, params,
        kt.downsampling_hash_table(),
    )
    assert st4.count > 0
    # Methods 3 and 4 should accept broadly the same pairs on clean data.
    k3 = set(zip(st3.read_id0.tolist(), st3.read_id1.tolist()))
    k4 = set(zip(st4.read_id0.tolist(), st4.read_id1.tolist()))
    assert len(k3 & k4) >= 0.8 * len(k3)
    # Ordinal pairs are genuine matches.
    koff = markers.offsets
    kf = markers.kmer_ids
    for i in range(min(5, st4.count)):
        o0, o1 = st4.ordinals(i)
        orid0 = 2 * int(st4.read_id0[i])
        orid1 = 2 * int(st4.read_id1[i]) + (0 if st4.same_strand[i] else 1)
        assert np.array_equal(kf[koff[orid0] + o0], kf[koff[orid1] + o1])
