"""Tests for LowHash candidate generation."""

import numpy as np

from shasta_tpu.data import kmers as K
from shasta_tpu.data.markers import find_markers
from shasta_tpu.data.reads import ReadStore
from shasta_tpu.ops.lowhash import (
    CandidatePairs,
    LowHashParams,
    _pairs_within_groups,
    compute_feature_hashes,
    find_candidates_lowhash,
)
from tests import synth
from tests.test_kmers_markers import _store_from_codes


def test_pairs_within_groups_small():
    # two groups: [or 4, or 6, or 9], [or 2, or 3]
    orids = np.array([4, 6, 9, 2, 3], dtype=np.int64)
    gid = np.array([0, 0, 0, 1, 1])
    gsz = np.array([3, 2])
    keys = _pairs_within_groups(orids, gid, gsz)
    # decode
    r0 = keys >> np.uint64(33)
    r1 = (keys >> np.uint64(1)) & np.uint64(0xFFFFFFFF)
    same = keys & np.uint64(1)
    got = sorted(zip(r0.tolist(), r1.tolist(), same.tolist()))
    # or4=(r2,s0), or6=(r3,s0), or9=(r4,s1), or2=(r1,s0), or3=(r1,s1)
    # pairs: (2,3,same) (2,4,opp) (3,4,opp) ; (1,1) self -> dropped
    assert got == [(2, 3, 1), (2, 4, 0), (3, 4, 0)]


def test_feature_hash_matches_direct():
    genome = synth.random_genome(2000, seed=5)
    reads = synth.sample_reads(genome, 10, 400, seed=6)
    store = _store_from_codes(reads)
    table = K.select_kmers_random(k=7, probability=0.2, seed=231)
    ms = find_markers(store, table)

    m = 4
    orids, hashes = compute_feature_hashes(ms, m, seed=37)
    # verify one oriented read against a direct per-read computation
    from shasta_tpu.ops.hashing import murmur64_features

    orid = 3
    kmers_r, _ = ms.get(orid)
    if kmers_r.shape[0] >= m:
        feats = np.stack(
            [kmers_r[j : kmers_r.shape[0] - m + 1 + j] for j in range(m)], axis=1
        )
        want = murmur64_features(feats, 37)
        got = hashes[orids == orid]
        assert np.array_equal(got, want)


def test_candidates_find_true_overlaps():
    """Reads sampled from overlapping genome windows must become
    candidates; unrelated reads must not dominate."""
    genome = synth.random_genome(6000, seed=9)
    # tile reads with 50% overlap; every adjacent pair overlaps by 300
    reads = []
    L, step = 600, 300
    for s in range(0, 6000 - L + 1, step):
        reads.append(genome[s : s + L].copy())
    store = _store_from_codes(reads)
    table = K.select_kmers_random(k=8, probability=0.15, seed=231)
    ms = find_markers(store, table)

    params = LowHashParams(
        m=3, hash_fraction=0.2, iteration_count=6, max_bucket_size=20, min_frequency=2
    )
    cands = find_candidates_lowhash(ms, params)
    assert cands.count > 0
    pairs = set(zip(cands.read_id0.tolist(), cands.read_id1.tolist()))
    # adjacent pairs share half their sequence: expect most to be found
    n_adj = len(reads) - 1
    found_adj = sum((i, i + 1) in pairs for i in range(n_adj))
    assert found_adj >= 0.8 * n_adj
    # adjacent overlapping pairs must be same-strand (no RC reads used)
    same = {
        (int(a), int(b)): bool(s)
        for a, b, s in zip(cands.read_id0, cands.read_id1, cands.same_strand)
    }
    for i in range(n_adj):
        if (i, i + 1) in same:
            assert same[(i, i + 1)]


def test_candidates_rc_pairs():
    """A read and the RC of an overlapping read -> opposite strand."""
    genome = synth.random_genome(3000, seed=12)
    from shasta_tpu.data import bases as B

    r0 = genome[0:800].copy()
    r1 = B.reverse_complement(genome[400:1200])
    r2 = genome[1500:2300].copy()  # unrelated to r0
    store = _store_from_codes([r0, r1, r2])
    table = K.select_kmers_random(k=8, probability=0.2, seed=231)
    ms = find_markers(store, table)
    cands = find_candidates_lowhash(
        ms,
        LowHashParams(m=3, hash_fraction=0.3, iteration_count=8, max_bucket_size=20),
    )
    d = {
        (a, b): s
        for a, b, s in zip(cands.read_id0, cands.read_id1, cands.same_strand)
    }
    assert (0, 1) in d and d[(0, 1)] == False  # noqa: E712
    assert (0, 2) not in d


def test_lowhash1_candidates_and_ordinals():
    from shasta_tpu.ops.lowhash import find_candidates_lowhash1

    genome = synth.random_genome(6000, seed=11)
    reads = synth.sample_reads(genome, 30, 1500, seed=12, both_strands=True)
    store = _store_from_codes(reads)
    table = K.select_kmers_random(k=7, probability=0.2, seed=231)
    ms = find_markers(store, table)

    params = LowHashParams(max_bucket_size=40, min_frequency=2)
    res = find_candidates_lowhash1(ms, params)
    assert res.pairs.count > 0
    assert res.feature_offsets.shape[0] == res.pairs.count + 1
    assert res.feature_offsets[-1] == res.feature_ord0.shape[0]

    koff = ms.offsets
    kf = ms.kmer_ids
    counts = np.diff(koff)
    m = params.m
    for i in range(res.pairs.count):
        r0 = int(res.pairs.read_id0[i])
        r1 = int(res.pairs.read_id1[i])
        ss = bool(res.pairs.same_strand[i])
        o0s, o1s = res.features(i)
        # frequency == number of unique recorded features
        assert res.pairs.frequency[i] == o0s.shape[0]
        assert o0s.shape[0] >= params.min_frequency
        # Ordinals are reflected with markerCount-1-ordinal when the
        # feature was found with read0 on strand 1 (reference:
        # LowHash1.cpp:428-436), so the m-long feature may not start at
        # the stored ordinal; what always holds is that the two stored
        # ordinals are corresponding marker positions: the single
        # marker k-mer of (r0, 0) at ordinal0 equals that of
        # (r1, ss ? 0 : 1) at ordinal1.
        orid0 = 2 * r0
        orid1 = 2 * r1 + (0 if ss else 1)
        for o0, o1 in zip(o0s.tolist(), o1s.tolist()):
            assert o0 < counts[orid0]
            assert o1 < counts[orid1]
            assert kf[koff[orid0] + o0] == kf[koff[orid1] + o1]


def test_lowhash1_agrees_with_lowhash0_on_pairs():
    from shasta_tpu.ops.lowhash import find_candidates_lowhash1

    genome = synth.random_genome(5000, seed=21)
    reads = synth.sample_reads(genome, 24, 1200, seed=22, both_strands=True)
    store = _store_from_codes(reads)
    table = K.select_kmers_random(k=7, probability=0.2, seed=231)
    ms = find_markers(store, table)

    params = LowHashParams(max_bucket_size=40, min_frequency=2)
    p0 = find_candidates_lowhash(ms, params)
    p1 = find_candidates_lowhash1(ms, params).pairs
    s0 = set(zip(p0.read_id0.tolist(), p0.read_id1.tolist(), p0.same_strand.tolist()))
    s1 = set(zip(p1.read_id0.tolist(), p1.read_id1.tolist(), p1.same_strand.tolist()))
    # The two collision filters differ slightly (high hash bits vs
    # exact feature equality; raw hits vs unique features), but on
    # error-free overlapping reads the candidate sets should agree on
    # the overwhelming majority of pairs.
    assert len(s0 & s1) >= 0.8 * max(len(s0), len(s1))
