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
