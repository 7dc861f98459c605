"""Tests for k-mer table and marker extraction."""

import numpy as np

from shasta_tpu.data import bases as B
from shasta_tpu.data import kmers as K
from shasta_tpu.data.markers import find_markers, rolling_kmers_flat
from shasta_tpu.data.reads import ReadStore, build_read_store
from shasta_tpu.io.fasta import ParsedReads
from tests import synth


def _store_from_codes(seqs):
    from shasta_tpu.data import rle as R

    flat = np.concatenate(seqs) if seqs else np.zeros(0, np.uint8)
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    rb, cnt, roff = R.rle_encode_flat(flat, offsets)
    return ReadStore(
        rle_bases=rb,
        repeat_counts=np.minimum(cnt, 255).astype(np.uint8),
        offsets=roff,
        raw_lengths=np.array([len(s) for s in seqs], dtype=np.int64),
        names=[f"r{i}" for i in range(len(seqs))],
    )


def test_reverse_complement_kmers():
    k = 4
    # ACGT -> rc is ACGT (palindrome)
    acgt = np.uint32((0 << 6) | (1 << 4) | (2 << 2) | 3)
    assert K.reverse_complement_kmers(np.array([acgt]), k)[0] == acgt
    # AAAA -> TTTT
    aaaa = np.uint32(0)
    tttt = np.uint32((3 << 6) | (3 << 4) | (3 << 2) | 3)
    assert K.reverse_complement_kmers(np.array([aaaa]), k)[0] == tttt
    # involution on random ids
    ids = np.random.default_rng(0).integers(0, 4**k, size=100).astype(np.uint64)
    rc = K.reverse_complement_kmers(ids, k)
    rc2 = K.reverse_complement_kmers(rc, k)
    assert np.array_equal(rc2.astype(np.uint64), ids)


def test_is_rle_kmer():
    k = 3
    # ACA = 0,1,0 -> ok ; AAC has AA -> not ok
    aca = np.uint32((0 << 4) | (1 << 2) | 0)
    aac = np.uint32((0 << 4) | (0 << 2) | 1)
    r = K.is_rle_kmer(np.array([aca, aac]), k)
    assert r.tolist() == [True, False]


def test_random_selection_rc_closed_and_fraction():
    table = K.select_kmers_random(k=8, probability=0.2, seed=231)
    assert table.check_rc_closed()
    # Selection is among RLE k-mers only (reference:
    # AssemblerKmers.cpp:107); the fraction target applies to those.
    n_rle = 4 * 3 ** 7
    frac = table.marker_count / n_rle
    assert 0.15 < frac < 0.25
    # Non-RLE k-mers are never markers.
    ids = np.flatnonzero(table.is_marker).astype(np.uint32)
    assert K.is_rle_kmer(ids, 8).all()


def test_rolling_kmers():
    codes = B.encode_str("ACGTAC")
    kv = rolling_kmers_flat(codes, 3)
    # ACG, CGT, GTA, TAC
    expect = [
        (0 << 4) | (1 << 2) | 2,
        (1 << 4) | (2 << 2) | 3,
        (2 << 4) | (3 << 2) | 0,
        (3 << 4) | (0 << 2) | 1,
    ]
    assert kv.tolist() == expect


def test_markers_strand_identity():
    """Strand-1 markers derived internally must equal a direct scan of
    the reverse-complemented sequence."""
    k = 5
    rng = np.random.default_rng(11)
    # RLE-like sequences (no equal adjacent bases) to keep this simple.
    seqs = []
    for _ in range(10):
        n = rng.integers(20, 80)
        s = [rng.integers(0, 4)]
        for _ in range(n - 1):
            s.append((s[-1] + rng.integers(1, 4)) % 4)
        seqs.append(np.array(s, dtype=np.uint8))
    store = _store_from_codes(seqs)
    table = K.select_kmers_random(k=k, probability=0.3, seed=1)
    ms = find_markers(store, table)

    for rid in range(store.read_count):
        rc_seq = B.reverse_complement(store.read_rle(rid, 0))
        kv = rolling_kmers_flat(rc_seq, k)
        want_pos = np.flatnonzero(table.is_marker[kv])
        want_kmers = kv[want_pos]
        got_kmers, got_pos = ms.get(2 * rid + 1)
        assert np.array_equal(got_pos, want_pos.astype(np.uint32)), rid
        assert np.array_equal(got_kmers, want_kmers), rid


def test_markers_positions_sorted_and_count():
    genome = synth.random_genome(3000, seed=2)
    reads = synth.sample_reads(genome, 20, 600, seed=3)
    store = _store_from_codes(reads)
    table = K.select_kmers_random(k=7, probability=0.15, seed=231)
    ms = find_markers(store, table)
    assert ms.oriented_read_count == 40
    counts = ms.counts()
    assert np.array_equal(counts[0::2], counts[1::2])
    for orid in range(ms.oriented_read_count):
        _, pos = ms.get(orid)
        assert np.all(np.diff(pos.astype(np.int64)) > 0)
