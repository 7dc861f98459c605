"""Tests for the banded alignment kernel against a numpy DP oracle."""

import numpy as np
import pytest

from shasta_tpu.ops import align as A


def oracle_overlap_score(a, b, match=6, mismatch=-1, gap=-1):
    """Unbanded overlap alignment (free ends) — score only."""
    la, lb = len(a), len(b)
    V = np.zeros((la + 1, lb + 1), dtype=np.int64)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            s = match if a[i - 1] == b[j - 1] else mismatch
            V[i, j] = max(V[i - 1, j - 1] + s, V[i - 1, j] + gap, V[i, j - 1] + gap)
            if j == 1:
                V[i, j] = max(V[i, j], V[i, 0] + s if False else V[i, j])
    # free start: V[i,0] = V[0,j] = 0 already
    return max(V[la, :].max(), V[:, lb].max())


def run_kernel(a, b, band_min, W, match=6, mismatch=-1, gap=-1):
    a_arr = np.asarray(a, np.int32)[None, :]
    b_arr = np.asarray(b, np.int32)[None, :]
    dirs, bi, bd, bv = A.banded_forward(
        a_arr,
        np.array([len(a)], np.int32),
        b_arr,
        np.array([len(b)], np.int32),
        np.array([band_min], np.int32),
        W=W,
        match=match,
        mismatch=mismatch,
        gap=gap,
    )
    m0, m1 = A.traceback(
        dirs,
        a_arr,
        b_arr,
        np.array([band_min], np.int32),
        bi,
        bd,
        n_steps=len(a) + len(b),
    )
    m0 = np.asarray(m0)[:, 0]
    m1 = np.asarray(m1)[:, 0]
    sel = m0 >= 0
    return int(bv[0]), m0[sel][::-1], m1[sel][::-1]


def test_identical_sequences():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1000, 50)
    score, o0, o1 = run_kernel(a, a, band_min=-32, W=64)
    assert score == 6 * 50
    assert np.array_equal(o0, np.arange(50))
    assert np.array_equal(o1, np.arange(50))


def test_shifted_overlap():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 5000, 200)
    a = g[:150]
    b = g[50:]
    score, o0, o1 = run_kernel(a, b, band_min=-64, W=128)
    # overlap region is a[50:150] == b[0:100]
    assert score == 6 * 100
    assert np.array_equal(o0, np.arange(50, 150))
    assert np.array_equal(o1, np.arange(0, 100))


@pytest.mark.parametrize("seed", range(8))
def test_scores_match_oracle_wide_band(seed):
    rng = np.random.default_rng(seed)
    la = int(rng.integers(5, 40))
    lb = int(rng.integers(5, 40))
    # small alphabet -> plenty of chance matches and ties
    a = rng.integers(0, 4, la)
    b = rng.integers(0, 4, lb)
    want = oracle_overlap_score(a, b)
    W = 128
    got, o0, o1 = run_kernel(a, b, band_min=-(W // 2), W=W)
    assert got == want, (a.tolist(), b.tolist())
    # matched ordinals must be strictly increasing on both sides
    assert np.all(np.diff(o0) > 0)
    assert np.all(np.diff(o1) > 0)
    assert np.all(a[o0] == b[o1])


def test_with_indels_and_mismatches():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 4096, 400)
    a = g[:300].copy()
    b = g[100:400].copy()
    # mutate b's copy of the overlap: substitutions and a small deletion
    b[50] = 9999
    b = np.delete(b, slice(120, 123))
    score, o0, o1 = run_kernel(a, b, band_min=-128, W=256)
    # the overlap (200 markers minus mutations) should mostly align
    assert o0.shape[0] > 180
    off = o0.astype(int) - o1.astype(int)
    assert np.all(np.abs(off - 100) < 10)


def test_compressed_alignment_roundtrip():
    from shasta_tpu.data.compress_alignment import (
        compress_alignment,
        decompress_alignment,
    )

    rng = np.random.default_rng(9)
    # Build a realistic alignment: streaks with gaps and drifts.
    o0, o1 = [], []
    x, y = rng.integers(0, 5, 2)
    for _ in range(50):
        n = int(rng.integers(1, 40))
        for _ in range(n):
            o0.append(x)
            o1.append(y)
            x += 1
            y += 1
        x += int(rng.integers(0, 700))
        y += int(rng.integers(0, 700))
    ord0 = np.array(o0, np.uint32)
    ord1 = np.array(o1, np.uint32)
    blob = compress_alignment(ord0, ord1)
    # Compression wins: a long streak costs a few bytes.
    assert len(blob) < 8 * ord0.shape[0]
    r0, r1 = decompress_alignment(blob)
    assert np.array_equal(r0, ord0)
    assert np.array_equal(r1, ord1)


def test_compressed_alignment_formats():
    from shasta_tpu.data.compress_alignment import (
        compress_alignment,
        decompress_alignment,
    )

    # One streak per format: sizes 1, 2, 4, 8, 16 bytes.
    cases = [
        ((2, 3, 5), 1),        # format 0: small non-negative skips
        ((-3, 7, 20), 2),      # format 1: small signed
        ((400, -500, 300), 4),  # format 2
        ((100000, -90000, 1000), 8),  # format 3
        ((2**25, -(2**25), 3), 16),   # format 4
    ]
    for (s0, s1, n), size in cases:
        start0 = max(s0, 0) + 2**26  # keep ordinals non-negative
        start1 = max(s1, 0) + 2**26
        # First streak consumes the large initial skip in format 4;
        # test the target streak as the second one.
        o0 = [start0]
        o1 = [start1]
        b0 = start0 + s0
        b1 = start1 + s1
        o0.extend(range(b0, b0 + n))
        o1.extend(range(b1, b1 + n))
        ord0 = np.array(o0, np.uint32)
        ord1 = np.array(o1, np.uint32)
        blob = compress_alignment(ord0, ord1)
        assert len(blob) == 16 + size, (s0, s1, n, len(blob))
        r0, r1 = decompress_alignment(blob)
        assert np.array_equal(r0, ord0)
        assert np.array_equal(r1, ord1)


def test_compressed_alignment_empty():
    from shasta_tpu.data.compress_alignment import (
        compress_alignment,
        decompress_alignment,
    )

    blob = compress_alignment(np.zeros(0, np.uint32), np.zeros(0, np.uint32))
    assert blob == b""
    r0, r1 = decompress_alignment(blob)
    assert r0.shape[0] == 0 and r1.shape[0] == 0


def test_bucket_extends_beyond_table():
    # Oversized inputs must extend in power-of-2 steps, never clamp
    # (clamping crashed padding for >32768-marker reads and clipped
    # phase-1 bands wider than 2048).
    from shasta_tpu.ops.align import _bucket, _LEN_BUCKETS, _W_BUCKETS

    assert _bucket(100, _LEN_BUCKETS) == 128
    assert _bucket(32768, _LEN_BUCKETS) == 32768
    assert _bucket(32769, _LEN_BUCKETS) == 65536
    assert _bucket(200000, _LEN_BUCKETS) == 262144
    assert _bucket(2049, _W_BUCKETS) == 4096
    assert _bucket(6500, _W_BUCKETS) == 8192


def test_dot_diag_band_matches_bruteforce():
    """_dot_diag_band's per-pair diagonal range equals the brute-force
    min/max over exact k-mer match positions."""
    from shasta_tpu.ops.align import _dot_diag_band

    rng = np.random.default_rng(3)
    rows = [rng.integers(0, 12, rng.integers(5, 40)).astype(np.int32)
            for _ in range(12)]
    lens = np.array([r.shape[0] for r in rows], np.int64)
    off = np.zeros(lens.shape[0] + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    flat = np.concatenate(rows).astype(np.int32)
    ids_a = np.array([0, 2, 4, 6, 8], np.int64)
    ids_b = np.array([1, 3, 5, 7, 9], np.int64)
    dmin, dmax, has = _dot_diag_band(ids_a, ids_b, flat, off, lens)
    for t, (ia, ib) in enumerate(zip(ids_a, ids_b)):
        a, b = rows[ia], rows[ib]
        diags = [j - i for i in range(len(a)) for j in range(len(b))
                 if a[i] == b[j]]
        if diags:
            assert has[t]
            assert dmin[t] == min(diags) and dmax[t] == max(diags), t
        else:
            assert not has[t]


def test_dot_diag_band_densest_window():
    """With max_width set, a pair whose dot range exceeds the limit
    narrows to the densest dot window (the true-alignment diagonal
    cluster wins over scattered spurious dots), while in-range pairs
    keep the exact full range."""
    from shasta_tpu.ops.align import _dot_diag_band

    rng = np.random.default_rng(11)
    # Row pair: b is a shifted copy of a (dense dots on diagonal ~+7),
    # plus one planted spurious shared value far down the sequence
    # producing dots at extreme diagonals.
    a = np.arange(1000, 1000 + 600, dtype=np.int32)
    b = np.concatenate([a[7:], np.arange(5000, 5000 + 7, dtype=np.int32)])
    # a spurious k-mer: a value from a's head repeated near b's tail
    b[-1] = a[0]
    # control pair: small range, must be untouched
    c = np.arange(9000, 9040, dtype=np.int32)
    d = c[5:].copy()
    rows = [a, b, c, d]
    lens = np.array([r.shape[0] for r in rows], np.int64)
    off = np.zeros(5, np.int64)
    np.cumsum(lens, out=off[1:])
    flat = np.concatenate(rows).astype(np.int32)
    ids_a = np.array([0, 2], np.int64)
    ids_b = np.array([1, 3], np.int64)
    full_min, full_max, full_has = _dot_diag_band(ids_a, ids_b, flat, off, lens)
    assert full_has.all()
    assert full_max[0] - full_min[0] + 3 > 128  # spurious dot inflates
    dmin, dmax, has = _dot_diag_band(
        ids_a, ids_b, flat, off, lens, max_width=128
    )
    assert has.all()
    assert dmax[0] - dmin[0] + 3 <= 128
    # the dense true-alignment diagonal (-7: j - i where b[j] = a[j+7])
    assert dmin[0] <= -7 <= dmax[0]
    # in-range pair identical to the unrestricted result
    assert dmin[1] == full_min[1] and dmax[1] == full_max[1]


def test_dot_band_preserves_unbanded_score():
    """A band covering the exact-match diagonal range (+-1) preserves
    the unbanded optimal score (the property the UL phase-1 banding
    relies on)."""
    import jax.numpy as jnp

    from shasta_tpu.ops.align import _banded_forward, _dot_diag_band

    rng = np.random.default_rng(8)
    for trial in range(6):
        la = int(rng.integers(40, 120))
        lb = int(rng.integers(40, 120))
        g = rng.integers(0, 25, 300).astype(np.int32)
        a = g[:la].copy()
        sb = int(rng.integers(0, 40))
        b = g[sb:sb + lb].copy()
        nz = rng.random(lb) < 0.2
        b[nz] = rng.integers(0, 25, int(nz.sum()))

        def score(bmin, W):
            aa = np.full((1, 128), -1, np.int32); aa[0, :la] = a
            bb = np.full((1, 128), -2, np.int32); bb[0, :lb] = b
            _d, _bi, _bd, bv = _banded_forward(
                jnp.asarray(aa), jnp.asarray(np.array([la], np.int32)),
                jnp.asarray(bb), jnp.asarray(np.array([lb], np.int32)),
                jnp.asarray(np.array([bmin], np.int32)), W, 6, -1, -1,
            )
            return int(np.asarray(bv)[0])

        full = score(-la, 256)  # full-width band
        lens = np.array([la, lb], np.int64)
        off = np.array([0, la, la + lb], np.int64)
        flat = np.concatenate([a, b]).astype(np.int32)
        dmin, dmax, has = _dot_diag_band(
            np.array([0]), np.array([1]), flat, off, lens
        )
        if not has[0]:
            continue
        W2 = int(dmax[0] - dmin[0] + 3)
        W2 = max(128, ((W2 + 127) // 128) * 128)
        banded = score(int(dmin[0]) - 1, W2)
        assert banded == full, (trial, banded, full)


@pytest.mark.slow
def test_ul_wide_phase1_uses_dot_band():
    """Reads long enough that the downsampled phase-1 width exceeds the
    widest kernel band (>100 kb at k=14) route through the exact-match
    dot band and still produce the expected overlap alignments."""
    from tests import synth
    from shasta_tpu.data import bases as B
    from shasta_tpu.io.fasta import parse_fasta_bytes
    from shasta_tpu.data.reads import build_read_store
    from shasta_tpu.data.kmers import select_kmers_random
    from shasta_tpu.data.markers import find_markers
    from shasta_tpu.ops import lowhash as LH
    from shasta_tpu.ops.align import AlignParams, align_candidates, _W_BUCKETS

    genome = synth.random_genome(250000, seed=90)
    reads = synth.sample_reads(
        genome, 8, 150000, seed=91, error_rate=0.01, both_strands=True
    )
    fasta = b"".join(
        b">r%d\n%s\n" % (i, B.decode_to_str(r).encode())
        for i, r in enumerate(reads)
    )
    store = build_read_store(parse_fasta_bytes(fasta), min_read_length=50000)
    kt = select_kmers_random(14, 0.1, seed=231)
    markers = find_markers(store, kt)
    # The downsampled full width must exceed the widest kernel band so
    # the dot-band path actually runs.
    counts = np.diff(markers.offsets)
    assert int(counts.max()) * 0.1 * 2 > _W_BUCKETS[-1]
    cand = LH.find_candidates_lowhash(
        markers,
        LH.LowHashParams(
            m=4, hash_fraction=0.02, iteration_count=8, min_frequency=2,
            max_bucket_size=60,
        ),
    )
    assert cand.count > 0
    params = AlignParams(
        min_aligned_marker_count=100, max_skip=80, max_drift=60, max_trim=80
    )
    al = align_candidates(
        markers, cand.read_id0, cand.read_id1, cand.same_strand, params,
        kt.downsampling_hash_table(),
    )
    # Overlapping 150 kb reads on a 250 kb genome: most candidates are
    # genuine overlaps and must survive alignment.
    assert al.count > 0
    assert (al.marker_count >= 100).all()
