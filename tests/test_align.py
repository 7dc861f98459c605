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
