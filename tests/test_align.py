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
