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
