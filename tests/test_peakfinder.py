"""PeakFinder: persistence peaks and minCoverage cutoff."""

import numpy as np
import pytest

from shasta_tpu.utils.peakfinder import (
    PeakFinderException,
    find_peaks,
    find_x_cutoff,
)


def coverage_histogram():
    """Typical shape: error peak at 1, true coverage peak ~20."""
    x = np.arange(60, dtype=float)
    error = 4000 * np.exp(-x / 1.5)
    signal = 900 * np.exp(-0.5 * ((x - 20) / 5.0) ** 2)
    return (error + signal).astype(np.int64)


def test_find_peaks_identifies_both():
    y = coverage_histogram()
    peaks = find_peaks(y)
    starts = sorted(p.start for p in sorted(peaks, key=lambda p: -p.persistence)[:2])
    assert starts[0] <= 2      # error peak
    assert 15 <= starts[1] <= 25  # coverage peak


def test_find_x_cutoff_in_valley():
    y = coverage_histogram()
    cutoff = find_x_cutoff(y, min_area_fraction=0.05)
    # The cutoff must separate the error peak from the signal peak.
    assert 4 <= cutoff <= 16


def test_no_second_peak_raises():
    y = (4000 * np.exp(-np.arange(40) / 1.5)).astype(np.int64)
    with pytest.raises(PeakFinderException):
        find_x_cutoff(y)


def test_tiny_second_peak_rejected_by_area():
    y = coverage_histogram()
    y[15:] //= 50  # shrink the signal peak drastically
    with pytest.raises(PeakFinderException):
        find_x_cutoff(y, min_area_fraction=0.5)


def test_auto_min_coverage_fallback():
    from shasta_tpu.pipeline.assemble import auto_min_coverage

    assert auto_min_coverage(np.array([0, 100, 10, 1])) == 5
    assert 4 <= auto_min_coverage(coverage_histogram()) <= 16
