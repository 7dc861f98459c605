"""LowHash auxiliaries: same-channel suppression, candidate table."""

import numpy as np

from shasta_tpu.ops.lowhash import (
    CandidatePairs,
    candidate_table,
    get_read_meta_field,
    suppress_alignment_candidates,
)


def make_cands(rows):
    return CandidatePairs(
        read_id0=np.array([r[0] for r in rows], np.int32),
        read_id1=np.array([r[1] for r in rows], np.int32),
        same_strand=np.array([True] * len(rows)),
        frequency=np.array([5] * len(rows), np.int32),
    )


def test_get_read_meta_field():
    m = "runid=abc ch=123 read=456 sampleid=s1"
    assert get_read_meta_field(m, "ch") == "123"
    assert get_read_meta_field(m, "read") == "456"
    assert get_read_meta_field(m, "nope") == ""


def test_suppress_same_channel():
    meta = [
        "runid=r ch=5 read=100 sampleid=s",
        "runid=r ch=5 read=110 sampleid=s",   # same channel, close read
        "runid=r ch=5 read=500 sampleid=s",   # same channel, far read
        "runid=r ch=6 read=105 sampleid=s",   # different channel
        "",                                     # no metadata
    ]
    cands = make_cands([(0, 1), (0, 2), (0, 3), (0, 4)])
    out = suppress_alignment_candidates(meta, cands, delta=30)
    kept = list(zip(out.read_id0, out.read_id1))
    assert (0, 1) not in kept       # suppressed: |100-110| < 30
    assert (0, 2) in kept            # far read number
    assert (0, 3) in kept            # different channel
    assert (0, 4) in kept            # missing metadata


def test_candidate_table():
    cands = make_cands([(0, 1), (0, 2), (1, 2)])
    offsets, cids = candidate_table(cands, n_reads=3)
    assert np.array_equal(np.diff(offsets), [2, 2, 2])
    assert set(cids[offsets[0]:offsets[1]]) == {0, 1}
    assert set(cids[offsets[2]:offsets[3]]) == {1, 2}
