"""Sharded LowHash candidate generation == host implementation."""

import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_sharded_candidates_match_host():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    from shasta_tpu.data import bases as B
    from shasta_tpu.data.kmers import select_kmers_random
    from shasta_tpu.data.markers import find_markers
    from shasta_tpu.data.reads import build_read_store
    from shasta_tpu.io.fasta import parse_fasta_bytes
    from shasta_tpu.ops import lowhash as LH
    from shasta_tpu.parallel.mesh import make_mesh, sharded_find_candidates

    from tests import synth

    genome = synth.random_genome(20000, seed=61)
    reads = synth.sample_reads(genome, 80, 3000, seed=62, both_strands=True)
    fasta = b"".join(
        b">r%d\n%s\n" % (i, B.decode_to_str(r).encode())
        for i, r in enumerate(reads)
    )
    store = build_read_store(parse_fasta_bytes(fasta))
    kt = select_kmers_random(8, 0.1, seed=231)
    markers = find_markers(store, kt)
    params = LH.LowHashParams(
        m=4, hash_fraction=0.05, iteration_count=4, min_frequency=2,
        max_bucket_size=60,
    )
    host = LH.find_candidates_lowhash(markers, params)

    mesh = make_mesh(8)
    sharded = sharded_find_candidates(mesh, markers, params)

    assert sharded.count == host.count
    # Same pair set with same frequencies (order may differ; sort both).
    def key(c):
        return np.lexsort((c.same_strand, c.read_id1, c.read_id0))

    kh, ks = key(host), key(sharded)
    assert np.array_equal(host.read_id0[kh], sharded.read_id0[ks])
    assert np.array_equal(host.read_id1[kh], sharded.read_id1[ks])
    assert np.array_equal(host.same_strand[kh], sharded.same_strand[ks])
    assert np.array_equal(host.frequency[kh], sharded.frequency[ks])


@pytest.mark.slow
def test_sharded_union_find_matches_host():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    import numpy as np

    from shasta_tpu.graph.marker_graph import union_find_labels
    from shasta_tpu.parallel.mesh import make_mesh, sharded_union_find

    rng = np.random.default_rng(3)
    n = 4096
    e = 8192  # divisible by 8
    u = rng.integers(0, n, e).astype(np.int32)
    v = rng.integers(0, n, e).astype(np.int32)
    host = union_find_labels(n, u, v)

    mesh = make_mesh(8)
    dev = np.asarray(sharded_union_find(mesh, n, u, v, n_rounds=24))
    assert np.array_equal(dev, host)


@pytest.mark.slow
def test_sharded_banded_forward_matches_host():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    import numpy as np

    from shasta_tpu.ops.align import banded_forward
    from shasta_tpu.parallel.mesh import make_mesh, sharded_banded_forward

    rng = np.random.default_rng(4)
    B, LA, LB, W = 16, 64, 64, 32
    a = rng.integers(0, 50, (B, LA)).astype(np.int32)
    b = a.copy()  # self-alignments give nontrivial scores
    a_len = np.full(B, LA, np.int32)
    b_len = np.full(B, LB, np.int32)
    band_min = np.full(B, -W // 2, np.int32)

    _, hbi, hbd, hbv = banded_forward(
        a, a_len, b, b_len, band_min, W=W, match=6, mismatch=-1, gap=-1
    )
    mesh = make_mesh(8)
    dbi, dbd, dbv = sharded_banded_forward(
        mesh, a, a_len, b, b_len, band_min, W=W
    )
    assert np.array_equal(np.asarray(dbv), np.asarray(hbv))
    assert np.array_equal(np.asarray(dbi), np.asarray(hbi))
    assert np.array_equal(np.asarray(dbd), np.asarray(hbd))
