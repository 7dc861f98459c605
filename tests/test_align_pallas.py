"""Pallas banded-alignment kernel vs the jnp reference (interpret mode)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import shasta_tpu.ops.align as A
import shasta_tpu.ops.align_pallas as AP


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        AP.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    AP.banded_align_pairs.clear_cache()
    yield
    AP.banded_align_pairs.clear_cache()


def make_batch(seed, B=8, LA=128, LB=128, W=128, alpha=50):
    rng = np.random.default_rng(seed)
    a = np.full((B, LA), -1, np.int32)
    b = np.full((B, LB), -2, np.int32)
    a_len = np.zeros(B, np.int32)
    b_len = np.zeros(B, np.int32)
    bm = np.zeros(B, np.int32)
    for t in range(B):
        g = rng.integers(0, alpha, 400).astype(np.int32)
        la = int(rng.integers(20, LA))
        lb = int(rng.integers(20, LB))
        sa = int(rng.integers(0, 100))
        sb = max(0, sa + int(rng.integers(-20, 20)))
        a[t, :la] = g[sa : sa + la]
        b[t, :lb] = g[sb : sb + lb]
        a_len[t] = la
        b_len[t] = lb
        bm[t] = -W // 2
    return a, a_len, b, b_len, bm


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_jnp_kernel(seed):
    LA = LB = W = 128
    a, a_len, b, b_len, bm = make_batch(seed, LA=LA, LB=LB, W=W)
    fused = AP.banded_align_pairs(
        jnp.asarray(a),
        jnp.asarray(a_len),
        jnp.asarray(b),
        jnp.asarray(b_len),
        jnp.asarray(bm),
        LA=LA,
        LB=LB,
        W=W,
        match=6,
        mismatch=-1,
        gap=-1,
    )
    dirs, bi, bd, bv = A.banded_forward(
        a, a_len, b, b_len, bm, W=W, match=6, mismatch=-1, gap=-1
    )
    m0r, m1r = A.traceback(dirs, a, b, bm, bi, bd, n_steps=LA + LB)
    fused = np.asarray(fused)
    metrics = fused[:, :16]
    mjrows = fused[:, 16:]
    bestp = metrics[:, 9]
    m0r, m1r, bv = map(np.asarray, (m0r, m1r, bv))
    for t in range(a.shape[0]):
        count = metrics[t, 0]
        o0 = np.flatnonzero(mjrows[t] >= 0)
        o1 = mjrows[t, o0]
        assert o0.shape[0] == count
        pp = list(zip(o0, o1))
        rr = list(zip(m0r[m0r[:, t] >= 0, t][::-1], m1r[m1r[:, t] >= 0, t][::-1]))
        assert pp == rr, t
        assert bestp[t] == bv[t], t
        # Metrics agree with the host metric computation.
        if count:
            ms, md, omin, omax = A._metrics_from_ordinals(
                o0.astype(np.uint32), o1.astype(np.uint32)
            )
            assert metrics[t, 1] == o0[0] and metrics[t, 2] == o0[-1]
            assert metrics[t, 3] == o1[0] and metrics[t, 4] == o1[-1]
            assert metrics[t, 5] == omin and metrics[t, 6] == omax
            assert metrics[t, 7] == ms and metrics[t, 8] == md
            assert metrics[t, 9] == bestp[t]


@pytest.mark.parametrize("seed", [0, 3])
def test_waves_kernel_matches_default(seed):
    """The interleaved-row-wave kernel variant (_kernel_waves,
    VERDICT r4 item 4's latency-hiding A/B) is bit-identical to the
    default kernel on the same batch."""
    LA = LB = W = 128
    a, a_len, b, b_len, bm = make_batch(seed, B=12, LA=LA, LB=LB, W=W)
    kw = dict(LA=LA, LB=LB, W=W, match=6, mismatch=-1, gap=-1)
    args = [jnp.asarray(x) for x in (a, a_len, b, b_len, bm)]
    ref = np.asarray(AP.banded_align_pairs(*args, **kw, waves=1))
    two = np.asarray(AP.banded_align_pairs(*args, **kw, waves=2))
    assert np.array_equal(ref, two)
    four = np.asarray(AP.banded_align_pairs(*args, **kw, waves=4))
    assert np.array_equal(ref, four)


def test_edge_cases_match_jnp_kernel():
    # Empty pairs, length-1 sequences, bands hugging the clamp limits,
    # and a full-batch pad block all in one batch.
    B, LA, LB, W = 8, 128, 128, 128
    rng = np.random.default_rng(9)
    a = np.full((B, LA), -1, np.int32)
    b = np.full((B, LB), -2, np.int32)
    a_len = np.zeros(B, np.int32)
    b_len = np.zeros(B, np.int32)
    bm = np.zeros(B, np.int32)

    g = rng.integers(0, 30, 300).astype(np.int32)
    # 0: empty a.
    b[0, :50] = g[:50]; b_len[0] = 50
    # 1: empty b.
    a[1, :50] = g[:50]; a_len[1] = 50
    # 2: single markers, matching.
    a[2, 0] = 7; b[2, 0] = 7; a_len[2] = 1; b_len[2] = 1
    # 3: band clamped at the left limit.
    a[3, :60] = g[:60]; b[3, :60] = g[:60]
    a_len[3] = 60; b_len[3] = 60; bm[3] = -(LA + W)
    # 4: band at the right limit.
    a[4, :60] = g[:60]; b[4, :60] = g[:60]
    a_len[4] = 60; b_len[4] = 60; bm[4] = LB
    # 5: identical max-length sequences.
    a[5] = g[:LA]; b[5] = g[:LA]; a_len[5] = LA; b_len[5] = LB
    # 6-7: left as fully empty padding.

    fused = np.asarray(
        AP.banded_align_pairs(
            a, a_len, b, b_len, bm, LA=LA, LB=LB, W=W,
            match=6, mismatch=-1, gap=-1,
        )
    )
    # Empty inputs, clamped bands, and padding produce no matches.
    for t in (0, 1, 3, 4, 6, 7):
        assert fused[t, 0] == 0, t
    # The single matching marker aligns.
    assert fused[2, 0] == 1
    assert fused[2, 16] == 0  # ordinal1 of the single match
    # Identical sequences align completely.
    assert fused[5, 0] == LA
    assert np.array_equal(fused[5, 16:16 + LA], np.arange(LA))


def test_take_entry_matches_padded_entry():
    """banded_align_pairs_take (device-side whole-row takes from the
    per-length-class matrices) must produce the same fused output as
    banded_align_pairs on the gathered rows, including partial batches
    (n_real < padded B)."""
    from shasta_tpu.ops.align import _DeviceCsr, _bucket_vec, _LEN_BUCKETS

    LA = LB = W = 128
    a, a_len, b, b_len, bm = make_batch(7, B=6, LA=LA, LB=LB, W=W)
    # Build a CSR holding all 12 rows: a rows then b rows.
    rows = [a[t, : a_len[t]] for t in range(6)] + [
        b[t, : b_len[t]] for t in range(6)
    ]
    lens = np.array([r.shape[0] for r in rows], np.int32)
    off = np.zeros(lens.shape[0] + 1, np.int32)
    np.cumsum(lens, out=off[1:])
    flat = np.concatenate(rows).astype(np.int32)
    ia = np.arange(6, dtype=np.int64)
    ib = np.arange(6, 12, dtype=np.int64)

    ref = np.asarray(
        AP.banded_align_pairs(
            a, a_len, b, b_len, bm, LA=LA, LB=LB, W=W,
            match=6, mismatch=-1, gap=-1,
        )
    )
    dev = _DeviceCsr(flat, off, lens)
    # Every row's class must be the batch's length bucket.
    assert (_bucket_vec(lens.astype(np.int64), _LEN_BUCKETS) == LA).all()
    # Pad the id arrays past the live count, like _dispatch_csr does.
    pad = 2
    ia_p = np.concatenate([ia, np.zeros(pad, np.int64)])
    ib_p = np.concatenate([ib, np.zeros(pad, np.int64)])
    bm_p = np.concatenate([bm, np.zeros(pad, np.int32)])
    rowa = dev.local[ia_p].astype(np.int32)
    rowb = dev.local[ib_p].astype(np.int32)
    al_p = dev.lens[ia_p].astype(np.int32)
    bl_p = dev.lens[ib_p].astype(np.int32)
    al_p[6:] = 0
    bl_p[6:] = 0
    got = np.asarray(
        AP.banded_align_pairs_take(
            dev.matrix(LA), rowa, dev.matrix(LB), rowb,
            al_p, bl_p, bm_p, np.int32(6),
            LA=LA, LB=LB, W=W, match=6, mismatch=-1, gap=-1,
        )
    )
    assert np.array_equal(got[:6], ref)
    # Padded rows beyond n_real are empty.
    assert (got[6:, 0] == 0).all()


@pytest.mark.parametrize("W", [128, 288])
def test_band_take_matches_host_mapping(W):
    """banded_align_band_take (on-device band reduction, phase 1) must
    report the same per-pair match count and min/max original-ordinal
    offset as the host mapping over the fused kernel output — for both
    the packed (W<=254) and unpacked kernel output paths."""
    from shasta_tpu.ops.align import _DeviceCsr, _bucket_vec, _LEN_BUCKETS

    LA = LB = 128
    a, a_len, b, b_len, bm = make_batch(3, B=6, LA=LA, LB=LB, W=W)
    rows = [a[t, : a_len[t]] for t in range(6)] + [
        b[t, : b_len[t]] for t in range(6)
    ]
    lens = np.array([r.shape[0] for r in rows], np.int32)
    off = np.zeros(lens.shape[0] + 1, np.int32)
    np.cumsum(lens, out=off[1:])
    flat = np.concatenate(rows).astype(np.int32)
    # Original-ordinal map per row: strictly increasing, like the
    # downsampled-marker -> ordinal map in align_candidates.
    rng = np.random.default_rng(5)
    ords = [
        np.sort(
            rng.choice(4 * int(n), size=int(n), replace=False)
        ).astype(np.int32)
        for n in lens
    ]
    aux = np.concatenate(ords)

    dev = _DeviceCsr(flat, off, lens, aux=aux)
    assert (_bucket_vec(lens.astype(np.int64), _LEN_BUCKETS) == LA).all()
    ia = np.arange(6, dtype=np.int64)
    ib = np.arange(6, 12, dtype=np.int64)
    pad = 2
    ia_p = np.concatenate([ia, np.zeros(pad, np.int64)])
    ib_p = np.concatenate([ib, np.zeros(pad, np.int64)])
    bm_p = np.concatenate([bm, np.zeros(pad, np.int32)])
    rowa = dev.local[ia_p].astype(np.int32)
    rowb = dev.local[ib_p].astype(np.int32)
    al_p = dev.lens[ia_p].astype(np.int32)
    bl_p = dev.lens[ib_p].astype(np.int32)
    al_p[6:] = 0
    bl_p[6:] = 0

    AP._band_take_jit.clear_cache()
    try:
        got = np.asarray(
            AP.banded_align_band_take(
                dev.matrix(LA), rowa, dev.aux_matrix(LA),
                dev.matrix(LB), rowb, dev.aux_matrix(LB),
                al_p, bl_p, bm_p, np.int32(6),
                LA=LA, LB=LB, W=W, match=6, mismatch=-1, gap=-1,
            )
        )
    finally:
        AP._band_take_jit.clear_cache()

    fused = np.asarray(
        AP.banded_align_pairs(
            a, a_len, b, b_len, bm, LA=LA, LB=LB, W=W,
            match=6, mismatch=-1, gap=-1,
        )
    )
    for t in range(6):
        o0 = np.flatnonzero(fused[t, 16:] >= 0)
        o1 = fused[t, 16 + o0]
        assert got[t, 0] == o0.shape[0], t
        if o0.shape[0]:
            offv = ords[t][o0].astype(np.int64) - ords[6 + t][o1]
            assert got[t, 1] == offv.min(), t
            assert got[t, 2] == offv.max(), t
    assert (got[6:, 0] == 0).all()


def test_csr_bucket_grid():
    from shasta_tpu.ops.align import _csr_bucket

    assert _csr_bucket(0) == 1024
    assert _csr_bucket(1024) == 1024
    assert _csr_bucket(1025) == 1280
    for n in (1500, 3_804_034, 10_000_001, 123_456_789):
        v = _csr_bucket(n)
        assert v >= n
        assert v <= n * 1.25 + 1
        # Idempotent: grid values map to themselves.
        assert _csr_bucket(v) == v


def test_chunked_kernel_matches_monolithic():
    """_invoke_chunked (dirs streamed to HBM + reverse-walk traceback,
    used when the monolithic kernel's dirs scratch exceeds VMEM, e.g.
    ultra-long reads at LA >= 4096) must produce output identical to
    _invoke on the same prepared inputs."""
    import jax.numpy as jnp

    LA = LB = 512
    W = 128
    B = 64
    rng = np.random.default_rng(5)
    a = np.full((B, LA), -1, np.int32)
    b = np.full((B, LB), -2, np.int32)
    a_len = np.zeros(B, np.int32)
    b_len = np.zeros(B, np.int32)
    bm = np.full(B, -W // 2, np.int32)
    for t in range(B):
        g = rng.integers(0, 50, LB + 150).astype(np.int32)
        la = int(rng.integers(20, LA))
        lb = int(rng.integers(20, LB))
        sb = int(rng.integers(0, 60))
        a[t, :la] = g[:la]
        b[t, :lb] = g[sb : sb + lb]
        a_len[t], b_len[t] = la, lb
    kw = dict(LA=LA, LB=LB, W=W, match=6, mismatch=-1, gap=-1)

    LEFTPAD, R, LBP, LAP = AP._geometry(LA, LB, W)
    band_min = np.clip(bm, -LEFTPAD, LB).astype(np.int32)
    b_pad = AP._band_normalize(jnp.asarray(b), jnp.asarray(band_min), LA=LA, LB=LB, W=W)
    a_pad = jnp.concatenate(
        [jnp.asarray(a), jnp.full((B, LAP - LA), -1, jnp.int32)], axis=1
    )
    args = (a_pad, b_pad, jnp.asarray(a_len), jnp.asarray(b_len),
            jnp.asarray(band_min), B)

    ref = np.asarray(AP._invoke(*args, 32, **kw))
    got = np.asarray(AP._invoke_chunked(*args, 32, **kw))
    assert np.array_equal(ref, got)

    # And the packed-u8 output path.
    rm, rp = (np.asarray(x) for x in AP._invoke(*args, 32, **kw, pack_u8=True))
    gm, gp = (np.asarray(x) for x in AP._invoke_chunked(*args, 32, **kw, pack_u8=True))
    assert np.array_equal(rm, gm) and np.array_equal(rp, gp)


def test_chunked_kernel_wide_band():
    """Chunked path at W > 128 (phase-1 shapes route here when the
    monolithic dirs scratch exceeds VMEM): window refills must stay
    inside the b block (regression: refill geometry assumed
    min(W, LA))."""
    import jax.numpy as jnp

    LA = LB = 512
    W = 512
    B = 64
    rng = np.random.default_rng(6)
    a = np.full((B, LA), -1, np.int32)
    b = np.full((B, LB), -2, np.int32)
    a_len = np.zeros(B, np.int32)
    b_len = np.zeros(B, np.int32)
    bm = np.full(B, -W // 2, np.int32)
    for t in range(B):
        g = rng.integers(0, 50, LB + 300).astype(np.int32)
        la = int(rng.integers(20, LA))
        lb = int(rng.integers(20, LB))
        sb = int(rng.integers(0, 200))
        a[t, :la] = g[:la]
        b[t, :lb] = g[sb : sb + lb]
        a_len[t], b_len[t] = la, lb
    kw = dict(LA=LA, LB=LB, W=W, match=6, mismatch=-1, gap=-1)
    LEFTPAD, R, LBP, LAP = AP._geometry(LA, LB, W)
    band_min = np.clip(bm, -LEFTPAD, LB).astype(np.int32)
    b_pad = AP._band_normalize(jnp.asarray(b), jnp.asarray(band_min), LA=LA, LB=LB, W=W)
    a_pad = jnp.concatenate(
        [jnp.asarray(a), jnp.full((B, LAP - LA), -1, jnp.int32)], axis=1
    )
    args = (a_pad, b_pad, jnp.asarray(a_len), jnp.asarray(b_len),
            jnp.asarray(band_min), B)
    ref = np.asarray(AP._invoke(*args, 16, **kw))
    got = np.asarray(AP._invoke_chunked(*args, 32, **kw))
    assert np.array_equal(ref, got)


def test_chunked_selected_for_oversized_shapes():
    """LA >= 8192 routes to the chunked kernel (the monolithic dirs
    scratch leaves too little VMEM headroom there — measured on
    hardware); both UL shapes stay supported."""
    assert AP._block_pairs(8192, 128) == 0
    assert AP._block_pairs(4096, 128) >= 16
    assert AP._chunked_block_pairs(8192, 8192, 512) >= 32
    assert AP._chunked_block_pairs(32768, 32768, 128) >= 16
    assert AP.supported(8192, 128)
    assert AP.supported(32768, 128)


def test_mesh_take_feed_matches_single_device():
    """The meshed take-feed (class matrices replicated over the mesh,
    pairs sharded — parallel/mesh.py sharded_align_take /
    sharded_band_take) must produce output identical to the
    single-device take entries, so a multi-chip mesh keeps the fast
    device-side batch construction (VERDICT r2 item 2)."""
    from shasta_tpu.ops.align import _DeviceCsr, _bucket_vec, _LEN_BUCKETS
    from shasta_tpu.parallel import mesh as M

    mesh = M.make_mesh()  # the 8 virtual CPU devices
    assert mesh.devices.size == 8

    LA = LB = W = 128
    a, a_len, b, b_len, bm = make_batch(9, B=6, LA=LA, LB=LB, W=W)
    rows = [a[t, : a_len[t]] for t in range(6)] + [
        b[t, : b_len[t]] for t in range(6)
    ]
    lens = np.array([r.shape[0] for r in rows], np.int32)
    off = np.zeros(lens.shape[0] + 1, np.int32)
    np.cumsum(lens, out=off[1:])
    flat = np.concatenate(rows).astype(np.int32)
    rng = np.random.default_rng(13)
    ords = [
        np.sort(rng.choice(4 * int(n), size=int(n), replace=False)).astype(
            np.int32
        )
        for n in lens
    ]
    aux = np.concatenate(ords)

    dev = _DeviceCsr(flat, off, lens, aux=aux)
    dev_m = _DeviceCsr(flat, off, lens, aux=aux, mesh=mesh)
    assert dev_m.mesh is mesh
    assert (_bucket_vec(lens.astype(np.int64), _LEN_BUCKETS) == LA).all()

    # 6 live pairs padded to 8 (divisible by the mesh).
    ia_p = np.concatenate([np.arange(6), np.zeros(2)]).astype(np.int64)
    ib_p = np.concatenate([np.arange(6, 12), np.zeros(2)]).astype(np.int64)
    bm_p = np.concatenate([bm, np.zeros(2, np.int32)])
    rowa = dev.local[ia_p].astype(np.int32)
    rowb = dev.local[ib_p].astype(np.int32)
    al_p = dev.lens[ia_p].astype(np.int32)
    bl_p = dev.lens[ib_p].astype(np.int32)
    al_p[6:] = 0
    bl_p[6:] = 0

    M._align_take_fn.cache_clear()
    M._band_take_fn.cache_clear()
    AP._band_take_jit.clear_cache()
    try:
        for pack in (False, True):
            ref = AP.banded_align_pairs_take(
                dev.matrix(LA), rowa, dev.matrix(LB), rowb,
                al_p, bl_p, bm_p, np.int32(6),
                LA=LA, LB=LB, W=W, match=6, mismatch=-1, gap=-1,
                pack_u8=pack,
            )
            got = M.sharded_align_take(
                mesh, dev_m.matrix(LA), rowa, dev_m.matrix(LB), rowb,
                al_p, bl_p, bm_p,
                LA=LA, LB=LB, W=W, match=6, mismatch=-1, gap=-1,
                pack_u8=pack,
            )
            if pack:
                assert np.array_equal(np.asarray(got[0]), np.asarray(ref[0]))
                assert np.array_equal(np.asarray(got[1]), np.asarray(ref[1]))
            else:
                assert np.array_equal(np.asarray(got), np.asarray(ref))

        band_ref = np.asarray(
            AP.banded_align_band_take(
                dev.matrix(LA), rowa, dev.aux_matrix(LA),
                dev.matrix(LB), rowb, dev.aux_matrix(LB),
                al_p, bl_p, bm_p, np.int32(6),
                LA=LA, LB=LB, W=W, match=6, mismatch=-1, gap=-1,
            )
        )
        band_got = np.asarray(
            M.sharded_band_take(
                mesh, dev_m.matrix(LA), rowa, dev_m.aux_matrix(LA),
                dev_m.matrix(LB), rowb, dev_m.aux_matrix(LB),
                al_p, bl_p, bm_p,
                LA=LA, LB=LB, W=W, match=6, mismatch=-1, gap=-1,
            )
        )
        assert np.array_equal(band_got, band_ref)
    finally:
        M._align_take_fn.cache_clear()
        M._band_take_fn.cache_clear()
        AP._band_take_jit.clear_cache()


def test_align_candidates_pallas_matches_jnp(monkeypatch):
    """align_candidates under the full pallas path — device take-feed,
    fused band discovery, packed ph2 output, and the device-side
    filtered match compaction (collect_filtered/_compact_kept) — must
    produce an AlignmentStore identical to the jnp fallback path."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import synth

    from shasta_tpu.io.fasta import parse_fasta_bytes
    from shasta_tpu.data import bases as B
    from shasta_tpu.data.reads import build_read_store
    from shasta_tpu.data.kmers import select_kmers_random
    from shasta_tpu.data.markers import find_markers
    from shasta_tpu.ops import lowhash as LH
    from shasta_tpu.ops.align import AlignParams, align_candidates

    genome = synth.random_genome(6000, seed=17)
    reads = synth.sample_reads(
        genome, 14, 1700, seed=18, error_rate=0.01, both_strands=True
    )
    fasta = b"".join(
        b">r%d\n%s\n" % (i, B.decode_to_str(r).encode())
        for i, r in enumerate(reads)
    )
    store = build_read_store(parse_fasta_bytes(fasta), min_read_length=500)
    kt = select_kmers_random(10, 0.1, seed=231)
    markers = find_markers(store, kt)
    cand = LH.find_candidates_lowhash(
        markers,
        LH.LowHashParams(
            m=3, hash_fraction=0.05, iteration_count=10, min_frequency=2,
            max_bucket_size=60,
        ),
    )
    assert cand.count > 3
    params = AlignParams(
        min_aligned_marker_count=12, max_skip=60, max_drift=60, max_trim=60
    )
    args = (markers, cand.read_id0, cand.read_id1, cand.same_strand, params,
            kt.downsampling_hash_table())
    ref = align_candidates(*args)

    monkeypatch.setattr(A, "_PALLAS_ENV", "1")
    A._pallas_available.cache_clear()
    try:
        got = align_candidates(*args)
    finally:
        A._pallas_available.cache_clear()

    # Filtering must actually bite for the compaction test to mean
    # anything: some candidates kept, some dropped.
    assert 0 < ref.count < cand.count
    for k, v in ref.arrays().items():
        assert np.array_equal(v, got.arrays()[k]), k


def test_chunked_kernel_ultrawide_band():
    """Chunked path at W = 1024 (now permitted for UL shapes whose
    monolithic block would overflow Mosaic's stack): equality with the
    monolithic kernel at BB=8."""
    import jax.numpy as jnp

    LA = LB = 256
    W = 1024
    B = 16
    rng = np.random.default_rng(8)
    a = np.full((B, LA), -1, np.int32)
    b = np.full((B, LB), -2, np.int32)
    a_len = np.zeros(B, np.int32)
    b_len = np.zeros(B, np.int32)
    bm = np.full(B, -W // 2, np.int32)
    for t in range(B):
        g = rng.integers(0, 50, LB + 400).astype(np.int32)
        la = int(rng.integers(20, LA))
        lb = int(rng.integers(20, LB))
        sb = int(rng.integers(0, 300))
        a[t, :la] = g[:la]
        b[t, :lb] = g[sb : sb + lb]
        a_len[t], b_len[t] = la, lb
    kw = dict(LA=LA, LB=LB, W=W, match=6, mismatch=-1, gap=-1)
    LEFTPAD, R, LBP, LAP = AP._geometry(LA, LB, W)
    band_min = np.clip(bm, -LEFTPAD, LB).astype(np.int32)
    b_pad = AP._band_normalize(
        jnp.asarray(b), jnp.asarray(band_min), LA=LA, LB=LB, W=W
    )
    a_pad = jnp.concatenate(
        [jnp.asarray(a), jnp.full((B, LAP - LA), -1, jnp.int32)], axis=1
    )
    args = (a_pad, b_pad, jnp.asarray(a_len), jnp.asarray(b_len),
            jnp.asarray(band_min), B)
    ref = np.asarray(AP._invoke(*args, 8, **kw))
    got = np.asarray(AP._invoke_chunked(*args, 8, **kw))
    assert np.array_equal(ref, got)
