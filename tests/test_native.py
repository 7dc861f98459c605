"""Native C++ components vs Python implementations: exact equality."""

import os

import numpy as np
import pytest

from shasta_tpu import native
from shasta_tpu.data import bases as B
from shasta_tpu.data import rle as R
from shasta_tpu.io.fasta import parse_fasta_bytes

from tests import synth

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_builds():
    assert native.available()


def test_fasta_parse_matches_python():
    reads = [synth.random_genome(997, seed=i) for i in range(7)]
    fasta = b"".join(
        b">read-%d some meta here\n%s\n" % (i, B.decode_to_str(r).encode())
        for i, r in enumerate(reads)
    )
    # Multi-line sequences too.
    fasta += b">wrapped x\nACGT\nACGT\nACG\n"
    ref = parse_fasta_bytes(fasta)
    res = native.parse_fasta_native(fasta)
    codes, offsets, names, metadata = res
    assert names == ref.names
    assert metadata == ref.metadata
    assert np.array_equal(offsets, ref.offsets)
    ref_codes = B.encode_ascii(ref.seq_ascii)
    assert np.array_equal(codes, ref_codes)


def test_rle_matches_python():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 5000).astype(np.uint8)
    # create runs
    codes[100:140] = 2
    offsets = np.array([0, 2000, 2000, 5000], np.int64)  # incl. empty seq
    rle, counts, rle_offsets = native.rle_encode_native(codes, offsets)
    ref_rle, ref_counts, ref_off = R.rle_encode_flat(codes, offsets)
    assert np.array_equal(rle, ref_rle)
    assert np.array_equal(counts, ref_counts.astype(np.int64))
    assert np.array_equal(rle_offsets, ref_off)


def test_rle_store_matches_python():
    """Native uint8-count store encoder == numpy fallback, including
    long-run (>255) detection and count clipping."""
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 6000).astype(np.uint8)
    codes[300:900] = 3  # 600-long run -> long-run read
    codes[4000:4100] = 1  # 100-long run, below the limit
    offsets = np.array([0, 2000, 2000, 3500, 6000], np.int64)
    got = native.rle_encode_store_native(codes, offsets)
    assert got is not None
    rle, counts, rle_offsets, bad = got
    # Reference: the numpy path (n < 1<<20 stays in numpy).
    ref_rle, ref_counts, ref_off = R.rle_encode_flat(codes, offsets)
    assert np.array_equal(rle, ref_rle)
    assert np.array_equal(
        counts, np.minimum(ref_counts, R.MAX_RUN_LENGTH).astype(np.uint8)
    )
    assert np.array_equal(rle_offsets, ref_off)
    assert counts.dtype == np.uint8
    assert np.array_equal(bad, [True, False, False, False])


def test_chimera_native_matches_python(monkeypatch):
    from tests.test_read_graph import make_alignments
    from shasta_tpu.graph import read_graph as RG

    rows = []
    for a in range(4):
        for b in range(a + 1, 4):
            rows.append((a, b, True, 50))
    for a in range(4, 8):
        for b in range(a + 1, 8):
            rows.append((a, b, True, 50))
    rows.append((0, 8, True, 50))
    rows.append((4, 8, True, 50))
    al = make_alignments(rows)
    g, _ = RG.create_read_graph(al, n_reads=9, max_alignment_count=10)

    nat = RG.flag_chimeric_reads(g, n_reads=9, max_distance=2)
    # Force the python path.
    monkeypatch.setattr(native, "flag_chimeric_native", lambda *a, **k: None)
    py = RG.flag_chimeric_reads(g, n_reads=9, max_distance=2)
    assert np.array_equal(nat, py)
    assert nat[8] and not nat[:8].any()


def test_transitive_reduction_native_matches_python(monkeypatch):
    from tests.test_marker_graph import full_pipeline_to_marker_graph
    from shasta_tpu.graph import marker_graph as MG
    import copy

    store, markers, mg = full_pipeline_to_marker_graph()
    mg2 = MG.MarkerGraph.from_arrays(
        {k: np.copy(v) for k, v in mg.arrays().items()}
    )
    mg2.build_adjacency()

    MG.transitive_reduction(mg, low_coverage_threshold=1, max_distance=30)
    monkeypatch.setattr(
        native, "transitive_reduction_bfs_native", lambda *a, **k: False
    )
    MG.transitive_reduction(mg2, low_coverage_threshold=1, max_distance=30)
    assert np.array_equal(mg.removed_tr, mg2.removed_tr)


def test_near_strand_jump_matches_python():
    import numpy as np

    from shasta_tpu import native
    from shasta_tpu.graph import read_graph as RG
    from shasta_tpu.graph.read_graph import _shortest_path_exists
    from tests.test_read_graph import make_alignments

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    n_reads = 40
    rows = []
    for _ in range(120):
        a, b = rng.choice(n_reads, 2, replace=False)
        rows.append((min(a, b), max(a, b), bool(rng.integers(0, 2)), 50))
    al = make_alignments(rows)
    g = RG.build_read_graph(al, n_reads, np.ones(len(rows), bool))

    for d in (1, 2, 3):
        got = native.near_strand_jump_native(g, n_reads, d)
        want = np.zeros(2 * n_reads, bool)
        for r in range(n_reads):
            if _shortest_path_exists(g, 2 * r, 2 * r + 1, d):
                want[2 * r] = want[2 * r + 1] = True
        assert np.array_equal(got, want), d


def test_murmur64_native_matches_numpy():
    """The native threaded MurmurHash64A is bit-identical to the numpy
    reference (which is tested against published vectors)."""
    from shasta_tpu import native
    from shasta_tpu.ops import hashing

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(4)
    for m in (1, 2, 3, 4, 7):
        feats = rng.integers(0, 2**32, (50_000, m), dtype=np.uint32)
        want = hashing.murmur64_features(feats[:100], 0xABCDEF)
        got = native.murmur64_features_native(feats[:100], 0xABCDEF)
        assert np.array_equal(want, got)
        # Large-n path (the threaded branch inside murmur64_features).
        via_dispatch = hashing.murmur64_features(feats, 7)
        direct = native.murmur64_features_native(feats, 7)
        assert np.array_equal(via_dispatch, direct)


def test_find_markers_native_matches_numpy():
    """The fused native marker scan equals the numpy path (both
    strands, positions, CSR offsets), including short reads."""
    from shasta_tpu import native
    from shasta_tpu.data.kmers import select_kmers_random
    from shasta_tpu.data.markers import MarkerStore, find_markers
    from shasta_tpu.data.reads import ReadStore

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(12)
    k = 8
    kt = select_kmers_random(k, 0.15, seed=231)
    lens = [0, 3, k - 1, k, 57, 200, 1000, 5]
    flat = rng.integers(0, 4, sum(lens)).astype(np.uint8)
    offsets = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    reads = ReadStore(
        rle_bases=flat,
        repeat_counts=np.ones(flat.shape[0], np.int32),
        offsets=offsets,
        raw_lengths=np.asarray(lens, np.int64),
        is_palindromic=np.zeros(len(lens), bool),
        is_chimeric=np.zeros(len(lens), bool),
    )
    ref = find_markers(reads, kt)  # small input -> numpy path
    got = native.find_markers_native(flat, offsets, k, kt.is_marker)
    assert got is not None
    moff, kmer_ids, positions = got
    assert np.array_equal(moff, ref.offsets)
    assert np.array_equal(kmer_ids, ref.kmer_ids)
    assert np.array_equal(positions, ref.positions)


def test_palindrome_keys_native_matches_numpy():
    """Native palindrome pre-filter keys equal the numpy fallback as a
    sorted multiset."""
    from shasta_tpu import native
    from shasta_tpu.ops.palindrome import _prefilter_keys_numpy
    from shasta_tpu.data.markers import MarkerStore

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(21)
    k = 8
    n_reads = 20
    counts0 = rng.integers(0, 80, n_reads).astype(np.int64)
    counts2 = np.repeat(counts0, 2)
    koff = np.zeros(2 * n_reads + 1, np.int64)
    np.cumsum(counts2, out=koff[1:])
    kmer_ids = rng.integers(0, 4**k, koff[-1], dtype=np.uint32)
    ms = MarkerStore(
        k=k, kmer_ids=kmer_ids,
        positions=np.zeros(koff[-1], np.uint32), offsets=koff,
    )
    n_pos0 = int(counts0.sum())
    d = 7
    max_bucket = int(counts0.max()) // d + 2
    bucket_bits = int(max_bucket).bit_length() + 1
    KH_BITS = 22
    cum0_full = np.zeros(n_reads + 1, np.int64)
    np.cumsum(counts0, out=cum0_full[1:])
    got = native.palindrome_keys_native(
        kmer_ids, koff, cum0_full, n_reads, k, d, max_bucket,
        KH_BITS, 1 + KH_BITS, 1 + KH_BITS + bucket_bits, n_pos0,
    )
    assert got is not None
    want = _prefilter_keys_numpy(
        ms, koff, counts0, n_reads, 2 * n_reads, n_pos0, d,
        max_bucket, KH_BITS, bucket_bits,
    )
    assert np.array_equal(np.sort(got), np.sort(want))


def test_palindrome_scan_native_matches_numpy():
    from shasta_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(30)
    SH_R = 10
    n_reads = 6
    reads = rng.integers(0, n_reads, 5000).astype(np.uint64)
    groups = rng.integers(0, 40, 5000).astype(np.uint64)
    sides = rng.integers(0, 2, 5000).astype(np.uint64)
    keys = (reads << np.uint64(SH_R)) | (groups << np.uint64(1)) | sides
    keys.sort()
    got = native.palindrome_scan_native(keys, SH_R, n_reads)
    # numpy reference
    vals = keys >> np.uint64(1)
    bits = keys & np.uint64(1)
    new_grp = np.empty(vals.shape[0], bool)
    new_grp[0] = True
    new_grp[1:] = vals[1:] != vals[:-1]
    bounds = np.flatnonzero(new_grp)
    tot = np.diff(np.append(bounds, vals.shape[0]))
    n_b = np.add.reduceat(bits, bounds).astype(np.int64)
    n_a = tot - n_b
    g_read = (vals[bounds] >> np.uint64(SH_R - 1)).astype(np.int64)
    want = np.bincount(g_read, weights=np.minimum(n_a, n_b),
                       minlength=n_reads).astype(np.int64)
    assert np.array_equal(got, want)


def test_union_find_min_labels_native_matches_numpy():
    from shasta_tpu import native
    from shasta_tpu.graph.marker_graph import union_find_labels

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(40)
    n = 5000
    u = rng.integers(0, n, 8000)
    v = rng.integers(0, n, 8000)
    want = union_find_labels(n, u, v)  # small input -> numpy path
    got = native.union_find_min_labels_native(n, u, v)
    assert np.array_equal(want, got)


def test_expand_unite_pairs_native_matches_numpy():
    """Native unite-pair expansion equals the numpy path as a sorted
    multiset of (u, v) pairs."""
    from shasta_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(50)
    n_or = 12
    counts = rng.integers(5, 60, n_or).astype(np.int64)
    moff = np.zeros(n_or + 1, np.int64)
    np.cumsum(counts, out=moff[1:])
    n_al = 9
    orid0 = (rng.integers(0, n_or // 2, n_al) * 2).astype(np.int64)
    orid1 = (rng.integers(0, n_or // 2, n_al) * 2 + rng.integers(0, 2, n_al)).astype(np.int64)
    n_per = rng.integers(0, 5, n_al).astype(np.int64)
    off = np.zeros(n_al + 1, np.int64)
    np.cumsum(n_per, out=off[1:])
    total = int(off[-1])
    ord0 = np.empty(total, np.uint32)
    ord1 = np.empty(total, np.uint32)
    for a in range(n_al):
        ord0[off[a]:off[a+1]] = rng.integers(0, counts[orid0[a]], n_per[a])
        ord1[off[a]:off[a+1]] = rng.integers(0, counts[orid1[a]], n_per[a])
    got = native.expand_unite_pairs_native(
        moff, counts, orid0, orid1, off[:-1], off[1:], ord0, ord1
    )
    assert got is not None
    gu, gv = got
    # numpy reference (the fallback path logic)
    a_orid0 = np.repeat(orid0, n_per)
    a_orid1 = np.repeat(orid1, n_per)
    o0 = ord0.astype(np.int64)
    o1 = ord1.astype(np.int64)
    m0 = moff[a_orid0] + o0
    m1 = moff[a_orid1] + o1
    m0r = moff[a_orid0 ^ 1] + (counts[a_orid0] - 1 - o0)
    m1r = moff[a_orid1 ^ 1] + (counts[a_orid1] - 1 - o1)
    wu = np.concatenate([m0, m0r]); wv = np.concatenate([m1, m1r])
    key_g = np.sort(gu * (moff[-1] + 1) + gv)
    key_w = np.sort(wu * (moff[-1] + 1) + wv)
    assert np.array_equal(key_g, key_w)


def test_strict_interval_hashes_native_matches_numpy():
    """The native dual-hash pass must match the numpy fallback bit
    for bit, including reverse-strand complement-and-reverse reads and
    the overlapping-marker sentinel."""
    from shasta_tpu import native as N

    if not N.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    n_reads, L = 40, 500
    rle = rng.integers(0, 4, n_reads * L).astype(np.uint8)
    offsets = np.arange(n_reads + 1, dtype=np.int64) * L
    k = 10
    n_int = 3000
    orid = rng.integers(0, 2 * n_reads, n_int).astype(np.int64)
    pos0 = rng.integers(0, L - 3 * k, n_int).astype(np.int64)
    gap = rng.integers(-3, 40, n_int).astype(np.int64)  # negatives overlap
    # Clamp inside the read: positions past the read end would index
    # neighboring reads' bytes (or run out of the flat array).
    pos1 = np.minimum(pos0 + k + gap, L - 1)

    got = N.strict_interval_hashes_native(rle, offsets, orid, pos0, pos1, k)
    assert got is not None
    h1, h2 = got

    # numpy oracle (the fallback formulation).
    P1 = np.uint64(0x100000001B3)
    P2 = np.uint64(0x9E3779B97F4A7C15)
    e1 = np.zeros(n_int, np.uint64)
    e2 = np.zeros(n_int, np.uint64)
    with np.errstate(over="ignore"):
        for t in range(n_int):
            r = int(orid[t]) >> 1
            comp = int(orid[t]) & 1
            s, e = int(pos0[t]) + k, int(pos1[t])
            if e < s:
                sent = np.uint64(0xFFFF000000000000) + np.uint64(s - e)
                e1[t] = sent
                e2[t] = sent
                continue
            a = np.uint64(0)
            b = np.uint64(0)
            pw1 = np.uint64(1)
            pw2 = np.uint64(1)
            for p in range(s, e):
                if comp:
                    base = np.uint64(3 - rle[offsets[r + 1] - 1 - p])
                else:
                    base = np.uint64(rle[offsets[r] + p])
                a += (base + np.uint64(1)) * pw1
                b += (base + np.uint64(1)) * pw2
                pw1 *= P1
                pw2 *= P2
            e1[t] = a
            e2[t] = b
    assert np.array_equal(h1, e1)
    assert np.array_equal(h2, e2)


def test_counting_sort_by_key_native_matches_argsort():
    """The native stable counting sort must equal np.argsort(stable)
    on a dense grouping key."""
    from shasta_tpu import native as N

    if not N.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    key = rng.integers(0, 500, 20000).astype(np.int64)
    counts = np.bincount(key, minlength=500)
    starts = np.zeros(500, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    got = N.counting_sort_by_key_native(key, starts)
    assert got is not None
    want = np.argsort(key, kind="stable")
    assert np.array_equal(got, want)
