"""Tests for the data layer: base encoding, RLE, read store, FASTA IO."""

import numpy as np
import pytest

from shasta_tpu.data import bases as B
from shasta_tpu.data import rle as R
from shasta_tpu.data.reads import build_read_store
from shasta_tpu.io import fasta
from tests import synth


def test_base_encoding_roundtrip():
    s = "ACGTACGTTTGGCCAA"
    codes = B.encode_str(s)
    assert B.decode_to_str(codes) == s
    assert np.all(codes < 4)


def test_complement():
    codes = B.encode_str("ACGT")
    assert B.decode_to_str(B.complement(codes)) == "TGCA"
    assert B.decode_to_str(B.reverse_complement(codes)) == "ACGT"
    assert B.decode_to_str(B.reverse_complement(B.encode_str("AACGT"))) == "ACGTT"


def test_rle_roundtrip():
    codes = B.encode_str("AAACCGTTTTA")
    rb, cnt = R.rle_encode(codes)
    assert B.decode_to_str(rb) == "ACGTA"
    assert cnt.tolist() == [3, 2, 1, 4, 1]
    assert np.array_equal(R.rle_decode(rb, cnt), codes)


def test_rle_flat_matches_per_read():
    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, 4, size=rng.integers(1, 50)).astype(np.uint8) for _ in range(20)]
    flat = np.concatenate(seqs)
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    rb, cnt, roff = R.rle_encode_flat(flat, offsets)
    for i, s in enumerate(seqs):
        eb, ec = R.rle_encode(s)
        lo, hi = roff[i], roff[i + 1]
        assert np.array_equal(rb[lo:hi], eb)
        assert np.array_equal(cnt[lo:hi], ec)


def test_fasta_parse_and_store(tmp_path):
    genome = synth.random_genome(2000, seed=7)
    reads = synth.sample_reads(genome, 30, 500, seed=8)
    path = str(tmp_path / "reads.fasta")
    synth.write_fasta(path, reads)

    parsed = fasta.parse_file(path)
    assert parsed.read_count == 30
    store = build_read_store(parsed, min_read_length=0)
    assert store.read_count == 30
    for i in (0, 13, 29):
        assert np.array_equal(store.read_raw(i, 0), reads[i])
        assert np.array_equal(store.read_raw(i, 1), B.reverse_complement(reads[i]))


def test_store_filters(tmp_path):
    path = str(tmp_path / "mixed.fasta")
    with open(path, "w") as f:
        f.write(">ok\n" + "ACGT" * 50 + "\n")
        f.write(">short\nACGTACGT\n")
        f.write(">badbase\n" + "ACGTN" * 40 + "\n")
        f.write(">longrun\n" + "ACG" + "T" * 300 + "ACG" * 40 + "\n")
    parsed = fasta.parse_file(path)
    store = build_read_store(parsed, min_read_length=100)
    assert store.names == ["ok"]
    assert store.discards.short_read_count == 1
    assert store.discards.bad_base_read_count == 1
    assert store.discards.long_run_read_count == 1


def test_fastq_parse(tmp_path):
    path = str(tmp_path / "r.fastq")
    with open(path, "w") as f:
        f.write("@r0 meta\nACGTACGT\n+\nIIIIIIII\n@r1\nGGGGCCCC\n+\n########\n")
    parsed = fasta.parse_file(path)
    assert parsed.names == ["r0", "r1"]
    store = build_read_store(parsed)
    assert B.decode_to_str(store.read_raw(0)) == "ACGTACGT"
    # GGGGCCCC -> RLE GC with counts 4,4
    assert B.decode_to_str(store.read_rle(1)) == "GC"


def test_apply_desired_coverage():
    import numpy as np
    from shasta_tpu.data.reads import apply_desired_coverage, build_read_store
    from shasta_tpu.io.fasta import parse_fasta_bytes
    from shasta_tpu.data import bases as B
    from tests import synth

    reads = [synth.random_genome(n, seed=n) for n in (5000, 3000, 2000, 1000)]
    fasta = b"".join(
        b">r%d\n%s\n" % (i, B.decode_to_str(r).encode())
        for i, r in enumerate(reads)
    )
    store = build_read_store(parse_fasta_bytes(fasta))
    out = apply_desired_coverage(store, 8000)
    # Keeps the longest reads within the 8000-base budget: 5000 + 3000.
    assert out.read_count == 2
    assert sorted(out.raw_lengths.tolist()) == [3000, 5000]
    # No-op when coverage already below target.
    assert apply_desired_coverage(store, 10**9).read_count == 4


def test_merge_parsed_native_codes():
    # merge_parsed must preserve the native parser's pre-encoded codes
    # (a merge that drops them crashed multi-file assemblies).
    import numpy as np

    from shasta_tpu.io.fasta import ParsedReads, merge_parsed

    p1 = ParsedReads(
        names=["a"], seq_ascii=np.zeros(0, np.uint8),
        offsets=np.array([0, 4], np.int64), metadata=[""],
        codes=np.array([0, 1, 2, 3], np.uint8),
    )
    p2 = ParsedReads(
        names=["b"], seq_ascii=np.zeros(0, np.uint8),
        offsets=np.array([0, 3], np.int64), metadata=[""],
        codes=np.array([3, 2, 1], np.uint8),
    )
    m = merge_parsed([p1, p2])
    assert m.codes is not None
    assert np.array_equal(m.codes, [0, 1, 2, 3, 3, 2, 1])
    assert m.offsets.tolist() == [0, 4, 7]

    # Mixed native/ASCII parts fall back to ASCII ("ACGT" for codes).
    p3 = ParsedReads(
        names=["c"], seq_ascii=np.frombuffer(b"GG", np.uint8),
        offsets=np.array([0, 2], np.int64), metadata=[""],
    )
    m2 = merge_parsed([p1, p3])
    assert m2.codes is None
    assert m2.seq_ascii.tobytes() == b"ACGTGG"


def test_merge_parsed_mixed_with_invalid_native_codes():
    # The native parser emits code 255 for invalid bases (e.g. 'N');
    # a mixed native/ASCII merge must map those to 'N', not crash.
    import numpy as np

    from shasta_tpu.io.fasta import ParsedReads, merge_parsed

    p1 = ParsedReads(
        names=["a"], seq_ascii=np.zeros(0, np.uint8),
        offsets=np.array([0, 5], np.int64), metadata=[""],
        codes=np.array([0, 255, 2, 3, 255], np.uint8),
    )
    p2 = ParsedReads(
        names=["b"], seq_ascii=np.frombuffer(b"TT", np.uint8),
        offsets=np.array([0, 2], np.int64), metadata=[""],
    )
    m = merge_parsed([p1, p2])
    assert m.codes is None
    assert m.seq_ascii.tobytes() == b"ANGTNTT"
