"""K-mer selection methods 1/2/4: frequency and repeat filters."""

import numpy as np

from shasta_tpu.data import bases as B
from shasta_tpu.data.kmers import (
    select_kmers_2,
    select_kmers_4,
    select_kmers_frequency,
    reverse_complement_kmers,
)
from shasta_tpu.data.markers import rolling_kmers_flat
from shasta_tpu.data.reads import build_read_store
from shasta_tpu.io.fasta import parse_fasta_bytes

from tests import synth


def make_store(reads_list):
    fasta = b"".join(
        b">r%d\n%s\n" % (i, B.decode_to_str(r).encode())
        for i, r in enumerate(reads_list)
    )
    return build_read_store(parse_fasta_bytes(fasta))


def test_method1_excludes_frequent_kmers():
    rng = np.random.default_rng(0)
    # Normal background reads + a read repeating one 6-mer many times.
    motif = B.encode_str("ACGTGA")
    spam = np.tile(motif, 400)
    normal = [synth.random_genome(3000, seed=i) for i in range(10)]
    store = make_store(normal + [spam])
    kt = select_kmers_frequency(store, 6, 0.2, enrichment_threshold=5.0)
    assert kt.check_rc_closed()
    # The spammed k-mer must not be a marker.
    kmer_id = int(rolling_kmers_flat(motif, 6)[0])
    assert not kt.is_marker[kmer_id]
    # Density in the right ballpark on the normal reads.
    density = kt.is_marker[
        rolling_kmers_flat(store.rle_bases[:20000], 6)
    ].mean()
    assert 0.1 < density < 0.35


def test_method2_excludes_read_local_enrichment():
    # A k-mer massively enriched in ONE read but rare globally.
    motif = B.encode_str("TGCACA")
    one_read = np.concatenate([np.tile(motif, 100), synth.random_genome(2000, seed=5)])
    normal = [synth.random_genome(3000, seed=10 + i) for i in range(20)]
    store = make_store(normal + [one_read])
    kt = select_kmers_2(store, 6, 0.2, enrichment_threshold=5.0)
    kmer_id = int(rolling_kmers_flat(motif, 6)[0])
    assert not kt.is_marker[kmer_id]
    assert kt.check_rc_closed()


def test_method4_excludes_close_repeats():
    # A k-mer occurring twice 50 bases apart in one read.
    rng = np.random.default_rng(3)
    word = B.encode_str("ATCGAC")
    filler = synth.random_genome(50, seed=30)
    read = np.concatenate(
        [synth.random_genome(1000, seed=31), word, filler, word,
         synth.random_genome(1000, seed=32)]
    )
    normal = [synth.random_genome(3000, seed=40 + i) for i in range(5)]
    store = make_store(normal + [read])
    kt = select_kmers_4(store, 6, 0.3, distance_threshold=100)
    kmer_id = int(rolling_kmers_flat(word, 6)[0])
    assert not kt.is_marker[kmer_id]
    assert kt.check_rc_closed()
