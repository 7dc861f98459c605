"""Assembly accuracy metrics (QV / completeness / misassemblies) vs a
known truth genome (shasta_tpu/utils/accuracy.py)."""

import numpy as np

from tests import synth
from shasta_tpu.utils import accuracy as AC


def test_perfect_assembly_scores_cap():
    g = synth.random_genome(200_000, seed=3)
    m = AC.assembly_metrics([g], g, k=21)
    assert m["qv"] == 90.0
    assert m["completeness"] == 1.0
    assert m["misassemblies"] == 0
    assert m["missingKmers"] == 0


def test_qv_tracks_error_rate():
    g = synth.random_genome(300_000, seed=4)
    rng = np.random.default_rng(5)
    for rate, lo, hi in [(1e-4, 35, 45), (1e-3, 25, 35)]:
        c = synth.apply_errors_vec(g, rng, rate, mix=(1.0, 0.0, 0.0))
        m = AC.assembly_metrics([c], g, k=21)
        # QV ~ -10 log10(rate): 40 at 1e-4, 30 at 1e-3.
        assert lo < m["qv"] < hi, (rate, m)
        assert m["misassemblies"] == 0


def test_completeness_tracks_fraction_assembled():
    g = synth.random_genome(400_000, seed=6)
    half = [g[:200_000]]
    m = AC.assembly_metrics(half, g, k=21)
    assert 0.45 < m["completeness"] < 0.55
    assert m["qv"] == 90.0


def test_misassembly_detected():
    g = synth.random_genome(500_000, seed=7)
    # Chimeric contig: two distant regions spliced, one with a strand
    # flip.
    from shasta_tpu.data import bases as B

    splice = np.concatenate([g[:100_000], g[300_000:400_000]])
    flip = np.concatenate(
        [g[:100_000], B.reverse_complement(g[300_000:400_000])]
    )
    clean = g[100_000:250_000]
    m0 = AC.assembly_metrics([clean], g, k=21)
    assert m0["misassemblies"] == 0
    m1 = AC.assembly_metrics([splice], g, k=21)
    assert m1["misassemblies"] >= 1
    m2 = AC.assembly_metrics([flip], g, k=21)
    assert m2["misassemblies"] >= 1
    # Only the k-1 junction k-mers are novel: QV stays high.
    assert m1["qv"] > 50


def test_parse_fasta_contigs(tmp_path):
    g = synth.random_genome(5000, seed=8)
    p = tmp_path / "a.fasta"
    synth.write_fasta(str(p), [g[:2000], g[2000:]])
    cs = AC.parse_fasta_contigs(str(p))
    assert len(cs) == 2
    assert np.array_equal(np.concatenate(cs), g)


def test_diploid_metrics():
    from shasta_tpu.data import bases as B

    hapA = synth.random_genome(200_000, seed=9)
    hapB = hapA.copy()
    snps = np.arange(350, 200_000, 700)
    hapB[snps] = (hapB[snps] + 1) % 4

    # Union truth: a contig from either haplotype scores clean.
    m = AC.assembly_metrics([hapA[:50_000], hapB[50_000:120_000]],
                            [hapA, hapB], k=21)
    assert m["qv"] == 90.0

    # Phasing: pure per-haplotype pieces vs a switched chimera.
    pure = [hapA[:60_000], hapB[:60_000],
            B.reverse_complement(hapA[100_000:160_000])]
    ph = AC.diploid_phasing_metrics(pure, hapA, hapB, k=21)
    assert ph["informative"] == 3
    assert ph["meanPurity"] == 1.0 and ph["purity90Fraction"] == 1.0

    switched = [np.concatenate([hapA[:30_000], hapB[30_000:60_000]])]
    ph2 = AC.diploid_phasing_metrics(switched, hapA, hapB, k=21)
    assert ph2["informative"] == 1
    assert ph2["meanPurity"] < 0.75

    # Recall: covering only half the genome recovers ~half the het
    # k-mers.
    half = [hapA[:100_000], hapB[:100_000]]
    ph3 = AC.diploid_phasing_metrics(half, hapA, hapB, k=21)
    assert 0.4 < ph3["hetKmerRecall"] < 0.6


def test_phasing_switch_errors():
    """Positional switch analysis distinguishes block switches from
    isolated-site noise (utils/accuracy.phasing_switch_errors)."""
    hapA = synth.random_genome(140_000, seed=19)
    hapB = hapA.copy()
    snps = np.arange(350, 140_000, 700)
    hapB[snps] = (hapB[snps] + 1) % 4

    # Pure sequences: no switches at all.
    sw = AC.phasing_switch_errors([hapA.copy(), hapB.copy()], hapA, hapB)
    assert sw["blockSwitches"] == 0 and sw["isolatedFlips"] == 0
    assert sw["informativeSites"] > 0

    # One chimera with two junctions -> exactly two block switches,
    # and the wrong (middle) block's length is reported.
    chim = np.concatenate(
        [hapA[:50_000], hapB[50_000:90_000], hapA[90_000:]]
    )
    sw2 = AC.phasing_switch_errors([chim], hapA, hapB)
    assert sw2["blockSwitches"] == 2, sw2
    assert sw2["isolatedFlips"] == 0
    assert sw2["longestWrongRun"] > 30  # ~57 SNPs x 21 k-mers each

    # A single flipped SNP site: isolated flips, zero block switches.
    one = hapA.copy()
    one[snps[60]] = hapB[snps[60]]
    sw3 = AC.phasing_switch_errors([one], hapA, hapB)
    assert sw3["blockSwitches"] == 0, sw3
    assert sw3["isolatedFlips"] >= 1
