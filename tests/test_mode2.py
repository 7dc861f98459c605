"""Mode 2: strict edges, bubble phasing, phased output."""

import os

import numpy as np
import pytest

from shasta_tpu.data import bases as B
from shasta_tpu.graph.mode2 import diploid_bayesian_phase, phase_bubbles, Bubble
from shasta_tpu.pipeline.assemble import run_assembly

from tests import synth
from tests.test_assembly_e2e import small_config


def test_diploid_bayesian_phase_in_phase():
    # Perfectly in-phase matrix.
    m = np.array([[10, 0], [0, 10]])
    log_pin, log_pout = diploid_bayesian_phase(m)
    assert log_pin > 30
    assert log_pin > log_pout
    # Out of phase.
    m2 = np.array([[0, 10], [10, 0]])
    li2, lo2 = diploid_bayesian_phase(m2)
    assert lo2 > 30 and lo2 > li2
    # Random: no signal.
    m3 = np.array([[5, 5], [5, 5]])
    li3, lo3 = diploid_bayesian_phase(m3)
    assert li3 < 5 and lo3 < 5


def test_phase_bubbles_chain():
    # 3 bubbles in a chain: reads 0-9 on haplotype A, 10-19 on B.
    hapA = np.arange(0, 10)
    hapB = np.arange(10, 20)
    bubbles = []
    for i in range(3):
        b = Bubble(v0=2 * i, v1=2 * i + 1, branch_edges=(10 * i, 10 * i + 1))
        if i == 1:
            # Flip branch order in the middle bubble.
            b.reads0, b.reads1 = hapB.copy(), hapA.copy()
        else:
            b.reads0, b.reads1 = hapA.copy(), hapB.copy()
        bubbles.append(b)
    n_comp = phase_bubbles(bubbles, min_log_p=20, min_common_reads=3)
    assert n_comp == 1
    # Bubble 1 must be phase-flipped relative to 0 and 2.
    assert bubbles[0].phase == bubbles[2].phase
    assert bubbles[1].phase == -bubbles[0].phase


@pytest.mark.slow
def test_mode2_end_to_end(tmp_path):
    # Diploid genome: haplotype B = A with a SNP every ~700 bases.
    rng = np.random.default_rng(55)
    hapA = synth.random_genome(15000, seed=56)
    hapB = hapA.copy()
    snp_positions = np.arange(350, 15000, 700)
    for p in snp_positions:
        hapB[p] = (hapB[p] + 1 + rng.integers(0, 3)) % 4

    reads = []
    reads += synth.sample_reads(hapA, 90, 2500, seed=57, both_strands=True)
    reads += synth.sample_reads(hapB, 90, 2500, seed=58, both_strands=True)
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, reads)

    cfg = small_config()
    cfg.assembly.mode = 2
    cfg.marker_graph.min_edge_coverage = 3
    cfg.marker_graph.min_edge_coverage_per_strand = 0
    # The reference default componentSizeThreshold=10 is tuned for
    # human-scale runs; this 15 kb genome produces components of 3-10
    # bubbles, which would all be squashed as "bad".
    cfg.assembly.mode2_bubble_removal_component_size_threshold = 3
    run_dir = os.path.join(tmp_path, "run")
    summary = run_assembly([fa], run_dir, cfg)

    assert summary["phasedBubbleCount"] >= 3
    for f in (
        "Assembly-Detailed.gfa",
        "Assembly-Detailed-NoSequence.gfa",
        "Assembly-Phased.fasta",
        "Assembly-Phased.gfa",
        "Assembly-Haploid.fasta",
        "Assembly-Haploid-NoSequence.gfa",
        "PhasingRegions.csv",
        "BubbleChains.csv",
        "Assembly-Phased-Details.csv",
    ):
        assert os.path.exists(os.path.join(run_dir, f)), f

    # Phased-Details maps every PR./UR. segment to detailed segments
    # with contiguous [begin, end) runs (reference: writePhasedDetails,
    # src/AssemblyGraph2.cpp:1620).
    ends = {}
    with open(os.path.join(run_dir, "Assembly-Phased-Details.csv")) as f:
        rows = [l.strip().split(",") for l in f][1:]
    assert rows
    for seg, _detail, length, begin, end in rows:
        assert int(end) - int(begin) == int(length)
        assert ends.get(seg, 0) == int(begin)  # contiguous per segment
        ends[seg] = int(end)
    assert summary["hetSnpTransitionCount"] + summary["hetSnpTransversionCount"] > 0

    # Check phasing quality: parse phased-region segments
    # (PR.<chain>.<region>.<component>.<haplotype>); for each
    # (component, haplotype) the sequences must consistently match one
    # true haplotype.
    phased = {}
    name = None
    with open(os.path.join(run_dir, "Assembly-Phased.fasta")) as f:
        for line in f:
            if line.startswith(">"):
                nm = line[1:].split()[0]
                if nm.startswith("PR."):
                    _, cid, rid, comp, hap = nm.split(".")
                    name = (nm, comp, int(hap))
                else:
                    name = None
            elif name is not None:
                phased.setdefault(name, []).append(line.strip())
    assert len(phased) >= 4  # at least 2 phased regions x 2 haplotypes

    gsA = B.decode_to_str(hapA)
    gsB = B.decode_to_str(hapB)

    def which_hap(seq):
        # A branch containing a SNP matches exactly one haplotype.
        in_a = seq in gsA or B.decode_to_str(
            B.reverse_complement(B.encode_str(seq))
        ) in gsA
        in_b = seq in gsB or B.decode_to_str(
            B.reverse_complement(B.encode_str(seq))
        ) in gsB
        if in_a and not in_b:
            return 0
        if in_b and not in_a:
            return 1
        return None

    # Group by (component, haplotype label); informative branches in
    # the same group must agree on the true haplotype.
    by_group = {}
    for (nm, comp, hap), seqs in phased.items():
        h = which_hap("".join(seqs))
        if h is not None:
            by_group.setdefault((comp, hap), []).append(h)
    informative = [v for v in by_group.values() if v]
    assert informative, "no informative phased branches"
    consistent = sum(1 for v in informative if len(set(v)) == 1)
    assert consistent / len(informative) > 0.8


def test_secondary_edges_restore_contiguity():
    """Strict filtering breaks a chain; secondary edges reconnect it."""
    from tests.test_marker_graph import make_markers
    from shasta_tpu.graph import marker_graph as MG
    from shasta_tpu.graph.mode2 import create_marker_graph_secondary_edges

    # 2 reads agreeing on 4 markers -> chain A-B-C-D per strand.
    m = make_markers([[1, 2, 3, 4], [9, 9, 9, 9], [1, 2, 3, 4], [9, 9, 9, 9]])
    u = np.array([0, 1, 2, 3, 13, 14, 15, 12])
    v = np.array([8, 9, 10, 11, 5, 6, 7, 4])
    mg = MG.create_marker_graph_vertices(m, u, v, min_coverage=2, max_coverage=10)
    MG.create_marker_graph_edges(m, mg)
    # Break the middle edge per strand (simulating strict filtering).
    mid = np.flatnonzero((mg.source == mg.vertex_table[1]))
    mg.removed_tr[mid] = True
    mg.removed_tr[mg.rc_edge[mid]] = True
    alive_before = int(mg.alive().sum())
    n = create_marker_graph_secondary_edges(m, mg, max_skip=10)
    assert n >= 2
    # Contiguity restored: the strand-0 chain is connected again.
    alive = mg.alive()
    out_deg = np.bincount(mg.source[alive], minlength=mg.vertex_count)
    # The previously dead-ended vertex now has an out edge.
    v_dead = int(mg.vertex_table[1])
    assert out_deg[v_dead] >= 1


def test_split_secondary_edges_by_fill_sequence():
    """A secondary edge whose oriented reads carry two distinct fill
    sequences is split into one edge per cluster, with RC twins
    (reference: splitMarkerGraphSecondaryEdges,
    src/AssemblerMarkerGraphEdges.cpp:777)."""
    from shasta_tpu.data.markers import MarkerStore
    from shasta_tpu.data.reads import ReadStore
    from shasta_tpu.graph.marker_graph import MarkerGraph
    from shasta_tpu.graph.mode2 import split_marker_graph_secondary_edges

    # 4 reads of 10 RLE bases: GG ...... TT with fill AAAAAA (reads
    # 0,1) or CCCCCC (reads 2,3).
    def read(fill):
        return np.array([2, 2] + [fill] * 6 + [3, 3], np.uint8)

    rle = np.concatenate([read(0), read(0), read(1), read(1)])
    offsets = np.arange(0, 41, 10, dtype=np.int64)
    reads = ReadStore(
        rle_bases=rle,
        repeat_counts=np.ones(40, np.uint8),
        offsets=offsets,
        raw_lengths=np.full(4, 10, np.int64),
        names=[f"r{i}" for i in range(4)],
        metadata=[""] * 4,
    )
    # 2 markers per oriented read at RLE positions 0 and 8, k=2.
    markers = MarkerStore(
        k=2,
        kmer_ids=np.zeros(16, np.uint32),
        positions=np.tile(np.array([0, 8], np.uint32), 8),
        offsets=np.arange(0, 17, 2, dtype=np.int64),
    )
    # One secondary edge per strand between two anchor vertices.
    mg = MarkerGraph(
        vertex_table=np.full(16, -1, np.int64),
        vertex_offsets=np.zeros(5, np.int64),
        vertex_markers=np.zeros(0, np.int64),
        rc_vertex=np.array([2, 3, 0, 1], np.int64),
        source=np.array([0, 2], np.int64),
        target=np.array([1, 3], np.int64),
        coverage=np.array([4, 4], np.int32),
        rc_edge=np.array([1, 0], np.int64),
        removed_tr=np.zeros(2, bool),
        pruned=np.zeros(2, bool),
        superbubble=np.zeros(2, bool),
        low_coverage_cross=np.zeros(2, bool),
        interval_offsets=np.array([0, 4, 8], np.int64),
        interval_orid=np.array([0, 2, 4, 6, 1, 3, 5, 7], np.int64),
        interval_ord0=np.zeros(8, np.int32),
        interval_ord1=np.ones(8, np.int32),
    )
    mg.is_secondary = np.array([True, True])

    n_split, n_created = split_marker_graph_secondary_edges(
        reads, markers, mg, error_rate_threshold=0.2, min_coverage=2
    )
    assert n_split == 2
    assert n_created == 4  # 2 clusters x (edge + rc)
    assert mg.removed_split[:2].all()
    assert not mg.alive()[:2].any()
    assert mg.alive()[2:].all()
    # New edges keep the endpoints and split the intervals 2+2.
    assert np.array_equal(mg.source[2:], [0, 2, 0, 2])
    assert np.array_equal(mg.target[2:], [1, 3, 1, 3])
    assert np.array_equal(np.diff(mg.interval_offsets[2:]), [2, 2, 2, 2])
    # rc involution on the new edges.
    assert np.array_equal(mg.rc_edge[mg.rc_edge], np.arange(6))
    # Cluster 0 = reads 0,1 (strand 0 orids 0,2); its RC edge carries
    # orids 1,3 with mirrored ordinals.
    o, o0, o1 = mg.edge_intervals(2)
    assert np.array_equal(o, [0, 2])
    o, o0, o1 = mg.edge_intervals(3)
    assert np.array_equal(o, [1, 3])
    assert np.array_equal(o0, [0, 0]) and np.array_equal(o1, [1, 1])
