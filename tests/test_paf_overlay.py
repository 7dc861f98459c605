"""Reference PAF overlay: parsing, overlap derivation, explorer pages,
and explore access-control validation (reference:
src/AssemblerHttpServer-Alignments.cpp:567 loadAlignmentsPafFile,
src/ReferenceOverlapMap.hpp, srcMain/main.cpp:1349 exploreAccess)."""

import os

import numpy as np
import pytest

from shasta_tpu.io.paf import ReferenceOverlaps, load_paf


def _paf_line(qname, strand, tname, tstart, tend, mapq=60):
    # 12 mandatory PAF columns; lengths/counts are placeholders.
    return "\t".join(
        [
            qname, "1000", "0", "1000", strand, tname, "100000",
            str(tstart), str(tend), "900", "1000", str(mapq),
        ]
    )


def test_load_paf_and_overlaps(tmp_path):
    paf = tmp_path / "ref.paf"
    paf.write_text(
        "\n".join(
            [
                _paf_line("r0", "+", "chr1", 0, 1000),
                _paf_line("r1", "+", "chr1", 500, 1500),   # overlaps r0
                _paf_line("r2", "-", "chr1", 1400, 2400),  # overlaps r1 only
                _paf_line("r3", "+", "chr2", 0, 1000),     # other region
                _paf_line("r4", "+", "chr1", 1000, 1400),  # touches r0 end: no
                _paf_line("missing", "+", "chr1", 0, 99999),
            ]
        )
        + "\n"
    )
    names = ["r0", "r1", "r2", "r3", "r4"]
    ov = load_paf(str(paf), names)
    assert ov.count == 5
    assert ov.skipped_reads == 1
    pairs = ov.overlap_pairs()
    # orids: r0+=0, r1+=2, r2-=5, r3+=6, r4+=8
    assert (0, 2) in pairs            # r0/r1 overlap
    assert (2, 5) in pairs            # r1/r2 overlap (r2 reverse)
    assert (0, 5) not in pairs        # r0/r2 disjoint
    assert not any(6 in p for p in pairs)  # chr2 read isolated
    # Half-open intervals: r4 starts exactly where r0 ends.
    assert (0, 8) not in pairs
    assert (2, 8) in pairs            # r4 is inside r1
    # r4 [1000,1400) touches but does not overlap r2 [1400,2400).
    assert ov.read_pairs() == {(0, 1), (1, 2), (1, 4)}
    assert ov.intervals_for_read(2) == [("chr1", 1400, 2400, 1)]


def test_load_paf_integer_names(tmp_path):
    paf = tmp_path / "ref.paf"
    paf.write_text(_paf_line("7", "+", "c", 10, 20) + "\n")
    ov = load_paf(str(paf))
    assert ov.orid.tolist() == [14]


def test_load_paf_rejects_short_lines(tmp_path):
    paf = tmp_path / "bad.paf"
    paf.write_text("a\tb\tc\n")
    with pytest.raises(ValueError):
        load_paf(str(paf))


def test_min_quality_filter(tmp_path):
    paf = tmp_path / "ref.paf"
    paf.write_text(
        _paf_line("r0", "+", "c", 0, 10, mapq=0)
        + "\n"
        + _paf_line("r0", "+", "c", 20, 30, mapq=60)
        + "\n"
    )
    ov = load_paf(str(paf), ["r0"], min_quality=30)
    assert ov.count == 1
    assert int(ov.start[0]) == 20


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """A small finished assembly run directory."""
    from tests import synth
    from shasta_tpu.pipeline.assemble import run_assembly
    from shasta_tpu.pipeline.config import AssemblyConfig

    td = tmp_path_factory.mktemp("pafrun")
    genome = synth.random_genome(20000, seed=91)
    reads = synth.sample_reads(genome, 100, 2500, seed=92, both_strands=True)
    fa = os.path.join(td, "reads.fasta")
    synth.write_fasta(fa, reads)
    run_dir = os.path.join(td, "run")
    cfg = AssemblyConfig()
    cfg.reads.min_read_length = 500
    cfg.kmers.k = 8
    cfg.kmers.probability = 0.1
    cfg.min_hash.hash_fraction = 0.05
    cfg.min_hash.min_hash_iteration_count = 6
    cfg.min_hash.max_bucket_size = 60
    cfg.align.min_aligned_marker_count = 20
    cfg.align.max_skip = 60
    cfg.align.max_drift = 60
    cfg.align.max_trim = 60
    cfg.read_graph.max_alignment_count = 8
    cfg.marker_graph.min_coverage = 3
    run_assembly([fa], run_dir, cfg)
    return td, run_dir


def test_explorer_paf_pages(tiny_run):
    """The candidate-graph and assessment pages annotate against the
    PAF ground truth."""
    td, run_dir = tiny_run
    from shasta_tpu.http.explore import Explorer

    # Build a PAF that marks reads 0..9 as one overlapping pile-up.
    paf_path = os.path.join(td, "truth.paf")
    ex0 = Explorer(run_dir)
    names = ex0.reads.names
    with open(paf_path, "w") as f:
        for i in range(10):
            f.write(_paf_line(names[i], "+", "chr1", i * 100, i * 100 + 2500) + "\n")

    ex = Explorer(run_dir, paf_file=paf_path)
    assert ex.reference_overlaps is not None
    assert ex.reference_overlaps.count == 10

    page = ex.page_assess_alignments({})
    assert "Against the reference PAF overlay" in page
    assert "Candidate recall" in page

    page = ex.page_candidate_graph({"readId": ["0"]})
    assert "Reference overlay" in page


def test_explore_access_validation(tiny_run):
    from shasta_tpu.http.explore import run_explorer

    _, run_dir = tiny_run
    with pytest.raises(ValueError, match="exploreAccess"):
        run_explorer(run_dir, access="everyone")


def test_peer_uid_resolves_own_connection(tiny_run):
    """_peer_uid finds this process's UID for a loopback socket."""
    import socket
    import threading

    from shasta_tpu.http.explore import _peer_uid

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    cli = socket.socket()
    cli.connect(("127.0.0.1", port))
    conn, addr = srv.accept()
    try:
        uid = _peer_uid(addr)
        assert uid == os.getuid()
    finally:
        conn.close()
        cli.close()
        srv.close()


def test_all_explorer_routes_render(tiny_run):
    """Every registered explorer route renders without raising on a
    finished mode-0 run (mode-3-only pages may report unavailability,
    but must not crash)."""
    from shasta_tpu.http.explore import Explorer, _routes

    _, run_dir = tiny_run
    ex = Explorer(run_dir)
    table = _routes(ex)
    defaults = {
        "readId": ["0"], "strand": ["0"], "readId0": ["0"],
        "readId1": ["1"], "strand0": ["0"], "strand1": ["0"],
        "vertexId": ["0"], "edgeId": ["0"], "segmentId": ["0"],
        "segmentId0": ["0"], "segmentId1": ["1"], "linkId": ["0"],
        "alignmentId": ["0"], "maxDistance": ["1"], "ordinal": ["0"],
        "sequence": ["ACGTACGT"], "sequence0": ["ACGTACGT"],
        "sequence1": ["ACGTACGT"],
    }
    for path, fn in sorted(table.items()):
        body = fn(dict(defaults))
        assert isinstance(body, str) and body, path
