"""Stage-wise driver scripts over a persisted run."""

import os
import subprocess
import sys

import pytest

from tests import synth
from tests.test_assembly_e2e import small_config

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


@pytest.mark.slow
def test_stage_scripts_rerun(tmp_path):
    from shasta_tpu.pipeline.assemble import run_assembly

    genome = synth.random_genome(15000, seed=201)
    reads = synth.sample_reads(genome, 90, 3000, seed=202, both_strands=True)
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, reads)
    run_dir = os.path.join(tmp_path, "run")
    run_assembly([fa], run_dir, small_config())

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.abspath(os.path.join(SCRIPTS, ".."))
    # Force CPU inside the subprocess despite the env's TPU pin.
    env["SHASTA_TPU_FORCE_CPU"] = "1"
    for script, extra, expect in [
        ("CreateMarkerGraphVertices.py", [], "vertices"),
        ("CreateMarkerGraphEdges.py", [], "edges"),
        ("Mode0Assembly.py", [], "Assembled"),
        ("FindMarkers.py", [], "markers"),
        ("WriteAssemblyGraph.py", [str(tmp_path / "ag.csv")],
         "assembly graph edges"),
        ("WriteAlignmentDetails.py", [str(tmp_path / "ad.csv")],
         "alignments"),
        ("WriteMarkersFrequency.py", [str(tmp_path / "mf.csv")],
         "frequencies"),
        ("GetConfig.py", [], "[Kmers]"),
        ("WriteReads.py", [str(tmp_path / "reads.fasta")], "reads"),
        ("WriteOrientedRead.py", ["0", "1"], ">"),
        ("WriteGfaBothStrands.py", [], "Wrote"),
        ("AssembleMarkerGraphVertices.py", [], "repeat counts"),
        # These overwrite the AssemblyGraph stage with an unassembled
        # rebuild, so they run after the writers above.
        ("CreateAssemblyGraphEdges.py", [], "edges"),
        ("Detangle.py", [], "Detangled"),
        ("RandomlySelectKmers.py", [], "marker k-mers"),
        ("SelectKmersBasedOnFrequency.py", [], "marker k-mers"),
        ("SelectKmers2.py", [], "marker k-mers"),
        ("SelectKmers4.py", [], "marker k-mers"),
        ("GenerateFeedback.py", None, "Assembled segments N50"),
        # Round-2 additions (read-only first, stage-rewriting last).
        ("AnalyzeAlignmentMatrix.py", ["0", "0", "1", "0"], "Matrix dots"),
        ("AlignOrientedReads1.py", ["0", "0", "1", "0"], "aligned markers"),
        ("FindMarkerGraphReverseComplementVertices.py", [], "rc map verified"),
        ("FindMarkerGraphReverseComplementEdges.py", [], "rc edge map verified"),
        ("ComputeSortedMarkers.py", [], "Sorted markers stored"),
        ("WriteBadMarkerGraphVertices.py", [], "duplicate oriented reads"),
        ("ComputeMarkerGraphVerticesCoverageData.py", [], "Wrote"),
        ("VertexCoverageStatisticsByKmerId.py", [], "Wrote"),
        ("WriteParallelMarkerGraphEdges.py", [], "parallel edges"),
        ("ReadGraphClustering.py", [], "clusters"),
        ("CreateCompressedAssemblyGraph.py", [], "Compressed assembly graph"),
        ("WriteOrientedReadsBySegment.py", [], "Wrote"),
        ("FindAssemblyGraphBubbles.py", [], "bubbles"),
        ("ColorGfaKeySegments.py", [], "key segments"),
        ("AssembleSegment.py", ["0"], "Segment 0"),
        ("ClusterMarkerGraphEdgeOrientedReads.py", ["0"], "clusters"),
        ("AssembleMarkerGraphEdges.py", [], "Assembled consensus"),
        ("ReverseTransitiveReduction.py", [], "Reverse transitive reduction"),
        ("CreateMarkerGraphSecondaryEdges.py", [], "secondary marker graph"),
        ("SplitMarkerGraphSecondaryEdges.py", [], "secondary edges"),
        ("SetMarkerGraphEdgeFlags.py", ["--wasPruned", "0"], "Set"),
        ("CreateAndCleanupMarkerGraph.py", [], "Marker graph"),
        ("CreateMarkerGraphAndTransitiveReduction.py", [], "alive after"),
        ("CreateAssemblyGraphVertices.py", [], "Assembly graph"),
        ("Assemble.py", [], "segments"),
        ("CreateAssembly.py", [], "assembledSegmentCount"),
    ]:
        if extra is None:  # flag-style invocation
            argv = [sys.executable, os.path.join(SCRIPTS, script),
                    "--assemblyDirectory", run_dir, "--genomeSizeMbp", "0.015"]
        else:
            argv = [sys.executable, os.path.join(SCRIPTS, script), run_dir] + extra
        r = subprocess.run(
            argv,
            capture_output=True,
            text=True,
            env=env,
            timeout=500,
        )
        assert r.returncode == 0, (script, r.stderr[-800:])
        assert expect in r.stdout, (script, r.stdout)


@pytest.mark.slow
def test_analysis_scripts(tmp_path):
    """Argparse-style and mode-3 analysis drivers over a persisted run."""
    from shasta_tpu.pipeline.assemble import run_assembly

    genome = synth.random_genome(15000, seed=211)
    reads = synth.sample_reads(genome, 90, 3000, seed=212, both_strands=True)
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, reads)
    run_dir = os.path.join(tmp_path, "run")
    run_assembly([fa], run_dir, small_config())

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SHASTA_TPU_FORCE_CPU"] = "1"
    env["PYTHONPATH"] = os.path.abspath(os.path.join(SCRIPTS, ".."))

    def run(script, *args, expect=None):
        r = subprocess.run(
            [sys.executable, os.path.join(SCRIPTS, script)] + list(args),
            capture_output=True, text=True, env=env, timeout=500,
        )
        assert r.returncode == 0, (script, r.stderr[-800:])
        if expect:
            assert expect in r.stdout, (script, r.stdout)
        return r.stdout

    run("WriteOrientedReadPath.py", run_dir, "--readId", "0",
        "--strand", "0", expect="Ordinal,VertexId")
    run("WritePseudoPath.py", run_dir, "--readId", "0", "--strand", "0",
        expect="Pseudo-path")
    run("AlignPseudoPaths.py", run_dir, "0", "0", "1", "0",
        expect="alignment score")
    run("WriteLocalReadGraphReads.py", run_dir, "--readId", "0",
        "--strand", "0", "--maxDistance", "2", expect="oriented reads")
    run("WriteLocalAlignmentCandidateReads.py", run_dir, "--readId", "0",
        "--strand", "0", "--maxDistance", "2", expect="oriented reads")
    run("ColorGfaWithTwoReads.py", run_dir, "--readId0", "0",
        "--strand0", "0", "--readId1", "1", "--strand1", "0",
        expect="Wrote")
    run("ColorGfaBySimilarityToSegment.py", run_dir, "--segmentId", "0",
        expect="Wrote")
    run("AnalyzeAssemblyGraphBubbles.py", run_dir, expect="bubble pairs")
    run("CreateReadGraphMode1.py", run_dir, expect="Mode-1 read graph")

    # Mode-3 drivers need the Mode3 stage.
    run("Mode3Assembly.py", run_dir)
    run("CreateMode3PathGraph.py", run_dir, expect="Jaccard graph")
    run("AnalyzeMode3Subgraph.py", run_dir, "0", "1", expect="SegmentA")

    # Iterative-assembly refinement last (rebuilds read/marker graph).
    run("CreateReadGraphUsingPseudoPaths.py", run_dir,
        expect="Read graph rebuilt")

    # Mode-2 split drivers on a fresh copy of the run.
    run("Mode2Assembly-B-Prepare.py", run_dir, expect="page cache")


def test_standalone_scripts(tmp_path):
    """Utility scripts that need no persisted run."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SHASTA_TPU_FORCE_CPU"] = "1"
    env["PYTHONPATH"] = os.path.abspath(os.path.join(SCRIPTS, ".."))

    def run(script, *args):
        r = subprocess.run(
            [sys.executable, os.path.join(SCRIPTS, script)] + list(args),
            capture_output=True, text=True, env=env, timeout=500,
        )
        assert r.returncode == 0, (script, r.stderr[-800:])
        return r.stdout

    out = run("dset64Test.py", "2000", "4000", "17")
    assert "PASSED" in out

    conf = tmp_path / "gen.conf"
    out = run("GenerateConfig.py", "--genomeSizeMbp", "0.4",
              "--out", str(conf))
    assert conf.exists() and "[Reads]" in conf.read_text()

    out = run("SetupRunDirectory.py", str(tmp_path / "rundir"))
    assert (tmp_path / "rundir" / "shasta.conf").exists()

    # FASTQ.gz -> FASTA round trip.
    import gzip
    fq = tmp_path / "x.fastq.gz"
    with gzip.open(fq, "wt") as f:
        f.write("@r0\nACGTACGT\n+\nIIIIIIII\n@r1\nTTTTACGT\n+\nIIIIIIII\n")
    fa = tmp_path / "x.fasta"
    out = run("FastqGzToFasta.py", str(fq), str(fa))
    assert "Converted 2 reads" in out
    assert fa.read_text() == ">r0\nACGTACGT\n>r1\nTTTTACGT\n"

    # comparePhaseAssignments: identical files agree 100% even after
    # a global haplotype flip.
    pa = tmp_path / "a.csv"
    pa.write_text("Segment,Length,Haplotype,PhasedComponent\n"
                  "1,100,0,0\n2,120,1,0\n3,90,0,1\n")
    pb = tmp_path / "b.csv"
    pb.write_text("Segment,Length,Haplotype,PhasedComponent\n"
                  "1,100,1,0\n2,120,0,0\n3,90,0,1\n")
    out = run("comparePhaseAssignments.py", str(pa), str(pb))
    assert "3/3 (100.0%)" in out

    # Round-2 standalone additions.
    out = run("CreateConfigurationTable.py", str(tmp_path / "confgen"))
    assert "verified" in out
    assert (tmp_path / "confgen" / "Nanopore-May2022.conf").exists()

    out = run("SetupSmallRunDirectory.py", str(tmp_path / "smallrun"),
              str(fa))
    assert "ready" in out

    out = run("Copy.py", str(pa), str(tmp_path / "rundir"))
    assert "Copied" in out
    out = run("CopyDirectory.py", str(tmp_path), str(tmp_path / "rundir2"))
    assert "Copied" in out

    # Bandage labels from a minimal PAF.
    paf = tmp_path / "aln.paf"
    paf.write_text(
        "0\t100\t0\t100\t+\tchr1\t1000\t50\t150\t95\t100\t60\n"
        "1\t80\t0\t80\t+\tchr2\t1000\t10\t90\t70\t80\t60\n"
    )
    out = run("generateBandageLabelsFromAlignment.py", str(paf),
              str(tmp_path / "bandage"))
    assert "2 segments labeled" in out
    assert "chr1:50" in (tmp_path / "bandage-labels.csv").read_text()

    # Local subgraph extraction from a dot file.
    dot = tmp_path / "g.dot"
    dot.write_text('digraph G {\n"a" -> "b"\n"b" -> "c"\n"c" -> "d"\n}\n')
    out = run("CreateLocalSubgraph.py", str(dot), "a", "1")
    assert "2 vertices" in out

    # Install a Bayesian model copy into a scratch model dir.
    import shasta_tpu.consensus as C
    src_model = os.path.join(
        os.path.dirname(C.__file__), "models", "guppy-2.3.1-a.csv"
    )
    env["SHASTA_TPU_BAYESIAN_MODEL_DIR"] = str(tmp_path / "models")
    os.makedirs(tmp_path / "models", exist_ok=True)
    out = run("SimpleBayesianConsensusCallerCreateBuiltin.py", src_model,
              "test-model")
    assert "verified model" in out
