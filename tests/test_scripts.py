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
