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
    for script, expect in [
        ("CreateMarkerGraphVertices.py", "vertices"),
        ("CreateMarkerGraphEdges.py", "edges"),
        ("Mode0Assembly.py", "Assembled"),
    ]:
        r = subprocess.run(
            [sys.executable, os.path.join(SCRIPTS, script), run_dir],
            capture_output=True,
            text=True,
            env=env,
            timeout=500,
        )
        assert r.returncode == 0, (script, r.stderr[-800:])
        assert expect in r.stdout, (script, r.stdout)
