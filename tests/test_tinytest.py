"""End-to-end smoke on the bundled TinyTest asset (the reference ships
tests/TinyTest.fasta.gz as its only test asset; ours is generated with
a known source genome so reconstruction can be asserted)."""

import gzip
import os

import pytest

from shasta_tpu.data import bases as B
from shasta_tpu.pipeline.assemble import run_assembly

from tests.test_assembly_e2e import read_fasta_codes, small_config

ASSET = os.path.join(os.path.dirname(__file__), "TinyTest.fasta.gz")
GENOME = os.path.join(os.path.dirname(__file__), "TinyTest.genome.gz")


@pytest.mark.slow
def test_tinytest_assembly(tmp_path):
    cfg = small_config()
    run_dir = os.path.join(tmp_path, "run")
    summary = run_assembly([ASSET], run_dir, cfg)
    assert summary["assembledSegmentCount"] >= 1
    with gzip.open(GENOME, "rt") as f:
        gs = f.read().strip()
    gs_rc = B.decode_to_str(B.reverse_complement(B.encode_str(gs)))
    total = 0
    for c in read_fasta_codes(os.path.join(run_dir, "Assembly.fasta")):
        cs = B.decode_to_str(c)
        assert cs in gs or cs in gs_rc  # exact reconstruction
        total += len(cs)
    assert total > 0.6 * len(gs)
