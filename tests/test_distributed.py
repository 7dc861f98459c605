"""Multi-host entry points (single-process degenerate case; the
multi-device data path itself is covered by test_mesh_pipeline.py on
the 8-virtual-device CPU mesh)."""

import os

import numpy as np
import pytest

from tests import synth
from tests.test_assembly_e2e import small_config


def test_initialize_and_helpers():
    import jax

    from shasta_tpu.parallel import distributed as D

    D.initialize()
    D.initialize()  # idempotent
    assert D.is_coordinator()
    mesh = D.global_mesh()
    assert mesh.devices.size == len(jax.devices())

    sl = D.process_local_slice(10)
    assert (sl.start, sl.stop) == (0, 10)
    assert D.shard_input_files(["a", "b"]) == ["a", "b"]

    arr = np.arange(12).reshape(3, 4)
    out = D.allgather_to_hosts(arr)
    assert np.array_equal(out, arr)
    D.barrier("test")


def test_run_assembly_distributed(tmp_path):
    from shasta_tpu.parallel import distributed as D

    genome = synth.random_genome(15000, seed=301)
    reads = synth.sample_reads(genome, 90, 3000, seed=302, both_strands=True)
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, reads)

    run_dir = os.path.join(tmp_path, "run")
    summary = D.run_assembly_distributed([fa], run_dir, small_config())
    assert summary is not None
    assert summary["assembledSegmentCount"] >= 1
    assert os.path.exists(os.path.join(run_dir, "Assembly.fasta"))
