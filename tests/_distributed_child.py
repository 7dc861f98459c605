"""Child process body for the 2-process distributed identity test.

Launched by tests/test_distributed.py as ``python _distributed_child.py
<process_id> <num_processes> <coordinator_addr> <workdir> [mode]
[scale]`` (mode 0 default, 2 = diploid; "scale" switches to the
SCALE-bench configuration for multi-Mb inputs). Each child
brings up jax.distributed against the shared coordinator, runs
``run_assembly_distributed`` on the same input, and exercises the
p>1 branches of the cross-host helpers (allgather_to_hosts, barrier).

Not a test module — the leading underscore keeps pytest collection away.
"""

import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    addr = sys.argv[3]
    workdir = sys.argv[4]
    mode = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    # 4 virtual CPU devices per process -> a 2x4 = 8-device global mesh.
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Must run before anything touches the XLA backend.
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=nproc, process_id=pid
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    import numpy as np

    from shasta_tpu.parallel import distributed as D
    from tests.test_assembly_e2e import small_config

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    # The p>1 branches of the cross-host helpers (the single-process
    # test can only reach their early returns).
    got = D.allgather_to_hosts(np.full((2, 3), pid, np.int32))
    expect = np.concatenate(
        [np.full((2, 3), i, np.int32) for i in range(nproc)]
    )
    assert np.array_equal(got, expect), got
    D.barrier("child-helpers")
    # Round-robin file dealing at p>1 (with fewer files than
    # processes every process keeps all files).
    files = [f"f{j}" for j in range(3 * nproc)]
    assert D.shard_input_files(files) == files[pid::nproc]
    assert D.shard_input_files(["only"]) == ["only"]

    if len(sys.argv) > 6 and sys.argv[6] == "scale":
        from tests.test_distributed import scale_config

        cfg = scale_config()
    else:
        cfg = small_config()
    if mode == 2:
        cfg.assembly.mode = 2
        cfg.marker_graph.min_edge_coverage = 3
        cfg.marker_graph.min_edge_coverage_per_strand = 0
        cfg.assembly.mode2_bubble_removal_component_size_threshold = 3
    summary = D.run_assembly_distributed(
        [os.path.join(workdir, "r.fasta")],
        os.path.join(workdir, "run_dist"),
        cfg,
    )
    if pid == 0:
        assert summary is not None
        if mode == 2:
            assert summary["phasedBubbleCount"] >= 3
        else:
            assert summary["assembledSegmentCount"] >= 1
    else:
        assert summary is None
    print(f"CHILD{pid} OK", flush=True)


if __name__ == "__main__":
    main()
