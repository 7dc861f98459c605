"""Multi-host execution: jax.distributed initialization, the global
device mesh, host-sharded input distribution, and process-0 output
gathering.

The reference is strictly single-node shared memory (reference:
src/MultithreadedObject.hpp:33-99 — one thread pool over one address
space). The TPU build's scale-out axis is a pod slice spanning
processes: each host process loads a contiguous shard of the input
reads, the hot stages execute inside ``shard_map`` over a global mesh
(LowHash bucket exchange, alignment batches and union-find hooking all
ride ICI collectives — see parallel/mesh.py), and host 0 gathers the
condensed graphs and writes the output files (the analog of the
reference's single-process writers, srcMain/main.cpp:822-830).

Single-process usage is the degenerate case: ``initialize()`` with no
arguments starts a 1-process coordinator, and the global mesh equals
the local mesh, so the same driver script works on a laptop, one TPU
host, or a v5e-16 slice launched with one process per host.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

import jax

from jax.sharding import Mesh

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the jax.distributed runtime (idempotent).

    With no arguments this works both under multi-host launchers that
    set the standard environment (TPU pods, SLURM, Open MPI — JAX
    auto-detects them) and as a local 1-process coordinator for tests
    and single-host runs.
    """
    global _initialized
    if _initialized:
        return
    try:
        # Already initialized by the launcher or the caller (the
        # multi-host entry path): adopt that state. Checked directly on
        # the distributed global state because probing via
        # jax.process_count() would itself initialize the XLA backend,
        # and calling jax.distributed.initialize() again — even to have
        # it fail — can start a second stray coordinator service.
        from jax._src.distributed import global_state as _gs

        if _gs.client is not None or _gs.coordinator_address is not None:
            _initialized = True
            return
    except (ImportError, AttributeError):  # pragma: no cover
        pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if not kwargs and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        # Local single-process bring-up: give the coordinator an
        # explicit local address instead of relying on auto-detection.
        import socket

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        kwargs = dict(
            coordinator_address=f"localhost:{port}",
            num_processes=1,
            process_id=0,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        msg = str(e).lower()
        if "already" in msg or "only be called once" in msg:
            # Initialized by the launcher (or a previous caller in
            # this process) — that is the state we want.
            pass
        elif "must be called before" in msg and jax.process_count() == 1:
            # The XLA backend is already up in single-process mode
            # (tests, notebooks, stage-wise reruns): every helper in
            # this module degrades to the local case, so this is fine.
            # Real multi-host launches must call initialize() first.
            pass
        else:
            raise
    _initialized = True


def is_coordinator() -> bool:
    """True on the process that owns output writing (host 0)."""
    return jax.process_index() == 0


def global_mesh(axis: str = "pairs") -> Mesh:
    """A 1-D mesh over every device of every process."""
    return Mesh(np.array(jax.devices()), (axis,))


def process_local_slice(n: int) -> slice:
    """The contiguous [start, stop) shard of ``n`` items this process
    owns (the input-distribution convention: reads are dealt out
    contiguously so read ids stay globally dense)."""
    p = jax.process_count()
    i = jax.process_index()
    per = -(-n // p)
    return slice(min(i * per, n), min((i + 1) * per, n))


def shard_input_files(input_files: Sequence[str]) -> List[str]:
    """Deal input files round-robin over processes; with fewer files
    than processes every process gets all files and shards reads by
    ``process_local_slice`` at parse time instead."""
    p = jax.process_count()
    if p == 1 or len(input_files) < p:
        return list(input_files)
    i = jax.process_index()
    return [f for j, f in enumerate(input_files) if j % p == i]


def allgather_to_hosts(arr: np.ndarray) -> np.ndarray:
    """Concatenate per-process host arrays onto every host (row-wise).

    Used to globalize per-host stage outputs that feed a host-side
    condensed-graph pass (the reference's per-thread gather,
    src/Assembler.hpp:982-994, across hosts)."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def barrier(name: str = "shasta_tpu") -> None:
    """Cross-process sync point (stage fences between pipeline stages)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def run_assembly_distributed(
    input_files: List[str],
    run_dir: str,
    config=None,
):
    """Multi-host entry point: initialize the runtime, build the global
    mesh, execute the pipeline sharded over it, and write outputs on
    host 0 only. Returns the summary dict on host 0, None elsewhere.
    """
    from shasta_tpu.pipeline.assemble import run_assembly

    initialize()
    # Bring the backend up NOW: the global topology exchange behind
    # jax.devices() is a collective with a bounded timeout, so it must
    # run while every process is at the same point — not lazily at the
    # first device use, which can be minutes into a skewed host-side
    # parsing phase on another process.
    jax.devices()
    barrier("assembly-start")
    mesh = global_mesh()
    files = shard_input_files(input_files)
    # SPMD: every process executes the same pipeline (the host-side
    # condensed-graph passes are deterministic, so they replicate);
    # sharded stages synchronize through the collectives inside the
    # jitted calls. Only host 0 writes to the requested run_dir — the
    # others use a scratch directory so the writers never race.
    if not is_coordinator():
        run_dir = os.path.join(run_dir, f".process{jax.process_index()}")
    summary = run_assembly(files, run_dir, config, mesh=mesh)
    barrier("assembly-complete")
    return summary if is_coordinator() else None
