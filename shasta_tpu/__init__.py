"""shasta_tpu — a TPU-native de novo long-read genome assembler.

A from-scratch reimagining of the capabilities of Shasta
(chanzuckerberg/shasta, mounted read-only at /root/reference) on the
JAX/XLA/Pallas stack:

- run-length-encoded reads and k-mer markers live as dense arrays
  (flat data + CSR offsets) instead of mmapped C++ containers;
- LowHash candidate generation, banded marker alignment and marker-graph
  vertex merging (union-find) run as vectorized JAX programs / Pallas
  kernels, batched for the MXU/VPU, with numpy host fallbacks;
- the small condensed-graph passes (transitive reduction, prune,
  simplify, detangle) run on the host, mirroring the reference where
  those passes are sequential anyway;
- every stage persists named arrays into a run directory manifest,
  the moral equivalent of the reference's memory-mapped ``Data/``
  checkpoint namespace (reference: src/MemoryMappedVector.hpp).

See SURVEY.md at the repo root for the full layer map of the reference
this framework re-implements.
"""

from shasta_tpu.version import __version__

__all__ = [
    "__version__",
    "Assembler",
    "run_assembly",
    "AssemblyConfig",
    "configuration_table",
]

_LAZY = {
    "Assembler": ("shasta_tpu.pipeline.assemble", "Assembler"),
    "run_assembly": ("shasta_tpu.pipeline.assemble", "run_assembly"),
    "AssemblyConfig": ("shasta_tpu.pipeline.config", "AssemblyConfig"),
    "configuration_table": (
        "shasta_tpu.pipeline.configurations",
        "CONFIGURATIONS",
    ),
}


def __getattr__(name):
    # Lazy imports keep `import shasta_tpu` light (the pybind11-style
    # top-level API surface: Assembler + config + configurations,
    # reference: src/PythonModule.cpp:42+).
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(f"module 'shasta_tpu' has no attribute {name!r}")
    import importlib

    module = importlib.import_module(target[0])
    return getattr(module, target[1])
