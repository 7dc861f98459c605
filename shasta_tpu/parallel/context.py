"""Ambient mesh context: stages opt into multi-device execution when a
mesh is active.

The reference parallelizes every hot stage through one shared thread
pool owned by the Assembler (reference: src/MultithreadedObject.hpp:33-99).
Here the analogous shared resource is a `jax.sharding.Mesh`; the
pipeline installs it once and the ops-level dispatchers pick it up so
the same call sites work single-chip and multi-chip.
"""

from __future__ import annotations

import contextlib
from typing import Optional

from jax.sharding import Mesh

_current: Optional[Mesh] = None


def current_mesh() -> Optional[Mesh]:
    """The active mesh, or None for single-device execution."""
    return _current


def mesh_size() -> int:
    return _current.devices.size if _current is not None else 1


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    """Install ``mesh`` as the ambient mesh for the dynamic extent."""
    global _current
    prev = _current
    _current = mesh
    try:
        yield mesh
    finally:
        _current = prev
