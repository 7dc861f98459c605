#!/usr/bin/env python
"""Rebuild the assembly graph (linear-chain condensation) from the
stored marker graph (reference: scripts/CreateAssemblyGraphEdges.py +
CreateAssemblyGraphVertices.py — a single pass here: the TPU build
creates vertices and edges together)."""
import sys

from _common import open_run
from shasta_tpu.graph import assembly_graph as AG

a = open_run(sys.argv)
ag = AG.create_assembly_graph(a.marker_graph)
a.store.save_stage("AssemblyGraph", ag.arrays())
print(f"Assembly graph: {ag.edge_count} edges.")
