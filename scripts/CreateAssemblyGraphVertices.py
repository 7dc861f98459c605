#!/usr/bin/env python
"""Create the assembly graph (vertices are created together with the
edge condensation in this framework)
(reference: scripts/CreateAssemblyGraphVertices.py)."""
import sys

import numpy as np

from _common import open_run
from shasta_tpu.graph.assembly_graph import create_assembly_graph

a = open_run(sys.argv)
ag = create_assembly_graph(a.marker_graph)
a.store.save_stage("AssemblyGraph", ag.arrays())
n_vertices = np.unique(np.concatenate([ag.source_v, ag.target_v])).shape[0]
print(f"Assembly graph: {n_vertices} vertices, {ag.edge_count} edges.")
