#!/usr/bin/env python
"""Add secondary edges to restore contiguity after strict edge
creation (reference: scripts/CreateMarkerGraphSecondaryEdges.py).

Usage: CreateMarkerGraphSecondaryEdges.py [runDir] [maxSkip]
"""
import sys

from _common import open_run
from shasta_tpu.graph.mode2 import create_marker_graph_secondary_edges

a = open_run(sys.argv)
max_skip = int(sys.argv[2]) if len(sys.argv) > 2 else \
    a.config.marker_graph.secondary_edges_max_skip
n = create_marker_graph_secondary_edges(a.markers, a.marker_graph, max_skip)
a.store.save_stage("MarkerGraph", a.marker_graph.arrays())
print(f"Added {n} secondary marker graph edges.")
