#!/usr/bin/env python
"""Re-run marker graph vertex creation
(reference: scripts/CreateMarkerGraphVertices.py)."""
import sys
from _common import open_run

a = open_run(sys.argv)
a.create_marker_graph_vertices()
print(f"Marker graph: {a.marker_graph.vertex_count} vertices.")
