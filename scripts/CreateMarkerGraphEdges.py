#!/usr/bin/env python
"""Re-run marker graph edge creation + cleanup passes
(reference: scripts/CreateMarkerGraphEdges.py)."""
import sys
from _common import open_run

a = open_run(sys.argv)
a.create_marker_graph_edges()
print(f"Marker graph: {a.marker_graph.edge_count} edges.")
