#!/usr/bin/env python
"""Re-run read graph creation (reference: scripts/CreateReadGraph.py)."""
import sys
from _common import open_run

a = open_run(sys.argv)
a.create_read_graph()
print(f"Read graph: {a.read_graph.edge_count} edges.")
