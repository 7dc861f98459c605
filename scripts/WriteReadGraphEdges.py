#!/usr/bin/env python
"""Dump read graph edges as CSV (reference: scripts/WriteReadGraphEdges.py)."""
import sys

from _common import open_run

a = open_run(sys.argv)
g = a.read_graph
print("EdgeId,OrientedReadId0,OrientedReadId1,AlignmentId,CrossesStrands,Inconsistent")
for e in range(g.edge_count):
    print(f"{e},{g.orid0[e]},{g.orid1[e]},{g.alignment_id[e]},"
          f"{int(g.crosses_strands[e])},{int(g.inconsistent[e])}")
