#!/usr/bin/env python
"""Audit marker graph vertexTable/vertices consistency on a stored run
(reference: Assembler::checkMarkerGraphVertices, src/Assembler.hpp:1275,
scripts/CheckMarkerGraphVertices.py-style invariant driver)."""
import sys

from _common import open_run
from shasta_tpu.graph.marker_graph import check_marker_graph_vertices

a = open_run(sys.argv)
ok = check_marker_graph_vertices(a.marker_graph)
print("Marker graph vertices are" + ("" if ok else " NOT") + " consistent.")
sys.exit(0 if ok else 1)
