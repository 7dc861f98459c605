#!/usr/bin/env python
"""Audit the marker graph's strand symmetry invariant
(reference: scripts/CheckMarkerGraphIsStrandSymmetric.py)."""
import sys

from _common import open_run
from shasta_tpu.graph.marker_graph import check_strand_symmetry

a = open_run(sys.argv)
ok = check_strand_symmetry(a.marker_graph)
print("Marker graph is strand symmetric." if ok else "STRAND SYMMETRY VIOLATED.")
sys.exit(0 if ok else 1)
