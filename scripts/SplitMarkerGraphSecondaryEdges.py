#!/usr/bin/env python
"""Split secondary marker graph edges with inconsistent fill
sequences into per-cluster edges
(reference: scripts/SplitMarkerGraphSecondaryEdges.py).

Usage: SplitMarkerGraphSecondaryEdges.py [runDir] [errorRateThreshold] [minCoverage]
"""
import sys

from _common import open_run
from shasta_tpu.graph.mode2 import split_marker_graph_secondary_edges

a = open_run(sys.argv)
threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
min_cov = int(sys.argv[3]) if len(sys.argv) > 3 else 2
n_split, n_created = split_marker_graph_secondary_edges(
    a.reads, a.markers, a.marker_graph, threshold, min_cov
)
a.store.save_stage("MarkerGraph", a.marker_graph.arrays())
print(f"Split {n_split} secondary edges into {n_created} new edges.")
