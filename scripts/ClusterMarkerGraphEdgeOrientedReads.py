#!/usr/bin/env python
"""Cluster the oriented reads of a marker graph edge based on their
fill-sequence similarity
(reference: scripts/ClusterMarkerGraphEdgeOrientedReads.py).

Usage: ClusterMarkerGraphEdgeOrientedReads.py <runDir> <edgeId> [errorRateThreshold]
"""
import sys

from _common import open_run
from shasta_tpu.graph.mode2 import cluster_edge_oriented_reads

a = open_run(sys.argv)
edge_id = int(sys.argv[2])
threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2
orids, _o0, _o1 = a.marker_graph.edge_intervals(edge_id)
clusters = cluster_edge_oriented_reads(
    a.reads, a.markers, a.marker_graph, edge_id, threshold
)
print(f"Edge {edge_id}: {orids.shape[0]} oriented reads, "
      f"{len(clusters)} clusters at error rate threshold {threshold}:")
for c in clusters:
    print("  " + " ".join(str(int(orids[i])) for i in c))
