#!/usr/bin/env python
"""Remove read graph bridges (reference: scripts/RemoveReadGraphBridges.py).

Usage: RemoveReadGraphBridges.py <runDir> [maxDistance]
"""
import sys

from _common import open_run
from shasta_tpu.graph.read_graph import remove_read_graph_bridges

a = open_run(sys.argv)
d = int(sys.argv[2]) if len(sys.argv) > 2 else 2
a.read_graph, keep, removed = remove_read_graph_bridges(
    a.read_graph, a.alignments, a.reads.read_count, d
)
a.store.save_stage("ReadGraph", a.read_graph.arrays())
print(f"Removed {removed} bridge alignments; "
      f"{int(keep.sum())} of {a.alignments.count} alignments remain.")
