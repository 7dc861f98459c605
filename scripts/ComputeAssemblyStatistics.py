#!/usr/bin/env python
"""Print assembly statistics for a stored run
(reference: scripts/ComputeAssemblyStatistics.py)."""
import json
import sys

from _common import open_run
from shasta_tpu.graph.assembly_graph import AssemblyGraph, assembly_statistics

a = open_run(sys.argv)
ag = AssemblyGraph.from_arrays(a.store.load_stage("AssemblyGraph"))
print(json.dumps(assembly_statistics(ag), indent=1))
