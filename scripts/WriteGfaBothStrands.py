#!/usr/bin/env python
"""Write Assembly-BothStrands.gfa from a stored run
(reference: scripts/WriteGfaBothStrands.py)."""
import os
import sys

from _common import open_run
from shasta_tpu.graph.assembly_graph import AssemblyGraph, write_gfa1

a = open_run(sys.argv)
ag = AssemblyGraph.from_arrays(a.store.load_stage("AssemblyGraph"))
out = os.path.join(a.run_dir, "Assembly-BothStrands.gfa")
write_gfa1(out, ag, a.config.kmers.k, both_strands=True)
print(f"Wrote {out}")
