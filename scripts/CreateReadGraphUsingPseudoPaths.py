#!/usr/bin/env python
"""Refine the read graph using pseudo-paths (one iterative-assembly
round) (reference: scripts/CreateReadGraphUsingPseudoPaths.py).

Usage: CreateReadGraphUsingPseudoPaths.py [runDir] [minScore]
"""
import sys

from _common import open_run
from shasta_tpu.pipeline.iterative import refine_read_graph_with_pseudo_paths

a = open_run(sys.argv)
min_score = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
kept, dropped = refine_read_graph_with_pseudo_paths(a, min_score=min_score)
a.store.save_stage("ReadGraph", a.read_graph.arrays())
print(f"Read graph rebuilt: kept {kept} alignments, dropped {dropped} "
      f"with discordant pseudo-paths.")
