#!/usr/bin/env python
"""Flag chimeric reads (reference: scripts/FlagChimericReads.py)."""
import sys

from _common import open_run
from shasta_tpu.graph.read_graph import flag_chimeric_reads

a = open_run(sys.argv)
a.reads.is_chimeric = flag_chimeric_reads(
    a.read_graph, a.reads.read_count,
    max_distance=a.config.read_graph.max_chimeric_read_distance,
)
a.store.save_stage("Reads", a.reads.arrays())
print(f"Flagged {int(a.reads.is_chimeric.sum())} chimeric reads.")
