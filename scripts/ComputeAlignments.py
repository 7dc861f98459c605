#!/usr/bin/env python
"""Re-run alignment computation against a persisted run
(reference: scripts/ComputeAlignments.py)."""
import sys
from _common import open_run

a = open_run(sys.argv)
a.compute_alignments()
print(f"Computed {a.alignments.count} alignments.")
