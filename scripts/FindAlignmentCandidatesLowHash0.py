#!/usr/bin/env python
"""LowHash0 candidate generation
(reference: scripts/FindAlignmentCandidatesLowHash0.py)."""
import sys

from _common import open_run

a = open_run(sys.argv)
a.find_alignment_candidates()
print(f"{a.candidates.count} alignment candidates.")
