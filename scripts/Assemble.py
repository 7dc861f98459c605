#!/usr/bin/env python
"""Run sequence assembly on the stored marker/assembly graph and write
Assembly.{fasta,gfa} (reference: scripts/Assemble.py)."""
import sys

from _common import open_run

a = open_run(sys.argv)
a.assemble_mode0()
summary = a.write_output()
print(
    f"{summary.get('assembledSegmentCount', 0)} segments, "
    f"N50 {summary.get('assembledSegmentN50', 0)}."
)
