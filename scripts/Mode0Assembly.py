#!/usr/bin/env python
"""Re-run the mode-0 assembly stages + writers
(reference: scripts/RunAssembly-style drivers)."""
import sys
from _common import open_run

a = open_run(sys.argv)
a.assemble_mode0()
summary = a.write_output()
print(f"Assembled {summary['assembledSegmentCount']} segments, "
      f"N50 {summary['assembledSegmentN50']}.")
