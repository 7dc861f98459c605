#!/usr/bin/env python
"""Re-run marker finding on a stored run
(reference: scripts/FindMarkers.py)."""
import sys

from _common import open_run

a = open_run(sys.argv)
a.find_markers()
print(f"Found {a.markers.total_count} markers over "
      f"{a.markers.oriented_read_count} oriented reads.")
