#!/usr/bin/env python
"""Copy a file into a run's stage-store directory
(reference: scripts/Copy.py — there a page-aligned copy onto the
huge-page filesystem; the stage store here is plain files, so this is
a plain copy with a destination check).

Usage: Copy.py <source> <runDir>
"""
import os
import shutil
import sys

if len(sys.argv) != 3:
    print(__doc__)
    sys.exit(1)
src, run_dir = sys.argv[1], sys.argv[2]
dst = os.path.join(run_dir, "Data", os.path.basename(src))
os.makedirs(os.path.dirname(dst), exist_ok=True)
shutil.copy2(src, dst)
print(f"Copied {src} -> {dst}")
