#!/usr/bin/env python
"""Copy Data/ to DataOnDisk/ (reference: scripts/SaveRun.py)."""
import os, shutil, sys

run_dir = sys.argv[1] if len(sys.argv) > 1 else "."
src = os.path.join(run_dir, "Data")
dst = os.path.join(run_dir, "DataOnDisk")
shutil.copytree(src, dst, dirs_exist_ok=True)
print(f"Saved {src} -> {dst}")
