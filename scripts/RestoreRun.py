#!/usr/bin/env python
"""Restore Data/ from DataOnDisk/ (reference: scripts/RestoreRun.py)."""
import os, shutil, sys

run_dir = sys.argv[1] if len(sys.argv) > 1 else "."
src = os.path.join(run_dir, "DataOnDisk")
dst = os.path.join(run_dir, "Data")
if os.path.islink(dst):
    os.unlink(dst)
shutil.copytree(src, dst, dirs_exist_ok=True)
print(f"Restored {dst} from {src}")
