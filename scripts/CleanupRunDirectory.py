#!/usr/bin/env python
"""Remove the Data stage directory from a run
(reference: scripts/CleanupRunDirectory.py).

Usage: CleanupRunDirectory.py <runDir>
"""
import os
import shutil
import sys

run_dir = sys.argv[1] if len(sys.argv) > 1 else "."
data = os.path.join(run_dir, "Data")
if os.path.islink(data):
    os.unlink(data)
elif os.path.isdir(data):
    shutil.rmtree(data)
else:
    print(f"No Data directory in {run_dir}.")
    sys.exit(1)
print(f"Removed {data}")
