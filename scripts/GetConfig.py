#!/usr/bin/env python
"""Print the effective configuration of a stored run
(reference: scripts/GetConfig.py).

Usage: GetConfig.py <runDir>
"""
import os
import sys

run_dir = sys.argv[1] if len(sys.argv) > 1 else "."
path = os.path.join(run_dir, "shasta.conf")
with open(path) as f:
    sys.stdout.write(f.read())
