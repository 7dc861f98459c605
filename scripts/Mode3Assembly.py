#!/usr/bin/env python
"""Run mode-3 assembly on a stored run (reference: scripts/Mode3Assembly.py)."""
import sys

from _common import open_run

a = open_run(sys.argv)
print(a.assemble_mode3())
