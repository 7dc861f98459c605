#!/usr/bin/env python
"""Look up a read id by name (reference: scripts/GetReadId.py).

Usage: GetReadId.py <runDir> <readName>
"""
import sys

from _common import open_run

a = open_run(sys.argv)
name = sys.argv[2]
try:
    print(a.reads.names.index(name))
except ValueError:
    print(f"Read {name!r} not found.", file=sys.stderr)
    sys.exit(1)
