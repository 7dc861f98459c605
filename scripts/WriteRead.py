#!/usr/bin/env python
"""Print one read as FASTA (reference: scripts/WriteRead.py).

Usage: WriteRead.py <runDir> <readId>
"""
import sys

from _common import open_run
from shasta_tpu.data import bases as B

a = open_run(sys.argv)
rid = int(sys.argv[2])
seq = a.reads.read_raw(rid)
print(f">{a.reads.names[rid]}")
print(B.decode_to_str(seq))
