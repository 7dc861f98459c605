#!/usr/bin/env python
"""Print one oriented read as FASTA
(reference: scripts/WriteOrientedRead.py).

Usage: WriteOrientedRead.py <runDir> <readId> <strand>
"""
import sys

from _common import open_run
from shasta_tpu.data import bases as B

a = open_run(sys.argv)
rid = int(sys.argv[2])
strand = int(sys.argv[3]) if len(sys.argv) > 3 else 0
seq = a.reads.read_raw(rid, strand)
print(f">{a.reads.names[rid]}-{strand}")
print(B.decode_to_str(seq))
