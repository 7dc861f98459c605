#!/usr/bin/env python
"""Write all stored reads as FASTA (reference: scripts/WriteReads.py).

Usage: WriteReads.py <runDir> [output.fasta]
"""
import os
import sys

from _common import open_run
from shasta_tpu.data import bases as B

a = open_run(sys.argv)
out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(a.run_dir, "Reads.fasta")
with open(out, "w") as f:
    for rid in range(a.reads.read_count):
        f.write(f">{a.reads.names[rid]}\n")
        f.write(B.decode_to_str(a.reads.read_raw(rid)) + "\n")
print(f"Wrote {a.reads.read_count} reads to {out}.")
