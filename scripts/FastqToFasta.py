#!/usr/bin/env python
"""Convert FASTQ (possibly .gz) to FASTA
(reference: scripts/FastqToFasta.py, FastqGzToFasta.py).

Usage: FastqToFasta.py input.fastq[.gz] output.fasta
"""
import gzip
import sys

inp, outp = sys.argv[1], sys.argv[2]
op = gzip.open if inp.endswith(".gz") else open
with op(inp, "rt") as f, open(outp, "w") as g:
    i = 0
    for line in f:
        m = i % 4
        if m == 0:
            g.write(">" + line[1:])
        elif m == 1:
            g.write(line)
        i += 1
print(f"Converted {i // 4} reads.")
