#!/usr/bin/env python
"""Re-run random (method 0) marker k-mer selection on a stored run
(reference: scripts/RandomlySelectKmers.py).

Usage: RandomlySelectKmers.py <runDir> [k] [probability] [seed]
"""
import sys

from _common import open_run
from shasta_tpu.data.kmers import select_kmers_random

a = open_run(sys.argv)
k = int(sys.argv[2]) if len(sys.argv) > 2 else a.config.kmers.k
p = float(sys.argv[3]) if len(sys.argv) > 3 else a.config.kmers.probability
seed = int(sys.argv[4]) if len(sys.argv) > 4 else 231
a.kmer_table = select_kmers_random(k, p, seed=seed)
a.store.save_stage("Kmers", a.kmer_table.arrays())
print(f"Selected {a.kmer_table.marker_count} marker k-mers "
      f"(k={k}, probability={p}).")
