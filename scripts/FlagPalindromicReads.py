#!/usr/bin/env python
"""Flag palindromic reads (reference: scripts/FlagPalindromicReads.py)."""
import sys

from _common import open_run
from shasta_tpu.ops.palindrome import flag_palindromic_reads

a = open_run(sys.argv)
a.reads.is_palindromic = flag_palindromic_reads(a.markers)
a.store.save_stage("Reads", a.reads.arrays())
print(f"Flagged {int(a.reads.is_palindromic.sum())} palindromic reads.")
