#!/usr/bin/env python
"""Built-in self-test (reference: scripts/Test.py)."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from shasta_tpu.pipeline.assemble import Assembler

with tempfile.TemporaryDirectory() as d:
    ok = Assembler(d).test()
print("Self-test passed." if ok else "Self-test FAILED.")
sys.exit(0 if ok else 1)
