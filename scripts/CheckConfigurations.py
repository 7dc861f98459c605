#!/usr/bin/env python
"""Parse every built-in configuration (reference:
scripts/CheckConfigurations.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from shasta_tpu.pipeline.config import AssemblyConfig
from shasta_tpu.pipeline.configurations import CONFIGURATIONS

for name, text in CONFIGURATIONS.items():
    cfg = AssemblyConfig.from_conf_text(text)
    print(f"{name}: ok (k={cfg.kmers.k}, mode={cfg.assembly.mode}, "
          f"caller={cfg.assembly.consensus_caller})")
