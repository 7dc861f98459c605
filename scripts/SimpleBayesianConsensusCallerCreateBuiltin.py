#!/usr/bin/env python
"""Install a Bayesian consensus model CSV as a named built-in model
(reference: scripts/SimpleBayesianConsensusCallerCreateBuiltin.py,
which generated a C++ header; here the built-ins are data files under
shasta_tpu/consensus/models/).

Usage: SimpleBayesianConsensusCallerCreateBuiltin.py <model.csv> <name>
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if len(sys.argv) != 3:
    print(__doc__)
    sys.exit(1)
src, name = sys.argv[1], sys.argv[2]

models_dir = os.environ.get("SHASTA_TPU_BAYESIAN_MODEL_DIR", "")
if not models_dir:
    import shasta_tpu.consensus as C

    models_dir = os.path.join(os.path.dirname(C.__file__), "models")
os.makedirs(models_dir, exist_ok=True)
dst = os.path.join(models_dir, f"SimpleBayesianConsensusCaller-{name}.csv")
shutil.copy(src, dst)

# Verify it loads.
from shasta_tpu.consensus.caller import get_consensus_caller

get_consensus_caller(f"Bayesian:{name}")
print(f"Installed and verified model Bayesian:{name} at {dst}")
