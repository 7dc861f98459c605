"""Phasing switch-error lever experiment (round 5): the 10 Mb diploid
ONT run measured one real block switch per ~21 SNPs with the
reference-default phasing parameters (SCALE_r05.json:
scale10_mode2_ont). Sweep the two evidence thresholds the analysis
flagged — PhasingGraph Bayesian acceptance (minLogP, dB) and
min concordant reads per phasing-graph edge — on a 2 Mb diploid ONT
genome, all inside ONE process so runs share the relay's minutes and
the warm compile cache (CLAUDE.md: cross-process numbers are not
comparable).

Usage: python benchmarks/mode2_phase_exp.py
Prints one JSON line per configuration with switch/purity/recall.
"""
import sys, os, json, time, tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
from tests import synth
from shasta_tpu.pipeline.assemble import run_assembly
from shasta_tpu.pipeline.config import AssemblyConfig
from shasta_tpu.pipeline.configurations import get_configuration
from shasta_tpu.utils import accuracy as AC

SIZE = 2_000_000
rng = np.random.default_rng(700)
hapA = synth.random_genome(SIZE, seed=701)
hapB = hapA.copy()
snp = np.arange(350, SIZE, 700)
hapB[snp] = (hapA[snp] + 1 + rng.integers(0, 3, snp.shape[0])) % 4
reads = []
for hap, seed in ((hapA, 702), (hapB, 703)):
    reads += synth.sample_reads_ont(
        hap, 20.0, seed=seed,
        median_length=25000, sigma=0.55, min_length=11000,
    )
tmp = tempfile.mkdtemp()
fa = os.path.join(tmp, "r.fasta")
synth.write_fasta(fa, reads)
print(f"[exp] {len(reads)} reads, {sum(len(r) for r in reads)/1e6:.0f} Mb",
      flush=True)

CONFIGS = [
    ("ref_defaults", {}),
    ("minlogp30", {"mode2_phasing_min_log_p": 30.0}),
    ("concordant4", {"mode2_phasing_min_concordant_read_count": 4}),
    ("both", {"mode2_phasing_min_log_p": 30.0,
              "mode2_phasing_min_concordant_read_count": 4}),
]

for name, overrides in CONFIGS:
    cfg = AssemblyConfig.from_conf_text(
        get_configuration("Nanopore-Phased-May2022")
    )
    for k, v in overrides.items():
        setattr(cfg.assembly, k, v)
    run_dir = os.path.join(tmp, "run_" + name)
    t0 = time.monotonic()
    s = run_assembly([fa], run_dir, cfg)
    dt = time.monotonic() - t0
    names, phased = AC.parse_fasta_named(
        os.path.join(run_dir, "Assembly-Phased.fasta")
    )
    pr = [q for n, q in zip(names, phased) if n.startswith("PR.")]
    ph = AC.diploid_phasing_metrics(pr, hapA, hapB, k=21)
    sw = AC.phasing_switch_errors(pr, hapA, hapB, k=21)
    print(json.dumps({
        "config": name,
        "elapsed": round(dt, 1),
        "phasedBubbles": s.get("phasedBubbleCount"),
        "diploidN50": s.get("diploidN50"),
        "prSegments": len(pr),
        "meanPurity": ph["meanPurity"],
        "hetKmerRecall": ph["hetKmerRecall"],
        "blockSwitches": sw["blockSwitches"],
        "isolatedFlips": sw["isolatedFlips"],
        "hetSnps": sw["informativeSites"] // 21,
    }), flush=True)
