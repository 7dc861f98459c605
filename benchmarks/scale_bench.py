"""Scalable pipeline benchmark: SCALE Mb genome, ~25x coverage, full
pipeline wall-clock on one chip, graded against the truth genome
(k-mer QV / completeness / misassemblies, shasta_tpu/utils/accuracy).

Regimes (REGIME env):
- uniform1 (default): fixed 10 kb reads, 1% uniform errors — the
  round-3 comparison regime (committed per round in SCALE_r*.json).
- ont: the realistic Oxford Nanopore regime the BASELINE configs are
  tuned for — log-normal lengths (median 25 kb), 7% indel-biased
  errors (40/30/30 sub/ins/del), run under the Nanopore-May2022
  built-in configuration (reference: conf/Nanopore-May2022.conf).

Reference wall-clock measurements (v5e single chip via tunnel, warm
compile cache, healthy relay):
- SCALE=1 uniform1: ~41-52 s end to end;
- SCALE=25 uniform1: 366 s (round 3 final), peak RSS 25 GB;
- SCALE=50 uniform1: 1200 s, 50 GB (round 3). See SCALE_r0*.json.
"""
import sys, time, json, tempfile, os
sys.path.insert(0, __file__.rsplit("/", 2)[0])

SCALE = int(os.environ.get("SCALE", "1"))
REGIME = os.environ.get("REGIME", "uniform1")
# ITERATIVE=1: one pseudo-path refinement round (VERDICT r3 item 9
# acceptance: an iterative round at SCALE=5 in seconds, not hours).
ITERATIVE = os.environ.get("ITERATIVE", "0") == "1"
import numpy as np
from tests import synth
from shasta_tpu.pipeline.assemble import run_assembly
from shasta_tpu.pipeline.config import AssemblyConfig
from shasta_tpu.utils import accuracy as AC

t0 = time.monotonic()
genome = synth.random_genome(1_000_000 * SCALE, seed=500)
if REGIME == "ont":
    # Calibrated ONT defaults: raw 5% indel-dominated homopolymer
    # errors ~= 2.2% post-RLE (see synth.sample_reads_ont docstring).
    reads = synth.sample_reads_ont(
        genome, 25.0, seed=501,
        median_length=25000, sigma=0.55, min_length=3000,
    )
else:
    reads = synth.sample_reads(
        genome, 2500 * SCALE, 10000, seed=501, error_rate=0.01,
        both_strands=True, vectorized=True,
    )
tmp = tempfile.mkdtemp()
fa = os.path.join(tmp, "r.fasta")
synth.write_fasta(fa, reads)
n_bases = sum(len(r) for r in reads)
print(f"[{time.monotonic()-t0:.0f}s] {len(reads)} reads written "
      f"({n_bases/1e6:.0f} Mb)", flush=True)

if REGIME == "ont":
    from shasta_tpu.pipeline.configurations import get_configuration

    cfg = AssemblyConfig.from_conf_text(get_configuration("Nanopore-May2022"))
else:
    cfg = AssemblyConfig()
    cfg.reads.min_read_length = 1000
    cfg.kmers.k = 10
    cfg.kmers.probability = 0.1
    cfg.min_hash.hash_fraction = 0.02
    cfg.min_hash.min_hash_iteration_count = 8
    cfg.min_hash.min_frequency = 2
    cfg.min_hash.max_bucket_size = 60
    cfg.align.min_aligned_marker_count = 40
    cfg.align.max_skip = 60
    cfg.align.max_drift = 40
    cfg.align.max_trim = 60
    cfg.read_graph.max_alignment_count = 8
    cfg.marker_graph.min_coverage = 0
if ITERATIVE:
    cfg.assembly.iterative = True
    cfg.assembly.iterative_iteration_count = 1
run_dir = os.path.join(tmp, "run")
summary = run_assembly([fa], run_dir, cfg)

t_acc = time.monotonic()
contigs = AC.parse_fasta_contigs(os.path.join(run_dir, "Assembly.fasta"))
acc = AC.assembly_metrics(contigs, genome, k=21)
summary["accuracy"] = acc
summary["accuracySeconds"] = round(time.monotonic() - t_acc, 1)
summary["regime"] = REGIME
print(json.dumps({k: v for k, v in summary.items() if k != "stageSeconds"}, indent=1), flush=True)
print("stage seconds:", json.dumps({k: round(v,1) for k, v in summary["stageSeconds"].items()}, indent=1))
