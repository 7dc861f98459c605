"""Scalable pipeline benchmark: SCALE Mb genome, ~25x coverage, 1%
errors, full pipeline wall-clock on one chip.

Reference measurements (v5e single chip via tunnel, warm compile
cache, healthy relay; committed per round in SCALE_r*.json):
- SCALE=1: ~41-52 s end to end (22 segments, N50 66 kb);
- SCALE=25 (25 Mb, 62.5k reads): 568 s, peak RSS 25 GB (round 3;
  1096 s before the round-3 host-pass fixes);
- SCALE=50 (50 Mb, 125k reads, 1.25 Gb bases): 1200 s, 50 GB
  (round 3; 2045 s before). computeAlignments is relay-bandwidth-
  bound at scale — see CLAUDE.md.
"""
import sys, time, json, tempfile, os
sys.path.insert(0, __file__.rsplit("/", 2)[0])

# Scale factor: SCALE=5 runs the 5 Mb / 12.5k-read variant.
SCALE = int(os.environ.get("SCALE", "1"))
import numpy as np
from tests import synth
from shasta_tpu.data import bases as B
from shasta_tpu.pipeline.assemble import run_assembly
from shasta_tpu.pipeline.config import AssemblyConfig

t0 = time.monotonic()
genome = synth.random_genome(1_000_000 * SCALE, seed=500)
reads = synth.sample_reads(genome, 2500 * SCALE, 10000, seed=501, error_rate=0.01, both_strands=True)
tmp = tempfile.mkdtemp()
fa = os.path.join(tmp, "r.fasta")
synth.write_fasta(fa, reads)
print(f"[{time.monotonic()-t0:.0f}s] reads written ({sum(len(r) for r in reads)/1e6:.0f} Mb)", flush=True)

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
summary = run_assembly([fa], os.path.join(tmp, "run"), cfg)
print(json.dumps({k: v for k, v in summary.items() if k != "stageSeconds"}, indent=1), flush=True)
print("stage seconds:", json.dumps({k: round(v,1) for k, v in summary["stageSeconds"].items()}, indent=1))
