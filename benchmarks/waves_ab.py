"""Hardware A/B of the interleaved-row-wave kernel (VERDICT r4
item 4): waves=1 (default `_kernel`) vs waves=2/4 (`_kernel_waves` —
independent sub-slab row updates emitted alternating so one slab's
prefix-max chain latency hides under the other's issue slots), at the
bench roofline shape (B=1024, LA=LB=512, W=128).

Reps of all variants INTERLEAVE inside one rotation (CLAUDE.md: relay
throughput swings ~10x across minutes; only back-to-back reps are
comparable). Each variant's first call pays its one-time remote
compile. Prints one JSON line with best-of-N Gcells/s per variant.

Usage: python benchmarks/waves_ab.py
"""
import sys, json, os

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench

VARIANTS = (1, 2, 4)
reps = {}
for w in VARIANTS:
    print(f"[waves_ab] preparing waves={w} (compile on first touch)",
          flush=True)
    reps[w] = bench.kernel_roofline_prepare(waves=w)

best = {w: 0.0 for w in VARIANTS}
N = int(os.environ.get("WAVES_AB_REPS", "6"))
for r in range(N):
    for w in VARIANTS:
        g, _ = reps[w]()
        best[w] = max(best[w], g)
        print(f"[waves_ab] rep {r} waves={w}: {g:.2f} Gcells/s", flush=True)

out = {f"waves{w}_gcells_per_sec": round(best[w], 2) for w in VARIANTS}
out["speedup_w2"] = round(best[2] / best[1], 3) if best[1] else 0.0
out["speedup_w4"] = round(best[4] / best[1], 3) if best[1] else 0.0
print(json.dumps(out))
