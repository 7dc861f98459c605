"""Multi-chip sharding of the pipeline's hot stages.

The reference scales with a single-node thread pool over shared memory
(reference: src/MultithreadedObject.hpp:33-99). The TPU-native design
shards over a `jax.sharding.Mesh`:

- candidate pairs are data-parallel over the ``pairs`` axis (the
  equivalent of the reference's dynamic batch scheduler,
  MultithreadedObject.hpp:49-54 — here the load is balanced up front
  by shape bucketing, then split evenly);
- LowHash features are data-parallel over reads, with bucket exchange
  expressed as an all-to-all (reference's shared-memory bucket fill,
  src/LowHash0.cpp:169-182);
- the marker-graph union-find runs min-hooking rounds edge-parallel
  with a cross-device min-reduction, then pointer-jumping on the
  replicated label array (reference's lock-free CAS DSU,
  src/dset64-gccAtomic.hpp, already converges with the same O(log)
  flattening passes).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map_new

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map_new(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from shasta_tpu.utils import jaxsetup  # noqa: F401
from shasta_tpu.ops.align import _banded_forward


def make_mesh(n_devices: Optional[int] = None, axis: str = "pairs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def fetch(x) -> np.ndarray:
    """Device->host fetch that also works for global arrays spanning
    non-addressable devices (multi-process meshes): reshard to fully
    replicated first (an all_gather over the mesh), then read the local
    copy. Every process must call this at the same point — true for
    the pipeline's SPMD-replicated host passes."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    rep = jax.jit(
        lambda a: a,
        out_shardings=NamedSharding(x.sharding.mesh, P()),
    )(x)
    return np.asarray(rep)


def fetch_tree(x):
    """``fetch`` mapped over a tuple/list of arrays."""
    if isinstance(x, (tuple, list)):
        return type(x)(fetch_tree(e) for e in x)
    return fetch(x)


def multiprocess() -> bool:
    return jax.process_count() > 1


def put_replicated(x, mesh: Mesh):
    """Place an array fully replicated over every device of ``mesh``
    (multi-process safe: each process contributes its local copy)."""
    spec = P(*([None] * np.ndim(x)))
    sharding = NamedSharding(mesh, spec)
    if multiprocess():
        host = np.asarray(x)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )
    return jax.device_put(x, sharding)


# ---------------------------------------------------------------------------
# Sharded banded alignment (data-parallel over candidate pairs)
# ---------------------------------------------------------------------------


def sharded_banded_forward(
    mesh: Mesh,
    a: jnp.ndarray,  # (B, LA) int32, B divisible by mesh size
    a_len: jnp.ndarray,
    b: jnp.ndarray,  # (B, LB)
    b_len: jnp.ndarray,
    band_min: jnp.ndarray,
    *,
    W: int,
    match: int = 6,
    mismatch: int = -1,
    gap: int = -1,
):
    """The full-batch DP forward pass sharded over pairs. Each device
    runs the identical scan on its shard; no collectives needed (the
    reduction over pairs happens host-side when metrics are gathered)."""
    axis = mesh.axis_names[0]

    def local(a, a_len, b, b_len, band_min):
        dirs, best_i, best_d, best_val = _banded_forward(
            a, a_len, b, b_len, band_min, W, match, mismatch, gap
        )
        return best_i, best_d, best_val

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_rep=False,
    )
    out = jax.jit(fn)(a, a_len, b, b_len, band_min)
    return fetch_tree(out) if multiprocess() else out


def sharded_forward_traceback(
    mesh: Mesh,
    a: np.ndarray,  # (B, LA) int32, B divisible by mesh size
    a_len: np.ndarray,
    b: np.ndarray,  # (B, LB)
    b_len: np.ndarray,
    band_min: np.ndarray,
    *,
    W: int,
    match: int,
    mismatch: int,
    gap: int,
    n_steps: int,
):
    """Forward DP + traceback for one shape bucket, pairs data-parallel
    over the mesh. Each device runs the identical batched scan on its
    pair shard; results are identical to the single-device path (the
    1-vs-N-device pipeline identity test relies on this)."""
    from shasta_tpu.ops.align import traceback as _traceback

    axis = mesh.axis_names[0]

    def local(a, a_len, b, b_len, bm):
        dirs, best_i, best_d, _best_val = _banded_forward(
            a, a_len, b, b_len, bm, W, match, mismatch, gap
        )
        m0, m1 = _traceback(dirs, a, b, bm, best_i, best_d, n_steps=n_steps)
        return m0, m1  # (n_steps, B_local) each

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(None, axis), P(None, axis)),
        check_rep=False,
    )
    out = jax.jit(fn)(a, a_len, b, b_len, band_min)
    # Multi-process meshes: the pair-sharded outputs span devices of
    # other processes; materialize the full result on every host so
    # the (replicated) host passes stay in lockstep.
    return fetch_tree(out) if multiprocess() else out


# ---------------------------------------------------------------------------
# Sharded LowHash feature hashing + bucket histogram (all-to-all shape)
# ---------------------------------------------------------------------------


def _mix64(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """splitmix64-style mixer on uint32 pairs (device-friendly stand-in
    for MurmurHash64A in the sharded path; the host path uses the exact
    Murmur hash — see shasta_tpu.ops.hashing)."""
    x = x.astype(jnp.uint32)
    h = x ^ (seed.astype(jnp.uint32))
    h = (h ^ (h >> 16)) * jnp.uint32(0x7FEB352D)
    h = (h ^ (h >> 15)) * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def sharded_lowhash_step(
    mesh: Mesh,
    features: jnp.ndarray,  # (N, m) uint32, N divisible by mesh size
    seed: int,
    log2_buckets: int,
):
    """Hash features and histogram their bucket ids, reads sharded over
    devices and the histogram psum-reduced across the mesh — the
    collective skeleton of the LowHash bucket exchange."""
    axis = mesh.axis_names[0]
    n_buckets = 1 << log2_buckets

    def local(feats):
        h = jnp.zeros(feats.shape[0], jnp.uint32)
        for j in range(feats.shape[1]):
            h = _mix64(feats[:, j] ^ h, jnp.uint32(seed * 37 + j))
        bucket = (h & jnp.uint32(n_buckets - 1)).astype(jnp.int32)
        hist = jnp.zeros((n_buckets,), jnp.int32).at[bucket].add(1)
        hist = jax.lax.psum(hist, axis)
        return h, bucket, hist

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis), P(axis), P()),
        check_rep=False,
    )
    out = jax.jit(fn)(features)
    return fetch_tree(out) if multiprocess() else out


def sharded_find_candidates(
    mesh: Mesh,
    markers,
    params,
    is_palindromic: Optional[np.ndarray] = None,
):
    """Full LowHash candidate generation with the bucket exchange
    expressed as a device all_to_all over the mesh — the multi-host
    skeleton BASELINE.json names ("LowHash buckets exchanged via
    all-to-all").

    Division of labor per iteration:
    - feature hashing runs per-shard on host (MurmurHash64A needs
      uint64, which TPUs lack; the hash is a trivial fraction of the
      work) — each shard hashes only its own reads;
    - bucket routing runs on device: entries are binned by owner
      device (bucket id modulo mesh size) into fixed-size padded
      buffers and exchanged with ``lax.all_to_all``;
    - pair expansion runs per-destination-shard on the now-local
      buckets (same sort/group code as the host path).

    Produces exactly the same CandidatePairs as the single-host
    implementation (tests assert equality on a virtual mesh).
    """
    from shasta_tpu.ops import lowhash as LH

    axis = mesh.axis_names[0]
    D = mesh.devices.size
    n_or = markers.oriented_read_count

    log2_buckets = params.log2_bucket_count
    if log2_buckets == 0:
        log2_buckets = LH._auto_log2_bucket_count(
            markers.total_count, params.hash_fraction
        )
    mask = np.uint64((1 << log2_buckets) - 1)
    hash_threshold = np.uint64(
        min(int(params.hash_fraction * float(2**64)), 2**64 - 1)
    )
    exclude = None
    if is_palindromic is not None:
        exclude = np.repeat(is_palindromic, 2)
    min_bucket = max(2, params.min_bucket_size)

    # Static all_to_all exchange over buf (D_src, D_dest, CAP, 4):
    # device s holds buf[s]; after the exchange device d holds
    # out[d, s] = the entries source s sent to destination d.
    def exchange(buf):
        def local(b):  # local block (1, D, cap, 4)
            x = b[0]
            x = jax.lax.all_to_all(x, axis, 0, 0, tiled=False)
            return x[None]

        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=P(axis),
            out_specs=P(axis),
            check_rep=False,
        )
        out = fn(buf)
        return fetch(out) if multiprocess() else out

    pair_keys = []
    for it in range(params.iteration_count):
        orids, hashes = LH.compute_feature_hashes(
            markers, params.m, it * 37, exclude
        )
        low = hashes < hash_threshold
        orids, hashes = orids[low], hashes[low]
        if orids.shape[0] == 0:
            continue
        buckets = (hashes & mask).astype(np.int64)
        hash_high = (hashes >> np.uint64(32)).astype(np.int64)

        # Host-side shard by source device (reads data-parallel).
        src_dev = (orids * D) // (n_or if n_or else 1)
        src_dev = np.clip(src_dev, 0, D - 1)
        dest_dev = buckets % D

        lin = src_dev * D + dest_dev
        counts = np.bincount(lin, minlength=D * D)
        cap = max(8, int(counts.max()))
        # Fields: orid, bucket, hash_high lo16, hash_high hi16 — the
        # full 32 collision-filter bits survive int32 transport.
        # Vectorized fill: sort entries by (src, dest) cell, slot =
        # rank within the cell.
        order0 = np.argsort(lin, kind="stable")
        lin_s = lin[order0]
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        slot = np.arange(lin_s.shape[0], dtype=np.int64) - starts[lin_s]
        buf = np.full((D * D, cap, 4), -1, np.int32)
        buf[lin_s, slot, 0] = orids[order0]
        buf[lin_s, slot, 1] = (buckets[order0] & 0x7FFFFFFF).astype(np.int32)
        buf[lin_s, slot, 2] = (hash_high[order0] & 0xFFFF).astype(np.int32)
        buf[lin_s, slot, 3] = ((hash_high[order0] >> 16) & 0xFFFF).astype(np.int32)
        buf = buf.reshape(D, D, cap, 4)

        # Device all_to_all: buf[s] lives on device s; after the
        # exchange device d holds buf[:, d] (all entries destined to
        # its bucket range).
        out = np.asarray(exchange(jnp.asarray(buf)))

        # Per-destination-shard pair expansion (host, per device).
        for d in range(D):
            entries = out[d].reshape(-1, 4)
            entries = entries[entries[:, 0] >= 0]
            if entries.shape[0] == 0:
                continue
            o = entries[:, 0].astype(np.int64)
            b = entries[:, 1].astype(np.uint64)
            hh = entries[:, 2].astype(np.uint64) | (
                entries[:, 3].astype(np.uint64) << np.uint64(16)
            )
            order = np.argsort(b, kind="stable")
            b, o, hh = b[order], o[order], hh[order]
            is_new = np.empty(b.shape[0], dtype=bool)
            is_new[0] = True
            np.not_equal(b[1:], b[:-1], out=is_new[1:])
            gid = np.cumsum(is_new) - 1
            gsize = np.bincount(gid)
            ebs = gsize[gid]
            usable = (ebs >= min_bucket) & (ebs <= params.max_bucket_size)
            if not usable.any():
                continue
            ub, uo, uh = b[usable], o[usable], hh[usable]
            key = (ub << np.uint64(32)) | uh
            order2 = np.argsort(key, kind="stable")
            key, uo = key[order2], uo[order2]
            is_new2 = np.empty(key.shape[0], dtype=bool)
            is_new2[0] = True
            np.not_equal(key[1:], key[:-1], out=is_new2[1:])
            gid2 = np.cumsum(is_new2) - 1
            gsize2 = np.bincount(gid2)
            pairs = LH._pairs_within_groups(uo, gid2, gsize2)
            if pairs is not None:
                pair_keys.append(pairs)

    if not pair_keys:
        return LH.CandidatePairs(
            read_id0=np.zeros(0, np.int32),
            read_id1=np.zeros(0, np.int32),
            same_strand=np.zeros(0, bool),
            frequency=np.zeros(0, np.int32),
        )
    all_keys = np.concatenate(pair_keys)
    uniq, freq = np.unique(all_keys, return_counts=True)
    keep = freq >= params.min_frequency
    uniq, freq = uniq[keep], freq[keep]
    return LH.CandidatePairs(
        read_id0=(uniq >> np.uint64(33)).astype(np.int32),
        read_id1=((uniq >> np.uint64(1)) & np.uint64(0xFFFFFFFF)).astype(np.int32),
        same_strand=(uniq & np.uint64(1)).astype(bool),
        frequency=freq.astype(np.int32),
    )


# ---------------------------------------------------------------------------
# Sharded union-find (min-hooking + pointer jumping)
# ---------------------------------------------------------------------------


def sharded_union_find(
    mesh: Mesh,
    n: int,
    u: jnp.ndarray,  # (E,) int32/int64, E divisible by mesh size
    v: jnp.ndarray,
    n_rounds: int = 16,
) -> jnp.ndarray:
    """Connected-component labels via edge-parallel min-hooking: each
    device proposes scatter-min updates from its edge shard; proposals
    combine with a cross-device elementwise min (pmin); pointer jumping
    compresses. Matches the host union_find_labels semantics
    (label = min member id) for graphs whose components converge within
    n_rounds hooking rounds."""
    axis = mesh.axis_names[0]

    def local(u, v):
        label = jnp.arange(n, dtype=jnp.int32)

        def round_fn(label, _):
            lu = label[u]
            lv = label[v]
            lo = jnp.minimum(lu, lv)
            hi = jnp.maximum(lu, lv)
            prop = label.at[hi].min(lo)
            label = jax.lax.pmin(prop, axis)

            def jump(lbl, _):
                return lbl[lbl], None

            label, _ = jax.lax.scan(jump, label, None, length=8)
            return label, None

        label, _ = jax.lax.scan(round_fn, label, None, length=n_rounds)
        return label

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(None),
        check_rep=False,
    )
    return jax.jit(fn)(u, v)


def sharded_pallas_align(
    mesh: Mesh,
    a: np.ndarray,
    a_len: np.ndarray,
    b: np.ndarray,
    b_len: np.ndarray,
    band_min: np.ndarray,
    *,
    LA: int,
    LB: int,
    W: int,
    match: int,
    mismatch: int,
    gap: int,
):
    """The fused Pallas alignment kernel with pairs sharded over the
    mesh (multi-chip TPU pods; single-chip runs call the kernel
    directly)."""
    from shasta_tpu.ops import align_pallas

    axis = mesh.axis_names[0]

    def local(a, a_len, b, b_len, bm):
        return align_pallas.banded_align_pairs(
            a, a_len, b, b_len, bm,
            LA=LA, LB=LB, W=W, match=match, mismatch=mismatch, gap=gap,
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )
    out = jax.jit(fn)(a, a_len, b, b_len, band_min)
    return fetch(out) if multiprocess() else out


# ---------------------------------------------------------------------------
# Sharded device-side take-feed (the fast batch construction, meshed)
# ---------------------------------------------------------------------------
#
# The single-chip path feeds the Pallas kernel with whole-row takes
# from device-resident per-length-class matrices (ops/align.py
# _DeviceCsr) — ~60x faster batch construction than host-side row
# padding. Under a mesh the class matrices are REPLICATED over the
# devices (they are read-only, like the reference's shared-memory
# reads every thread gathers from, src/MemoryMappedVector.hpp:72-97)
# and the per-pair row ids shard over the ``pairs`` axis, so each
# device takes and aligns only its shard.


@functools.lru_cache(maxsize=None)
def _align_take_fn(mesh, LA, LB, W, match, mismatch, gap, pack_u8):
    from shasta_tpu.ops import align_pallas

    axis = mesh.axis_names[0]

    def local(mat_a, rowa, mat_b, rowb, a_len, b_len, bm):
        a = align_pallas._take_rows(mat_a, rowa, a_len, fill=-1)
        b = align_pallas._take_rows(mat_b, rowb, b_len, fill=-2)
        return align_pallas.banded_align_pairs(
            a, a_len, b, b_len, bm,
            LA=LA, LB=LB, W=W, match=match, mismatch=mismatch, gap=gap,
            pack_u8=pack_u8,
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None), P(axis), P(None, None), P(axis),
            P(axis), P(axis), P(axis),
        ),
        out_specs=(P(axis), P(axis)) if pack_u8 else P(axis),
        check_rep=False,
    )
    return jax.jit(fn)


def sharded_align_take(
    mesh, mat_a, rowa, mat_b, rowb, a_len, b_len, band_min,
    *, LA, LB, W, match, mismatch, gap, pack_u8,
):
    """Take-feed + banded DP with pairs sharded over the mesh and the
    class matrices replicated. Output identical to
    align_pallas.banded_align_pairs_take on the same rows."""
    fn = _align_take_fn(mesh, LA, LB, W, match, mismatch, gap, pack_u8)
    out = fn(
        mat_a, jnp.asarray(rowa, jnp.int32), mat_b,
        jnp.asarray(rowb, jnp.int32), jnp.asarray(a_len, jnp.int32),
        jnp.asarray(b_len, jnp.int32), jnp.asarray(band_min, jnp.int32),
    )
    return fetch_tree(out) if multiprocess() else out


@functools.lru_cache(maxsize=None)
def _band_take_fn(mesh, LA, LB, W, match, mismatch, gap):
    from shasta_tpu.ops import align_pallas

    axis = mesh.axis_names[0]

    def local(mat_a, rowa, ord_a, mat_b, rowb, ord_b, a_len, b_len, bm):
        a = align_pallas._take_rows(mat_a, rowa, a_len, fill=-1)
        b = align_pallas._take_rows(mat_b, rowb, b_len, fill=-2)
        pack = W <= 254
        out = align_pallas.banded_align_pairs(
            a, a_len, b, b_len, bm,
            LA=LA, LB=LB, W=W, match=match, mismatch=mismatch, gap=gap,
            pack_u8=pack,
        )
        orda = align_pallas._take_rows(ord_a, rowa, a_len, fill=0)
        ordb = align_pallas._take_rows(ord_b, rowb, b_len, fill=0)
        if pack:
            _met, delta = out
            return align_pallas.band_reduce(delta, bm, orda, ordb, packed=True)
        return align_pallas.band_reduce(
            out[:, 16:], bm, orda, ordb, packed=False
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None), P(axis), P(None, None),
            P(None, None), P(axis), P(None, None),
            P(axis), P(axis), P(axis),
        ),
        out_specs=P(axis),
        check_rep=False,
    )
    return jax.jit(fn)


def sharded_band_take(
    mesh, mat_a, rowa, ord_a, mat_b, rowb, ord_b, a_len, b_len, band_min,
    *, LA, LB, W, match, mismatch, gap,
):
    """Band-discovery (take-feed -> DP -> on-device band reduction)
    with pairs sharded over the mesh. Returns (B, 3) int32
    [match_count, min_offset, max_offset] like banded_align_band_take."""
    fn = _band_take_fn(mesh, LA, LB, W, match, mismatch, gap)
    out = fn(
        mat_a, jnp.asarray(rowa, jnp.int32), ord_a,
        mat_b, jnp.asarray(rowb, jnp.int32), ord_b,
        jnp.asarray(a_len, jnp.int32), jnp.asarray(b_len, jnp.int32),
        jnp.asarray(band_min, jnp.int32),
    )
    return fetch(out) if multiprocess() else out


def sharded_union_find_labels(
    mesh: Mesh, n: int, u: np.ndarray, v: np.ndarray
) -> np.ndarray:
    """Host wrapper around :func:`sharded_union_find` for the pipeline:
    pads the unite pairs to the mesh size, runs the device min-hooking
    rounds, then verifies convergence the way the reference audits its
    parent-flattening passes (reference:
    src/AssemblerMarkerGraph.cpp:141-151) — any residual unions (rare:
    components with very long hooking chains) are finished on host, so
    the result is always exactly the min-member labeling of
    ``union_find_labels``."""
    from shasta_tpu.graph.marker_graph import union_find_labels

    if u.shape[0] == 0:
        return np.arange(n, dtype=np.int64)
    if n >= 2**31:
        # Device labels are int32 (TPU-friendly); beyond that the
        # label table must be sharded too (future work) — host path.
        return union_find_labels(n, u, v)
    D = mesh.devices.size
    u = np.asarray(u, np.int64)
    v = np.asarray(v, np.int64)
    pad = (-u.shape[0]) % D
    if pad:
        # Self-loop padding unites nothing.
        u_p = np.concatenate([u, np.zeros(pad, np.int64)])
        v_p = np.concatenate([v, np.zeros(pad, np.int64)])
    else:
        u_p, v_p = u, v
    label = np.asarray(
        sharded_union_find(
            mesh,
            n,
            jnp.asarray(u_p.astype(np.int32)),
            jnp.asarray(v_p.astype(np.int32)),
        )
    ).astype(np.int64)
    # Convergence audit + host finish for any stragglers.
    while True:
        nl = label[label]
        if np.array_equal(nl, label):
            break
        label = nl
    lu, lv = label[u], label[v]
    diff = lu != lv
    if diff.any():
        lo = np.minimum(lu[diff], lv[diff])
        hi = np.maximum(lu[diff], lv[diff])
        while True:
            np.minimum.at(label, hi, lo)
            while True:
                nl = label[label]
                if np.array_equal(nl, label):
                    break
                label = nl
            lu, lv = label[u], label[v]
            diff = lu != lv
            if not diff.any():
                break
            lo = np.minimum(lu[diff], lv[diff])
            hi = np.maximum(lu[diff], lv[diff])
    return label


# ---------------------------------------------------------------------------
# One "full step": the compute core of the pipeline under one jit
# ---------------------------------------------------------------------------


def full_step(
    mesh: Mesh,
    features: jnp.ndarray,  # (N, m) uint32
    a: jnp.ndarray,  # (B, LA) int32 marker sequences
    a_len: jnp.ndarray,
    b: jnp.ndarray,
    b_len: jnp.ndarray,
    band_min: jnp.ndarray,
    unite_u: jnp.ndarray,  # (E,)
    unite_v: jnp.ndarray,
    n_markers: int,
    *,
    W: int = 128,
    log2_buckets: int = 8,
):
    """LowHash hashing -> banded alignment -> union-find, all sharded
    over the mesh. This is the multi-chip 'training step' equivalent:
    the three collective-bearing hot stages chained under jit."""
    axis = mesh.axis_names[0]
    n_buckets = 1 << log2_buckets

    def local(features, a, a_len, b, b_len, band_min, uu, vv):
        # LowHash
        h = jnp.zeros(features.shape[0], jnp.uint32)
        for j in range(features.shape[1]):
            h = _mix64(features[:, j] ^ h, jnp.uint32(37 + j))
        bucket = (h & jnp.uint32(n_buckets - 1)).astype(jnp.int32)
        hist = jax.lax.psum(
            jnp.zeros((n_buckets,), jnp.int32).at[bucket].add(1), axis
        )
        # Alignment
        dirs, best_i, best_d, best_val = _banded_forward(
            a, a_len, b, b_len, band_min, W, 6, -1, -1
        )
        # Union-find rounds
        label = jnp.arange(n_markers, dtype=jnp.int32)

        def round_fn(label, _):
            lu = label[uu]
            lv = label[vv]
            prop = label.at[jnp.maximum(lu, lv)].min(jnp.minimum(lu, lv))
            label = jax.lax.pmin(prop, axis)
            label = label[label]
            label = label[label]
            return label, None

        label, _ = jax.lax.scan(round_fn, label, None, length=8)
        return hist, best_val, label

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis, None),
            P(axis, None),
            P(axis),
            P(axis, None),
            P(axis),
            P(axis),
            P(axis),
            P(axis),
        ),
        out_specs=(P(), P(axis), P(None)),
        check_rep=False,
    )
    return jax.jit(fn)(features, a, a_len, b, b_len, band_min, unite_u, unite_v)
