// Native runtime components for shasta_tpu.
//
// The reference implements its data loader and graph passes in
// multithreaded C++ (reference: src/ReadLoader.cpp, the transitive
// reduction BFS at src/AssemblerMarkerGraph.cpp:2279, the chimera BFS
// at src/AssemblerReadGraph.cpp:355). The TPU build keeps the compute
// path on the device; these host-side passes are the pieces that
// remain CPU-bound, so they get native implementations here, exposed
// through a plain C ABI consumed via ctypes
// (shasta_tpu/native.py). Semantics match the Python implementations
// bit for bit; tests assert equality.

#include <cstdint>
#include <cstring>
#include <deque>
#include <functional>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// MurmurHash64A over rows of m little-endian uint32 words (the LowHash
// feature hash, reference: src/MurmurHash2.cpp MurmurHash64A). One
// memory pass, threaded — the numpy equivalent makes ~12 full-array
// passes per iteration and dominates LowHash wall time on the host.
// Bit-identical to shasta_tpu.ops.hashing.murmur64_features.
// ---------------------------------------------------------------------------

static inline uint64_t murmur64_row(
    const uint32_t* w, int64_t m, uint64_t seed)
{
    const uint64_t M = 0xc6a4a7935bd1e995ULL;
    const int r = 47;
    uint64_t h = seed ^ ((uint64_t)(4 * m) * M);
    int64_t i = 0;
    for (; i + 1 < m; i += 2) {
        uint64_t k = (uint64_t)w[i] | ((uint64_t)w[i + 1] << 32);
        k *= M;
        k ^= k >> r;
        k *= M;
        h ^= k;
        h *= M;
    }
    if (m & 1) {
        h ^= (uint64_t)w[m - 1];
        h *= M;
    }
    h ^= h >> r;
    h *= M;
    h ^= h >> r;
    return h;
}

void murmur64_features(
    const uint32_t* feats,  // n x m row-major
    int64_t n,
    int64_t m,
    uint64_t seed,
    uint64_t* out)
{
    int n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 8) n_threads = 8;
    if (n < 1 << 16) n_threads = 1;
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            out[i] = murmur64_row(feats + i * m, m, seed);
        }
    };
    if (n_threads == 1) {
        work(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t lo = t * chunk;
        int64_t hi = lo + chunk < n ? lo + chunk : n;
        if (lo >= hi) break;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// FASTA parsing: two-call protocol (measure, then fill).
// Returns 0 on success.
// ---------------------------------------------------------------------------

// Pass 1: count sequences and total bases.
int fasta_measure(const char* data, int64_t n, int64_t* n_seqs, int64_t* n_bases)
{
    int64_t seqs = 0;
    int64_t bases = 0;
    int64_t i = 0;
    while (i < n) {
        if (data[i] == '>') {
            ++seqs;
            while (i < n && data[i] != '\n') ++i;  // skip header
            ++i;
        } else {
            for (; i < n && data[i] != '>'; ++i) {
                const char c = data[i];
                if (c != '\n' && c != '\r') ++bases;
            }
        }
    }
    *n_seqs = seqs;
    *n_bases = bases;
    return 0;
}

// Pass 2: fill 2-bit codes (255 = invalid), offsets, and header
// spans (byte offsets of each header line, excluding '>').
int fasta_fill(
    const char* data, int64_t n,
    uint8_t* codes,          // [n_bases]
    int64_t* offsets,        // [n_seqs + 1]
    int64_t* header_begin,   // [n_seqs]
    int64_t* header_end)     // [n_seqs]
{
    static uint8_t lut[256];
    static bool lut_init = false;
    if (!lut_init) {
        memset(lut, 255, sizeof(lut));
        lut[(int)'A'] = 0; lut[(int)'a'] = 0;
        lut[(int)'C'] = 1; lut[(int)'c'] = 1;
        lut[(int)'G'] = 2; lut[(int)'g'] = 2;
        lut[(int)'T'] = 3; lut[(int)'t'] = 3;
        lut_init = true;
    }
    int64_t seq = -1;
    int64_t w = 0;
    int64_t i = 0;
    offsets[0] = 0;
    while (i < n) {
        if (data[i] == '>') {
            if (seq >= 0) offsets[seq + 1] = w;
            ++seq;
            ++i;
            header_begin[seq] = i;
            while (i < n && data[i] != '\n') ++i;
            header_end[seq] = i;
            ++i;
        } else {
            for (; i < n && data[i] != '>'; ++i) {
                const char c = data[i];
                if (c != '\n' && c != '\r') codes[w++] = lut[(unsigned char)c];
            }
        }
    }
    if (seq >= 0) offsets[seq + 1] = w;
    return 0;
}

// ---------------------------------------------------------------------------
// Run-length encoding of a flat base array partitioned by offsets.
// Two-call protocol again.
// ---------------------------------------------------------------------------

static void rle_threads(int64_t n_seqs, int min_seqs,
                        const std::function<void(int64_t, int64_t)>& work)
{
    int n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 8) n_threads = 8;
    if (n_threads == 1 || n_seqs < min_seqs) {
        work(0, n_seqs);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n_seqs + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t lo = t * chunk, hi = lo + chunk < n_seqs ? lo + chunk : n_seqs;
        if (lo >= hi) break;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
}

int rle_measure(
    const uint8_t* codes, const int64_t* offsets, int64_t n_seqs,
    int64_t* n_rle)  // n_rle: per-seq run counts [n_seqs] (threaded)
{
    rle_threads(n_seqs, 64, [&](int64_t s0, int64_t s1) {
        for (int64_t s = s0; s < s1; ++s) {
            int64_t lo = offsets[s], hi = offsets[s + 1];
            int64_t total = 0;
            if (lo != hi) {
                ++total;
                for (int64_t i = lo + 1; i < hi; ++i)
                    if (codes[i] != codes[i - 1]) ++total;
            }
            n_rle[s] = total;
        }
    });
    return 0;
}

int rle_fill(
    const uint8_t* codes, const int64_t* offsets, int64_t n_seqs,
    uint8_t* rle, int64_t* counts, const int64_t* rle_offsets)
{
    // rle_offsets precomputed by the caller from rle_measure's
    // per-seq counts, so every sequence fills independently (threaded).
    rle_threads(n_seqs, 64, [&](int64_t s0, int64_t s1) {
        for (int64_t s = s0; s < s1; ++s) {
            int64_t lo = offsets[s], hi = offsets[s + 1];
            int64_t w = rle_offsets[s];
            int64_t i = lo;
            while (i < hi) {
                const uint8_t c = codes[i];
                int64_t run = 1;
                while (i + run < hi && codes[i + run] == c) ++run;
                rle[w] = c;
                counts[w] = run;
                ++w;
                i += run;
            }
        }
    });
    return 0;
}

// Variant for the read store: repeat counts are stored as uint8 (the
// reference discards reads containing a run > 255, so wide counts are
// only ever needed to DETECT long runs). Emits clipped uint8 counts
// plus a per-sequence has-long-run flag, avoiding two full-size
// count-array conversions (int64 -> int32 -> uint8) on the hot
// addReads path.
int rle_fill_u8(
    const uint8_t* codes, const int64_t* offsets, int64_t n_seqs,
    uint8_t* rle, uint8_t* counts, const int64_t* rle_offsets,
    uint8_t* seq_has_long_run)
{
    rle_threads(n_seqs, 64, [&](int64_t s0, int64_t s1) {
        for (int64_t s = s0; s < s1; ++s) {
            int64_t lo = offsets[s], hi = offsets[s + 1];
            int64_t w = rle_offsets[s];
            int64_t i = lo;
            uint8_t has_long = 0;
            while (i < hi) {
                const uint8_t c = codes[i];
                int64_t run = 1;
                while (i + run < hi && codes[i + run] == c) ++run;
                rle[w] = c;
                counts[w] = run > 255 ? 255 : (uint8_t)run;
                has_long |= run > 255;
                ++w;
                i += run;
            }
            seq_has_long_run[s] = has_long;
        }
    });
    return 0;
}

// ---------------------------------------------------------------------------
// Transitive reduction phase 3: per-edge BFS in increasing coverage
// order (reference: src/AssemblerMarkerGraph.cpp:2400-2470). The
// low-coverage and long-skip phases stay in (vectorized) Python.
// `removed` carries the phase-1/2 flags in and the final flags out.
// ---------------------------------------------------------------------------

int transitive_reduction_bfs(
    int64_t n_vertices,
    int64_t n_edges,
    const int64_t* source,
    const int64_t* target,
    const int64_t* rc_edge,
    const int64_t* by_source_off,   // [n_vertices + 1]
    const int64_t* by_source,       // CSR of out-edge ids
    const int64_t* candidates,      // edge ids, increasing coverage
    int64_t n_candidates,
    int64_t max_distance,
    uint8_t* removed)               // [n_edges] in/out
{
    std::vector<int64_t> dist(n_vertices, -1);
    std::vector<int64_t> seen;
    std::deque<int64_t> q;

    for (int64_t ci = 0; ci < n_candidates; ++ci) {
        const int64_t e = candidates[ci];
        if (removed[e]) continue;
        const int64_t u0 = source[e];
        const int64_t u1 = target[e];

        q.clear();
        seen.clear();
        q.push_back(u0);
        dist[u0] = 0;
        seen.push_back(u0);
        bool found = false;
        while (!q.empty() && !found) {
            const int64_t v0 = q.front();
            q.pop_front();
            const int64_t d1 = dist[v0] + 1;
            for (int64_t t = by_source_off[v0]; t < by_source_off[v0 + 1]; ++t) {
                const int64_t ei = by_source[t];
                if (ei == e || removed[ei]) continue;
                const int64_t v1 = target[ei];
                if (dist[v1] >= 0) continue;
                if (v1 == u1) { found = true; break; }
                dist[v1] = d1;
                seen.push_back(v1);
                if (d1 < max_distance) q.push_back(v1);
            }
        }
        if (found) {
            removed[e] = 1;
            const int64_t rc = rc_edge[e];
            if (rc >= 0) removed[rc] = 1;
        }
        for (const int64_t v : seen) dist[v] = -1;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Chimera flagging (reference: src/AssemblerReadGraph.cpp:355-580).
// ---------------------------------------------------------------------------

int flag_chimeric_reads(
    int64_t n_reads,
    int64_t n_edges,
    const int64_t* orid0,
    const int64_t* orid1,
    const uint8_t* crosses,
    const int64_t* adj_off,    // [2*n_reads + 1]
    const int64_t* adj_edges,  // CSR of incident edge ids
    int64_t max_distance,
    uint8_t* is_chimeric)      // [n_reads] out
{
    const int64_t n_or = 2 * n_reads;
    std::vector<int64_t> local_id(n_or, -1);
    std::vector<int64_t> verts, dists, parent;
    std::deque<int64_t> frontier;

    auto find = [&parent](int64_t x) {
        while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
        return x;
    };

    for (int64_t read = 0; read < n_reads; ++read) {
        is_chimeric[read] = 0;
        if (max_distance == 0) continue;
        const int64_t start = 2 * read;
        verts.clear();
        dists.clear();
        verts.push_back(start);
        dists.push_back(0);
        local_id[start] = 0;
        frontier.clear();
        frontier.push_back(start);
        int64_t d = 0;
        while (!frontier.empty() && d < max_distance) {
            ++d;
            const size_t level = frontier.size();
            for (size_t t = 0; t < level; ++t) {
                const int64_t v0 = frontier.front();
                frontier.pop_front();
                for (int64_t a = adj_off[v0]; a < adj_off[v0 + 1]; ++a) {
                    const int64_t ei = adj_edges[a];
                    if (crosses[ei]) continue;
                    const int64_t v1 = (orid0[ei] == v0) ? orid1[ei] : orid0[ei];
                    if (local_id[v1] >= 0) continue;
                    local_id[v1] = (int64_t)verts.size();
                    verts.push_back(v1);
                    dists.push_back(d);
                    frontier.push_back(v1);
                }
            }
        }

        parent.resize(verts.size());
        for (size_t i = 0; i < verts.size(); ++i) parent[i] = (int64_t)i;
        for (size_t u = 0; u < verts.size(); ++u) {
            const int64_t v0 = verts[u];
            if ((v0 >> 1) == read) continue;
            for (int64_t a = adj_off[v0]; a < adj_off[v0 + 1]; ++a) {
                const int64_t ei = adj_edges[a];
                if (crosses[ei]) continue;
                const int64_t v1 = (orid0[ei] == v0) ? orid1[ei] : orid0[ei];
                if ((v1 >> 1) == read) continue;
                if (local_id[v1] >= 0) {
                    int64_t ra = find((int64_t)u), rb = find(local_id[v1]);
                    if (ra != rb) parent[ra > rb ? ra : rb] = (ra > rb ? rb : ra);
                }
            }
        }

        int64_t component = -1;
        for (size_t u = 0; u < verts.size(); ++u) {
            if (dists[u] != max_distance || (verts[u] >> 1) == read) continue;
            const int64_t c = find((int64_t)u);
            if (component == -1) component = c;
            else if (c != component) { is_chimeric[read] = 1; break; }
        }
        for (const int64_t v : verts) local_id[v] = -1;
    }
    return 0;
}

// Strand separation method 2's sequential spanning-forest pass
// (reference: flagCrossStrandReadGraphEdges2,
// src/AssemblerReadGraph.cpp:1051): process RC edge pairs in the
// caller-supplied order over a union-find of oriented reads; a pair
// whose addition would merge a component with its own reverse
// complement is flagged cross-strand and not added. The ordering
// (decreasing aligned-marker count) is computed vectorized in Python;
// this is just the inherently sequential DSU sweep.
int cross_strand_edges2(
    int64_t n_or,
    const int64_t* orid0,
    const int64_t* orid1,
    const int64_t* pairs,      // even edge ids, processing order
    int64_t n_pairs,
    uint8_t* crosses,          // [n_edges] in/out
    int64_t* n_flagged)
{
    std::vector<int64_t> parent(n_or);
    for (int64_t i = 0; i < n_or; ++i) parent[i] = i;
    auto find = [&parent](int64_t x) {
        while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
        return x;
    };
    auto unite = [&parent, &find](int64_t a, int64_t b) {
        const int64_t ra = find(a), rb = find(b);
        if (ra != rb) parent[ra > rb ? ra : rb] = (ra > rb ? rb : ra);
    };

    int64_t flagged = 0;
    for (int64_t t = 0; t < n_pairs; ++t) {
        const int64_t e = pairs[t];
        int64_t A0 = orid0[e], B0 = orid1[e];
        int64_t A1 = orid0[e + 1], B1 = orid1[e + 1];
        if ((A1 >> 1) != (A0 >> 1)) { const int64_t tmp = A1; A1 = B1; B1 = tmp; }
        const int64_t a0 = find(A0), b0 = find(B0);
        const int64_t b1 = find(B1);
        if (a0 == b0) continue;
        if (a0 == b1) {
            crosses[e] = 1;
            crosses[e + 1] = 1;
            flagged += 2;
            continue;
        }
        unite(a0, b0);
        unite(find(A1), b1);
    }
    *n_flagged = flagged;
    return 0;
}

// For each read: is (read, 1) reachable from (read, 0) within
// max_distance edges? (strand separation method 1's first phase,
// reference: flagCrossStrandReadGraphEdges1ThreadFunction,
// src/AssemblerReadGraph.cpp:1015-1041)
int near_strand_jump(
    int64_t n_reads,
    const int64_t* orid0,
    const int64_t* orid1,
    const int64_t* adj_off,    // [2*n_reads + 1]
    const int64_t* adj_edges,  // CSR of incident edge ids
    int64_t max_distance,
    uint8_t* is_near)          // [2*n_reads] out
{
    const int64_t n_or = 2 * n_reads;
    std::vector<uint8_t> seen(n_or, 0);
    std::vector<int64_t> touched;
    std::deque<int64_t> frontier;

    for (int64_t v = 0; v < n_or; ++v) is_near[v] = 0;

    for (int64_t read = 0; read < n_reads; ++read) {
        const int64_t start = 2 * read;
        const int64_t goal = start + 1;
        bool found = false;
        touched.clear();
        frontier.clear();
        frontier.push_back(start);
        seen[start] = 1;
        touched.push_back(start);
        int64_t d = 0;
        while (!frontier.empty() && d < max_distance && !found) {
            ++d;
            const size_t level = frontier.size();
            for (size_t t = 0; t < level && !found; ++t) {
                const int64_t v0 = frontier.front();
                frontier.pop_front();
                for (int64_t a = adj_off[v0]; a < adj_off[v0 + 1]; ++a) {
                    const int64_t ei = adj_edges[a];
                    const int64_t v1 = (orid0[ei] == v0) ? orid1[ei] : orid0[ei];
                    if (v1 == goal) { found = true; break; }
                    if (!seen[v1]) {
                        seen[v1] = 1;
                        touched.push_back(v1);
                        frontier.push_back(v1);
                    }
                }
            }
        }
        if (found) {
            is_near[start] = 1;
            is_near[goal] = 1;
        }
        for (const int64_t v : touched) seen[v] = 0;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Marker scan (reference: src/MarkerFinder.cpp — a threaded scan of
// all reads emitting (kmerId, position) per marker, both strands).
// One fused pass per read: the k-mer and its reverse complement roll
// incrementally, the 4^k marker table is probed once per position,
// and both strands' slots fill directly. The numpy equivalent makes
// 10+k full-array passes. Two-call protocol: count, then fill with
// caller-computed CSR offsets. Semantics match data/markers.py
// find_markers bit for bit (tests assert equality).
// ---------------------------------------------------------------------------

void markers_count(
    const uint8_t* flat,
    const int64_t* offsets,
    int64_t n_reads,
    int32_t k,
    const uint8_t* is_marker,
    int64_t* per_read)  // out [n_reads]
{
    int n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 8) n_threads = 8;
    const uint32_t kmask =
        (k >= 16) ? 0xFFFFFFFFu : ((1u << (2 * k)) - 1u);
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; r++) {
            const int64_t b = offsets[r], e = offsets[r + 1];
            int64_t count = 0;
            if (e - b >= k) {
                uint32_t kv = 0;
                for (int64_t p = b; p < b + k - 1; p++) {
                    kv = (kv << 2) | flat[p];
                }
                for (int64_t p = b + k - 1; p < e; p++) {
                    kv = ((kv << 2) | flat[p]) & kmask;
                    count += is_marker[kv];
                }
            }
            per_read[r] = count;
        }
    };
    if (n_threads == 1 || n_reads < 64) {
        work(0, n_reads);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n_reads + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t lo = t * chunk, hi = lo + chunk < n_reads ? lo + chunk : n_reads;
        if (lo >= hi) break;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
}

void markers_fill(
    const uint8_t* flat,
    const int64_t* offsets,
    int64_t n_reads,
    int32_t k,
    const uint8_t* is_marker,
    const int64_t* moff,  // [2*n_reads + 1] oriented CSR offsets
    uint32_t* kmer_ids,   // out, flat
    uint32_t* positions)  // out, flat
{
    int n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 8) n_threads = 8;
    const uint32_t kmask =
        (k >= 16) ? 0xFFFFFFFFu : ((1u << (2 * k)) - 1u);
    const int rc_shift = 2 * (k - 1);
    auto work = [&](int64_t lo_r, int64_t hi_r) {
        for (int64_t r = lo_r; r < hi_r; r++) {
            const int64_t b = offsets[r], e = offsets[r + 1];
            const int64_t len = e - b;
            const int64_t s0 = moff[2 * r];
            const int64_t s1 = moff[2 * r + 1];
            const int64_t count = s1 - s0;
            if (len < k) continue;
            uint32_t kv = 0, rc = 0;
            for (int64_t p = b; p < b + k - 1; p++) {
                kv = (kv << 2) | flat[p];
                rc = (rc >> 2) | ((uint32_t)(3 - flat[p]) << rc_shift);
            }
            int64_t rank = 0;
            for (int64_t p = b + k - 1; p < e; p++) {
                kv = ((kv << 2) | flat[p]) & kmask;
                rc = (rc >> 2) | ((uint32_t)(3 - flat[p]) << rc_shift);
                if (is_marker[kv]) {
                    const uint32_t pos = (uint32_t)(p - b - (k - 1));
                    kmer_ids[s0 + rank] = kv;
                    positions[s0 + rank] = pos;
                    const int64_t j = s1 + (count - 1 - rank);
                    kmer_ids[j] = rc;
                    positions[j] = (uint32_t)(len - k - pos);
                    rank++;
                }
            }
        }
    };
    if (n_threads == 1 || n_reads < 64) {
        work(0, n_reads);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n_reads + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t lo = t * chunk, hi = lo + chunk < n_reads ? lo + chunk : n_reads;
        if (lo >= hi) break;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// Palindrome pre-filter key builder (see ops/palindrome.py): one pass
// over the strand-0 markers emitting, per marker, the side-A key and
// the three bucket-neighbour side-B keys of the (read, bucket,
// kmer-hash, side) layout. The numpy equivalent makes ~15 full-array
// passes over 4n uint64 entries. The caller sorts and scans.
// ---------------------------------------------------------------------------

void palindrome_keys(
    const uint32_t* kmer_ids,  // oriented-read marker CSR flat
    const int64_t* koff,       // oriented offsets [2*n_reads + 1]
    const int64_t* cum0,       // strand-0 marker count before read r
    int64_t n_reads,
    int32_t k,
    int64_t d,
    int64_t max_bucket,
    int32_t kh_bits,
    int32_t sh_b,
    int32_t sh_r,
    uint64_t* out)  // 4 * total strand-0 markers
{
    const uint64_t MUL = 0x9E3779B97F4A7C15ULL;
    const int kh_shift = 64 - kh_bits;
    int n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 8) n_threads = 8;
    auto work = [&](int64_t lo_r, int64_t hi_r) {
        for (int64_t r = lo_r; r < hi_r; r++) {
            const int64_t b = koff[2 * r], e = koff[2 * r + 1];
            const int64_t n = e - b;
            uint64_t* o = out + 4 * cum0[r];
            const uint64_t base_r = (uint64_t)r << sh_r;
            for (int64_t i = 0; i < n; i++) {
                uint32_t x = kmer_ids[b + i];
                uint32_t rc = 0;
                uint32_t xx = x;
                for (int t = 0; t < k; t++) {
                    rc = (rc << 2) | (3u - (xx & 3u));
                    xx >>= 2;
                }
                const uint64_t kh = ((uint64_t)x * MUL) >> kh_shift;
                const uint64_t rh = ((uint64_t)rc * MUL) >> kh_shift;
                const uint64_t base_a = base_r | (kh << 1);
                const uint64_t base_b = base_r | (rh << 1) | 1ULL;
                o[0] = base_a | ((uint64_t)(i / d) << sh_b);
                const int64_t j_rc = (n - 1 - i) / d;
                for (int off = -1; off <= 1; off++) {
                    int64_t bb = j_rc + off;
                    if (bb < 0) bb = 0;
                    if (bb > max_bucket - 1) bb = max_bucket - 1;
                    o[1 + (off + 1)] = base_b | ((uint64_t)bb << sh_b);
                }
                o += 4;
            }
        }
    };
    if (n_threads == 1 || n_reads < 64) {
        work(0, n_reads);
    } else {
        std::vector<std::thread> threads;
        int64_t chunk = (n_reads + n_threads - 1) / n_threads;
        for (int t = 0; t < n_threads; t++) {
            int64_t lo = t * chunk;
            int64_t hi = lo + chunk < n_reads ? lo + chunk : n_reads;
            if (lo >= hi) break;
            threads.emplace_back(work, lo, hi);
        }
        for (auto& th : threads) th.join();
    }
}

// One fused pass over the SORTED palindrome keys: per (read, bucket,
// kmer) group, count the side-A/side-B entries and accumulate
// min(n_a, n_b) into the group's read (the numpy scan makes ~8
// full-array passes over 4n uint64 entries).
void palindrome_scan(
    const uint64_t* keys,  // sorted
    int64_t n,
    int32_t sh_r,          // read field shift
    int64_t* common)       // out [n_reads], caller-zeroed
{
    if (n == 0) return;
    uint64_t cur = keys[0] >> 1;
    int64_t n_a = 0, n_b = 0;
    for (int64_t i = 0; i < n; i++) {
        const uint64_t v = keys[i] >> 1;
        if (v != cur) {
            common[cur >> (sh_r - 1)] += n_a < n_b ? n_a : n_b;
            cur = v;
            n_a = 0;
            n_b = 0;
        }
        if (keys[i] & 1) n_b++; else n_a++;
    }
    common[cur >> (sh_r - 1)] += n_a < n_b ? n_a : n_b;
}

// ---------------------------------------------------------------------------
// Union-find with min-id roots (reference: dset64-gccAtomic.hpp, the
// lock-free DSU driving marker-graph vertex creation). Union always
// links the larger root under the smaller, so each component's final
// root is its minimum element id — identical to the pointer-jumping
// min-label formulation in graph/marker_graph.py (which remains the
// collective-friendly sharded form). Sequential with path halving.
// ---------------------------------------------------------------------------

// Expand the per-alignment matched-ordinal lists into marker-id unite
// pairs (direct + reverse complement), threaded (reference:
// createMarkerGraphVerticesThreadFunction1,
// src/AssemblerMarkerGraph.cpp:540-604). One pass instead of ~12
// full-array numpy passes.
void expand_unite_pairs(
    const int64_t* moff,
    const int64_t* counts,
    const int64_t* orid0,  // per selected alignment
    const int64_t* orid1,
    const int64_t* lo,     // flat ordinal range per alignment
    const int64_t* hi,
    const int64_t* pos,    // output pair offset per alignment (2x ordinals)
    int64_t n_sel,
    const uint32_t* ord0_flat,
    const uint32_t* ord1_flat,
    int64_t* out_u,
    int64_t* out_v)
{
    int n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 8) n_threads = 8;
    auto work = [&](int64_t a0, int64_t a1) {
        for (int64_t a = a0; a < a1; a++) {
            const int64_t o0r = orid0[a], o1r = orid1[a];
            const int64_t b0 = moff[o0r], b1 = moff[o1r];
            const int64_t r0 = moff[o0r ^ 1] + counts[o0r] - 1;
            const int64_t r1 = moff[o1r ^ 1] + counts[o1r] - 1;
            int64_t p = pos[a];
            for (int64_t i = lo[a]; i < hi[a]; i++) {
                const int64_t x0 = (int64_t)ord0_flat[i];
                const int64_t x1 = (int64_t)ord1_flat[i];
                out_u[p] = b0 + x0;
                out_v[p] = b1 + x1;
                out_u[p + 1] = r0 - x0;
                out_v[p + 1] = r1 - x1;
                p += 2;
            }
        }
    };
    if (n_threads == 1 || n_sel < 64) {
        work(0, n_sel);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n_sel + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t a0 = t * chunk, a1 = a0 + chunk < n_sel ? a0 + chunk : n_sel;
        if (a0 >= a1) break;
        threads.emplace_back(work, a0, a1);
    }
    for (auto& th : threads) th.join();
}

static inline int64_t dsu_find(int64_t* p, int64_t x)
{
    while (p[x] != x) {
        p[x] = p[p[x]];
        x = p[x];
    }
    return x;
}

void union_find_min_labels(
    int64_t n,
    const int64_t* u,
    const int64_t* v,
    int64_t n_pairs,
    int64_t* label)  // in: arange(n); out: min-id component labels
{
    for (int64_t i = 0; i < n_pairs; i++) {
        const int64_t a = dsu_find(label, u[i]);
        const int64_t b = dsu_find(label, v[i]);
        if (a < b) label[b] = a;
        else if (b < a) label[a] = b;
    }
    for (int64_t i = 0; i < n; i++) label[i] = dsu_find(label, i);
}

// Streaming fusion of expand_unite_pairs + union_find_min_labels:
// unite the marker pairs (and their reverse complements) of every
// selected alignment straight into the DSU without ever
// materializing the pair list — at genome scale the u/v arrays are
// the run's largest transient (16 bytes x 2 x total matched
// ordinals). The min-root DSU result is order-independent, so labels
// are identical to the two-step path (equality-tested).
void unite_from_alignments(
    const int64_t* moff,
    const int64_t* counts,
    const int64_t* orid0,  // per selected alignment
    const int64_t* orid1,
    const int64_t* lo,     // flat ordinal range per alignment
    const int64_t* hi,
    int64_t n_sel,
    const void* ord0_flat,  // uint16 or uint32 per ord_u16
    const void* ord1_flat,
    int64_t ord_u16,
    int64_t n,
    int64_t* label)  // in: arange(n); out: min-id component labels
{
    const uint32_t* o0_32 = (const uint32_t*)ord0_flat;
    const uint32_t* o1_32 = (const uint32_t*)ord1_flat;
    const uint16_t* o0_16 = (const uint16_t*)ord0_flat;
    const uint16_t* o1_16 = (const uint16_t*)ord1_flat;
    for (int64_t a = 0; a < n_sel; a++) {
        const int64_t o0r = orid0[a], o1r = orid1[a];
        const int64_t b0 = moff[o0r], b1 = moff[o1r];
        const int64_t r0 = moff[o0r ^ 1] + counts[o0r] - 1;
        const int64_t r1 = moff[o1r ^ 1] + counts[o1r] - 1;
        for (int64_t i = lo[a]; i < hi[a]; i++) {
            const int64_t x0 =
                ord_u16 ? (int64_t)o0_16[i] : (int64_t)o0_32[i];
            const int64_t x1 =
                ord_u16 ? (int64_t)o1_16[i] : (int64_t)o1_32[i];
            int64_t p = dsu_find(label, b0 + x0);
            int64_t q = dsu_find(label, b1 + x1);
            if (p < q) label[q] = p;
            else if (q < p) label[p] = q;
            p = dsu_find(label, r0 - x0);
            q = dsu_find(label, r1 - x1);
            if (p < q) label[q] = p;
            else if (q < p) label[p] = q;
        }
    }
    for (int64_t i = 0; i < n; i++) label[i] = dsu_find(label, i);
}


// Dual 64-bit polynomial content hash of each strict-edge interval's
// intervening RLE sequence, computed directly from the read store
// (no flat expansion; reference extracts and stores the sequences,
// src/AssemblerMarkerGraphEdges.cpp:31-360). For interval t of
// oriented read orid[t], the sequence is oriented positions
// pos0[t]+k .. pos1[t]-1; reverse strand reads complement back-to-
// front. Overlapping markers (pos1 < pos0+k) get a length sentinel.
// h2 uses an independent multiplier so the pair acts as a 128-bit
// content fingerprint (collision-free in practice; grouping uses
// both).
void strict_interval_hashes(
    const uint8_t* rle,
    const int64_t* read_offsets,
    const int64_t* orid,
    const int64_t* pos0,
    const int64_t* pos1,
    int64_t n,
    int64_t k,
    uint64_t* h1,
    uint64_t* h2)
{
    auto work = [&](int64_t lo, int64_t hi) {
        const uint64_t P1 = 0x100000001B3ull;
        const uint64_t P2 = 0x9E3779B97F4A7C15ull;
        for (int64_t t = lo; t < hi; t++) {
            const int64_t o = orid[t];
            const int64_t r = o >> 1;
            const int comp = (int)(o & 1);
            const int64_t rlo = read_offsets[r];
            const int64_t rhi = read_offsets[r + 1];
            const int64_t s = pos0[t] + k;
            const int64_t e = pos1[t];
            if (e < s) {
                h1[t] = 0xFFFF000000000000ull + (uint64_t)(s - e);
                h2[t] = h1[t];
                continue;
            }
            uint64_t a = 0, b = 0, pw1 = 1, pw2 = 1;
            if (comp) {
                for (int64_t p = s; p < e; p++) {
                    const uint64_t base = (uint64_t)(3 - rle[rhi - 1 - p]);
                    a += (base + 1) * pw1; pw1 *= P1;
                    b += (base + 1) * pw2; pw2 *= P2;
                }
            } else {
                for (int64_t p = s; p < e; p++) {
                    const uint64_t base = (uint64_t)rle[rlo + p];
                    a += (base + 1) * pw1; pw1 *= P1;
                    b += (base + 1) * pw2; pw2 *= P2;
                }
            }
            h1[t] = a; h2[t] = b;
        }
    };
    int n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 8) n_threads = 8;
    if (n < 1 << 15) n_threads = 1;
    if (n_threads == 1) {
        work(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t lo = t * chunk;
        int64_t hi = lo + chunk < n ? lo + chunk : n;
        if (lo >= hi) break;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
}


// Stable counting sort by a dense int64 key: order[k] enumerates the
// input indices grouped by key, keys in ascending order, original
// order preserved within a key (the grouping pass behind marker-graph
// vertex creation; np.argsort over 10^8+ elements is the stage's top
// cost on the 4-core host, while this is one linear pass).
// next_pos must hold the exclusive prefix sums of the key counts and
// is consumed (mutated) by the call.
void counting_sort_by_key(
    const int64_t* key,
    int64_t n,
    int64_t* next_pos,
    int64_t* order)
{
    for (int64_t i = 0; i < n; i++) {
        order[next_pos[key[i]]++] = i;
    }
}

// 32-bit variant: int32 keys and order (n < 2^31), negative keys
// skipped — lets createMarkerGraphVertices group 10^8 markers by
// set/vertex id at half the index-array footprint and build the
// vertex->markers CSR directly from vertex_table (INVALID = -1)
// without materializing the kept-marker index vector first.
void counting_sort_by_key32(
    const int32_t* key,
    int64_t n,
    int64_t* next_pos,
    int32_t* order)
{
    for (int64_t i = 0; i < n; i++) {
        const int32_t k = key[i];
        if (k >= 0) {
            order[next_pos[k]++] = (int32_t)i;
        }
    }
}

}  // extern "C"
