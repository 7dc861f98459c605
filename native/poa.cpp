// Partial-order alignment (POA) multiple sequence alignment.
//
// A from-scratch implementation of the algorithm the reference gets
// from the spoa library (reference: src/AssemblerMarkerGraph.cpp:2001
// -2010 creates spoa::AlignmentEngine(kNW, 1, -1, -1) and calls
// Align/AddAlignment/GenerateMultipleSequenceAlignment): sequences are
// aligned one at a time against a growing DAG whose nodes carry one
// base each; nodes aligned to one another (same column, different
// base) are linked in "aligned rings"; the MSA assigns one column per
// ring in topological order.
//
// Exposed through a C ABI for ctypes (see shasta_tpu/native.py).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <atomic>
#include <functional>
#include <thread>

namespace {

constexpr int32_t kGapOpen = -1;   // linear gap, matches spoa (1,-1,-1)
constexpr int32_t kMatch = 1;
constexpr int32_t kMismatch = -1;
constexpr int32_t kNegInf = INT32_MIN / 2;

struct PoaGraph {
    // Per node.
    std::vector<uint8_t> base;
    std::vector<std::vector<int32_t>> preds;   // incoming edges
    std::vector<std::vector<int32_t>> succs;   // outgoing edges
    std::vector<int32_t> alignedNext;          // circular aligned ring
    // Per sequence: the node path.
    std::vector<std::vector<int32_t>> paths;

    int32_t addNode(uint8_t b) {
        base.push_back(b);
        preds.emplace_back();
        succs.emplace_back();
        alignedNext.push_back(static_cast<int32_t>(base.size()) - 1);
        return static_cast<int32_t>(base.size()) - 1;
    }

    void addEdge(int32_t u, int32_t v) {
        if (u < 0 || v < 0) return;
        for (int32_t w : succs[u]) {
            if (w == v) return;
        }
        succs[u].push_back(v);
        preds[v].push_back(u);
    }

    size_t size() const { return base.size(); }

    // Topological order (Kahn). The graph is a DAG by construction.
    std::vector<int32_t> topoOrder() const {
        const size_t n = size();
        std::vector<int32_t> indeg(n, 0);
        for (size_t v = 0; v < n; v++) {
            indeg[v] = static_cast<int32_t>(preds[v].size());
        }
        std::vector<int32_t> order;
        order.reserve(n);
        std::vector<int32_t> stack;
        // Push in reverse node order so lower node ids pop first
        // (deterministic, biased toward insertion order).
        for (int32_t v = static_cast<int32_t>(n) - 1; v >= 0; v--) {
            if (indeg[v] == 0) stack.push_back(v);
        }
        while (!stack.empty()) {
            const int32_t v = stack.back();
            stack.pop_back();
            order.push_back(v);
            for (int32_t w : succs[v]) {
                if (--indeg[w] == 0) stack.push_back(w);
            }
        }
        return order;
    }
};

// Global (NW) alignment of one sequence against the graph.
// Returns pairs (node, seqPos); -1 marks a gap on either side.
void alignToGraph(
    const PoaGraph& g,
    const uint8_t* seq,
    int64_t m,
    std::vector<int32_t>& outNodes,
    std::vector<int32_t>& outPos)
{
    outNodes.clear();
    outPos.clear();
    const std::vector<int32_t> order = g.topoOrder();
    const size_t n = order.size();
    std::vector<int32_t> rankOf(g.size());
    for (size_t r = 0; r < n; r++) rankOf[order[r]] = static_cast<int32_t>(r);

    const int64_t W = m + 1;
    // S[(r+1)*W + j]: best score ending at node order[r] consuming j chars.
    // Row 0 is the virtual start.
    std::vector<int32_t> S((n + 1) * W, kNegInf);
    // Traceback: 0 stop, 1 diag, 2 up (node skip), 3 left (insertion),
    // packed with the predecessor row in the upper bits.
    std::vector<int32_t> back((n + 1) * W, 0);

    for (int64_t j = 0; j <= m; j++) {
        S[j] = static_cast<int32_t>(j) * kGapOpen;  // leading insertions
        back[j] = (j > 0) ? 3 : 0;
    }

    for (size_t r = 0; r < n; r++) {
        const int32_t v = order[r];
        const uint8_t bv = g.base[v];
        // Predecessor rows (virtual start row 0 if no preds).
        std::vector<int32_t> predRows;
        if (g.preds[v].empty()) {
            predRows.push_back(0);
        } else {
            for (int32_t p : g.preds[v]) predRows.push_back(rankOf[p] + 1);
        }
        int32_t* row = &S[(r + 1) * W];
        int32_t* brow = &back[(r + 1) * W];
        for (int64_t j = 0; j <= m; j++) {
            int32_t best = kNegInf;
            int32_t bdir = 0;
            int32_t bpred = 0;
            for (int32_t pr : predRows) {
                const int32_t* prow = &S[static_cast<size_t>(pr) * W];
                // Skip the node (gap in sequence).
                int32_t cand = prow[j] + kGapOpen;
                if (cand > best) { best = cand; bdir = 2; bpred = pr; }
                if (j > 0) {
                    const int32_t sub =
                        (seq[j - 1] == bv) ? kMatch : kMismatch;
                    cand = prow[j - 1] + sub;
                    if (cand > best) { best = cand; bdir = 1; bpred = pr; }
                }
            }
            if (j > 0) {
                const int32_t cand = row[j - 1] + kGapOpen;
                if (cand > best) { best = cand; bdir = 3; bpred = static_cast<int32_t>(r + 1); }
            }
            row[j] = best;
            brow[j] = bdir | (bpred << 2);
        }
    }

    // NW end: best over sink rows (nodes with no successors) at j = m.
    int32_t bestScore = kNegInf;
    size_t bestRow = 0;
    if (n == 0) {
        bestRow = 0;
    } else {
        for (size_t r = 0; r < n; r++) {
            if (!g.succs[order[r]].empty()) continue;
            if (S[(r + 1) * W + m] > bestScore) {
                bestScore = S[(r + 1) * W + m];
                bestRow = r + 1;
            }
        }
        if (bestScore == kNegInf) {  // no sink (cannot happen in a DAG)
            bestRow = n;
        }
    }

    // Traceback from (bestRow, m) to (0, 0)-ish.
    size_t r = bestRow;
    int64_t j = m;
    while (r != 0 || j != 0) {
        const int32_t code = back[r * W + j];
        const int32_t dir = code & 3;
        const int32_t pred = code >> 2;
        if (dir == 0) break;
        if (dir == 1) {
            outNodes.push_back(order[r - 1]);
            outPos.push_back(static_cast<int32_t>(j - 1));
            r = static_cast<size_t>(pred);
            j -= 1;
        } else if (dir == 2) {
            outNodes.push_back(order[r - 1]);
            outPos.push_back(-1);
            r = static_cast<size_t>(pred);
        } else {
            outNodes.push_back(-1);
            outPos.push_back(static_cast<int32_t>(j - 1));
            j -= 1;
        }
    }
    std::reverse(outNodes.begin(), outNodes.end());
    std::reverse(outPos.begin(), outPos.end());
}

// Incorporate an aligned sequence into the graph (spoa AddAlignment).
void addAlignment(
    PoaGraph& g,
    const uint8_t* seq,
    int64_t m,
    const std::vector<int32_t>& alnNodes,
    const std::vector<int32_t>& alnPos)
{
    std::vector<int32_t> path;
    path.reserve(m);
    int32_t prev = -1;

    if (alnNodes.empty()) {
        // First sequence: a simple chain.
        for (int64_t t = 0; t < m; t++) {
            const int32_t v = g.addNode(seq[t]);
            if (prev >= 0) g.addEdge(prev, v);
            prev = v;
            path.push_back(v);
        }
        g.paths.push_back(std::move(path));
        return;
    }

    for (size_t t = 0; t < alnNodes.size(); t++) {
        const int32_t node = alnNodes[t];
        const int32_t pos = alnPos[t];
        if (pos < 0) continue;  // node skipped, nothing consumed
        const uint8_t c = seq[pos];
        int32_t v = -1;
        if (node >= 0) {
            if (g.base[node] == c) {
                v = node;
            } else {
                // Search the aligned ring for a node with this base.
                int32_t w = g.alignedNext[node];
                while (w != node) {
                    if (g.base[w] == c) { v = w; break; }
                    w = g.alignedNext[w];
                }
                if (v < 0) {
                    v = g.addNode(c);
                    // Insert into the ring after `node`.
                    g.alignedNext[v] = g.alignedNext[node];
                    g.alignedNext[node] = v;
                }
            }
        } else {
            v = g.addNode(c);  // insertion: fresh unaligned node
        }
        if (prev >= 0) g.addEdge(prev, v);
        prev = v;
        path.push_back(v);
    }
    g.paths.push_back(std::move(path));
}

// Column ids: one column per aligned ring, ordered by a topological
// sort of the RING-CONDENSED graph (spoa
// GenerateMultipleSequenceAlignment). Condensing first guarantees
// every path visits its columns in increasing order (each path edge
// u->v becomes a ring(u)->ring(v) constraint), so each MSA row spells
// its sequence; ordering raw nodes (the previous implementation)
// could place a ring's column before a path predecessor whose own
// ring surfaced later, scrambling rare rows.
void msaColumns(
    const PoaGraph& g,
    std::vector<int32_t>& colOf,
    int32_t& nCols)
{
    const size_t n = g.size();
    colOf.assign(n, -1);
    nCols = 0;
    if (n == 0) return;

    // Ring representative = smallest node id in the ring.
    std::vector<int32_t> rep(n, -1);
    for (size_t v = 0; v < n; v++) {
        if (rep[v] >= 0) continue;
        int32_t mn = (int32_t)v;
        int32_t w = g.alignedNext[v];
        while (w != (int32_t)v) { mn = std::min(mn, w); w = g.alignedNext[w]; }
        w = (int32_t)v;
        do { rep[w] = mn; w = g.alignedNext[w]; } while (w != (int32_t)v);
    }

    // Kahn over condensed super-nodes (parallel edges counted on both
    // sides; push in reverse id order so lower reps pop first,
    // deterministic like topoOrder).
    std::vector<int32_t> indeg(n, 0);
    for (size_t u = 0; u < n; u++) {
        for (int32_t v2 : g.succs[u]) {
            if (rep[u] != rep[v2]) indeg[rep[v2]]++;
        }
    }
    std::vector<int32_t> stack;
    for (int32_t v = (int32_t)n - 1; v >= 0; v--) {
        if (rep[v] == v && indeg[v] == 0) stack.push_back(v);
    }
    std::vector<int32_t> colOfRep(n, -1);
    while (!stack.empty()) {
        const int32_t r = stack.back();
        stack.pop_back();
        colOfRep[r] = nCols++;
        int32_t w = r;
        do {
            for (int32_t v2 : g.succs[w]) {
                if (rep[w] != rep[v2] && --indeg[rep[v2]] == 0) {
                    stack.push_back(rep[v2]);
                }
            }
            w = g.alignedNext[w];
        } while (w != r);
    }
    // A cycle in the condensation cannot arise from valid alignments;
    // assign any stragglers in id order rather than crash.
    for (size_t v = 0; v < n; v++) {
        if (rep[v] == (int32_t)v && colOfRep[v] < 0) colOfRep[v] = nCols++;
    }
    for (size_t v = 0; v < n; v++) colOf[v] = colOfRep[rep[v]];
}

void consensusThreads(int64_t n, const std::function<void(int64_t, int64_t)>& work)
{
    int nThreads = (int)std::thread::hardware_concurrency();
    if (nThreads < 1) nThreads = 1;
    if (nThreads > 8) nThreads = 8;
    if (nThreads == 1 || n < 256) {
        work(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n + nThreads - 1) / nThreads;
    for (int t = 0; t < nThreads; t++) {
        int64_t lo = t * chunk, hi = std::min(lo + chunk, n);
        if (lo >= hi) break;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
}

// One mode-2 marker-graph edge: dedup the fill sequences, POA the
// distinct ones (decreasing frequency, ties by first encountered),
// per-column consensus over the occurrences. Mirrors the Python
// per-edge loop in shasta_tpu/graph/assembly_graph.py exactly
// (reference: computeMarkerGraphEdgeConsensusSequenceUsingSpoa,
// src/AssemblerMarkerGraph.cpp:3179-3660).
// mode: 0 Modal, 1 Median, 2 Bayesian (priors [2*ny], likelihood
// [4*ny*nx] log10, consensus-base-matching repeats only).
// Returns the consensus length written at outB/outR + off.
int64_t edgeConsensus(
    const uint8_t* fillB, const uint8_t* fillR, const int64_t* fillOff,
    const int64_t* ivIdx, int64_t iv0, int64_t iv1,
    int32_t mode,
    const double* priors, const double* likelihood, int64_t ny, int64_t nx,
    uint8_t* outB, int32_t* outR, int64_t bound)
{
    const int64_t m = iv1 - iv0;
    if (m <= 0) return 0;

    // Dedup (order-preserving) + occurrence counts.
    std::vector<int32_t> distOf(m);
    std::vector<int64_t> distRep;   // representative fill row
    std::vector<int32_t> distCnt;
    for (int64_t t = 0; t < m; t++) {
        const int64_t row = ivIdx[iv0 + t];
        const uint8_t* s = fillB + fillOff[row];
        const int64_t len = fillOff[row + 1] - fillOff[row];
        int32_t d = -1;
        for (size_t q = 0; q < distRep.size(); q++) {
            const int64_t r2 = distRep[q];
            if (fillOff[r2 + 1] - fillOff[r2] != len) continue;
            if (std::memcmp(fillB + fillOff[r2], s, (size_t)len) == 0) {
                d = (int32_t)q;
                break;
            }
        }
        if (d < 0) {
            d = (int32_t)distRep.size();
            distRep.push_back(row);
            distCnt.push_back(0);
        }
        distOf[t] = d;
        distCnt[d]++;
    }
    const int32_t nd = (int32_t)distRep.size();

    // MSA row order: decreasing count, ties by first encountered.
    std::vector<int32_t> order(nd);
    for (int32_t q = 0; q < nd; q++) order[q] = q;
    std::stable_sort(order.begin(), order.end(), [&](int32_t x, int32_t y) {
        return distCnt[x] > distCnt[y];
    });
    std::vector<int32_t> rankOf(nd);
    for (int32_t q = 0; q < nd; q++) rankOf[order[q]] = q;

    // MSA of the distinct sequences: rowBase (nd x width, 255 = gap)
    // and, per distinct row, the column of each sequence position.
    int64_t width = 0;
    std::vector<uint8_t> rowBase;
    std::vector<std::vector<int32_t>> colOfPos(nd);
    if (nd == 1) {
        const int64_t r0 = distRep[0];
        width = fillOff[r0 + 1] - fillOff[r0];
        rowBase.assign(fillB + fillOff[r0], fillB + fillOff[r0 + 1]);
        colOfPos[0].resize(width);
        for (int64_t c = 0; c < width; c++) colOfPos[0][c] = (int32_t)c;
    } else {
        PoaGraph g;
        std::vector<int32_t> alnNodes, alnPos;
        for (int32_t q = 0; q < nd; q++) {
            const int64_t r2 = distRep[order[q]];
            const uint8_t* s = fillB + fillOff[r2];
            const int64_t len = fillOff[r2 + 1] - fillOff[r2];
            alnNodes.clear();
            alnPos.clear();
            if (g.size() > 0) alignToGraph(g, s, len, alnNodes, alnPos);
            addAlignment(g, s, len, alnNodes, alnPos);
        }
        std::vector<int32_t> colOf;
        int32_t nCols = 0;
        msaColumns(g, colOf, nCols);
        width = nCols;
        rowBase.assign((size_t)nd * width, 255);
        for (int32_t q = 0; q < nd; q++) {
            const int32_t dq = order[q];  // distinct id at MSA row q
            auto& cop = colOfPos[dq];
            cop.reserve(g.paths[q].size());
            for (int32_t v : g.paths[q]) {
                rowBase[(size_t)dq * width + colOf[v]] = g.base[v];
                cop.push_back(colOf[v]);
            }
        }
    }
    (void)rankOf;

    // Per-(distinct, column) sequence position, for repeat lookup.
    std::vector<int32_t> posOfCol((size_t)nd * width, -1);
    for (int32_t d = 0; d < nd; d++) {
        for (size_t p = 0; p < colOfPos[d].size(); p++) {
            posOfCol[(size_t)d * width + colOfPos[d][p]] = (int32_t)p;
        }
    }

    // Column consensus over the occurrences.
    int64_t written = 0;
    std::vector<int32_t> reps;
    reps.reserve(m);
    std::vector<double> scores((size_t)std::max<int64_t>(ny, 1));
    for (int64_t c = 0; c < width; c++) {
        int32_t bcount[5] = {0, 0, 0, 0, 0};
        for (int64_t t = 0; t < m; t++) {
            const uint8_t b = rowBase[(size_t)distOf[t] * width + c];
            bcount[b == 255 ? 4 : b]++;
        }
        int32_t consBase = 0;
        for (int32_t b = 1; b < 5; b++) {
            if (bcount[b] > bcount[consBase]) consBase = b;
        }
        if (consBase == 4) continue;  // gap consensus: column dropped
        reps.clear();
        for (int64_t t = 0; t < m; t++) {
            const int32_t d = distOf[t];
            if (rowBase[(size_t)d * width + c] != (uint8_t)consBase) continue;
            const int32_t p = posOfCol[(size_t)d * width + c];
            reps.push_back(fillR[fillOff[ivIdx[iv0 + t]] + p]);
        }
        int32_t consRep = 0;
        if (!reps.empty()) {
            std::sort(reps.begin(), reps.end());
            if (mode == 0) {  // Modal: most frequent, ties -> smallest
                int32_t bestCnt = 0;
                size_t i = 0;
                while (i < reps.size()) {
                    size_t jj = i;
                    while (jj < reps.size() && reps[jj] == reps[i]) jj++;
                    if ((int32_t)(jj - i) > bestCnt) {
                        bestCnt = (int32_t)(jj - i);
                        consRep = reps[i];
                    }
                    i = jj;
                }
            } else if (mode == 1) {  // Median (upper)
                consRep = reps[reps.size() / 2];
            } else {  // Bayesian
                const int32_t pi = (consBase == 0 || consBase == 3) ? 0 : 1;
                for (int64_t y = 0; y < ny; y++) scores[y] = priors[pi * ny + y];
                const double* lik = likelihood + (size_t)consBase * ny * nx;
                for (int32_t r2 : reps) {
                    const int64_t x = std::min<int64_t>(r2, nx - 1);
                    for (int64_t y = 0; y < ny; y++) scores[y] += lik[y * nx + x];
                }
                int64_t bestY = 0;
                for (int64_t y = 1; y < ny; y++) {
                    if (scores[y] > scores[bestY]) bestY = y;
                }
                consRep = (int32_t)bestY;
            }
        }
        if (written >= bound) return -1;
        outB[written] = (uint8_t)consBase;
        outR[written] = std::max<int32_t>(consRep, 1);
        written++;
    }
    return written;
}

}  // namespace

extern "C" {

// seqs: concatenated uint8 base codes; offsets: int64[nSeqs+1].
// out: uint8[nSeqs * maxCols] row-major MSA (255 = gap), written only
// if nCols <= maxCols. Returns nCols (call again with a larger buffer
// if it exceeds maxCols), or -1 on error.
int64_t poa_msa(
    const uint8_t* seqs,
    const int64_t* offsets,
    int64_t nSeqs,
    uint8_t* out,
    int64_t maxCols)
{
    if (nSeqs <= 0) return 0;
    PoaGraph g;
    std::vector<int32_t> alnNodes, alnPos;
    for (int64_t s = 0; s < nSeqs; s++) {
        const uint8_t* seq = seqs + offsets[s];
        const int64_t m = offsets[s + 1] - offsets[s];
        alnNodes.clear();
        alnPos.clear();
        if (g.size() > 0) {
            alignToGraph(g, seq, m, alnNodes, alnPos);
        }
        addAlignment(g, seq, m, alnNodes, alnPos);
    }

    std::vector<int32_t> colOf;
    int32_t nCols = 0;
    msaColumns(g, colOf, nCols);
    if (nCols > maxCols) return nCols;

    std::memset(out, 255, static_cast<size_t>(nSeqs) * nCols);
    for (int64_t s = 0; s < nSeqs; s++) {
        uint8_t* row = out + s * nCols;
        for (int32_t v : g.paths[s]) {
            row[colOf[v]] = g.base[v];
        }
    }
    return nCols;
}

// Batched mode-2 edge consensus, threaded over edges.
// fillB/fillR/fillOff: CSR of fill sequences (bases + repeat counts).
// ivIdx: fill-row index of every used interval; edgeIvOff[e]..[e+1)
// is edge e's slice of ivIdx. outB/outR are written at outOff[e]
// (caller bound: the edge's total fill length); outLen[e] receives
// the consensus length. mode/priors/likelihood per edgeConsensus.
// Returns 0, or -1 if any edge overflowed its bound.
int64_t edge_consensus_batch(
    const uint8_t* fillB, const uint8_t* fillR, const int64_t* fillOff,
    const int64_t* ivIdx, const int64_t* edgeIvOff, int64_t nEdges,
    int32_t mode,
    const double* priors, const double* likelihood, int64_t ny, int64_t nx,
    uint8_t* outB, int32_t* outR, const int64_t* outOff, int64_t* outLen)
{
    std::atomic<int> fail{0};
    consensusThreads(nEdges, [&](int64_t e0, int64_t e1) {
        for (int64_t e = e0; e < e1; e++) {
            const int64_t w = edgeConsensus(
                fillB, fillR, fillOff, ivIdx, edgeIvOff[e], edgeIvOff[e + 1],
                mode, priors, likelihood, ny, nx,
                outB + outOff[e], outR + outOff[e], outOff[e + 1] - outOff[e]);
            if (w < 0) {
                fail.store(1);
                outLen[e] = 0;
            } else {
                outLen[e] = w;
            }
        }
    });
    return fail.load() ? -1 : 0;
}

}  // extern "C"
