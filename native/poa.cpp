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

// Column ids: one column per aligned ring, ordered topologically
// (spoa GenerateMultipleSequenceAlignment).
void msaColumns(
    const PoaGraph& g,
    std::vector<int32_t>& colOf,
    int32_t& nCols)
{
    const std::vector<int32_t> order = g.topoOrder();
    colOf.assign(g.size(), -1);
    // Ring representative -> column id, assigned when the first ring
    // member appears in topological order.
    nCols = 0;
    for (int32_t v : order) {
        if (colOf[v] >= 0) continue;
        const int32_t col = nCols++;
        int32_t w = v;
        do {
            colOf[w] = col;
            w = g.alignedNext[w];
        } while (w != v);
    }
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

}  // extern "C"
