"""Mode 3 assembly: segments, read journeys, and links.

TPU-era counterpart of the reference's mode-3 assembly graph
(reference: src/mode3.{hpp,cpp}; journeys at src/mode3.hpp:64-120,
link creation at src/mode3.cpp:645-697):

- *segments* are linear chains of marker graph edges (the condensed
  assembly graph's edges);
- the *journey* of an oriented read is the sequence of segments it
  visits, derived from its marker-interval appearances ordered by
  ordinal (duplicate consecutive segments condensed);
- a *link* connects segment A to segment B when at least
  ``min_link_coverage`` oriented reads transition A -> B consecutively
  in their journeys (the reference's minCoverage = 3,
  src/mode3.cpp:668).

Everything is CSR arrays: journeys are one flat (orid-sorted) segment
array + offsets, and transition counting is a sort/group pass — the
same shapes the sharded path uses. Results persist to the stage store
as the ``Mode3-*`` equivalent of the reference's persisted binaries
(src/mode3.cpp:713-741).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from shasta_tpu.data.markers import MarkerStore
from shasta_tpu.graph.assembly_graph import AssemblyGraph, create_assembly_graph
from shasta_tpu.graph.marker_graph import MarkerGraph


@dataclass
class Mode3Graph:
    """Segments (assembly graph chains), journeys, links."""

    ag: AssemblyGraph  # segments = ag edges
    # Journeys: per oriented read, CSR of visited segment ids.
    journey_offsets: np.ndarray  # int64 [n_or + 1]
    journey_segments: np.ndarray  # int64 flat
    # Links.
    link_source: np.ndarray  # int64 [n_links]
    link_target: np.ndarray  # int64 [n_links]
    link_coverage: np.ndarray  # int32 [n_links]

    @property
    def segment_count(self) -> int:
        return self.ag.edge_count

    @property
    def link_count(self) -> int:
        return self.link_source.shape[0]

    def journey(self, orid: int) -> np.ndarray:
        lo, hi = self.journey_offsets[orid], self.journey_offsets[orid + 1]
        return self.journey_segments[lo:hi]

    def arrays(self) -> Dict[str, np.ndarray]:
        out = {f"ag_{k}": v for k, v in self.ag.arrays().items()}
        out.update(
            journey_offsets=self.journey_offsets,
            journey_segments=self.journey_segments,
            link_source=self.link_source,
            link_target=self.link_target,
            link_coverage=self.link_coverage,
        )
        return out


def create_mode3_graph(
    markers: MarkerStore,
    mg: MarkerGraph,
    min_link_coverage: int = 3,
) -> Mode3Graph:
    """Build segments, journeys, and links."""
    ag = create_assembly_graph(mg)
    n_or = markers.oriented_read_count

    # Marker graph edge -> (segment, position) table (reference:
    # computeMarkerGraphEdgeTable). With detangling disabled each
    # marker edge is in at most one segment.
    n_me = mg.edge_count
    seg_of_edge = np.full(n_me, -1, np.int64)
    pos_of_edge = np.full(n_me, -1, np.int64)
    for a in range(ag.edge_count):
        chain = ag.chain(a)
        seg_of_edge[chain] = a
        pos_of_edge[chain] = np.arange(chain.shape[0])

    # All (orid, ordinal0, segment) marker journey entries.
    orid = mg.interval_orid
    ord0 = mg.interval_ord0.astype(np.int64)
    edge_of_interval = np.repeat(
        np.arange(n_me, dtype=np.int64), np.diff(mg.interval_offsets)
    )
    seg = seg_of_edge[edge_of_interval]
    sel = seg >= 0
    orid_s, ord_s, seg_s = orid[sel], ord0[sel], seg[sel]

    # Sort by (orid, ordinal) -> marker graph journeys; condense runs
    # of the same segment -> assembly graph journeys.
    order = np.lexsort((ord_s, orid_s))
    orid_s, seg_s = orid_s[order], seg_s[order]
    if orid_s.shape[0]:
        new_entry = np.empty(orid_s.shape[0], dtype=bool)
        new_entry[0] = True
        new_entry[1:] = (orid_s[1:] != orid_s[:-1]) | (seg_s[1:] != seg_s[:-1])
        j_orid = orid_s[new_entry]
        j_seg = seg_s[new_entry]
    else:
        j_orid = np.zeros(0, np.int64)
        j_seg = np.zeros(0, np.int64)

    journey_offsets = np.zeros(n_or + 1, np.int64)
    np.cumsum(np.bincount(j_orid, minlength=n_or), out=journey_offsets[1:])

    # Transitions: consecutive journey entries of the same oriented read.
    if j_orid.shape[0] > 1:
        same = j_orid[1:] == j_orid[:-1]
        t_src = j_seg[:-1][same]
        t_tgt = j_seg[1:][same]
        key = t_src * np.int64(ag.edge_count) + t_tgt
        uniq, counts = np.unique(key, return_counts=True)
        keep = counts >= min_link_coverage
        uniq, counts = uniq[keep], counts[keep]
        link_source = uniq // ag.edge_count
        link_target = uniq % ag.edge_count
        link_coverage = counts.astype(np.int32)
    else:
        link_source = np.zeros(0, np.int64)
        link_target = np.zeros(0, np.int64)
        link_coverage = np.zeros(0, np.int32)

    return Mode3Graph(
        ag=ag,
        journey_offsets=journey_offsets,
        journey_segments=j_seg,
        link_source=link_source,
        link_target=link_target,
        link_coverage=link_coverage,
    )


def find_assembly_paths(m3: Mode3Graph) -> List[np.ndarray]:
    """Maximal unambiguous link chains: follow links that are the
    unique out-link of their source and unique in-link of their target
    (the skeleton of the reference's mode3 PathGraph path creation)."""
    n_seg = m3.segment_count
    out_count = np.bincount(m3.link_source, minlength=n_seg)
    in_count = np.bincount(m3.link_target, minlength=n_seg)
    next_seg = np.full(n_seg, -1, np.int64)
    for s, t in zip(m3.link_source, m3.link_target):
        if out_count[s] == 1 and in_count[t] == 1:
            next_seg[s] = t
    has_pred = np.zeros(n_seg, dtype=bool)
    valid_next = next_seg[next_seg >= 0]
    has_pred[valid_next] = True

    paths = []
    visited = np.zeros(n_seg, dtype=bool)
    for s in range(n_seg):
        if visited[s] or has_pred[s]:
            continue
        path = [s]
        visited[s] = True
        cur = s
        while next_seg[cur] >= 0 and not visited[next_seg[cur]]:
            cur = int(next_seg[cur])
            path.append(cur)
            visited[cur] = True
        paths.append(np.array(path, dtype=np.int64))
    # Circular leftovers.
    for s in range(n_seg):
        if not visited[s]:
            path = [s]
            visited[s] = True
            cur = s
            while next_seg[cur] >= 0 and not visited[next_seg[cur]]:
                cur = int(next_seg[cur])
                path.append(cur)
                visited[cur] = True
            paths.append(np.array(path, dtype=np.int64))
    return paths


def write_mode3_gfa(path: str, m3: Mode3Graph) -> None:
    """Segments + links as GFA (the reference explorer's mode-3 view)."""
    from shasta_tpu.graph.assembly_graph import _seq_str

    with open(path, "w") as f:
        f.write("H\tVN:Z:1.0\n")
        for s in range(m3.segment_count):
            n = int(m3.ag.chain_offsets[s + 1] - m3.ag.chain_offsets[s])
            if m3.ag.seg_raw_offsets is not None and m3.ag.is_assembled_edge(s):
                seq = m3.ag.raw_sequence(s)
                f.write(f"S\t{s}\t{_seq_str(seq)}\tLN:i:{seq.shape[0]}\n")
            else:
                f.write(f"S\t{s}\t*\tLN:i:{n}\n")
        for i in range(m3.link_count):
            f.write(
                f"L\t{m3.link_source[i]}\t+\t{m3.link_target[i]}\t+\t0M\t"
                f"RC:i:{m3.link_coverage[i]}\n"
            )
