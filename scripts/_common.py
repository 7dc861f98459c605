"""Shared helpers for stage-wise drivers."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def open_run(argv):
    """Reattach an Assembler to an existing run directory."""
    import numpy as np
    from shasta_tpu.data.kmers import KmerTable
    from shasta_tpu.data.markers import MarkerStore
    from shasta_tpu.data.reads import ReadStore
    from shasta_tpu.data.store import RunStore
    from shasta_tpu.graph.marker_graph import MarkerGraph
    from shasta_tpu.graph.read_graph import ReadGraph
    from shasta_tpu.ops.align import AlignmentStore
    from shasta_tpu.ops.lowhash import CandidatePairs
    from shasta_tpu.pipeline.assemble import Assembler
    from shasta_tpu.pipeline.config import AssemblyConfig

    run_dir = argv[1] if len(argv) > 1 else "."
    conf = os.path.join(run_dir, "shasta.conf")
    config = AssemblyConfig.from_conf_file(conf) if os.path.exists(conf) else None
    a = Assembler(run_dir, config)
    store = a.store

    def soft(stage, cls):
        try:
            return cls.from_arrays(store.load_stage(stage))
        except KeyError:
            return None

    a.reads = soft("Reads", ReadStore)
    a.kmer_table = soft("Kmers", KmerTable)
    a.markers = soft("Markers", MarkerStore)
    a.candidates = soft("AlignmentCandidates", CandidatePairs)
    a.alignments = soft("Alignments", AlignmentStore)
    a.read_graph = soft("ReadGraph", ReadGraph)
    a.marker_graph = soft("MarkerGraph", MarkerGraph)
    if a.marker_graph is not None and a.marker_graph.source is not None:
        a.marker_graph.build_adjacency()
    return a
