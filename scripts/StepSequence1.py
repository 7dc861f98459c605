#!/usr/bin/env python
"""Run the marker graph -> assembly step sequence on a stored run
(reference: scripts/StepSequence1.py)."""
import runpy
import sys

for module in (
    "CreateMarkerGraphVertices",
    "FindMarkerGraphReverseComplementVertices",
    "CreateMarkerGraphEdges",
    "FindMarkerGraphReverseComplementEdges",
    "TransitiveReduction",
    "PruneMarkerGraphStrongSubgraph",
    "SimplifyMarkerGraph",
    "CreateAssemblyGraphEdges",
    "AssembleMarkerGraphVertices",
    "AssembleMarkerGraphEdges",
    "Assemble",
):
    print(f"=== {module}")
    runpy.run_module(module, run_name="__main__")
