"""Regenerate the committed golden enrichment artifacts
(tests/golden/enrichment.json) from the fixture + oracle.

Run after an INTENTIONAL semantics change; the diff documents exactly what
changed.  tests/test_golden.py compares the live enrichment against this
file so unintentional regressions fail loudly across rounds.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from climatemind_ontology_processing_ray.graph.enrich import build_enriched_graph
from climatemind_ontology_processing_ray.ontology import (
    build_fixture_snapshot,
    golden_edge_set,
)


def build_golden() -> dict:
    snap = build_fixture_snapshot()
    golden = golden_edge_set(snap)
    art = build_enriched_graph(golden, snap)
    return {
        "edges": sorted(list(t) for t in golden),
        "nodes": {
            n: {k: v for k, v in sorted(attrs.items())}
            for n, attrs in sorted(art.G.nodes(data=True))
        },
        "edge_properties": {
            f"{a} -> {b}": {"type": d["type"], "properties": d["properties"]}
            for a, b, d in sorted(art.G.edges(data=True))
        },
        "subgraph_nodes": {
            name: sorted(g.nodes) for name, g in sorted(art.subgraphs.items())
        },
        "mitigation_solutions": art.mitigation_solutions,
        "upstream_nodes": art.upstream_nodes,
        "adaptation_nodes": art.adaptation_nodes,
        "test_graph_nodes": sorted(art.test_graph.nodes),
    }


if __name__ == "__main__":
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "golden",
        "enrichment.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(build_golden(), f, indent=1, sort_keys=True, default=str)
    print(out)
