from .enrich import (
    GraphArtifacts,
    build_enriched_graph,
    collapse_values,
    custom_bfs,
    is_valid_url,
)

__all__ = [
    "GraphArtifacts",
    "build_enriched_graph",
    "collapse_values",
    "custom_bfs",
    "is_valid_url",
]
