"""Adjacency-list materialization: the final sorted-groupby output stage
(north_star "sorted groupby materializing adjacency-list partitions
equivalent to ClimateMind's make_graph/make_network outputs").

Output schema (SURVEY §1.3 "adjacency partitions")::

    subject: string,
    degree: int64,
    edges: list<struct<object: string, predicate: string,
                       support: int64, sources: list<string>>>

Partitioned by ``subject`` hash via the groupby shuffle; per-group edge
lists are ordered by (object, predicate) so output bytes are
parallelism-independent.
"""

from __future__ import annotations

import pandas as pd

from ray.data import Dataset


def build_adjacency(canonical_edges: Dataset) -> Dataset:
    def to_adj(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["object", "predicate"], kind="mergesort")
        has_support = "support" in g.columns
        edges = [
            {
                "object": o,
                "predicate": p,
                "support": int(s) if has_support else 1,
                "sources": list(src) if has_support else [],
            }
            for o, p, s, src in zip(
                g["object"],
                g["predicate"],
                g["support"] if has_support else [1] * len(g),
                g["sources"] if has_support else [[]] * len(g),
            )
        ]
        return pd.DataFrame(
            {
                "subject": [g["subject"].iloc[0]],
                "degree": [len(edges)],
                "edges": [edges],
            }
        )

    return canonical_edges.groupby("subject").map_groups(to_adj, batch_format="pandas")


def write_adjacency(canonical_edges: Dataset, out_dir: str) -> None:
    """Partitioned, resumable Parquet sink: one directory of part files,
    atomically finalized by Ray Data's writer."""
    build_adjacency(canonical_edges).write_parquet(out_dir)
