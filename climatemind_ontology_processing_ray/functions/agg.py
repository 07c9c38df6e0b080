"""High-cardinality grouped aggregation.

``ray.data``'s native ``groupby(k).aggregate(...)`` sorts and then folds
PER KEY in Python inside AggregateMap/AggregateReduce — measured ~2s per
1.4k-row block at ~18k distinct keys (134 CPU-seconds for a 100k-row
histogram that pandas does in milliseconds).  It is the right tool only
when the distinct-key count is SMALL (our canonicalize phases, window
keys, term sets).

``grouped_sum`` is the engine's standard pattern for everything else:
tag each row with a coarse partition id (hash of the key columns), ONE
groupby on the 64 partition ids (cheap sort, 64 groups), and a fully
vectorized pandas groupby-sum inside each partition.  Used by
exact_quantiles, degree_stats, heavy_hitters; same shape as
``exact_dedup`` / ``canonicalize_partials``.
"""

from __future__ import annotations

import pandas as pd

from ray.data import Dataset

from .join import hash_bucket

_NUM_PARTS = 64


def grouped_sum(
    ds: Dataset,
    keys: list[str],
    sum_cols: list[str],
    num_parts: int = _NUM_PARTS,
) -> Dataset:
    """SUM(sum_cols) GROUP BY keys, scale-safe at any key cardinality.

    Input should already be map-side combined (each block contributing
    few rows per key) — this runs the exchange + final merge."""

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if len(keys) == 1:
            kv = b[keys[0]]
        else:
            kv = b[keys[0]].astype(str)
            for k in keys[1:]:
                kv = kv + "\x00" + b[k].astype(str)
        b["__part"] = hash_bucket(kv.to_numpy(), num_parts)
        return b

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(keys, sort=False)[sum_cols].sum().reset_index()
        for c in sum_cols:
            if out[c].dtype.kind in "iu":
                out[c] = out[c].astype("int64")
        return out

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(merge, batch_format="pandas")
    )
