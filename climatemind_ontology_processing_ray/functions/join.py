"""Large x large joins.

Every join in the KG pipeline proper is broadcast-small-side (SURVEY
§2.4: nothing exceeds big x ontology-sized), but a general engine needs a
both-sides-large join.  This is the portable partitioned hash join from
the Ray guide: tag each side, align schemas, bucket by key hash, union,
one groupby(bucket) shuffle, then a pandas merge per bucket.

Skew note: a hot key lands in one bucket; raise ``num_buckets`` or
pre-salt the hot key's rows into sub-buckets (same pattern as
canonicalize.py) when a key's row count exceeds a worker's heap.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _with_schema(batch: pa.Table, side: str, all_names: list[str], key: str, num_buckets: int) -> pa.Table:
    cols = {}
    n = batch.num_rows
    for name in all_names:
        if name in batch.column_names:
            cols[name] = batch.column(name)
        else:
            cols[name] = pa.nulls(n)
    keys = batch.column(key).to_pylist()
    cols["__side"] = pa.array([side] * n, pa.string())
    cols["__bucket"] = pa.array(
        [zlib.crc32(str(k).encode()) % num_buckets for k in keys], pa.int32()
    )
    return pa.table(cols)


def bucketed_hash_join(
    left: Dataset,
    right: Dataset,
    key: str,
    num_buckets: int = 32,
) -> Dataset:
    """Inner join of two large Datasets on ``key``.

    Output columns = union of both sides' columns (shared ``key`` kept
    once).  One all-to-all shuffle (the groupby on bucket).
    """
    left_names = [n for n in left.schema().names]
    right_names = [n for n in right.schema().names]
    all_names = left_names + [n for n in right_names if n not in left_names]

    l_tagged = left.map_batches(
        lambda b: _with_schema(b, "l", all_names, key, num_buckets),
        batch_format="pyarrow",
    )
    r_tagged = right.map_batches(
        lambda b: _with_schema(b, "r", all_names, key, num_buckets),
        batch_format="pyarrow",
    )
    unioned = l_tagged.union(r_tagged)

    l_only = [n for n in left_names if n not in right_names]
    r_only = [n for n in right_names if n not in left_names]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"][[key] + l_only]
        r = g[g["__side"] == "r"][[key] + r_only]
        out = l.merge(r, on=key, how="inner")
        return out

    return unioned.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str,
    ts_col: str,
    right_ts_col: str | None = None,
    num_buckets: int = 32,
) -> Dataset:
    """As-of join (SURVEY §2.4 notes the reference has none; a general
    engine needs it): for each left row, attach the latest right row with
    the same key whose timestamp is <= the left timestamp.

    Pattern from the Ray guide: bucket both sides by key hash, one groupby
    shuffle co-locates a key's rows, ``pd.merge_asof`` runs per bucket over
    ts-sorted frames.  Left rows with no earlier right row keep nulls.
    """
    right_ts_col = right_ts_col or ts_col
    left_names = list(left.schema().names)
    right_names = list(right.schema().names)
    all_names = left_names + [n for n in right_names if n not in left_names]

    l_tagged = left.map_batches(
        lambda b: _with_schema(b, "l", all_names, key, num_buckets),
        batch_format="pyarrow",
    )
    r_tagged = right.map_batches(
        lambda b: _with_schema(b, "r", all_names, key, num_buckets),
        batch_format="pyarrow",
    )
    unioned = l_tagged.union(r_tagged)
    r_only = [n for n in right_names if n not in left_names]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"][left_names].sort_values(ts_col, kind="mergesort")
        r = g[g["__side"] == "r"][[key, right_ts_col] + [c for c in r_only if c != right_ts_col]]
        r = r.sort_values(right_ts_col, kind="mergesort")
        if len(l) == 0:
            return pd.DataFrame(columns=left_names + r_only)
        out = pd.merge_asof(
            l,
            r,
            left_on=ts_col,
            right_on=right_ts_col,
            by=key,
            direction="backward",
            suffixes=("", "__r"),
        )
        return out

    return unioned.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
