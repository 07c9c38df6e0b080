"""Large x large joins.

Every join in the KG pipeline proper is broadcast-small-side (SURVEY
§2.4: nothing exceeds big x ontology-sized), but a general engine needs a
both-sides-large join.  This is the portable partitioned hash join from
the Ray guide: tag each side, align schemas, bucket by key hash, union,
one groupby(bucket) shuffle, then a pandas merge per bucket.

Bucket assignment is vectorized: ``pandas.util.hash_array`` (Cython
SipHash with a fixed key, deterministic across processes) replaces the
former per-row ``zlib.crc32(str(k))`` Python loop, so the tagging stage
stays C-speed even on string keys.

Shared non-key columns (present on BOTH sides) are kept and suffixed
``_l`` / ``_r`` (pandas-merge style) — they are renamed at tagging time so
the two sides never collide in the unioned schema.

Skew note: a hot key lands in one bucket; raise ``num_buckets`` or
pre-salt the hot key's rows into sub-buckets (same pattern as
canonicalize.py) when a key's row count exceeds a worker's heap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def hash_bucket(values, num_buckets: int) -> np.ndarray:
    """Deterministic vectorized bucket id for an arbitrary key array.

    ``pd.util.hash_array`` uses a fixed hash key (no PYTHONHASHSEED
    dependence) and runs in Cython for both numeric and object dtypes.
    """
    arr = np.asarray(values)
    if arr.dtype == object:
        arr = arr.astype("O")
    hashed = pd.util.hash_array(arr, categorize=False)
    return (hashed % np.uint64(num_buckets)).astype(np.int32)


def _plan_columns(
    left_names: list[str], right_names: list[str], key: str
) -> tuple[dict[str, str], dict[str, str]]:
    """Per-side rename maps: shared non-key columns get _l/_r suffixes."""
    shared = {n for n in left_names if n in right_names and n != key}
    l_map = {n: (f"{n}_l" if n in shared else n) for n in left_names}
    r_map = {n: (f"{n}_r" if n in shared else n) for n in right_names}
    return l_map, r_map


def _with_schema(
    batch: pa.Table,
    side: str,
    rename: dict[str, str],
    all_names: list[str],
    key: str,
    num_buckets: int,
) -> pa.Table:
    cols = {}
    n = batch.num_rows
    present = {rename[name]: batch.column(name) for name in batch.column_names}
    for name in all_names:
        cols[name] = present.get(name, pa.nulls(n))
    cols["__side"] = pa.array([side] * n, pa.string())
    cols["__bucket"] = pa.array(
        hash_bucket(batch.column(key).to_numpy(zero_copy_only=False), num_buckets),
        pa.int32(),
    )
    return pa.table(cols)


def bucketed_hash_join(
    left: Dataset,
    right: Dataset,
    key: str,
    num_buckets: int = 32,
) -> Dataset:
    """Inner join of two large Datasets on ``key``.

    Output columns = union of both sides' columns: the shared ``key`` kept
    once, and any other column present on both sides emitted twice as
    ``<name>_l`` / ``<name>_r``.  One all-to-all shuffle (the groupby on
    bucket).
    """
    l_map, r_map = _plan_columns(
        list(left.schema().names), list(right.schema().names), key
    )
    l_names = list(l_map.values())
    r_names = list(r_map.values())
    all_names = l_names + [n for n in r_names if n not in l_names]

    l_tagged = left.map_batches(
        lambda b: _with_schema(b, "l", l_map, all_names, key, num_buckets),
        batch_format="pyarrow",
    )
    r_tagged = right.map_batches(
        lambda b: _with_schema(b, "r", r_map, all_names, key, num_buckets),
        batch_format="pyarrow",
    )
    unioned = l_tagged.union(r_tagged)

    l_other = [n for n in l_names if n != key]
    r_other = [n for n in r_names if n != key and n not in l_names]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"][[key] + l_other]
        r = g[g["__side"] == "r"][[key] + r_other]
        return l.merge(r, on=key, how="inner")

    return unioned.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def _bucketed_membership_join(
    left: Dataset, right: Dataset, key: str, num_buckets: int, keep_matches: bool
) -> Dataset:
    """Shared core of semi/anti join: the right side is pruned to its key
    column (per-batch distinct — membership needs nothing else), both
    sides bucket by key hash, and one groupby(bucket) co-locates each
    key; left rows are filtered by membership per bucket."""
    l_map, _ = _plan_columns(list(left.schema().names), [key], key)
    l_names = list(l_map.values())

    def key_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {key: pc.unique(b.column(key))}
        n = len(cols[key])
        for name in l_names:
            if name != key:
                cols[name] = pa.nulls(n)
        t = pa.table(cols).select(l_names)
        return t

    l_tagged = left.map_batches(
        lambda b: _with_schema(b, "l", l_map, l_names, key, num_buckets),
        batch_format="pyarrow",
    )
    r_tagged = right.select_columns([key]).map_batches(
        lambda b: _with_schema(key_only(b), "r", {n: n for n in l_names}, l_names, key, num_buckets),
        batch_format="pyarrow",
    )
    unioned = l_tagged.union(r_tagged)
    l_other = [n for n in l_names if n != key]

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"][[key] + l_other]
        member = l[key].isin(set(g.loc[g["__side"] == "r", key]))
        return l[member] if keep_matches else l[~member]

    return unioned.groupby("__bucket").map_groups(filter_bucket, batch_format="pandas")


def bucketed_semi_join(
    left: Dataset, right: Dataset, key: str, num_buckets: int = 32
) -> Dataset:
    """Left rows whose key EXISTS in right (big x big semi join: one
    shuffle, right shipped as distinct keys only).  For ontology-sized
    right sides prefer the broadcast lookup (SURVEY §2.4)."""
    return _bucketed_membership_join(left, right, key, num_buckets, True)


def bucketed_anti_join(
    left: Dataset, right: Dataset, key: str, num_buckets: int = 32
) -> Dataset:
    """Left rows whose key does NOT exist in right (NOT EXISTS)."""
    return _bucketed_membership_join(left, right, key, num_buckets, False)


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
    Shared non-key columns are suffixed ``_l`` / ``_r`` like
    :func:`bucketed_hash_join` (``ts_col`` counts as left-only unless the
    right side reuses the same name).
    """
    right_ts_col = right_ts_col or ts_col
    l_map, r_map = _plan_columns(
        list(left.schema().names), list(right.schema().names), key
    )
    l_names = list(l_map.values())
    r_names = list(r_map.values())
    all_names = l_names + [n for n in r_names if n not in l_names]
    ts_l = l_map[ts_col]
    ts_r = r_map[right_ts_col]

    l_tagged = left.map_batches(
        lambda b: _with_schema(b, "l", l_map, all_names, key, num_buckets),
        batch_format="pyarrow",
    )
    r_tagged = right.map_batches(
        lambda b: _with_schema(b, "r", r_map, all_names, key, num_buckets),
        batch_format="pyarrow",
    )
    unioned = l_tagged.union(r_tagged)
    r_other = [n for n in r_names if n != key and n not in l_names]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"][l_names].sort_values(ts_l, kind="mergesort")
        r = g[g["__side"] == "r"][[key, ts_r] + [c for c in r_other if c != ts_r]]
        r = r.sort_values(ts_r, kind="mergesort")
        if len(l) == 0:
            return pd.DataFrame(columns=l_names + r_other)
        return pd.merge_asof(
            l,
            r,
            left_on=ts_l,
            right_on=ts_r,
            by=key,
            direction="backward",
        )

    return unioned.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
