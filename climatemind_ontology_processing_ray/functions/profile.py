"""Dataset profiling: per-column statistics in two streaming passes.

The first thing a 100 TB ingest does is profile what arrived — row
count, null rates, distinct cardinality, value ranges per column —
both for data-quality gates (a column that suddenly goes 40% null) and
for planning (distinct counts size the downstream shuffles).

Shape: pass 1 is a ``map_batches`` partial emitting ONE row per
(column, block) with count / null / min / max — merged on the driver
(columns × blocks rows, never data-sized).  Pass 2 melts to
(column, value) pairs and reuses :func:`.agg.grouped_count_distinct`
(pair-hash partition + two-phase count) for EXACT distinct counts —
the expensive leg, one exchange, map-side pre-deduped.  Swap pass 2
for the HLL sketch (functions/sketch.py) when approximate counts are
acceptable — same call shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .agg import grouped_count_distinct


def profile_columns(ds: Dataset, columns: list[str]) -> pd.DataFrame:
    """One row per profiled column:
    (col_name, n, nulls, n_distinct, min_val, max_val) — min/max
    stringified AFTER the native-type reduction (so integer columns
    compare numerically, not lexically), matching
    ``CAST(MIN(x) AS VARCHAR)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs, is_num = [], [], [], [], [], []
        for c in columns:
            col = batch.column(c)
            names.append(c)
            ns.append(len(col))
            nulls.append(col.null_count)
            mm = pc.min_max(col)
            mins.append(str(mm["min"].as_py()) if mm["min"].is_valid else None)
            maxs.append(str(mm["max"].as_py()) if mm["max"].is_valid else None)
            is_num.append(
                pa.types.is_integer(col.type) or pa.types.is_floating(col.type)
            )
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
                # per-block min/max stay native-typed inside min_max;
                # the string is only for the uniform partial schema —
                # the driver merge converts back for numeric columns
                # (the batch's Arrow type travels as the is_num flag)
                "min_s": pa.array(mins, pa.string()),
                "max_s": pa.array(maxs, pa.string()),
                "is_num": pa.array(is_num, pa.bool_()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()

    def _red(vals: pd.Series, numeric: bool, fn) -> str | None:
        vals = vals.dropna()
        if not len(vals):
            return None
        if numeric:
            return str(fn(pd.to_numeric(vals)))
        return str(fn(vals))

    rows = []
    for c in columns:
        sub = parts[parts["col_name"] == c]
        numeric = bool(sub["is_num"].any())
        rows.append(
            {
                "col_name": c,
                "n": int(sub["n"].sum()),
                "nulls": int(sub["nulls"].sum()),
                "min_val": _red(sub["min_s"], numeric, min),
                "max_val": _red(sub["max_s"], numeric, max),
            }
        )
    summary = pd.DataFrame(rows)

    # exact distinct: melt to (col_name, val) and run the pair-partition
    # two-phase distinct count — the only exchange in the profile
    def melt(batch: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in columns:
            col = batch.column(c).drop_null().cast(pa.string())
            u = col.unique()  # map-side pre-dedup
            names.append(np.full(len(u), c, dtype=object))
            vals.append(u.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "col_name": pa.array(np.concatenate(names), pa.string()),
                "val": pa.array(np.concatenate(vals), pa.string()),
            }
        )

    melted = ds.map_batches(melt, batch_format="pyarrow")
    distinct = grouped_count_distinct(melted, "col_name", "val").to_pandas()

    out = summary.merge(distinct, on="col_name", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out = out[["col_name", "n", "nulls", "n_distinct", "min_val", "max_val"]]
    return out.sort_values("col_name").reset_index(drop=True)
