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
        # min/max travel NATIVE-TYPED in three lanes (int64 / float64 /
        # string) selected by `kind`, never round-tripped through a
        # stringify — a string lane re-parsed with to_numeric raises on
        # mixed-schema ingestion, and Python float repr need not match
        # the final formatting rule (ADVICE r4).  Stringification
        # happens ONCE, in the driver merge, after the typed reduction.
        names, ns, nulls, kinds = [], [], [], []
        min_i, max_i, min_f, max_f, min_s, max_s = [], [], [], [], [], []
        for c in columns:
            col = batch.column(c)
            names.append(c)
            ns.append(len(col))
            nulls.append(col.null_count)
            mm = pc.min_max(col)
            lo = mm["min"].as_py() if mm["min"].is_valid else None
            hi = mm["max"].as_py() if mm["max"].is_valid else None
            if pa.types.is_integer(col.type):
                kind = "i"
            elif pa.types.is_floating(col.type):
                kind = "f"
            else:
                kind = "s"
            kinds.append(kind)
            min_i.append(lo if kind == "i" else None)
            max_i.append(hi if kind == "i" else None)
            min_f.append(lo if kind == "f" else None)
            max_f.append(hi if kind == "f" else None)
            min_s.append(str(lo) if (kind == "s" and lo is not None) else None)
            max_s.append(str(hi) if (kind == "s" and hi is not None) else None)
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "min_i": pa.array(min_i, pa.int64()),
                "max_i": pa.array(max_i, pa.int64()),
                "min_f": pa.array(min_f, pa.float64()),
                "max_f": pa.array(max_f, pa.float64()),
                "min_s": pa.array(min_s, pa.string()),
                "max_s": pa.array(max_s, pa.string()),
            }
        )

    # merge in Arrow, not pandas: a nullable int64 lane pulled through
    # to_pandas becomes float64 and silently loses precision past 2^53
    parts = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )

    rows = []
    for c in columns:
        sub = parts.filter(pc.equal(parts.column("col_name"), c))
        kinds = set(sub.column("kind").to_pylist())
        if len(kinds) > 1:
            raise ValueError(
                f"profile_columns: column {c!r} has conflicting types "
                f"across blocks ({sorted(kinds)}) — mixed-schema input"
            )
        kind = kinds.pop() if kinds else "s"
        lo_a = sub.column(f"min_{kind}")
        hi_a = sub.column(f"max_{kind}")
        lo = pc.min(lo_a).as_py() if lo_a.null_count < len(lo_a) else None
        hi = pc.max(hi_a).as_py() if hi_a.null_count < len(hi_a) else None
        rows.append(
            {
                "col_name": c,
                "n": int(pc.sum(sub.column("n")).as_py()),
                "nulls": int(pc.sum(sub.column("nulls")).as_py()),
                "min_val": None if lo is None else str(lo),
                "max_val": None if hi is None else str(hi),
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
