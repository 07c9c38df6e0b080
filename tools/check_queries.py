"""Local mirror of the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side on an sf dir, compare row count, schema
(sorted column names) and order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_df(x) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(x, ray.data.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canonicalize(ray_df), canonicalize(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if a[c].dtype.kind == "f" and b[c].dtype.kind == "f":
                bad = ~(np.isclose(av.astype(float), bv.astype(float), atol=1e-9, equal_nan=True))
            else:
                bad = av != bv
                # tolerate numeric dtype mismatch (int32 vs int64)
                if bad.any() and a[c].dtype.kind in "iu" and b[c].dtype.kind in "iu":
                    bad = av.astype("int64") != bv.astype("int64")
            if np.asarray(bad).any():
                i = int(np.asarray(bad).nonzero()[0][0])
                problems.append(
                    f"col {c}: first diff at row {i}: ray={av[i]!r} sql={bv[i]!r} "
                    f"({int(np.asarray(bad).sum())} diffs)"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # kg oracles pin a corpus tier (oracle_sql() takes no argument);
    # sweep them at the tier being swept so corpus sizes match
    import os

    os.environ["GRAFT_KG_ORACLE_SF"] = sf_dir

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from climatemind_ontology_processing_ray.runtime import configure_data_context

    configure_data_context()
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from climatemind_ontology_processing_ray.pipelines.queries import REGISTRY

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_ok = n_bad = 0
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray side raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        ray_s = time.time() - t0
        if sql is None:
            print(f"ok   {name}: rows-only ({len(ray_df)} rows, {ray_s:.1f}s)")
            n_ok += 1
            continue
        t0 = time.time()
        try:
            sql_df = con.execute(sql() if callable(sql) else sql).df()
        except Exception as e:
            print(f"FAIL {name}: sql raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        sql_s = time.time() - t0
        problems = compare(name, ray_df, sql_df)
        if problems:
            n_bad += 1
            print(f"FAIL {name} ({len(ray_df)} vs {len(sql_df)} rows):")
            for p in problems[:4]:
                print(f"     {p}")
        else:
            n_ok += 1
            print(f"OK   {name}: {len(ray_df)} rows (ray {ray_s:.1f}s, sql {sql_s:.1f}s)")
    print(f"\n{n_ok} ok, {n_bad} failing")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
