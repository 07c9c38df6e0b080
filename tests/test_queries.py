"""Query registry vs DuckDB oracles (a fast in-suite mirror of the
driver's correctness gate, at sf0.001)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# fast representative subset (the full 33-entry registry is exercised by
# tools/check_queries.py and by the evaluation driver)
SUBSET = [
    "pricing_summary",
    "region_rollup",
    "topk_orders",
    "first_per_key",
    "token_counts",
    "fingerprint",
    "dedup_exact",
    "semdedup",
    "dedup_keep_best",
    "shuffle_shards",
    "embedding_neardup",
    "ann_topk",
    "events_hourly",
    "sessionize",
    "kg_extract",
    "mention_counts",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, con, name):
    from climatemind_ontology_processing_ray.pipelines.queries import REGISTRY

    fn, sql = REGISTRY[name]
    ray_df = fn(SF)
    if hasattr(ray_df, "to_pandas"):
        ray_df = ray_df.to_pandas()
    assert sql is not None
    sql_df = con.execute(sql() if callable(sql) else sql).df()
    assert sorted(ray_df.columns) == sorted(sql_df.columns)
    assert len(ray_df) == len(sql_df)
    a, b = _canon(ray_df), _canon(sql_df)
    for c in a.columns:
        if a[c].dtype.kind == "f":
            assert np.allclose(
                a[c].astype(float), b[c].astype(float), atol=1e-9, equal_nan=True
            ), c
        else:
            assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_registry_contract():
    """Every oracle key exists in queries(); names are unique and stable."""
    from climatemind_ontology_processing_ray.pipelines.queries import (
        oracle_sql,
        queries,
    )

    q, o = queries(), oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30
    assert len(o) >= 25


def test_approx_distinct_error_bound(ray_session, con):
    """HLL estimate within 5% of exact COUNT(DISTINCT)."""
    from climatemind_ontology_processing_ray.pipelines.queries import REGISTRY

    import ray.data as rd

    from climatemind_ontology_processing_ray.functions.sketch import approx_distinct

    ds = rd.read_parquet(SF + "/events.parquet", columns=["event_type", "user_id"])
    est = approx_distinct(ds, "user_id", ["event_type"], p=12).to_pandas()
    approx = dict(zip(est.event_type, est.approx_distinct))
    exact = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY event_type"
        ).fetchall()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.05 * exact[k]), (k, approx[k], exact[k])

    # the checked query row: independent exact pass agrees with DuckDB and
    # the within-bound contract holds
    fn, _ = REGISTRY["approx_distinct"]
    out = fn(SF)
    assert out["within_bound"].all()
    assert dict(zip(out.event_type, out.exact_distinct)) == exact


def test_num_blocks_policy():
    """Read-block policy: small tables get few blocks (the ~10ms-per-task
    scheduling swarm was the dominant cost of every small-sf query); large
    tables keep growing past the 64-block floor so a block never exceeds
    ~64k rows — parallelism is never capped by the policy at scale."""
    from climatemind_ontology_processing_ray.pipelines.queries import _num_blocks

    assert _num_blocks(1, 1024) == 1
    assert _num_blocks(2000, 1024) == 2
    assert _num_blocks(15_000, 1024) == 15
    assert _num_blocks(150_000, 1024) == 64         # capped at the floor
    assert _num_blocks(600_000, 1024) == 64
    # past 64 * 65536 rows the cap grows with the data
    assert _num_blocks(10_000_000, 1024) == 153     # ceil(1e7 / 65536)
    assert _num_blocks(10_000_000, 1024) * 65_536 >= 10_000_000
    # a finer rows_per_block only adds blocks below the cap
    assert _num_blocks(5_000, 256) == 20
