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

import numpy as np
import pandas as pd

from ray.data import Dataset

from .join import hash_bucket
from .partitioning import adaptive_parts

_NUM_PARTS = 64  # legacy fallback; entry points now size fan-out from the
# input row estimate (functions/partitioning.py) unless told otherwise


def _grouped_reduce(
    ds: Dataset,
    keys: list[str],
    cols: list[str],
    how: str,
    num_parts: int,
) -> Dataset:
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
        out = g.groupby(keys, sort=False)[cols].agg(how).reset_index()
        for c in cols:
            if out[c].dtype.kind in "iu":
                out[c] = out[c].astype("int64")
        return out

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(merge, batch_format="pandas")
    )


def grouped_sum(
    ds: Dataset,
    keys: list[str],
    sum_cols: list[str],
    num_parts: int | None = None,
) -> Dataset:
    """SUM(sum_cols) GROUP BY keys, scale-safe at any key cardinality.

    Input should already be map-side combined (each block contributing
    few rows per key) — this runs the exchange + final merge.  Fan-out
    defaults to ``adaptive_parts(ds)`` (∝ rows, floor/ceiling)."""
    if num_parts is None:
        num_parts = adaptive_parts(ds)
    return _grouped_reduce(ds, keys, sum_cols, "sum", num_parts)


def grouped_min(
    ds: Dataset,
    keys: list[str],
    min_cols: list[str],
    num_parts: int | None = None,
) -> Dataset:
    """MIN(min_cols) GROUP BY keys — same coarse-partition exchange as
    :func:`grouped_sum` (min is associative/commutative, so map-side
    pre-combined partials merge exactly)."""
    if num_parts is None:
        num_parts = adaptive_parts(ds)
    return _grouped_reduce(ds, keys, min_cols, "min", num_parts)


def grouped_max(
    ds: Dataset,
    keys: list[str],
    max_cols: list[str],
    num_parts: int | None = None,
) -> Dataset:
    """MAX(max_cols) GROUP BY keys — the :func:`grouped_min` exchange
    with the dual fold (max is associative/commutative too)."""
    if num_parts is None:
        num_parts = adaptive_parts(ds)
    return _grouped_reduce(ds, keys, max_cols, "max", num_parts)


def grouped_sum_rollup(
    ds: Dataset,
    keys: list[str],
    sum_cols: list[str],
    sentinel: str = "ALL",
    num_parts: int | None = None,
) -> Dataset:
    """SUM(sum_cols) GROUP BY ROLLUP(keys): every key prefix plus the
    grand total, the masked-out key columns set to ``sentinel``.

    Map-side expansion does the heavy lifting: each batch is pre-combined
    at EVERY rollup level locally (len(keys)+1 small frames per batch), so
    the exchange carries per-block-per-level partials, never raw rows —
    the grand-total level adds exactly one row per block.  The final merge
    is one :func:`grouped_sum` over the sentinel-filled key columns."""

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            # no rows → no partials; the empty-set branch below would
            # fabricate an all-sentinel zero row AND flip sum dtypes to
            # float64 (pandas .sum() of an empty int column)
            return b[keys + sum_cols].iloc[0:0]
        levels = []
        for depth in range(len(keys), -1, -1):
            kept = keys[:depth]
            if kept:
                g = b.groupby(kept, sort=False)[sum_cols].sum().reset_index()
            else:
                g = b[sum_cols].sum().to_frame().T
            for k in keys[depth:]:
                g[k] = sentinel
            levels.append(g[keys + sum_cols])
        return pd.concat(levels, ignore_index=True)

    return grouped_sum(
        ds.map_batches(expand, batch_format="pandas"), keys, sum_cols, num_parts
    )


def grouped_sum_cube(
    ds: Dataset,
    keys: list[str],
    sum_cols: list[str],
    sentinel: str = "ALL",
    num_parts: int | None = None,
) -> Dataset:
    """SUM(sum_cols) GROUP BY CUBE(keys): every SUBSET of the key columns
    (2^len(keys) grouping sets), masked-out keys set to ``sentinel`` —
    the OLAP companion to :func:`grouped_sum_rollup` (which only takes
    prefixes).  Same map-side expansion contract: each batch pre-combines
    at every grouping set locally, so the exchange carries
    per-block-per-set partials, never raw rows.  The 2^k fan-out bounds
    the usable key count by design (a real cube query rarely exceeds 3-4
    dims); the per-block partial volume is Σ_set |distinct keys in set|."""
    from itertools import combinations

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b[keys + sum_cols].iloc[0:0]  # see grouped_sum_rollup
        levels = []
        for depth in range(len(keys), -1, -1):
            for kept in combinations(keys, depth):
                if kept:
                    g = b.groupby(list(kept), sort=False)[sum_cols].sum().reset_index()
                else:
                    g = b[sum_cols].sum().to_frame().T
                for k in keys:
                    if k not in kept:
                        g[k] = sentinel
                levels.append(g[keys + sum_cols])
        return pd.concat(levels, ignore_index=True)

    return grouped_sum(
        ds.map_batches(expand, batch_format="pandas"), keys, sum_cols, num_parts
    )


def pivot_counts(
    ds: Dataset,
    key: str,
    pivot_col: str,
    categories: list[str],
    num_parts: int | None = None,
) -> Dataset:
    """Pivot ``pivot_col`` into one count column per category
    (``n_<category>``), grouped by ``key``.  The category set must be
    declared up front (schema-bounded wide output — the scale contract of
    any pivot).  Map-side: one vectorized crosstab per batch; exchange
    carries (key x categories) partial matrices; merge is grouped_sum."""
    cols = [f"n_{c}" for c in categories]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(b[key], b[pivot_col])
        out = pd.DataFrame(index=ct.index)
        for c, name in zip(categories, cols):
            out[name] = ct[c].astype("int64") if c in ct.columns else 0
        return out.reset_index()

    return grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), [key], cols, num_parts
    )


def grouped_count_distinct(
    ds: Dataset,
    key_col: str,
    value_col: str,
    out_col: str = "n_distinct",
    num_parts: int | None = None,
) -> Dataset:
    """EXACT COUNT(DISTINCT value) GROUP BY key at any cardinality of
    either side — the companion to the HLL sketch (functions/sketch.py)
    when the answer must be exact.

    Two-level shape: (key, value) pairs dedup under a coarse hash
    partition of the PAIR (so a hot key's values still spread across
    partitions at the dedup stage), then per-key partial counts feed one
    :func:`grouped_sum`.  Map-side drop_duplicates pre-combines before
    either exchange."""
    if num_parts is None:
        num_parts = adaptive_parts(ds)

    def local(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[key_col, value_col]].drop_duplicates()
        pair = out[key_col].astype(str) + "\x1f" + out[value_col].astype(str)
        return out.assign(__part=hash_bucket(pair.to_numpy(), num_parts))

    def dedup_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[key_col, value_col]].drop_duplicates()
        vc = d.groupby(key_col, sort=False).size()
        return pd.DataFrame(
            {key_col: vc.index, out_col: vc.to_numpy().astype("int64")}
        )

    partial = (
        ds.map_batches(local, batch_format="pandas")
        .groupby("__part")
        .map_groups(dedup_count, batch_format="pandas")
    )
    return grouped_sum(partial, [key_col], [out_col], num_parts)


def pareto_frontier_2d(
    ds: Dataset,
    max_col: str,
    min_col: str,
) -> Dataset:
    """2-D Pareto frontier (skyline): rows not dominated by any other —
    dominance = other.max_col >= mine AND other.min_col <= mine with at
    least one strict.  Equal (max, min) pairs do not dominate each
    other, so exact duplicates all survive (matching the SQL NOT-EXISTS
    definition).

    The skyline operator has a perfect combiner:
    ``skyline(S1 ∪ S2) = skyline(skyline(S1) ∪ skyline(S2))`` — each
    block reduces to its local frontier (vectorized sort + prefix-min
    scan), and one final pass merges the (frontier-sized, typically tiny)
    survivors.  The corpus is never shuffled; only local frontiers move."""

    def local_skyline(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        s = b.sort_values(
            [max_col, min_col], ascending=[False, True], kind="mergesort"
        )
        p = s[max_col].to_numpy()
        d = s[min_col].to_numpy()
        # prefix min of min_col over rows with STRICTLY greater max_col:
        # group boundaries where p changes
        new_grp = np.empty(len(p), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = p[1:] != p[:-1]
        grp_id = np.cumsum(new_grp) - 1
        run_min = np.minimum.accumulate(d)
        # min over all PRIOR groups = run_min at the last row of the
        # previous group
        grp_last_idx = np.flatnonzero(np.append(new_grp[1:], True))
        prev_last = grp_last_idx[grp_id - 1]
        # dominated by a strictly-higher-max row with min_col <= mine.
        # mask instead of an inf sentinel: min_col may be datetime64,
        # which has no inf
        has_prior = grp_id > 0
        dom_gt = np.zeros(len(p), dtype=bool)
        dom_gt[has_prior] = run_min[prev_last[has_prior]] <= d[has_prior]
        # dominated within the equal-max group by a strictly smaller min
        grp_min = s.groupby(grp_id, sort=False)[min_col].transform("min").to_numpy()
        dom_eq = grp_min < d
        return s[~(dom_gt | dom_eq)]

    local = ds.map_batches(local_skyline, batch_format="pandas")
    # final merge: all local survivors in ONE partition (frontier-sized
    # by assumption — document the caller's contract)
    return (
        local.map_batches(
            lambda b: b.assign(__part=np.int32(0)), batch_format="pandas"
        )
        .groupby("__part")
        .map_groups(
            lambda g: local_skyline(g.drop(columns="__part")),
            batch_format="pandas",
        )
    )


def exact_auc(
    ds: Dataset,
    label_col: str,
    score_col: str,
    num_parts: int | None = None,
) -> "pd.DataFrame":
    """Exact ROC-AUC of an integer score against a binary label as a
    RATIONAL (auc_num / auc_den) — the classifier-evaluation primitive
    for curation models (quality classifiers, langID, dedup scorers),
    bit-reproducible at any partitioning so it is SQL-hash-checkable.

    Mann-Whitney rank-sum with midrank tie handling, all integer:
    ``auc = (2*R_pos - n_pos*(n_pos+1)) / (2*n_pos*n_neg)`` where
    ``R_pos`` uses average ranks over score ties (doubled to stay
    integral).  Distributed shape: ONE map-side-combined grouped-sum
    exchange reduces the corpus to (distinct score -> n, n_pos); the
    rank cumsum runs on the driver over that table, which is bounded by
    the score's value range, never by corpus rows (integer quality
    composites have fixed range at any corpus size)."""
    if num_parts is None:
        num_parts = adaptive_parts(ds)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b[label_col].astype("int64")
        out = pd.DataFrame({"s": b[score_col].astype("int64"), "y": y})
        g = (
            out.groupby("s", sort=False)
            .agg(t=("y", "size"), p=("y", "sum"))
            .reset_index()
        )
        g["t"] = g["t"].astype("int64")
        g["p"] = g["p"].astype("int64")
        return g

    g = (
        grouped_sum(
            ds.map_batches(partial, batch_format="pandas"),
            ["s"],
            ["t", "p"],
            num_parts,
        )
        .to_pandas()
        .sort_values("s")
        .reset_index(drop=True)
    )
    t = g["t"].to_numpy().astype(object)  # python ints: no overflow at any N
    p = g["p"].to_numpy().astype(object)
    c = np.cumsum(t) - t
    n_pos = int(p.sum()) if len(g) else 0
    n = int(t.sum()) if len(g) else 0
    n_neg = n - n_pos
    two_r_pos = int((p * (2 * c + t + 1)).sum()) if len(g) else 0
    auc_num = two_r_pos - n_pos * (n_pos + 1)
    auc_den = 2 * n_pos * n_neg
    return pd.DataFrame({"auc_num": [auc_num], "auc_den": [auc_den]}).astype(
        "int64"
    )


def category_user_overlap(
    ds: Dataset,
    cat_col: str = "event_type",
    user_col: str = "user_id",
    num_parts: int | None = None,
) -> Dataset:
    """Audience-overlap matrix: for every pair of categories (a < b),
    the EXACT number of distinct users seen in both and in either —
    the integer core of pairwise Jaccard between category audiences
    (segment-overlap analysis / co-engagement mining).

    Shuffle structure — one hash(user) exchange, never an all-pairs
    user join:

    1. per-batch distinct (user, cat) presence partials;
    2. ONE hash(user) exchange: each user's full category set
       co-locates, so the partition computes its presence matrix
       X (users x cats, 0/1) and the LOCAL co-occurrence counts
       ``X.T @ X`` — a categories² matrix, tiny regardless of user
       count.  Partition partials sum exactly because each user lives
       in one partition;
    3. one ``grouped_sum`` over (cat_a, cat_b) merges the partials;
       union sizes derive from the diagonal: |A ∪ B| = |A|+|B|-|A ∩ B|.

    Output: (type_a, type_b, inter_users, union_users) for pairs with
    inter_users > 0, as a driver-side categories²-sized table.
    """
    if num_parts is None:
        num_parts = adaptive_parts(ds)

    def presence(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[user_col, cat_col]].drop_duplicates()
        out["__part"] = hash_bucket(out[user_col].to_numpy(), num_parts)
        return out

    def local_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[user_col, cat_col]].drop_duplicates()
        x = pd.crosstab(g[user_col], g[cat_col]).clip(upper=1)
        m = x.T.to_numpy(dtype=np.int64) @ x.to_numpy(dtype=np.int64)
        cats = list(x.columns)
        ia, ib = np.triu_indices(len(cats))
        return pd.DataFrame(
            {
                "type_a": np.asarray(cats, dtype=object)[ia],
                "type_b": np.asarray(cats, dtype=object)[ib],
                "n": m[ia, ib].astype("int64"),
            }
        )

    partials = (
        ds.map_batches(presence, batch_format="pandas")
        .groupby("__part")
        .map_groups(local_counts, batch_format="pandas")
    )
    merged = grouped_sum(partials, ["type_a", "type_b"], ["n"]).to_pandas()

    sizes = dict(
        zip(
            merged.loc[merged.type_a == merged.type_b, "type_a"],
            merged.loc[merged.type_a == merged.type_b, "n"],
        )
    )
    pairs = merged[(merged.type_a != merged.type_b) & (merged.n > 0)].copy()
    pairs["inter_users"] = pairs["n"].astype("int64")
    pairs["union_users"] = (
        pairs.type_a.map(sizes).astype("int64")
        + pairs.type_b.map(sizes).astype("int64")
        - pairs["inter_users"]
    ).astype("int64")
    out = (
        pairs[["type_a", "type_b", "inter_users", "union_users"]]
        .sort_values(["type_a", "type_b"])
        .reset_index(drop=True)
    )
    import ray.data as rd

    return rd.from_pandas(out)


def copurchase_pair_counts(
    ds: Dataset,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    num_parts: int | None = None,
) -> Dataset:
    """Frequent-itemset pair mining (the A-priori k=2 primitive): for
    every unordered item pair, the number of distinct baskets containing
    both, kept at ``count >= min_support``.

    Shuffle structure:

    1. ONE hash(basket) exchange of the raw (basket, item) rows — a
       basket's items co-locate, so per-basket DISTINCT and pair
       generation run in-partition.  Pair generation is pure index
       arithmetic (repeat/cumsum over sorted group offsets) — no Python
       loop over baskets;
    2. map-side combine (per-partition pair counts), then one
       ``grouped_sum`` over (item_a, item_b).

    Pair volume is sum over baskets of C(k, 2) — bounded by basket
    size, never by corpus size (the classic market-basket contract;
    a pathological mega-basket should be capped upstream).

    Output: (item_a, item_b, n_baskets) with item_a < item_b.
    """
    if num_parts is None:
        num_parts = adaptive_parts(ds)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[basket_col, item_col]].drop_duplicates()
        out["__part"] = hash_bucket(out[basket_col].to_numpy(), num_parts)
        return out

    def pairs_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[basket_col, item_col]].drop_duplicates()
        g = g.sort_values([basket_col, item_col], kind="mergesort")
        items = g[item_col].to_numpy()
        sizes = g.groupby(basket_col, sort=False).size().to_numpy()
        # within-group position of every row; row at position j pairs
        # (as the right element) with the j rows before it
        starts = np.cumsum(sizes) - sizes
        pos = np.arange(len(g)) - np.repeat(starts, sizes)
        total = int(pos.sum())
        if total == 0:
            # typed empty: a bare [] frame is float64 and would poison the
            # block schema (stringified-integer compares downstream)
            empty = pd.Series([], dtype=g[item_col].dtype)
            return pd.DataFrame(
                {
                    "item_a": empty,
                    "item_b": empty.copy(),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        rights = np.repeat(np.arange(len(g)), pos)
        before = np.cumsum(pos) - pos
        left_off = np.arange(total) - np.repeat(before, pos)
        lefts = np.repeat(np.repeat(starts, sizes), pos) + left_off
        out = (
            pd.DataFrame({"item_a": items[lefts], "item_b": items[rights]})
            .groupby(["item_a", "item_b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype("int64")
        return out

    summed = grouped_sum(
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(pairs_partial, batch_format="pandas"),
        ["item_a", "item_b"],
        ["n"],
    )
    import pyarrow.compute as pc

    return summed.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_support)),
        batch_format="pyarrow",
    )


def basket_triple_counts(
    ds: Dataset,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    num_parts: int | None = None,
) -> Dataset:
    """Frequent-itemset TRIPLE mining (A-priori k=3, the level above
    :func:`copurchase_pair_counts`): for every unordered item triple
    a < b < c, the number of distinct baskets containing all three, kept
    at ``count >= min_support``.

    Same shuffle contract as the pair miner — ONE hash(basket) exchange,
    everything else in-partition: pairs come from the identical
    repeat/cumsum index arithmetic, and the third element joins on via a
    vectorized in-partition merge (pair (a,b) × basket items c, kept at
    c > b) — never a Python loop over baskets.  Triple volume is
    sum-over-baskets C(k,3), bounded by basket size."""
    if num_parts is None:
        num_parts = adaptive_parts(ds)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[basket_col, item_col]].drop_duplicates()
        out["__part"] = hash_bucket(out[basket_col].to_numpy(), num_parts)
        return out

    def triples_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[basket_col, item_col]].drop_duplicates()
        g = g.sort_values([basket_col, item_col], kind="mergesort")
        items = g[item_col].to_numpy()
        baskets = g[basket_col].to_numpy()
        sizes = g.groupby(basket_col, sort=False).size().to_numpy()
        starts = np.cumsum(sizes) - sizes
        pos = np.arange(len(g)) - np.repeat(starts, sizes)
        total = int(pos.sum())
        if total == 0:
            empty = pd.Series([], dtype=g[item_col].dtype)
            return pd.DataFrame(
                {
                    "item_a": empty,
                    "item_b": empty.copy(),
                    "item_c": empty.copy(),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        rights = np.repeat(np.arange(len(g)), pos)
        before = np.cumsum(pos) - pos
        left_off = np.arange(total) - np.repeat(before, pos)
        lefts = np.repeat(np.repeat(starts, sizes), pos) + left_off
        pairs = pd.DataFrame(
            {
                basket_col: baskets[rights],
                "item_a": items[lefts],
                "item_b": items[rights],
            }
        )
        third = pd.DataFrame({basket_col: baskets, "item_c": items})
        t = pairs.merge(third, on=basket_col, how="inner")
        t = t[t["item_c"] > t["item_b"]]
        if len(t) == 0:
            empty = pd.Series([], dtype=g[item_col].dtype)
            return pd.DataFrame(
                {
                    "item_a": empty,
                    "item_b": empty.copy(),
                    "item_c": empty.copy(),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        out = (
            t.groupby(["item_a", "item_b", "item_c"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype("int64")
        return out

    summed = grouped_sum(
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(triples_partial, batch_format="pandas"),
        ["item_a", "item_b", "item_c"],
        ["n"],
    )
    import pyarrow.compute as pc

    return summed.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_support)),
        batch_format="pyarrow",
    )
