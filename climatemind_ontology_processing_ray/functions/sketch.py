"""Mergeable sketches (the Ray-guide aggregation-at-scale pattern: emit one
serialized sketch per batch, merge the tiny sketches in a second stage).

HyperLogLog here is the standard 2^p-register variant with md5-based
hashing (deterministic across processes) and the usual small-range
linear-counting correction.  A per-batch partial pass emits one register
array per (group, batch); merging is an elementwise max — associative and
commutative, so the result is independent of block layout.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _hll_hash(value) -> int:
    return int.from_bytes(hashlib.md5(str(value).encode()).digest()[:8], "big")


def hll_add(registers: np.ndarray, value, p: int) -> None:
    h = _hll_hash(value)
    idx = h >> (64 - p)
    tail = h & ((1 << (64 - p)) - 1)
    rank = (64 - p) - tail.bit_length() + 1
    if rank > registers[idx]:
        registers[idx] = rank


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized ``int.bit_length`` for uint64 (6 halving passes;
    float log2 rounds wrong near powers of two, so no float shortcut)."""
    x = x.copy()
    out = np.zeros(x.shape, dtype=np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        out[big] += np.uint64(s)
        x[big] >>= np.uint64(s)
    out += (x > 0).astype(np.uint64)
    return out


def _hll_hash_batch(values) -> np.ndarray:
    """Vectorized ``_hll_hash`` over a column: uint64 big-endian md5
    prefix of ``str(value)``, bit-identical to the scalar path (md5 runs
    once per unique value — see ``md5vec.md5_u64_any``)."""
    from .md5vec import md5_u64_any

    return md5_u64_any(values).byteswap()  # md5_u64 is little-endian; _hll_hash is big


def hll_registers_batch(values, p: int, group_codes: np.ndarray | None = None,
                        num_groups: int = 1) -> np.ndarray:
    """Build HLL register arrays for a whole column at once.

    Returns a (num_groups, 2^p) uint8 matrix; ``group_codes`` assigns each
    row to a group (None = all rows in group 0).  Register content is
    bit-identical to looping ``hll_add`` row by row (same md5-prefix hash,
    same rank), but runs as one vectorized md5 pass + one ``maximum.at``
    scatter instead of a per-row Python loop — the difference between a
    sketch that survives 10^9-row blocks and one that doesn't."""
    m = 1 << p
    regs = np.zeros((num_groups, m), dtype=np.uint8)
    n = len(values)
    if n == 0:
        return regs
    h = _hll_hash_batch(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    tail = h & np.uint64((1 << (64 - p)) - 1)
    rank = (np.uint64(64 - p) - _bit_length_u64(tail) + np.uint64(1)).astype(np.uint8)
    if group_codes is not None:
        flat = group_codes.astype(np.int64) * m + idx
    else:
        flat = idx
    np.maximum.at(regs.reshape(-1), flat, rank)
    return regs


def hll_estimate(registers: np.ndarray) -> float:
    m = len(registers)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for the small range
    return float(est)


def approx_distinct(
    ds: Dataset,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> Dataset:
    """Approximate COUNT(DISTINCT value) per group.

    One partial-sketch row per (group, batch) enters the shuffle — the
    exchange size is groups x blocks x 2^p bytes regardless of row count.
    Output: group_cols..., approx_distinct (int64).  Typical error ~1.04/sqrt(2^p)
    (~1.6% at p=12).
    """
    group_cols = group_cols or []
    m = 1 << p

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if group_cols:
            if len(group_cols) == 1:
                codes, uniq = pd.factorize(b[group_cols[0]], sort=False)
                keys = [(u,) for u in uniq]
            else:
                mi = pd.MultiIndex.from_frame(b[group_cols])
                codes, uniq = pd.factorize(mi, sort=False)
                keys = list(uniq)
            regs = hll_registers_batch(b[value_col], p, codes, len(keys))
            df = pd.DataFrame(keys, columns=group_cols)
        else:
            regs = hll_registers_batch(b[value_col], p)
            df = pd.DataFrame({"__all": [0] * (1 if len(b) else 0)})
            if not len(b):
                df["sketch"] = pd.Series([], dtype=object)
                return df
        df["sketch"] = [r.tobytes() for r in regs]
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        for blob in g["sketch"]:
            np.maximum(regs, np.frombuffer(blob, dtype=np.uint8), out=regs)
        row = {c: [g[c].iloc[0]] for c in (group_cols or [])}
        row["approx_distinct"] = [int(round(hll_estimate(regs)))]
        return pd.DataFrame(row)

    keys = group_cols or ["__all"]
    out = ds.map_batches(partial, batch_format="pandas").groupby(keys).map_groups(
        merge, batch_format="pandas"
    )
    if not group_cols:
        out = out.map_batches(
            lambda b: b.drop(columns=[c for c in ("__all",) if c in b.columns]),
            batch_format="pandas",
        )
    return out


# --------------------------------------------------------------------- #
# Misra-Gries heavy hitters (two-pass exact)
# --------------------------------------------------------------------- #


def _mg_sketch(tokens, k: int) -> dict:
    """Classic Misra-Gries with k counters: any item with frequency
    > n/(k+1) in the stream is guaranteed to hold a counter at the end."""
    counters: dict = {}
    for t in tokens:
        if t in counters:
            counters[t] += 1
        elif len(counters) < k:
            counters[t] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def heavy_hitters(
    ds: Dataset,
    k: int,
    text_col: str = "text",
) -> pd.DataFrame:
    """EXACT heavy hitters (tokens with count*(k+1) > total_tokens) via
    the standard two-pass sketch-then-verify pattern:

    1. **Sketch pass** — per-batch Misra-Gries with ``k`` counters; each
       batch emits at most ``k`` candidate tokens.  Pigeonhole: a
       globally-heavy token is locally heavy in >=1 batch, so the union
       of per-batch candidates has NO false negatives.
    2. **Verify pass** — candidates (<= k x #batches, driver-small) are
       broadcast via ``ray.put``; a second streaming pass computes exact
       candidate counts + the total token count as per-batch partials,
       reduced by one small groupby-Sum.

    Token rule matches the SQL oracle: lowercase whitespace split,
    empty tokens dropped.  Only candidate-sized state ever leaves the
    workers; the token stream itself is never shuffled.  The candidate
    count reduction uses ``agg.grouped_sum`` (candidates can reach
    k x #batches keys — too many for ray's per-key aggregate fold).
    """
    import ray

    from .agg import grouped_sum

    def sketch(b: pd.DataFrame) -> pd.DataFrame:
        toks = [
            t
            for txt in b[text_col]
            for t in (txt or "").lower().split(" ")
            if t
        ]
        return pd.DataFrame({"token": list(_mg_sketch(toks, k))})

    # to_pandas, never take_all: per-row iteration costs ~60ms/BLOCK in
    # ray 2.49 (see graph_algo.triangle_count note)
    cands = set(ds.map_batches(sketch, batch_format="pandas").to_pandas()["token"])
    cand_ref = ray.put(cands)

    def count_pass(b: pd.DataFrame) -> pd.DataFrame:
        cs = ray.get(cand_ref)
        counts: dict = {}
        total = 0
        for txt in b[text_col]:
            for t in (txt or "").lower().split(" "):
                if t:
                    total += 1
                    if t in cs:
                        counts[t] = counts.get(t, 0) + 1
        counts["\x00total\x00"] = total
        return pd.DataFrame({"token": list(counts), "n": list(counts.values())})

    agg = grouped_sum(
        ds.map_batches(count_pass, batch_format="pandas"), ["token"], ["n"]
    ).to_pandas()
    total = int(agg.loc[agg["token"] == "\x00total\x00", "n"].iloc[0])
    out = agg[agg["token"] != "\x00total\x00"].copy()
    out["n"] = out["n"].astype("int64")
    out = out[out["n"] * (k + 1) > total]
    return out.sort_values("token").reset_index(drop=True)


# --------------------------------------------------------------------- #
# exact distributed quantiles (value-histogram two-phase)
# --------------------------------------------------------------------- #


def exact_quantiles(
    ds: Dataset, col: str, qs: list[float]
) -> pd.DataFrame:
    """Exact discrete quantiles (DuckDB ``quantile_disc`` semantics:
    the element at sorted index ``ceil(q*n) - 1``) without a global sort:
    per-batch value counts (map-side combine) -> one groupby-Sum keyed on
    value -> driver-side cumulative walk over the DISTINCT-VALUE
    histogram.

    Driver state is bounded by the column's distinct-value cardinality,
    not the row count — appropriate for bounded/discretized measures
    (cents, lengths, scores).  For unbounded continuous columns, compose
    with a fixed-width binning pass first (bin -> histogram -> refine
    inside the one candidate bin).

    The value-keyed reduction uses ``agg.grouped_sum`` (coarse-partition
    + vectorized in-partition merge): the distinct-value count is
    typically in the tens of thousands, where ray's native per-key
    aggregate fold is ~1000x slower (see agg.py)."""
    from .agg import grouped_sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[col].value_counts()
        return pd.DataFrame({col: vc.index, "cnt": vc.values})

    hist = (
        grouped_sum(
            ds.map_batches(partial, batch_format="pandas"), [col], ["cnt"]
        )
        .to_pandas()
        .sort_values(col)
        .reset_index(drop=True)
    )
    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum()
    rows = []
    for q in qs:
        import math

        target = max(1, math.ceil(q * n))  # 1-indexed rank
        idx = int((cum >= target).idxmax())
        rows.append({"q": float(q), "value": hist[col].iloc[idx]})
    return pd.DataFrame(rows)


def exact_quantiles_cont(
    ds: Dataset, col: str, qs: list[tuple[int, int]]
) -> pd.DataFrame:
    """Exact INTERPOLATED quantiles (DuckDB ``quantile_cont`` /
    PERCENTILE_CONT semantics: linear interpolation between the order
    statistics at floor/ceil of rank ``q*(n-1)``), distributed exactly
    like :func:`exact_quantiles` — per-batch value counts, one value-keyed
    grouped sum, a driver walk over the distinct-value histogram.

    Quantiles are passed as RATIONALS ``(q_num, q_den)`` and the result is
    all-integer: ``v_scaled = lo*(den - rem) + hi*rem`` where
    ``pos = (n-1)*q_num``, ``lo/hi`` are the order statistics at
    ``pos // q_den`` and the next rank, and ``rem = pos % q_den`` — i.e.
    the interpolated value TIMES ``q_den``, bit-reproducible by an oracle
    with one final ROUND.  Returns (qn, qd, v_scaled) int64 rows."""
    from .agg import grouped_sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[col].value_counts()
        return pd.DataFrame({col: vc.index, "cnt": vc.values})

    hist = (
        grouped_sum(
            ds.map_batches(partial, batch_format="pandas"), [col], ["cnt"]
        )
        .to_pandas()
        .sort_values(col)
        .reset_index(drop=True)
    )
    n = int(hist["cnt"].sum())
    values = hist[col].to_numpy()
    cum = hist["cnt"].cumsum().to_numpy()  # cum[i] = #rows <= values[i]

    def order_stat(rank0: int):
        # 0-indexed global order statistic from the cumulative histogram
        return values[int(np.searchsorted(cum, rank0 + 1, side="left"))]

    rows = []
    for q_num, q_den in qs:
        pos = (n - 1) * q_num
        lo_idx, rem = divmod(pos, q_den)
        lo = int(order_stat(lo_idx))
        hi = int(order_stat(lo_idx + 1)) if rem else lo
        rows.append(
            {
                "qn": int(q_num),
                "qd": int(q_den),
                "v_scaled": lo * (q_den - rem) + hi * rem,
            }
        )
    out = pd.DataFrame(rows)
    return out.astype({"qn": "int64", "qd": "int64", "v_scaled": "int64"})


# --------------------------------------------------------------------- #
# DDSketch — mergeable one-pass quantiles with a relative-error contract
# --------------------------------------------------------------------- #


def ddsketch_quantiles(
    ds: Dataset, col: str, qs: list[float], rel_err: float = 0.01
) -> pd.DataFrame:
    """One-pass mergeable approximate quantiles with a RELATIVE-error
    guarantee (DDSketch, Masson et al., VLDB 2019): positive values map
    to logarithmic buckets ``i = ceil(log_gamma(x))`` with
    ``gamma = (1+a)/(1-a)``; a bucket's representative
    ``2*gamma^i/(gamma+1)`` is within ``a`` relative error of every
    value in it, so the value returned for ANY rank is within ``a`` of
    the true order statistic at that rank.

    This is the streaming complement to :func:`exact_quantiles` (which
    needs driver state ∝ distinct values): sketch state is
    O(log(max/min)/a) buckets regardless of n; partials are pure
    (bucket, count) rows whose merge is a commutative SUM — fully
    mergeable, order-independent, hence DETERMINISTIC at any
    partitioning (unlike randomized-compaction KLL, whose estimate
    depends on merge order).  One streaming pass, one tiny
    bucket-keyed grouped-sum exchange, a driver walk over the
    histogram.  Values must be > 0 (zeros tracked separately; negatives
    raise — split sign lanes if you need them).

    Returns (q, est) with ``est`` guaranteed within ``rel_err`` of the
    exact ``quantile_disc`` order statistic at rank ``ceil(q*n)`` (the
    same rank definition as :func:`exact_quantiles`)."""
    import math

    from .agg import grouped_sum

    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    lg = math.log(gamma)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[col].to_numpy()
        if (x < 0).any():
            raise ValueError("ddsketch_quantiles requires non-negative values")
        zeros = int((x == 0).sum())
        pos = x[x > 0].astype(np.float64)
        idx = np.ceil(np.log(pos) / lg).astype(np.int64)
        buckets, counts = np.unique(idx, return_counts=True)
        out = {"bucket": buckets, "cnt": counts.astype(np.int64)}
        if zeros:
            # zero lane: bucket int64-min, representative value 0
            out = {
                "bucket": np.r_[np.int64(np.iinfo(np.int64).min), buckets],
                "cnt": np.r_[np.int64(zeros), counts.astype(np.int64)],
            }
        return pd.DataFrame(out)

    hist = (
        grouped_sum(
            ds.map_batches(partial, batch_format="pandas"), ["bucket"], ["cnt"]
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum().to_numpy()
    buckets = hist["bucket"].to_numpy()
    zero_bucket = np.iinfo(np.int64).min
    rows = []
    for q in qs:
        rank = max(1, math.ceil(q * n))
        j = int(np.searchsorted(cum, rank, side="left"))
        b = int(buckets[j])
        est = 0.0 if b == zero_bucket else 2.0 * gamma**b / (gamma + 1.0)
        rows.append({"q": float(q), "est": est})
    return pd.DataFrame(rows)


def ddsketch_quantiles_grouped(
    ds: Dataset,
    col: str,
    group_cols: list[str],
    qs: list[float],
    rel_err: float = 0.01,
) -> pd.DataFrame:
    """Per-group :func:`ddsketch_quantiles` — the grouped STREAMING
    complement to the per-key exact shuffle (`q_user_quantiles`): raw
    rows never move; each batch emits (group, bucket, cnt) partials and
    the only exchange is the tiny grouped SUM over them.  That makes it
    the path for groups whose row counts exceed one worker (the exact
    grouped quantile must co-locate a whole group).  Same DDSketch
    relative-error guarantee per group, same order-independent
    determinism (bucket counts are a commutative sum).  Driver state is
    groups x log(max/min)/rel_err bucket rows."""
    import math

    from .agg import grouped_sum

    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    lg = math.log(gamma)
    zero_bucket = np.iinfo(np.int64).min

    def _buckets(x: np.ndarray) -> np.ndarray:
        if (x < 0).any():
            raise ValueError("ddsketch_quantiles_grouped requires non-negative values")
        bucket = np.full(len(x), zero_bucket, dtype=np.int64)
        pos = x > 0
        bucket[pos] = np.ceil(np.log(x[pos].astype(np.float64)) / lg).astype(np.int64)
        return bucket

    if len(group_cols) == 1:
        # Arrow fast path: dictionary-encode the group column (C++), pack
        # (group code, bucket) into one int64 and count with np.unique —
        # ~3x the pandas-groupby partial at 20M rows.  Buckets are
        # bounded by |ln(float64 range)/ln(gamma)| < 2^31 and the zero
        # lane maps to packed offset 1, so code*2^33 + bucket + 2^31 + 1
        # is collision-free for < 2^30 groups per batch.
        gcol = group_cols[0]

        def partial(b: pa.Table) -> pa.Table:
            x = b.column(col).to_numpy(zero_copy_only=False)
            bucket = _buckets(x)
            enc = b.column(gcol)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            enc = enc.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            packed_b = np.where(
                bucket == zero_bucket, np.int64(-(2**31)), bucket
            ) + np.int64(2**31 + 1)
            key = codes * np.int64(2**33) + packed_b
            uniq, cnt = np.unique(key, return_counts=True)
            u_codes = uniq >> 33
            u_b = (uniq & np.int64(2**33 - 1)) - np.int64(2**31 + 1)
            u_bucket = np.where(u_b == -(2**31), zero_bucket, u_b)
            return pa.table(
                {
                    gcol: enc.dictionary.take(pa.array(u_codes, pa.int64())),
                    "bucket": pa.array(u_bucket, pa.int64()),
                    "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        partial_ds = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
    else:

        def partial_pd(b: pd.DataFrame) -> pd.DataFrame:
            out = b[group_cols].copy()
            out["bucket"] = _buckets(b[col].to_numpy())
            return (
                out.groupby(group_cols + ["bucket"], sort=False)
                .size()
                .rename("cnt")
                .reset_index()
            )

        partial_ds = ds.map_batches(partial_pd, batch_format="pandas")

    hist = (
        grouped_sum(partial_ds, group_cols + ["bucket"], ["cnt"])
        .to_pandas()
        .sort_values(group_cols + ["bucket"])
        .reset_index(drop=True)
    )
    rows = []
    for key, g in hist.groupby(group_cols, sort=True):
        key = key if isinstance(key, tuple) else (key,)
        n = int(g["cnt"].sum())
        cum = g["cnt"].cumsum().to_numpy()
        buckets = g["bucket"].to_numpy()
        for q in qs:
            rank = max(1, math.ceil(q * n))
            j = int(np.searchsorted(cum, rank, side="left"))
            b = int(buckets[j])
            est = 0.0 if b == zero_bucket else 2.0 * gamma**b / (gamma + 1.0)
            rows.append(dict(zip(group_cols, key)) | {"q": float(q), "est": est})
    return pd.DataFrame(rows)


# --------------------------------------------------------------------- #
# Count-min sketch
# --------------------------------------------------------------------- #


def _cms_col(row: int, value, width: int) -> int:
    h = hashlib.md5(f"{row}|{value}".encode()).digest()
    return int.from_bytes(h[:8], "big") % width


def count_min_sketch(
    ds: Dataset, key_col: str, depth: int = 4, width: int = 256
) -> np.ndarray:
    """Mergeable count-min sketch of key frequencies: each batch emits one
    depth x width int64 partial matrix; the merge is elementwise SUM
    (associative/commutative -> block-layout independent).  The exchange
    is blocks x depth x width ints, never O(rows) — same shape as the HLL
    partial-sketch pattern above.

    Deterministic guarantee (any hash choice): ``estimate(k) >= true(k)``.
    The usual ``<= true + eps*N`` bound is probabilistic over hash draws;
    with these fixed md5 rows it is checked empirically by the caller
    (the `approx_counts` query's within-bound contract)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from .md5vec import md5_u64_any

        mat = np.zeros((depth, width), dtype=np.int64)
        vc = b[key_col].value_counts()
        counts = vc.to_numpy(dtype=np.int64)
        for r in range(depth):
            # one vectorized md5 pass per depth row over UNIQUE keys;
            # byteswap recovers the big-endian digest prefix _cms_col uses
            cols = md5_u64_any([f"{r}|{v}" for v in vc.index]).byteswap() % np.uint64(
                width
            )
            np.add.at(mat[r], cols.astype(np.int64), counts)
        return pd.DataFrame({"r": range(depth), "cells": list(mat)})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    mat = np.zeros((depth, width), dtype=np.int64)
    for r, cells in zip(parts["r"], parts["cells"]):
        mat[r] += np.asarray(cells, dtype=np.int64)
    return mat


def cms_estimate(mat: np.ndarray, value, width: int | None = None) -> int:
    w = width or mat.shape[1]
    return int(min(mat[r, _cms_col(r, value, w)] for r in range(mat.shape[0])))


def binned_exact_quantiles(
    ds: Dataset,
    col: str,
    qs: list[float],
    num_bins: int = 4096,
) -> pd.DataFrame:
    """EXACT discrete quantiles (``quantile_disc`` semantics: the element
    at sorted 1-indexed rank ``ceil(q*n)``) for UNBOUNDED continuous
    columns — the two-pass refinement :func:`exact_quantiles`' docstring
    prescribes when the distinct-value cardinality is too large to hold.

    Pass 1: streaming min/max + a ``num_bins``-key bin histogram
    (map-side combined; driver state = num_bins counts).  The driver
    locates each target rank's candidate bin.  Pass 2: value counts for
    rows in the candidate bins ONLY (driver state = distinct values in
    those bins, ~n/num_bins-bounded), then an exact rank walk.

    Bin edges use float arithmetic, which is safe: binning only SELECTS
    a candidate subset (consistently — the same floor expression assigns
    pass-1 counts and pass-2 membership); the returned value is an exact
    element chosen by integer rank within it."""
    import math

    mmx = ds.map_batches(
        lambda b: pd.DataFrame(
            {"mn": [b[col].min()], "mx": [b[col].max()], "n": [len(b)]}
        ),
        batch_format="pandas",
    ).to_pandas()
    lo, hi, n = float(mmx["mn"].min()), float(mmx["mx"].max()), int(mmx["n"].sum())
    if n == 0:
        return pd.DataFrame({"q": [], "value": []})
    width = (hi - lo) / num_bins or 1.0

    def bin_of(x: np.ndarray) -> np.ndarray:
        return np.clip(((x - lo) / width).astype(np.int64), 0, num_bins - 1)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = pd.Series(bin_of(b[col].to_numpy())).value_counts()
        return pd.DataFrame(
            {"bin": vc.index.astype("int64"), "cnt": vc.to_numpy().astype("int64")}
        )

    from .agg import grouped_sum

    hist = (
        grouped_sum(ds.map_batches(partial, batch_format="pandas"), ["bin"], ["cnt"])
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    cum = hist["cnt"].cumsum()
    targets = {q: max(1, math.ceil(q * n)) for q in qs}
    cand: dict[float, tuple[int, int]] = {}
    for q, r in targets.items():
        i = int((cum >= r).idxmax())
        below = int(cum.iloc[i] - hist["cnt"].iloc[i])
        cand[q] = (int(hist["bin"].iloc[i]), r - below)  # bin, rank within bin
    bins_needed = sorted({b for b, _ in cand.values()})

    def in_bins(b: pd.DataFrame) -> pd.DataFrame:
        x = b[col].to_numpy()
        bb = bin_of(x)
        mask = np.isin(bb, bins_needed)
        vc = (
            pd.DataFrame({"bin": bb[mask], col: x[mask]})
            .groupby(["bin", col], sort=False)
            .size()
        )
        out = vc.reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype("int64")
        return out

    fine = (
        grouped_sum(
            ds.map_batches(in_bins, batch_format="pandas"), ["bin", col], ["cnt"]
        )
        .to_pandas()
        .sort_values(["bin", col])
        .reset_index(drop=True)
    )
    rows = []
    for q in qs:
        bb, within = cand[q]
        sub = fine[fine["bin"] == bb]
        c = sub["cnt"].cumsum()
        j = int((c >= within).idxmax())
        rows.append({"q": float(q), "value": fine[col].loc[j]})
    return pd.DataFrame(rows)
