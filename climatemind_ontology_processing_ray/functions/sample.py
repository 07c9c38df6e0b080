"""Deterministic sampling for QA slices (SURVEY §2.6: the reference has
no sampling; the engine adds it for smoke slices and stratified QA).

Sampling is content-addressed (md5 of the id), NOT RNG-based, so:
- the same rows are selected at any parallelism level and on re-runs,
- an oracle can reproduce the exact sample (md5 prefix compare in SQL),
- samples are stable across engine versions.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _md5_prefix(value) -> str:
    return hashlib.md5(str(value).encode()).hexdigest()[:8]


def _frac_cutoff(frac: float) -> str:
    """Lexicographic cutoff for an 8-hex md5 prefix at acceptance ``frac``.

    frac >= 1.0 must keep ALL rows and frac <= 0.0 must drop all.  The naive
    ``format(int(frac * 16**8), '08x')`` breaks at frac=1.0: it yields the
    9-char '100000000', and every 8-hex prefix compares >= it ('2...' >
    '10...'), silently dropping ~94% of rows.  'g' sorts after every hex
    digit, so it is a safe keep-all sentinel."""
    if frac >= 1.0:
        return "g"
    if frac <= 0.0:
        return "00000000"
    return format(int(frac * 16**8), "08x")


def _frac_cutoff_u64(frac: float) -> np.uint64:
    """Numeric twin of :func:`_frac_cutoff`: fixed-width 8-hex prefixes
    order lexicographically exactly like their uint values, so
    ``prefix_hex < cutoff_hex`` == ``md5_hex8_u64(v) < cutoff_int`` (the
    'g' keep-all sentinel maps to 16^8, above every 8-hex value)."""
    if frac >= 1.0:
        return np.uint64(16**8)
    if frac <= 0.0:
        return np.uint64(0)
    return np.uint64(int(frac * 16**8))


def deterministic_sample(ds: Dataset, id_col: str, frac: float) -> Dataset:
    """Keep rows whose md5(id) 8-hex-digit prefix falls below frac of the
    space.  No shuffle; pure vectorized filter."""
    from .md5vec import md5_hex8_u64

    cut = _frac_cutoff_u64(frac)

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keep = md5_hex8_u64(batch.column(id_col)) < cut
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: Dataset, key_col: str, id_col: str, per_key: int
) -> Dataset:
    """First ``per_key`` rows per key, ordered by (md5(id), id) — a
    deterministic per-stratum quota.  One COARSE hash(key) shuffle with a
    vectorized per-partition ``groupby().head`` (never one Ray group per
    stratum — strata can be domain-cardinality)."""
    from .join import hash_bucket

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(__part=hash_bucket(b[key_col].to_numpy(), 64))

    def head_per_key(g: pd.DataFrame) -> pd.DataFrame:
        from .md5vec import md5_hex8_u64

        # uint order == 8-hex-prefix lexicographic order (fixed width)
        g = g.assign(__h=md5_hex8_u64(g[id_col].tolist()))
        g = g.sort_values([key_col, "__h", id_col], kind="mergesort")
        g = g.groupby(key_col, sort=False).head(per_key)
        return g.drop(columns=["__h", "__part"])

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(head_per_key, batch_format="pandas")
    )


def mixture_sample(
    ds: Dataset,
    key_col: str,
    id_col: str,
    rates: dict[str, float],
    default: float = 0.0,
) -> Dataset:
    """Per-key acceptance-rate resampling (domain mixture reweighting, the
    DoReMi/Pile-style curation knob): keep a row iff the md5 prefix of its
    id falls under its key's rate cutoff.  ``rates`` is a SMALL mixture
    table (one weight per domain/source) shipped inside the task closure —
    at fleet scale it would be ``ray.put`` once; either way no shuffle and
    the sample is identical at any parallelism."""
    cuts = {k: _frac_cutoff_u64(r) for k, r in rates.items()}
    dflt = _frac_cutoff_u64(default)

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        from .md5vec import md5_hex8_u64

        h = md5_hex8_u64(batch.column(id_col))
        row_cut = np.array(
            [cuts.get(k, dflt) for k in batch.column(key_col).to_pylist()],
            dtype=np.uint64,
        )
        return batch.filter(pa.array(h < row_cut))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def disjoint_split(
    ds: Dataset,
    group_col: str,
    train_frac: float = 0.8,
    labels: tuple[str, str] = ("train", "val"),
    out_col: str = "split",
) -> Dataset:
    """Leakage-guarded train/val split: EVERY row of a group (e.g. a
    source domain) lands in the same split, decided by the group value's
    md5 prefix — content-addressed like :func:`deterministic_sample`, so
    the assignment is parallelism- and run-independent and needs no
    shuffle (a row-level random split leaks near-duplicate documents from
    one domain across the boundary)."""
    cut = _frac_cutoff_u64(train_frac)

    def fn(batch: pa.Table) -> pa.Table:
        from .md5vec import md5_hex8_u64

        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.string()))
        train = md5_hex8_u64(batch.column(group_col)) < cut
        lab = pa.array(np.where(train, labels[0], labels[1]), pa.string())
        return batch.append_column(out_col, lab)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(
    ds: Dataset, id_col: str, weight_col: str, cap: int
) -> Dataset:
    """Per-ROW acceptance sampling with probability ``min(1, w/cap)`` —
    the length/quality-proportional curation knob (upweight long or
    high-scoring documents without a shuffle).  Content-addressed like
    :func:`deterministic_sample`, and EXACT-integer: keep a row iff its
    weight meets the cap, or the md5 8-hex prefix of its id falls below
    ``floor(w * 16^8) // cap`` — exact integer arithmetic for integer
    weights (the oracle reproduces the sample bit-for-bit), proportional
    (up to one float rounding in ``w * 16**8``) for fractional weights —
    a float quality score 0 < w < 1 keeps probability ~w/cap rather than
    the 0 the old ``int(w)`` truncation gave.  (``mixture_sample`` is the
    per-KEY variant with a small rate table; this one reads the weight off
    each row.)"""

    def fn(batch: pa.Table) -> pa.Table:
        from .md5vec import md5_hex8_u64

        if batch.num_rows == 0:
            return batch
        # md5 is vectorized; the cutoff arithmetic stays per-row Python
        # ints so integer weights keep EXACT arbitrary-precision
        # ``int(w * 16**8) // cap`` semantics (float64 would round the
        # product for w >= 2^21, changing the oracle-reproduced sample).
        # Cutoffs >= 16^8 can only arise from float-w rounding at w≈cap
        # (w < cap bounds integer cutoffs below 16^8); the numeric
        # compare keeps such rows (probability ~1, the intent)
        h = md5_hex8_u64(batch.column(id_col))
        ws = batch.column(weight_col).to_pylist()
        keep = [
            w is not None
            and (w >= cap or (w > 0 and int(hv) < int(w * 16**8) // cap))
            for hv, w in zip(h, ws)
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_shards(ds: Dataset, id_col: str = "doc_id", *, n_shards: int = 16) -> Dataset:
    """Deterministic training-shard assignment + intra-shard shuffle order
    (the write side of a data-loader layout): ``shard`` = first md5 digest
    byte of the id mod ``n_shards``; ``pos`` = 1-based rank of the digest
    (big-endian, tie → id) inside the shard.

    Content-addressing instead of an RNG means the "random" permutation is
    identical at any parallelism level, resumable, and SQL-checkable
    (``ORDER BY MD5(CAST(id AS VARCHAR))``).  Scale shape: one vectorized
    md5 pass (``md5vec.md5_u64`` — no per-row hashlib), ONE groupby(shard)
    exchange, and a per-shard sort bounded by rows/n_shards; at fleet
    scale ``n_shards`` grows with the corpus so per-shard rank frames stay
    bounded, and each shard writes its own output partition (resumable
    output contract, SURVEY §1.3).
    """
    import numpy as np
    import pyarrow.compute as pc

    from .md5vec import md5_u64

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        u = md5_u64(pc.cast(ids, pa.string()))
        # md5_u64 packs digest[:8] little-endian; byteswap recovers the
        # big-endian value whose numeric order == hex-string order
        return pa.table(
            {
                id_col: ids.cast(pa.int64()),
                "shard": pa.array(
                    (u & np.uint64(0xFF)).astype(np.int64) % n_shards, pa.int64()
                ),
                "__h": pa.array(u.byteswap(), pa.uint64()),
            }
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__h", id_col], kind="mergesort").reset_index(drop=True)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "shard": g["shard"].to_numpy(),
                "pos": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(rank, batch_format="pandas")
    )


def negative_sample(
    ds: Dataset,
    anchors: list[tuple[int, str]],
    id_col: str = "doc_id",
    group_col: str = "source",
    *,
    k: int = 4,
) -> pd.DataFrame:
    """Deterministic uniform negative sampling: for each (anchor_id,
    anchor_group), the k candidates with a DIFFERENT group whose pair
    digest md5("anchor|candidate") ranks smallest — a reproducible
    "random k negatives per anchor" draw with no RNG state, the pair
    generator for contrastive / ranking losses.

    Content-addressing makes the draw identical at any parallelism and
    SQL-checkable (``ORDER BY SUBSTR(MD5(...), 1, 16)``).  Scale shape:
    broadcast the (small) anchor list; each batch hashes
    |anchors|×|batch| pairs vectorized (md5vec) and keeps its local
    top-k per anchor; the driver merge is O(anchors·k·blocks).  Output:
    (anchor_id, id_col, rnk), k rows per anchor."""
    import numpy as np
    import pyarrow.compute as pc

    import ray

    from .md5vec import md5_u64

    a_ref = ray.put(list(anchors))

    def local(batch: pa.Table, *, _a=a_ref) -> pd.DataFrame:
        pairs = ray.get(_a)
        ids = batch.column(id_col).cast(pa.int64())
        ids_str = pc.cast(ids, pa.string())
        groups = batch.column(group_col).to_numpy(zero_copy_only=False)
        ids_np = ids.to_numpy(zero_copy_only=False)
        out_a, out_id, out_h = [], [], []
        for aid, agroup in pairs:
            mask = groups != agroup
            if not mask.any():
                continue
            keys = pc.binary_join_element_wise(
                pa.scalar(f"{aid}|"), ids_str, pa.scalar("")
            )
            # md5_u64 packs digest[:8] little-endian; byteswap == hex order
            h = md5_u64(keys).byteswap()[mask]
            cids = ids_np[mask]
            order = np.lexsort((cids, h))[:k]
            out_a.append(np.full(len(order), aid, dtype=np.int64))
            out_id.append(cids[order])
            out_h.append(h[order])
        if not out_a:
            return pd.DataFrame(
                {
                    "anchor_id": np.array([], dtype=np.int64),
                    id_col: np.array([], dtype=np.int64),
                    "__h": np.array([], dtype=np.uint64),
                }
            )
        return pd.DataFrame(
            {
                "anchor_id": np.concatenate(out_a),
                id_col: np.concatenate(out_id),
                "__h": np.concatenate(out_h),
            }
        )

    cand = ds.map_batches(
        local, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cand = cand.sort_values(
        ["anchor_id", "__h", id_col], kind="mergesort"
    ).reset_index(drop=True)
    out = cand.groupby("anchor_id", sort=True).head(k).reset_index(drop=True)
    out["rnk"] = out.groupby("anchor_id").cumcount().astype(np.int64) + 1
    return out[["anchor_id", id_col, "rnk"]]


def token_budget_sample(
    ds: Dataset,
    budget: int,
    *,
    key_col: str = "source",
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> Dataset:
    """Per-source token-budget mixture: greedily keep each source's
    documents — in content-addressed (md5 of id) order, i.e. a uniform
    deterministic shuffle — while the source's running token total stays
    within ``budget``.  This is the "mix N sources to a per-source token
    target" step of training-data curation (a la The Pile / Dolma mixture
    recipes), made exact: the same rows are kept at any parallelism.

    Shuffle structure: ONE hash(key) exchange co-locates each source, then a
    vectorized per-partition lexsort (key, md5-rank, id) + segment cumsum.
    Per-partition memory is bounded by the sources hashed there — the
    exchange is the only data movement, and at web scale the per-source
    order key means no global sort is ever needed.

    Output: (id_col, key_col, weight_col, cum) for kept rows, where ``cum``
    is the running total at acceptance time (<= budget by construction).
    """
    from .join import hash_bucket
    from .md5vec import md5_u64_any

    if num_parts is None:
        from .partitioning import adaptive_parts

        num_parts = adaptive_parts(ds)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__part"] = hash_bucket(b[key_col].to_numpy(), num_parts)
        return b

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        w = g[weight_col].to_numpy(dtype=np.int64)
        keys = g[key_col].to_numpy()
        # byteswapped md5-u64 prefix orders exactly like the hex digest's
        # first 16 chars (md5vec.md5_hex8_u64's widened twin) — the SQL
        # oracle mirrors it with SUBSTRING(MD5(CAST(id AS VARCHAR)),1,16)
        h = md5_u64_any(ids).byteswap()
        codes, _ = pd.factorize(keys, sort=False)
        order = np.lexsort((ids, h, codes))
        sk, sw = codes[order], w[order]
        cum = np.cumsum(sw)
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        seg_base = np.repeat(cum[starts] - sw[starts], np.diff(np.r_[starts, len(sk)]))
        cum = cum - seg_base  # per-source running totals
        keep = cum <= budget
        return pd.DataFrame(
            {
                id_col: ids[order][keep],
                key_col: keys[order][keep],
                weight_col: sw[keep],
                "cum": cum[keep].astype("int64"),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(pick, batch_format="pandas")
    )
