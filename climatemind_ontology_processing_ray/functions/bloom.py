"""Bloom-filter incremental ingest: "which of these documents are NEW
relative to the corpus we already processed?"

At 10^12-document scale the naive answer is an anti join of the new
batch against the full seen-key table — an all-to-all exchange over the
big side.  The bloom path keeps the exchange candidate-sized:

1. **build** — one streaming pass over the SEEN corpus emits a bloom
   bitmap per batch; bitmaps OR-merge (associative, commutative) into a
   single filter of a few MiB — broadcastable regardless of corpus size.
2. **prefilter** — the incoming batch checks membership vectorized; a
   MISS is definitive (no false negatives): those rows are exactly-new
   and never join anything.
3. **verify** — only the maybe-seen tail (true dups + ~fp_rate of the
   new rows) goes through the exact ``bucketed_anti_join`` against the
   seen keys, so the join's left side is duplicates-sized, not
   batch-sized.

The composition is EXACT (the bloom only routes rows), which is what
lets the driver hash-check it against a plain ``NOT IN`` oracle.

Hashing: double hashing h_i = h1 + i*h2 over ``pandas.util.hash_array``
(fixed-key SipHash — deterministic across processes), so filters built
on different workers are compatible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

DEFAULT_BITS = 1 << 20  # 128 KiB; size to ~10 bits/key for ~1% fp


def _hash_pair(values) -> tuple[np.ndarray, np.ndarray]:
    s = pd.Series(values).astype(str)
    h1 = pd.util.hash_array(s.to_numpy(dtype=object), categorize=False)
    h2 = pd.util.hash_array(
        (s + "\x01bloom").to_numpy(dtype=object), categorize=False
    )
    # double hashing degenerates if h2 == 0 mod n_bits; force odd
    return h1, h2 | np.uint64(1)


def _set_bits(bits: np.ndarray, idx: np.ndarray) -> None:
    np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, idx: np.ndarray) -> np.ndarray:
    return (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0


def build_bloom(
    ds: Dataset, col: str, n_bits: int = DEFAULT_BITS, k: int = 7
) -> np.ndarray:
    """One OR-mergeable bloom bitmap over ``ds[col]`` (uint8 array of
    n_bits/8 bytes).  Per-batch partial bitmaps reduce by elementwise OR
    on the driver — filter-sized, not corpus-sized."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bits // 8, np.uint8)
        if len(b):
            h1, h2 = _hash_pair(b[col])
            for i in range(k):
                _set_bits(bits, ((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64))
        return pd.DataFrame({"bloom": [bits.tobytes()]})

    out = np.zeros(n_bits // 8, np.uint8)
    for blm in ds.map_batches(partial, batch_format="pandas").to_pandas()["bloom"]:
        out |= np.frombuffer(blm, np.uint8)
    return out


def bloom_contains(
    bits: np.ndarray, values, n_bits: int = DEFAULT_BITS, k: int = 7
) -> np.ndarray:
    """Vectorized membership: True = MAYBE present, False = definitely
    absent."""
    h1, h2 = _hash_pair(values)
    mask = np.ones(len(h1), bool)
    for i in range(k):
        idx = ((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64)
        mask &= _test_bits(bits, idx)
    return mask


def incremental_new(
    incoming: Dataset,
    seen: Dataset,
    col: str,
    n_bits: int = DEFAULT_BITS,
    k: int = 7,
) -> Dataset:
    """EXACT set of ``incoming`` rows whose ``col`` never appears in
    ``seen``: bloom prefilter routes definite misses straight through;
    only the maybe-seen tail pays the exact anti join.

    ``seen`` is consumed twice (bloom build, then the anti-join right
    side) and ``incoming`` twice (definite/maybe splits) — both are
    pinned with ``materialize()`` first so each lineage executes ONCE:
    the seen side is projected to its key column before pinning
    (key-column-sized, not corpus-sized), which is what preserves the
    bloom prefilter's savings at scale instead of re-running the seen
    scan for the join."""
    import ray

    from .join import bucketed_anti_join

    seen_keys = seen.select_columns([col]).materialize()
    incoming = incoming.materialize()
    bits_ref = ray.put(build_bloom(seen_keys, col, n_bits, k))

    def split(b: pd.DataFrame, maybe: bool) -> pd.DataFrame:
        if not len(b):
            return b
        bits = ray.get(bits_ref)
        m = bloom_contains(bits, b[col], n_bits, k)
        return b[m] if maybe else b[~m]

    definite_new = incoming.map_batches(
        lambda b: split(b, maybe=False), batch_format="pandas"
    )
    maybe_seen = incoming.map_batches(
        lambda b: split(b, maybe=True), batch_format="pandas"
    )
    verified_new = bucketed_anti_join(maybe_seen, seen_keys, col)
    return definite_new.union(verified_new)
