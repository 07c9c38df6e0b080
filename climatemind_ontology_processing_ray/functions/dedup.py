"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shuffle structure (the part that matters at 100 TB):

- exact:   content-hash in ``map_batches`` (vectorized) -> ONE hash-partition
           groupby; per-group winner is ``min(id)``.
- minhash: signatures per batch (numpy, no shuffle) -> explode to
           (band, band_hash) rows -> groupby buckets (the only exchange;
           bucket sizes are bounded because identical texts collapse to the
           same bucket) -> candidate pairs -> Jaccard verify.
- simhash: 64-bit signature per batch -> 4x 16-bit chunk buckets
           (pigeonhole: hamming<=3 implies >=1 equal chunk) -> verify popcount.
- ngram-jaccard: pairwise only *within* caller-chosen blocking keys.
- embedding: vectors normalized per batch; all-pairs cosine done as
           per-batch (batch x broadcast-matrix) matmuls — the broadcast is
           ``ray.put`` once, not per batch.  (At 10^12 scale swap the
           broadcast for IVF bucketing, see ann.py.)

All hashing is seeded/deterministic (md5 / crc, never ``hash()``).
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

_MERSENNE = (1 << 61) - 1


def _word_ngrams(text: str, n: int) -> set[str]:
    words = text.lower().split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# --------------------------------------------------------------------- #
# exact dedup
# --------------------------------------------------------------------- #


def exact_dedup(ds: Dataset, id_col: str, text_col: str = "text") -> Dataset:
    """Keep one row (min id) per exact text content (G1 semantics —
    ``drop_duplicates`` at make_network.py:44 — keyed by content hash)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5((t or "").encode()).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return batch.append_column("__fp", pa.array(hashes, pa.string()))

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, id_col).drop(columns="__fp")

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__fp")
        .map_groups(first, batch_format="pandas")
    )


# --------------------------------------------------------------------- #
# MinHash + LSH
# --------------------------------------------------------------------- #


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(
    shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(num_perm,) uint64 signature = min over shingles of (a*h+b) mod p."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), np.uint64(_MERSENNE), dtype=np.uint64)
    # (perm, shingle) — modest sizes; object dtype avoided via Python ints
    h = shingle_hashes.astype(np.uint64)
    prod = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def minhash_lsh_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str = "text",
    *,
    ngram: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 1729,
) -> Dataset:
    """Near-duplicate pairs: shingle -> minhash -> banded LSH buckets ->
    candidate pairs -> exact-Jaccard verification.

    Output: id_a, id_b (id_a < id_b), jaccard (float64) for verified pairs.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm, seed)

    def to_bands(batch: pa.Table) -> pa.Table:
        out_id, out_band, out_bhash = [], [], []
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        for i, t in zip(ids, texts):
            sh = np.array(
                sorted(_hash64(s) for s in _word_ngrams(t or "", ngram)),
                dtype=np.uint64,
            )
            sig = minhash_signature(sh, a, b)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                out_id.append(i)
                out_band.append(band)
                out_bhash.append(_hash64(chunk.tobytes().hex()))
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_bhash, pa.uint64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g[id_col]))
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        pairs = list(combinations(ids, 2))
        return pd.DataFrame(
            {"id_a": [p[0] for p in pairs], "id_b": [p[1] for p in pairs]}
        )

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    bands_ds = ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)
    candidates = (
        bands_ds.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .map_groups(pair_dedup, batch_format="pandas")
    )

    # verification against true n-gram Jaccard.  The shingle sets are looked
    # up from a broadcast {id: ngram-set} built with one pass — fine for
    # correctness/bench scales; at 10^12 docs replace with a hash-partition
    # join of candidates against (id, shingles) on id.
    shingle_map: dict = {}
    for batch in ds.select_columns([id_col, text_col]).iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            shingle_map[i] = _word_ngrams(t or "", ngram)
    map_ref = ray.put(shingle_map)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(map_ref)
        if len(batch) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        j = [
            jaccard(m.get(x, set()), m.get(y, set()))
            for x, y in zip(batch["id_a"], batch["id_b"])
        ]
        batch = batch.copy()
        batch["jaccard"] = j
        return batch[batch["jaccard"] >= threshold]

    return candidates.map_batches(verify, batch_format="pandas")


# --------------------------------------------------------------------- #
# n-gram Jaccard within blocking keys
# --------------------------------------------------------------------- #


def ngram_jaccard_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str = "text",
    *,
    block_cols: list[str],
    ngram: int = 3,
    threshold: float = 0.5,
) -> Dataset:
    """Exact pairwise word-n-gram Jaccard within each blocking group.
    Output: id_a, id_b, jaccard.  The blocking keys bound the O(k^2)
    per-group work; group sizes must be capped by the caller's key choice."""

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(zip(g[id_col], g[text_col]))
        out_a, out_b, out_j = [], [], []
        grams = [(i, _word_ngrams(t or "", ngram)) for i, t in recs]
        for (ia, ga), (ib, gb) in combinations(grams, 2):
            j = jaccard(ga, gb)
            if j >= threshold:
                out_a.append(ia)
                out_b.append(ib)
                out_j.append(j)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": out_j})

    return ds.select_columns([id_col, text_col] + block_cols).groupby(
        block_cols
    ).map_groups(per_block, batch_format="pandas")


# --------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------- #


def simhash64(text: str) -> int:
    """64-bit SimHash over word hashes (deterministic)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in (text or "").lower().split():
        h = _hash64(w)
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8), bitorder="little"
        ).astype(np.int64)
        acc += 2 * bits - 1
    return int(
        np.packbits((acc > 0).astype(np.uint8), bitorder="little")
        .view(np.uint64)[0]
    )


def simhash_buckets(
    ds: Dataset,
    id_col: str,
    text_col: str = "text",
    *,
    max_hamming: int = 3,
) -> Dataset:
    """Near-dup pairs by SimHash: 4x 16-bit chunk buckets (hamming<=3
    guarantees a shared chunk), verified by popcount.
    Output: id_a, id_b, hamming."""

    def sigs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_sig, out_chunk_id, out_chunk = [], [], [], []
        for i, t in zip(ids, texts):
            s = simhash64(t or "")
            for c in range(4):
                out_id.append(i)
                out_sig.append(s)
                out_chunk_id.append(c)
                out_chunk.append((s >> (16 * c)) & 0xFFFF)
        return pa.table(
            {
                id_col: pa.array(out_id),
                "sig": pa.array(out_sig, pa.uint64()),
                "chunk_id": pa.array(out_chunk_id, pa.int8()),
                "chunk": pa.array(out_chunk, pa.int32()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(set(zip(g[id_col], g["sig"])))
        out_a, out_b, out_h = [], [], []
        for (ia, sa), (ib, sb) in combinations(recs, 2):
            h = int(sa) ^ int(sb)
            ham = bin(h).count("1")
            if ham <= max_hamming:
                out_a.append(ia)
                out_b.append(ib)
                out_h.append(ham)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return (
        ds.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["chunk_id", "chunk"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .map_groups(pair_dedup, batch_format="pandas")
    )


# --------------------------------------------------------------------- #
# embedding cosine near-dup
# --------------------------------------------------------------------- #


def embedding_neardup_pairs(
    ds: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
) -> Dataset:
    """All pairs (id_a < id_b) with cosine similarity >= threshold.

    The full (id, normalized-vector) matrix is broadcast once with
    ``ray.put``; each batch computes its (batch x all) similarity block
    with one numpy matmul and keeps only upper-triangle hits.  Compute is
    distributed over batches; the broadcast is the scale limit (fine to
    ~10^6 x 10^2 dims; beyond that, IVF-bucket first: see ann.lsh_topk).
    Output: id_a, id_b, cosine.
    """
    ids_list: list = []
    vecs_list: list = []
    for batch in ds.select_columns([id_col, vec_col]).iter_batches(
        batch_size=8192, batch_format="pandas"
    ):
        ids_list.extend(batch[id_col].tolist())
        vecs_list.extend(batch[vec_col].tolist())
    order = np.argsort(np.array(ids_list))
    all_ids = np.array(ids_list)[order]
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs_list])[order]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)
    ref = ray.put((all_ids, mat))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        ids_all, m = ray.get(ref)
        bvecs = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
        )
        bvecs = bvecs / np.maximum(np.linalg.norm(bvecs, axis=1, keepdims=True), 1e-12)
        sims = bvecs @ m.T  # (batch, N)
        bids = batch[id_col].to_numpy()
        out_a, out_b, out_c = [], [], []
        for r in range(sims.shape[0]):
            hits = np.where(sims[r] >= threshold)[0]
            for c in hits:
                if bids[r] < ids_all[c]:  # upper triangle only, no self
                    out_a.append(bids[r])
                    out_b.append(ids_all[c])
                    out_c.append(sims[r, c])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    return ds.map_batches(block, batch_format="pandas", batch_size=2048)
