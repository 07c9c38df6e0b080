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
import zlib
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


_NUM_PARTS = 64  # hash-partition fan-out for groupby stages.  map_groups
# costs ~0.25ms of scheduling per GROUP, so grouping by a coarse partition
# of the key and doing the per-key work vectorized inside each partition
# (pandas drop_duplicates / duplicated masks) beats one Ray group per key
# by orders of magnitude when keys are numerous and mostly unique.


def exact_dedup(ds: Dataset, id_col: str, text_col: str = "text") -> Dataset:
    """Keep one row (min id) per exact text content (G1 semantics —
    ``drop_duplicates`` at make_network.py:44 — keyed by content hash).
    One hash-partition shuffle; per-partition winners via vectorized
    drop_duplicates."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5((t or "").encode()).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        batch = batch.append_column("__fp", pa.array(hashes, pa.string()))
        parts = [int(h[:8], 16) % _NUM_PARTS for h in hashes]
        return batch.append_column("__part", pa.array(parts, pa.int32()))

    def first_per_fp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        return g.drop_duplicates("__fp", keep="first").drop(columns=["__fp", "__part"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(first_per_fp, batch_format="pandas")
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
        out_id, out_bhash, out_part = [], [], []
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
                # band id folded into the hash so buckets never cross bands
                bh = _hash64(f"{band}:{chunk.tobytes().hex()}")
                out_id.append(i)
                out_bhash.append(bh)
                out_part.append(bh % _NUM_PARTS)
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band_hash": pa.array(out_bhash, pa.uint64()),
                "__part": pa.array(out_part, pa.int32()),
            }
        )

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # singleton buckets (the vast majority) drop in one vectorized mask;
        # only true collision buckets loop
        g = g[g.duplicated("band_hash", keep=False)]
        out: set[tuple] = set()
        for _, sub in g.groupby("band_hash", sort=False):
            ids = sorted(set(sub[id_col]))
            out.update(combinations(ids, 2))
        if not out:
            return pd.DataFrame({"id_a": [], "id_b": []})
        arr = sorted(out)
        return pd.DataFrame({"id_a": [p[0] for p in arr], "id_b": [p[1] for p in arr]})

    def pair_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__part"] = [
            zlib.crc32(f"{x}|{y}".encode()) % _NUM_PARTS
            for x, y in zip(batch["id_a"], batch["id_b"])
        ]
        return batch

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"]).drop(columns="__part")

    bands_ds = ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)
    candidates = (
        bands_ds.groupby("__part")
        .map_groups(partition_pairs, batch_format="pandas")
        .map_batches(pair_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(pair_dedup, batch_format="pandas")
    )

    # verification against true n-gram Jaccard.  Shingle-hash sets are
    # computed DISTRIBUTED (map_batches) and only the compact hash arrays
    # are collected into a broadcast {id: uint64-set} — fine for
    # correctness/bench scales; at 10^12 docs replace the broadcast with a
    # hash-partition join of candidates against (id, shingles) on id.
    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        hashes = [
            np.fromiter(
                (_hash64(s) for s in _word_ngrams(t or "", ngram)),
                dtype=np.uint64,
            )
            for t in texts
        ]
        return pa.table(
            {
                id_col: pa.array(ids),
                "shingles": pa.array([h.tolist() for h in hashes], pa.list_(pa.uint64())),
            }
        )

    shingle_map: dict = {}
    for row in ds.map_batches(
        shingle_rows, batch_format="pyarrow", zero_copy_batch=True
    ).take_all():
        shingle_map[row[id_col]] = set(row["shingles"])
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
    """64-bit SimHash over word hashes (deterministic, vectorized: one
    unpackbits over the whole word-hash array instead of per word)."""
    words = (text or "").lower().split()
    if not words:
        return 0
    hs = np.fromiter((_hash64(w) for w in words), dtype=np.uint64, count=len(words))
    bits = np.unpackbits(
        hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int32)
    acc = bits.sum(axis=0) * 2 - len(words)
    return int(np.packbits(acc > 0, bitorder="little").view(np.uint64)[0])


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
        out_id, out_sig, out_bucket, out_part = [], [], [], []
        for i, t in zip(ids, texts):
            s = simhash64(t or "")
            for c in range(4):
                bucket = _hash64(f"{c}:{(s >> (16 * c)) & 0xFFFF}")
                out_id.append(i)
                out_sig.append(s)
                out_bucket.append(bucket)
                out_part.append(bucket % _NUM_PARTS)
        return pa.table(
            {
                id_col: pa.array(out_id),
                "sig": pa.array(out_sig, pa.uint64()),
                "bucket": pa.array(out_bucket, pa.uint64()),
                "__part": pa.array(out_part, pa.int32()),
            }
        )

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated("bucket", keep=False)]
        out: dict[tuple, int] = {}
        for _, sub in g.groupby("bucket", sort=False):
            recs = sorted(set(zip(sub[id_col], sub["sig"])))
            for (ia, sa), (ib, sb) in combinations(recs, 2):
                ham = bin(int(sa) ^ int(sb)).count("1")
                if ham <= max_hamming:
                    out[(ia, ib)] = ham
        if not out:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        keys = sorted(out)
        return pd.DataFrame(
            {
                "id_a": [k[0] for k in keys],
                "id_b": [k[1] for k in keys],
                "hamming": [out[k] for k in keys],
            }
        )

    def pair_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__part"] = [
            zlib.crc32(f"{x}|{y}".encode()) % _NUM_PARTS
            for x, y in zip(batch["id_a"], batch["id_b"])
        ]
        return batch

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"]).drop(columns="__part")

    return (
        ds.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(partition_pairs, batch_format="pandas")
        .map_batches(pair_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(pair_dedup, batch_format="pandas")
    )


# --------------------------------------------------------------------- #
# duplicate clusters: connected components over candidate pairs
# --------------------------------------------------------------------- #


def dup_clusters(
    pairs: Dataset,
    ids: Dataset | None = None,
    id_col: str = "doc_id",
    max_rounds: int = 10,
    driver_threshold: int = 250_000,
) -> Dataset:
    """Resolve duplicate PAIRS (id_a, id_b) into CLUSTERS via distributed
    min-label propagation (the groupby-iteration pattern from the Ray
    guide; union-find on the driver only works when the pair set is
    provably small).

    Each round: every node proposes min(own label, neighbors' labels);
    a hash-partition groupby takes the min.  Converges in O(component
    diameter) rounds — near-dup components are shallow, so ``max_rounds``
    of 10 covers paths of length 2^10 via pointer-halving-free simple
    propagation.  Rounds stop early when no label changes.

    Returns (id, cluster) where cluster = min id of the component.
    ``ids`` optionally supplies singleton nodes (rows with no pair).
    """

    def seed_labels(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat(
            [
                pd.DataFrame({"id": b["id_a"], "label": b["id_a"]}),
                pd.DataFrame({"id": b["id_b"], "label": b["id_b"]}),
            ]
        )
        return out

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        # undirected: each edge lets labels flow both ways
        return pd.concat(
            [
                pd.DataFrame({"src": b["id_a"], "dst": b["id_b"]}),
                pd.DataFrame({"src": b["id_b"], "dst": b["id_a"]}),
            ]
        )

    def min_per_id(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("id", sort=False, as_index=False)["label"].min()

    # pin the candidate pairs: the iteration below would otherwise re-run
    # the whole upstream (lazy) pair-generation pipeline EVERY round.  The
    # pair set is output-sized (duplicate pairs only), safe to materialize.
    pairs = pairs.materialize()

    # small candidate sets (the common case: dup pairs are output-sized)
    # resolve driver-side with union-find — each distributed propagation
    # round costs seconds of fixed shuffle overhead that dwarfs the work.
    # The distributed path below remains for genuinely large pair sets.
    if pairs.count() <= driver_threshold:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        members: set = set()
        for r in pairs.select_columns(["id_a", "id_b"]).take_all():
            members.add(r["id_a"])
            members.add(r["id_b"])
            ra, rb = find(r["id_a"]), find(r["id_b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        if ids is not None:
            for r in ids.select_columns([id_col]).take_all():
                members.add(r[id_col])
        rows = pd.DataFrame(
            {"id": sorted(members)}
        )
        rows["cluster"] = [find(i) for i in rows["id"]]
        import ray.data as _rd

        return _rd.from_pandas(rows)
    labels = pairs.map_batches(seed_labels, batch_format="pandas")
    if ids is not None:
        labels = labels.union(
            ids.map_batches(
                lambda b: pd.DataFrame({"id": b[id_col], "label": b[id_col]}),
                batch_format="pandas",
            )
        )
    labels = labels.groupby("id").map_groups(min_per_id, batch_format="pandas").materialize()
    edges = pairs.map_batches(edge_rows, batch_format="pandas").materialize()

    import ray as _ray

    for _ in range(max_rounds):
        # broadcast the current (small: one row per involved doc) label map;
        # at 10^12 scale replace with a bucketed hash join on src
        label_map = {r["id"]: r["label"] for r in labels.take_all()}
        ref = _ray.put(label_map)

        def propose(b: pd.DataFrame) -> pd.DataFrame:
            m = _ray.get(ref)
            return pd.DataFrame(
                {"id": b["dst"], "label": [m[s] for s in b["src"]]}
            )

        proposals = edges.map_batches(propose, batch_format="pandas")
        new_labels = (
            labels.union(proposals)
            .groupby("id")
            .map_groups(min_per_id, batch_format="pandas")
        ).materialize()
        new_map = {r["id"]: r["label"] for r in new_labels.take_all()}
        labels = new_labels
        if new_map == label_map:
            break

    return labels.map_batches(
        lambda b: b.rename(columns={"label": "cluster"}), batch_format="pandas"
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
