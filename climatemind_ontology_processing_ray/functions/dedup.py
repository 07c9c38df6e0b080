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

All hashing is seeded/deterministic (md5 / fixed-key array hashes, never ``hash()``).
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .partitioning import adaptive_parts

_MERSENNE = (1 << 61) - 1


def _bucket_of(values, num_parts: int) -> np.ndarray:
    """Vectorized partition ids for a key column (pd.util.hash_array:
    fixed-key, Cython for numeric and object dtypes — replaces the
    former per-row ``zlib.crc32(str(v))`` loops)."""
    from .join import hash_bucket

    return hash_bucket(values, num_parts).astype(np.int64)


def _pair_bucket(a_vals, b_vals, num_parts: int) -> np.ndarray:
    """Vectorized partition ids for (id_a, id_b) pairs: hash each side
    with the fixed-key array hash, fold with the mix step.  Any
    deterministic function of the pair co-locates duplicates, which is
    the only requirement of the pair-dedup exchanges."""
    from .shingle import mix_finish, mix_step

    ha = pd.util.hash_array(np.asarray(a_vals), categorize=False)
    hb = pd.util.hash_array(np.asarray(b_vals), categorize=False)
    h = mix_finish(mix_step(ha, hb))
    return (h % np.uint64(num_parts)).astype(np.int64)


def _mod_mersenne61(y: np.ndarray) -> np.ndarray:
    """Exact ``y % (2^61-1)`` for uint64 arrays WITHOUT hardware division.

    x86 64-bit DIV latency is data-dependent (measured 14x spread between
    dividend bit patterns on this host — a full-range batch paid 0.65s
    where another paid 0.05s for identical shapes), which made signature
    time depend on hash values.  For a Mersenne modulus the reduction is
    shift/add: y = (y >> 61) + (y & M) < 2^61 + 7, then one conditional
    subtract — branch-free, value-independent, bit-identical to ``% M``
    (for y = 2^64-1 the fold gives at most M+7, one subtract suffices;
    equality y == M also folds to M and subtracts to 0, matching %)."""
    m = np.uint64(_MERSENNE)
    y = (y >> np.uint64(61)) + (y & m)
    return y - (y >= m).astype(np.uint64) * m


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
    ``drop_duplicates`` at make_network.py:44 — keyed by content).
    One hash-partition shuffle; per-partition winners via vectorized
    drop_duplicates.

    The partition key is ``pandas.util.hash_array`` over the text column
    (fixed-key SipHash, deterministic across processes, iterates in C) —
    no per-row python md5; content EQUALITY inside each partition is
    decided on the text itself (null normalized to ""), so a partition-key
    collision can never merge distinct contents."""
    parts = adaptive_parts(ds)

    def add_part(batch: pa.Table) -> pa.Table:
        texts = (
            pd.Series(batch.column(text_col).to_numpy(zero_copy_only=False))
            .fillna("")
            .to_numpy(dtype=object)
        )
        h = pd.util.hash_array(texts, categorize=False)
        pids = (h % np.uint64(parts)).astype(np.int32)
        return batch.append_column("__part", pa.array(pids, pa.int32()))

    def first_per_text(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(__k=g[text_col].fillna(""))
        g = g.sort_values(id_col, kind="mergesort")
        return g.drop_duplicates("__k", keep="first").drop(columns=["__k", "__part"])

    return (
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(first_per_text, batch_format="pandas")
    )


def line_dedup(
    ds: Dataset, id_col: str, text_col: str = "text", sep: str = "\n"
) -> Dataset:
    """Cross-document LINE-level exact dedup (the RefinedWeb / Dolma
    "repeated paragraph removal" pass): split every document on ``sep``,
    keep each distinct line only at its FIRST occurrence corpus-wide
    (min ``(doc_id, position)``), drop every later copy, and reassemble
    the surviving lines per document in original order.

    Output: ``(id_col, text_col)`` — one row per input document (a doc
    whose every line lost survives with text ``""``).

    Shuffle structure (two hash exchanges, both line-bounded):

    1. explode to (doc, pos, line) and exchange on ``hash(line)`` — all
       copies of a line co-locate, so the per-partition winner
       (vectorized ``drop_duplicates`` after a (doc, pos) sort) is the
       global winner; equality is decided on the line text itself, so a
       partition-key collision can never merge distinct lines;
    2. exchange winners on ``hash(doc)`` and reassemble with a
       vectorized per-partition sort + ``groupby().agg(join)``.

    Both exchanges carry each line exactly once; nothing is
    corpus-bounded on any single node."""
    from .join import hash_bucket

    parts = adaptive_parts(ds)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        lines = b[text_col].fillna("").str.split(sep)
        n = lines.str.len().to_numpy()
        ids = np.repeat(b[id_col].to_numpy(), n)
        pos = np.arange(int(n.sum())) - np.repeat(np.cumsum(n) - n, n)
        flat = lines.explode()
        flat = flat[flat.notna()].to_numpy(dtype=object)
        out = pd.DataFrame({id_col: ids, "pos": pos.astype("int64"), "line": flat})
        out["__part"] = hash_bucket(out["line"].to_numpy(), parts)
        return out

    def first_per_line(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "pos"], kind="mergesort")
        g = g.drop_duplicates("line", keep="first").drop(columns="__part")
        g["__dpart"] = hash_bucket(g[id_col].to_numpy(), parts)
        return g

    def tag_ids(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col]].copy()
        b["__dpart"] = hash_bucket(b[id_col].to_numpy(), parts)
        b["pos"] = np.int64(0)
        b["line"] = ""
        b["__is_doc"] = True
        return b

    # a doc whose every line lost must still emit a row: ship the (tiny)
    # id spine through the same doc exchange and emit "" for ids with no
    # surviving line — keeps the operator fully distributed (no
    # driver-side membership set)
    def reassemble_with_spine(g: pd.DataFrame) -> pd.DataFrame:
        spine = g[g["__is_doc"].to_numpy()]
        lines = g[~g["__is_doc"].to_numpy()]
        lines = lines.sort_values([id_col, "pos"], kind="mergesort")
        agg = (
            lines.groupby(id_col, sort=False)["line"]
            .agg(sep.join)
            .reset_index()
            .rename(columns={"line": text_col})
        )
        missing = spine[~spine[id_col].isin(agg[id_col])][[id_col]]
        if len(missing):
            agg = pd.concat(
                [agg, missing.assign(**{text_col: ""})], ignore_index=True
            )
        return agg

    def tag_lines(g: pd.DataFrame) -> pd.DataFrame:
        g = first_per_line(g)
        g["__is_doc"] = False
        return g

    exploded = (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("__part")
        .map_groups(tag_lines, batch_format="pandas")
    )
    spine = ds.map_batches(tag_ids, batch_format="pandas")
    return (
        exploded.union(spine)
        .groupby("__dpart")
        .map_groups(reassemble_with_spine, batch_format="pandas")
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
    prod = _mod_mersenne61(a[:, None] * h[None, :] + b[:, None])
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
    verify_broadcast_threshold: int = 2_000_000,
    hash_impl: str = "wordmix",
) -> Dataset:
    """Near-duplicate pairs: shingle -> minhash -> banded LSH buckets ->
    candidate pairs -> exact-Jaccard verification.

    Output: id_a, id_b (id_a < id_b), jaccard (float64) for verified pairs.

    ``hash_impl``: "wordmix" (default) hashes shingles by folding per-word
    md5 hashes with a 64-bit mix — fully vectorized, no shingle strings,
    unique words md5'd once per batch (functions/shingle.py).  "md5"
    reproduces the round-3 per-shingle ``md5(joined_string)`` hashing
    bit-for-bit.  Both emit exact-Jaccard-verified pairs; the LSH banding
    is probabilistic below J=1.0, so which NEAR-threshold true pairs get
    candidate coverage can differ between impls (NOTES.md "minhash
    hash-swap"; the shipped fixtures are verified green under both)."""
    assert num_perm % bands == 0
    assert hash_impl in ("wordmix", "md5")
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm, seed)
    parts = adaptive_parts(ds)

    def shingle_rows_md5(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        hashes = [
            np.unique(
                np.fromiter(
                    (_hash64(s) for s in _word_ngrams(t or "", ngram)),
                    dtype=np.uint64,
                )
            )
            for t in texts
        ]
        return pa.table(
            {
                id_col: pa.array(ids),
                "shingles": pa.array([h.tolist() for h in hashes], pa.list_(pa.uint64())),
            }
        )

    def shingle_rows_fast(batch: pa.Table) -> pa.Table:
        from .shingle import doc_shingle_hashes

        hu, off = doc_shingle_hashes(batch.column(text_col), ngram)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "shingles": pa.ListArray.from_arrays(
                    pa.array(off, pa.int32()), pa.array(hu, pa.uint64())
                ),
            }
        )

    shingle_rows = shingle_rows_fast if hash_impl == "wordmix" else shingle_rows_md5

    def _sigs_from_segments(
        big: np.ndarray, soff: np.ndarray, ndoc: int
    ) -> np.ndarray:
        """(ndoc, num_perm) signatures from flat per-doc shingle-hash
        segments — (a*h+b) mod M, per-doc min via minimum.reduceat.
        Duplicate hashes within a segment cannot change a min, so the
        fast path feeds RAW (non-deduped) shingle occurrences.

        One perm at a time through two preallocated row buffers with
        in-place ufuncs: the former (perm_chunk, n) broadcast multiply
        used an outer-product stride numpy's uint64 loop runs ~18x
        slower on than the contiguous path, and its ~170 MB temporaries
        paid page faults every chunk — this kernel was 83% of the bands
        map at 1M docs (signatures 15.4s -> 0.9s per 50k-doc batch,
        measured single-threaded; bit-identical output)."""
        lens = soff[1:] - soff[:-1]
        sigs = np.full((ndoc, num_perm), np.uint64(_MERSENNE), dtype=np.uint64)
        nonempty = lens > 0
        if nonempty.any():
            offs = soff[:-1][nonempty]
            ne_idx = np.flatnonzero(nonempty)
            m = np.uint64(_MERSENNE)
            n = len(big)
            tmp = np.empty(n, np.uint64)
            hi = np.empty(n, np.uint64)
            for p in range(num_perm):
                np.multiply(big, a[p], out=tmp)
                tmp += b[p]
                # branch-free Mersenne-61 reduction, in place (see
                # _mod_mersenne61 for the derivation)
                np.right_shift(tmp, np.uint64(61), out=hi)
                np.bitwise_and(tmp, m, out=tmp)
                tmp += hi
                np.subtract(tmp, m, out=tmp, where=tmp >= m)
                sigs[ne_idx, p] = np.minimum.reduceat(tmp, offs)
        return sigs

    def to_bands_fast(batch: pa.Table) -> pa.Table:
        from .shingle import mix_finish, mix_step, shingle_hashes, split_words
        from .shingle import word_hashes as _wh
        from .shingle import _FOLD_SEED

        flat, woff = split_words(batch.column(text_col))
        sh, soff = shingle_hashes(_wh(flat), woff, ngram)
        ndoc = batch.num_rows
        sigs = _sigs_from_segments(sh, soff, ndoc)
        # band key = mix fold over the band's signature chunk, seeded by
        # the band index so buckets never cross bands.  Two docs share a
        # bucket iff their chunk is equal (any deterministic injective-
        # modulo-2^-64 key works: candidates depend on chunk EQUALITY,
        # not on the key function).
        chunks = sigs.reshape(ndoc, bands, rows_per_band)
        h = mix_step(
            np.full((ndoc, bands), _FOLD_SEED, np.uint64),
            np.arange(bands, dtype=np.uint64)[None, :],
        )
        for j in range(rows_per_band):
            h = mix_step(h, chunks[:, :, j])
        bh = mix_finish(h).ravel()
        ids_rep = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids_rep, bands)),
                "band_hash": pa.array(bh, pa.uint64()),
                "__part": pa.array(
                    (bh % np.uint64(parts)).astype(np.int32), pa.int32()
                ),
            }
        )

    def to_bands_md5(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        # signatures for the WHOLE batch in one segmented computation:
        # (a*h+b) mod M over the concatenated shingle array, per-doc min
        # via minimum.reduceat — bit-identical to the per-doc
        # minhash_signature (same uint64 expression), but one numpy call
        # per perm chunk instead of one tiny matmul per doc (the per-doc
        # loop was overhead-dominated at 1M docs)
        hash_arrays = []
        for t in texts:
            hash_arrays.append(
                np.unique(
                    np.fromiter(
                        (_hash64(x) for x in _word_ngrams(t or "", ngram)),
                        dtype=np.uint64,
                    )
                )
            )
        lens = np.array([len(h) for h in hash_arrays], dtype=np.int64)
        sigs = np.full((len(ids), num_perm), np.uint64(_MERSENNE), dtype=np.uint64)
        nonempty = lens > 0
        if nonempty.any():
            big = np.concatenate([h for h in hash_arrays if len(h)])
            offs = np.concatenate([[0], np.cumsum(lens[nonempty])])[:-1]
            ne_idx = np.flatnonzero(nonempty)
            for p0 in range(0, num_perm, 8):  # chunk perms: bounded memory
                p1 = min(p0 + 8, num_perm)
                prod = _mod_mersenne61(
                    a[p0:p1, None] * big[None, :] + b[p0:p1, None]
                )
                sigs[ne_idx, p0:p1] = np.minimum.reduceat(prod, offs, axis=1).T
        out_id, out_bhash, out_part = [], [], []
        for r, i in enumerate(ids):
            sig = sigs[r]
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                # band id folded into the hash so buckets never cross bands
                bh = _hash64(f"{band}:{chunk.tobytes().hex()}")
                out_id.append(i)
                out_bhash.append(bh)
                out_part.append(bh % parts)
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band_hash": pa.array(out_bhash, pa.uint64()),
                "__part": pa.array(out_part, pa.int32()),
            }
        )

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized collision-bucket pairing: sort by (band_hash,
        # id), run-length the buckets, materialize every in-bucket i<j
        # pair as repeat + offset aranges, then lexsort-dedup — the
        # python set/combinations loop was the stage's hot spot on
        # dup-heavy corpora (200-member buckets -> 19.9k pairs each)
        bh = g["band_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, bh))
        bh, ids = bh[order], ids[order]
        dup = np.zeros(len(bh), dtype=bool)
        if len(bh) > 1:
            dup[1:] = (bh[1:] == bh[:-1]) & (ids[1:] == ids[:-1])
        bh, ids = bh[~dup], ids[~dup]
        n = len(bh)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        starts = np.flatnonzero(np.concatenate([[True], bh[1:] != bh[:-1]]))
        lens = np.diff(np.concatenate([starts, [n]]))
        row_pos = np.arange(n) - np.repeat(starts, lens)
        cnt_row = np.repeat(lens, lens) - 1 - row_pos
        total = int(cnt_row.sum())
        if total == 0:
            return pd.DataFrame({"id_a": [], "id_b": []})
        i_idx = np.repeat(np.arange(n), cnt_row)
        off = np.arange(total) - np.repeat(np.cumsum(cnt_row) - cnt_row, cnt_row)
        j_idx = i_idx + 1 + off
        a, b = ids[i_idx], ids[j_idx]  # in-run sort + dedup ⇒ a < b
        porder = np.lexsort((b, a))
        a, b = a[porder], b[porder]
        keep = np.ones(total, dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})

    def pair_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__part"] = _pair_bucket(batch["id_a"], batch["id_b"], parts)
        return batch

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"]).drop(columns="__part")

    to_bands = to_bands_fast if hash_impl == "wordmix" else to_bands_md5
    bands_ds = ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)
    candidates = (
        bands_ds.groupby("__part")
        .map_groups(partition_pairs, batch_format="pandas")
        .map_batches(pair_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(pair_dedup, batch_format="pandas")
    )

    # verification against true n-gram Jaccard — fully DISTRIBUTED: a
    # hash-partition join of the candidate pairs against the (id, sorted
    # shingle hashes) table on id (once per side), then a per-pair
    # partition that computes the exact Jaccard.  No corpus-sized driver
    # structure: only the candidate-id set (output-sized, one int per
    # involved doc) is broadcast, to semi-join-prune the shingle table
    # (or, below a size threshold, to collect the PRUNED output-sized
    # shingle map for a broadcast verify).  The shingle table is LAZY and
    # pruned to candidate ids inside _verify_pairs_jaccard BEFORE
    # tokenizing, so only near-dup docs are tokenized a second time.
    return _verify_pairs_jaccard(
        candidates,
        ds,
        id_col,
        shingle_fn=shingle_rows,
        threshold=threshold,
        num_parts=parts,
        broadcast_threshold=verify_broadcast_threshold,
    )


def _verify_pairs_jaccard(
    candidates: Dataset,
    docs: Dataset,
    id_col: str,
    *,
    shingle_fn,
    threshold: float,
    num_parts: int = _NUM_PARTS,
    broadcast_threshold: int = 2_000_000,
) -> Dataset:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs against a
    distributed (id, sorted-unique shingle hashes) table.

    Shuffle structure (both exchanges are hash-partition groupbys):

    1. pairs exploded to one row per side keyed by that side's id, unioned
       with the shingle table, grouped by hash(id) — each partition holds
       the shingle lists for its ids plus every pair-side needing them;
       emits (id_a, id_b, shingles) rows.
    2. grouped by hash(id_a, id_b) — each pair's two sides meet; exact
       Jaccard via sorted-array intersection (np.intersect1d).

    The candidate-id set (output-sized) is broadcast once to prune the
    DOCS table before tokenization, so only near-dup candidates are ever
    shingled here and the shuffles carry candidate-sized data only.
    """
    # pin: pairs feed two downstream uses (explode + id-set); without this
    # the lazy candidate pipeline would re-run per consumer.
    candidates = candidates.materialize()
    cdf = candidates.select_columns(["id_a", "id_b"]).to_pandas()
    # len-guard: an all-empty dataset concatenates to a columnless frame
    cand_ids: set = (set(cdf["id_a"]) | set(cdf["id_b"])) if len(cdf) else set()
    if not cand_ids:
        return candidates.map_batches(
            lambda b: pd.DataFrame(
                {"id_a": [], "id_b": [], "jaccard": pd.Series([], dtype="float64")}
            ),
            batch_format="pandas",
        )
    # broadcast the candidate ids as an Arrow array (not a python set):
    # the corpus-side prune below runs on EVERY batch of the docs table,
    # so it must be the vectorized pc.is_in kernel, not a per-row loop.
    ids_ref = ray.put(
        pa.array(pd.unique(pd.concat([cdf["id_a"], cdf["id_b"]], ignore_index=True)))
    )

    def keep_candidates(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .broadcast import cached_get

        keep = cached_get(ids_ref)
        col = batch.column(id_col)
        if keep.type != col.type:
            keep = keep.cast(col.type)
        return batch.filter(pc.is_in(col, value_set=keep))

    # prune BEFORE tokenizing: only candidate docs reach shingle_fn
    shingles_ds = docs.map_batches(
        keep_candidates, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(shingle_fn, batch_format="pyarrow", zero_copy_batch=True)

    # small-to-medium candidate sets (the common case: near-dup pairs are
    # output-sized): collect the PRUNED shingle table — one compact hash
    # array per candidate id, NOT the corpus — and verify by broadcast as
    # a ZERO-COPY numpy triplet (sorted ids, offsets, flat hashes).  The
    # triplet maps from plasma in microseconds per worker (the round-3
    # dict-of-arrays broadcast re-unpickled per worker, which forced a
    # 100k-doc threshold; numpy buffers lifted it to 2M docs — the r4
    # measurement: 866k candidate pairs at 1M docs spent 48s shipping
    # shingle lists through the join path's two exchanges, vs ~4s here).
    # The join path below stays as the unbounded fallback; neither path
    # materializes a corpus-sized driver structure (flat size = candidate
    # docs x shingles/doc; callers with very long docs should lower the
    # threshold).
    if len(cand_ids) <= broadcast_threshold:
        sdf = shingles_ds.to_pandas()
        ids_np = sdf[id_col].to_numpy()
        order = np.argsort(ids_np, kind="mergesort")
        ids_sorted = ids_np[order]
        arrays = [
            np.asarray(sdf["shingles"].iloc[i], dtype=np.uint64) for i in order
        ]
        lens = np.fromiter((len(x) for x in arrays), dtype=np.int64, count=len(arrays))
        offsets = np.concatenate([[0], np.cumsum(lens)])
        flat = (
            np.concatenate(arrays) if arrays else np.empty(0, np.uint64)
        )
        ids_sorted_ref = ray.put(ids_sorted)
        off_ref = ray.put(offsets)
        flat_ref = ray.put(flat)

        def verify_broadcast(batch: pd.DataFrame) -> pd.DataFrame:
            from .broadcast import cached_get

            I = cached_get(ids_sorted_ref)
            O = cached_get(off_ref)
            H = cached_get(flat_ref)
            a_ids = batch["id_a"].to_numpy()
            b_ids = batch["id_b"].to_numpy()
            sa = np.searchsorted(I, a_ids)
            sb = np.searchsorted(I, b_ids)
            empty = H[:0]
            out_a, out_b, out_j = [], [], []
            for k in range(len(a_ids)):
                ia, ib = sa[k], sb[k]
                a = (
                    H[O[ia] : O[ia + 1]]
                    if ia < len(I) and I[ia] == a_ids[k]
                    else empty
                )
                b = (
                    H[O[ib] : O[ib + 1]]
                    if ib < len(I) and I[ib] == b_ids[k]
                    else empty
                )
                if len(a) == 0 and len(b) == 0:
                    j = 1.0
                else:
                    inter = np.intersect1d(a, b, assume_unique=True).size
                    j = inter / (len(a) + len(b) - inter)
                if j >= threshold:
                    out_a.append(a_ids[k])
                    out_b.append(b_ids[k])
                    out_j.append(j)
            return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": out_j})

        return candidates.map_batches(verify_broadcast, batch_format="pandas")

    # no nulls anywhere (a null in an int64 column would promote to float64
    # through the pandas group conversion, corrupting large ids): shingle
    # rows carry their own id in id_a/id_b, an is_shingle flag tells the
    # row kinds apart, and pair rows carry an empty shingle list.
    def prune_and_key(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "jid": batch[id_col],
                "id_a": batch[id_col],
                "id_b": batch[id_col],
                "is_shingle": True,
                "shingles": batch["shingles"],
                "__part": _bucket_of(batch[id_col], num_parts),
            }
        )

    def explode_sides(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for side in ("id_a", "id_b"):
            rows.append(
                pd.DataFrame(
                    {
                        "jid": batch[side],
                        "id_a": batch["id_a"],
                        "id_b": batch["id_b"],
                        "is_shingle": False,
                        "shingles": [[]] * len(batch),
                        "__part": _bucket_of(batch[side], num_parts),
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    def attach_shingles(g: pd.DataFrame) -> pd.DataFrame:
        mask = g["is_shingle"].to_numpy()
        lookup = dict(zip(g.loc[mask, "jid"], g.loc[mask, "shingles"]))
        p = g[~mask]
        out = pd.DataFrame(
            {
                "id_a": p["id_a"].to_numpy(),
                "id_b": p["id_b"].to_numpy(),
                "shingles": [lookup.get(j, []) for j in p["jid"]],
            }
        )
        out["__pp"] = _pair_bucket(out["id_a"], out["id_b"], num_parts)
        return out

    def pair_jaccard(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for (ia, ib), sub in g.groupby(["id_a", "id_b"], sort=False):
            sets = [np.asarray(s, dtype=np.uint64) for s in sub["shingles"]]
            if len(sets) != 2:  # a side went missing — never a valid pair
                continue
            a, b = sets[0], sets[1]
            if len(a) == 0 and len(b) == 0:
                j = 1.0
            else:
                inter = np.intersect1d(a, b, assume_unique=True).size
                j = inter / (len(a) + len(b) - inter)
            if j >= threshold:
                out_a.append(ia)
                out_b.append(ib)
                out_j.append(j)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": out_j})

    keyed = shingles_ds.map_batches(prune_and_key, batch_format="pandas").union(
        candidates.map_batches(explode_sides, batch_format="pandas")
    )
    sided = keyed.groupby("__part").map_groups(attach_shingles, batch_format="pandas")
    return sided.groupby("__pp").map_groups(pair_jaccard, batch_format="pandas")


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


def ngram_containment_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str = "text",
    *,
    block_cols: list[str],
    ngram: int = 3,
    threshold: float = 0.9,
) -> Dataset:
    """Asymmetric near-dup detection: containment(a in b) =
    |grams(a) ∩ grams(b)| / |grams(a)| — catches quotes/subset documents
    that symmetric Jaccard misses (Broder's containment measure).
    Output: id_a (contained), id_b (container), one row per direction
    that clears the threshold.  Same blocking-bounded O(k²) shape as
    ``ngram_jaccard_pairs``."""

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(zip(g[id_col], g[text_col]))
        out_a, out_b = [], []
        grams = [(i, _word_ngrams(t or "", ngram)) for i, t in recs]
        for (ia, ga), (ib, gb) in combinations(grams, 2):
            inter = len(ga & gb)
            if ga and inter / len(ga) >= threshold:
                out_a.append(ia)
                out_b.append(ib)
            if gb and inter / len(gb) >= threshold:
                out_a.append(ib)
                out_b.append(ia)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

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


def simhash64_batch(texts) -> np.ndarray:
    """(n,) uint64 SimHash signatures for a whole batch — bit-identical to
    per-doc :func:`simhash64` (same per-word md5 hashes, same majority
    rule), but each UNIQUE word of the batch is md5'd once and per-doc
    bit-majorities come from one cumsum over the unpacked bit matrix
    (empty segments fall out naturally; the old path was a Python loop
    with an np.fromiter per doc)."""
    from .shingle import split_words
    from .shingle import word_hashes as _word_h

    flat, woff = split_words(texts)
    wh = _word_h(flat)
    ndoc = len(woff) - 1
    lens = woff[1:] - woff[:-1]
    ones = np.zeros((ndoc, 64), np.int32)
    ne = lens > 0
    if ne.any():
        # per-doc bit sums via reduceat over the TRANSPOSED (64, W) bit
        # matrix: contiguous inner loop per bit lane (cumsum / reduceat
        # along axis 0 of the (W, 64) layout ran a strided unbuffered
        # inner loop — measured ~60x slower on this host); only nonempty
        # segments are reduced (reduceat's empty-segment trap)
        bits_t = np.ascontiguousarray(
            np.unpackbits(
                wh.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).T,
            dtype=np.int32,
        )
        ones[ne] = np.add.reduceat(bits_t, woff[:-1][ne], axis=1).T
    sig = np.packbits(2 * ones > lens[:, None], axis=1, bitorder="little")
    return np.ascontiguousarray(sig).view(np.uint64).ravel()


# pair-expansion strip size for simhash bucket pairing: bounds the
# largest single numpy allocation (module-level so tests can shrink it
# to force the multi-strip path on small fixtures)
_SIMHASH_STRIP_BUDGET = 8_000_000


def simhash_buckets(
    ds: Dataset,
    id_col: str,
    text_col: str = "text",
    *,
    max_hamming: int = 3,
    strip_budget: int | None = None,
    sig_col: str | None = None,
) -> Dataset:
    """Near-dup pairs by SimHash: 4x 16-bit chunk buckets (hamming<=3
    guarantees a shared chunk), verified by popcount.
    Output: id_a, id_b, hamming.

    ``sig_col`` generalizes the op to ANY precomputed 64-bit signature
    column (perceptual image hashes, rolling fingerprints, ...) — the
    bucketing/pairing machinery is hash-agnostic; ``text_col`` is
    ignored then."""
    # resolve the budget DRIVER-side so it ships inside the task closure
    # (a worker re-imports the module and would not see a test's patch)
    strip_budget = _SIMHASH_STRIP_BUDGET if strip_budget is None else strip_budget
    parts = adaptive_parts(ds)

    def sigs(batch: pa.Table) -> pa.Table:
        """Batch-vectorized signatures (``simhash64_batch``, bit-identical
        to per-doc ``simhash64``, which the SQL oracle replicates).  The
        16-bit chunk BUCKET key is an internal accelerator — docs collide
        iff their chunk is equal, so any deterministic function of
        (chunk_idx, chunk) yields the same pairs; a numpy mix replaces the
        old per-row string md5."""
        from .shingle import _FOLD_SEED, mix_finish, mix_step

        if sig_col is not None:
            sig = batch.column(sig_col).to_numpy(zero_copy_only=False).astype(
                np.uint64
            )
        else:
            sig = simhash64_batch(batch.column(text_col))
        ndoc = batch.num_rows
        chunk_idx = np.arange(4, dtype=np.uint64)[None, :]
        chunks = (sig[:, None] >> (np.uint64(16) * chunk_idx)) & np.uint64(0xFFFF)
        bucket = mix_finish(
            mix_step(mix_step(np.full((ndoc, 4), _FOLD_SEED, np.uint64), chunk_idx), chunks)
        ).ravel()
        ids_np = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids_np, 4)),
                "sig": pa.array(np.repeat(sig, 4), pa.uint64()),
                "bucket": pa.array(bucket, pa.uint64()),
                "__part": pa.array(
                    (bucket % np.uint64(parts)).astype(np.int32), pa.int32()
                ),
            }
        )

    # 16-bit popcount LUT: XOR popcount of uint64 signatures = 4 lookups
    _POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], np.uint8)

    def _popcount64(x: np.ndarray) -> np.ndarray:
        return (
            _POP16[x & 0xFFFF]
            + _POP16[(x >> np.uint64(16)) & np.uint64(0xFFFF)]
            + _POP16[(x >> np.uint64(32)) & np.uint64(0xFFFF)]
            + _POP16[(x >> np.uint64(48)) & np.uint64(0xFFFF)]
        )

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized within-bucket pairing: upper-triangle index pairs
        from the repeat/arange trick, XOR popcount via a 16-bit LUT —
        the python combinations loop ran ~1M pairs/s; degenerate corpora
        emit tens of millions.  Strip-chunked so a hot bucket's pair
        expansion never allocates more than ~8M index rows at once."""
        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], "hamming": pd.Series([], dtype="int64")}
        )
        g = g[g.duplicated("bucket", keep=False)]
        if not len(g):
            return empty
        g = g.drop_duplicates(["bucket", id_col]).sort_values(
            ["bucket", id_col], kind="mergesort"
        )
        ids = g[id_col].to_numpy()
        sig = g["sig"].to_numpy().astype(np.uint64)
        # end index (exclusive) of each row's bucket group
        codes = pd.factorize(g["bucket"], sort=False)[0]
        ends = np.searchsorted(codes, codes, side="right")
        idx = np.arange(len(codes))
        w = ends - idx - 1
        frames = []
        start = 0
        cum = np.cumsum(w)
        while start < len(w):
            base = cum[start - 1] if start else 0
            stop = int(np.searchsorted(cum, base + strip_budget, side="left")) + 1
            stop = min(max(stop, start + 1), len(w))
            ws = w[start:stop]
            total = int(ws.sum())
            if total:
                starts = np.concatenate(([0], np.cumsum(ws)[:-1]))
                offs = np.arange(total) - np.repeat(starts, ws)
                ia = np.repeat(np.arange(start, stop), ws)
                ib = ia + 1 + offs
                ham = _popcount64(sig[ia] ^ sig[ib]).astype(np.int64)
                keep = ham <= max_hamming
                if keep.any():
                    frames.append(
                        pd.DataFrame(
                            {
                                "id_a": ids[ia[keep]],
                                "id_b": ids[ib[keep]],
                                "hamming": ham[keep],
                            }
                        )
                    )
            start = stop
        if not frames:
            return empty
        out = pd.concat(frames, ignore_index=True)
        # a pair can collide in several buckets of the same partition
        return out.drop_duplicates(["id_a", "id_b"])

    def pair_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        ha = pd.util.hash_array(batch["id_a"].to_numpy(), categorize=False)
        hb = pd.util.hash_array(batch["id_b"].to_numpy(), categorize=False)
        batch["__part"] = (
            (ha * np.uint64(31) + hb) % np.uint64(parts)
        ).astype(np.int32)
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


@ray.remote
def _concat_pandas_blocks(*dfs):
    # blocks in one dataset can mix pandas and (empty) arrow — a groupby
    # partition with no rows comes back as an arrow table even when the
    # populated partitions are pandas; coerce before concat
    import pandas as _pd
    import pyarrow as _pa

    frames = [
        d.to_pandas() if isinstance(d, _pa.Table) else d for d in dfs
    ]
    frames = [f for f in frames if len(f)] or frames[:1]
    return _pd.concat(frames, ignore_index=True)


@ray.remote
def _block_is_pandas(block) -> bool:
    return isinstance(block, pd.DataFrame)


def pin_blocks(ds: Dataset, target_blocks: int = 64) -> Dataset:
    """Materialize ``ds`` and rebuild it from its block refs, coalesced to
    <= ``target_blocks`` blocks via remote concat tasks (no driver data).

    Needed by ITERATIVE algorithms: in ray 2.49 a per-round
    union -> sort -> materialize loop (a) re-plans the full upstream chain
    each round (``materialize`` does not truncate the logical plan across
    ``union``) and (b) doubles the block count every round (sort preserves
    input block count) — both make round cost grow geometrically.
    Rebuilding from refs cuts the lineage; the concat bounds block count.

    One dataset can MIX pandas and arrow blocks (a groupby partition
    with no rows comes back as an empty arrow table even when the
    populated partitions are pandas), so the rebuilt dataset is always
    pandas-typed — type checks and coercion run in remote tasks on the
    workers; the driver only ever sees booleans and refs.
    """
    mat = ds.materialize()
    refs = [r for b in mat.iter_internal_ref_bundles() for r in b.block_refs]
    if not refs:
        return mat
    if len(refs) > target_blocks:
        chunks = [refs[i::target_blocks] for i in range(target_blocks)]
        refs = [_concat_pandas_blocks.remote(*c) for c in chunks if c]
    elif not all(ray.get([_block_is_pandas.remote(r) for r in refs])):
        refs = [_concat_pandas_blocks.remote(r) for r in refs]
    return ray.data.from_pandas_refs(refs)


def dup_clusters(
    pairs: Dataset,
    ids: Dataset | None = None,
    id_col: str = "doc_id",
    max_rounds: int = 30,
    driver_threshold: int = 250_000,
) -> Dataset:
    """Resolve duplicate PAIRS (id_a, id_b) into CLUSTERS via distributed
    min-label propagation with POINTER DOUBLING (union-find on the driver
    only when the pair set is provably small).

    Each distributed round combines, per node, (a) simple propagation —
    min over neighbors' labels — and (b) pointer doubling —
    ``label(label(id))`` — so the number of rounds needed is
    O(log diameter), not O(diameter): ``max_rounds=30`` covers components
    of diameter ~2^30.  Both lookups are hash-partition joins (the label
    table is co-partitioned with the edge table on the join key); NOTHING
    round-trips through the driver — convergence is detected from an
    aggregated per-round changed-count, and the loop RAISES if the labels
    have not stabilized within ``max_rounds`` (silent splitting of a
    component would corrupt downstream dedup).

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

        pdf = pairs.select_columns(["id_a", "id_b"]).to_pandas()
        if not len(pdf):
            pdf = pd.DataFrame({"id_a": [], "id_b": []})
        members: set = set(pdf["id_a"]) | set(pdf["id_b"])
        for a, b in zip(pdf["id_a"], pdf["id_b"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = pd.DataFrame({"id": sorted(members)})
        rows["cluster"] = [find(i) for i in rows["id"]]
        import ray.data as _rd

        base = _rd.from_pandas(rows) if len(rows) else None
        if ids is None:
            return base if base is not None else _rd.from_pandas(
                pd.DataFrame({"id": [], "cluster": []})
            )
        # Singletons (ids with no pair) are emitted DISTRIBUTED: the
        # resolved member set is pair-bounded, so broadcast it once with
        # ray.put and filter/tag inside map_batches — never collect the
        # corpus id column to the driver (at 10^12 docs with few dup
        # pairs, the common production shape, that collect is a driver
        # OOM; the pair table is the only thing allowed on the driver
        # here).  ``ids`` is the corpus id column and is assumed unique
        # per id (the pages/documents contract).
        members_ref = ray.put(members)

        def singleton_rows(b: pd.DataFrame) -> pd.DataFrame:
            from .broadcast import cached_get

            mem = cached_get(members_ref)
            col = b[id_col][~b[id_col].isin(mem)]
            return pd.DataFrame({"id": col, "cluster": col})

        singles = ids.map_batches(singleton_rows, batch_format="pandas")
        return singles if base is None else base.union(singles)
    # adaptive partition fan-out: tiny label tables don't need 64-way sorts
    # iterative label propagation pays per-iteration scheduling ∝ blocks,
    # so the ceiling is tighter than one-shot exchanges (1024 parts keeps
    # per-part frames <~100k pairs even at 10^8 edges)
    num_parts = adaptive_parts(rows=pairs.count(), rows_per_part=4096, cap=1024)

    def _part_of(values) -> np.ndarray:
        return _bucket_of(values, num_parts)

    labels = pairs.map_batches(seed_labels, batch_format="pandas")
    if ids is not None:
        labels = labels.union(
            ids.map_batches(
                lambda b: pd.DataFrame({"id": b[id_col], "label": b[id_col]}),
                batch_format="pandas",
            )
        )

    def min_per_partition(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("id", sort=False, as_index=False)["label"].min()

    labels = pin_blocks(
        labels.map_batches(
            lambda b: b.assign(__part=_part_of(b["id"])), batch_format="pandas"
        )
        .groupby("__part")
        .map_groups(min_per_partition, batch_format="pandas"),
        target_blocks=num_parts,
    )
    edges = pin_blocks(
        pairs.map_batches(edge_rows, batch_format="pandas"), target_blocks=num_parts
    )

    # Each round, ONE co-partitioned exchange answers both lookups:
    #   rows keyed by jid = the id whose label is being looked up —
    #     label rows   (jid=id,    kind=0): the label table itself
    #     edge rows    (jid=src,   kind=1, ref=dst):  neighbor propagation
    #     pointer rows (jid=label, kind=2, ref=id):   label(label(id))
    # The partition holding jid's label row emits (ref, label(jid)).
    # A second exchange takes the per-id min of {old label} ∪ proposals and
    # counts changed ids; Sum(changed) == 0 terminates the loop.
    from ray.data.aggregate import Sum as _Sum

    def lookup_rows(labels_ds: Dataset) -> Dataset:
        lab = labels_ds.map_batches(
            lambda b: pd.DataFrame(
                {
                    "jid": b["id"],
                    "ref": b["id"],
                    "kind": 0,
                    "label": b["label"],
                    "__part": _part_of(b["id"]),
                }
            ),
            batch_format="pandas",
        )
        ptr = labels_ds.map_batches(
            lambda b: pd.DataFrame(
                {
                    "jid": b["label"],
                    "ref": b["id"],
                    "kind": 2,
                    "label": b["label"],
                    "__part": _part_of(b["label"]),
                }
            ),
            batch_format="pandas",
        )
        edge = edges.map_batches(
            lambda b: pd.DataFrame(
                {
                    "jid": b["src"],
                    "ref": b["dst"],
                    "kind": 1,
                    "label": b["src"],
                    "__part": _part_of(b["src"]),
                }
            ),
            batch_format="pandas",
        )
        return lab.union(edge).union(ptr)

    def resolve_partition(g: pd.DataFrame) -> pd.DataFrame:
        is_label = g["kind"].to_numpy() == 0
        lookup = dict(zip(g.loc[is_label, "jid"], g.loc[is_label, "label"]))
        req = g[~is_label]
        return pd.DataFrame(
            {
                "id": req["ref"].to_numpy(),
                "label": [lookup[j] for j in req["jid"]],
                "__part": _part_of(req["ref"]),
            }
        )

    def min_and_changed(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("id", sort=False, as_index=False)["label"].min()
        old = g.loc[g["is_old"].to_numpy() == 1, ["id", "label"]].rename(
            columns={"label": "old_label"}
        )
        out = new.merge(old, on="id", how="left")
        out["changed"] = (out["label"] != out["old_label"]).astype("int64")
        return out[["id", "label", "changed"]]

    for round_no in range(max_rounds):
        # pinned: proposals are output-sized, and pinning keeps each
        # round's plan to a single all-to-all (two chained sorts across a
        # union stall the ray 2.49 streaming executor) AND cuts lineage /
        # block growth (see pin_blocks)
        proposals = pin_blocks(
            lookup_rows(labels)
            .groupby("__part")
            .map_groups(resolve_partition, batch_format="pandas"),
            target_blocks=num_parts,
        )
        old = labels.map_batches(
            lambda b: pd.DataFrame(
                {
                    "id": b["id"],
                    "label": b["label"],
                    "is_old": 1,
                    "__part": _part_of(b["id"]),
                }
            ),
            batch_format="pandas",
        )
        prop = proposals.map_batches(
            lambda b: pd.DataFrame(
                {
                    "id": b["id"],
                    "label": b["label"],
                    "is_old": 0,
                    "__part": b["__part"],
                }
            ),
            batch_format="pandas",
        )
        merged = pin_blocks(
            old.union(prop)
            .groupby("__part")
            .map_groups(min_and_changed, batch_format="pandas"),
            target_blocks=num_parts,
        )
        n_changed = merged.aggregate(_Sum("changed", alias_name="n"))["n"]
        labels = pin_blocks(merged.drop_columns(["changed"]), target_blocks=num_parts)
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_rounds} pointer-doubling "
            "rounds — component structure is deeper than 2^max_rounds, or the "
            "pair set is inconsistent; raise max_rounds"
        )

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
    method: str = "auto",
    broadcast_threshold: int = 200_000,
    n_centroids: int = 64,
    nassign: int = 2,
    seed: int = 42,
) -> Dataset:
    """All pairs (id_a < id_b) with cosine similarity >= threshold.

    Two paths:

    - ``broadcast`` — the full (id, normalized-vector) matrix is broadcast
      once with ``ray.put``; each batch computes its (batch x all)
      similarity block with one numpy matmul.  Exact; the broadcast is the
      scale limit (~10^6 x 10^2 dims).
    - ``ivf`` — the 10^12-scale path: vectors are assigned to their
      ``nassign`` nearest k-means centroids (multi-assignment so
      cross-boundary pairs still co-locate), one groupby shuffle buckets
      each centroid's members, pairwise cosine runs per bucket, and a
      pair-dedup shuffle removes pairs found in several buckets.
      Approximate: a pair is missed only if the two vectors share none of
      their ``nassign`` nearest centroids (exact duplicates always share
      all of them).

    ``auto`` picks broadcast below ``broadcast_threshold`` rows, else ivf.
    Output: id_a, id_b, cosine.
    """
    if method == "auto":
        method = "broadcast" if ds.count() <= broadcast_threshold else "ivf"
    if method == "broadcast":
        # the broadcast path consumes ds twice (driver matrix build + the
        # per-batch block scan); pin it so the (threshold-bounded, small)
        # lineage executes once.  The ivf path stays lazy — it may be
        # corpus-sized.
        ds = ds.materialize()
    if method == "ivf":
        return _embedding_neardup_ivf(
            ds,
            id_col,
            vec_col,
            threshold=threshold,
            n_centroids=n_centroids,
            nassign=nassign,
            seed=seed,
        )
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
        # vectorized upper-triangle hit extraction (the per-row python
        # loop over N columns was the stage's hot spot)
        ra, cb = np.where(sims >= threshold)
        keep = bids[ra] < ids_all[cb]
        return pd.DataFrame(
            {
                "id_a": bids[ra[keep]],
                "id_b": ids_all[cb[keep]],
                "cosine": sims[ra[keep], cb[keep]],
            }
        )

    return ds.map_batches(block, batch_format="pandas", batch_size=2048)


def _embedding_neardup_ivf(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    *,
    threshold: float,
    n_centroids: int,
    nassign: int,
    seed: int,
) -> Dataset:
    """IVF-bucketed near-dup pairs: the scale path promised by
    :func:`embedding_neardup_pairs`.  Only the (n_centroids x dim) centroid
    matrix is broadcast; all pairwise work happens inside per-centroid
    buckets after ONE groupby shuffle, followed by the standard pair-dedup
    shuffle.  Bucket sizes are ~N*nassign/n_centroids — size ``n_centroids``
    so a bucket's matrix fits a worker's heap."""
    from .ann import train_ivf_centroids, _normalize
    from .sample import deterministic_sample

    parts = adaptive_parts(ds)

    n_rows = ds.count()
    frac = min(1.0, 4096 / max(n_rows, 1))
    sample_df = (
        deterministic_sample(ds.select_columns([id_col, vec_col]), id_col, frac)
        .limit(4096)
        .to_pandas()
    )
    if len(sample_df) < min(n_centroids, n_rows):
        sample_df = ds.select_columns([id_col, vec_col]).limit(4096).to_pandas()
    sample = np.asarray([np.asarray(v, dtype=np.float64) for v in sample_df[vec_col]])
    cents = train_ivf_centroids(sample, n_centroids, seed=seed)
    cents_ref = ray.put(cents)
    k_assign = min(nassign, len(cents))

    def assign(batch: pa.Table) -> pa.Table:
        from .broadcast import cached_get
        from .cluster import _float_matrix

        cm = cached_get(cents_ref)
        vecs = _normalize(_float_matrix(batch.column(vec_col)))
        sims = vecs @ cm.T  # (batch, n_centroids)
        top = np.argsort(-sims, axis=1)[:, :k_assign]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # Arrow-native replication: one repeat + a FixedSizeList over the
        # flat float64 buffer — the earlier pandas stage's .tolist()
        # materialized ~32M python floats at 500k rows x nassign
        n = len(ids)
        row_idx = np.repeat(np.arange(n), k_assign)
        rep = vecs[row_idx]
        return pa.table(
            {
                id_col: pa.array(ids[row_idx]),
                "centroid": pa.array(top.reshape(-1).astype(np.int64), pa.int64()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(rep.reshape(-1), pa.float64()), rep.shape[1]
                ),
            }
        )

    _EMPTY_PAIRS = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        from .cluster import _float_matrix

        if g.num_rows < 2:
            return _EMPTY_PAIRS
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        mat = _float_matrix(g.column("vec"))
        # chunked strips: a full m x m similarity matrix is O(GB) per
        # bucket at ~15k members; strips bound peak memory and the match
        # extraction is fully vectorized (upper-triangle by id order)
        # float32 screen with a 1e-4 margin (relative dot error for unit
        # vectors is ~d*eps32 ≈ 2e-6 at d=32 — orders below the margin),
        # then a float64 recompute of the rare hits: sgemm halves the
        # memory traffic of the bucket matmul, which IS this operator's
        # cost at ~15k-member buckets
        mat32 = mat.astype(np.float32)
        out_a, out_b, out_c = [], [], []
        chunk = 1024
        screen = np.float32(threshold - 1e-4)
        for i0 in range(0, len(mat), chunk):
            i1 = min(i0 + chunk, len(mat))
            sims32 = mat32[i0:i1] @ mat32.T  # (chunk, m)
            ra, cb = np.where(sims32 >= screen)
            if not len(ra):
                continue
            ia = ids[ra + i0]
            ib = ids[cb]
            keep = ia < ib
            if not keep.any():
                continue
            ra, cb = ra[keep], cb[keep]
            exact = np.einsum("ij,ij->i", mat[ra + i0], mat[cb])
            final = exact >= threshold
            if not final.any():
                continue
            out_a.append(ia[keep][final])
            out_b.append(ib[keep][final])
            out_c.append(exact[final])
        if not out_a:
            return _EMPTY_PAIRS
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    def pair_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__part"] = _pair_bucket(batch["id_a"], batch["id_b"], parts)
        return batch

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"]).drop(columns="__part")

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("centroid")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .map_batches(pair_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(pair_dedup, batch_format="pandas")
    )
