"""Blocked fuzzy (edit-distance) similarity join — entity resolution.

The record-linkage workhorse: find record pairs whose NAME strings are
within Levenshtein distance ``max_dist``, restricted to pairs sharing a
caller-chosen BLOCKING key (brand, zip, registrable domain, sorted-token
prefix — standard ER practice; unblocked all-pairs never runs at scale).
The blocking key is the operator's recall contract and is documented in
the output: only within-block pairs are compared, exactly the semantics
a SQL ``JOIN ON a.block=b.block WHERE levenshtein(...) <= d`` expresses.

Scale shape (the reference's entity linking is a driver-side loop over
ontology labels, make_graph_class.py-era; this is the distributed
generalization):

1. ONE hash exchange on the blocking key co-locates each block.
2. Inside a partition, distances are computed on DISTINCT (block, name)
   pairs — corpora repeat names heavily, so the DP work is
   vocabulary-sized, not row-sized.
3. A char-bag lower bound prunes pairs first: for byte histograms
   ``Ha, Hb``, ``lev >= max(sum(max(Ha-Hb,0)), sum(max(Hb-Ha,0)))``
   (every unmatched surplus byte needs its own edit).  Subsumes the
   length filter.
4. Survivors run a pair-lane-vectorized DP (lanes = pairs, the md5vec
   layout): O(maxlen^2) numpy vector ops per strip, never a Python loop
   over pairs.  Strips bound memory at any candidate volume.
5. Name-pair hits expand back to key pairs with two output-sized merges
   (plus same-name key pairs at distance 0).

Distances are computed on UTF-8 BYTES; for ASCII names (this corpus)
that equals DuckDB's character-level ``levenshtein``.  Callers with
multibyte alphabets should normalize first (documented limitation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .join import hash_bucket
from .partitioning import adaptive_parts

_PAIR_STRIP = 1 << 18  # DP lanes per strip: bounds the (strip, maxlen) frames


def _byte_matrix(names: "pd.Series | list[str]") -> tuple[np.ndarray, np.ndarray]:
    """(N, maxlen) uint8 zero-padded byte matrix + int64 lengths, built
    from the Arrow data buffer without a per-row Python encode."""
    arr = pa.array(names, pa.string()).cast(pa.large_binary())
    n = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[: n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = offsets[1:] - offsets[:-1]
    m = np.zeros((n, int(lens.max()) if n else 0), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        row = np.repeat(np.arange(n), lens)
        col = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        m[row, col] = data[np.repeat(offsets[:-1], lens) + col]
    return m, lens


def levenshtein_pairs(
    mat: np.ndarray, lens: np.ndarray, ia: np.ndarray, ib: np.ndarray
) -> np.ndarray:
    """Exact Levenshtein distance for index-pair arrays (ia[p], ib[p])
    into the shared byte matrix, vectorized ACROSS pairs: the classic DP
    runs once with pairs as SIMD lanes; each pair's answer is gathered
    from the DP row matching its left length."""
    npair = len(ia)
    out = np.empty(npair, dtype=np.int64)
    if npair == 0:
        return out
    A, B = mat[ia], mat[ib]
    la, lb = lens[ia], lens[ib]
    ma, mb = int(la.max()), int(lb.max())
    prev = np.tile(np.arange(mb + 1, dtype=np.int32), (npair, 1))
    done = la == 0
    out[done] = lb[done]
    for i in range(1, ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1 : i]
        # one fused mismatch row, then the three-way min per column
        cost = (ai != B).astype(np.int32)
        for j in range(1, mb + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost[:, j - 1],
            )
        hit = la == i
        if hit.any():
            out[hit] = cur[hit, lb[hit]]
        prev = cur
    return out


def _block_pairs(g: pd.DataFrame, key_col: str, name_col: str, block_col: str,
                 max_dist: int) -> pd.DataFrame:
    """All within-block key pairs at distance <= max_dist for one
    partition's blocks (a partition holds whole blocks by construction).

    Candidate pairs are generated as strip-chunked upper-triangle index
    arrays over the (block, name)-sorted distinct vocabulary (the
    repeat/arange pattern from ``dedup.partition_pairs``) — no pandas
    string self-merge ever materializes; the char-bag prune runs on
    COMPACT histograms (only bytes that occur in this partition)."""
    vocab = (
        g[[block_col, name_col]]
        .drop_duplicates()
        .sort_values([block_col, name_col], kind="mergesort")
        .reset_index(drop=True)
    )
    nv = len(vocab)
    mat0, lens0 = _byte_matrix(vocab[name_col])
    # PassJoin length filter AT GENERATION: re-order each block's
    # vocabulary by byte length, so a name only ever pairs with the
    # following names inside its (len, len + max_dist] window — pairs the
    # length bound would kill are never materialized at all
    codes0 = pd.factorize(vocab[block_col], sort=False)[0].astype(np.int64)
    order = np.lexsort((lens0, codes0))
    vocab = vocab.iloc[order].reset_index(drop=True)
    mat, lens = mat0[order], lens0[order]
    codes = codes0[order]
    # compact char-bag histograms: lev >= max(surplus_a, surplus_b)
    hist = np.zeros((nv, 256), dtype=np.int32)
    if nv:
        rows = np.repeat(np.arange(nv), lens)
        mask = np.arange(mat.shape[1]) < lens[:, None]
        np.add.at(hist, (rows, mat[mask]), 1)
        hist = hist[:, np.flatnonzero(hist.any(axis=0))]

    # per-item candidate window: following items of the same block whose
    # length fits (composite searchsorted, offset clamped below the block
    # stride so a window never spills into the next block)
    if nv:
        stride = int(lens.max()) + max_dist + 2
        key = codes * stride + lens
        probe = codes * stride + np.minimum(lens + max_dist, stride - 1)
        ub = np.searchsorted(key, probe, side="right")
        w = ub - np.arange(nv) - 1
    else:
        w = np.zeros(0, dtype=np.int64)
    cum = np.cumsum(w)
    keep_ia, keep_ib, keep_d = [], [], []
    start = 0
    while start < nv:
        base = cum[start - 1] if start else 0
        stop = int(np.searchsorted(cum, base + _PAIR_STRIP, side="left")) + 1
        stop = min(max(stop, start + 1), nv)
        ws = w[start:stop]
        total = int(ws.sum())
        if total:
            starts = np.concatenate(([0], np.cumsum(ws)[:-1]))
            offs = np.arange(total) - np.repeat(starts, ws)
            ia = np.repeat(np.arange(start, stop), ws)
            ib = ia + 1 + offs
            diff = hist[ia] - hist[ib]
            lower = np.maximum(
                diff.clip(min=0).sum(axis=1), (-diff).clip(min=0).sum(axis=1)
            )
            ok = lower <= max_dist
            sa, sb = ia[ok], ib[ok]
            if len(sa):
                d = levenshtein_pairs(mat, lens, sa, sb)
                hit = d <= max_dist
                keep_ia.append(sa[hit])
                keep_ib.append(sb[hit])
                keep_d.append(d[hit])
        start = stop

    # rows -> integer vocab ids (one vectorized merge, no string pairs)
    recs = g[[block_col, name_col, key_col]].merge(
        vocab.assign(__vid=np.arange(nv, dtype=np.int64)),
        on=[block_col, name_col],
    )[["__vid", key_col]]

    frames: list[pd.DataFrame] = []
    if keep_ia:
        hits = pd.DataFrame(
            {
                "__vid_a": np.concatenate(keep_ia),
                "__vid_b": np.concatenate(keep_ib),
                "dist": np.concatenate(keep_d),
            }
        )
        ea = recs.rename(columns={"__vid": "__vid_a", key_col: "key_a"})
        eb = recs.rename(columns={"__vid": "__vid_b", key_col: "key_b"})
        cross = hits.merge(ea, on="__vid_a").merge(eb, on="__vid_b")[
            ["key_a", "key_b", "dist"]
        ]
        swap = cross["key_a"] > cross["key_b"]
        cross.loc[swap, ["key_a", "key_b"]] = cross.loc[
            swap, ["key_b", "key_a"]
        ].to_numpy()
        frames.append(cross)

    # same-name pairs (distance 0): vocab ids shared by >= 2 records
    dup = recs[recs.duplicated("__vid", keep=False)]
    if len(dup):
        same = dup.merge(dup, on="__vid", suffixes=("_a", "_b"))
        same = same[same[f"{key_col}_a"] < same[f"{key_col}_b"]]
        frames.append(
            pd.DataFrame(
                {
                    "key_a": same[f"{key_col}_a"].to_numpy(),
                    "key_b": same[f"{key_col}_b"].to_numpy(),
                    "dist": np.zeros(len(same), dtype=np.int64),
                }
            )
        )

    if not frames:
        return pd.DataFrame(
            {
                "key_a": pd.Series([], dtype="int64"),
                "key_b": pd.Series([], dtype="int64"),
                "dist": pd.Series([], dtype="int64"),
            }
        )
    out = pd.concat(frames, ignore_index=True)
    out["key_a"] = out["key_a"].astype("int64")
    out["key_b"] = out["key_b"].astype("int64")
    out["dist"] = out["dist"].astype("int64")
    return out


def fuzzy_join(
    ds: Dataset,
    key_col: str,
    name_col: str,
    block_col: str,
    max_dist: int = 2,
    num_parts: int | None = None,
) -> Dataset:
    """Self fuzzy-join: (key_a < key_b, dist) for record pairs in the
    SAME block whose names are within ``max_dist`` edits.  One hash
    exchange on the blocking key; all comparison work is distinct-name
    bounded and pair-lane vectorized (module docstring)."""
    if num_parts is None:
        num_parts = adaptive_parts(ds)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            __part=hash_bucket(b[block_col].to_numpy(), num_parts)
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _block_pairs(g, key_col, name_col, block_col, max_dist)

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(pairs, batch_format="pandas")
    )


def fuzzy_lookup(
    ds: Dataset,
    query_col: str,
    labels: list[str],
    max_dist: int = 1,
    label_col: str = "label",
    dist_col: str = "dist",
) -> Dataset:
    """Broadcast fuzzy DICTIONARY alignment: match each row's query
    string to every label within Levenshtein distance ``max_dist``.

    This is the ontology-alignment scale shape (the reference links
    surface forms to ontology labels in a driver loop,
    make_graph_class.py-era): the label side is ontology-sized, so it is
    precomputed ONCE (byte matrix + char-bag histograms, built at graph
    construction and shipped in the task closure — kilobytes) and the
    corpus side STREAMS with no shuffle at all.  Per batch the DP work is
    dictionary-unique bounded: distinct query strings are length-window +
    char-bag pruned against the label set, survivors run the shared
    pair-lane DP (:func:`levenshtein_pairs`), and matches expand back to
    rows through the dictionary indices.

    Output: one row per (input row, matching label) — a flat-map; rows
    with no match within ``max_dist`` are dropped.  Distances are byte-
    level (== character level for ASCII; normalize multibyte upstream).
    """
    labels = list(labels)
    lmat, llens = _byte_matrix(labels)
    lhist = np.zeros((len(labels), 256), dtype=np.int32)
    if len(labels):
        rows = np.repeat(np.arange(len(labels)), llens)
        mask = np.arange(lmat.shape[1]) < llens[:, None]
        np.add.at(lhist, (rows, lmat[mask]), 1)
    label_arr = pa.array(labels, pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        base_cols = {c: batch.column(c) for c in batch.column_names}
        if batch.num_rows == 0 or not labels:
            empty = dict(base_cols)
            empty[label_col] = pa.array([], pa.string())
            empty[dist_col] = pa.array([], pa.int64())
            return pa.table(empty).slice(0, 0)
        dic = pc.dictionary_encode(batch.column(query_col))
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        uniq = dic.dictionary
        qmat, qlens = _byte_matrix(uniq)
        nq, nl = len(uniq), len(labels)
        # length window: |len(q) - len(l)| <= max_dist
        cand = np.abs(qlens[:, None] - llens[None, :]) <= max_dist
        qi, li = np.nonzero(cand)
        if len(qi):
            # char-bag prune on survivors (lev >= max surplus either way);
            # histograms restricted to OCCUPIED byte columns (alphabet-
            # sized, not 256 — the _block_pairs compaction)
            qhist = np.zeros((nq, 256), dtype=np.int32)
            rows = np.repeat(np.arange(nq), qlens)
            mask = np.arange(qmat.shape[1]) < qlens[:, None]
            np.add.at(qhist, (rows, qmat[mask]), 1)
            cols = np.flatnonzero(qhist.any(axis=0) | lhist.any(axis=0))
            qh, lh = qhist[:, cols], lhist[:, cols]
            diff = qh[qi] - lh[li]
            bag = np.maximum(
                np.where(diff > 0, diff, 0).sum(axis=1),
                np.where(diff < 0, -diff, 0).sum(axis=1),
            )
            keep = bag <= max_dist
            qi, li = qi[keep], li[keep]
        if len(qi):
            # shared matrix: queries then labels, padded to one width
            width = max(qmat.shape[1], lmat.shape[1])
            mat = np.zeros((nq + nl, width), dtype=np.uint8)
            mat[:nq, : qmat.shape[1]] = qmat
            mat[nq:, : lmat.shape[1]] = lmat
            lens = np.concatenate([qlens, llens])
            d = levenshtein_pairs(mat, lens, qi, nq + li)
            ok = d <= max_dist
            qi, li, d = qi[ok], li[ok], d[ok]
        else:
            d = np.zeros(0, dtype=np.int64)
        # expand unique-level matches back to input rows
        codes = np.asarray(dic.indices)
        order = np.argsort(qi, kind="stable")
        qi, li, d = qi[order], li[order], d[order]
        counts_per_uniq = np.zeros(nq + 1, dtype=np.int64)
        np.add.at(counts_per_uniq, qi, 1)
        match_of_uniq_start = np.concatenate(
            ([0], np.cumsum(counts_per_uniq[:-1]))
        )
        reps = counts_per_uniq[codes]
        if not reps.sum():
            empty = dict(base_cols)
            out = pa.table(empty).slice(0, 0)
            out = out.append_column(label_col, pa.array([], pa.string()))
            return out.append_column(dist_col, pa.array([], pa.int64()))
        row_idx = np.repeat(np.arange(batch.num_rows), reps)
        # per-row span into the (sorted-by-qi) match arrays
        offs = np.arange(len(row_idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        match_pos = match_of_uniq_start[codes[row_idx]] + offs
        out = batch.take(pa.array(row_idx, pa.int64()))
        out = out.append_column(label_col, label_arr.take(pa.array(li[match_pos])))
        return out.append_column(dist_col, pa.array(d[match_pos], pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
