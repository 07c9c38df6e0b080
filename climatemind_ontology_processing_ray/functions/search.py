"""Distributed text retrieval: TF-IDF scoring + top-k search.

Scoring is INTEGER-RATIONAL (idf = (N * SCALE) // df, score = sum of
tf * idf over query terms) so results are bit-exact across block
layouts, summation orders, and the SQL oracle — the same
determinism-by-construction rule as ``graph_algo.pagerank_fixed``.
Swap in real BM25 floats for production ranking; the distributed shape
(broadcast tiny term stats, per-batch scoring, local-then-global top-k)
is identical.

Shuffle structure:

1. **df pass** — one streaming map emits per-batch partial document
   frequencies for the (tiny, broadcast) query-term set; a small
   groupby-Sum reduces them.  The corpus is never shuffled.
2. **score pass** — idf table (|terms| rows) is broadcast via
   ``ray.put``; each batch computes its docs' scores vectorized and
   keeps only its LOCAL top-k (k rows per block leave the workers).
3. **global top-k** — the <= k x #blocks candidate rows reduce to the
   final k on the driver (k-bounded, not corpus-bounded).
"""

from __future__ import annotations

import pandas as pd

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

IDF_SCALE = 10**6


def _tokens(text: str) -> list[str]:
    return [t for t in (text or "").lower().split(" ") if t]


def term_doc_frequencies(
    ds: Dataset, terms: list[str], text_col: str = "text"
) -> dict[str, int]:
    """Document frequency of each query term (distributed partial counts;
    one small groupby over |terms| x #blocks rows)."""
    term_set = frozenset(terms)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        counts = {t: 0 for t in term_set}
        for txt in b[text_col]:
            present = term_set.intersection(_tokens(txt))
            for t in present:
                counts[t] += 1
        return pd.DataFrame({"term": list(counts), "df_p": list(counts.values())})

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"))
        .to_pandas()
    )
    return dict(zip(agg["term"], agg["df"].astype(int)))


def tfidf_topk(
    ds: Dataset,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
) -> pd.DataFrame:
    """Top-k documents for a bag-of-terms query under integer-rational
    TF-IDF.  Output: (doc_id, score) with score = sum_t tf(t,d) * idf(t),
    idf(t) = (N * IDF_SCALE) // df(t); ties broken by ascending doc id.
    Documents with score 0 are never returned."""
    if n_docs is None:
        n_docs = ds.count()
    dfs = term_doc_frequencies(ds, terms, text_col)
    idf = {t: (n_docs * IDF_SCALE) // df for t, df in dfs.items() if df > 0}
    idf_ref = ray.put(idf)

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(idf_ref)
        ids, scores = [], []
        for i, txt in zip(b[id_col], b[text_col]):
            s = 0
            toks = _tokens(txt)
            for t, weight in w.items():
                tf = toks.count(t)
                if tf:
                    s += tf * weight
            if s > 0:
                ids.append(int(i))
                scores.append(s)
        out = pd.DataFrame({id_col: ids, "score": scores})
        return out.sort_values(
            ["score", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    cand["score"] = cand["score"].astype("int64")
    return (
        cand.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


# BM25 (k1 = 12/10, b = 3/4) in exact integer-rational form.  Each
# term's contribution is
#     idf_int * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# with avgdl = total_tokens/N substituted and every constant a ratio of
# small integers, which collapses to the single integer expression
#     (idf_int * tf * 88 * total) // (40*tf*total + 12*total + 36*dl*N)
# floored PER TERM — bit-identical in Python big-ints and in SQL (DuckDB
# promotes intermediates to HUGEINT; Python ints are unbounded, so the
# two sides agree even past int64).
BM25_K1_NUM, BM25_K1_DEN = 12, 10
BM25_B_NUM, BM25_B_DEN = 3, 4


def bm25_topk(
    ds: Dataset,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Top-k documents under integer-rational BM25; same distributed
    shape as :func:`tfidf_topk` (broadcast term stats + corpus-level
    (N, total token) scalars, per-batch scoring, local-then-global
    top-k; the corpus is never shuffled).  Ties break ascending id;
    zero scores never surface."""
    # one streaming pass for N and total token count (pre-combined per
    # batch: two ints per block cross the wire)
    def len_partial(b: pd.DataFrame) -> pd.DataFrame:
        dls = [len(_tokens(t)) for t in b[text_col]]
        return pd.DataFrame({"n_p": [len(dls)], "tot_p": [sum(dls)]})

    stats = (
        ds.map_batches(len_partial, batch_format="pandas")
        .sum(["n_p", "tot_p"])
    )
    n_docs, total = int(stats["sum(n_p)"]), int(stats["sum(tot_p)"])

    dfs = term_doc_frequencies(ds, terms, text_col)
    idf = {t: (n_docs * IDF_SCALE) // df for t, df in dfs.items() if df > 0}
    idf_ref = ray.put(idf)

    # scale numerator and denominator by k1_den*b_den*total = 40*total:
    # denominator pieces: 40*tf*total + 12*total + 36*dl*N
    d_tf = BM25_K1_DEN * BM25_B_DEN                       # 40
    d_const = BM25_K1_NUM * (BM25_B_DEN - BM25_B_NUM)     # 12
    d_dl = BM25_K1_NUM * BM25_B_NUM                       # 36
    # numerator: (k1+1)*40 = (22/10)*40 = 88
    s_num = (BM25_K1_NUM + BM25_K1_DEN) * d_tf // BM25_K1_DEN  # 88

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(idf_ref)
        ids, scores = [], []
        for i, txt in zip(b[id_col], b[text_col]):
            toks = _tokens(txt)
            dl = len(toks)
            s = 0
            for t, weight in w.items():
                tf = toks.count(t)
                if tf:
                    num = weight * tf * s_num * total
                    den = d_tf * tf * total + d_const * total + d_dl * dl * n_docs
                    s += num // den
            if s > 0:
                ids.append(int(i))
                scores.append(s)
        out = pd.DataFrame({id_col: ids, "score": scores})
        return out.sort_values(
            ["score", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    cand["score"] = cand["score"].astype("int64")
    return (
        cand.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


RRF_SCALE = 10**9


def rrf_fuse(
    rank_frames: list[pd.DataFrame],
    id_col: str,
    k: int = 10,
    c: int = 60,
) -> pd.DataFrame:
    """Reciprocal-rank fusion of k-bounded rank lists (hybrid retrieval:
    a sparse BM25 leg + a dense embedding leg is the canonical pair).

    Exact-integer RRF: score = sum over lists of ``RRF_SCALE // (c + rank)``
    — the floor'd fixed-point of 1/(c+rank), bit-identical in SQL.  Inputs
    are the k-bounded OUTPUTS of the retrieval legs (each frame:
    (id_col, rank)), so the fusion is rank-list-sized, never
    corpus-sized — driver-side by design.  Ties break ascending id."""
    scores: dict = {}
    for f in rank_frames:
        for i, r in zip(f[id_col], f["rank"]):
            scores[i] = scores.get(i, 0) + RRF_SCALE // (c + int(r))
    out = pd.DataFrame(
        {id_col: list(scores.keys()), "rrf": list(scores.values())}
    )
    out["rrf"] = out["rrf"].astype("int64")
    return (
        out.sort_values(["rrf", id_col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def phrase_search(
    ds: Dataset,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Exact phrase match over whitespace tokens: docs containing the
    token sequence, with match count and first position (1-based).

    One projection-early streaming scan, no shuffle: each batch
    flattens its docs into ONE token array, integer-codes it against
    the phrase's tokens (np.unique factorization — no per-row string
    loops), and ANDs shifted equality masks; a same-doc guard keeps
    windows from crossing document boundaries.  A scan is the optimal
    plan for a one-shot phrase query at any corpus size (an index only
    pays for REPEATED queries — build one with
    :func:`build_inverted_index` / the sharded variant and intersect
    postings when the query stream is hot).
    """
    import numpy as np
    import pyarrow as pa

    # Space-delimited tokens with empties dropped and positions
    # renumbered over the KEPT tokens — the exact semantics of the SQL
    # oracle's STRING_SPLIT(LOWER(text), ' ') ... WHERE tok <> '' +
    # ROW_NUMBER.  str.split() (any whitespace) would diverge on
    # tabs/newlines inside documents.
    words = [w for w in phrase.lower().split(" ") if w]
    m = len(words)
    if m == 0:
        raise ValueError("empty phrase")

    def scan(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        tok_lists = [
            [w for w in t.lower().split(" ") if w] if t else [] for t in texts
        ]
        lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "n_matches": pa.array([], pa.int64()),
                "first_pos": pa.array([], pa.int64()),
            }
        )
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
        doc_idx = np.repeat(np.arange(len(ids)), lens)
        pos = np.arange(len(flat)) - np.repeat(np.cumsum(lens) - lens, lens)
        uniq, codes = np.unique(flat, return_inverse=True)
        want = np.searchsorted(uniq, words)
        ok = (want < len(uniq)) & (uniq[np.minimum(want, len(uniq) - 1)] == words)
        if not ok.all():
            return empty
        n = len(flat)
        match = codes[: n - m + 1] == want[0] if n >= m else np.zeros(0, bool)
        for j in range(1, m):
            match = match & (codes[j : n - m + 1 + j] == want[j])
        # same-doc guard: window start and end in one document
        match = match & (doc_idx[: n - m + 1] == doc_idx[m - 1 :])
        hits = np.flatnonzero(match)
        if not len(hits):
            return empty
        hd = doc_idx[hits]
        first_doc = np.ones(len(hits), dtype=bool)
        first_doc[1:] = hd[1:] != hd[:-1]
        starts = np.flatnonzero(first_doc)
        counts = np.diff(np.append(starts, len(hits)))
        return pa.table(
            {
                id_col: pa.array(ids[hd[starts]].astype(np.int64), pa.int64()),
                "n_matches": pa.array(counts.astype(np.int64), pa.int64()),
                "first_pos": pa.array(pos[hits[starts]] + 1, pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


def positional_index(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_range: int | None = None,
    num_parts: int = 64,
) -> Dataset:
    """Positional inverted index: one row per (token, doc) carrying the
    token's 1-based positions (comma-joined, ascending) — the layout
    REPEATED phrase/proximity queries read instead of rescanning the
    corpus (:func:`phrase_search` is the right plan for ONE-SHOT
    queries; the crossover is roughly when the summed query-time posting
    reads undercut one full corpus scan, i.e. a handful of repeated
    queries at web scale).

    Tokenization matches the scan/oracle exactly: split on ' ', drop
    empties, renumber positions over KEPT tokens.  Scale shape mirrors
    ``text.inverted_index``: ``shard_range`` keys rows by
    ``(token, doc_id // shard_range)`` AT MAP TIME, so a stop-token's
    postings spread over doc-range shards and no reducer ever holds a
    full hot posting list; one coarse hash((token, shard)) exchange
    co-locates and orders each posting run (readers concatenate shards
    in shard order — ranges are disjoint and ordered)."""
    import numpy as np
    import pyarrow as pa

    from .join import hash_bucket

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        ids: list[int] = []
        poss: list[str] = []
        for i, txt in zip(b[id_col], b[text_col]):
            words = [w for w in (txt or "").lower().split(" ") if w]
            per: dict[str, list[int]] = {}
            for p, w in enumerate(words, 1):
                per.setdefault(w, []).append(p)
            for w, pl in per.items():
                toks.append(w)
                ids.append(int(i))
                poss.append(",".join(map(str, pl)))
        out = pd.DataFrame({"token": toks, id_col: ids, "positions": poss})
        out[id_col] = out[id_col].astype("int64")
        if shard_range:
            out["shard"] = (out[id_col] // shard_range).astype("int64")
            key = (out["token"] + "\x00" + out["shard"].astype(str)).to_numpy()
        else:
            key = out["token"].to_numpy()
        out["__part"] = hash_bucket(key, num_parts)
        return out

    sort_keys = ["token", id_col]

    def order(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_keys, kind="mergesort").reset_index(drop=True)
        cols = ["token", id_col, "positions"] + (
            ["shard"] if shard_range else []
        )
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype=object),
                    id_col: pd.Series([], dtype="int64"),
                    "positions": pd.Series([], dtype=object),
                    **(
                        {"shard": pd.Series([], dtype="int64")}
                        if shard_range
                        else {}
                    ),
                }
            )
        return g[cols]

    return (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("__part")
        .map_groups(order, batch_format="pandas")
    )


def phrase_search_indexed(
    index: Dataset,
    phrase: str,
    id_col: str = "doc_id",
    num_parts: int = 64,
) -> Dataset:
    """Exact phrase match over a :func:`positional_index` — same output
    contract as :func:`phrase_search` (doc_id, n_matches, first_pos; a
    match is the full token sequence at consecutive positions), so both
    share one oracle.  Plan: a vectorized ``is_in`` filter keeps only
    the phrase tokens' posting rows (query-bounded, not corpus-bounded —
    the whole point of paying for the index), then ONE hash(doc)
    exchange groups each candidate doc's m posting rows and a numpy
    position-intersection verifies adjacency."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .join import hash_bucket

    words = [w for w in phrase.lower().split(" ") if w]
    m = len(words)
    if m == 0:
        raise ValueError("empty phrase")
    uniq = pa.array(sorted(set(words)), pa.string())

    def pick(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("token"), value_set=uniq))
        return t.select(["token", id_col, "positions"])

    def tag(b: pa.Table) -> pa.Table:
        pids = hash_bucket(
            b.column(id_col).to_numpy(zero_copy_only=False), num_parts
        )
        return b.append_column("__part", pa.array(pids, pa.int32()))

    need = len(set(words))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        out_id, out_n, out_f = [], [], []
        for doc, grp in g.groupby(id_col, sort=False):
            if len(grp) < need:
                continue
            pos = {
                t: np.fromstring(p, dtype=np.int64, sep=",")
                for t, p in zip(grp["token"], grp["positions"])
            }
            starts = pos.get(words[0])
            if starts is None:
                continue
            ok = True
            for j in range(1, m):
                nxt = pos.get(words[j])
                if nxt is None:
                    ok = False
                    break
                starts = starts[np.isin(starts + j, nxt, assume_unique=True)]
                if not len(starts):
                    ok = False
                    break
            if ok and len(starts):
                out_id.append(int(doc))
                out_n.append(len(starts))
                out_f.append(int(starts.min()))
        return pd.DataFrame(
            {
                id_col: pd.Series(out_id, dtype="int64"),
                "n_matches": pd.Series(out_n, dtype="int64"),
                "first_pos": pd.Series(out_f, dtype="int64"),
            }
        )

    return (
        index.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(verify, batch_format="pandas")
    )


def boolean_search(
    ds: Dataset,
    terms: list[str],
    min_match: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Multi-term boolean retrieval over raw text: for every document
    holding at least ``min_match`` DISTINCT query terms (default: ALL of
    them — conjunctive AND), emit ``(id, n_hit)``.

    A document is one row, so term-set membership is embarrassingly
    parallel — ZERO exchanges, all Arrow/numpy: per batch, one
    ``split_pattern`` + ``index_in`` against the (tiny) query-term set,
    then distinct (row, term) keys via one ``np.unique`` and a bincount
    per row.  Disjunctive OR is ``min_match=1``; weak-AND is any middle
    value.  Tokenization matches the corpus convention everywhere in
    this engine: lowercase, split on ' ', drop empties (empty tokens
    can't match a non-empty term, so no explicit drop is needed)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    qset = sorted({w for w in (t.lower() for t in terms) if w})
    if not qset:
        raise ValueError("empty term list")
    need = len(qset) if min_match is None else min_match
    uniq = pa.array(qset, pa.string())
    K = len(qset)

    def score(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.utf8_lower(b.column(text_col)), "")
        toks = pc.split_pattern(txt, " ")
        if toks.num_chunks != 1:
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        tidx = pc.index_in(flat, value_set=uniq)
        tnp = tidx.to_numpy(zero_copy_only=False)  # float w/ nan for misses
        mask = ~pd.isna(tnp)
        keys = parent[mask].astype(np.int64) * K + tnp[mask].astype(np.int64)
        uk = np.unique(keys)
        rows_hit = uk // K
        row_ids, n_hit = np.unique(rows_hit, return_counts=True)
        keep = n_hit >= need
        ids = b.column(id_col).take(pa.array(row_ids[keep], pa.int64()))
        return pa.table(
            {
                id_col: ids.cast(pa.int64()),
                "n_hit": pa.array(n_hit[keep].astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def boolean_search_indexed(
    index: Dataset,
    terms: list[str],
    min_match: int | None = None,
    id_col: str = "doc_id",
) -> Dataset:
    """The same boolean-retrieval contract as :func:`boolean_search`
    but over a prebuilt inverted index (``text.inverted_index`` /
    :func:`positional_index` rows: one (token, doc) posting per row,
    optionally doc-range sharded) — the plan REPEATED queries use:
    an ``is_in`` filter keeps only the query terms' posting rows
    (query-bounded read, the point of the index), then ONE hash(doc)
    exchange + a distinct-term count per doc.  Sharding is transparent:
    (token, doc) appears in exactly one doc-range shard, so postings
    arrive globally distinct."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .join import hash_bucket
    from .partitioning import adaptive_parts

    num_parts = adaptive_parts(index)
    qset = sorted({w for w in (t.lower() for t in terms) if w})
    if not qset:
        raise ValueError("empty term list")
    need = len(qset) if min_match is None else min_match
    uniq = pa.array(qset, pa.string())

    def pick(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("token"), value_set=uniq))
        t = t.select(["token", id_col])
        pids = hash_bucket(
            t.column(id_col).to_numpy(zero_copy_only=False), num_parts
        )
        return t.append_column("__part", pa.array(pids, pa.int32()))

    def count(g: pd.DataFrame) -> pd.DataFrame:
        n_hit = g.groupby(id_col, sort=False)["token"].nunique()
        keep = n_hit[n_hit >= need]
        return pd.DataFrame(
            {
                id_col: pd.Series(keep.index.to_numpy(), dtype="int64"),
                "n_hit": pd.Series(keep.to_numpy(), dtype="int64"),
            }
        )

    return (
        index.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(count, batch_format="pandas")
    )
