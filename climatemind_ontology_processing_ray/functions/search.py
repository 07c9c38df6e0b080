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
