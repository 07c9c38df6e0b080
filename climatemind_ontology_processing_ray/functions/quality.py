"""Corpus-level quality / repetition operators for training-data curation
(C4 / Gopher-style rules adapted to the evaluation corpus' single-line
documents; the reference has no corpus-quality stage — SURVEY §2.10).

All operators follow the engine's shuffle discipline:

- repetition stats are PER-DOC vectorized map_batches (no shuffle);
- n-gram document frequency pre-aggregates per batch (distinct grams per
  doc, then per-batch partial counts) before ONE hash-partition groupby —
  the gram vocabulary shuffles once, rows = distinct (gram, batch) pairs;
- boilerplate removal broadcasts the (small: df >= min_docs) frequent-gram
  set with ``ray.put`` and rewrites docs in a stateless map.

Determinism: ratios are exact rationals rounded half-away-from-zero to 4
decimals so the DuckDB oracles hash-match.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

_NUM_PARTS = 64


def _gram_part(values) -> "np.ndarray":
    # vectorized fixed-key partition ids (was a per-row crc32 loop)
    from .join import hash_bucket

    return hash_bucket(values, _NUM_PARTS).astype(np.int64)


def _round4(x: float) -> float:
    return float(np.sign(x) * np.floor(abs(x) * 10_000 + 0.5) / 10_000)


def repetition_stats(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_top_bigram_frac: float = 0.18,
    min_unique_word_ratio: float = 0.3,
) -> Dataset:
    """Per-document repetition metrics + Gopher-style keep flag.

    Output: id, n_words, unique_word_ratio, top_bigram_frac,
    mean_word_len (all float rounded to 4dp), keep (bool).

    ``top_bigram_frac`` is the count of the most frequent word bigram over
    total bigrams (the Gopher "top 2-gram fraction" rule); docs dominated
    by one repeated phrase are dropped.  Stateless vectorized map — no
    shuffle.
    """

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        out = {
            "id": [],
            "n_words": [],
            "unique_word_ratio": [],
            "top_bigram_frac": [],
            "mean_word_len": [],
            "keep": [],
        }
        for i, t in zip(batch[id_col], batch[text_col]):
            words = (t or "").split()
            n = len(words)
            uniq = len(set(words)) / n if n else 0.0
            if n >= 2:
                bigrams = Counter(zip(words, words[1:]))
                top_frac = max(bigrams.values()) / (n - 1)
            else:
                top_frac = 0.0
            mwl = sum(len(w) for w in words) / n if n else 0.0
            out["id"].append(i)
            out["n_words"].append(n)
            out["unique_word_ratio"].append(_round4(uniq))
            out["top_bigram_frac"].append(_round4(top_frac))
            out["mean_word_len"].append(_round4(mwl))
            out["keep"].append(
                bool(
                    n > 0
                    and top_frac <= max_top_bigram_frac
                    and uniq >= min_unique_word_ratio
                )
            )
        df = pd.DataFrame(out)
        df["n_words"] = df["n_words"].astype("int64")
        return df

    return ds.map_batches(stats, batch_format="pandas")


def ngram_doc_frequency(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    min_docs: int = 2,
) -> Dataset:
    """Boilerplate mining: word n-grams by DISTINCT-document frequency.

    Output: gram (string), df (int64) for grams present in >= min_docs
    distinct docs.  Shuffle structure: per batch, each doc contributes
    each distinct gram once, then a per-batch partial count collapses
    duplicate grams (map-side combine) — the single groupby exchange
    carries at most (#blocks x #distinct grams per block) rows.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts: Counter = Counter()
        for t in batch[text_col]:
            words = (t or "").split()
            grams = {
                " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
            }
            counts.update(grams)
        if not counts:
            return pd.DataFrame(
                {"gram": [], "partial_df": pd.Series([], dtype="int64"), "__part": []}
            )
        df = pd.DataFrame(
            {"gram": list(counts.keys()), "partial_df": list(counts.values())}
        )
        from .join import hash_bucket

        df["partial_df"] = df["partial_df"].astype("int64")
        df["__part"] = hash_bucket(df["gram"], _NUM_PARTS).astype(np.int64)
        return df

    def reduce_partition(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("gram", sort=False, as_index=False)["partial_df"].sum()
        out = out.rename(columns={"partial_df": "df"})
        out = out[out["df"] >= min_docs]
        out["df"] = out["df"].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__part")
        .map_groups(reduce_partition, batch_format="pandas")
    )


def remove_boilerplate(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    min_docs: int = 10,
) -> Dataset:
    """Rewrite documents dropping every word position covered by a
    frequent n-gram (doc frequency >= min_docs): the C4 "remove
    boilerplate lines" rule at n-gram granularity.

    The frequent-gram set is corpus-mined by :func:`ngram_doc_frequency`
    (small by construction at a high ``min_docs``) and broadcast once;
    the rewrite is a stateless map.  Output: id, text (cleaned),
    n_boiler_grams (int64 — gram OCCURRENCES removed, counting repeats).
    """
    fdf = ngram_doc_frequency(ds, id_col, text_col, n=n, min_docs=min_docs).to_pandas()
    # a fully-filtered result concatenates to a columnless empty frame
    frequent = set(fdf["gram"]) if "gram" in fdf.columns else set()
    ref = ray.put(frequent)

    def rewrite(batch: pd.DataFrame) -> pd.DataFrame:
        grams = ray.get(ref)
        out_id, out_text, out_n = [], [], []
        for i, t in zip(batch[id_col], batch[text_col]):
            words = (t or "").split()
            drop = np.zeros(len(words), dtype=bool)
            hits = 0
            for s in range(len(words) - n + 1):
                if " ".join(words[s : s + n]) in grams:
                    drop[s : s + n] = True
                    hits += 1
            out_id.append(i)
            out_text.append(" ".join(w for w, d in zip(words, drop) if not d))
            out_n.append(hits)
        df = pd.DataFrame({"id": out_id, "text": out_text, "n_boiler_grams": out_n})
        df["n_boiler_grams"] = df["n_boiler_grams"].astype("int64")
        return df

    return ds.map_batches(rewrite, batch_format="pandas")


def domain_stats(
    ds: Dataset,
    domain_col: str = "source",
    text_col: str = "text",
) -> Dataset:
    """Per-domain curation aggregates: document count, total words, mean
    doc length (words, 4dp), distinct languages.  Map-side combine then
    one small groupby — the curation dashboard a crawl pipeline runs
    before sampling decisions.
    Output: domain, n_docs, total_words, mean_words, n_langs.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(__w=[len((t or "").split()) for t in batch[text_col]])
        g = b.groupby(domain_col, sort=False).agg(
            n_docs=(domain_col, "size"),
            total_words=("__w", "sum"),
            langs=("lang", lambda s: sorted(set(s))),
        )
        return g.reset_index()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        langs: set = set()
        for lst in g["langs"]:
            langs.update(lst)
        n_docs = int(g["n_docs"].sum())
        total = int(g["total_words"].sum())
        return pd.DataFrame(
            {
                "domain": [g[domain_col].iloc[0]],
                "n_docs": pd.Series([n_docs], dtype="int64"),
                "total_words": pd.Series([total], dtype="int64"),
                "mean_words": [_round4(total / n_docs)],
                "n_langs": pd.Series([len(langs)], dtype="int64"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(domain_col)
        .map_groups(merge, batch_format="pandas")
    )


def duplicate_spans(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    L: int = 5,
    min_docs: int = 2,
) -> Dataset:
    """Substring-level exact dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", adapted to word granularity):
    maximal word spans covered by L-grams that occur in >= min_docs
    DISTINCT documents.

    Output: id, span_start, span_end (word indices, [start, end)) — one
    row per maximal duplicated span, computed by merging overlapping
    [p, p+L) windows of cross-document L-grams (gaps-and-islands).

    Shuffle structure: the frequent-gram table comes from
    :func:`ngram_doc_frequency` (ONE groupby).  Position rows join against
    it by gram hash — at corpus scale this is a second hash-partition
    groupby; the per-doc island merge is the final doc-hash groupby with
    vectorized merging inside partitions.
    """
    freq = ngram_doc_frequency(ds, id_col, text_col, n=L, min_docs=min_docs)

    def freq_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "jkey": b["gram"],
                "id": -1,
                "pos": -1,
                "is_freq": True,
                "__part": _gram_part(b["gram"]),
            }
        )

    def pos_rows(b: pd.DataFrame) -> pd.DataFrame:
        out_g, out_id, out_p = [], [], []
        for i, t in zip(b[id_col], b[text_col]):
            words = (t or "").split()
            for p in range(len(words) - L + 1):
                out_g.append(" ".join(words[p : p + L]))
                out_id.append(i)
                out_p.append(p)
        return pd.DataFrame(
            {
                "jkey": out_g,
                "id": out_id,
                "pos": out_p,
                "is_freq": False,
                "__part": _gram_part(out_g),
            }
        )

    def filter_hits(g: pd.DataFrame) -> pd.DataFrame:
        freq_set = set(g.loc[g["is_freq"].to_numpy(), "jkey"])
        hits = g[~g["is_freq"].to_numpy() & g["jkey"].isin(freq_set)]
        out = hits[["id", "pos"]].copy()
        out["__dpart"] = _gram_part(out["id"])
        return out

    def merge_islands(g: pd.DataFrame) -> pd.DataFrame:
        out_id, out_s, out_e = [], [], []
        for i, sub in g.groupby("id", sort=False):
            positions = np.sort(sub["pos"].to_numpy())
            start = prev = int(positions[0])
            for p in positions[1:]:
                p = int(p)
                if p <= prev + L:  # windows [prev,prev+L) and [p,p+L) touch
                    prev = p
                else:
                    out_id.append(i)
                    out_s.append(start)
                    out_e.append(prev + L)
                    start = prev = p
            out_id.append(i)
            out_s.append(start)
            out_e.append(prev + L)
        df = pd.DataFrame({"id": out_id, "span_start": out_s, "span_end": out_e})
        df["span_start"] = df["span_start"].astype("int64")
        df["span_end"] = df["span_end"].astype("int64")
        return df

    joined = freq.map_batches(freq_rows, batch_format="pandas").union(
        ds.map_batches(pos_rows, batch_format="pandas")
    )
    hits = joined.groupby("__part").map_groups(filter_hits, batch_format="pandas")
    return hits.groupby("__dpart").map_groups(merge_islands, batch_format="pandas")


def ngram_novelty(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
) -> Dataset:
    """Per-document n-gram novelty: how much of a doc is FIRST-SEEN here.

    For each document: ``n_grams`` = its count of distinct word n-grams,
    ``n_novel`` = how many of those have their corpus-wide first
    occurrence (minimum ``id_col``) in this document.  The per-doc novel
    fraction is the classic curriculum/streaming-dedup signal (a doc
    whose grams all appeared earlier is near-duplicate filler; cf. the
    substring-dedup span operator above, which finds the spans — this
    scores the docs).

    Shuffle structure: ``n_grams`` is an exact zero-shuffle per-row map
    (a doc's distinct grams are local to its row).  First-occurrence
    needs ONE exchange: per-batch (gram, min doc) partials hash-partition
    by gram (map-side combine keeps rows at distinct-grams-per-block),
    then per-partition first-doc counts flow through a doc-keyed
    grouped_sum (partial counts, corpus-doc-sized — still streaming).
    The novel counts join back to the base via the outer-safe bucketed
    hash join.  Tokenization contract: LOWER(text) split on single
    spaces, empties dropped (shared with the SQL oracle).
    """
    from .agg import grouped_min, grouped_sum
    from .join import bucketed_hash_join

    def doc_grams(t) -> set:
        words = [w for w in (t or "").lower().split(" ") if w]
        return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}

    def base(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: b[id_col].astype("int64"),
                "n_grams": [len(doc_grams(t)) for t in b[text_col]],
            }
        ).astype({"n_grams": "int64"})

    def gram_partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        gs: dict[str, int] = {}
        for i, t in zip(ids, b[text_col]):
            for g in doc_grams(t):
                prev = gs.get(g)
                if prev is None or i < prev:
                    gs[g] = i
        return pd.DataFrame(
            {"gram": list(gs.keys()), "first_doc": list(gs.values())}
        ).astype({"first_doc": "int64"})

    firsts = grouped_min(
        ds.map_batches(gram_partial, batch_format="pandas"), ["gram"], ["first_doc"]
    )

    def novel_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["first_doc"].value_counts()
        return pd.DataFrame(
            {id_col: vc.index.astype("int64"), "n_novel": vc.to_numpy().astype("int64")}
        )

    novel = grouped_sum(
        firsts.map_batches(novel_partial, batch_format="pandas"), [id_col], ["n_novel"]
    )

    joined = bucketed_hash_join(
        ds.map_batches(base, batch_format="pandas"), novel, id_col, join_type="left outer"
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: b[id_col].astype("int64"),
                "n_grams": b["n_grams"].fillna(0).astype("int64"),
                "n_novel": b["n_novel"].fillna(0).astype("int64"),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")
