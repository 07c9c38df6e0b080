"""Exact set-similarity self-join via prefix filtering (the
All-Pairs / PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08):
every pair with Jaccard >= t over word-n-gram shingle sets, with NO
approximation (contrast ``minhash_lsh_pairs``, which trades recall for
bucket locality) and NO caller-supplied blocking key (contrast
``ngram_jaccard_pairs``).

The scale lever is the prefix filter: order each document's shingles by
ascending global document frequency (rarest first) and keep only the
first ``|T| - ceil(t*|T|) + 1`` as candidate-generation keys — any pair
with J >= t must share at least one PREFIX shingle, and prefix shingles
are by construction the rare ones, so the per-shingle candidate buckets
stay small where a naive inverted index would explode on stopword
shingles.

Shuffle structure (every exchange is a hash partition; nothing
corpus-sized touches the driver):

1. (doc, shingle) distinct pairs per batch (map-only),
2. shingle document frequencies   — grouped_sum,
3. df attached to each pair       — bucketed hash join on shingle,
4. per-doc prefix selection       — coarse hash(doc) partition groupby,
5. candidate pairs per prefix-shingle bucket — coarse hash(shingle)
   partition groupby + pair dedup,
6. exact verify                   — two bucketed joins attach both
   docs' full shingle lists; intersection counted per pair.

Output is EXACT-integer (n_inter, n_union) with the threshold applied
as ``n_inter * den >= num * n_union`` — no float crosses a partition
boundary, so an oracle can replay the result bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ray.data import Dataset

_NUM_PARTS = 64


def _sql_style_shingles(text: str, n: int) -> list[str]:
    """n-gram shingles over LOWER(text) split on single spaces —
    mirrors ``STRING_SPLIT(LOWER(text), ' ')`` (empty tokens from runs
    of spaces are KEPT, unlike ``str.split()``), so an independent SQL
    evaluation produces the identical set."""
    words = (text or "").lower().split(" ")
    if len(words) < n:
        return []
    return sorted({" ".join(words[i : i + n]) for i in range(len(words) - n + 1)})


def similarity_join(
    ds: Dataset,
    id_col: str,
    text_col: str = "text",
    *,
    ngram: int = 3,
    threshold_num: int = 6,
    threshold_den: int = 10,
    num_parts: int = _NUM_PARTS,
) -> Dataset:
    """All pairs with Jaccard(shingles(a), shingles(b)) >= num/den.

    Returns (id_a, id_b, n_inter, n_union) rows, id_a < id_b.
    """
    from .agg import grouped_sum
    from .join import bucketed_hash_join, hash_bucket

    t = threshold_num / threshold_den

    def shingle_pairs(b: pd.DataFrame) -> pd.DataFrame:
        ids, toks = [], []
        for i, txt in zip(b[id_col], b[text_col]):
            for s in _sql_style_shingles(txt, ngram):
                ids.append(i)
                toks.append(s)
        return pd.DataFrame({"doc": ids, "token": toks})

    tok = ds.map_batches(shingle_pairs, batch_format="pandas")

    # shingle document frequency (each doc contributes a shingle once)
    df_partial = tok.map_batches(
        lambda b: b.assign(c=np.int64(1))[["token", "c"]], batch_format="pandas"
    )
    dfreq = grouped_sum(df_partial, ["token"], ["c"], num_parts).map_batches(
        lambda b: b.rename(columns={"c": "df"}), batch_format="pandas"
    )

    with_df = bucketed_hash_join(tok, dfreq, "token")

    def prefix_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc", "df", "token"], kind="mergesort")
        out = []
        for doc, grp in g.groupby("doc", sort=False):
            n = len(grp)
            p = n - math.ceil(t * n) + 1
            pre = grp.head(p)
            out.append(
                pd.DataFrame(
                    {"token": pre.token, "doc": doc, "n": np.int64(n)}
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype=str),
                    "doc": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    prefixes = (
        with_df.map_batches(
            lambda b: b.assign(__part=hash_bucket(b.doc.to_numpy(), num_parts)),
            batch_format="pandas",
        )
        .groupby("__part")
        .map_groups(prefix_of, batch_format="pandas")
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        dup = g[g.duplicated("token", keep=False)]
        for _, sub in dup.groupby("token", sort=False):
            recs = sorted(set(zip(sub.doc, sub.n)))
            for i in range(len(recs)):
                ia, na = recs[i]
                for j in range(i + 1, len(recs)):
                    ib, nb = recs[j]
                    # size filter: J >= t forces t*max(|A|,|B|) <= min(|A|,|B|)
                    lo, hi = (na, nb) if na <= nb else (nb, na)
                    if lo * threshold_den >= threshold_num * hi:
                        a_out.append(ia)
                        b_out.append(ib)
        return pd.DataFrame(
            {
                "id_a": pd.Series(a_out, dtype="int64"),
                "id_b": pd.Series(b_out, dtype="int64"),
            }
        )

    cand = (
        prefixes.map_batches(
            lambda b: b.assign(__part=hash_bucket(b.token.to_numpy(), num_parts)),
            batch_format="pandas",
        )
        .groupby("__part")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # a pair can share several prefix shingles (possibly in different
    # buckets): exact pair dedup, same coarse pattern
    def pair_tag(b: pd.DataFrame) -> pd.DataFrame:
        key = b.id_a.astype(str) + "\x1f" + b.id_b.astype(str)
        return b.assign(__part=hash_bucket(key.to_numpy(), num_parts))

    cand = (
        cand.map_batches(pair_tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(
            lambda g: g[["id_a", "id_b"]].drop_duplicates(),
            batch_format="pandas",
        )
    )

    # per-doc full shingle lists for the verify joins.  Lists ship as a
    # \x1f-joined string column: ragged object-dtype lists are not a
    # valid Arrow block column, and shingles never contain \x1f.
    def collect_lists(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc", sort=False)["token"].agg("\x1f".join)
        return pd.DataFrame({"doc": agg.index, "tokens": agg.to_numpy()})

    doclists = (
        tok.map_batches(
            lambda b: b.assign(__part=hash_bucket(b.doc.to_numpy(), num_parts)),
            batch_format="pandas",
        )
        .groupby("__part")
        .map_groups(collect_lists, batch_format="pandas")
    )

    j1 = bucketed_hash_join(
        cand,
        doclists.map_batches(
            lambda b: b.rename(columns={"doc": "id_a", "tokens": "tokens_a"}),
            batch_format="pandas",
        ),
        "id_a",
    )
    j2 = bucketed_hash_join(
        j1,
        doclists.map_batches(
            lambda b: b.rename(columns={"doc": "id_b", "tokens": "tokens_b"}),
            batch_format="pandas",
        ),
        "id_b",
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"id_a": [], "id_b": [], "n_inter": [], "n_union": []}
        for ia, ib, ta, tb in zip(b.id_a, b.id_b, b.tokens_a, b.tokens_b):
            sa, sb = set(ta.split("\x1f")), set(tb.split("\x1f"))
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if inter * threshold_den >= threshold_num * union:
                rows["id_a"].append(ia)
                rows["id_b"].append(ib)
                rows["n_inter"].append(inter)
                rows["n_union"].append(union)
        return pd.DataFrame(
            {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
        )

    return j2.map_batches(verify, batch_format="pandas")
