"""Classifier-based quality curation (fastText-style, made exact).

CCNet/fastText-style corpus curation trains a linear classifier on
labeled seed documents and scores every page with it.  Floating-point
logistic weights are not reproducible across BLAS builds, so this
implements the integer-exact core of the same idea — a per-token
*sign-test* ("token vote") model:

- **Train** (``token_vote_train``): one distributed pass reduces the
  corpus to per-token DISTINCT-document frequencies in the positive and
  negative class (map-side combine inside each batch, one grouped_sum
  exchange — same shuffle structure as boilerplate mining,
  `functions/quality.py:ngram_doc_frequency`).  A token votes +1 when it
  is relatively more common in positive documents
  (``pos_df * n_neg > neg_df * n_pos`` — the cross-multiplied rational
  compare, no division), -1 when relatively rarer, 0 otherwise.  The
  model is the vocab-bounded (token, vote) table — driver-feasible by
  construction, exactly like a fastText vocabulary.
- **Score** (``token_vote_score``): the model is broadcast once
  (``ray.put`` + per-worker ``cached_get``) and every document's score
  is the sum of its DISTINCT tokens' votes — a zero-shuffle streaming
  map.  ``pred = score > 0``.

At 100 TB: training's only exchange carries per-block distinct-token
partials (vocab-bounded per block), and scoring is embarrassingly
parallel with the model shipped to each worker once.

Reference anchor: generalizes the reference's static keyword heuristics
(e.g. test-node name filtering, `/root/reference/ontology_processing/
graph_creation/make_graph.py`) into a trained, corpus-derived scorer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from .broadcast import cached_get


def _distinct_tokens(texts: pd.Series) -> pd.DataFrame:
    """(row, tok) pairs, one per DISTINCT token per document.

    Tokenization contract (shared with the SQL oracles): LOWER(text)
    split on single spaces, empty tokens dropped.
    """
    ex = texts.fillna("").str.lower().str.split(" ").explode()
    frame = pd.DataFrame({"row": ex.index.to_numpy(), "tok": ex.to_numpy()})
    frame = frame[frame["tok"].notna() & (frame["tok"] != "")]
    return frame.drop_duplicates()


def token_vote_train(
    ds: Dataset,
    label_col: str,
    pos_value,
    text_col: str = "text",
) -> pd.DataFrame:
    """Train the token-vote model: returns the (tok, vote) table with
    vote in {-1, +1} (zero-vote tokens are dropped — they contribute
    nothing to any score)."""
    from .agg import grouped_sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        pairs = _distinct_tokens(b[text_col])
        pos = (b[label_col] == pos_value).to_numpy()
        pairs["pos_df"] = pos[pairs["row"].to_numpy()].astype("int64")
        pairs["neg_df"] = (1 - pairs["pos_df"]).astype("int64")
        out = pairs.groupby("tok", sort=False, as_index=False)[
            ["pos_df", "neg_df"]
        ].sum()
        # class-size partials ride along as a sentinel row ("" is never
        # a token: empty strings are dropped by the contract above)
        sent = pd.DataFrame(
            {
                "tok": [""],
                "pos_df": [int(pos.sum())],
                "neg_df": [int(len(b) - pos.sum())],
            }
        )
        return pd.concat([out, sent], ignore_index=True)

    stats = grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), ["tok"], ["pos_df", "neg_df"]
    ).to_pandas()  # vocab-bounded by construction (model-sized, not corpus-sized)

    sent = stats[stats["tok"] == ""]
    n_pos = int(sent["pos_df"].iloc[0]) if len(sent) else 0
    n_neg = int(sent["neg_df"].iloc[0]) if len(sent) else 0
    stats = stats[stats["tok"] != ""]

    lhs = stats["pos_df"].to_numpy() * n_neg
    rhs = stats["neg_df"].to_numpy() * n_pos
    vote = np.sign(lhs - rhs).astype("int64")
    model = pd.DataFrame({"tok": stats["tok"].to_numpy(), "vote": vote})
    return model[model["vote"] != 0].reset_index(drop=True)


def token_vote_score(
    ds: Dataset,
    model: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Score every document with a trained (tok, vote) model: one
    broadcast, zero shuffles.  Output: (id_col, score, pred)."""
    ref = ray.put(dict(zip(model["tok"], model["vote"])))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        votes: dict = cached_get(ref)
        b = b.reset_index(drop=True)
        pairs = _distinct_tokens(b[text_col])
        v = pairs["tok"].map(votes).fillna(0).astype("int64")
        per_row = v.groupby(pairs["row"].to_numpy()).sum()
        out = np.zeros(len(b), dtype=np.int64)
        out[per_row.index.to_numpy()] = per_row.to_numpy()
        return pd.DataFrame(
            {
                id_col: b[id_col].astype("int64"),
                "score": out,
                "pred": out > 0,
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def _all_tokens(texts: pd.Series) -> pd.DataFrame:
    """(row, tok) pairs, one per token OCCURRENCE (multiplicity kept —
    the multiclass vote weighs tokens by occurrence count).  Same
    tokenization contract as :func:`_distinct_tokens`."""
    ex = texts.fillna("").str.lower().str.split(" ").explode()
    frame = pd.DataFrame({"row": ex.index.to_numpy(), "tok": ex.to_numpy()})
    return frame[frame["tok"].notna() & (frame["tok"] != "")]


def lang_profile_train(
    ds: Dataset,
    label_col: str,
    text_col: str = "text",
) -> pd.DataFrame:
    """Multiclass Naive-Bayes-style language profiles, made exact.

    One distributed pass reduces the corpus to per-(label, token)
    occurrence counts (map-side combine per batch, one grouped_sum
    exchange — the token-vote shuffle shape, multiclass).  Each token's
    predicted label is the argmax over labels of its RELATIVE frequency
    c[l,t] / T[l]; the comparison is the cross-multiplied rational
    compare c_a * T_b > c_b * T_a evaluated in Python ints (exact at any
    corpus size — int64 would overflow at c ~ 1e6 x T ~ 1e9), ties
    broken toward the lexicographically smallest label.  The model is
    the vocab-bounded (tok, lang) table.
    """
    from .agg import grouped_sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        pairs = _all_tokens(b[text_col])
        pairs["lang"] = b[label_col].to_numpy()[pairs["row"].to_numpy()]
        out = pairs.groupby(["lang", "tok"], sort=False).size().reset_index(name="c")
        out["c"] = out["c"].astype("int64")
        return out

    stats = grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), ["lang", "tok"], ["c"]
    ).to_pandas()  # bounded by n_labels x vocab — model-sized

    grid = (
        stats.pivot_table(index="tok", columns="lang", values="c", fill_value=0)
        .astype("int64")
        .sort_index(axis=1)
    )
    langs = list(grid.columns)
    totals = {l: int(grid[l].sum()) for l in langs}
    # exact argmax sweep: labels ascending, strict > replaces — ties keep
    # the smaller label.  Object-int arrays: vocab-bounded driver work.
    best = np.full(len(grid), langs[0], dtype=object)
    best_c = grid[langs[0]].to_numpy().astype(object)
    best_t = np.full(len(grid), totals[langs[0]], dtype=object)
    for l in langs[1:]:
        c = grid[l].to_numpy().astype(object)
        better = (c * best_t) > (best_c * np.asarray(totals[l], dtype=object))
        best[better] = l
        best_c[better] = c[better]
        best_t[better] = totals[l]
    return pd.DataFrame({"tok": grid.index.to_numpy(), "lang": best.astype(str)})


def lang_profile_score(
    ds: Dataset,
    model: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> Dataset:
    """Predict a label per document with a trained (tok, lang) profile:
    one broadcast, zero shuffles.  Each token occurrence votes for its
    profile label; the document's prediction is the majority vote, ties
    toward the lexicographically smallest label.  Documents with no
    model-covered tokens are omitted (inner-join semantics, matching
    the SQL oracle).  Output: (id_col, pred_lang, *keep_cols)."""
    ref = ray.put(dict(zip(model["tok"], model["lang"])))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        profile: dict = cached_get(ref)
        b = b.reset_index(drop=True)
        pairs = _all_tokens(b[text_col])
        pairs["lang"] = pairs["tok"].map(profile)
        pairs = pairs[pairs["lang"].notna()]
        votes = (
            pairs.groupby(["row", "lang"], sort=False).size().reset_index(name="n")
        )
        top = votes.sort_values(
            ["row", "n", "lang"], ascending=[True, False, True]
        ).drop_duplicates("row")
        rows = top["row"].to_numpy()
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[rows],
                "pred_lang": top["lang"].to_numpy(),
            }
        )
        for col in keep_cols:
            out[col] = b[col].to_numpy()[rows]
        return out

    return ds.map_batches(score, batch_format="pandas")


def hashed_features(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 32,
):
    """Feature hashing (the Weinberger et al. 2009 'hashing trick'):
    each token occurrence lands in bucket ``md5_u64(tok) % dim`` with a
    sign drawn from an INDEPENDENT hash bit (bit 33), and a document's
    feature vector is the signed occurrence count per bucket — the
    fixed-width, vocabulary-free featurization linear classifiers train
    on at corpus scale.

    Output is long-form ``(id, bucket, weight)`` over TOUCHED buckets
    (zero-sum collisions kept: both sides of the oracle group the same
    rows).  Shape: per-batch explode + one md5 pass + per-batch
    (id, bucket) pre-combine, then one grouped-sum exchange whose key
    count is bounded by rows × dim — never by vocabulary."""
    from .agg import grouped_sum
    from .md5vec import md5_u64_any

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        ex = b[text_col].fillna("").str.lower().str.split(" ").explode()
        toks = ex.to_numpy()
        rows = ex.index.to_numpy()
        keep = pd.notna(toks) & (toks != "")
        toks, rows = toks[keep], rows[keep]
        if not len(toks):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="int64"),
                    "weight": pd.Series([], dtype="int64"),
                }
            )
        # tokens repeat corpus-wide: md5 once per UNIQUE token
        # (dictionary encode + scatter — md5vec.md5_u64_any)
        h = md5_u64_any(toks)
        bucket = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(33)) & np.uint64(1), -1, 1).astype(np.int64)
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[rows],
                "bucket": bucket,
                "weight": sign,
            }
        )
        out = (
            out.groupby([id_col, "bucket"], sort=False)["weight"]
            .sum()
            .reset_index()
        )
        out[id_col] = out[id_col].astype("int64")
        out["weight"] = out["weight"].astype("int64")
        return out

    return grouped_sum(
        ds.map_batches(partial, batch_format="pandas"),
        [id_col, "bucket"],
        ["weight"],
    )
