"""DSIR — Data Selection with Importance Resampling (Xie et al., 2023,
arXiv:2302.03169), the hashed-n-gram importance-weight flavor.

Given a raw web corpus and a small TARGET domain (here: a source label,
in production a curated high-quality slice), estimate per-document
importance weights ``w(d) ∝ p_target(d) / p_raw(d)`` under a bag-of-
hashed-n-grams model, then resample the corpus by weight.  This module
computes the weights; resampling composes with ``functions/sample.py``'s
``weighted_sample``.

Exact-integer formulation (so the DuckDB oracle reproduces it bit-for-
bit — no float log-likelihood crosses an engine boundary): token
buckets are ``md5_u64(token) % B`` (the engine's SQL-pinned vectorized
hash, functions/md5vec.py), and a document's weight is

    sum over its token OCCURRENCES of  (tgt[bucket] * SCALE) // raw[bucket]

where ``tgt``/``raw`` are corpus-wide bucket occurrence counts on the
target slice / whole corpus.  The ratio is the hashed-bigram likelihood
ratio of DSIR with the log dropped and integer floor division — rank-
equivalent for resampling, exactly reproducible.

Scale shape (two streaming passes, no shuffle of the corpus):

1. Count pass: per-batch ``bincount`` partials over B buckets (B-bounded
   rows per batch), ONE ``grouped_sum`` exchange over the B bucket ids.
   B is a constant (default 4096), so the reduced table is tiny at any
   corpus size.
2. The (raw, tgt) count vectors broadcast as ONE numpy array (plasma
   zero-copy, ``broadcast.cached_get``), and the score pass is a single
   vectorized ``map_batches`` over the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
from ray.data import Dataset

from .broadcast import cached_get
from .md5vec import md5_u64

DEFAULT_BUCKETS = 4096
DEFAULT_SCALE = 1_000_000


def _tokens(b: pd.DataFrame, text_col: str):
    """LOWER(text) split on single spaces, empties kept — mirrors SQL
    ``UNNEST(STRING_SPLIT(LOWER(text), ' '))`` exactly."""
    toks = b[text_col].fillna("").str.lower().str.split(" ")
    n_tok = toks.str.len().to_numpy(dtype=np.int64)
    flat = toks.explode().to_numpy(dtype=object)
    return flat, n_tok


def dsir_weights(
    ds: Dataset,
    id_col: str,
    text_col: str,
    target_col: str,
    target_value: str,
    buckets: int = DEFAULT_BUCKETS,
    scale: int = DEFAULT_SCALE,
) -> Dataset:
    """(id_col, dsir_weight int64) importance weights of every document
    against the target slice ``target_col == target_value``."""
    from .agg import grouped_sum

    _EMPTY_COUNTS = pd.DataFrame(
        {
            "bk": pd.Series([], dtype="int64"),
            "raw_n": pd.Series([], dtype="int64"),
            "tgt_n": pd.Series([], dtype="int64"),
        }
    )

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):  # empty object arrays would fail md5_u64's cast
            return _EMPTY_COUNTS
        flat, n_tok = _tokens(b, text_col)
        bk = (md5_u64(flat) % np.uint64(buckets)).astype(np.int64)
        is_tgt = np.repeat(
            (b[target_col] == target_value).to_numpy(), n_tok
        )
        raw = np.bincount(bk, minlength=buckets)
        tgt = np.bincount(bk[is_tgt], minlength=buckets)
        nz = np.flatnonzero(raw)
        return pd.DataFrame(
            {
                "bk": nz.astype("int64"),
                "raw_n": raw[nz].astype("int64"),
                "tgt_n": tgt[nz].astype("int64"),
            }
        )

    counts = grouped_sum(
        ds.map_batches(count_partial, batch_format="pandas"),
        ["bk"],
        ["raw_n", "tgt_n"],
    ).to_pandas()

    raw = np.zeros(buckets, dtype=np.int64)
    tgt = np.zeros(buckets, dtype=np.int64)
    if len(counts):
        raw[counts["bk"].to_numpy()] = counts["raw_n"].to_numpy()
        tgt[counts["bk"].to_numpy()] = counts["tgt_n"].to_numpy()
    # every token in the score pass was counted in the count pass, so
    # raw[bucket] >= 1 wherever it is read — no epsilon smoothing needed
    # for the ratio to be defined (DSIR's +epsilon smooths UNSEEN target
    # grams, which integer floor-division already maps to 0).
    ref = ray.put(np.stack([raw, tgt]))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        cnts = cached_get(ref)
        flat, n_tok = _tokens(b, text_col)
        bk = (md5_u64(flat) % np.uint64(buckets)).astype(np.int64)
        contrib = (cnts[1][bk] * scale) // cnts[0][bk]
        row = np.repeat(np.arange(len(b), dtype=np.int64), n_tok)
        # exact int64 accumulation (bincount's float weights are exact
        # only below 2^53 — true here, but keep the engine int-pure)
        sums = np.zeros(len(b), dtype=np.int64)
        np.add.at(sums, row, contrib)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "dsir_weight": sums,
            }
        )

    return ds.map_batches(score, batch_format="pandas")
