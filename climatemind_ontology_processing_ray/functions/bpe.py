"""Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
2016, the classic subword algorithm behind GPT-2/RoBERTa vocabularies).

Architecture (the standard one, made distributed where the data is big):

- ``word_frequencies``: ONE distributed pass + one grouped_sum exchange
  reduces the corpus to its (word, count) table — after this, training
  never touches the corpus again.  This is also how in-memory trainers
  (subword-nmt, HuggingFace tokenizers) are structured; the corpus pass
  is the only part that scales with data size.
- ``bpe_train``: iterative merge selection over the vocabulary-sized
  word-count table.  The table is vocab-bounded (millions of rows at
  web scale — driver-feasible by construction); each round re-counts
  symbol pairs over the words that still CONTAIN mergeable pairs,
  weighted by word count.  Deterministic: ties break on the
  lexicographically smallest pair.
- ``bpe_encode``: apply a trained merge list to a Dataset.  Per batch,
  words are dictionary-encoded so each UNIQUE word is encoded once
  (the merge-replay loop is bounded by the batch's vocabulary, not its
  token count) and the subword counts scatter back to rows.

Tokenization contract: words = LOWER(text) split on single spaces with
empties dropped; symbols = the word's characters plus a final ``</w>``
end-of-word sentinel (the classic formulation, so merges can learn
suffixes without crossing word boundaries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

_EOW = "</w>"


def word_frequencies(
    ds: Dataset, text_col: str = "text", num_parts: int | None = None
) -> pd.DataFrame:
    """(word, cnt) over the corpus: per-batch value_counts (map-side
    combine) + one grouped_sum exchange.  Returns the vocab-sized table
    sorted by word (driver-side pandas — vocab-bounded by construction)."""
    from .agg import grouped_sum

    if num_parts is None:
        from .partitioning import adaptive_parts

        num_parts = adaptive_parts(ds)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.lower().str.split(" ").explode()
        toks = toks[toks.notna() & (toks != "")]
        if not len(toks):
            return pd.DataFrame(
                {"word": pd.Series([], dtype=object), "cnt": pd.Series([], dtype="int64")}
            )
        vc = toks.value_counts()
        return pd.DataFrame({"word": vc.index, "cnt": vc.to_numpy().astype("int64")})

    out = (
        grouped_sum(
            ds.map_batches(partial, batch_format="pandas"), ["word"], ["cnt"], num_parts
        )
        .to_pandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    return out


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, c in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + c
    return counts


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    ds: Dataset,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges.  One corpus pass (see
    :func:`word_frequencies`); the merge loop runs over the vocab table.
    Stops early when the best pair's weighted count drops below
    ``min_count``.  Deterministic: (count DESC, pair ASC) selection."""
    wf = word_frequencies(ds, text_col)
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in zip(wf["word"], wf["cnt"]):
        vocab[tuple(w) + (_EOW,)] = int(c)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        if counts[pair] < min_count:
            break
        merges.append(pair)
        vocab = {
            _merge_word(s, pair) if (pair[0] in s) else s: c
            for s, c in vocab.items()
        }
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    ds: Dataset,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Encode each document with a trained merge list.  The merge table
    rides in the task closure (tokenizers are KB-sized — never re-shipped
    per batch by Ray's closure capture, and tiny anyway); each batch
    encodes its UNIQUE words once and scatters.  Output:
    (id_col, n_words, n_subwords) — the compression diagnostic a
    tokenizer-fit report needs; swap the aggregation for the subword
    lists themselves when materializing encoded corpora."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.lower().str.split(" ")
        clean = [[w for w in t if w] for t in toks]
        uniq: dict[str, int] = {}
        for t in clean:
            for w in t:
                if w not in uniq:
                    uniq[w] = len(_encode_word(w, ranks))
        return pd.DataFrame(
            {
                id_col: b[id_col].astype("int64"),
                "n_words": np.array([len(t) for t in clean], dtype=np.int64),
                "n_subwords": np.array(
                    [sum(uniq[w] for w in t) for t in clean], dtype=np.int64
                ),
            }
        )

    return ds.map_batches(encode, batch_format="pandas")
