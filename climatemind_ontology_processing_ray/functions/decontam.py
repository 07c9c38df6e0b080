"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation/benchmark set.

The standard pre-training hygiene step (PaLM/GPT-3-style n-gram overlap
decontamination): the benchmark side is SMALL by construction (eval sets
are thousands of documents, not billions), so the scale-correct shape is
a broadcast-set membership test — build the benchmark's distinct n-gram
set once, ``ray.put`` it, and stream the corpus through a vectorized
``map_batches`` membership check.  No shuffle touches the corpus.

If the "benchmark" side ever became corpus-sized, the fallback is the
inverted-index join used by ``duplicate_spans`` (hash-partition both
sides on the n-gram); documented here, not needed for the operator's
actual use case.

N-grams are lowercase word n-grams (single-space join), distinct per
document; ``n_hits`` counts the DISTINCT contaminated n-grams of a doc,
which keeps the SQL oracle a plain join + COUNT(DISTINCT).
"""

from __future__ import annotations

import pyarrow as pa

import ray
from ray.data import Dataset


def _doc_ngrams(text: str, n: int) -> set[str]:
    w = text.lower().split(" ")
    if len(w) < n:
        return set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def benchmark_ngrams(bench: Dataset, text_col: str, n: int) -> "ray.ObjectRef":
    """Distinct n-gram set of the benchmark side, built distributed
    (per-batch sets, driver union — the collected rows are per-batch
    DISTINCT sets, small for any real eval set) and broadcast once."""

    def partial(batch: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for t in batch.column(text_col).to_pylist():
            grams |= _doc_ngrams(t or "", n)
        return pa.table({"g": pa.array(sorted(grams), pa.string())})

    out = frozenset(
        bench.map_batches(partial, batch_format="pyarrow").to_pandas()["g"]
    )
    return ray.put(out)


def decontaminate(
    corpus: Dataset,
    bench_ref: "ray.ObjectRef",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
) -> Dataset:
    """(id, n_hits) for corpus docs whose distinct n-gram overlap with
    the broadcast benchmark set reaches ``min_hits``.  Downstream either
    drops these ids (anti join) or routes them for review."""

    def check(batch: pa.Table) -> pa.Table:
        bench: frozenset = ray.get(bench_ref)
        ids, hits = [], []
        id_vals = batch.column(id_col).to_pylist()
        for i, t in zip(id_vals, batch.column(text_col).to_pylist()):
            c = len(_doc_ngrams(t or "", n) & bench)
            if c >= min_hits:
                ids.append(i)
                hits.append(c)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
            }
        )

    return corpus.map_batches(check, batch_format="pyarrow")
