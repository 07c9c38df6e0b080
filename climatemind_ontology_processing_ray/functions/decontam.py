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


def embedding_decontam(
    corpus: Dataset,
    eval_ds: Dataset,
    id_col: str,
    vec_col: str,
    quant: int,
    threshold: int,
) -> Dataset:
    """Embedding-space decontamination: flag corpus rows whose maximum
    integer-quantized dot product against ANY eval-set embedding reaches
    ``threshold`` (in quant^2 units).  The semantic companion to the
    n-gram ``decontaminate`` above — catches paraphrased eval leakage
    that exact n-grams miss (the modern eval-hygiene pass).

    Same broadcast shape as the n-gram variant: eval sets are SMALL by
    construction, so the eval matrix ships once via ``ray.put`` (numpy,
    plasma zero-copy) and the corpus streams through one vectorized
    ``map_batches`` — no shuffle, no corpus materialization.

    Quantization is ``floor(x * quant + 0.5)`` per coordinate (the
    engine's SQL-exact convention, see functions/ann.py), so every dot
    is an exact int64 and the DuckDB oracle reproduces it bit-for-bit.

    Output: (id_col, max_dot, n_hits) for flagged rows only.
    """
    import numpy as np

    edf = eval_ds.to_pandas()
    E = np.floor(
        np.stack(edf[vec_col].to_numpy()).astype(np.float64) * quant + 0.5
    ).astype(np.int64)
    ref = ray.put(np.ascontiguousarray(E.T))

    from .broadcast import cached_get

    def score(batch: pa.Table) -> pa.Table:
        et = cached_get(ref)
        col = batch.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if hasattr(col, "values"):  # list<float> from parquet: flat buffer
            x = np.asarray(col.values, dtype=np.float64).reshape(len(batch), -1)
        else:  # Ray tensor-extension array (from_pandas ndarray cells)
            x = np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.float64)
        v = np.floor(x * quant + 0.5).astype(np.int64)
        dots = v @ et  # exact int64 (|coords| <= quant, d*quant^2 << 2^63)
        mx = dots.max(axis=1)
        hits = (dots >= threshold).sum(axis=1).astype(np.int64)
        keep = mx >= threshold
        ids = np.asarray(batch.column(id_col))[keep]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "max_dot": pa.array(mx[keep], pa.int64()),
                "n_hits": pa.array(hits[keep], pa.int64()),
            }
        )

    return corpus.map_batches(score, batch_format="pyarrow")
