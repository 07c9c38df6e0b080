"""Similarity search over an embedding column (list<float>).

- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query matrix with ``ray.put``; each batch does one numpy matmul and
  emits its local top-k; a final ontology-sized groupby merges per-query.
  This is the correctness baseline.
- :func:`lsh_topk` — the scale path: random-hyperplane signatures bucket
  the corpus; only buckets matching a query's signature (within 1 bit
  flip) are scored exactly.  Approximate; recall grows with ``num_planes``
  and the probe radius.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    ds: Dataset,
    queries: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> Dataset:
    """Exact cosine top-k per query row.

    Output: query_id (int32), vec_id, cosine — exactly k rows per query
    (ties broken by smaller vec_id, so results are deterministic).
    """
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        vecs = _normalize(
            np.asarray([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        )
        sims = qm @ vecs.T  # (Q, batch)
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            # partial select then deterministic (score desc, id asc) order
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            for j in idx:
                out_q.append(qi)
                out_id.append(ids[j])
                out_s.append(sims[qi, j])
        return pd.DataFrame(
            {
                "query_id": np.array(out_q, dtype=np.int32),
                id_col: out_id,
                "cosine": out_s,
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return (
        ds.map_batches(local_topk, batch_format="pandas", batch_size=4096)
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def train_ivf_centroids(
    sample: np.ndarray, n_centroids: int = 16, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic mini k-means on a (driver-side) sample — the IVF
    coarse quantizer.  At real scale the sample comes from
    ``ds.random_sample(frac, seed)``; training stays driver-side (small)."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(
    ds: Dataset,
    queries: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    train_sample_size: int = 4096,
) -> Dataset:
    """IVF approximate top-k: corpus vectors are assigned to their nearest
    centroid (one pass, no shuffle — the assignment is a column); each
    query scores only vectors in its ``nprobe`` closest centroid buckets.
    Scale path: broadcast is just the (n_centroids x dim) matrix; per-batch
    work is a small matmul + mask.  Output schema matches brute_force_topk.
    """
    # unbiased deterministic training sample: content-addressed md5 filter
    # over ids (a ``limit(N)`` prefix is biased when the corpus is ordered);
    # the fraction is sized from the dataset row count, with a floor so tiny
    # corpora still train.
    from .sample import deterministic_sample

    n_rows = ds.count()
    frac = min(1.0, train_sample_size / max(n_rows, 1))
    sample_df = (
        deterministic_sample(ds.select_columns([id_col, vec_col]), id_col, frac)
        .limit(train_sample_size)
        .to_pandas()
    )
    if len(sample_df) < min(n_centroids, n_rows):
        # degenerate fraction (rounding on tiny inputs): fall back to prefix
        sample_df = ds.select_columns([id_col, vec_col]).limit(train_sample_size).to_pandas()
    sample = np.asarray([np.asarray(v, dtype=np.float64) for v in sample_df[vec_col]])
    cents = train_ivf_centroids(sample, n_centroids, seed=seed)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    # the nprobe closest centroids per query
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    ctx_ref = ray.put((q, cents, [set(map(int, p)) for p in probe]))

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        qm, cm, probes = ray.get(ctx_ref)
        vecs = _normalize(
            np.asarray([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        )
        assign = np.argmax(vecs @ cm.T, axis=1)
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.fromiter((int(a) in probes[qi] for a in assign), bool, len(assign))
            if not mask.any():
                continue
            sims = qm[qi] @ vecs[mask].T
            cids = ids[mask]
            kk = min(k, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            for j in idx:
                out_q.append(qi)
                out_id.append(cids[j])
                out_s.append(sims[j])
        return pd.DataFrame(
            {
                "query_id": np.array(out_q, dtype=np.int32),
                id_col: out_id,
                "cosine": out_s,
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return (
        ds.map_batches(local, batch_format="pandas", batch_size=4096)
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def _signatures(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0  # (n, planes)
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    return bits.astype(np.int64) @ weights


def lsh_topk(
    ds: Dataset,
    queries: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 8,
    seed: int = 42,
) -> Dataset:
    """Approximate cosine top-k: score only vectors whose hyperplane
    signature is within hamming distance 1 of the query's.
    Output schema matches brute_force_topk (<=k rows per query)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    dim = q.shape[1]
    planes = np.random.RandomState(seed).randn(num_planes, dim)
    q_sigs = _signatures(q, planes)
    probe: list[set[int]] = [
        {int(s)} | {int(s) ^ (1 << b) for b in range(num_planes)} for s in q_sigs
    ]
    ctx_ref = ray.put((q, planes, probe))

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        qm, pl, pr = ray.get(ctx_ref)
        vecs = _normalize(
            np.asarray([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        )
        sigs = _signatures(vecs, pl)
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.fromiter((int(s) in pr[qi] for s in sigs), bool, len(sigs))
            if not mask.any():
                continue
            sims = qm[qi] @ vecs[mask].T
            cids = ids[mask]
            kk = min(k, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            for j in idx:
                out_q.append(qi)
                out_id.append(cids[j])
                out_s.append(sims[j])
        return pd.DataFrame(
            {
                "query_id": np.array(out_q, dtype=np.int32),
                id_col: out_id,
                "cosine": out_s,
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return (
        ds.map_batches(local, batch_format="pandas", batch_size=4096)
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def knn_graph(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    k: int = 5,
    quant: int = 32768,
    num_parts: int = 64,
) -> Dataset:
    """Exact k-nearest-neighbor GRAPH over an embedding column, blocked
    by ``block_col`` — every vector gets its k most-similar neighbors
    within its block (the IVF discipline: at open scale ``block_col`` is
    the IVF cell from ``cluster.kmeans_assign``; here the corpus ships a
    label column).  This is the dataset-curation primitive behind
    SemDeDup-style pruning and kNN-classifier noise scoring.

    Similarity is the exact INTEGER dot product of ``floor(x*quant+0.5)``
    quantized vectors (multiplying by a power of two is float-exact, the
    dot stays < 2^52 for unit-range embeddings at quant=2^15), computed
    via float64 BLAS — bit-identical to the SQL oracle's BIGINT
    arithmetic at any parallelism; no float score ever crosses an engine
    or partition boundary.  Ties break on ascending neighbor id.

    One hash(block) exchange; within a partition each block runs a
    strip-chunked matmul (1024-row strips — never an m x m allocation
    beyond the strip).  Output: (id_col, neighbor_id, dot, nn_rank),
    k rows per vector (fewer in blocks smaller than k+1).
    """
    from .cluster import _batch_matrix
    from .join import hash_bucket

    def tag(batch: pa.Table) -> pa.Table:
        pids = hash_bucket(
            batch.column(block_col).to_numpy(zero_copy_only=False), num_parts
        )
        return batch.append_column("__part", pa.array(pids, pa.int32()))

    def block_knn(g: pd.DataFrame) -> pd.DataFrame:
        out_id, out_nb, out_dot, out_rank = [], [], [], []
        for _, sub in g.groupby(block_col, sort=False):
            ids = sub[id_col].to_numpy()
            tbl = pa.Table.from_pandas(sub[[vec_col]], preserve_index=False)
            q = _batch_matrix(tbl, vec_col, quant).astype(np.float64)
            m = len(ids)
            if m < 2:
                continue
            order_ids = np.argsort(ids, kind="mergesort")
            ids_s, q_s = ids[order_ids], q[order_ids]
            kk = min(k, m - 1)
            for s in range(0, m, 1024):
                strip = q_s[s : s + 1024]
                dots = strip @ q_s.T  # exact ints in fp64 (< 2^52)
                rows = np.arange(len(strip))
                dots[rows, s + rows] = -np.inf  # exclude self
                # ids_s ascending => STABLE argsort on -dots breaks ties
                # toward the smaller neighbor id (whole strip at once)
                top = np.argsort(-dots, axis=1, kind="stable")[:, :kk]
                out_id.append(np.repeat(ids_s[s : s + len(strip)], kk))
                out_nb.append(ids_s[top].ravel())
                out_dot.append(
                    np.take_along_axis(dots, top, axis=1).ravel().astype(np.int64)
                )
                out_rank.append(np.tile(np.arange(1, kk + 1), len(strip)))
        if not out_id:
            return pd.DataFrame(
                {
                    id_col: np.array([], dtype=np.int64),
                    "neighbor_id": np.array([], dtype=np.int64),
                    "dot": np.array([], dtype=np.int64),
                    "nn_rank": np.array([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                id_col: np.concatenate(out_id),
                "neighbor_id": np.concatenate(out_nb),
                "dot": np.concatenate(out_dot),
                "nn_rank": np.concatenate(out_rank).astype(np.int64),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(block_knn, batch_format="pandas")
    )


def radius_search(
    ds: Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    tau: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 32768,
) -> Dataset:
    """Range (radius) similarity search: ALL vectors whose exact integer
    quantized dot with a query is >= ``tau`` — the epsilon-neighborhood
    companion to :func:`brute_force_topk`'s top-k (retrieval recall sweeps,
    near-duplicate audits, "everything above this similarity floor").

    ``queries`` is a small (Q, d) float matrix broadcast ONCE via
    ``ray.put`` (never re-shipped per batch); each batch runs one
    (Q, batch) float64 BLAS matmul over ``floor(x*quant+0.5)`` integer
    components (exact < 2^52, SQL-BIGINT-identical) and emits only the
    >= tau survivors.  No shuffle at all — a pure streaming filter whose
    output is threshold-bounded, so it composes with any downstream stage
    at 100-TB inputs.

    Output: (query_id, id_col, dot int64).
    """
    from .broadcast import cached_get
    from .cluster import _batch_matrix, quantize

    qm = quantize(np.asarray(queries, dtype=np.float64), quant).astype(np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)
    q_ref = ray.put((qm, qids))

    def scan(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "dot": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        qmat, qid = cached_get(q_ref)
        v = _batch_matrix(batch, vec_col, quant).astype(np.float64)
        dots = qmat @ v.T  # (Q, batch), exact ints in fp64
        qi, vi = np.nonzero(dots >= tau)
        if not len(qi):
            return empty
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "query_id": pa.array(qid[qi], pa.int64()),
                id_col: pa.array(ids[vi].astype(np.int64), pa.int64()),
                "dot": pa.array(dots[qi, vi].astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


def dense_topk_int(
    ds: Dataset,
    query,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    quant: int = 32768,
) -> pd.DataFrame:
    """Exact dense top-k for ONE query vector under the integer-quantized
    dot (same arithmetic as :func:`knn_graph` — bit-identical to BIGINT
    SQL at any parallelism).  Broadcast the quantized query via
    ``ray.put``; each batch computes its dots with one matvec and emits
    its LOCAL top-k; the k x #blocks candidates reduce on the driver
    (k-bounded, not corpus-bounded).  Output: (id_col, dot, rank) with
    ties broken on ascending id."""
    from .cluster import _batch_matrix, quantize

    qv = quantize(np.asarray(query, dtype=np.float64), quant).astype(np.float64)
    q_ref = ray.put(qv)

    def local_topk(batch: pa.Table) -> pd.DataFrame:
        q = ray.get(q_ref)
        mat = _batch_matrix(batch, vec_col, quant).astype(np.float64)
        dots = mat @ q  # exact ints in fp64 (< 2^52)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -dots))[:k]
        return pd.DataFrame(
            {id_col: ids[order], "dot": dots[order].astype(np.int64)}
        )

    cand = ds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cand = cand.sort_values(["dot", id_col], ascending=[False, True], kind="mergesort")
    out = cand.head(k).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def hard_negative_topk(
    ds: Dataset,
    anchors: np.ndarray,
    anchor_ids: np.ndarray,
    anchor_labels: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    quant: int = 32768,
) -> pd.DataFrame:
    """Hard-negative mining for contrastive training: per anchor vector,
    the k most-similar corpus vectors with a DIFFERENT label (similar
    but known-not-matching — the negatives that actually teach).

    Same exact-integer discipline as :func:`knn_graph` (quantized dot in
    fp64 BLAS, < 2^52, bit-identical to BIGINT SQL at any parallelism);
    ties break on ascending vec_id.  Broadcast = the (nq, d) anchor
    matrix + labels; partials are k-bounded per (anchor, block); the
    driver merge is O(nq·k·blocks).  Output:
    (anchor_id, vec_id, dot, rnk) — k rows per anchor."""
    from .cluster import _batch_matrix, quantize

    import pyarrow as pa
    import ray

    q = quantize(np.asarray(anchors, dtype=np.float64), quant).astype(np.float64)
    ctx = ray.put((q, np.asarray(anchor_ids), np.asarray(anchor_labels)))

    def local_topk(batch: pa.Table, *, _ctx=ctx) -> pd.DataFrame:
        qm, aids, alabs = ray.get(_ctx)
        mat = _batch_matrix(batch, vec_col, quant).astype(np.float64)
        dots = qm @ mat.T  # (nq, n) exact ints in fp64
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        labs = batch.column(label_col).to_numpy(zero_copy_only=False)
        out_a, out_id, out_d = [], [], []
        for qi in range(qm.shape[0]):
            mask = labs != alabs[qi]
            if not mask.any():
                continue
            cids, cd = ids[mask], dots[qi][mask]
            order = np.lexsort((cids, -cd))[:k]
            out_a.append(np.full(len(order), aids[qi], dtype=np.int64))
            out_id.append(cids[order])
            out_d.append(cd[order].astype(np.int64))
        if not out_a:
            return pd.DataFrame(
                {
                    "anchor_id": np.array([], dtype=np.int64),
                    id_col: np.array([], dtype=np.int64),
                    "dot": np.array([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "anchor_id": np.concatenate(out_a),
                id_col: np.concatenate(out_id),
                "dot": np.concatenate(out_d),
            }
        )

    cand = ds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cand["__negd"] = -cand["dot"]
    cand = cand.sort_values(
        ["anchor_id", "__negd", id_col], kind="mergesort"
    ).reset_index(drop=True)
    out = cand.groupby("anchor_id", sort=True).head(k).reset_index(drop=True)
    out["rnk"] = out.groupby("anchor_id").cumcount().astype(np.int64) + 1
    return out[["anchor_id", id_col, "dot", "rnk"]]
