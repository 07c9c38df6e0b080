"""Deterministic distributed k-means over an embedding column.

The training-data use case is semantic sharding / domain balancing /
cluster-based curation (pick per-cluster quotas, drop low-quality
clusters): assign every vector to one of ``k`` centroids with a fixed
number of Lloyd iterations.

Determinism across partitionings (and vs the SQL oracle) is the hard
part — float summation order varies with block boundaries.  The engine
sidesteps floats entirely:

- vectors are quantized to int64 at load (``floor(x * quant + 0.5)`` —
  IEEE-double-exact, bit-identical in numpy and DuckDB),
- per-cluster partial sums are int64 (order-independent),
- centroid update is FLOOR division of the int sum by the count
  (toward −∞ on both sides),
- distances are exact int squared-L2; argmin ties break to the lowest
  cluster index.

Scale shape: each iteration is one ``map_batches`` pass emitting a
k×d partial-sum block per batch (k·d ints, tiny), reduced on the
driver — the classic mini-reduce whose reduce side is O(k·d·blocks),
never O(rows).  Centroids are broadcast via ``ray.put`` once per
iteration.  Init = the vectors of the k smallest ids (a per-batch
top-k partial merge, no sort shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def quantize(vecs, quant: int) -> np.ndarray:
    """float list-column → exact int64 matrix, floor(x*quant + 0.5)."""
    x = np.asarray(vecs, dtype=np.float64)
    return np.floor(x * quant + 0.5).astype(np.int64)


def _batch_matrix(batch: pa.Table, vec_col: str, quant: int) -> np.ndarray:
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ExtensionArray):
        # Ray's ArrowTensorArray (a pandas round-trip upstream converts
        # list<float> to the tensor extension type): (n, d) ndarray
        mat = col.to_numpy(zero_copy_only=False)
        if mat.dtype == object:
            mat = np.stack([np.asarray(r, dtype=np.float64) for r in mat])
        return quantize(mat, quant)
    # fixed-width list -> zero-copy reshape; ragged would raise
    flat = col.values.to_numpy(zero_copy_only=False)
    d = len(col[0])
    return quantize(flat.reshape(len(col), d), quant)


def _float_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> / tensor-extension column,
    zero-copy flatten where the layout allows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ExtensionArray):
        mat = col.to_numpy(zero_copy_only=False)
        if mat.dtype == object:
            mat = np.stack([np.asarray(r, dtype=np.float64) for r in mat])
        return mat.astype(np.float64, copy=False)
    flat = col.values.to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), len(col[0])).astype(np.float64, copy=False)


def _assign(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Exact int squared-L2 argmin; ties → lowest cluster index
    (np.argmin returns the first minimum)."""
    # BLAS path via the dot identity |x|² - 2x·c + |c|²: every term is an
    # integer < 2^52, so float64 arithmetic is EXACT (same distances, same
    # argmin ties) — the naive (n, k, d) broadcast allocated a ~270 MB
    # int64 temp per 16k batch, page-faulting 4.5s cold / 0.3s warm where
    # this path runs in ~5 ms.  Any quantized embedding satisfies the
    # bound (needs max|value| sums < 2^26); the exact-int broadcast
    # remains as the guard's fallback.
    d = x.shape[1]
    bound = float(np.abs(x).max(initial=0)) + float(
        np.abs(centroids).max(initial=0)
    )
    if d * bound * bound < 2.0**52:
        xf = x.astype(np.float64)
        cf = centroids.astype(np.float64)
        d2 = (
            (xf * xf).sum(axis=1)[:, None]
            - 2.0 * (xf @ cf.T)
            + (cf * cf).sum(axis=1)[None, :]
        )
        return d2.argmin(axis=1)
    d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1)


def init_centroids(
    ds: Dataset, id_col: str, vec_col: str, k: int, quant: int
) -> np.ndarray:
    """Vectors of the k smallest ids.  Per-batch partial top-k, merged on
    the driver — no sort shuffle; the collected set is k rows per block."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.argsort(ids, kind="stable")[:k]
        x = _batch_matrix(batch, vec_col, quant)[keep]
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "__q": pa.array(list(x), pa.list_(pa.int64())),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = rows.sort_values(id_col, kind="mergesort").head(k)
    return np.array([np.asarray(q) for q in rows["__q"]], dtype=np.int64)


def kmeans_centroids(
    ds: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    quant: int = 1000,
) -> np.ndarray:
    """Final (k, d) int64 centroid matrix after ``iters`` Lloyd
    iterations.  Expects an already-projected (id, vec) dataset — callers
    that re-scan the input afterwards (``kmeans_assign``, ``semdedup``)
    materialize it once and share the pinned handle."""
    centroids = init_centroids(ds, id_col, vec_col, k, quant)
    d = centroids.shape[1]

    for _ in range(iters):
        cref = ray.put(centroids)

        def partial_sums(batch: pa.Table, *, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            x = _batch_matrix(batch, vec_col, quant)
            a = _assign(x, c)
            # k rows per batch: count + per-dim int sum
            counts = np.bincount(a, minlength=k).astype(np.int64)
            sums = np.zeros((k, x.shape[1]), dtype=np.int64)
            np.add.at(sums, a, x)
            return pa.table(
                {
                    "cl": pa.array(np.arange(k), pa.int64()),
                    "n": pa.array(counts, pa.int64()),
                    "s": pa.array(list(sums), pa.list_(pa.int64())),
                }
            )

        parts = ds.map_batches(partial_sums, batch_format="pyarrow").to_pandas()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, d), dtype=np.int64)
        for cl, n, s in zip(parts["cl"], parts["n"], parts["s"]):
            counts[cl] += n
            sums[cl] += np.asarray(s, dtype=np.int64)
        nonempty = counts > 0
        new = centroids.copy()
        # floor toward −∞, matching SQL FLOOR(sum/count); empty clusters
        # keep their previous centroid
        new[nonempty] = np.floor_divide(sums[nonempty], counts[nonempty, None])
        centroids = new

    return centroids


def kmeans_assign(
    ds: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    quant: int = 1000,
    include_dist: bool = False,
) -> Dataset:
    """(id, cluster) after ``iters`` Lloyd iterations.  Fully
    deterministic and partitioning-independent (see module docstring);
    the DuckDB oracle is an unrolled CTE of the same integer recurrence
    (``pipelines/queries.py:_sql_kmeans``)."""
    # Each Lloyd pass re-executes the lazy upstream otherwise (iters+2
    # full re-reads).  The projected (id, vec) set IS the algorithm's
    # working set — pin it in the object store once (spillable); at fleet
    # scale the same role is played by a checkpointed parquet projection.
    ds = ds.select_columns([id_col, vec_col]).materialize()
    centroids = kmeans_centroids(ds, id_col, vec_col, k, iters, quant)

    cref = ray.put(centroids)

    def final(batch: pa.Table, *, _cref=cref) -> pa.Table:
        c = ray.get(_cref)
        x = _batch_matrix(batch, vec_col, quant)
        a = _assign(x, c)
        cols = {
            id_col: batch.column(id_col).cast(pa.int64()),
            "cluster": pa.array(a, pa.int64()),
        }
        if include_dist:
            # exact int squared-L2 to the assigned centroid only (an
            # (n, d) temp, not the (n, k, d) broadcast) — the
            # semantic-outlier signal
            diff = x - c[a]
            cols["dist2"] = pa.array((diff * diff).sum(axis=1), pa.int64())
        return pa.table(cols)

    return ds.map_batches(final, batch_format="pyarrow")


def semdedup(
    ds: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 8,
    iters: int = 3,
    quant: int = 1000,
    threshold: float = 0.99,
    strip: int = 1024,
) -> Dataset:
    """SemDeDup (semantic deduplication, Abbas et al. 2023,
    arXiv:2303.09540 — deterministic variant): k-means-cluster the
    embeddings, then inside each cluster drop every vector that has ANY
    smaller-id neighbor at cosine >= ``threshold``.  Output
    ``(id, cluster, kept)`` — one row per input vector.

    The "any smaller-id near-neighbor in the same cluster" removal rule
    (rather than a greedy chain) makes the output order-free and
    SQL-expressible (an EXISTS over within-cluster pairs, see
    ``pipelines/queries.py:SQL_SEMDEDUP``); cosine runs on the ORIGINAL
    float vectors (LIST_COSINE_SIMILARITY semantics), clustering on the
    quantized integers (exact, partitioning-independent).

    Scale shape: clustering is the k×d mini-reduce of
    :func:`kmeans_centroids`; the dedup adds ONE groupby(cluster)
    exchange.  Per-cluster work is all-pairs BY DESIGN — SemDeDup's
    contract is that ``k`` grows with the corpus (k ≈ N / target
    cluster size), which bounds every cluster; similarity is computed
    in ``strip``-row blocks so no cluster ever materializes an m×m
    matrix.
    """
    ds = ds.select_columns([id_col, vec_col]).materialize()
    cref = ray.put(kmeans_centroids(ds, id_col, vec_col, k, iters, quant))

    def tag(batch: pa.Table, *, _cref=cref) -> pa.Table:
        c = ray.get(_cref)
        x = _batch_matrix(batch, vec_col, quant)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                vec_col: batch.column(vec_col),
                "cluster": pa.array(_assign(x, c), pa.int64()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    # Arrow-native group stage: the vector column never round-trips
    # through pandas object rows (a 500k-vector corpus spent most of its
    # wall time in that conversion) — zero-copy flatten + one argsort.
    def per_cluster(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        m = _float_matrix(g.column(vec_col))[order]
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        n = len(ids)
        kept = np.ones(n, dtype=bool)
        cols = np.arange(n)
        # float32 screen + float64 recompute of hits (see dedup.py
        # bucket_pairs: sgemm halves the traffic of the dominant matmul;
        # the 1e-4 margin is orders above float32 dot error)
        m32 = m.astype(np.float32)
        screen = np.float32(threshold - 1e-4)
        for lo in range(0, n, strip):
            hi = min(lo + strip, n)
            sims32 = m32[lo:hi] @ m32.T  # (strip, n) — bounded by strip
            earlier = cols[None, :] < np.arange(lo, hi)[:, None]
            ra, cb = np.where((sims32 >= screen) & earlier)
            if len(ra):
                exact = np.einsum("ij,ij->i", m[ra + lo], m[cb])
                hit = np.zeros(hi - lo, dtype=bool)
                hit[ra[exact >= threshold]] = True
                kept[lo:hi] = ~hit
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "cluster": g.column("cluster").take(pa.array(order)),
                "kept": pa.array(kept),
            }
        )

    return tagged.groupby("cluster").map_groups(per_cluster, batch_format="pyarrow")
