"""Distributed fixed-point linear algebra over embedding columns.

Power iteration for the top principal direction of X^T X (the Gram /
covariance-without-centering matrix) without ever materializing it:
each iteration is one streaming pass computing w = X^T (X v) as
per-batch integer partials — the d-vector v is the only driver state.

Everything is integer arithmetic so the result is bit-exact at any
partitioning and exactly reproducible by a SQL oracle:

- X quantizes once: x_int = floor(x * quant + 0.5) (the `_KNN_QUANT`
  convention shared with the ANN operators);
- s_i = Σ_j x_ij v_j and w_j = Σ_i x_ij s_i are exact int64 within the
  documented envelope (rows/batch R ≤ 4096, dims D, quant Q, scale S:
  R·D·Q²·S < 2^63 — at the Q=32768, S=10^4, D=64 defaults that is
  2.8e18, inside int64; the driver folds per-batch partials in python
  ints, so batch-count never overflows);
- the rescale v' = w·S // max|w| uses the shift identity
  ((w + m)·S) // m − S, keeping every division non-negative — floor
  and truncation agree there, so python and DuckDB `//` match exactly
  (DuckDB truncates negative division; see NOTES.md ewma lesson).

The eigenvector sign is whatever the deterministic arithmetic yields —
identical on both sides by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

_I64_MAX = 2**63 - 1


def power_iteration_fixed(
    ds: Dataset,
    vec_col: str,
    dims: int,
    iters: int = 4,
    quant: int = 32768,
    scale: int = 10_000,
    batch_rows: int = 4096,
) -> pd.DataFrame:
    """Top eigenvector direction of X^T X by fixed-point power
    iteration; returns (dim 1-based, component) with components in
    [-scale, scale], max-rescaled each iteration (the hits_fixed
    convention — no L2 norm, so everything stays integral)."""
    from .dedup import pin_blocks

    assert batch_rows * dims * quant * quant * scale <= _I64_MAX, (
        "per-batch partial exceeds int64; lower quant/scale/batch_rows"
    )

    def to_int(b: pd.DataFrame) -> pd.DataFrame:
        x = np.stack(b[vec_col].to_numpy())
        xi = np.floor(x * quant + 0.5).astype(np.int64)
        return pd.DataFrame({"__x": list(xi)})

    pinned = pin_blocks(ds.map_batches(to_int, batch_format="pandas"), 64)

    v = np.full(dims, scale, dtype=np.int64)
    for _ in range(iters):
        vv = v.copy()

        def partial(b: pd.DataFrame, _v=vv) -> pd.DataFrame:
            x = np.stack(b["__x"].to_numpy())
            s = x @ _v  # (rows,) exact int64
            w = x.T @ s  # (dims,) exact int64 within the envelope
            return pd.DataFrame(
                {
                    "dim": np.arange(1, dims + 1, dtype=np.int64),
                    "w": w.astype(np.int64),
                }
            )

        parts = (
            pinned.map_batches(partial, batch_format="pandas", batch_size=batch_rows)
            .to_pandas()
        )
        # python-int fold: exact at any batch count
        acc = [0] * dims
        for d, w in zip(parts["dim"].to_numpy(), parts["w"].to_numpy()):
            acc[int(d) - 1] += int(w)
        m = max(abs(a) for a in acc)
        if m == 0:
            break
        v = np.array(
            [((a + m) * scale) // m - scale for a in acc], dtype=np.int64
        )

    return pd.DataFrame(
        {
            "dim": pd.Series(np.arange(1, dims + 1), dtype="int64"),
            "component": pd.Series(v, dtype="int64"),
        }
    )
