"""Distributed PCA over an embedding column — the covariance-aggregation
pattern.

Exact PCA without ever materializing the matrix: each batch contributes the
sufficient statistics (Σx, Σxxᵀ, n) — a single (d² + d + 1)-sized partial
per batch regardless of row count — which sum across the corpus; the tiny
covariance eigendecomposition happens once driver-side; projection is then
a streaming ``map_batches`` matmul against the broadcast components.

This is how dimensionality reduction runs at 100 TB: the shuffle-free
two-pass (aggregate stats → project) replaces any collect-the-matrix
approach.  Determinism: fixed float64 op order; eigenvector sign fixed by
making each component's largest-|coordinate| entry positive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


from .similarity import _stack  # shared vector-column stacking kernel

def fit_pca(ds, *, vec_col: str = "embedding", n_components: int = 8):
    """Two-phase exact PCA fit: streaming sufficient-statistics aggregate →
    driver-side d×d eigendecomposition.  Returns (mean, components) with
    components shape (n_components, d)."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.binary()),
                             "sxx": pa.array([], pa.binary()),
                             "d": pa.array([], pa.int64())})
        X = _stack(b[vec_col])
        d = X.shape[1]
        sx = X.sum(axis=0)
        sxx = X.T @ X
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "sx": pa.array([sx.tobytes()], pa.binary()),
            "sxx": pa.array([sxx.tobytes()], pa.binary()),
            "d": pa.array([d], pa.int64()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    if not rows:
        raise ValueError("fit_pca: dataset is empty")
    # float addition is non-associative: streaming execution can deliver
    # partial rows in varying order run-to-run, which would perturb the
    # covariance by ulps and flip near-degenerate eigenvectors — sort the
    # partials by content so the reduction order is a pure function of the
    # data (determinism gate)
    rows.sort(key=lambda r: (r["n"], r["sx"], r["sxx"]))
    d = rows[0]["d"]
    n = sum(r["n"] for r in rows)
    sx = np.zeros(d)
    sxx = np.zeros((d, d))
    for r in rows:                      # few rows: one per batch
        sx += np.frombuffer(r["sx"], dtype=np.float64)
        sxx += np.frombuffer(r["sxx"], dtype=np.float64).reshape(d, d)
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)          # ascending
    comp = v[:, ::-1][:, :n_components].T.copy()
    # deterministic sign: largest-|coordinate| entry positive per component
    for i in range(comp.shape[0]):
        j = int(np.abs(comp[i]).argmax())
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    return mean, comp


def transform_pca(ds, mean: np.ndarray, components: np.ndarray, *,
                  vec_col: str = "embedding", id_col: str = "vec_id"):
    """Streaming projection: (id, pca list<float64>) via broadcast matmul."""
    import ray

    ref = ray.put((mean, components))

    class Project:
        def __init__(self, r):
            self.mean, self.comp = ray.get(r)

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    "pca": pa.array([], pa.list_(pa.float64()))})
            X = _stack(b[vec_col]) - self.mean
            Y = X @ self.comp.T
            k = Y.shape[1]
            flat = pa.array(Y.reshape(-1), pa.float64())
            offsets = pa.array(
                np.arange(b.num_rows + 1, dtype=np.int32) * k)
            return pa.table({
                id_col: b[id_col],
                "pca": pa.ListArray.from_arrays(offsets, flat),
            })

    return ds.map_batches(Project, fn_constructor_args=(ref,),
                          batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=(1, 8))
