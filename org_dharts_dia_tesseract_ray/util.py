"""Small shared helpers used across stages and functions."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def cluster_cpus(default: int = 4) -> int:
    """CPU count of the current Ray cluster (or ``default`` outside Ray)."""
    import ray
    try:
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
    return col


def first_per_key(t: pa.Table, key: str) -> pa.Table:
    """Keep the FIRST row of each run of equal ``key`` values in an
    already-sorted table (vectorized adjacent-compare mask)."""
    if t.num_rows <= 1:
        return t
    k = as_array(t[key])
    firsts = pc.not_equal(k.slice(1), k.slice(0, len(k) - 1))
    mask = pa.concat_arrays([pa.array([True]), as_array(firsts)])
    return t.filter(mask)


def keep_first_per_key(t: pa.Table, key: str, order_by: list) -> pa.Table:
    """Sort by ``[key asc] + order_by`` then keep one row per key —
    the vectorized per-batch combiner for latest-/first-per-key reductions."""
    sort_keys = [(key, "ascending")] + order_by
    return first_per_key(t.sort_by(sort_keys), key)
