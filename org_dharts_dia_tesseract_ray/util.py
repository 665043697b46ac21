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


def key_change_mask(keys, n: int):
    """Boolean numpy mask: row i starts a new run of equal key values in an
    already-sorted column (adjacent-compare; row 0 always True).  The
    boundary-detection primitive of every partition-vectorized reducer."""
    import numpy as np
    keys = as_array(keys)
    change = np.ones(n, dtype=bool)
    if n > 1:
        change[1:] = np.asarray(
            pc.not_equal(keys.slice(1), keys.slice(0, n - 1)))
    return change


def round_half_away(v: float, decimals: int = 4) -> float:
    """Round half away from zero — DuckDB ``round()`` semantics.  Python's
    built-in ``round`` is half-to-even and diverges from every oracle on
    exact halves."""
    import math
    s = 10.0 ** decimals
    x = v * s
    f = math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
    return f / s


def mix64(h):
    """Vectorized splitmix64 finalizer (numpy uint64 in/out) — full-width
    avalanche so any key distribution spreads uniformly over partitions."""
    import numpy as np
    with np.errstate(over="ignore"):
        h = h.astype(np.uint64, copy=True)
        h += np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def _string_hash64(col: pa.Array):
    """Deterministic vectorized 64-bit hash of a string/binary column:
    per-row polynomial over the raw bytes (computed on the flat Arrow value
    buffer with ``np.add.reduceat`` — no Python per row), then splitmix64."""
    import numpy as np
    if col.type == pa.string() or col.type == pa.large_string():
        col = col.cast(pa.large_binary())
    elif col.type == pa.binary():
        col = col.cast(pa.large_binary())
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    # flatten nulls to b"" so buffers are well-defined
    if arr.null_count:
        arr = pc.coalesce(arr, pa.scalar(b"", pa.large_binary()))
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                            count=len(arr) + 1 + arr.offset)[arr.offset:]
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    starts = offsets[:-1]
    lengths = (offsets[1:] - starts).astype(np.int64)
    total = int(offsets[-1])
    if total == int(offsets[0]):
        return mix64(np.zeros(len(arr), dtype=np.uint64))
    seg = data[int(offsets[0]):total].astype(np.uint64)
    pos = np.arange(len(seg), dtype=np.int64) - np.repeat(
        starts - int(offsets[0]), lengths)
    max_len = int(lengths.max())
    with np.errstate(over="ignore"):
        powers = np.empty(max_len, dtype=np.uint64)
        if max_len:
            powers[0] = np.uint64(1)
            for i in range(1, max_len):
                powers[i] = powers[i - 1] * np.uint64(1099511628211)
        contrib = seg * powers[pos]
        # sentinel zero so an empty row's start (== len(seg)) is a valid
        # reduceat index — clipping instead would truncate the PRECEDING
        # row's byte range and hash the same key differently depending on
        # whether a trailing empty string shares its batch
        contrib = np.append(contrib, np.uint64(0))
        idx = starts - int(offsets[0])
        h = np.add.reduceat(contrib, idx)
    h = h.astype(np.uint64, copy=False)
    h[lengths == 0] = np.uint64(0)
    return mix64(h)


def partition_ids(col, num_partitions: int) -> pa.Array:
    """Deterministic partition id (int32) for a key column — the building
    block of the hash-partition → per-partition-vectorized-pass pattern that
    replaces per-key ``map_groups`` reducers.  Integer/temporal keys hash via
    splitmix64; string/binary keys via a vectorized byte-polynomial.  Pure
    arithmetic: identical across processes, reruns and parallelism levels
    (no PYTHONHASHSEED, no library-version hash dependence)."""
    import numpy as np
    arr = as_array(col)
    if pa.types.is_integer(arr.type) or pa.types.is_temporal(arr.type):
        ints = pc.coalesce(arr.cast(pa.int64()), pa.scalar(0, pa.int64()))
        h = mix64(np.asarray(as_array(ints)).view(np.uint64))
    elif (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
          or pa.types.is_binary(arr.type)
          or pa.types.is_large_binary(arr.type)):
        h = _string_hash64(arr)
    else:
        raise TypeError(f"unsupported partition key type: {arr.type}")
    return pa.array((h % np.uint64(num_partitions)).astype(np.int32),
                    pa.int32())


def default_num_partitions(per_cpu: int = 2, lo: int = 8,
                           hi: int = 512) -> int:
    """Partition count for hash-partitioned reducers: ~2 groups per CPU so
    the partition `map_groups` calls saturate the cluster; clamped so tiny
    test sessions and huge clusters both behave.  At real 100 TB scale pass
    an explicit count sized so corpus_bytes / num_partitions fits a worker
    heap (each partition is processed as one in-memory table)."""
    return max(lo, min(hi, cluster_cpus() * per_cpu))
