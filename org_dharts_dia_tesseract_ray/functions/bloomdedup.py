"""Bloom-filter incremental dedup — filter a new corpus slice against a
previously-seen reference corpus WITHOUT a join.

The incremental-crawl hygiene step: each new Common-Crawl snapshot is
deduplicated against the 10^12 urls / content digests already ingested.
A hash anti-join would shuffle the full new slice against the full seen
set every run; the Bloom filter replaces that with a compile-once
broadcast bitmap and a shuffle-free vectorized probe:

1. **build** (distributed, slim): every reference batch emits its keys'
   DISTINCT bit positions (k per key, 8 bytes each) tagged with the bit
   range ("shard") they fall in; a ``groupby(shard)`` assembles each
   bitmap SLICE in one vectorized pass — no giant per-batch bitmap
   partials, no single reducer, shuffle volume ~ k x |ref| x 8 B.  The
   driver only concatenates the finished slices (m/8 bytes total — the
   size of the object it must broadcast anyway).
2. **probe** (shuffle-free): ``ray.put`` the bitmap once; every probe
   task reads it zero-copy from the local object store (plasma shared
   memory: one physical copy per NODE, not per worker) and tests k bit
   positions per key vectorized.

Error is ONE-SIDED and deterministic: every key truly in the reference
set is always dropped (no false negatives); a genuinely-new key is
dropped with probability ~``(1 - e^(-k*n/m))^k`` (false positive), e.g.
0.8 % at 10 bits/key with k=7.  Size ``bits ~ 10-15 x |ref keys|`` —
10^9 seen digests -> a 1.2-1.9 GB bitmap, one object-store entry per
node.  Beyond broadcast size, build R independent blooms sharded by
``hash(key) % R`` and route probe batches — same kernels, R objects.
All hashing is the repo's deterministic ``util._col_hash64`` family, so
the surviving row set is identical across reruns and parallelism levels.

Null keys can never be duplicates of anything seen; they pass through
unfiltered (both here and in the SQL oracle's NOT EXISTS).

Reference analogue: the wrapper's dictionary-word membership predicate
(TessAPI.java:566 TessBaseAPIIsValidWord) — an engine-held compiled set
consulted per item; here the "dictionary" is the seen-key bitmap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from typing import NamedTuple

from ..util import _col_hash64, as_array, mix64

#: bitmap slices assembled independently (power of two; each reducer sees
#: only its slice's bit indices, the driver only finished slices)
_NUM_SHARDS = 64


class Bloom(NamedTuple):
    """A built filter: the bitmap plus the probe count it was built with —
    carrying ``k`` in the value makes a build/probe ``k`` mismatch (which
    would silently void the no-false-negative guarantee) unrepresentable."""
    bitmap: np.ndarray
    k: int


def _probe_positions(keys, bits: int, k: int) -> np.ndarray:
    """(n, k) int64 bit positions via double hashing: ``h1 + i*h2 mod m``
    with odd ``h2`` so the stride cycles the full power-of-two range."""
    h1 = _col_hash64(keys)
    h2 = mix64(h1 ^ np.uint64(0xA076_1D64_78BD_642F)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = h1[:, None] + i[None, :] * h2[:, None]
    return (pos & np.uint64(bits - 1)).astype(np.int64)


def bloom_build(ref_ds, *, key_col: str, bits: int = 1 << 24,
                k: int = 7) -> "Bloom":
    """Compile the reference corpus' keys into one uint8 bitmap
    (``bits/8`` bytes) — see module docstring step 1."""
    if bits & (bits - 1) or bits < _NUM_SHARDS * 8:
        raise ValueError(f"bits must be a power of two >= {_NUM_SHARDS * 8}")
    slice_bits = bits // _NUM_SHARDS

    def positions(b: pa.Table) -> pa.Table:
        col = as_array(b[key_col])
        valid = col.filter(pc.is_valid(col))
        if len(valid) == 0:
            return pa.table({"shard": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        pos = np.unique(_probe_positions(valid, bits, k))
        return pa.table({"shard": pa.array(pos // slice_bits, pa.int64()),
                         "pos": pa.array(pos, pa.int64())})

    def build_slice(g: pa.Table) -> pa.Table:
        shard = int(g["shard"][0].as_py())
        local = np.asarray(g["pos"], dtype=np.int64) - shard * slice_bits
        blob = np.zeros(slice_bits // 8, dtype=np.uint8)
        np.bitwise_or.at(blob, local >> 3,
                         np.uint8(1) << (local & 7).astype(np.uint8))
        return pa.table({"shard": pa.array([shard], pa.int64()),
                         "slice": pa.array([blob.tobytes()], pa.binary())})

    slices = (ref_ds.map_batches(positions, batch_format="pyarrow",
                                 zero_copy_batch=True)
              .groupby("shard").map_groups(build_slice,
                                           batch_format="pyarrow")
              .take_all())
    bitmap = np.zeros(bits // 8, dtype=np.uint8)
    for row in slices:        # empty shards simply stay zero
        s = int(row["shard"])
        bitmap[s * slice_bits // 8:(s + 1) * slice_bits // 8] = \
            np.frombuffer(row["slice"], dtype=np.uint8)
    return Bloom(bitmap, k)


def bloom_filter_new(ds, bloom: "Bloom", *, key_col: str):
    """Rows of ``ds`` whose key is NOT in the reference bitmap (plus all
    null-key rows) — see module docstring step 2."""
    import ray

    bitmap = np.ascontiguousarray(bloom.bitmap, dtype=np.uint8)
    k = int(bloom.k)
    m = len(bitmap) * 8
    # _probe_positions masks with `pos & (m-1)` — a truncated/foreign
    # bitmap with a non-power-of-two length would alias bit positions
    # silently instead of failing
    if m == 0 or m & (m - 1):
        raise ValueError("bitmap length must be a power of two")
    ref = ray.put(bitmap)

    def probe(b: pa.Table) -> pa.Table:
        bm = ray.get(ref)  # zero-copy local plasma read per task
        col = as_array(b[key_col])
        null = np.zeros(b.num_rows, dtype=bool)
        if col.null_count:
            null = ~np.asarray(pc.is_valid(col))
        pos = _probe_positions(col, m, k)
        seen = ((bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1) \
            .all(axis=1)
        return b.filter(pa.array(~seen | null))

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)


def bloom_new_keys_sql(ref_predicate: str, new_predicate: str, *,
                       table: str, key_col: str, out_cols: str) -> str:
    """Oracle: exact NOT EXISTS anti-join (the hash-free ground truth;
    matches the Ray result whenever no false positive fires — at test
    scale the FP odds are ~1e-24 and the bitmap is deterministic, so a
    verified-green query stays green).  Predicates must qualify columns
    with their alias: ``o.`` for the new slice, ``r.`` for the reference.
    """
    return f"""
SELECT {out_cols} FROM {table} o
WHERE ({new_predicate})
  AND (o.{key_col} IS NULL OR NOT EXISTS (
        SELECT 1 FROM {table} r
        WHERE ({ref_predicate}) AND r.{key_col} = o.{key_col}))"""
