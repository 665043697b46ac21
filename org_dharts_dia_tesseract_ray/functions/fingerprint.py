"""Document fingerprinting — content digests, rolling hashes, winnowing.

Corpus-scale identity primitives for the dedup family (:mod:`.dedup`).  The
reference's per-document identity was a random ``UUID``
(/root/reference/examples/.../PageItem.java:28) — deliberately replaced with
deterministic content digests because random ids break the byte-identical
rerun gate (SURVEY.md §7 hard-part #1).

All kernels are deterministic pure functions of the text.  ``md5_batch`` has
a DuckDB-exact oracle (``md5(text)``); the rolling/winnowing hashes are
numpy-vectorized per document and validated property-style in tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# polynomial rolling-hash parameters (Rabin–Karp over UTF-8 bytes, mod 2^64)
ROLL_BASE = np.uint64(1099511628211)       # FNV prime — good avalanche
FNV_OFFSET = np.uint64(14695981039346656037)


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def md5_batch(batch: pa.Table, *, text_col: str = "text",
              id_col: str = "doc_id") -> pa.Table:
    """(id, fp) — exact-content MD5 digest. Oracle: ``md5(text)``."""
    fps = [md5_hex(s) if s is not None else None
           for s in batch[text_col].to_pylist()]
    return pa.table({id_col: batch[id_col], "fp": pa.array(fps, pa.string())})


def md5_sql(table: str = "documents", text_col: str = "text",
            id_col: str = "doc_id") -> str:
    return f"SELECT {id_col}, md5({text_col}) AS fp FROM {table}"


def rolling_hash64(s: str) -> int:
    """Whole-document polynomial hash: h = Σ byte_i · BASE^(n-1-i) mod 2^64.

    Vectorized: one cumprod + one dot per document, no Python byte loop.
    """
    data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n == 0:
        return int(FNV_OFFSET)
    with np.errstate(over="ignore"):
        pows = np.empty(n, dtype=np.uint64)
        pows[0] = np.uint64(1)
        if n > 1:
            pows[1:] = ROLL_BASE
            np.cumprod(pows, out=pows)          # BASE^0 .. BASE^(n-1), mod 2^64
        return int((data[::-1] * pows).sum(dtype=np.uint64))


def kgram_hashes(s: str, k: int = 8) -> np.ndarray:
    """All k-gram (byte window) rolling hashes of the document, uint64.

    Classic Rabin–Karp slide done with vectorized prefix sums:
    H[i] = Σ_{j<k} b[i+j]·B^(k-1-j)  computed as strided dot via cumulative
    polynomial prefixes — O(n) numpy work, no Python loop over positions.
    """
    data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n < k:
        return np.array([rolling_hash64(s)], dtype=np.uint64)
    with np.errstate(over="ignore"):
        # sliding windows as a strided 2-D view, then dot with power vector
        pows = np.empty(k, dtype=np.uint64)
        pows[0] = np.uint64(1)
        if k > 1:
            pows[1:] = ROLL_BASE
            np.cumprod(pows, out=pows)
        pows = pows[::-1].copy()
        win = np.lib.stride_tricks.sliding_window_view(data, k)
        return (win * pows).sum(axis=1, dtype=np.uint64)


def kgram_hashes_batch(col, k: int = 8):
    """k-gram hashes for EVERY string of an Arrow column in one vectorized
    pass — the batched form of :func:`kgram_hashes` (bit-identical per doc).

    One sliding-window polynomial over the column's CONCATENATED utf-8 value
    buffer (windows that straddle a document boundary are simply never
    gathered), then a vectorized ragged gather of each document's window
    range — no Python loop over documents, the `_string_hash64` trick
    applied to k-grams.  Documents shorter than ``k`` contribute their
    whole-string hash (``rolling_hash64`` semantics), nulls hash as "".

    Returns ``(hashes, counts)``: ``hashes`` is every document's k-gram
    hashes concatenated in document order; ``counts[i]`` is document i's
    k-gram count (≥ 1 — an empty/short document yields one hash).
    """
    from ..util import flat_binary_view

    data, starts, lengths = flat_binary_view(col)
    n = len(starts)
    if n == 0:
        return (np.array([], dtype=np.uint64), np.array([], dtype=np.int64))

    counts = np.maximum(lengths - k + 1, 1)
    total_bytes = int(lengths.sum())
    with np.errstate(over="ignore"):
        pows = np.empty(k, dtype=np.uint64)
        pows[0] = np.uint64(1)
        if k > 1:
            pows[1:] = ROLL_BASE
            np.cumprod(pows, out=pows)
        pows = pows[::-1].copy()
        if total_bytes >= k:
            win = np.lib.stride_tricks.sliding_window_view(
                data.astype(np.uint64), k)
            G = (win * pows).sum(axis=1, dtype=np.uint64)
        else:
            G = np.zeros(1, dtype=np.uint64)
    # gather each doc's window range from the global hash array
    from ..util import ragged_arange
    gidx = np.repeat(np.minimum(starts, max(len(G) - 1, 0)), counts)
    gidx = np.minimum(gidx + ragged_arange(counts), len(G) - 1)
    hashes = G[gidx]
    # patch documents shorter than k: whole-string polynomial hash
    short = np.flatnonzero(lengths < k)
    if len(short):
        out_offs = np.r_[0, np.cumsum(counts)]
        for i in short:
            s = bytes(data[starts[i]:starts[i] + lengths[i]])
            hashes[out_offs[i]] = rolling_hash64(
                s.decode("utf-8", "surrogateescape"))
    return hashes, counts


def winnow(hashes: np.ndarray, window: int = 16) -> np.ndarray:
    """Winnowing (Schleimer/Wilkerson/Aiken, MOSS): per sliding window keep
    the minimum hash; dedupe; sorted uint64 fingerprint set."""
    if len(hashes) <= window:
        return np.unique(hashes)
    win = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return np.unique(win.min(axis=1))


def winnow_batch(batch: pa.Table, *, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 8,
                 window: int = 16) -> pa.Table:
    """(id, n_fp, min_fp, fingerprints list<uint64>) per document."""
    ids = batch[id_col]
    n_fp, min_fp, flat, offsets = [], [], [], [0]
    for s in batch[text_col].to_pylist():
        fps = winnow(kgram_hashes(s or "", k), window)
        n_fp.append(len(fps))
        min_fp.append(int(fps.min()) if len(fps) else 0)
        flat.extend(int(x) for x in fps)
        offsets.append(len(flat))
    return pa.table({
        id_col: ids,
        "n_fp": pa.array(n_fp, pa.int32()),
        "min_fp": pa.array(min_fp, pa.uint64()),
        "fingerprints": pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.uint64())),
    })


def apply_md5(ds, **kw):
    return ds.map_batches(lambda b: md5_batch(b, **kw),
                          batch_format="pyarrow", zero_copy_batch=True)


def apply_winnow(ds, **kw):
    return ds.map_batches(lambda b: winnow_batch(b, **kw),
                          batch_format="pyarrow", zero_copy_batch=True)
