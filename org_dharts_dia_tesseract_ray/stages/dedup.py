"""Exact URL deduplication — keep the latest capture per url.

The reference has no cross-document operators at all (single-doc loop,
SURVEY.md §2.5), but a Common-Crawl-shaped corpus requires exact URL dedup
before extraction.  Design for scale:

1. **per-batch combiner** (``map_batches``): drop within-batch duplicates
   first, shrinking the shuffle input — the partial-aggregation pattern;
2. **hash-shuffle groupby** on ``url`` with a vectorized per-group reducer.

Tie-break is fully deterministic: max ``warc_ts``, then max payload length,
then lexicographically greatest payload — parallelism can never change the
survivor (byte-identity gate).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.chunk(0) if col.num_chunks == 1 else pa.concat_arrays(col.chunks)
    return col


def _has_full_ties(t: pa.Table) -> bool:
    """True if any adjacent sorted rows share (url, warc_ts, __nb)."""
    if t.num_rows <= 1:
        return False
    u = _as_array(t["url"])
    ts = _as_array(t["warc_ts"])
    nb = _as_array(t["__nb"])
    same = pc.and_(
        pc.and_(pc.equal(u.slice(1), u.slice(0, len(u) - 1)),
                pc.equal(ts.slice(1), ts.slice(0, len(ts) - 1))),
        pc.equal(nb.slice(1), nb.slice(0, len(nb) - 1)),
    )
    return bool(pc.any(same).as_py())


def _keep_latest(batch: pa.Table, global_pass: bool) -> pa.Table:
    if batch.num_rows <= 1:
        return batch
    nbytes = pc.coalesce(pc.binary_length(batch["html"]).cast(pa.int64()),
                         pa.scalar(0, pa.int64()))
    t = batch.append_column("__nb", _as_array(nbytes))
    t = t.sort_by([("url", "ascending"), ("warc_ts", "descending"),
                   ("__nb", "descending")])
    # full-tie hazard: equal (url, warc_ts, length) but different bytes would
    # leave the survivor to sort stability — resolve with a content digest,
    # computed only when such ties exist (vanishingly rare in practice)
    if _has_full_ties(t):
        import zlib
        crc = pa.array([zlib.crc32(v or b"") for v in t["html"].to_pylist()],
                       pa.int64())
        t = t.append_column("__crc", crc)
        t = t.sort_by([("url", "ascending"), ("warc_ts", "descending"),
                       ("__nb", "descending"), ("__crc", "descending")])
        t = t.drop_columns(["__crc"])
    urls = _as_array(t["url"])
    firsts = pc.not_equal(urls.slice(1), urls.slice(0, len(urls) - 1))
    mask = pa.concat_arrays([pa.array([True]), _as_array(firsts)])
    return t.filter(mask).drop_columns(["__nb"])


def _combiner(batch: pa.Table) -> pa.Table:
    return _keep_latest(batch, global_pass=False)


def _group_reducer(group: pa.Table) -> pa.Table:
    return _keep_latest(group, global_pass=True)


def dedup_pages(ds, *, combine: bool = True):
    """pages Dataset → pages Dataset with one row per url.

    ``combine=True`` runs the per-batch combiner before the shuffle
    (recommended; pure win when duplicates cluster in time, harmless
    otherwise).
    """
    if combine:
        ds = ds.map_batches(_combiner, batch_format="pyarrow",
                            zero_copy_batch=True)
    return ds.groupby("url").map_groups(_group_reducer, batch_format="pyarrow")
