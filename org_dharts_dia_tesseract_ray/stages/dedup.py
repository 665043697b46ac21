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
        import hashlib
        dig = pa.array([hashlib.md5(v or b"").hexdigest()
                        for v in t["html"].to_pylist()], pa.string())
        t = t.append_column("__dig", dig)
        t = t.sort_by([("url", "ascending"), ("warc_ts", "descending"),
                       ("__nb", "descending"), ("__dig", "descending")])
        t = t.drop_columns(["__dig"])
    urls = _as_array(t["url"])
    firsts = pc.not_equal(urls.slice(1), urls.slice(0, len(urls) - 1))
    mask = pa.concat_arrays([pa.array([True]), _as_array(firsts)])
    return t.filter(mask).drop_columns(["__nb"])


def _combiner(batch: pa.Table) -> pa.Table:
    return _keep_latest(batch, global_pass=False)


def _group_reducer(group: pa.Table) -> pa.Table:
    return _keep_latest(group, global_pass=True)


def _rank_key_batch(batch: pa.Table) -> pa.Table:
    """(url, __rank) — the survivor-ordering tuple packed into ONE max-able
    fixed-width string: zero-padded warc_ts µs | payload bytes | md5(html).
    Lexicographic max over this string == (max ts, then max length, then max
    digest) — the same total order the sort-based reducer uses, but now the
    reduce is a vectorized ``Max`` aggregate."""
    import hashlib
    ts = pc.cast(batch["warc_ts"], pa.int64()).to_pylist()
    payloads = batch["html"].to_pylist()
    keys = [
        f"{t if t is not None else 0:020d}|"
        f"{len(p) if p is not None else 0:012d}|"
        f"{hashlib.md5(p or b'').hexdigest()}"
        for t, p in zip(ts, payloads)
    ]
    return pa.table({"url": batch["url"],
                     "__rank": pa.array(keys, pa.string())})


def dedup_pages(ds, *, combine: bool = True, strategy: str = "join",
                num_partitions: int | None = None):
    """pages Dataset → pages Dataset with one row per url.

    ``combine=True`` runs the vectorized per-batch combiner before any
    shuffle (pure win when duplicates cluster in time).

    ``strategy="join"`` (default, the 10^12-url path): groupby(url) with a
    vectorized ``Max`` over a packed rank string, then ONE hash join back to
    the stream and a vectorized filter — no per-group Python anywhere.

    ``strategy="groups"``: the sort-based ``map_groups`` reducer — simpler
    plan (one shuffle), but one Python call per url group; fine up to ~10^6
    urls per node, pathological at web scale.

    Survivor choice is identical between strategies by construction
    (same (ts, bytes, digest) total order); asserted in tests.
    """
    if combine:
        ds = ds.map_batches(_combiner, batch_format="pyarrow",
                            zero_copy_batch=True)
    if strategy == "groups":
        return ds.groupby("url").map_groups(_group_reducer,
                                            batch_format="pyarrow")

    from ray.data.aggregate import Max

    if num_partitions is None:
        # join aggregators occupy scheduling slots — more partitions than
        # CPUs deadlocks a small cluster and just adds overhead on a big one
        import ray
        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            cpus = 4
        num_partitions = max(2, min(32, cpus))

    ranked = ds.map_batches(
        lambda b: b.append_column(
            "__rank", _as_array(_rank_key_batch(b)["__rank"])),
        batch_format="pyarrow", zero_copy_batch=True)
    best = (ranked
            .map_batches(lambda b: b.select(["url", "__rank"]),
                         batch_format="pyarrow", zero_copy_batch=True)
            .groupby("url")
            .aggregate(Max("__rank", alias_name="__best")))
    joined = ranked.join(best, join_type="inner",
                         num_partitions=num_partitions, on=("url",))
    survivors = joined.map_batches(
        lambda b: b.filter(pc.equal(b["__rank"], b["__best"]))
                   .drop_columns(["__rank", "__best"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return survivors
