"""Exact URL deduplication — keep the latest capture per url.

The reference has no cross-document operators at all (single-doc loop,
SURVEY.md §2.5), but a Common-Crawl-shaped corpus requires exact URL dedup
before extraction.  Design for scale:

1. **per-batch combiner** (``map_batches``): drop within-batch duplicates
   first, shrinking the shuffle input — the partial-aggregation pattern;
2. a reduce keyed on ``url`` — default is the hash-partitioned vectorized
   reduce (ONE shuffle, no per-url Python, strict one-row-per-url), with
   the survivor-index join and per-group reducers kept as alternatives.

Tie-break is fully deterministic: max ``warc_ts`` (nulls rank lowest, below
any real timestamp including pre-epoch ones), then max payload length, then
greatest whole-row content digest — parallelism can never change the
survivor (byte-identity gate).  Rows that are COMPLETELY identical collapse
to one row; since they are byte-identical, which physical copy survives is
unobservable.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from ..util import (as_array, cluster_cpus, default_num_partitions,
                    first_per_key, partition_ids)

#: non-key columns beyond the payload that participate in the tie-break
#: digest — rows differing ONLY in text/lang must still pick a
#: deterministic survivor (whole-row rank, not payload-only)
_DIGEST_COLS = ("html", "text", "lang")


def _ts_keys(batch: pa.Table) -> tuple[pa.Array, pa.Array]:
    """(validity int8 desc-sortable, int64 value) — null timestamps rank
    strictly below every real timestamp (including epoch 0 and pre-epoch
    negatives), instead of colliding with epoch 0."""
    ts = batch["warc_ts"]
    valid = pc.cast(pc.is_valid(ts), pa.int8())
    val = pc.coalesce(pc.cast(ts, pa.int64()), pa.scalar(0, pa.int64()))
    return as_array(valid), as_array(val)


def _row_digests(t: pa.Table) -> pa.Array:
    """Whole-row md5 over the non-key columns (missing columns skipped).
    A per-column validity marker precedes each value so a null and an empty
    value rank DISTINCTLY — without it rows identical in (url, ts, length)
    differing only by null-vs-empty text/lang would digest equal and leave
    the survivor to sort stability."""
    cols = [t[c].to_pylist() for c in _DIGEST_COLS if c in t.column_names]
    digs = []
    for vals in zip(*cols) if cols else [()] * t.num_rows:
        h = hashlib.md5()
        for v in vals:
            if isinstance(v, str):
                v = v.encode("utf-8")
            h.update(b"\x01" if v is not None else b"\x00")
            h.update(v or b"")
            h.update(b"\x00")
        digs.append(h.hexdigest())
    return pa.array(digs, pa.string())


def _has_full_ties(t: pa.Table) -> bool:
    """True if any adjacent sorted rows share (url, __tsv, __tsn, __nb).

    Comparisons run on the null-free key columns — ``pc.equal`` on nulls
    yields null and ``pc.any`` would ignore the tie entirely."""
    if t.num_rows <= 1:
        return False
    same = None
    for col in ("url", "__tsn", "__tsv", "__nb"):
        c = as_array(t[col])
        eq = pc.equal(c.slice(1), c.slice(0, len(c) - 1))
        same = eq if same is None else pc.and_(same, eq)
    return bool(pc.any(same).as_py())


def _keep_latest(batch: pa.Table) -> pa.Table:
    """Vectorized one-row-per-url reducer over an in-memory table."""
    if "__part" in batch.column_names:
        batch = batch.drop_columns(["__part"])
    if batch.num_rows <= 1:
        return batch
    nbytes = pc.coalesce(pc.binary_length(batch["html"]).cast(pa.int64()),
                         pa.scalar(0, pa.int64()))
    tsn, tsv = _ts_keys(batch)
    t = batch.append_column("__nb", as_array(nbytes))
    t = t.append_column("__tsn", tsn)
    t = t.append_column("__tsv", tsv)
    order = [("url", "ascending"), ("__tsn", "descending"),
             ("__tsv", "descending"), ("__nb", "descending")]
    t = t.sort_by(order)
    # full-tie hazard: equal (url, ts, length) but different content would
    # leave the survivor to sort stability — resolve with the whole-row
    # digest, computed only when such ties exist (vanishingly rare)
    if _has_full_ties(t):
        t = t.append_column("__dig", _row_digests(t))
        t = t.sort_by(order + [("__dig", "descending")])
        t = t.drop_columns(["__dig"])
    return first_per_key(t, "url").drop_columns(["__nb", "__tsn", "__tsv"])


#: bias so the zero-padded decimal encoding of int64 µs is lexicographically
#: ordered for NEGATIVE (pre-epoch) timestamps too — a raw f"{t:020d}" puts
#: the sign char first and ranks -1 below -123
_TS_BIAS = 1 << 63


def _rank_key_batch(batch: pa.Table) -> pa.Table:
    """(url, __rank) — the survivor-ordering tuple packed into ONE max-able
    fixed-width string: validity flag | biased warc_ts µs | payload bytes |
    whole-row md5.  Lexicographic max over this string == (non-null ts
    first, then max ts, max length, max digest) — the same total order the
    sort-based reducer uses, but now the reduce is a vectorized ``Max``
    aggregate."""
    ts = pc.cast(batch["warc_ts"], pa.int64()).to_pylist()
    lens = pc.coalesce(pc.binary_length(batch["html"]).cast(pa.int64()),
                       pa.scalar(0, pa.int64())).to_pylist()
    digs = _row_digests(batch).to_pylist()
    keys = [
        f"{int(t is not None)}{(t or 0) + _TS_BIAS:020d}|{ln:012d}|{dg}"
        for t, ln, dg in zip(ts, lens, digs)
    ]
    return pa.table({"url": batch["url"],
                     "__rank": pa.array(keys, pa.string())})


def _partition_reduce(ds, num_partitions: int | None):
    """Hash-partition by url → ONE vectorized reduce per partition.

    The pattern that replaces per-key ``map_groups``: ``__part =
    hash(url) % P`` is a pure vectorized column, the shuffle is a single
    ``groupby(__part)``, and each partition is reduced by one
    ``_keep_latest`` call (sort + adjacent-compare mask over ALL its urls
    at once).  Python call count = P, not |urls|.  Memory bound: one
    partition must fit a worker — size ``num_partitions`` ≈ corpus_bytes /
    worker_heap at scale."""
    P = num_partitions or default_num_partitions()

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column("__part", partition_ids(b["url"], P))

    parted = ds.map_batches(add_part, batch_format="pyarrow",
                            zero_copy_batch=True)
    return parted.groupby("__part").map_groups(_keep_latest,
                                               batch_format="pyarrow")


def dedup_pages(ds, *, combine: bool = True, strategy: str = "partition",
                num_partitions: int | None = None):
    """pages Dataset → pages Dataset with one row per url.

    ``combine=True`` runs the vectorized per-batch combiner before any
    shuffle (pure win when duplicates cluster in time).

    ``strategy="partition"`` (default): hash-partition by url + one
    vectorized reduce per partition — ONE shuffle of the combined stream,
    zero per-url Python, and a STRICT one-row-per-url guarantee (each url
    lives entirely inside one partition group).

    ``strategy="join"``: the survivor-index two-pass — pass 1 reduces
    (url → max rank string) with a vectorized ``Max`` groupby; pass 2
    re-reads the stream, hash-joins the tiny rank index back and filters.
    Useful when the combined stream cannot be shuffled whole (e.g. the
    reduce must avoid moving payloads at all costs and re-reading from
    storage is cheaper); the join output is finalized with the same
    hash-partitioned reduce so the one-row-per-url guarantee holds even
    when max-rank ties straddle join-output block boundaries.

    ``strategy="groups"``: the per-url ``map_groups`` reducer — simplest
    plan, but one Python call per url; fine up to ~10^6 urls, pathological
    at web scale.

    Survivor CONTENT is identical between strategies by construction
    (same (ts, bytes, whole-row digest) total order).
    """
    if combine:
        ds = ds.map_batches(_keep_latest, batch_format="pyarrow",
                            zero_copy_batch=True)
    if strategy == "partition":
        return _partition_reduce(ds, num_partitions)
    if strategy == "groups":
        return ds.groupby("url").map_groups(_keep_latest,
                                            batch_format="pyarrow")

    from ..util import (ds_arrow_schema, grouped_arrow_aggregate,
                        schema_pinned_join)

    if num_partitions is None:
        num_partitions = max(2, min(32, cluster_cpus()))

    # pages schema is cheap here (read_parquet metadata / first block);
    # needed to pin the join against the groupby output's schema-less
    # empty partitions (see util.schema_pinned_join)
    pages_schema = ds_arrow_schema(ds)
    ranked_schema = pages_schema.append(pa.field("__rank", pa.string()))

    ranked = ds.map_batches(
        lambda b: b.append_column(
            "__rank", as_array(_rank_key_batch(b)["__rank"])),
        batch_format="pyarrow", zero_copy_batch=True)
    best = grouped_arrow_aggregate(
        ranked.map_batches(lambda b: b.select(["url", "__rank"]),
                           batch_format="pyarrow", zero_copy_batch=True),
        "url", [("__rank", "max", "__best")],
        num_partitions=num_partitions)
    joined = schema_pinned_join(
        ranked, best, on=("url",), num_partitions=num_partitions,
        left_schema=ranked_schema,
        right_schema=pa.schema([("url", pages_schema.field("url").type),
                                ("__best", pa.string())]))

    def keep_best(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["__rank"], b["__best"]))
        return t.drop_columns(["__rank", "__best"])

    survivors = joined.map_batches(keep_best, batch_format="pyarrow",
                                   zero_copy_batch=True)
    # max-rank ties are bit-identical by construction (the rank embeds the
    # whole-row digest), but identical copies can still straddle an output
    # block boundary inside a join partition — the partitioned reduce
    # restores the strict guarantee without any per-url Python
    return _partition_reduce(survivors, num_partitions)


def exact_dedup_sql_note() -> None:  # pragma: no cover - doc anchor
    """The harness oracle for this stage is ``events_latest_per_user`` (the
    same keep-latest-per-key semantics on the driver's events table)."""
