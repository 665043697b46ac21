"""Exact URL deduplication — keep the latest capture per url.

The reference has no cross-document operators at all (single-doc loop,
SURVEY.md §2.5), but a Common-Crawl-shaped corpus requires exact URL dedup
before extraction.  Design for scale:

1. **per-batch combiner** (``map_batches``): drop within-batch duplicates
   first, shrinking the shuffle input — the partial-aggregation pattern;
2. a reduce keyed on ``url`` — either a vectorized rank-join (default) or a
   per-group sort reducer.

Tie-break is fully deterministic: max ``warc_ts`` (nulls rank lowest), then
max payload length, then greatest content digest — parallelism can never
change the survivor (byte-identity gate).  Rows that are COMPLETELY
identical (url, ts, bytes) collapse to one row; since they are
byte-identical, which physical copy survives is unobservable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..util import as_array, cluster_cpus, first_per_key


def _ts_key(batch: pa.Table) -> pa.Array:
    """warc_ts as a null-free int64 sort key (null → 0, ranking lowest —
    matches the rank-string encoding so both strategies agree)."""
    return as_array(pc.coalesce(pc.cast(batch["warc_ts"], pa.int64()),
                                pa.scalar(0, pa.int64())))


def _has_full_ties(t: pa.Table) -> bool:
    """True if any adjacent sorted rows share (url, __ts, __nb).

    Comparisons run on the null-free key columns — ``pc.equal`` on nulls
    yields null and ``pc.any`` would ignore the tie entirely."""
    if t.num_rows <= 1:
        return False
    same = None
    for col in ("url", "__ts", "__nb"):
        c = as_array(t[col])
        eq = pc.equal(c.slice(1), c.slice(0, len(c) - 1))
        same = eq if same is None else pc.and_(same, eq)
    return bool(pc.any(same).as_py())


def _keep_latest(batch: pa.Table) -> pa.Table:
    """Vectorized one-row-per-url reducer over an in-memory table."""
    if batch.num_rows <= 1:
        return batch
    nbytes = pc.coalesce(pc.binary_length(batch["html"]).cast(pa.int64()),
                         pa.scalar(0, pa.int64()))
    t = batch.append_column("__nb", as_array(nbytes))
    t = t.append_column("__ts", _ts_key(batch))
    t = t.sort_by([("url", "ascending"), ("__ts", "descending"),
                   ("__nb", "descending")])
    # full-tie hazard: equal (url, ts, length) but different bytes would
    # leave the survivor to sort stability — resolve with a content digest,
    # computed only when such ties exist (vanishingly rare in practice)
    if _has_full_ties(t):
        import hashlib
        dig = pa.array([hashlib.md5(v or b"").hexdigest()
                        for v in t["html"].to_pylist()], pa.string())
        t = t.append_column("__dig", dig)
        t = t.sort_by([("url", "ascending"), ("__ts", "descending"),
                       ("__nb", "descending"), ("__dig", "descending")])
        t = t.drop_columns(["__dig"])
    return first_per_key(t, "url").drop_columns(["__nb", "__ts"])


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

    ``strategy="join"`` (default, the 10^12-url path): a deliberate
    TWO-PASS algorithm — pass 1 reduces (url → max rank string) with a
    vectorized ``Max`` groupby; pass 2 re-reads the stream, hash-joins the
    tiny rank index back and filters.  The corpus is read twice (standard
    for survivor-index dedup) but no stage runs Python per url.  Rows that
    tie at the max rank are bit-identical by construction (the rank embeds
    the content digest), so the residual within-batch ``first_per_key``
    after the join restores the one-row-per-url guarantee without any
    cross-batch coordination: the hash join co-partitions each url, and
    identical leftovers beyond a batch boundary are removed by the final
    per-url mask running per batch — see note below.

    ``strategy="groups"``: the sort-based ``map_groups`` reducer — simpler
    plan (one shuffle), but one Python call per url group; fine up to ~10^6
    urls per node, pathological at web scale.

    Survivor CONTENT is identical between strategies by construction
    (same (ts, bytes, digest) total order, digest embedded in the rank).
    """
    if combine:
        ds = ds.map_batches(_keep_latest, batch_format="pyarrow",
                            zero_copy_batch=True)
    if strategy == "groups":
        return ds.groupby("url").map_groups(_keep_latest,
                                            batch_format="pyarrow")

    from ray.data.aggregate import Max

    if num_partitions is None:
        # join aggregators occupy scheduling slots — more partitions than
        # CPUs deadlocks a small cluster and just adds overhead on a big one
        num_partitions = max(2, min(32, cluster_cpus()))

    ranked = ds.map_batches(
        lambda b: b.append_column(
            "__rank", as_array(_rank_key_batch(b)["__rank"])),
        batch_format="pyarrow", zero_copy_batch=True)
    best = (ranked
            .map_batches(lambda b: b.select(["url", "__rank"]),
                         batch_format="pyarrow", zero_copy_batch=True)
            .groupby("url")
            .aggregate(Max("__rank", alias_name="__best")))
    joined = ranked.join(best, join_type="inner",
                         num_partitions=num_partitions, on=("url",))

    def finalize(b: pa.Table) -> pa.Table:
        """Keep max-rank rows, then collapse bit-identical leftovers.

        Rows tying at the max rank are bit-identical by construction (the
        rank embeds the content digest), so which copy survives is
        unobservable.  The per-batch mask removes duplicates within each
        join-output batch; a duplicate could only be emitted twice if
        identical copies straddle an output-batch boundary inside one url
        partition (rare) — and even then the extra row is byte-identical.
        Use ``strategy="groups"`` where a strict one-physical-row-per-url
        guarantee outweighs web-scale cost.
        """
        t = b.filter(pc.equal(b["__rank"], b["__best"]))
        t = t.sort_by([("url", "ascending")])
        return first_per_key(t, "url").drop_columns(["__rank", "__best"])

    return joined.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)
