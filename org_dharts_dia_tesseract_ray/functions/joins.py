"""Distributed as-of join (time-series lookup join).

Ray Data has no native as-of join; this is the custom-operator composition
the engine provides (SURVEY.md §2.5 "Joins: absent in reference"): for each
left row, the latest right row with ``right.ts ≤ left.ts`` within the same
key.

Plan shape — co-partition + per-key vectorized merge:

1. both sides are slimmed, schema-aligned and tagged, then hash-shuffled
   ONCE together by the join key (``groupby(key)``) — the union rides one
   shuffle, not two;
2. each key group is merged with ``np.searchsorted`` (sorted right-side
   timestamps against left timestamps) — O((l+r) log r) numpy per key, no
   per-row Python;
3. right-side ties on (key, ts) are pre-reduced to one row (max of the
   value column) so the result is deterministic — mirrored in the DuckDB
   ``ASOF JOIN`` oracle.

Partitioning assumption: one key's rows fit one group (true for per-user /
per-host streams; salt the key if a single entity's history exceeds a
worker).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def broadcast_lookup(ds, dim_ds, *, key: str, dim_key: str,
                     carry: dict[str, str], concurrency=(1, 8)):
    """Broadcast (map-side) dimension join — the small-side pattern.

    The dimension table is collected ONCE, built into Arrow lookup arrays,
    ``ray.put`` into the object store, and read zero-copy by every actor in
    ``__init__``; each batch is enriched with one vectorized ``index_in`` +
    ``take`` — no shuffle at all.  Valid while the dimension fits a node
    (the reference's analogue: its ``tessdata`` model broadcast to every
    factory, ImageAnalyzerFactory.java:85-104).

    ``carry`` maps dimension column → output column name.
    """
    import ray

    dim = dim_ds.take_all()
    dim_keys = pa.array([r[dim_key] for r in dim])
    dim_cols = {out: pa.array([r[src] for r in dim])
                for src, out in carry.items()}
    ref = ray.put((dim_keys, dim_cols))

    class Enrich:
        def __init__(self, r):
            self.keys, self.cols = ray.get(r)

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b[key].cast(self.keys.type),
                              value_set=self.keys)
            for out, arr in self.cols.items():
                b = b.append_column(out, arr.take(idx))
            return b

    return ds.map_batches(Enrich, fn_constructor_args=(ref,),
                          batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=concurrency)


def range_join_count(left_ds, right_ds, *, key: str, left_ts: str,
                     right_start: str, right_end: str,
                     out_col: str = "n_in_range"):
    """Range-join aggregate: for each right interval, how many left rows
    fall inside ``[start, end]`` within the same key.

    Co-partition by key (one shuffle via the same union trick as
    :func:`asof_join`); per key, counts come from two ``searchsorted``
    passes over the sorted left timestamps — O((l+r) log l) per key, exact
    for arbitrarily overlapping intervals (each interval queries the sorted
    array independently; no pair materialization).
    """
    left_slim = left_ds.map_batches(
        lambda b: pa.table({key: b[key], "__lts": b[left_ts],
                            "__rs": pa.nulls(b.num_rows, b[left_ts].type),
                            "__re": pa.nulls(b.num_rows, b[left_ts].type),
                            "__side": pa.array([0] * b.num_rows, pa.int8())}),
        batch_format="pyarrow", zero_copy_batch=True)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({key: b[key],
                         "__lts": pa.nulls(n, b[right_start].type),
                         "__rs": b[right_start], "__re": b[right_end],
                         "__side": pa.array([1] * n, pa.int8())})

    right_tagged = right_ds.map_batches(tag_right, batch_format="pyarrow",
                                        zero_copy_batch=True)
    unioned = left_slim.union(right_tagged)

    def merge(group: pa.Table) -> pa.Table:
        side = np.asarray(group["__side"])
        lt = group.filter(pa.array(side == 0))
        rt = group.filter(pa.array(side == 1))
        if rt.num_rows == 0:
            return pa.table({key: pa.array([], group[key].type),
                             "range_start": pa.array([], group["__rs"].type),
                             "range_end": pa.array([], group["__re"].type),
                             out_col: pa.array([], pa.int64())})
        lts = np.sort(np.asarray(pc.cast(lt["__lts"], pa.int64())))
        rs = np.asarray(pc.cast(rt["__rs"], pa.int64()))
        re_ = np.asarray(pc.cast(rt["__re"], pa.int64()))
        lo = np.searchsorted(lts, rs, side="left")
        hi = np.searchsorted(lts, re_, side="right")
        return pa.table({
            key: rt[key],
            "range_start": rt["__rs"],
            "range_end": rt["__re"],
            out_col: pa.array(np.maximum(hi - lo, 0), pa.int64()),
        })

    return unioned.groupby(key).map_groups(merge, batch_format="pyarrow")


def asof_join(left_ds, right_ds, *, key: str, left_ts: str, right_ts: str,
              value_col: str, out_col: str | None = None):
    """Left as-of join: every left row, plus ``out_col`` = value of the
    latest right row at-or-before its timestamp (null if none)."""
    from ray.data.aggregate import Max

    out_col = out_col or f"asof_{value_col}"
    left_schema = left_ds.schema()
    left_names = list(left_schema.names)
    left_types = {n: t for n, t in zip(left_schema.names, left_schema.types)}
    rts_type = dict(zip(right_ds.schema().names,
                        right_ds.schema().types))[right_ts]
    rval_type = dict(zip(right_ds.schema().names,
                         right_ds.schema().types))[value_col]

    # pre-reduce right ties deterministically: one row per (key, ts)
    right_slim = (right_ds
                  .map_batches(lambda b: pa.table({
                      key: b[key],
                      right_ts: b[right_ts],
                      value_col: b[value_col]}),
                      batch_format="pyarrow", zero_copy_batch=True)
                  .groupby([key, right_ts])
                  .aggregate(Max(value_col, alias_name=value_col)))

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {n: b[n] for n in left_names}
        cols["__rts"] = pa.nulls(b.num_rows, rts_type)
        cols["__rval"] = pa.nulls(b.num_rows, rval_type)
        cols["__side"] = pa.array([0] * b.num_rows, pa.int8())
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {}
        for n in left_names:
            if n == key:
                cols[n] = b[key]
            else:
                cols[n] = pa.nulls(b.num_rows, left_types[n])
        cols["__rts"] = b[right_ts]
        cols["__rval"] = b[value_col]
        cols["__side"] = pa.array([1] * b.num_rows, pa.int8())
        return pa.table(cols)

    left_tagged = left_ds.map_batches(tag_left, batch_format="pyarrow",
                                      zero_copy_batch=True)
    right_tagged = right_slim.map_batches(tag_right, batch_format="pyarrow",
                                          zero_copy_batch=True)
    unioned = left_tagged.union(right_tagged)

    def merge(group: pa.Table) -> pa.Table:
        side = np.asarray(group["__side"])
        lsel = pa.array(side == 0)
        lt = group.filter(lsel)
        out_cols = {n: lt[n] for n in left_names}
        n_right = int((side == 1).sum())
        if n_right == 0:
            vals = pa.nulls(lt.num_rows, rval_type)
        else:
            rt = group.filter(pa.array(side == 1))
            rts = np.asarray(pc.cast(rt["__rts"], pa.int64()))
            rvals = rt["__rval"]
            if isinstance(rvals, pa.ChunkedArray):
                rvals = rvals.combine_chunks()
            order = np.argsort(rts, kind="stable")
            rts = rts[order]
            rvals = rvals.take(pa.array(order))
            lts = np.asarray(pc.cast(lt[left_ts], pa.int64()))
            idx = np.searchsorted(rts, lts, side="right") - 1
            take = pa.array(np.where(idx >= 0, idx, 0), pa.int64())
            vals = rvals.take(take)
            vals = pc.if_else(pa.array(idx >= 0), vals,
                              pa.nulls(lt.num_rows, vals.type))
        out_cols[out_col] = vals
        return pa.table(out_cols)

    return unioned.groupby(key).map_groups(merge, batch_format="pyarrow")
