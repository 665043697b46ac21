"""Training-sequence packing — assign every document its token range in
the concatenated corpus stream and the fixed-length training sequences it
lands in.

The GPT-style pretraining packing step: documents are concatenated in a
deterministic order (ascending id) into one token stream, which is then
chunked into fixed ``seq_len`` sequences; a document may span several.
The output (id, n_tokens, tok_start, seq_first, seq_last) is exactly the
manifest a sharded tokenizer/writer needs to emit its sequences
independently — the webtext analogue of the reference's reading-order
page→block→line serialization (BasePageHandle reading order), globalized
across the corpus.

Scale design — a DISTRIBUTED PREFIX SUM, the one primitive the rest of
the repo's patterns don't cover:

1. bounds pass: one ``Min/Max`` aggregate over the id column picks B
   contiguous id ranges ("buckets") — range partitioning, because a
   prefix sum needs a total order, which hash partitioning destroys;
2. totals pass: per-batch partial token sums PER BUCKET (combiner, ≤B
   rows per batch) → tiny ``groupby(bucket).Sum`` → the driver holds B
   totals and forms their exclusive prefix (B ≈ 2×CPUs — bounded, like
   the IVF centroid build);
3. offsets pass: ONE range shuffle co-locates each bucket; a single
   vectorized pass per bucket sorts by id, local-cumsums, and adds the
   bucket's global prefix.

Three passes over a slim (id, weight) projection; the input Dataset is
re-executed per pass (Ray re-runs shared sub-DAGs per consumer), so feed
this a cheap projection — pre-compute the weight column from raw text
ONCE into a slim table if tokenization is expensive.

Null/zero handling: a null weight costs 0 (``SUM(COALESCE(w,0)) OVER``
semantics, same as :func:`capping.budget_cap_per_key`); documents with
0 tokens span no sequence — null ``seq_first``/``seq_last``.  Rows with
a null id are dropped (a prefix sum is undefined without an order key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import default_num_partitions, ds_arrow_schema


def pack_sequences(ds, *, seq_len: int, id_col: str = "doc_id",
                   weight_col: str = "n_tokens",
                   num_buckets: int | None = None):
    """(id, weight, tok_start, seq_first, seq_last) over the whole corpus
    stream, ids ascending.  See module docstring for the 3-pass plan."""
    from ray.data.aggregate import Max, Min, Sum

    B = num_buckets or default_num_partitions()

    def drop_null_ids(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b[id_col]))

    slim = ds.map_batches(drop_null_ids, batch_format="pyarrow",
                          zero_copy_batch=True)

    # pass 1: id bounds → B contiguous ranges
    bounds = slim.aggregate(Min(id_col, alias_name="lo"),
                            Max(id_col, alias_name="hi"))
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:        # empty input
        # Ray never invokes map_batches UDFs on empty blocks, so build the
        # typed 5-column empty table statically (pagerank_int precedent).
        import ray
        id_type = ds_arrow_schema(ds).field(id_col).type
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], id_type),
            weight_col: pa.array([], pa.int64()),
            "tok_start": pa.array([], pa.int64()),
            "seq_first": pa.array([], pa.int64()),
            "seq_last": pa.array([], pa.int64()),
        }))
    span = int(hi) - int(lo) + 1

    def bucket_of(ids: pa.Array) -> np.ndarray:
        rel = np.asarray(ids, dtype=np.int64) - int(lo)
        return (rel * B) // span

    # pass 2: per-bucket token totals (combiner → tiny groupby → driver)
    def bucket_partials(b: pa.Table) -> pa.Table:
        w = np.asarray(pc.fill_null(pc.cast(b[weight_col], pa.int64()), 0))
        bk = bucket_of(b[id_col])
        acc = np.zeros(B, dtype=np.int64)
        np.add.at(acc, bk, w)      # int64-exact (bincount would go float64)
        return pa.table({
            "__bucket": pa.array(np.arange(B, dtype=np.int64)),
            "partial": pa.array(acc),
        })

    totals_rows = (slim.map_batches(bucket_partials, batch_format="pyarrow",
                                    zero_copy_batch=True)
                   .groupby("__bucket")
                   .aggregate(Sum("partial", alias_name="total"))
                   .take_all())          # ≤ B rows — bounded by design
    totals = np.zeros(B, dtype=np.int64)
    for r in totals_rows:
        totals[r["__bucket"]] = r["total"]
    prefix = np.concatenate(([0], np.cumsum(totals)[:-1]))  # exclusive

    # pass 3: range shuffle → one vectorized offsets pass per bucket
    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__bucket", pa.array(bucket_of(b[id_col]), pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([(id_col, "ascending")])
        w = np.asarray(pc.fill_null(pc.cast(t[weight_col], pa.int64()), 0))
        bk = int(t["__bucket"][0].as_py())
        start = prefix[bk] + np.cumsum(w) - w
        nonzero = w > 0
        first = start // seq_len
        last = (start + w - 1) // seq_len
        nz = pa.array(nonzero)
        null_i = pa.scalar(None, pa.int64())
        return pa.table({
            id_col: t[id_col],
            weight_col: pc.cast(t[weight_col], pa.int64()),
            "tok_start": pa.array(start, pa.int64()),
            "seq_first": pc.if_else(nz, pa.array(first, pa.int64()), null_i),
            "seq_last": pc.if_else(nz, pa.array(last, pa.int64()), null_i),
        })

    return (slim.map_batches(add_bucket, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("__bucket").map_groups(per_bucket,
                                            batch_format="pyarrow"))


def pack_sequences_sql(seq_len: int, *, table: str = "m",
                       id_col: str = "doc_id",
                       weight_col: str = "n_tokens") -> str:
    """DuckDB oracle: global window cumsum in id order."""
    # CAST everything derived from the window SUM back to BIGINT: DuckDB's
    # window SUM(BIGINT) returns HUGEINT, which lands as decimal/float64 in
    # the comparison frame while the engine emits int64 (hash mismatch).
    w = f"COALESCE({weight_col}, 0)"
    return f"""
SELECT {id_col}, CAST({weight_col} AS BIGINT) AS {weight_col},
       CAST(tok_start AS BIGINT) AS tok_start,
       CASE WHEN w0 = 0 THEN NULL
            ELSE CAST(tok_start // {seq_len} AS BIGINT) END AS seq_first,
       CASE WHEN w0 = 0 THEN NULL
            ELSE CAST((tok_start + w0 - 1) // {seq_len} AS BIGINT)
            END AS seq_last
FROM (
  SELECT {id_col}, {weight_col}, {w} AS w0,
         SUM({w}) OVER (ORDER BY {id_col}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - {w} AS tok_start
  FROM {table} WHERE {id_col} IS NOT NULL)"""
