"""Grouped order statistics — exact quantiles per key.

Corpus profiling needs distribution shape (doc-length quantiles per
language/source drive filtering thresholds).  Exact per-group quantiles via
the engine's hash-partition pattern: ``__part = hash(key) % P`` is a pure
vectorized column, ONE ``groupby(__part)`` shuffle co-locates each key, and
every partition is processed by a single call that sorts once and walks its
key runs — Python call count = P, not |keys|, so high-cardinality keys
(quantiles per order, per host) cost no per-key Ray overhead.  Within a
run ``np.percentile`` (linear interpolation — bit-compatible with DuckDB
``quantile_cont`` modulo double-rounding noise, hence the shared 4 dp
quantization).

Scale note: for sketch-grade accuracy at extreme cardinality × huge groups,
switch to a mergeable KLL/t-digest partial per batch; exact per-partition
sorting is the right answer while one partition fits a worker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import (default_num_partitions, key_change_mask, partition_ids,
                    round_half_away)


def grouped_quantiles(ds, *, key: str, value_col: str,
                      quantiles=(0.5, 0.9, 0.99),
                      num_partitions: int | None = None):
    """(key, q50, q90, …) — exact linear-interpolation quantiles per group."""
    qcols = [f"q{int(q * 100)}" for q in quantiles]
    qpcts = [q * 100 for q in quantiles]
    P = num_partitions or default_num_partitions()

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column("__part", partition_ids(b[key], P))

    def per_partition(g: pa.Table) -> pa.Table:
        t = g.sort_by([(key, "ascending")])
        n = t.num_rows
        vals = np.asarray(t[value_col], dtype=np.float64)
        bounds = np.flatnonzero(key_change_mask(t[key], n))
        ends = np.r_[bounds[1:], n]
        out_q = [np.empty(len(bounds), dtype=np.float64) for _ in qpcts]
        for i, (s, e) in enumerate(zip(bounds, ends)):
            res = np.percentile(vals[s:e], qpcts, method="linear")
            for j, v in enumerate(res):
                out_q[j][i] = round_half_away(float(v), 4)
        keys = t[key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        cols = {key: keys.take(pa.array(bounds, pa.int64()))}
        for name, arr in zip(qcols, out_q):
            cols[name] = pa.array(arr, pa.float64())
        return pa.table(cols)

    parted = ds.map_batches(add_part, batch_format="pyarrow",
                            zero_copy_batch=True)
    return parted.groupby("__part").map_groups(per_partition,
                                               batch_format="pyarrow")


def grouped_quantiles_sql(key: str = "lang", value_col: str = "n_chars",
                          table: str = "documents",
                          quantiles=(0.5, 0.9, 0.99)) -> str:
    cols = ",\n  ".join(
        f"round(quantile_cont({value_col}, {q}) * 10000.0) / 10000.0 "
        f"AS q{int(q * 100)}"
        for q in quantiles)
    return f"SELECT {key},\n  {cols}\nFROM {table} GROUP BY {key}"
