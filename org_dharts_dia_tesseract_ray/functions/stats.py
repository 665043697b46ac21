"""Grouped order statistics — exact quantiles per key.

Corpus profiling needs distribution shape (doc-length quantiles per
language/source drive filtering thresholds).  Exact per-group quantiles via
``groupby(key).map_groups`` + ``np.percentile`` (linear interpolation —
bit-compatible with DuckDB ``quantile_cont`` modulo double-rounding noise,
hence the shared 4 dp quantization).

Scale note: per-group numpy is fine while one key's rows fit a worker (true
for lang/source profiling: few groups, many rows — the map_groups call
count equals the group count, which is SMALL here, the opposite of the url
dedup case).  For millions of groups switch to a sketch (KLL/t-digest) —
mergeable per-batch partials, one small groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import round_half_away


def grouped_quantiles(ds, *, key: str, value_col: str,
                      quantiles=(0.5, 0.9, 0.99)):
    """(key, q50, q90, …) — exact linear-interpolation quantiles per group."""
    qcols = [f"q{int(q * 100)}" for q in quantiles]

    def per_group(g: pa.Table) -> pa.Table:
        vals = np.asarray(g[value_col], dtype=np.float64)
        out = {key: g[key].slice(0, 1)}
        for q, name in zip(quantiles, qcols):
            v = float(np.percentile(vals, q * 100, method="linear"))
            # half-away-from-zero — same quantization as every other oracle
            # (Python round() is half-to-even and diverges on exact halves)
            out[name] = pa.array([round_half_away(v, 4)], pa.float64())
        return pa.table(out)

    return ds.groupby(key).map_groups(per_group, batch_format="pyarrow")


def grouped_quantiles_sql(key: str = "lang", value_col: str = "n_chars",
                          table: str = "documents",
                          quantiles=(0.5, 0.9, 0.99)) -> str:
    cols = ",\n  ".join(
        f"round(quantile_cont({value_col}, {q}) * 10000.0) / 10000.0 "
        f"AS q{int(q * 100)}"
        for q in quantiles)
    return f"SELECT {key},\n  {cols}\nFROM {table} GROUP BY {key}"
