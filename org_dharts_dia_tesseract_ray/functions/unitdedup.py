"""Global line/paragraph-level exact deduplication — every distinct text
unit survives only at its globally FIRST occurrence (minimal (doc, pos)),
and documents are reassembled from their surviving units.

The CCNet / RefinedWeb step that document-level dedup
(:mod:`dedup`) can't express: boilerplate lines ("all rights reserved",
cookie banners, nav menus) repeat across millions of documents that are
each globally unique as a whole.  Unit granularity is the separator
(``"\\n"`` for lines, ``"\\n\\n"`` for paragraphs).

Scale design — the text is shuffled exactly ONCE (the final doc-id join);
everything global moves as slim fixed-width rows:

1. **winners pass** (slim): one explode over the corpus emits
   ``(unit_hash: u64, packed: doc_id·2^20 + pos)`` — 16 bytes per unit
   occurrence, never the unit text — and a ``Min(packed)`` groupby picks
   each distinct unit's first occurrence.  The winner rows ARE the
   survivor list: ``packed`` decodes back to (doc, pos) with no second
   pass over the corpus.
2. **position packing** (slim): survivors hash-partition by doc id; one
   vectorized pass per partition folds each doc's surviving positions
   into a sorted int64 binary blob (run-boundary offsets, no per-key
   Python — a blob because Acero rejects list-typed join payloads).
3. **reassembly** (the one text shuffle): docs join their position list
   by doc id (:func:`util.schema_pinned_join` — the survivor side is
   aggregate-derived, the exact empty-block join hazard that helper
   exists for), then one vectorized pass re-splits each doc and takes
   the kept positions (flattened list arithmetic, no Python per doc).

A document whose every unit first occurred elsewhere is dropped entirely
(inner-join semantics — the document deduplicated away), matching the
SQL oracle's group-by over kept units.  Null-text documents contribute
no units and are likewise absent.  Positions are capped at 2^20 units
per document (packed-key arithmetic); the skew splitter upstream keeps
real documents far below this.

Winner selection groups by a 64-bit content hash (collision odds
~(#distinct units)²/2^64 — negligible), while the oracle groups by the
exact string; both pick min-(doc,pos) deterministically.

Reference analogue: connected-region merging dissolving duplicate blocks
(LayoutHandle block enumeration) — here the "region" is the identical
text unit and the merge is corpus-global.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import (as_array, default_num_partitions, key_change_mask,
                    partition_ids, ragged_arange, schema_pinned_join,
                    _string_hash64)

#: positions-per-document cap baked into the packed (doc, pos) key
_MAX_UNITS = 1 << 20


def _split_units(b: pa.Table, text_col: str, sep: str):
    """(units list-array, flat units, parents, lens) for the batch's
    non-null-text rows; caller must pre-filter null text."""
    units = pc.split_pattern(b[text_col], sep)
    flat = as_array(pc.list_flatten(units))
    parents = np.asarray(pc.list_parent_indices(units), dtype=np.int64)
    lens = np.asarray(pc.list_value_length(units), dtype=np.int64)
    return units, flat, parents, lens


def unit_dedup(ds, *, sep: str = "\n", text_col: str = "text",
               id_col: str = "doc_id", num_partitions: int | None = None):
    """(id, text_kept, n_units, n_kept) — see module docstring."""
    from ray.data.aggregate import Min

    P = num_partitions or default_num_partitions()

    def drop_null(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b[text_col]))

    docs = ds.map_batches(drop_null, batch_format="pyarrow",
                          zero_copy_batch=True)

    # ---- pass 1: slim explode → Min(packed) winners
    def explode(b: pa.Table) -> pa.Table:
        _, flat, parents, lens = _split_units(b, text_col, sep)
        if np.any(lens >= _MAX_UNITS):
            raise ValueError(f"document exceeds {_MAX_UNITS} units")
        pos = ragged_arange(lens)
        ids = np.asarray(b[id_col], dtype=np.int64)[parents]
        # int64 view of the uint64 hash: Ray's hash aggregate rebuilds
        # uint64 KEY columns via Python ints (>2^63 overflows C long →
        # pickled-object fallback on every shuffle block); the signed
        # reinterpretation is bijective so grouping is unchanged
        return pa.table({
            "h": pa.array(_string_hash64(flat).view(np.int64), pa.int64()),
            "packed": pa.array(ids * _MAX_UNITS + pos, pa.int64()),
        })

    winners = (docs.map_batches(explode, batch_format="pyarrow",
                                zero_copy_batch=True)
               .groupby("h").aggregate(Min("packed", alias_name="packed")))

    # ---- pass 2: decode winners → per-doc sorted position lists
    def decode(b: pa.Table) -> pa.Table:
        packed = np.asarray(b["packed"], dtype=np.int64)
        t = pa.table({
            id_col: pa.array(packed // _MAX_UNITS, pa.int64()),
            "pos": pa.array(packed % _MAX_UNITS, pa.int64()),
        })
        return t.append_column("__part", partition_ids(t[id_col], P))

    def pack_positions(g: pa.Table) -> pa.Table:
        # positions ride the join as a little-endian int64 BINARY blob —
        # Acero rejects list-typed non-key join columns (same trick as the
        # minhash shingle blobs, dedup._verify_jaccard_pairs)
        t = g.sort_by([(id_col, "ascending"), ("pos", "ascending")])
        n = t.num_rows
        change = key_change_mask(t[id_col], n)
        starts = np.flatnonzero(change)
        offsets = np.concatenate((starts, [n]))
        pos_vals = np.asarray(t["pos"], dtype=np.int64)
        blob = pa.BinaryArray.from_buffers(
            pa.binary(), len(starts),
            [None,
             pa.py_buffer((offsets * 8).astype(np.int32).tobytes()),
             pa.py_buffer(pos_vals.astype("<i8").tobytes())])
        return pa.table({
            id_col: as_array(t[id_col]).take(pa.array(starts, pa.int64())),
            "pos_blob": blob,
        })

    survivors = (winners.map_batches(decode, batch_format="pyarrow",
                                     zero_copy_batch=True)
                 .groupby("__part").map_groups(pack_positions,
                                               batch_format="pyarrow"))

    # ---- pass 3: the one text shuffle — docs ⋈ position lists, reassemble
    id_type = pa.int64()
    joined = schema_pinned_join(
        docs, survivors, on=(id_col,), num_partitions=P,
        left_schema=pa.schema([(id_col, id_type), (text_col, pa.string())]),
        right_schema=pa.schema([(id_col, id_type),
                                ("pos_blob", pa.binary())]))

    def reassemble(b: pa.Table) -> pa.Table:
        from ..util import flat_binary_view

        units, flat, parents, lens = _split_units(b, text_col, sep)
        doc_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
        data, _, blens = flat_binary_view(as_array(b["pos_blob"]))
        flat_pos = np.frombuffer(data.tobytes(), dtype="<i8")
        kept_offsets = blens // 8
        ppar = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                         kept_offsets)
        take = doc_off[ppar] + flat_pos
        kept_flat = flat.take(pa.array(take, pa.int64()))
        offs = np.concatenate(([0], np.cumsum(kept_offsets)))
        kept_list = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                             kept_flat)
        return pa.table({
            id_col: b[id_col],
            "text_kept": pc.binary_join(kept_list, sep),
            "n_units": pa.array(lens, pa.int64()),
            "n_kept": pa.array(kept_offsets, pa.int64()),
        })

    return joined.map_batches(reassemble, batch_format="pyarrow",
                              zero_copy_batch=True)


def unit_dedup_sql(*, sep_sql: str = "chr(10)", table: str = "documents",
                   text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB oracle: exact-string winners via min packed key, kept units
    re-aggregated in position order."""
    return f"""
WITH s AS (
  SELECT {id_col}, string_split({text_col}, {sep_sql}) AS arr
  FROM {table} WHERE {text_col} IS NOT NULL),
u AS (
  SELECT {id_col}, arr,
         unnest(range(len(arr))) AS pos
  FROM s),
u2 AS (
  SELECT {id_col}, pos, arr[pos + 1] AS unit, len(arr) AS n_units
  FROM u),
w AS (
  SELECT unit, min({id_col} * {_MAX_UNITS} + pos) AS packed
  FROM u2 GROUP BY unit)
SELECT u2.{id_col},
       string_agg(u2.unit, {sep_sql} ORDER BY u2.pos) AS text_kept,
       CAST(any_value(u2.n_units) AS BIGINT) AS n_units,
       CAST(count(*) AS BIGINT) AS n_kept
FROM u2 JOIN w
  ON u2.unit = w.unit AND u2.{id_col} * {_MAX_UNITS} + u2.pos = w.packed
GROUP BY u2.{id_col}"""
