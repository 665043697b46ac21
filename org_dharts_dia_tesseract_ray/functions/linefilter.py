"""C4-style line-level filtering — per-line cleanup rules applied inside
each document, then the document reassembled from its surviving lines.

The C4 recipe (Raffel et al. 2020, §2.2): keep only lines that end in
terminal punctuation and have at least ``min_words`` words; drop lines
containing boilerplate markers (``javascript``, ``lorem ipsum``, curly
braces); drop whole documents left with fewer than ``min_lines`` lines.

This is a per-record structural rewrite — the webtext analogue of the
reference's block-level filtering (page-seg modes dropping non-text
blocks, html_extract boilerplate stripping) applied at line rather than
DOM-block granularity.

Shape: stateless ``map_batches``, zero shuffle.  The whole batch's lines
are processed in ONE vectorized pass: ``split_pattern`` explodes every
document's lines into a single flat array with ``list_parent_indices``
lineage, the three rules evaluate as flat boolean kernels, and surviving
lines are re-listed per document via an offsets rebuild
(``searchsorted`` on the kept parents) + ``binary_join`` — no Python per
line or per document.

Null text propagates (null out, null counts) on both sides; the DuckDB
oracle uses the same RE2 patterns via ``list_filter``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: a line must end with terminal punctuation (C4 rule 1)
TERMINAL_RE = r'[.!?"\']\s*$'
#: boilerplate markers (C4 rules: javascript notices, lorem ipsum, code)
BLACKLIST_RE = r"(?i)javascript|lorem ipsum|\{"
#: word = maximal non-whitespace run (shared with the oracle)
WORD_RE = r"\S+"


def line_filter_batch(batch: pa.Table, *, text_col: str = "text",
                      id_col: str = "doc_id", min_words: int = 3,
                      min_lines: int = 2) -> pa.Table:
    """(id, text_kept, n_lines, n_kept, keep_doc) per document."""
    text = batch[text_col]
    lines = pc.split_pattern(text, "\n")
    n_docs = len(lines)
    flat = pc.list_flatten(lines)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = np.asarray(pc.list_parent_indices(lines), dtype=np.int64)

    ok = np.asarray(pc.greater_equal(
        pc.count_substring_regex(flat, WORD_RE), min_words))
    ok &= np.asarray(pc.match_substring_regex(flat, TERMINAL_RE))
    ok &= ~np.asarray(pc.match_substring_regex(flat, BLACKLIST_RE))

    sel = np.flatnonzero(ok)
    kept_lines = flat.take(pa.array(sel, pa.int64()))
    kept_par = parents[sel]
    # per-doc list offsets of the kept lines (kept_par is sorted because
    # list_flatten preserves document order)
    offsets = np.searchsorted(kept_par, np.arange(n_docs + 1))
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept_lines),
        "\n")

    valid = pc.is_valid(text)
    null_str = pa.scalar(None, pa.string())
    null_int = pa.scalar(None, pa.int64())
    n_lines = np.bincount(parents, minlength=n_docs)
    n_kept = np.bincount(kept_par, minlength=n_docs)
    n_lines_a = pc.if_else(valid, pa.array(n_lines, pa.int64()), null_int)
    n_kept_a = pc.if_else(valid, pa.array(n_kept, pa.int64()), null_int)
    return pa.table({
        id_col: batch[id_col],
        "text_kept": pc.if_else(valid, joined, null_str),
        "n_lines": n_lines_a,
        "n_kept": n_kept_a,
        "keep_doc": pc.greater_equal(n_kept_a, min_lines),
    })


def apply_line_filter(ds, **kw):
    return ds.map_batches(lambda b: line_filter_batch(b, **kw),
                          batch_format="pyarrow", zero_copy_batch=True)


def line_filter_sql(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id", min_words: int = 3,
                    min_lines: int = 2) -> str:
    """DuckDB oracle — same RE2 rules through ``list_filter``."""
    c = text_col
    term = TERMINAL_RE.replace("'", "''")
    keep = (f"x -> len(regexp_extract_all(x, '{WORD_RE}')) >= {min_words} "
            f"AND regexp_matches(x, '{term}') "
            f"AND NOT regexp_matches(x, '{BLACKLIST_RE}')")
    split = f"regexp_split_to_array({c}, '\n')"
    kept = f"list_filter({split}, {keep})"
    return f"""
SELECT {id_col},
  array_to_string({kept}, chr(10)) AS text_kept,
  CAST(len({split}) AS BIGINT) AS n_lines,
  CAST(len({kept}) AS BIGINT) AS n_kept,
  len({kept}) >= {min_lines} AS keep_doc
FROM {table}"""
