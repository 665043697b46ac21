"""URL canonicalization — the Common-Crawl url-key normalization step.

Duplicate detection on a crawl keys on a CANONICAL url: scheme and host
are case-insensitive, default ports are redundant, fragments are
client-side only, and an empty path equals "/".  Normalizing before
:func:`..stages.dedup.dedup_pages` merges captures that differ only in
those encodings.

Fully vectorized RE2 kernels (pyarrow and DuckDB share RE2, so the SQL
oracle is bit-compatible); rows that do not look like absolute URLs pass
through unchanged.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_PARTS = (r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"      # scheme
          r"([^/?#]*)"                          # authority (host[:port])
          r"([^#]*)")                           # path + query (no fragment)

#: same grammar with named groups (pyarrow extract_regex requires them) —
#: DERIVED from _PARTS so engine and SQL oracle cannot desynchronize
_PARTS_NAMED = (_PARTS
                .replace("(", "(?P<scheme>", 1)
                .replace("://(", "://(?P<auth>", 1)
                .replace(")(", ")(?P<rest>", 1))
assert _PARTS_NAMED.count("?P<") == 3, _PARTS_NAMED


def normalize_urls_batch(batch: pa.Table, *, url_col: str = "url",
                         out_col: str = "url_norm") -> pa.Table:
    """Append ``out_col``: lowercase scheme+host, default ports stripped
    (:80 for http, :443 for https), fragment dropped, empty path → "/"."""
    url = batch[url_col]
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    nofrag = pc.replace_substring_regex(url, r"#.*$", "")
    parts = pc.extract_regex(nofrag, _PARTS_NAMED)
    ok = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    auth = pc.utf8_lower(pc.struct_field(parts, "auth"))
    rest = pc.struct_field(parts, "rest")
    auth = pc.if_else(pc.equal(scheme, "http"),
                      pc.replace_substring_regex(auth, r":80$", ""),
                      auth)
    auth = pc.if_else(pc.equal(scheme, "https"),
                      pc.replace_substring_regex(auth, r":443$", ""),
                      auth)
    rest = pc.if_else(pc.equal(rest, ""), pa.scalar("/"), rest)
    norm = pc.binary_join_element_wise(scheme, "://", auth, rest, "")
    out = pc.if_else(ok, norm, url)
    return batch.append_column(out_col, out)


def apply_normalize_urls(ds, **kw):
    return ds.map_batches(lambda b: normalize_urls_batch(b, **kw),
                          batch_format="pyarrow", zero_copy_batch=True)


def normalize_urls_sql_expr(col: str) -> str:
    """DuckDB expression computing the same canonical form (RE2 via
    regexp_*; same pattern strings as the Arrow kernels)."""
    nofrag = f"regexp_replace({col}, '#.*$', '')"
    scheme = (f"lower(regexp_extract({nofrag}, "
              f"'{_PARTS}', 1))")
    auth = (f"lower(regexp_extract({nofrag}, "
            f"'{_PARTS}', 2))")
    rest = f"regexp_extract({nofrag}, '{_PARTS}', 3)"
    auth_norm = (f"CASE WHEN {scheme} = 'http' THEN "
                 f"regexp_replace({auth}, ':80$', '') "
                 f"WHEN {scheme} = 'https' THEN "
                 f"regexp_replace({auth}, ':443$', '') "
                 f"ELSE {auth} END")
    rest_norm = f"CASE WHEN {rest} = '' THEN '/' ELSE {rest} END"
    return (f"CASE WHEN regexp_matches({nofrag}, '{_PARTS}') "
            f"THEN {scheme} || '://' || {auth_norm} || {rest_norm} "
            f"ELSE {col} END")
