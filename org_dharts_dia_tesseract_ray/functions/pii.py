"""PII redaction — scrub emails / phone numbers / IPv4 addresses from
document text, with per-category match counts.

The standard privacy pass of a web-corpus pipeline (C4 keeps a badwords
filter, The Pile / Dolma scrub emails+IPs).  This is the webtext analogue
of the reference's character filtering surface (char whitelist/blacklist,
TessAPI.java VAR_CHAR_WHITELIST applied in html_extract._charfilter): a
per-record text rewrite driven by a declarative pattern config.

Shape: pure vectorized RE2 via ``pyarrow.compute`` — no shuffle, no state,
no Python per row.  Patterns are applied SEQUENTIALLY (email → phone →
IPv4), each counted on the text as it stands before its own replacement;
the DuckDB oracle nests ``regexp_replace`` in the same order, so counts
and the redacted text are bit-identical (both engines run RE2 with
leftmost, non-overlapping match semantics).

Null text propagates: null counts, null redacted text, null ``has_pii``
on both sides.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: RE2 patterns shared verbatim with the DuckDB oracle (single-backslash
#: classes survive a standard SQL string literal unchanged).
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d[\d\-() ]{6,}\d"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: replacement tokens — chosen to never re-match any pattern
EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def redact_pii_batch(batch: pa.Table, *, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """(id, redacted, n_emails, n_phones, n_ips, has_pii) per document."""
    t = batch[text_col]
    n_emails = pc.cast(pc.count_substring_regex(t, EMAIL_RE), pa.int64())
    t = pc.replace_substring_regex(t, EMAIL_RE, EMAIL_TOKEN)
    n_phones = pc.cast(pc.count_substring_regex(t, PHONE_RE), pa.int64())
    t = pc.replace_substring_regex(t, PHONE_RE, PHONE_TOKEN)
    n_ips = pc.cast(pc.count_substring_regex(t, IPV4_RE), pa.int64())
    t = pc.replace_substring_regex(t, IPV4_RE, IP_TOKEN)
    total = pc.add(pc.add(n_emails, n_phones), n_ips)
    return pa.table({
        id_col: batch[id_col],
        "redacted": t,
        "n_emails": n_emails,
        "n_phones": n_phones,
        "n_ips": n_ips,
        "has_pii": pc.greater(total, 0),
    })


def apply_redact_pii(ds, **kw):
    return ds.map_batches(lambda b: redact_pii_batch(b, **kw),
                          batch_format="pyarrow", zero_copy_batch=True)


def pii_sql(table: str = "documents", text_col: str = "text",
            id_col: str = "doc_id") -> str:
    """DuckDB oracle — same RE2 patterns, same sequential order."""
    c = text_col
    after_email = f"regexp_replace({c}, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g')"
    after_phone = (f"regexp_replace({after_email}, '{PHONE_RE}', "
                   f"'{PHONE_TOKEN}', 'g')")
    after_ip = (f"regexp_replace({after_phone}, '{IPV4_RE}', "
                f"'{IP_TOKEN}', 'g')")
    n_e = f"len(regexp_extract_all({c}, '{EMAIL_RE}'))"
    n_p = f"len(regexp_extract_all({after_email}, '{PHONE_RE}'))"
    n_i = f"len(regexp_extract_all({after_phone}, '{IPV4_RE}'))"
    return f"""
SELECT {id_col},
  {after_ip} AS redacted,
  CAST({n_e} AS BIGINT) AS n_emails,
  CAST({n_p} AS BIGINT) AS n_phones,
  CAST({n_i} AS BIGINT) AS n_ips,
  ({n_e} + {n_p} + {n_i}) > 0 AS has_pii
FROM {table}"""


def extract_contacts_batch(batch: pa.Table, *, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """The extract direction of the PII kernels: per document, the count
    of email mentions and the FIRST email (null when none) — contact
    harvesting / seed-list building, same RE2 pattern as the scrubber so
    extract and redact always agree on what counts as an email."""
    t = batch[text_col]
    n = pc.cast(pc.count_substring_regex(t, EMAIL_RE), pa.int64())
    first = pc.struct_field(
        pc.extract_regex(t, f"(?P<m>{EMAIL_RE})"), "m")
    return pa.table({id_col: batch[id_col], "n_emails": n,
                     "first_email": first})


def apply_extract_contacts(ds, **kw):
    return ds.map_batches(lambda b: extract_contacts_batch(b, **kw),
                          batch_format="pyarrow", zero_copy_batch=True)


def extract_contacts_sql(table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    return f"""
SELECT {id_col},
       CAST(len(regexp_extract_all({text_col}, '{EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CASE WHEN regexp_matches({text_col}, '{EMAIL_RE}')
            THEN regexp_extract({text_col}, '{EMAIL_RE}')
            ELSE NULL END AS first_email
FROM {table}"""
