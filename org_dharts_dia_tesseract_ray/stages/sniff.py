"""Payload sniffing prep stage — cheap, stateless, vectorized.

The analogue of the reference's format detection at read time
(``ImageIOHelper.getIIOImageList`` extension dispatch + PDF rejection,
/root/reference/src/.../ImageIOHelper.java:270-327): classify every payload
(html/pdf/empty/error) and record its size BEFORE the expensive extract
stage, so that

* skew routing can split oversized documents to a dedicated pool on the
  ``payload_bytes`` column (SURVEY.md §4), and
* the extract stage never sees a surprise (PDF vs HTML dispatch is a
  column read, not a re-sniff).

Pure ``pyarrow.compute`` — no Python row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..extract.types import PayloadKind


def sniff_batch(batch: pa.Table) -> pa.Table:
    """Append ``payload_bytes:int64`` and ``payload_kind:string``.

    Vectorized: byte length via ``binary_length``; PDF magic via a binary
    slice compare; NUL-byte junk via substring match; emptiness via
    whitespace-stripped length.
    """
    html = batch["html"]
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    nbytes = pc.binary_length(html).cast(pa.int64())
    nbytes = pc.coalesce(nbytes, pa.scalar(0, pa.int64()))

    # %PDF- magic in the first 8 bytes (lstrip cheaply via slice-8 search)
    head = pc.binary_slice(html, 0, 8)
    is_pdf = pc.match_substring(head.cast(pa.binary()), b"%PDF-")
    # NUL byte anywhere ⇒ binary junk
    has_nul = pc.match_substring(html, b"\x00")
    # empty / whitespace-only — must be safe on non-UTF8 payloads, so strip
    # ASCII whitespace bytes via binary replace rather than utf8_trim
    no_ws = html
    for ws in (b" ", b"\t", b"\r", b"\n", b"\x0b", b"\x0c"):
        no_ws = pc.replace_substring(no_ws, ws, b"")
    is_empty = pc.or_kleene(pc.is_null(html),
                            pc.equal(pc.binary_length(no_ws), 0))

    kind = pc.if_else(
        is_empty, pa.scalar(PayloadKind.EMPTY),
        pc.if_else(
            is_pdf, pa.scalar(PayloadKind.PDF),
            pc.if_else(has_nul, pa.scalar(PayloadKind.ERROR),
                       pa.scalar(PayloadKind.HTML)),
        ),
    )
    out = batch
    for name, col in (("payload_bytes", nbytes), ("payload_kind", kind)):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, col)
    return out


def apply_sniff(ds, **kwargs):
    """Dataset → Dataset with payload_bytes / payload_kind columns."""
    return ds.map_batches(sniff_batch, batch_format="pyarrow",
                          zero_copy_batch=True, **kwargs)
