"""WARC container source — ingest Common-Crawl-style WARC shards straight
into the pages schema the extraction pipeline consumes.

The reference ingests one image file per analyzer call
(ImageAnalyzerFactory.createImageAnalyzer, File-based overloads); the
web-corpus analogue of "the format the data actually arrives in" is the
ISO-28500 WARC container Common Crawl publishes.  This module implements
the subset the pipeline needs:

* :func:`write_warc` — serialize a pages table into `response`-record
  WARC shards (used by tests/benchmarks; byte-stable for a given input).
* :func:`read_warc` — ``ray.data.read_binary_files`` over the shard
  paths (one file = one task — the natural WARC parallelism, since
  records inside a shard are sequential by framing), then one
  ``map_batches`` parse per shard producing (url, warc_ts, html, text,
  lang) rows; ``text``/``lang`` come from WARC-Identified-* headers when
  present, else null.

Parsing walks records by their ``Content-Length`` framing (the
spec-correct way — never by splitting on magic bytes, which a payload
can contain).  The walk is a per-record Python loop, which is the right
altitude for an ingest boundary: records are KB-sized, the loop does two
header scans and zero-copy memoryview slices per record, and everything
downstream of the source stays vectorized.  Malformed records degrade to
an error row per shard remainder (the pipeline's never-throw-per-row
policy, extract/api.py) rather than poisoning the job.

Scale shape: shards are independent tasks (10^12 docs = ~10^7 shards on
a manifest), no shuffle, column pruning happens at the first transform
after parse.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

_CRLF = b"\r\n"
_TS_FMT = "%Y-%m-%dT%H:%M:%SZ"
_TS_FMT_US = "%Y-%m-%dT%H:%M:%S.%fZ"


def _ts_to_warc(us_since_epoch: int) -> bytes:
    dt = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc) + \
        _dt.timedelta(microseconds=int(us_since_epoch))
    if dt.microsecond:
        return dt.strftime(_TS_FMT_US).encode()
    return dt.strftime(_TS_FMT).encode()


_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _warc_to_ts(raw: bytes):
    s = raw.decode("ascii", "replace")
    for fmt in (_TS_FMT, _TS_FMT_US):
        try:
            dt = _dt.datetime.strptime(s, fmt).replace(
                tzinfo=_dt.timezone.utc)
            # integer arithmetic: float .timestamp()*1e6 truncates 1 µs on
            # a large fraction of values (e.g. …54.935922 → …54.935921)
            return (dt - _EPOCH) // _dt.timedelta(microseconds=1)
        except ValueError:
            continue
    return None


def _header_value(s: str) -> bytes:
    """CR/LF percent-encoded — a crawl-derived url containing CRLF must
    not be able to forge header lines or terminate the header block."""
    return s.replace("\r", "%0D").replace("\n", "%0A").encode()


def record_bytes(url: str, ts_us: int, html: bytes,
                 text: str | None = None, lang: str | None = None) -> bytes:
    """One WARC `response` record (header block + payload + 2×CRLF)."""
    headers = [b"WARC/1.0",
               b"WARC-Type: response",
               b"WARC-Target-URI: " + _header_value(url),
               b"WARC-Date: " + _ts_to_warc(ts_us)]
    if lang is not None:
        headers.append(b"WARC-Identified-Content-Language: "
                       + _header_value(lang))
    tail = text.encode() if text is not None else b""
    # Content-Length covers the WHOLE payload (spec framing — a foreign
    # WARC reader walks this file correctly); the non-standard sidecar
    # header tells OUR reader where html ends and the extracted-text
    # trailer begins.  Real crawls have no trailer and a null text column.
    headers.append(b"Content-Length: " + str(len(html) + len(tail)).encode())
    if text is not None:
        headers.append(b"X-Graft-Text-Length: " + str(len(tail)).encode())
    head = _CRLF.join(headers) + _CRLF + _CRLF
    return head + html + tail + _CRLF + _CRLF


def write_warc(table: pa.Table, out_dir: str, *, shards: int = 4,
               prefix: str = "crawl", gzip_records: bool = False) -> list:
    """Serialize a pages table into ``shards`` WARC files; returns paths.
    Deterministic: row order and bytes are a pure function of the input.
    ``gzip_records=True`` writes the Common-Crawl layout — one gzip
    MEMBER per record, concatenated (``.warc.gz``), so range requests
    can decompress single records."""
    import gzip
    import os

    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    per = (n + shards - 1) // shards
    ext = "warc.gz" if gzip_records else "warc"
    paths = []
    for s in range(shards):
        chunk = table.slice(s * per, per)
        if chunk.num_rows == 0:
            break
        path = os.path.join(out_dir, f"{prefix}-{s:05d}.{ext}")
        with open(path, "wb") as f:
            for i in range(chunk.num_rows):
                url = chunk["url"][i].as_py()
                if url is None:
                    continue   # unaddressable row — degrade, don't throw
                ts = chunk["warc_ts"][i].value   # µs since epoch
                html = chunk["html"][i].as_py() or b""
                text = chunk["text"][i].as_py()
                lang = chunk["lang"][i].as_py()
                # null timestamp serializes as the epoch (WARC-Date is
                # mandatory); null url/ts round-trips are lossy by design
                rec = record_bytes(url, ts or 0, html, text, lang)
                if gzip_records:
                    rec = gzip.compress(rec, mtime=0)  # byte-stable
                f.write(rec)
        paths.append(path)
    return paths


def parse_warc_bytes(blob: bytes) -> dict:
    """Parse one shard's bytes into pages-schema column lists (plus an
    ``error`` column).  Content-Length framing throughout:

    * non-`response` / URI-less records (a real crawl starts with
      `warcinfo` and interleaves `request`/`metadata`) are SKIPPED by
      their declared length — they cost one header scan, emit nothing;
    * only a record whose FRAMING is unknown (no parseable
      Content-Length, missing header terminator, or truncated payload)
      emits one error row covering the shard remainder and stops the
      walk — there is no way to resynchronize safely past it.

    Header names match case-insensitively with optional space after the
    colon (the spec allows both)."""
    urls, tss, htmls, texts, langs, errs = [], [], [], [], [], []
    view = memoryview(blob)
    pos = 0
    total = len(blob)
    while pos < total:
        # skip inter-record padding
        while pos < total and blob[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= total:
            break
        head_end = blob.find(_CRLF + _CRLF, pos)
        framed = head_end != -1 and blob[pos:pos + 5] == b"WARC/"
        url = ts = lang = None
        clen = text_len = None
        rtype = b"response"
        if framed:
            for line in bytes(view[pos:head_end]).split(_CRLF)[1:]:
                k, _, v = line.partition(b":")
                k = k.strip().lower()
                v = v.strip()
                if k == b"warc-target-uri":
                    url = v.decode("utf-8", "replace")
                elif k == b"warc-date":
                    ts = _warc_to_ts(v)
                elif k == b"content-length":
                    clen = int(v) if v.isdigit() else None
                elif k == b"warc-type":
                    rtype = v.lower()
                elif k == b"warc-identified-content-language":
                    lang = v.decode("ascii", "replace")
                elif k == b"x-graft-text-length":
                    text_len = int(v) if v.isdigit() else None
        if (not framed or clen is None
                or head_end + 4 + clen > total):
            urls.append(url)
            tss.append(ts)
            htmls.append(None)
            texts.append(None)
            langs.append(lang)
            errs.append(f"malformed WARC record at byte {pos}")
            break
        if rtype != b"response" or url is None or (text_len or 0) > clen:
            pos = head_end + 4 + clen      # framing known: skip record
            continue
        body = head_end + 4
        html_len = clen - (text_len or 0)
        urls.append(url)
        tss.append(ts)
        htmls.append(bytes(view[body:body + html_len]))
        texts.append(bytes(view[body + html_len:body + clen])
                     .decode("utf-8", "replace")
                     if text_len is not None else None)
        langs.append(lang)
        errs.append(None)
        pos = body + clen
    return {"url": urls, "warc_ts": tss, "html": htmls,
            "text": texts, "lang": langs, "error": errs}


def read_warc(paths, *, include_errors: bool = False):
    """pages-schema ``ray.data.Dataset`` from WARC shard paths."""
    import ray.data

    def parse(b: pa.Table) -> pa.Table:
        import gzip

        cols = {"url": [], "warc_ts": [], "html": [], "text": [],
                "lang": [], "error": []}
        for blob in b["bytes"].to_pylist():
            if blob[:2] == b"\x1f\x8b":
                # gzip.decompress walks ALL concatenated members — the
                # Common-Crawl member-per-record .warc.gz layout
                blob = gzip.decompress(blob)
            one = parse_warc_bytes(blob)
            for k, v in one.items():
                cols[k].extend(v)
        t = pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"],
                                pa.timestamp("us", tz="UTC")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
            "error": pa.array(cols["error"], pa.string()),
        })
        if not include_errors:
            import pyarrow.compute as pc
            t = t.filter(pc.is_null(t["error"])).drop_columns(["error"])
        return t

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow")
