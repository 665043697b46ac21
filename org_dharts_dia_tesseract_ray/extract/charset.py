"""Deterministic charset decoding for raw page payloads.

Policy (fixed — byte-identity across reruns/machines depends on it, see
SURVEY.md §7 "Hard parts"):

0. a UTF-8/16/32 byte-order mark wins outright (decoded with the matching
   codec, BOM stripped);
1. else sniff a declared charset from the first 2 KiB — only inside a
   ``<meta ...>`` tag or an XML prolog, NOT any stray ``charset=``
   substring (a ``<script src="a.js?charset=latin-1">`` must not override
   the real declaration) — and decode strict with it if the codec exists;
2. else/on failure, UTF-8 strict;
3. else latin-1 (never fails).

Any leading U+FEFF surviving a declared-codec decode is stripped — a BOM
is byte-order metadata, not content, and would otherwise become a spurious
one-word paragraph shifting every span offset.

The codec actually used is recorded in the ``charset`` metadata column — the
analogue of the reference recording per-image DPI metadata at read time
(ImageIOHelper.readImageData, ImageIOHelper.java:379-407).
"""

from __future__ import annotations

import codecs
import re

# charset=/encoding= ONLY within a meta tag or xml prolog
_CHARSET_RE = re.compile(
    rb"""<(?:meta|\?xml)[^>]{0,200}?"""
    rb"""(?:charset|encoding)\s*=\s*["']?\s*([A-Za-z0-9_\-.:]+)""", re.I)

_SNIFF_BYTES = 2048

#: BOM → (codec, bom_length); longest first (UTF-32 LE BOM starts with the
#: UTF-16 LE BOM bytes)
_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def sniff_declared_charset(payload: bytes) -> str | None:
    """Return the declared charset name (lowercased) or None."""
    m = _CHARSET_RE.search(payload[:_SNIFF_BYTES])
    if not m:
        return None
    return m.group(1).decode("ascii", "replace").strip().lower()


def decode_payload(payload: bytes) -> tuple[str, str]:
    """Decode ``payload`` → ``(text, codec_used)`` under the fixed policy.

    ``codec_used`` is the canonical codec name that succeeded
    (e.g. ``"utf-8"``, ``"utf-16-le"``, ``"cp1252"``, ``"latin-1"``).
    """
    for bom, codec_name in _BOMS:
        if payload.startswith(bom):
            try:
                return (payload[len(bom):].decode(codec_name, "strict"),
                        codec_name)
            except (UnicodeDecodeError, ValueError):
                break                    # fall through to declared/utf-8
    declared = sniff_declared_charset(payload)
    if declared:
        try:
            codec = codecs.lookup(declared)
        except LookupError:
            codec = None
        if codec is not None:
            try:
                text = payload.decode(codec.name, "strict")
                # a BOM decoded as content (e.g. utf-16 codec) is metadata
                return text.lstrip("﻿"), codec.name
            except (UnicodeDecodeError, ValueError):
                pass
    try:
        return payload.decode("utf-8", "strict"), "utf-8"
    except UnicodeDecodeError:
        return payload.decode("latin-1", "strict"), "latin-1"
