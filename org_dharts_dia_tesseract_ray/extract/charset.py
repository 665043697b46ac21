"""Deterministic charset decoding for raw page payloads.

Policy (fixed — byte-identity across reruns/machines depends on it, see
SURVEY.md §7 "Hard parts"):

1. sniff a declared charset from the first 2 KiB (``<meta charset=...>`` or
   ``<meta http-equiv="content-type" content="...charset=...">`` or an XML
   prolog ``encoding=...``), decode strict with it if the codec exists;
2. else/on failure, UTF-8 strict;
3. else latin-1 (never fails).

The codec actually used is recorded in the ``charset`` metadata column — the
analogue of the reference recording per-image DPI metadata at read time
(ImageIOHelper.readImageData, ImageIOHelper.java:379-407).
"""

from __future__ import annotations

import codecs
import re

# matches charset=utf-8, charset="utf-8", charset='utf-8', encoding="..."
_CHARSET_RE = re.compile(rb"""(?:charset|encoding)\s*=\s*["']?\s*([A-Za-z0-9_\-.:]+)""", re.I)

_SNIFF_BYTES = 2048


def sniff_declared_charset(payload: bytes) -> str | None:
    """Return the declared charset name (lowercased) or None."""
    m = _CHARSET_RE.search(payload[:_SNIFF_BYTES])
    if not m:
        return None
    return m.group(1).decode("ascii", "replace").strip().lower()


def decode_payload(payload: bytes) -> tuple[str, str]:
    """Decode ``payload`` → ``(text, codec_used)`` under the fixed policy.

    ``codec_used`` is the canonical codec name that succeeded
    (e.g. ``"utf-8"``, ``"cp1252"``, ``"latin-1"``).
    """
    declared = sniff_declared_charset(payload)
    if declared:
        try:
            codec = codecs.lookup(declared)
        except LookupError:
            codec = None
        if codec is not None:
            try:
                return payload.decode(codec.name, "strict"), codec.name
            except (UnicodeDecodeError, ValueError):
                pass
    try:
        return payload.decode("utf-8", "strict"), "utf-8"
    except UnicodeDecodeError:
        return payload.decode("latin-1", "strict"), "latin-1"
