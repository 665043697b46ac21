"""Deterministic DOM block segmentation + main-content extraction.

This module is the engine's core transform — the analogue of the reference's
layout-analysis + recognition pass (``ImageAnalyzer.analyzeLayout()`` /
``recognize()``, src/org/dharts/dia/tesseract/ImageAnalyzer.java:64-99 backed
by ``TessBaseAPIAnalyseLayout`` / ``TessBaseAPIGetIterator``,
TesseractHandle.java:534-567).  Tesseract's page segmentation over pixels
becomes DOM segmentation over markup:

* page → BLOCK → PARA → TEXTLINE → WORD hierarchy (LayoutIterator.Level,
  LayoutIterator.java:97-117) is reproduced as block/para/line/word span rows
  with character offsets into the extracted text;
* ``PolyBlockType`` typing (PublicTypes.java:125-193) becomes DOM-derived
  block types (heading_text, flowing_text, table, caption_text, ...);
* boilerplate (nav/header/footer/aside, link farms) is classified NOISE via
  text-density + link-density heuristics (Arabica/readability lineage) and
  excluded from the extracted text;
* adjacent compatible content paragraphs are merged into blocks — the
  connected-region merging mirroring LayoutHandle/BlockIterator
  (examples/.../BlockIterator.java:57-81);
* reading order is document order; non-text blocks (images, rules) appear as
  zero-length spans carrying "a single paragraph with a single line with a
  single imaginary word" exactly as the reference models them
  (BasePageHandle.java:111-114).

Everything is pure Python + stdlib (html.parser), with no randomness and no
environment dependence: the correctness gate is byte-identical output per url
across reruns, machines and parallelism levels.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from ..config import BlockRuleContext, ExtractConfig, Mode
from .types import BlockType, ExtractResult, Level, PayloadKind, Span

# ---------------------------------------------------------------------------
# tag vocabularies

# content inside these is dropped entirely (metadata / code, never content)
_SKIP_TAGS = frozenset({
    "script", "style", "noscript", "template", "svg", "head", "iframe",
    "object", "embed", "canvas", "select", "option", "datalist", "title",
})

# structural boilerplate containers → everything inside is NOISE
_BOILER_TAGS = frozenset({"nav", "header", "footer", "aside"})
_BOILER_ROLES = frozenset({"navigation", "banner", "contentinfo", "complementary"})

# opening/closing one of these terminates the current paragraph
_FLUSH_TAGS = frozenset({
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote",
    "figcaption", "caption", "td", "th", "tr", "table", "thead", "tbody",
    "tfoot", "ul", "ol", "dl", "dt", "dd", "div", "article", "section",
    "main", "body", "html", "figure", "form", "fieldset", "address",
    "details", "summary", "nav", "header", "footer", "aside",
})

_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

#: sectioning roots: opening/closing one implies any still-open inline
#: anchor (or <sub>/<sup>) is closed.  Deliberately NOT every block tag:
#: HTML5 anchors legally contain flow content (<a><div>card</div></a>,
#: <a><h3>title</h3><p>desc</p></a>), so resetting the link counter at
#: every paragraph boundary under-counted link text on block-anchor link
#: farms and let boilerplate leak into the extracted text.
_ANCHOR_RESET_TAGS = frozenset({
    "article", "section", "main", "body", "html", "nav", "header",
    "footer", "aside",
})

_WS_RE = re.compile(r"\s+")   # \s matches NBSP etc. on str in Python 3
_NONWS_RE = re.compile(r"\S+")

#: inline font-attribute tags → word-mask bits (FontAttributes.java:28-59
#: analogue; bits 2..5 of the word mask, above 1=sub / 2=sup).  The mask is
#: maintained incrementally (_upd_mask) so handle_data stays one attribute
#: read; ``<pre>`` contributes the monospace bit via the same update hook.
_FONT_BITS = {
    "b": 4, "strong": 4,
    "i": 8, "em": 8,
    "u": 16, "ins": 16,
    "code": 32, "tt": 32, "kbd": 32, "samp": 32,
}

#: skip tags that never nest in themselves — a second opening implies the
#: first closed (browsers auto-close; an unclosed <option> must not poison
#: the skip state and silently swallow the rest of the document)
_NON_NESTING_SKIP = frozenset({"option", "head", "title", "select"})

# ---------------------------------------------------------------------------
# stopword tables (built-in, tiny) — used by the confidence score's
# dictionary-hit-rate feature, the TessBaseAPIIsValidWord analogue
# (TessAPI.java:566): per-token "is this a plausible dictionary word".

_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("""a an and are as at be by for from has have he her his i in is it its
        not of on or she that the their they this to was we were will with you""".split()),
    "de": frozenset("""aber auch auf aus bei bin bis das dass dem den der des die du ein
        eine einem einen einer es für hat ich im in ist mit nicht sie sind und von war wie
        wird zu""".split()),
    "fr": frozenset("""au aux avec ce ces dans de des du elle en est et il ils je la le les
        mais ne pas pour qui que se ses son sur un une vous""".split()),
    "es": frozenset("""al como con de del el en es esta la las lo los más no para por que
        se sin son su sus un una y ya""".split()),
    "ar": frozenset("""في من على إلى عن أن هذا هذه التي الذي كان كانت هو هي مع لا ما قد و
        أو ثم بين كل عند لم""".split()),
}
_DEFAULT_STOPWORDS = _STOPWORDS["en"]


def stopwords_for(lang: str | None) -> frozenset[str]:
    return _STOPWORDS.get((lang or "en")[:2].lower(), _DEFAULT_STOPWORDS)


# ---------------------------------------------------------------------------
# parse stage: HTML → flat paragraph list


@dataclass
class _Para:
    """One pre-block paragraph: the smallest text-bearing unit the parser
    emits, later merged into blocks (connected-region merging)."""

    group: tuple           # merge key: ("flow",) ("list",i) ("table",i) ("bq",i)
                           # ("heading",lvl) ("caption",) ("image",kind) ("hline",)
    lines: list[str] = field(default_factory=list)
    chars: int = 0         # normalized char count (pre-join)
    link_chars: int = 0    # normalized chars inside <a>
    inline_tags: int = 0   # inline tags opened while para open (density input)
    in_selector: bool = True
    # per-line word bitmasks (1=sub, 2=sup, 4..32 = _FONT_BITS font
    # attributes), parallel to ``lines``; None when the paragraph contains
    # no masked content (the common fast path)
    word_masks: list | None = None
    # classic dropcap markup detected: the paragraph's first text node is a
    # single uppercase letter split out of its word by an inline element
    # (<span class="dropcap">O</span>nce …)
    dropcap_first: bool = False

    @property
    def is_text(self) -> bool:
        return self.group[0] not in ("image", "hline")


class _SegmentingParser(HTMLParser):
    """Single-pass DOM walker producing the flat paragraph stream.

    Plays the role of Tesseract's textord/page-segmentation pass; one instance
    per document, reset per document (the extractor actor reuses nothing
    across documents — the deliberate opposite of the reference's adaptive
    classifier, TessAPI.java:536, which we do NOT replicate because
    cross-document mutable state breaks determinism).
    """

    def __init__(self, selector_tag: str | None = None):
        super().__init__(convert_charrefs=True)
        self.selector_tag = selector_tag
        self.paras: list[_Para] = []
        # open-paragraph state
        self._items: list[tuple] = []   # ("txt", s, in_link, mask) | ("br",)
        self._inline_tags = 0
        self._sub = 0
        self._sup = 0
        # per-bit open-tag depths for the font-attribute bits (keyed by the
        # _FONT_BITS bit value) and the current combined word mask
        self._font = {4: 0, 8: 0, 16: 0, 32: 0}
        self._mask = 0
        # nesting state: skip tracked as a STACK of open skip tags so that
        # malformed nesting (unclosed <option>, omitted </head>) can apply
        # implied-close rules instead of poisoning a counter forever
        self._skip_stack: list[str] = []
        self._boiler = 0
        self._link = 0
        self._pre = 0
        self._selector = 0 if selector_tag else 1   # >0 ⇒ inside ROI
        # group-instance state
        self._counter = 0
        self._group_stack: list[tuple] = []  # innermost-last container groups

    # -- group helpers ------------------------------------------------------

    def _fresh_id(self) -> int:
        self._counter += 1
        return self._counter

    def _current_group(self, tag: str, closing: bool = False) -> tuple:
        # heading/caption apply only while the tag is OPENING — after the end
        # tag, following bare text must fall back to the container group.
        if not closing:
            if tag in _HEADINGS:
                return ("heading", int(tag[1]))
            if tag in ("figcaption", "caption"):
                return ("caption",)
        if self._group_stack:
            return self._group_stack[-1]
        return ("flow",)

    # -- paragraph buffer ---------------------------------------------------

    def _flush(self) -> None:
        # NOTE: an open <a> deliberately SURVIVES the paragraph boundary —
        # HTML5 anchors may contain flow content (<a><div>card</div></a>),
        # so only a new <a> or a sectioning root (_ANCHOR_RESET_TAGS)
        # closes the link context.
        if not self._items:
            self._inline_tags = 0
            return
        para = _Para(group=self._open_group or ("flow",))
        # word sub/sup tracking only when the paragraph actually contains
        # <sub>/<sup> content — the common path stays byte-for-byte the
        # original normalization
        any_mask = any(it[0] == "txt" and it[3] for it in self._items)
        lines: list[str] = []
        masks: list = []
        cur: list[tuple] = []
        total = 0
        link_total = 0

        def end_line():
            nonlocal cur, total, link_total
            raw = "".join(s for s, _m in cur)
            if not any_mask:
                text = _WS_RE.sub(" ", raw).strip()
                if text:
                    lines.append(text)
                    masks.append(None)
                    total += len(text)
            else:
                # Run-based token masks: ``cur`` is a short list of
                # (text, mask) RUNS — a token's mask is the OR of the runs
                # its [start, end) overlaps, found by walking run end
                # offsets alongside the (ordered) token matches.  O(runs +
                # tokens), never one mask per character: with the font
                # bits, <b>/<i>/<em> put most realistic paragraphs on this
                # path.  (_append_text never emits empty runs, so zero-
                # length-run masks can't leak in.)
                ends: list[int] = []
                rmasks: list[int] = []
                pos = 0
                for s, m in cur:
                    pos += len(s)
                    ends.append(pos)
                    rmasks.append(m)
                toks: list[str] = []
                tmasks: list[int] = []
                ri = 0
                for mt in _NONWS_RE.finditer(raw):
                    a = mt.start()
                    while ends[ri] <= a:
                        ri += 1
                    mm = rmasks[ri]
                    j = ri
                    b_end = mt.end()
                    while ends[j] < b_end:
                        j += 1
                        mm |= rmasks[j]
                    toks.append(mt.group())
                    tmasks.append(mm)
                if toks:
                    # " ".join(tokens) == _WS_RE.sub(" ", raw).strip() —
                    # the byte-identity invariant of the fast path
                    text = " ".join(toks)
                    lines.append(text)
                    masks.append(tmasks)
                    total += len(text)
            cur = []

        for item in self._items:
            if item[0] == "tb":
                continue
            if item[0] == "br":
                end_line()
            else:
                _, s, in_link, m = item
                cur.append((s, m))
                if in_link:
                    link_total += len(_WS_RE.sub(" ", s).strip())
        end_line()
        if lines:
            para.lines = lines
            para.word_masks = masks if any_mask else None
            # dropcap: the paragraph opens with a lone uppercase letter
            # split out of its word by an inline ELEMENT boundary ("tb"
            # marker) and glued (no whitespace) to the following text —
            # the classic <span class=dropcap>O</span>nce pattern.  The
            # marker requirement makes this independent of data-chunk
            # granularity (a charref split emits two text nodes with no
            # element between) and rejects <br>-separated verse lines.
            its = self._items
            drop = False
            if (its and its[0][0] == "txt" and len(its[0][1]) == 1
                    and its[0][1].isalpha() and its[0][1].isupper()):
                j = 1
                while j < len(its) and its[j][0] == "tb":
                    j += 1
                drop = (j > 1 and j < len(its) and its[j][0] == "txt"
                        and bool(its[j][1])
                        and not its[j][1][0].isspace())
            para.dropcap_first = drop
            para.chars = total
            para.link_chars = min(link_total, total)
            para.inline_tags = self._inline_tags
            para.in_selector = self._open_selector
            if self._open_boiler:
                para.group = ("boiler",) + para.group
            self.paras.append(para)
        self._items = []
        self._inline_tags = 0

    # rolling context consulted at flush time
    @property
    def _open_group(self) -> tuple | None:
        return self.__dict__.get("_og")

    @property
    def _open_boiler(self) -> bool:
        return bool(self.__dict__.get("_ob"))

    @property
    def _open_selector(self) -> bool:
        return bool(self.__dict__.get("_os", True))

    def _note_context(self, tag: str, closing: bool = False) -> None:
        self.__dict__["_og"] = self._current_group(tag, closing)
        self.__dict__["_ob"] = self._boiler > 0
        self.__dict__["_os"] = self._selector > 0

    def _upd_mask(self) -> None:
        """Recompute the combined word mask after any sub/sup/font/pre
        counter change — handle_data then reads one attribute."""
        f = self._font
        self._mask = ((1 if self._sub else 0) | (2 if self._sup else 0)
                      | (4 if f[4] else 0) | (8 if f[8] else 0)
                      | (16 if f[16] else 0)
                      | (32 if f[32] or self._pre else 0))

    # -- non-text emissions -------------------------------------------------

    def _emit_nontext(self, kind: str, subtype: str) -> None:
        if self._skip or self._boiler or self._selector <= 0:
            return
        self._flush()
        p = _Para(group=(kind, subtype))
        p.in_selector = True
        self.paras.append(p)

    # -- HTMLParser hooks ---------------------------------------------------

    @property
    def _skip(self) -> int:
        return len(self._skip_stack)

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            # implied close: non-nesting skip tags close themselves when a
            # sibling opens (<option>A<option>B), and <head> closes when
            # body content starts
            if tag in _NON_NESTING_SKIP and self._skip_stack \
                    and self._skip_stack[-1] == tag:
                self._skip_stack.pop()
            self._skip_stack.append(tag)
            return
        if self._skip:
            # HTML5 allows omitting </head>: any structural/flowing tag
            # implies it closed (otherwise the whole page is swallowed)
            if "head" in self._skip_stack and tag in _FLUSH_TAGS:
                self._skip_stack.remove("head")
                if self._skip:
                    return
            else:
                return
        if tag == "br":
            self._items.append(("br",))
            return
        if tag == "hr":
            self._emit_nontext("hline", "horz_line")
            return
        if tag == "img":
            in_figure = any(g[0] == "figure" for g in self._group_stack)
            self._emit_nontext(
                "image",
                BlockType.PULLOUT_IMAGE if in_figure else BlockType.FLOWING_IMAGE,
            )
            return
        if self.selector_tag and tag == self.selector_tag:
            self._selector += 1
        if tag in _FLUSH_TAGS:
            self._flush()
            if tag in _ANCHOR_RESET_TAGS:
                self._link = 0
                self._sub = 0
                self._sup = 0
                self._font = {4: 0, 8: 0, 16: 0, 32: 0}
                self._upd_mask()
            if tag == "pre":
                self._pre += 1
                self._upd_mask()
            role = ""
            for k, v in attrs:
                if k == "role" and v:
                    role = v.lower()
            if tag in _BOILER_TAGS or role in _BOILER_ROLES:
                self._boiler += 1
                self._group_stack.append(("boilerctr", tag))
            elif tag in ("table", "thead", "tbody", "tfoot", "tr"):
                if tag == "table":
                    self._group_stack.append(("table", self._fresh_id()))
            elif tag in ("ul", "ol", "dl"):
                self._group_stack.append(("list", self._fresh_id()))
            elif tag == "blockquote":
                self._group_stack.append(("bq", self._fresh_id()))
            elif tag == "figure":
                self._group_stack.append(("figure", self._fresh_id()))
            self._note_context(tag)
            return
        # inline tag
        if tag == "a":
            # HTML5: anchors never nest — a new <a> implies the previous
            # one closed (the browser's adoption rule)
            self._link = 1
        elif tag == "sub":
            self._sub += 1
            self._upd_mask()
        elif tag == "sup":
            self._sup += 1
            self._upd_mask()
        elif tag in _FONT_BITS:
            self._font[_FONT_BITS[tag]] += 1
            self._upd_mask()
        self._inline_tags += 1
        if self._items:
            # element-boundary marker: distinguishes markup-split text
            # (dropcap detection) from mere data-chunk splits (charrefs),
            # making the result independent of data granularity
            self._items.append(("tb",))

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in ("br", "hr", "img"):
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            # pop the nearest matching open skip tag (tolerates interleaved
            # malformed closes); anything above it was implicitly closed
            for i in range(len(self._skip_stack) - 1, -1, -1):
                if self._skip_stack[i] == tag:
                    del self._skip_stack[i:]
                    break
            return
        if self._skip:
            return
        if tag in ("br", "hr", "img"):
            return
        if self._pre and tag == "pre":
            self._pre -= 1
            self._upd_mask()
        if tag in _FLUSH_TAGS:
            self._flush()
            if tag in _ANCHOR_RESET_TAGS:
                self._link = 0
                self._sub = 0
                self._sup = 0
                self._font = {4: 0, 8: 0, 16: 0, 32: 0}
                self._upd_mask()
            if tag in _BOILER_TAGS and self._boiler:
                # pop matching boiler container if present
                for i in range(len(self._group_stack) - 1, -1, -1):
                    if self._group_stack[i] == ("boilerctr", tag):
                        del self._group_stack[i]
                        self._boiler -= 1
                        break
                else:
                    self._boiler = max(0, self._boiler - 1)
            elif tag == "table":
                self._pop_group("table")
            elif tag in ("ul", "ol", "dl"):
                self._pop_group("list")
            elif tag == "blockquote":
                self._pop_group("bq")
            elif tag == "figure":
                self._pop_group("figure")
            self._note_context(tag, closing=True)
        else:
            if tag == "a":
                self._link = max(0, self._link - 1)
            elif tag == "sub":
                self._sub = max(0, self._sub - 1)
                self._upd_mask()
            elif tag == "sup":
                self._sup = max(0, self._sup - 1)
                self._upd_mask()
            elif tag in _FONT_BITS:
                bit = _FONT_BITS[tag]
                self._font[bit] = max(0, self._font[bit] - 1)
                self._upd_mask()
            if self._items:
                self._items.append(("tb",))
        if self.selector_tag and tag == self.selector_tag:
            self._selector = max(0, self._selector - 1)

    def _pop_group(self, kind: str) -> None:
        for i in range(len(self._group_stack) - 1, -1, -1):
            if self._group_stack[i][0] == kind:
                del self._group_stack[i]
                return

    def handle_data(self, data):
        if self._skip or not data:
            return
        if not self._items:
            # context is captured when the paragraph's first content arrives
            self.__dict__["_ob"] = self._boiler > 0
            self.__dict__["_os"] = self._selector > 0
            if "_og" not in self.__dict__ or self.__dict__["_og"] is None:
                self.__dict__["_og"] = ("flow",)
        mask = self._mask
        if "\n" in data and self._pre:
            parts = data.split("\n")
            for i, part in enumerate(parts):
                if i:
                    self._items.append(("br",))
                if part:
                    self._append_text(part, mask)
        else:
            self._append_text(data, mask)

    def _append_text(self, data: str, mask: int) -> None:
        """Append a text item, MERGING into the previous one when no tag /
        line boundary intervened and the inline state is identical — the
        item stream becomes independent of data-chunk granularity (stdlib
        emits a separate chunk per charref, the fast tokenizer one per
        inter-tag segment; per-item link-length accounting must not see
        the difference)."""
        in_link = self._link > 0
        items = self._items
        if items and items[-1][0] == "txt" and items[-1][2] == in_link \
                and items[-1][3] == mask:
            items[-1] = ("txt", items[-1][1] + data, in_link, mask)
        else:
            items.append(("txt", data, in_link, mask))

    def close(self):
        super().close()
        self._flush()


# ---------------------------------------------------------------------------
# fast tokenizer front-end
#
# html.parser's pure-Python goahead loop is ~55% of extraction CPU.  This
# regex-driven tokenizer produces the SAME event stream into the SAME
# _SegmentingParser handler methods for the constructs that occur in web
# text (tags, comments, doctype/bogus/PI, CDATA, charrefs, script/style raw
# content) — parity is enforced by tests/test_extract_properties.py which
# diffs full ExtractResults between both front-ends over every fixture
# family and truncation point.  Anything the tokenizer cannot faithfully
# handle falls back to the stdlib path per document (segment_html).

#: a quoted attr VALUE may span '>' — but only when it follows a well-formed
#: ``name=`` (html.parser's tolerant attr grammar: the name must follow a
#: delimiter).  A bare ``='y>`` is NOT a quote opener (stdlib ends the tag at
#: the '>'), and <p title=don't> has the UNQUOTED value "don't" — a general
#: quoted-string alternative would swallow text to the next apostrophe.
_ATTR_QPFX = r"(?<=[\s/\"'])[a-zA-Z_:][-a-zA-Z0-9_:.]*\s*=\s*"

_TAG_RE = re.compile(
    r"<(?:"
    r"!--.*?--\s*>"                              # comment
    r"|!\[CDATA\[.*?\]\]>"                       # CDATA section
    r"|(/)\s*([a-zA-Z][^\t\n\r\f />\x00]*)\s*[^>]*>"   # end tag
    r"|/[^>]*>"                                  # bogus end tag → dropped
    r"|([a-zA-Z][^\t\n\r\f />\x00]*)"            # start tag name
    # quoted value | UNQUOTED value consumed atomically (stdlib consumes
    # [^>\s]* whole, so a quote inside an unquoted value can never open a
    # quoted span) | any other char
    rf"((?:{_ATTR_QPFX}\"[^\"]*\"|{_ATTR_QPFX}'[^']*'"
    rf"|{_ATTR_QPFX}[^>\s\"'][^>\s]*|[^>])*)>"
    r"|(!--|!\[CDATA\[)"                         # unterminated at EOF → data
    r"|[!?][^>]*>"                               # doctype / bogus / PI
    r")", re.S)

_ROLE_HINT_RE = re.compile(r"role", re.I)

#: a blob ending in an unterminated quoted value: stdlib never ends the tag
#: here — it scans the REST OF THE DOCUMENT for the closing quote and its
#: recovery depends on global document state, so the fast path hands the
#: whole document to the stdlib front-end instead of approximating
_UNTERM_Q_RE = re.compile(r"=\s*(\"[^\"]*|'[^']*)$")


class _StdlibFallback(Exception):
    """Raised when the fast tokenizer meets a construct whose stdlib
    recovery is document-global (unterminated attribute quote) — the
    caller reparses the document with html.parser."""

#: sequential attribute tokenizer (html.parser attrfind_tolerant shape):
#: consuming attrs in order means quoted VALUES are skipped atomically, so
#: 'role=' text inside another attribute's value or a data-role attribute
#: name can never be mistaken for the role attribute
_ATTR_SEQ_RE = re.compile(
    r"[\s/]*([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^>\s]*))?")


def _role_attr(blob: str):
    pos = 0
    n = len(blob)
    while pos < n:
        m = _ATTR_SEQ_RE.match(blob, pos)
        if m is None or m.end() == pos:
            pos += 1
            continue
        pos = m.end()
        if m.group(1).lower() == "role":
            v = m.group(2) or ""
            if v[:1] in "\"'":
                v = v[1:-1]
            return v
    return None

#: raw-content mode exits ONLY at a real close tag (stdlib endtagfind
#: semantics: parse_endtag in cdata mode treats any other "</..." — e.g.
#: "</scripty>" or "</script x>" — as DATA and stays in raw mode)
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*(?=>)", re.I),
    "style": re.compile(r"</\s*style\s*(?=>)", re.I),
}


def _feed_fast(parser: _SegmentingParser, text: str) -> None:
    """Drive the handler with the fast tokenizer (html.parser-equivalent
    event stream; see parity notes above)."""
    from html import unescape

    pos = 0
    n = len(text)
    data = parser.handle_data
    while pos < n:
        m = _TAG_RE.search(text, pos)
        if m is None:
            data(unescape(text[pos:]) if "&" in text[pos:] else text[pos:])
            break
        if m.start() > pos:
            seg = text[pos:m.start()]
            data(unescape(seg) if "&" in seg else seg)
        if m.group(5):                      # unterminated <!-- / <![CDATA[
            # stdlib (at EOF) emits the construct as data up to and
            # including the FIRST '>' (charrefs converted) and resumes
            # parsing after it; with no '>' left, the remainder is data
            j = text.find(">", m.start())
            seg = text[m.start():] if j < 0 else text[m.start():j + 1]
            data(unescape(seg) if "&" in seg else seg)
            if j < 0:
                break
            pos = j + 1
            continue
        pos = m.end()
        if m.group(2):                      # end tag
            parser.handle_endtag(m.group(2).lower())
            continue
        name = m.group(3)
        if not name:                        # comment/doctype/bogus/PI
            continue
        tag = name.lower()
        blob = m.group(4) or ""
        if _UNTERM_Q_RE.search(blob):
            raise _StdlibFallback
        attrs = []
        # attrs only matter for the boilerplate role check on flush tags
        if tag in _FLUSH_TAGS and _ROLE_HINT_RE.search(blob):
            val = _role_attr(blob)
            if val is not None:
                attrs = [("role", unescape(val) if "&" in val else val)]
        stripped = blob.rstrip()
        # self-closing iff the trailing "/" is its own token — a "/" glued
        # to an unquoted attribute value (<a href=/>) is part of the VALUE
        # in html.parser's tolerant attr grammar, not a self-close marker
        if stripped.endswith("/") and (len(stripped) == 1
                                       or stripped[-2] in " \t\r\n\"'"):
            parser.handle_startendtag(tag, attrs)
            continue
        parser.handle_starttag(tag, attrs)
        if tag in _CDATA_CLOSE:
            # raw-content elements: embedded '<' is not markup until the
            # matching close tag (html.parser set_cdata_mode equivalent)
            m2 = _CDATA_CLOSE[tag].search(text, pos)
            if m2 is None:
                data(text[pos:])
                break
            if m2.start() > pos:
                data(text[pos:m2.start()])
            pos = m2.start()
    parser._flush()


# ---------------------------------------------------------------------------
# classification + merging + assembly


def _alpha_ratio(text: str) -> float:
    if not text:
        return 0.0
    # sum(map(...)) counts True as 1 — identical to the genexpr count but
    # ~2× faster in the hottest scoring path
    return sum(map(str.isalpha, text)) / len(text)


def _para_confidence(text: str, link_density: float, stop: frozenset[str]) -> float:
    """0–100 content-confidence score — the ResultIterator confidence
    analogue (ResultHandle.java:84-89), computed from extraction features
    instead of OCR posterior: link density, length saturation, dictionary
    hit rate (TessBaseAPIIsValidWord analogue) and alphabetic ratio."""
    words = text.split()
    n = len(words)
    if n == 0:
        return 0.0
    hits = sum(1 for w in words if w.strip(".,;:!?\"'()[]«»").lower() in stop)
    score = (
        0.35 * (1.0 - link_density)
        + 0.25 * min(1.0, n / 20.0)
        + 0.25 * min(1.0, 4.0 * hits / n)
        + 0.15 * _alpha_ratio(text)
    )
    return round(100.0 * max(0.0, min(1.0, score)), 4)


def _default_classify(para: _Para, cfg: ExtractConfig) -> str:
    """Built-in paragraph → block-type / NOISE heuristics.

    The NOISE decision is the boilerplate heuristic: structural boilerplate
    containers are always noise; otherwise link-dense short paragraphs are
    link farms (readability-style), and word-free paragraphs are separators.
    """
    g = para.group
    if g[0] == "boiler":
        return BlockType.NOISE
    if g[0] == "image":
        return g[1]
    if g[0] == "hline":
        return BlockType.HORZ_LINE
    text = "\n".join(para.lines)
    n_words = len(text.split())
    if n_words == 0:
        return BlockType.NOISE
    ld = para.link_chars / para.chars if para.chars else 0.0
    limit = (cfg.long_para_max_link_density
             if n_words >= cfg.long_para_words else cfg.max_link_density)
    if ld > limit:
        return BlockType.NOISE
    if g[0] == "heading":
        return BlockType.HEADING_TEXT
    if g[0] == "caption":
        return BlockType.CAPTION_TEXT
    if g[0] == "table":
        return BlockType.TABLE
    if g[0] == "bq":
        return BlockType.PULLOUT_TEXT
    return BlockType.FLOWING_TEXT


def _classify(para: _Para, cfg: ExtractConfig) -> str:
    """Default classification, then user :data:`BlockRule` overrides —
    the PageItemFactory-analogue extension point (SURVEY.md §2.5): each
    registered rule sees the paragraph's feature view (with the ORIGINAL
    default verdict) and may re-type it, drop it (NOISE), or rescue it."""
    btype = _default_classify(para, cfg)
    if cfg.block_rules:
        text = "\n".join(para.lines) if para.is_text else ""
        ld = para.link_chars / para.chars if para.chars else 0.0
        ctx = BlockRuleContext(group=para.group, text=text,
                               n_words=len(text.split()),
                               n_chars=para.chars, link_density=ld,
                               default_type=btype)
        for rule in cfg.block_rules:
            r = rule(ctx)
            if r is not None:
                btype = r
    return btype


def _merge_key(para: _Para, btype: str):
    """Adjacent kept paragraphs with equal merge keys join one block."""
    if btype in (BlockType.FLOWING_TEXT,):
        g = para.group
        if g[0] in ("list", "figure"):
            return (btype, g[0], g[1])
        return (btype, "flow")
    if btype in (BlockType.TABLE, BlockType.PULLOUT_TEXT):
        return (btype,) + para.group[:2]
    return None  # headings, captions, images, rules never merge


@dataclass
class _Block:
    btype: str
    paras: list[_Para]


def _make_charfilter(cfg: ExtractConfig):
    """Build the char-filter closure ONCE per document — constructing the
    translate table / keep-set per line put O(filter length) dict builds in
    the hottest loop."""
    table = ({ord(c): None for c in cfg.char_blacklist}
             if cfg.char_blacklist else None)
    keep = (set(cfg.char_whitelist) | {" "}) if cfg.char_whitelist else None

    def apply(line: str) -> str:
        if table is not None:
            line = line.translate(table)
        if keep is not None:
            line = "".join(c for c in line if c in keep)
        return _WS_RE.sub(" ", line).strip()

    return apply


def _feed_stdlib(parser: _SegmentingParser, text: str) -> None:
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        # html.parser is extremely tolerant; any residual parse error means a
        # hopeless payload — degrade to whatever paragraphs were collected.
        parser._flush()


def segment_html(text: str, cfg: ExtractConfig) -> list[_Block]:
    """Parse + classify + merge: HTML string → ordered block list."""
    parser = _SegmentingParser(cfg.selector_tag)
    if cfg.fast_parser:
        try:
            _feed_fast(parser, text)
        except Exception:
            # any internal tokenizer error → redo the document on the
            # stdlib front-end (same event semantics, slower)
            parser = _SegmentingParser(cfg.selector_tag)
            _feed_stdlib(parser, text)
    else:
        _feed_stdlib(parser, text)

    paras = [p for p in parser.paras if p.in_selector]

    if cfg.char_whitelist or cfg.char_blacklist:
        _filt = _make_charfilter(cfg)
        for p in paras:
            p.lines = [ln for ln in (_filt(l) for l in p.lines) if ln]
            p.chars = sum(len(l) for l in p.lines)
            # clamp link mass to the surviving chars: filtering removes
            # characters without attribution, and a stale link_chars >
            # chars yields link density > 1 and misclassifies surviving
            # content paragraphs as NOISE
            p.link_chars = min(p.link_chars, p.chars)
            p.word_masks = None   # filtering re-segments words
        paras = [p for p in paras if p.lines or not p.is_text]

    if cfg.mode == Mode.SINGLE_BLOCK:
        kept = [p for p in paras if p.is_text and p.lines]
        return [_Block(BlockType.FLOWING_TEXT, kept)] if kept else []

    blocks: list[_Block] = []
    for p in paras:
        btype = _classify(p, cfg)
        if btype == BlockType.NOISE:
            continue
        key = _merge_key(p, btype)
        # connected-region merging: dropped noise BETWEEN two compatible
        # content paras does not break the run (they are adjacent after
        # removal) — so we compare against the last KEPT para's key.
        if key is not None and blocks and blocks[-1].btype == btype \
                and _merge_key(blocks[-1].paras[-1], btype) == key:
            blocks[-1].paras.append(p)
        else:
            blocks.append(_Block(btype, [p]))
    return blocks


def assemble(blocks: list[_Block], lang: str | None, cfg: ExtractConfig) -> ExtractResult:
    """Blocks → final text + span rows in one pass (offsets always index the
    final text; never post-hoc searched — SURVEY.md §7 hard-part #2).

    Text layout: blocks joined by "\\n\\n"; paragraphs within a block and
    lines within a paragraph joined by "\\n".  Non-text blocks contribute no
    text and carry zero-length spans at their reading-order position, with
    exactly one synthetic para/line/word (BasePageHandle.java:111-114).
    """
    stop = stopwords_for(lang)
    parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    next_id = 0
    text_block_confs: list[float] = []

    def nid() -> int:
        nonlocal next_id
        next_id += 1
        return next_id - 1

    first_text_block = True
    for blk in blocks:
        if not blk.paras or not any(p.lines for p in blk.paras):
            # non-text block (image / rule): zero-length hierarchy
            bid = nid()
            bt = blk.btype
            spans.append(Span(bid, -1, Level.BLOCK, bt, offset, offset, 0.0, 0.0, 0.0))
            pid = nid()
            spans.append(Span(pid, bid, Level.PARA, bt, offset, offset, 0.0, 0.0, 0.0))
            lid = nid()
            spans.append(Span(lid, pid, Level.LINE, bt, offset, offset, 0.0, 0.0, 0.0))
            if cfg.emit_word_spans:
                spans.append(Span(nid(), lid, Level.WORD, bt, offset, offset, 0.0, 0.0, 0.0))
            continue

        if not first_text_block:
            parts.append("\n\n")
            offset += 2
        first_text_block = False

        bid = nid()
        block_span = Span(bid, -1, Level.BLOCK, blk.btype, offset, offset, 0.0, 0.0, 0.0)
        spans.append(block_span)
        blk_chars = 0
        blk_links = 0.0
        blk_conf_w = 0.0

        first_para = True
        for para in blk.paras:
            if not para.lines:
                continue
            if not first_para:
                parts.append("\n")
                offset += 1
            first_para = False
            ptext = "\n".join(para.lines)
            ld = para.link_chars / para.chars if para.chars else 0.0
            td = para.chars / (para.chars + 8.0 * (1 + para.inline_tags)) if para.chars else 0.0
            conf = _para_confidence(ptext, ld, stop)
            pid = nid()
            pspan = Span(pid, bid, Level.PARA, blk.btype, offset, offset, conf,
                         round(td, 4), round(ld, 4))
            spans.append(pspan)
            for line_idx, line in enumerate(para.lines):
                if line_idx:
                    parts.append("\n")
                    offset += 1
                lid = nid()
                lspan = Span(lid, pid, Level.LINE, blk.btype, offset,
                             offset + len(line), conf, pspan.text_density, pspan.link_density)
                spans.append(lspan)
                if cfg.emit_word_spans:
                    # line text is already whitespace-collapsed: words are
                    # maximal runs of non-space, separated by single spaces
                    lmasks = (para.word_masks[line_idx]
                              if para.word_masks else None)
                    words = line.split(" ")
                    pos = 0
                    for w_idx, w in enumerate(words):
                        if w:
                            m = lmasks[w_idx] if lmasks else 0
                            drop = (line_idx == 0 and w_idx == 0
                                    and para.dropcap_first)
                            spans.append(Span(nid(), lid, Level.WORD, blk.btype,
                                              offset + pos, offset + pos + len(w),
                                              conf, pspan.text_density, pspan.link_density,
                                              bool(m & 1), bool(m & 2), drop,
                                              m >> 2))
                        pos += len(w) + 1
                parts.append(line)
                offset += len(line)
            pspan.end = offset
            n = len(ptext)
            blk_chars += n
            blk_links += ld * n
            blk_conf_w += conf * n
        block_span.end = offset
        if blk_chars:
            block_span.link_density = round(blk_links / blk_chars, 4)
            chars_sum = 0
            tags_n = 0
            for p in blk.paras:
                chars_sum += p.chars
                tags_n += 1 + p.inline_tags
            block_span.text_density = round(
                chars_sum / (chars_sum + 8.0 * tags_n), 4)
            block_span.confidence = round(blk_conf_w / blk_chars, 4)
            text_block_confs.append(block_span.confidence)

    text = "".join(parts)
    n_blocks = len(blocks)
    doc_conf = round(sum(text_block_confs) / len(text_block_confs), 4) if text_block_confs else 0.0
    return ExtractResult(
        text=text, spans=spans, doc_confidence=doc_conf, n_blocks=n_blocks,
        payload_kind=PayloadKind.HTML,
    )


def extract_html(html_text: str, lang: str | None, cfg: ExtractConfig) -> ExtractResult:
    """Full pass: HTML string → ExtractResult (text + spans + metrics)."""
    blocks = segment_html(html_text, cfg)
    return assemble(blocks, lang, cfg)


def extract_plain_text(text: str, lang: str | None, cfg: ExtractConfig) -> ExtractResult:
    """TEXT_ONLY mode / plain-text payloads: paragraphs on blank lines,
    lines on newlines, one flowing block per paragraph run."""
    paras: list[_Para] = []
    for chunk in re.split(r"\n\s*\n", text):
        lines = [_WS_RE.sub(" ", ln).strip() for ln in chunk.split("\n")]
        lines = [ln for ln in lines if ln]
        if lines:
            p = _Para(group=("flow",))
            p.lines = lines
            p.chars = sum(len(l) for l in lines)
            paras.append(p)
    blocks = [_Block(BlockType.FLOWING_TEXT, [p]) for p in paras]
    res = assemble(blocks, lang, cfg)
    res.payload_kind = PayloadKind.TEXT
    return res
