"""Deterministic synthetic web-page corpus generator.

The tabular analogue of the reference's fixture corpus
(/root/reference/res/testing/{simple,simple_poetry}.png, TestContext.java:32-34):
seeded, pure-Python, byte-identical across reruns.  Produces the ``pages``
table in exactly the input_hint shape::

    url:string  warc_ts:timestamp[us,UTC]  html:binary  text:string  lang:string

Fixture families (FIXTURES.md §2) are encoded in the url path
(``https://<family>.example.com/<lang>/p<i>``) so tests can recover ground
truth without extra columns.  The ``poetry`` family is the golden-count
analogue of the reference's simple_poetry.png test — exactly **3 blocks and
22 line spans** (LayoutIteratorTests.java:54,64: 3 blocks / 22 textlines).
"""

from __future__ import annotations

import datetime as _dt
import random

import pyarrow as pa

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us", tz="UTC")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

_WORDS = {
    "en": ("the quick brown fox jumps over a lazy dog and runs far away with "
           "great speed while birds sing in tall trees near old rivers that "
           "flow to the wide sea under bright skies of summer light").split(),
    "de": ("der schnelle braune fuchs springt über den faulen hund und läuft "
           "weit weg mit großer geschwindigkeit während vögel in hohen bäumen "
           "singen nahe alten flüssen die zum weiten meer fließen").split(),
    "fr": ("le rapide renard brun saute par dessus le chien paresseux et "
           "court au loin avec une grande vitesse pendant que les oiseaux "
           "chantent dans les grands arbres près des vieilles rivières").split(),
    "es": ("el rápido zorro marrón salta sobre el perro perezoso y corre "
           "lejos con gran velocidad mientras los pájaros cantan en los "
           "árboles altos cerca de los viejos ríos que fluyen al mar").split(),
    "ar": ("الثعلب البني السريع يقفز فوق الكلب الكسول ويجري بعيدا بسرعة "
           "كبيرة بينما تغني الطيور في الأشجار العالية قرب الأنهار القديمة "
           "التي تتدفق إلى البحر الواسع تحت سماء صيف مشرقة").split(),
}
_LANGS = ("en", "en", "en", "de", "fr", "es", "ar")   # en-heavy mix

FAMILIES = ("poetry", "article_nav", "headings", "table_caption", "rtl",
            "charsets", "multi_block_merge", "dup_urls", "oversized",
            "pdf_text", "broken", "inline_marks")

# steady-state family weights (oversized/broken/pdf deliberately rare,
# mirroring a crawl's tail)
_WEIGHTS = {
    "poetry": 6, "article_nav": 30, "headings": 18, "table_caption": 8,
    "rtl": 6, "charsets": 6, "multi_block_merge": 12, "dup_urls": 6,
    "oversized": 1, "pdf_text": 4, "broken": 3, "inline_marks": 5,
}


def _sentence(rng: random.Random, lang: str, n: int) -> str:
    w = _WORDS[lang]
    return " ".join(rng.choice(w) for _ in range(n))


def _nav(rng: random.Random) -> str:
    links = "".join(f'<a href="/s/{i}">{_sentence(rng, "en", 1)}</a> '
                    for i in range(rng.randint(4, 9)))
    return f"<nav>{links}</nav>"


def _footer(rng: random.Random) -> str:
    links = "".join(f'<a href="/f/{i}">{_sentence(rng, "en", 2)}</a> | '
                    for i in range(rng.randint(3, 6)))
    return f"<footer>{links} copyright 2024</footer>"


def _page(body: str, lang: str, charset: str = "utf-8", title: str = "t") -> str:
    return (f'<!doctype html><html lang="{lang}"><head>'
            f'<meta charset="{charset}"><title>{title}</title>'
            f"<style>body{{margin:0}}</style><script>var x=1;</script></head>"
            f"<body>{body}</body></html>")


# --- family builders: rng → (html_bytes, text_field, lang) -----------------

def _f_poetry(rng: random.Random, lang: str):
    """Golden fixture: EXACTLY 3 blocks (heading + <p> + <blockquote>) and
    22 line spans (1 + 10 + 11) — the simple_poetry.png analogue."""
    t = _sentence(rng, lang, 3)
    st1 = "<br>".join(_sentence(rng, lang, 4) for _ in range(10))
    st2 = "<br>".join(_sentence(rng, lang, 4) for _ in range(11))
    body = f"{_nav(rng)}<main><h1>{t}</h1><p>{st1}</p><blockquote>{st2}</blockquote></main>{_footer(rng)}"
    return _page(body, lang).encode("utf-8"), None, lang

def _f_article_nav(rng: random.Random, lang: str):
    paras = "".join(f"<p>{_sentence(rng, lang, rng.randint(15, 40))}</p>"
                    for _ in range(rng.randint(3, 8)))
    aside = f'<aside>{"".join(f"<a href=/r/{i}>rel {i}</a>" for i in range(5))}</aside>'
    body = (f"{_nav(rng)}<header><a href=/>site</a> banner</header>"
            f"<article><h1>{_sentence(rng, lang, 5)}</h1>{paras}</article>"
            f"{aside}{_footer(rng)}")
    return _page(body, lang).encode("utf-8"), _sentence(rng, lang, 10), lang

def _f_headings(rng: random.Random, lang: str):
    parts = []
    for lvl in range(1, 7):
        parts.append(f"<h{lvl}>{_sentence(rng, lang, 3)}</h{lvl}>")
        parts.append(f"<p>{_sentence(rng, lang, rng.randint(10, 25))}</p>")
    return _page("".join(parts), lang).encode("utf-8"), None, lang

def _f_table_caption(rng: random.Random, lang: str):
    rows = "".join(f"<tr><td>{_sentence(rng, lang, 2)}</td>"
                   f"<td>{rng.randint(1, 999)}</td></tr>" for _ in range(4))
    body = (f"<p>{_sentence(rng, lang, 20)}</p>"
            f"<table><caption>{_sentence(rng, lang, 3)}</caption>{rows}</table>"
            f"<figure><img src=i.png><figcaption>{_sentence(rng, lang, 4)}</figcaption></figure>"
            f"<hr><p>{_sentence(rng, lang, 15)}</p>")
    return _page(body, lang).encode("utf-8"), None, lang

def _f_rtl(rng: random.Random, lang: str):
    lang = "ar"
    paras = "".join(f"<p>{_sentence(rng, lang, rng.randint(10, 25))}</p>"
                    for _ in range(3))
    body = f'{_nav(rng)}<article dir="rtl"><h1>{_sentence(rng, lang, 3)}</h1>{paras}</article>'
    return _page(body, lang).encode("utf-8"), None, lang

def _f_charsets(rng: random.Random, lang: str):
    variant = rng.randint(0, 2)
    text = f"Café naïve — {_sentence(rng, 'fr', 12)} àéîõü"
    if variant == 0:        # honest utf-8
        html = _page(f"<p>{text}</p>", lang, "utf-8")
        return html.encode("utf-8"), None, lang
    if variant == 1:        # honest latin-1, declared
        html = _page(f"<p>{text}</p>", lang, "iso-8859-1")
        return html.encode("latin-1", "replace"), None, lang
    # mis-declared: says utf-8, bytes are latin-1 → strict utf-8 fails → latin-1 fallback
    html = _page(f"<p>{text}</p>", lang, "utf-8")
    return html.encode("latin-1", "replace"), None, lang

def _f_multi_block_merge(rng: random.Random, lang: str):
    """Adjacent high-density divs split by markup noise (link-farm divs and
    empty divs) — must merge into ONE flowing block after noise removal."""
    chunks = []
    for i in range(4):
        chunks.append(f"<div>{_sentence(rng, lang, rng.randint(15, 30))}</div>")
        if i < 3:
            chunks.append('<div><a href="/x">x</a> <a href="/y">y</a></div>')
            chunks.append("<div>  </div>")
    return _page("".join(chunks), lang).encode("utf-8"), None, lang

def _f_oversized(rng: random.Random, lang: str, target_bytes: int = 65536):
    paras = []
    size = 0
    while size < target_bytes:
        p = f"<p>{_sentence(rng, lang, 60)}</p>"
        paras.append(p)
        size += len(p)
    body = f"<h1>{_sentence(rng, lang, 4)}</h1>" + "".join(paras)
    return _page(body, lang).encode("utf-8"), None, lang

def make_pdf(lines_by_para: list[list[str]], compress: bool = False) -> bytes:
    """Minimal deterministic single-page PDF with one content stream."""
    import zlib
    ops = []
    for para in lines_by_para:
        ops.append(b"BT /F1 12 Tf 72 720 Td")
        for ln in para:
            esc = ln.encode("latin-1", "replace").replace(b"\\", b"\\\\") \
                    .replace(b"(", b"\\(").replace(b")", b"\\)")
            ops.append(b"(" + esc + b") Tj 0 -14 Td")
        ops.append(b"ET")
    stream = b"\n".join(ops)
    filt = b""
    if compress:
        stream = zlib.compress(stream)
        filt = b"/Filter /FlateDecode "
    parts = [b"%PDF-1.4"]
    parts.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj")
    parts.append(b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj")
    parts.append(b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj")
    parts.append(b"4 0 obj << " + filt + b"/Length " + str(len(stream)).encode()
                 + b" >>\nstream\n" + stream + b"\nendstream\nendobj")
    parts.append(b"trailer << /Root 1 0 R >>\n%%EOF")
    return b"\n".join(parts)

def _f_pdf_text(rng: random.Random, lang: str):
    paras = [[_sentence(rng, "en", 6) for _ in range(rng.randint(2, 5))]
             for _ in range(rng.randint(1, 3))]
    return make_pdf(paras, compress=bool(rng.randint(0, 1))), None, lang

def _f_broken(rng: random.Random, lang: str):
    variant = rng.randint(0, 2)
    if variant == 0:                      # empty payload
        return b"", None, lang
    if variant == 1:                      # binary junk (NUL bytes)
        return bytes(rng.randrange(0, 256) for _ in range(256)) + b"\x00", None, lang
    # truncated HTML — parser degrades gracefully, still kind="html"
    full = _page(f"<p>{_sentence(rng, lang, 30)}</p><p>{_sentence(rng, lang, 20)}", lang)
    return full[:len(full) // 2].encode("utf-8"), None, lang

def _f_inline_marks(rng: random.Random, lang: str):
    """I13 word-flag fixture + block-anchor link cards:

    * a dropcap paragraph (`<span>O</span>nce …` — letter split out of its
      word by markup);
    * a formula paragraph with <sub>/<sup> words;
    * an HTML5 card farm of anchors WRAPPING flow content
      (<a><div><h3>…</h3><p>…</p></div></a>) — link text must keep counting
      across the inner paragraph boundaries so the cards classify NOISE.
    """
    word = rng.choice(["Once", "Deep", "Many", "Some"])
    dropcap_p = (f'<p><span class="dropcap">{word[0]}</span>{word[1:]} '
                 f"{_sentence(rng, lang, 15)}</p>")
    formula_p = (f"<p>{_sentence(rng, lang, 10)} "
                 f"H<sub>2</sub>O and E = mc<sup>2</sup></p>")
    cards = "".join(
        f'<a href="/c/{j}"><div><h3>card {j}</h3>'
        f'<p>{_sentence(rng, "en", 2)}</p></div></a>'
        for j in range(rng.randint(3, 6)))
    body = (f"{_nav(rng)}<main><h1>{_sentence(rng, lang, 4)}</h1>"
            f"{dropcap_p}{formula_p}<section>{cards}</section></main>"
            f"{_footer(rng)}")
    return _page(body, lang).encode("utf-8"), None, lang

_BUILDERS = {
    "poetry": _f_poetry, "article_nav": _f_article_nav, "headings": _f_headings,
    "table_caption": _f_table_caption, "rtl": _f_rtl, "charsets": _f_charsets,
    "multi_block_merge": _f_multi_block_merge, "oversized": _f_oversized,
    "pdf_text": _f_pdf_text, "broken": _f_broken,
    "inline_marks": _f_inline_marks,
}


def gen_rows(n_rows: int, seed: int = 42, oversized_bytes: int = 65536):
    """Yield row dicts.  Deterministic in (n_rows-prefix, seed): row i is a
    pure function of (seed, i), so any prefix of the stream is stable."""
    fam_cycle = list(FAMILIES)
    weighted = [f for f, w in _WEIGHTS.items() for _ in range(w)]
    i = 0
    emitted = 0
    while emitted < n_rows:
        rng = random.Random(f"{seed}:{i}")
        family = fam_cycle[i] if i < len(fam_cycle) else rng.choice(weighted)
        lang = rng.choice(_LANGS)
        ts = _EPOCH + _dt.timedelta(seconds=i, microseconds=i % 997)

        def _url(final_lang: str) -> str:
            # built from the BUILDER's final lang (rtl overrides to "ar"):
            # the module contract is that ground truth is recoverable from
            # the url path, so the path segment must match the lang column
            return f"https://{family}.example.com/{final_lang}/p{i}"

        if family == "dup_urls":
            html1, text1, lang = _f_article_nav(rng, lang)
            rng2 = random.Random(f"{seed}:{i}:dup")
            html2, text2, _ = _f_article_nav(rng2, lang)
            url = _url(lang)
            yield {"url": url, "warc_ts": ts, "html": html1, "text": text1, "lang": lang}
            emitted += 1
            if emitted < n_rows:
                yield {"url": url, "warc_ts": ts + _dt.timedelta(hours=1),
                       "html": html2, "text": text2, "lang": lang}
                emitted += 1
        else:
            builder = _BUILDERS[family]
            if family == "oversized":
                html, text, lang = builder(rng, lang, oversized_bytes)
            else:
                html, text, lang = builder(rng, lang)
            yield {"url": _url(lang), "warc_ts": ts, "html": html,
                   "text": text, "lang": lang}
            emitted += 1
        i += 1


def rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def write_corpus(out_dir: str, n_rows: int, seed: int = 42, shards: int = 1,
                 oversized_bytes: int = 65536) -> list[str]:
    """Write the corpus as ``shards`` parquet files (the resumable-partition
    input layout).  Returns the file paths."""
    import os

    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    per = (n_rows + shards - 1) // shards
    rows_iter = gen_rows(n_rows, seed, oversized_bytes)
    paths = []
    buf: list[dict] = []
    shard = 0

    def flush():
        nonlocal buf, shard
        if not buf:
            return
        path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
        pq.write_table(rows_to_table(buf), path)
        paths.append(path)
        buf = []
        shard += 1

    for row in rows_iter:
        buf.append(row)
        if len(buf) >= per:
            flush()
    flush()
    return paths
