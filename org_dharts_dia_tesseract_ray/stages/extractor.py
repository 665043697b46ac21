"""The extraction actor-pool stage — the engine's flagship transform.

This is the Ray-Data reimagining of the reference's per-document recognition
loop: one ``ImageAnalyzerFactory`` held per thread with documents fed one at
a time (/root/reference/src/.../ImageAnalyzerFactory.java:40-43, 204-211)
becomes a callable CLASS passed to ``map_batches`` — expensive state built
once per actor in ``__init__`` (the ``TesseractHandle.create()/init()``
analogue, TesseractHandle.java:82-102, 380-459), per-document work in
``__call__`` over zero-copy Arrow batches.

Output schema = ``extracted`` document rows (SURVEY.md §1.3) plus a nested
``spans`` list<struct> column: ONE parse pass produces both tables; the
``spans`` table is a cheap columnar explode downstream
(:func:`explode_spans`), never a re-parse.  The input ``html`` payload column
is dropped on output so downstream blocks shrink (SURVEY.md §4 memory note).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import ExtractConfig
from ..extract.api import extract_one
from ..extract.types import PayloadKind

SPAN_STRUCT = pa.struct([
    ("node_id", pa.int32()),
    ("parent_id", pa.int32()),
    ("level", pa.string()),
    ("block_type", pa.string()),
    ("start", pa.int64()),
    ("end", pa.int64()),
    ("confidence", pa.float32()),
    ("text_density", pa.float32()),
    ("link_density", pa.float32()),
    ("is_subscript", pa.bool_()),
    ("is_superscript", pa.bool_()),
    ("is_dropcap", pa.bool_()),
    # packed word font attributes (FontAttributes.java:28-59 analogue):
    # 1=bold 2=italic 4=underlined 8=monospace — see extract/types.py
    ("font_mask", pa.uint8()),
])

EXTRACTED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us", tz="UTC")),
    ("lang", pa.string()),
    ("extracted_text", pa.string()),
    ("doc_confidence", pa.float32()),
    ("n_blocks", pa.int32()),
    ("payload_kind", pa.string()),
    ("charset", pa.string()),
    ("payload_bytes", pa.int64()),
    ("error", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

SPANS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("node_id", pa.int32()),
    ("parent_id", pa.int32()),
    ("level", pa.string()),
    ("block_type", pa.string()),
    ("start", pa.int64()),
    ("end", pa.int64()),
    ("confidence", pa.float32()),
    ("text_density", pa.float32()),
    ("link_density", pa.float32()),
    ("is_subscript", pa.bool_()),
    ("is_superscript", pa.bool_()),
    ("is_dropcap", pa.bool_()),
    ("font_mask", pa.uint8()),
])


class HtmlExtractor:
    """Stateful extraction actor (ST1 in SURVEY.md §2.3).

    ``__init__`` runs once per actor — config is frozen here, designing out
    the reference's cross-thread setVariable hazard
    (ImageAnalyzerFactory.java:106-116).  ``__call__`` runs per batch and is
    a pure function of the batch: no state survives between documents (the
    adaptive-classifier behavior of TessAPI.java:536 is deliberately NOT
    replicated — determinism gate).
    """

    def __init__(self, cfg: ExtractConfig | None = None):
        self.cfg = cfg or ExtractConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        urls = batch["url"]
        html_col = batch["html"]
        lang_col = batch["lang"] if "lang" in batch.column_names else None
        text_col = batch["text"] if "text" in batch.column_names else None
        ts_col = batch["warc_ts"]

        texts: list[str] = []
        confs: list[float] = []
        nblocks: list[int] = []
        kinds: list[str] = []
        charsets: list[str] = []
        pbytes: list[int] = []
        errors: list[str | None] = []
        # spans collected whole per doc (one C-level extend each); the flat
        # field columns are built afterwards with one comprehension per
        # field — measurably faster than 12 per-span .append calls in the
        # hottest loop
        offsets = [0]
        all_spans: list = []

        # bulk-convert once (chunk-wise C loop) — per-element .as_py() costs
        # a Python call per cell
        payloads = html_col.to_pylist()
        langs = lang_col.to_pylist() if lang_col is not None else [None] * n
        ctexts = text_col.to_pylist() if text_col is not None else [None] * n
        for i in range(n):
            payload = payloads[i]
            lang = langs[i]
            ctext = ctexts[i]
            res = extract_one(payload, lang, ctext, cfg)
            texts.append(res.text)
            confs.append(res.doc_confidence)
            nblocks.append(res.n_blocks)
            kinds.append(res.payload_kind)
            charsets.append(res.charset)
            pbytes.append(len(payload) if payload is not None else 0)
            errors.append(res.error)
            all_spans.extend(res.spans)
            offsets.append(len(all_spans))

        struct_arr = pa.StructArray.from_arrays(
            [
                pa.array([s.node_id for s in all_spans], pa.int32()),
                pa.array([s.parent_id for s in all_spans], pa.int32()),
                pa.array([s.level for s in all_spans], pa.string()),
                pa.array([s.block_type for s in all_spans], pa.string()),
                pa.array([s.start for s in all_spans], pa.int64()),
                pa.array([s.end for s in all_spans], pa.int64()),
                pa.array([s.confidence for s in all_spans], pa.float32()),
                pa.array([s.text_density for s in all_spans], pa.float32()),
                pa.array([s.link_density for s in all_spans], pa.float32()),
                pa.array([s.is_subscript for s in all_spans], pa.bool_()),
                pa.array([s.is_superscript for s in all_spans], pa.bool_()),
                pa.array([s.is_dropcap for s in all_spans], pa.bool_()),
                pa.array([s.font_mask for s in all_spans], pa.uint8()),
            ],
            fields=list(SPAN_STRUCT),
        )
        spans_arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                             struct_arr)
        return pa.Table.from_arrays(
            [
                urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls,
                ts_col.combine_chunks() if isinstance(ts_col, pa.ChunkedArray) else ts_col,
                (lang_col.combine_chunks() if isinstance(lang_col, pa.ChunkedArray)
                 else lang_col) if lang_col is not None
                else pa.nulls(n, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(confs, pa.float32()),
                pa.array(nblocks, pa.int32()),
                pa.array(kinds, pa.string()),
                pa.array(charsets, pa.string()),
                pa.array(pbytes, pa.int64()),
                pa.array(errors, pa.string()),
                spans_arr,
            ],
            schema=EXTRACTED_SCHEMA,
        )


def explode_spans_batch(batch: pa.Table) -> pa.Table:
    """Vectorized explode of the nested spans column → flat spans table.

    The columnar equivalent of the reference's BlockIterator flatten
    (examples/.../BlockIterator.java:57-81): ``list_parent_indices`` +
    ``list_flatten`` — no Python per-row loop.
    """
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent_idx = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    urls = pc.take(batch["url"], parent_idx)
    cols = [urls] + [flat.field(i) for i in range(len(SPAN_STRUCT))]
    return pa.Table.from_arrays(cols, schema=SPANS_SCHEMA)


BOXES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("node_id", pa.int32()),
    ("level", pa.string()),
    ("start", pa.int64()),
    ("end", pa.int64()),
    ("box_text", pa.string()),
    ("is_first_in_parent", pa.bool_()),
    ("is_last_in_parent", pa.bool_()),
])


def boxes_batch(batch: pa.Table, *, level: str = "line") -> pa.Table:
    """Box-format emitter — the ``TessBaseAPIGetBoxText`` analogue (M8 in
    SURVEY.md §2.2): one row per span at ``level`` with its text slice, plus
    the cursor-algebra predicates ``isAtBeginningOf`` / ``isAtFinalElement``
    (I3/I4, LayoutIterator.java:216-218, 252-254) derived by offset
    arithmetic against the parent span — the flattened-table equivalent of
    the reference's cursor state queries.

    Vectorized like :func:`explode_spans_batch`: flatten + parent lookup
    via global index arithmetic (a span's position inside its document's
    list equals its ``node_id`` — ids are allocated in append order by
    ``assemble``), so the parent row of flat position j is
    ``list_offset(doc) + parent_id``.  Only the final text slice runs per
    row (a C-level str slice), never a per-span dict conversion."""
    import numpy as np

    spans_col = batch["spans"]
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    flat = pc.list_flatten(spans_col)
    parent_row = np.asarray(pc.list_parent_indices(spans_col))
    # rebase physical list offsets to the flattened (logical) value space
    offs = np.asarray(spans_col.offsets, dtype=np.int64)
    doc_offsets = (offs - offs[0])[:-1]

    nid = np.asarray(flat.field("node_id"), dtype=np.int64)
    pid = np.asarray(flat.field("parent_id"), dtype=np.int64)
    start = np.asarray(flat.field("start"))
    end = np.asarray(flat.field("end"))
    # parent span's global flat index (clamped for root spans, pid == -1)
    pg = doc_offsets[parent_row] + np.maximum(pid, 0)
    is_root = pid < 0
    p_start = start[pg]
    p_end = end[pg]
    first = is_root | (start == p_start)
    last = is_root | (end == p_end)

    keep = np.flatnonzero(np.asarray(pc.equal(flat.field("level"), level)))
    texts = batch["extracted_text"].to_pylist()
    k_row = parent_row[keep]
    k_s = start[keep]
    k_e = end[keep]
    slices = [texts[r][s:e]
              for r, s, e in zip(k_row.tolist(), k_s.tolist(), k_e.tolist())]
    keep_arr = pa.array(keep, pa.int64())
    return pa.Table.from_arrays(
        [pc.take(batch["url"], pa.array(k_row, pa.int64())),
         flat.field("node_id").take(keep_arr),
         flat.field("level").take(keep_arr),
         pa.array(k_s, pa.int64()), pa.array(k_e, pa.int64()),
         pa.array(slices, pa.string()),
         pa.array(first[keep]), pa.array(last[keep])],
        schema=BOXES_SCHEMA)


WORD_PRED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("start", pa.int64()),
    ("end", pa.int64()),
    ("word", pa.string()),
    ("is_dictionary_word", pa.bool_()),
    ("is_numeric", pa.bool_()),
])

#: punctuation stripped before the predicate checks — EXACTLY the set the
#: confidence score's dictionary-hit feature strips (html_extract.
#: _para_confidence); the two must stay in sync.
_PRED_PUNCT = ".,;:!?\"'()[]«»"


def word_predicates_batch(batch: pa.Table) -> pa.Table:
    """``isDictionaryWord`` / ``isNumeric`` word predicates — the I12
    analogue (RecognitionResultsIterator.java:128-136,
    ResultHandle.java:131-151): one row per word span with the two
    predicate columns, dictionary membership per the document's language
    (``stopwords_for`` — the TessBaseAPIIsValidWord analogue, same
    normalization as the confidence score's dictionary-hit feature).

    Vectorized like :func:`boxes_batch`: flatten + slice, then pyarrow
    trim/lower/is_in/regex kernels — the only per-row Python is the text
    slice."""
    import numpy as np

    from ..extract.html_extract import stopwords_for

    spans_col = batch["spans"]
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    flat = pc.list_flatten(spans_col)
    parent_row = np.asarray(pc.list_parent_indices(spans_col))
    start = np.asarray(flat.field("start"))
    end = np.asarray(flat.field("end"))
    is_word = np.asarray(pc.equal(flat.field("level"), "word"))
    # zero-length word spans are the non-text-block placeholder words —
    # they carry no text and are not predicate subjects
    keep = np.flatnonzero(is_word & (end > start))
    k_row = parent_row[keep]
    k_s = start[keep]
    k_e = end[keep]
    texts = batch["extracted_text"].to_pylist()
    words = [texts[r][s:e]
             for r, s, e in zip(k_row.tolist(), k_s.tolist(), k_e.tolist())]
    warr = pa.array(words, pa.string())
    norm = pc.utf8_lower(pc.utf8_trim(warr, _PRED_PUNCT))
    langs = (batch["lang"].to_pylist() if "lang" in batch.column_names
             else [None] * batch.num_rows)
    rl = np.array([(langs[r] or "en")[:2].lower() for r in k_row.tolist()],
                  dtype=object)
    isdict = np.zeros(len(words), dtype=bool)
    for lg in set(rl.tolist()):
        sw = pa.array(sorted(stopwords_for(lg)), pa.string())
        hit = np.asarray(pc.is_in(norm, value_set=sw))
        isdict |= hit & (rl == lg)
    isnum = np.asarray(pc.match_substring_regex(norm, r"^[0-9]+$"))
    return pa.Table.from_arrays(
        [pc.take(batch["url"], pa.array(k_row, pa.int64())),
         pa.array(k_s, pa.int64()), pa.array(k_e, pa.int64()),
         warr, pa.array(isdict), pa.array(isnum)],
        schema=WORD_PRED_SCHEMA)


def apply_word_predicates(ds, **kwargs):
    return ds.map_batches(word_predicates_batch, batch_format="pyarrow",
                          zero_copy_batch=True, **kwargs)


def apply_boxes(ds, *, level: str = "line", **kwargs):
    return ds.map_batches(lambda b: boxes_batch(b, level=level),
                          batch_format="pyarrow", zero_copy_batch=True,
                          **kwargs)


HOCR_SCHEMA = pa.schema([("url", pa.string()), ("hocr", pa.string())])

_HOCR_DEPTH = {"block": 1, "para": 2, "line": 3, "word": 4}


def _hocr_esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def render_hocr_doc(text: str, spans: list[dict],
                    include_words: bool = False) -> str:
    """One document's hOCR string — the ``TessBaseAPIGetHOCRText`` analogue
    (reference TessAPI.java:494, hOCR spec class names).  The reference's
    2-D ``bbox x0 y0 x1 y1`` becomes the 1-D offset form ``bbox start 0
    end 1`` (I5's BoundingBox→offset mapping); the spans table remains the
    structured source of truth, this is its rendering.

    Spans arrive in depth-first reading order (the order ``next(level)``
    visits nodes, BasePageHandle.java:128-134), so a close-to-depth stack
    rebuilds the nesting without consulting ``parent_id``."""
    return _hocr_render(
        text or "", range(len(spans)),
        [s["level"] for s in spans], [s["node_id"] for s in spans],
        [s["start"] for s in spans], [s["end"] for s in spans],
        [s.get("confidence", 0.0) for s in spans], include_words)


def _hocr_render(text: str, idxs, lvls, nids, sts, ens, confs,
                 include_words: bool) -> str:
    """Core over parallel field lists — the batch path feeds these straight
    from the Arrow struct fields (a whole-column ``to_pylist`` on the
    nested struct list costs ~35× the rendering itself; per-field
    primitive ``to_pylist`` is cheap)."""
    out = [f"<div class='ocr_page' id='page_0' "
           f"title='bbox 0 0 {len(text)} 1'>"]
    close: list[str] = []

    def close_to(depth: int) -> None:
        while len(close) >= depth:
            out.append(close.pop())

    for i in idxs:
        lvl = lvls[i]
        close_to(_HOCR_DEPTH[lvl])
        nid, st, en = nids[i], sts[i], ens[i]
        if lvl == "block":
            out.append(f"<div class='ocr_carea' id='block_{nid}' "
                       f"title='bbox {st} 0 {en} 1'>")
            close.append("</div>")
        elif lvl == "para":
            out.append(f"<p class='ocr_par' id='par_{nid}'>")
            close.append("</p>")
        elif lvl == "line":
            head = (f"<span class='ocr_line' id='line_{nid}' "
                    f"title='bbox {st} 0 {en} 1'>")
            if include_words:
                out.append(head)
                close.append("</span>")
            else:
                out.append(head + _hocr_esc(text[st:en]) + "</span>")
        elif lvl == "word" and include_words:
            # confidence is already on the hOCR 0-100 scale
            # (_para_confidence emits 0-100; same scale unlv reject_below
            # documents) — a further ×100 put x_wconf on 0-10000
            conf = int(round(float(confs[i])))
            out.append(f"<span class='ocrx_word' id='word_{nid}' "
                       f"title='bbox {st} 0 {en} 1; x_wconf {conf}'>"
                       + _hocr_esc(text[st:en]) + "</span>")
    close_to(1)
    out.append("</div>")
    return "\n".join(out)


def _flat_span_fields(spans_col: pa.ListArray, names: list[str]):
    """(doc offsets, {field: flat Python list}) for the fields ``names`` —
    the shared columnar fast path for the string renderers."""
    import numpy as np
    flat = pc.list_flatten(spans_col)
    offs = np.asarray(spans_col.offsets, dtype=np.int64)
    offs = offs - offs[0]
    return offs, {n: flat.field(n).to_pylist() for n in names}


def hocr_batch(batch: pa.Table, *, include_words: bool = False) -> pa.Table:
    """(url, hocr) — hOCR rendering of each document (M7's string form).
    String assembly is inherently per-document; the heavy work (parsing,
    span extraction) already happened once in the extract stage — this is a
    pure formatting pass over its output."""
    spans_col = batch["spans"]
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    texts = batch["extracted_text"].to_pylist()
    offs, f = _flat_span_fields(
        spans_col, ["level", "node_id", "start", "end", "confidence"])
    docs = [_hocr_render(texts[d] or "", range(offs[d], offs[d + 1]),
                         f["level"], f["node_id"], f["start"], f["end"],
                         f["confidence"], include_words)
            for d in range(batch.num_rows)]
    return pa.Table.from_arrays(
        [batch["url"].combine_chunks()
         if isinstance(batch["url"], pa.ChunkedArray) else batch["url"],
         pa.array(docs, pa.string())],
        schema=HOCR_SCHEMA)


def apply_hocr(ds, *, include_words: bool = False, **kwargs):
    return ds.map_batches(lambda b: hocr_batch(b, include_words=include_words),
                          batch_format="pyarrow", zero_copy_batch=True,
                          **kwargs)


UNLV_SCHEMA = pa.schema([("url", pa.string()), ("unlv", pa.string())])


def render_unlv_doc(text: str, spans: list[dict], *,
                    reject_below: float = 0.0) -> str:
    """One document's UNLV-format string — the ``TessBaseAPIGetUNLVText``
    analogue (reference binding TessAPI.java:512; the third trivial
    projection over the spans table next to hOCR and boxes).

    1-D adaptation of the UNLV conventions: words space-joined per line,
    one line per text line, a blank line between blocks, trailing newline;
    superscript words prefixed ``^`` and subscript words ``_`` (the
    word-flag analogues of UNLV's scripted-character markers,
    RecognitionResultsIterator.java:146-158); words whose confidence falls
    below ``reject_below`` (0-100 scale) are masked to ``~`` per character
    (the UNLV reject character).  Non-text blocks are skipped entirely —
    UNLV carries recognized text only."""
    return _unlv_render(
        text, range(len(spans)),
        [s["level"] for s in spans], [s["block_type"] for s in spans],
        [s["start"] for s in spans], [s["end"] for s in spans],
        [s.get("confidence", 0.0) for s in spans],
        [s.get("is_subscript", False) for s in spans],
        [s.get("is_superscript", False) for s in spans], reject_below)


def _unlv_render(text: str, idxs, lvls, btypes, sts, ens, confs, subs,
                 sups, reject_below: float) -> str:
    """Core over parallel field lists (see :func:`_hocr_render`)."""
    from ..extract.types import BlockType

    lines: list[tuple[int, list[str]]] = []      # (block ordinal, words)
    block_i = -1
    in_text_block = False
    for i in idxs:
        lvl = lvls[i]
        if lvl == "block":
            block_i += 1
            in_text_block = BlockType.is_text(btypes[i])
        elif not in_text_block:
            continue
        elif lvl == "line":
            lines.append((block_i, []))
        elif lvl == "word" and lines:
            w = text[sts[i]:ens[i]]
            if float(confs[i]) < reject_below:
                w = "~" * len(w)
            if sups[i]:
                w = "^" + w
            elif subs[i]:
                w = "_" + w
            lines[-1][1].append(w)
    out: list[str] = []
    prev_block = None
    for bi, words in lines:
        if prev_block is not None and bi != prev_block:
            out.append("")                       # blank line between blocks
        prev_block = bi
        out.append(" ".join(words))
    return "\n".join(out) + "\n" if out else ""


def unlv_batch(batch: pa.Table, *, reject_below: float = 0.0) -> pa.Table:
    """(url, unlv) — UNLV rendering of each document.  Pure formatting pass
    over the extract output, same altitude as :func:`hocr_batch`."""
    spans_col = batch["spans"]
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    texts = batch["extracted_text"].to_pylist()
    offs, f = _flat_span_fields(
        spans_col, ["level", "block_type", "start", "end", "confidence",
                    "is_subscript", "is_superscript"])
    docs = [_unlv_render(texts[d] or "", range(offs[d], offs[d + 1]),
                         f["level"], f["block_type"], f["start"], f["end"],
                         f["confidence"], f["is_subscript"],
                         f["is_superscript"], reject_below)
            for d in range(batch.num_rows)]
    return pa.Table.from_arrays(
        [batch["url"].combine_chunks()
         if isinstance(batch["url"], pa.ChunkedArray) else batch["url"],
         pa.array(docs, pa.string())],
        schema=UNLV_SCHEMA)


def apply_unlv(ds, *, reject_below: float = 0.0, **kwargs):
    return ds.map_batches(lambda b: unlv_batch(b, reject_below=reject_below),
                          batch_format="pyarrow", zero_copy_batch=True,
                          **kwargs)


def default_concurrency(fraction: float = 1.0) -> tuple:
    """Autoscaling actor-pool bounds sized to the cluster CPU count.

    (1, N) lets Ray scale the pool up under load and release workers when
    another stage needs them — per-stage static sizing starves neighbours.
    """
    from ..util import cluster_cpus
    # cap below the CPU count: a pool holding every slot starves the read /
    # write tasks feeding it (measured: a fixed cpu-sized pool deadlocks to
    # a crawl on a single node)
    return (1, max(1, int(cluster_cpus() * fraction) - 2))


#: per-worker-process extractor cache for task-mode execution: state is
#: still built once per worker (the TessBaseAPI amortization), but work is
#: scheduled as ordinary tasks.
_PROCESS_EXTRACTORS: dict = {}


def make_extract_fn(cfg: ExtractConfig | None):
    key = cfg or ExtractConfig()

    def extract_fn(batch: pa.Table) -> pa.Table:
        ex = _PROCESS_EXTRACTORS.get(key)
        if ex is None:
            ex = _PROCESS_EXTRACTORS.setdefault(key, HtmlExtractor(key))
        return ex(batch)

    return extract_fn


def apply_extract(ds, cfg: ExtractConfig | None = None, *,
                  batch_size: int = 128, concurrency=None, num_cpus: float = 1,
                  compute: str = "tasks", **kwargs):
    """Attach the extract stage to a pages Dataset.

    ``compute="tasks"`` (default): plain ``map_batches`` task pool with a
    per-worker-process extractor cache.  Measured on this workload
    (32-CPU single node, 400k docs): tasks ≈ 33k docs/s vs actor pool
    ≈ 14-19k and high variance — Ray's actor submission path costs ~2× for
    a cheap-init stage, and a fixed-size pool can starve upstream reads.

    ``compute="actors"``: the autoscaling actor-pool form (ST1 in SURVEY.md
    §2.3) — the right choice when ``__init__`` loads genuinely expensive
    state (models, big language tables); capped below the CPU count so
    source/sink tasks never starve.
    """
    if compute == "tasks":
        return ds.map_batches(
            make_extract_fn(cfg),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            **kwargs,
        )
    if concurrency is None:
        concurrency = default_concurrency()
    return ds.map_batches(
        HtmlExtractor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        **kwargs,
    )


def apply_explode_spans(ds, **kwargs):
    return ds.map_batches(explode_spans_batch, batch_format="pyarrow",
                          zero_copy_batch=True, **kwargs)
