"""Box-format emitter (M8) + cursor predicates (I3/I4) + PDF payload gen."""

import pyarrow as pa


def _extracted_row(html: bytes):
    from org_dharts_dia_tesseract_ray.stages.extractor import HtmlExtractor
    batch = pa.table({
        "url": ["u1"],
        "warc_ts": pa.array([0], pa.timestamp("us", tz="UTC")),
        "html": pa.array([html], pa.binary()),
        "text": [None],
        "lang": ["en"],
    })
    return HtmlExtractor()(batch)


def test_boxes_predicates_multiline():
    from org_dharts_dia_tesseract_ray.stages.extractor import boxes_batch
    # one paragraph, three lines via <br> → first/last predicates differ
    out = _extracted_row(b"<html><body><p>one<br>two<br>three</p></body></html>")
    boxes = boxes_batch(out, level="line")
    assert boxes["box_text"].to_pylist() == ["one", "two", "three"]
    assert boxes["is_first_in_parent"].to_pylist() == [True, False, False]
    assert boxes["is_last_in_parent"].to_pylist() == [False, False, True]
    # word level: slices index the final text exactly
    words = boxes_batch(out, level="word")
    assert words["box_text"].to_pylist() == ["one", "two", "three"]


def test_pdf_payload_deterministic_and_extractable():
    from org_dharts_dia_tesseract_ray.extract.api import extract_one
    from org_dharts_dia_tesseract_ray.pipelines.docs_pipeline import (
        make_pdf_payload)
    txt = "alpha (beta) gamma\\delta"
    for flate in (False, True):
        p1 = make_pdf_payload(3, txt, flate=flate)
        p2 = make_pdf_payload(3, txt, flate=flate)
        assert p1 == p2                      # byte-stable across calls
        r = extract_one(p1, "en")
        assert r.payload_kind == "pdf"
        assert r.text == f"Doc 3\n{txt}"
        assert r.n_blocks == 1


def test_pdf_hex_strings_and_tj_arrays():
    """PDF hex strings (<...> Tj, whitespace-tolerant, odd-digit padding)
    and mixed literal/hex TJ arrays decode like their literal equivalents
    (PDF 32000-1:2008 §7.3.4.3)."""
    from org_dharts_dia_tesseract_ray.extract.api import extract_one

    def pdf(content: bytes) -> bytes:
        return (b"%PDF-1.4\n1 0 obj\n<< /Length " +
                str(len(content)).encode() + b" >>\nstream\n" + content +
                b"\nendstream\nendobj\n%%EOF\n")

    # "Hello" as hex, split by whitespace; odd-count "4" pads to "@"
    r = extract_one(pdf(b"BT <4865 6C6C6F> Tj ET"), "en")
    assert r.payload_kind == "pdf" and r.text == "Hello"
    r = extract_one(pdf(b"BT <48656C6C6F4> Tj ET"), "en")
    assert r.text == "Hello@"                  # odd digit -> trailing 0 pad
    # mixed TJ array: literal, kern number (ignored), hex
    r = extract_one(pdf(b"BT [(He) -250 <6C6C6F>] TJ ET"), "en")
    assert r.text == "Hello"
    # hex with ' (move-to-next-line-and-show) operator
    r = extract_one(pdf(b"BT (A) Tj <42> ' ET"), "en")
    assert r.text == "A\nB"
    # empty hex string contributes nothing -> no text objects -> error row
    r = extract_one(pdf(b"BT <> Tj ET"), "en")
    assert r.payload_kind == "error"


def test_mixed_wrap_routes_pdf():
    import pyarrow.parquet as pq

    from org_dharts_dia_tesseract_ray.extract.api import sniff_kind
    from org_dharts_dia_tesseract_ray.pipelines.docs_pipeline import (
        wrap_documents_batch_mixed)
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(0, 30)
    t = wrap_documents_batch_mixed(docs)
    kinds = [sniff_kind(h) for h in t["html"].to_pylist()]
    ids = docs["doc_id"].to_pylist()
    for did, kind in zip(ids, kinds):
        assert kind == ("pdf" if did % 10 == 0 else "html")
