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
