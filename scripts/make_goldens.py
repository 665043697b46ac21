"""Generate the committed fixture corpus + golden outputs (NO Ray).

The golden producer is the pinned SERIAL path through the same deterministic
extractor — the analogue of the reference's golden-count fixtures
(/root/reference/tests/.../LayoutIteratorTests.java:54,64).  Tests and the
driver's oracle queries then assert that the PARALLEL Ray pipeline reproduces
these bytes exactly, at any parallelism level.

Usage:  python scripts/make_goldens.py   (from the repo root)
Rewrites fixtures/pages_{tiny,small}.parquet and
fixtures/golden_{extracted,spans}_{tiny,small}.parquet.  Output is
byte-stable: rerunning on an unchanged extractor produces identical files.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from org_dharts_dia_tesseract_ray.extract.api import extract_one  # noqa: E402
from org_dharts_dia_tesseract_ray.sources.gen_corpus import (  # noqa: E402
    gen_rows, rows_to_table,
)
from org_dharts_dia_tesseract_ray.stages.extractor import (  # noqa: E402
    EXTRACTED_SCHEMA, SPANS_SCHEMA,
)

FIXTURES = os.path.join(REPO, "fixtures")

SCALES = {"tiny": 64, "small": 600}
SEED = 42


def extract_serial(rows: list[dict]) -> tuple[pa.Table, pa.Table]:
    """Pinned serial reference run: one row at a time, in input order."""
    doc_cols = {name: [] for name in EXTRACTED_SCHEMA.names if name != "spans"}
    span_cols = {name: [] for name in SPANS_SCHEMA.names}
    for row in rows:
        res = extract_one(row["html"], row["lang"], row["text"])
        doc_cols["url"].append(row["url"])
        doc_cols["warc_ts"].append(row["warc_ts"])
        doc_cols["lang"].append(row["lang"])
        doc_cols["extracted_text"].append(res.text)
        doc_cols["doc_confidence"].append(res.doc_confidence)
        doc_cols["n_blocks"].append(res.n_blocks)
        doc_cols["payload_kind"].append(res.payload_kind)
        doc_cols["charset"].append(res.charset)
        doc_cols["payload_bytes"].append(len(row["html"]) if row["html"] is not None else 0)
        doc_cols["error"].append(res.error)
        for s in res.spans:
            span_cols["url"].append(row["url"])
            span_cols["node_id"].append(s.node_id)
            span_cols["parent_id"].append(s.parent_id)
            span_cols["level"].append(s.level)
            span_cols["block_type"].append(s.block_type)
            span_cols["start"].append(s.start)
            span_cols["end"].append(s.end)
            span_cols["confidence"].append(s.confidence)
            span_cols["text_density"].append(s.text_density)
            span_cols["link_density"].append(s.link_density)
            span_cols["is_subscript"].append(s.is_subscript)
            span_cols["is_superscript"].append(s.is_superscript)
            span_cols["is_dropcap"].append(s.is_dropcap)
            span_cols["font_mask"].append(s.font_mask)

    doc_schema = pa.schema([f for f in EXTRACTED_SCHEMA if f.name != "spans"])
    extracted = pa.Table.from_pydict(doc_cols, schema=doc_schema)
    spans = pa.Table.from_pydict(span_cols, schema=SPANS_SCHEMA)
    return extracted, spans


def main() -> None:
    os.makedirs(FIXTURES, exist_ok=True)
    for scale, n in SCALES.items():
        rows = list(gen_rows(n, seed=SEED))
        pq.write_table(rows_to_table(rows),
                       os.path.join(FIXTURES, f"pages_{scale}.parquet"))
        extracted, spans = extract_serial(rows)
        pq.write_table(extracted,
                       os.path.join(FIXTURES, f"golden_extracted_{scale}.parquet"))
        pq.write_table(spans,
                       os.path.join(FIXTURES, f"golden_spans_{scale}.parquet"))
        print(f"{scale}: {len(rows)} pages, {extracted.num_rows} extracted, "
              f"{spans.num_rows} span rows")


if __name__ == "__main__":
    main()
