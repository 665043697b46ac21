"""Quality / lineage metric rollups over the extracted table.

The reference's only aggregation is the per-document mean confidence
(``TessBaseAPIMeanTextConf``, /root/reference/src/.../TessAPI.java:517).  The
north rule requires corpus-level quality metrics; these are thin wide-step
wrappers (``groupby().aggregate``) over the extract stage's output columns —
the heavy lifting (per-doc counters) already happened inside ``map_batches``,
so the shuffle input is one small row per document, pre-shrunk by dropping
text/spans first.
"""

from __future__ import annotations

from ray.data.aggregate import Count, Max, Mean, Sum

_DOC_COLS = ["url", "lang", "payload_kind", "doc_confidence", "n_blocks",
             "payload_bytes"]


def _slim(extracted_ds):
    keep = [c for c in _DOC_COLS if c in extracted_ds.schema().names]
    return extracted_ds.select_columns(keep)


def metrics_by_lang(extracted_ds):
    """docs, mean confidence, total blocks, total bytes per (lang, kind)."""
    return (
        _slim(extracted_ds)
        .groupby(["lang", "payload_kind"])
        .aggregate(
            Count(alias_name="n_docs"),
            Mean("doc_confidence", alias_name="mean_confidence"),
            Sum("n_blocks", alias_name="total_blocks"),
            Sum("payload_bytes", alias_name="total_bytes"),
        )
    )


def metrics_global(extracted_ds) -> dict:
    """Whole-corpus rollup as a plain dict (small; driver-side is fine)."""
    res = _slim(extracted_ds).aggregate(
        Count(alias_name="n_docs"),
        Mean("doc_confidence", alias_name="mean_confidence"),
        Sum("n_blocks", alias_name="total_blocks"),
        Sum("payload_bytes", alias_name="total_bytes"),
        Max("payload_bytes", alias_name="max_payload_bytes"),
    )
    return dict(res)


def skew_report(extracted_ds, k: int = 20):
    """Top-k largest documents — the skew/straggler report (SURVEY.md §4).

    ``sort(desc).limit(k)`` over the slim projection only: the shuffle moves
    ~16 bytes/doc, not payloads.
    """
    return (
        _slim(extracted_ds)
        .select_columns(["url", "payload_bytes"])
        .sort("payload_bytes", descending=True)
        .limit(k)
    )
