"""Corpus vocabulary building — token / n-gram frequency tables.

A core training-data-pipeline operation (tokenizer training, stopword
discovery, frequency filtering).  Classic two-phase aggregation
(ray_guide.md "Aggregation at scale"): tokens are exploded and PRE-COUNTED
inside each ``map_batches`` call (Arrow ``group_by`` — pure C), so the
shuffle carries one (token, partial_count) row per distinct token per batch
instead of one row per token occurrence; a vectorized ``Sum`` groupby then
merges partials and ``sort + limit`` yields the top-k.

Shuffle volume: O(distinct tokens × batches), independent of corpus token
count — the difference between shuffling 100 TB of tokens and a few GB of
partial counts.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: whitespace tokenization, matching the SQL oracle's regexp_split_to_array
WS_PATTERN = r"\s+"


def token_counts_batch(batch: pa.Table, *, text_col: str = "text",
                      ngram: int = 1) -> pa.Table:
    """(token, partial_count) — per-batch combiner, fully vectorized."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch[text_col]), WS_PATTERN)
    flat = pc.list_flatten(toks)
    if ngram > 1:
        # n-grams within documents: join adjacent tokens with a space,
        # never crossing document boundaries
        parents = pc.list_parent_indices(toks)
        toks_py = flat.to_pylist()
        par_py = parents.to_pylist()
        grams = []
        for i in range(len(toks_py) - ngram + 1):
            if par_py[i] == par_py[i + ngram - 1]:
                grams.append(" ".join(toks_py[i:i + ngram]))
        flat = pa.array(grams, pa.string())
    t = pa.table({"token": flat})
    counted = t.group_by("token").aggregate([("token", "count")])
    return pa.table({
        "token": counted["token"],
        "partial": counted["token_count"].cast(pa.int64()),
    })


def vocab_topk(ds, k: int = 100, *, text_col: str = "text", ngram: int = 1):
    """Top-k most frequent tokens: per-batch combine → Sum groupby →
    sort(count desc, token asc) → limit.  Deterministic tie-break."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        lambda b: token_counts_batch(b, text_col=text_col, ngram=ngram),
        batch_format="pyarrow", zero_copy_batch=True)
    totals = (partial.groupby("token")
              .aggregate(Sum("partial", alias_name="n")))
    return (totals.sort(["n", "token"], descending=[True, False]).limit(k))


def vocab_topk_sql(k: int = 100, table: str = "documents",
                   text_col: str = "text", ngram: int = 1) -> str:
    if ngram == 1:
        return f"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_split_to_array(trim({text_col}), '{WS_PATTERN}'))
        AS token FROM {table})
GROUP BY token ORDER BY n DESC, token LIMIT {k}"""
    # adjacent-token n-grams built with list lambdas (no ordinality needed)
    return f"""
WITH l AS (
  SELECT regexp_split_to_array(trim({text_col}), '{WS_PATTERN}') AS toks
  FROM {table}
),
g AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1]))
    AS token
  FROM l
)
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM g GROUP BY token ORDER BY n DESC, token LIMIT {k}"""
