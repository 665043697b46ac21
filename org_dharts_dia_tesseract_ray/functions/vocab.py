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


def doc_ngrams_batch(text_col, n: int):
    """All word ``n``-grams of a batch plus the row each one belongs to —
    the shared aligned-slice kernel: join n aligned slices of the
    flattened token stream element-wise, keep positions whose first and
    last token share a document (``list_parent_indices``) — no Python
    token loop.  Null text contributes no grams (its row still counts
    toward ``n_docs``).

    Returns ``(grams, parents, n_docs)``; used by vocabulary counting
    (grams only) and decontamination (grams + parent rows).
    """
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(text_col), WS_PATTERN)
    n_docs = len(toks)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    if n <= 1:
        return flat, parents, n_docs
    n_flat = len(flat)
    if n_flat < n:
        return pa.array([], pa.string()), pa.array([], pa.int64()), n_docs
    width = n_flat - n + 1
    parts = [flat.slice(i, width) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    same_doc = pc.equal(parents.slice(0, width),
                        parents.slice(n - 1, width))
    return (grams.filter(same_doc), parents.slice(0, width).filter(same_doc),
            n_docs)


def token_counts_batch(batch: pa.Table, *, text_col: str = "text",
                      ngram: int = 1) -> pa.Table:
    """(token, partial_count) — per-batch combiner, fully vectorized."""
    flat, _, _ = doc_ngrams_batch(batch[text_col], ngram)
    t = pa.table({"token": flat})
    counted = t.group_by("token").aggregate([("token", "count")])
    return pa.table({
        "token": counted["token"],
        "partial": counted["token_count"].cast(pa.int64()),
    })


def vocab_topk(ds, k: int = 100, *, text_col: str = "text", ngram: int = 1):
    """Top-k most frequent tokens: per-batch combine → Sum groupby →
    sort(count desc, token asc) → limit.  Deterministic tie-break."""
    from ..util import grouped_arrow_aggregate

    partial = ds.map_batches(
        lambda b: token_counts_batch(b, text_col=text_col, ngram=ngram),
        batch_format="pyarrow", zero_copy_batch=True)
    totals = grouped_arrow_aggregate(partial, "token",
                                     [("partial", "sum", "n")])
    return (totals.sort(["n", "token"], descending=[True, False]).limit(k))


def tokenize_ids(ds, model: pa.Table, *, text_col: str = "text",
                 id_col: str = "doc_id"):
    """text → token-id sequences against a broadcast vocabulary — the
    tokenization step that feeds sequence packing.

    ``model`` is the (token, n) table from :func:`vocab_topk` /
    ``build_unigram_model`` IN RANK ORDER (n desc, token asc): token id =
    1 + rank position, id 0 = OOV/UNK.  The model is ``ray.put`` once and
    read zero-copy per batch; per batch ONE ``index_in`` over the
    flattened token stream, then the id list is rebuilt on the split's
    own offsets — no Python token loop.  Output: (id, n_tokens, n_oov,
    ids list<int32>)."""
    import ray

    ref = ray.put(model["token"].combine_chunks())

    def encode(b: pa.Table) -> pa.Table:
        import numpy as np

        vocab = ray.get(ref)          # zero-copy local plasma read
        # null text → '' (one empty-string OOV token after the split) so
        # the row SURVIVES with a defined encoding — mirrored by the
        # oracle's COALESCE; a validity-less ListArray rebuild would
        # otherwise silently turn null lists into empty ones and drop the
        # doc from the SQL side only
        tcol = b[text_col]
        if tcol.null_count:
            tcol = pc.fill_null(tcol, "")
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(tcol), WS_PATTERN)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        idx = pc.index_in(flat, value_set=vocab)
        ids_flat = pc.fill_null(
            pc.add(idx.cast(pa.int32()), pa.scalar(1, pa.int32())),
            pa.scalar(0, pa.int32()))
        if isinstance(ids_flat, pa.ChunkedArray):
            ids_flat = ids_flat.combine_chunks()
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        oov = np.asarray(pc.is_null(idx))
        n_oov = np.zeros(b.num_rows, np.int64)
        np.add.at(n_oov, parents[oov], 1)
        ids = pa.ListArray.from_arrays(toks.offsets, ids_flat)
        return pa.table({
            id_col: b[id_col],
            "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
            "n_oov": pa.array(n_oov, pa.int64()),
            "ids": ids,
        })

    return ds.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True)


def tokenize_ids_sql(vocab_size: int, *, table: str = "documents",
                     text_col: str = "text", id_col: str = "doc_id") -> str:
    """Oracle: same tokenizer, same (n desc, token asc) rank ids, OOV=0,
    ids projected to a CSV string (list columns don't hash in the
    compare frame)."""
    return f"""
WITH lists AS (
  SELECT {id_col},
         regexp_split_to_array(trim(COALESCE({text_col}, '')),
                               '{WS_PATTERN}') AS toks
  FROM {table}),
tok AS (
  SELECT {id_col}, unnest(toks) AS token,
         unnest(range(1, length(toks) + 1)) AS i
  FROM lists),
model AS (
  SELECT token, row_number() OVER (ORDER BY n DESC, token) AS tid
  FROM (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok
        GROUP BY token ORDER BY n DESC, token LIMIT {vocab_size}))
SELECT t.{id_col},
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (m.tid IS NULL) AS BIGINT) AS n_oov,
       string_agg(CAST(COALESCE(m.tid, 0) AS VARCHAR), ','
                  ORDER BY t.i) AS ids_csv
FROM tok t LEFT JOIN model m USING (token)
GROUP BY t.{id_col}"""


def doc_frequency(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Inverted-index statistics: per token, document frequency + posting
    bounds (n_docs, min/max doc id).

    The posting-list build pattern without materializing lists through the
    shuffle: distinct (token, doc) pairs are emitted per batch (a doc lives
    in exactly one row, so pairs are globally unique), then ONE vectorized
    groupby aggregates the posting stats.  A full posting-list sink would
    replace the aggregate with ``map_groups`` writing sorted id runs.
    """
    def pairs(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(b[text_col]), WS_PATTERN)
        ids = b[id_col]
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        doc = pc.take(ids, parents)
        t = pa.table({"token": flat, id_col: doc})
        # distinct within doc (== globally distinct): vectorized group_by
        return t.group_by(["token", id_col]).aggregate([])

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow",
                             zero_copy_batch=True)
    from ..util import grouped_arrow_aggregate
    return grouped_arrow_aggregate(
        pair_ds, "token", [(id_col, "count", "n_docs"),
                           (id_col, "min", "min_doc"),
                           (id_col, "max", "max_doc")])


def doc_frequency_sql(table: str = "documents", text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    return f"""
SELECT token,
       CAST(count(*) AS BIGINT) AS n_docs,
       min({id_col}) AS min_doc, max({id_col}) AS max_doc
FROM (SELECT {id_col},
             unnest(list_distinct(
                 regexp_split_to_array(trim({text_col}), '{WS_PATTERN}')))
               AS token
      FROM {table})
GROUP BY token"""


def tfidf_top_term(ds, n_corpus: int, *, text_col: str = "text",
                   id_col: str = "doc_id", num_partitions: int | None = None):
    """Per document: the term with the highest tf·idf (idf = ln(N/df)).

    Web-scale composition — every stage is a Dataset op, nothing touches
    the driver, TWO all-to-alls total:

    1. (doc, token, tf) explode with per-batch Arrow ``group_by`` (globally
       distinct pairs by construction: a doc lives in one row), tagged
       ``__part = hash(token) % P``;
    2. ONE token-partition exchange: every token's pairs co-locate, so the
       document frequency is just the token's RUN LENGTH after an in-
       partition sort — no separate df aggregation, no join back (the
       former df-table + hash-join plan tokenized the corpus twice and
       paid a third shuffle; it also hit Ray's empty-block join hazard,
       now centrally solved by ``util.schema_pinned_join`` for the joins
       that remain elsewhere);
    3. vectorized scoring in the same pass (idf via ``math.log`` once per
       DISTINCT df value — bit-identical to the oracle's scalar ln), then
       the per-doc argmax as ONE packed-rank ``Max`` aggregate — the
       survivor-index pattern: tfidf's raw float64 bits (order-preserving
       for non-negative floats) zero-padded decimal, then ``|token``.

    Tie-break is (tfidf desc, token desc) — deterministic, mirrored in the
    SQL oracle's row_number.
    """
    import math

    import numpy as np
    from ..util import grouped_arrow_aggregate

    from ..util import cluster_cpus, key_change_mask, partition_ids

    if num_partitions is None:
        num_partitions = max(2, min(32, cluster_cpus()))

    in_schema = ds.schema()
    id_type = in_schema.types[in_schema.names.index(id_col)]
    text_type = in_schema.types[in_schema.names.index(text_col)]
    tok_type = (pa.large_string()
                if pa.types.is_large_string(text_type) else pa.string())

    def tf_pairs(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(b[text_col]), WS_PATTERN)
        flat = pc.list_flatten(toks)
        doc = pc.take(b[id_col], pc.list_parent_indices(toks))
        t = pa.table({id_col: doc, "token": flat})
        g = t.group_by([id_col, "token"]).aggregate([("token", "count")])
        out = pa.table({id_col: g[id_col], "token": g["token"],
                        "tf": g["token_count"].cast(pa.int64())})
        return out.append_column(
            "__part", partition_ids(out["token"], num_partitions))

    pairs = ds.map_batches(tf_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)

    rank_schema = pa.schema([(id_col, id_type), ("__rank", pa.string())])

    def score_part(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["__part"]).sort_by([("token", "ascending")])
        n = part.num_rows
        if n == 0:
            return rank_schema.empty_table()
        # df = run length per token ((doc, token) pairs are globally
        # distinct, and ALL of a token's pairs live in this partition)
        change = key_change_mask(part["token"], n)
        run_id = np.cumsum(change) - 1
        dfv = np.bincount(run_id)[run_id]
        tf = np.asarray(pc.cast(part["tf"], pa.int64()))
        uniq, inv = np.unique(dfv, return_inverse=True)
        idf = np.array([math.log(n_corpus / d) for d in uniq],
                       dtype=np.float64)
        tfidf = tf.astype(np.float64) * idf[inv]
        bits = pa.array(tfidf.view(np.uint64))
        bits_str = pc.utf8_lpad(pc.cast(bits, pa.string()), 20, "0")
        rank = pc.binary_join_element_wise(bits_str, part["token"], "|")
        return pa.table({id_col: part[id_col], "__rank": rank})

    best = grouped_arrow_aggregate(
        pairs.groupby("__part").map_groups(score_part,
                                           batch_format="pyarrow"),
        id_col, [("__rank", "max", "__best")])

    def unpack(b: pa.Table) -> pa.Table:
        import numpy as np
        if b.num_rows == 0:
            return pa.schema([(id_col, id_type), ("top_token", tok_type),
                              ("tfidf", pa.float64())]).empty_table()
        bits = np.asarray(
            pc.cast(pc.utf8_slice_codeunits(b["__best"], 0, 20),
                    pa.uint64()))
        tfidf = bits.view(np.float64)
        q = np.floor(tfidf * 1e6 + 0.5) / 1e6   # half away (tfidf >= 0)
        token = pc.utf8_slice_codeunits(b["__best"], 21, 2**31 - 1)
        return pa.table({id_col: b[id_col], "top_token": token,
                         "tfidf": pa.array(q, pa.float64())})

    return best.map_batches(unpack, batch_format="pyarrow",
                            zero_copy_batch=True)


def tfidf_top_term_sql(n_corpus, table: str = "documents",
                       text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """``n_corpus`` may be an int or a SQL expression string (e.g. a
    ``(SELECT count(*) …)`` subquery so the oracle tracks the table)."""
    return f"""
WITH pairs AS (
  SELECT {id_col}, token, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT {id_col},
               unnest(regexp_split_to_array(trim({text_col}),
                                            '{WS_PATTERN}')) AS token
        FROM {table})
  GROUP BY {id_col}, token
),
df AS (
  SELECT token, CAST(count(DISTINCT {id_col}) AS BIGINT) AS n_docs
  FROM pairs GROUP BY token
),
scored AS (
  SELECT p.{id_col}, p.token,
         p.tf * ln({n_corpus} / df.n_docs) AS tfidf,
         row_number() OVER (PARTITION BY p.{id_col}
                            ORDER BY p.tf * ln({n_corpus} / df.n_docs) DESC,
                                     p.token DESC) AS rk
  FROM pairs p JOIN df USING (token)
)
SELECT {id_col}, token AS top_token,
       round(tfidf * 1000000.0) / 1000000.0 AS tfidf
FROM scored WHERE rk = 1"""


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
