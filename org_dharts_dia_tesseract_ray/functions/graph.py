"""Link-graph analytics — fixed-point integer PageRank over an edge table.

The classic web-corpus quality signal (CC-PageRank-style host/page
ranking feeds pretraining-data filtering): rank mass flows along the
hyperlink graph for a fixed number of damped iterations.

**Integer fixed-point arithmetic is the determinism trick.**  Float
PageRank sums incoming contributions in whatever order the shuffle
delivers them — bit-nondeterministic across partitionings, impossible
to oracle-check exactly.  Here ranks are int64 micro-units
(``scale = 10^12`` total mass), every step is integer division and
integer addition, and integer sums are order-independent — so the
result is bit-identical across parallelism levels AND expressible as
plain SQL integer arithmetic (the oracle is a mechanically generated
K-level CTE chain).  Update rule per iteration::

    contrib(u→v) = rank(u) // outdeg(u)
    rank'(v)     = ((100-D) * (scale // N)) // 100
                   + (D * Σ contrib(·→v)) // 100        (D = damping %)

Dangling nodes (no out-edges) simply retire their mass each round —
the standard simplification, identical on both sides of the oracle.
Parallel edges are counted as a multiset (two edges ship two
contributions), again identical on both sides.  Precondition: every
edge endpoint must be in the node set (the broadcast variant raises on
violation; the partitioned variant would emit rank rows for phantom
``dst`` nodes and drop foreign-``src`` contributions).

Scale shape per iteration: ONE schema-pinned hash join (edges ⋈ ranks
on src — the ranks side is a groupby output, exactly the empty-block
hazard `util.schema_pinned_join` exists for), one per-batch pre-summed
``groupby(dst).Sum`` for the inflow, and a slim N-row ranks
materialization (iterative reuse — Ray re-executes shared sub-DAGs per
consumer, so each round's input must be pinned).  The edges ⋈ outdeg
table is joined and materialized ONCE before the loop.  Every node
gets an inflow row via a zero-contribution union (left-join semantics
without a left join); hot dst hubs are bounded by the per-batch
combiner (shuffle rows ≤ batches × distinct dst per batch).

Reference analogue: the engine's connected-region merging / adaptive
ranking of candidate regions (LayoutHandle block enumeration order) —
here the ranking is corpus-global over the hyperlink structure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import default_num_partitions, schema_pinned_join


def pagerank_int(nodes_ds, edges_ds, *, iterations: int = 10,
                 damping_pct: int = 85, scale: int = 10 ** 12,
                 node_col: str = "node", src_col: str = "src",
                 dst_col: str = "dst", num_partitions: int | None = None):
    """(node, rank) int64 after ``iterations`` damped rounds."""
    from ray.data.aggregate import Sum

    import ray
    import ray.data

    @ray.remote
    def _concat(*tables):
        return pa.concat_tables(tables).combine_chunks()

    def _pin(ds, cap: int):
        """Materialize, sever lineage, and BOUND the block count.

        ``from_arrow_refs`` over the executed block refs keeps the data in
        the object store but drops the logical plan (a plain
        ``materialize()`` keeps it attached and re-plans it every round).
        The block cap is the real fix for round-count scaling: each
        sort-shuffle emits ~input-many blocks, so uncapped ranks grow a few
        blocks per round and every later round launches linearly more
        tasks — quadratic total (measured +3 blocks and +0.08s marginal
        per round before this; near-flat after).  Coalescing is a handful
        of remote concats over the slim (node, rank) table, not a
        shuffle."""
        refs = ds.materialize().to_arrow_refs()
        if len(refs) > cap:
            groups = np.array_split(np.arange(len(refs)), cap)
            refs = [_concat.remote(*[refs[int(j)] for j in g])
                    for g in groups if len(g)]
        return ray.data.from_arrow_refs(refs)

    P = num_partitions or default_num_partitions()
    n_nodes = nodes_ds.count()
    if n_nodes == 0:
        # Ray never invokes map_batches on empty blocks, so the schema
        # must be pinned by constructing the typed empty table directly
        import ray.data
        return ray.data.from_arrow(pa.schema(
            [(node_col, pa.int64()), ("rank", pa.int64())]).empty_table())
    init_rank = scale // n_nodes
    base = ((100 - damping_pct) * init_rank) // 100
    i64 = pa.int64()

    def count_partial(b: pa.Table) -> pa.Table:
        t = pa.table({src_col: b[src_col]})
        c = t.group_by(src_col).aggregate([(src_col, "count")])
        return pa.table({src_col: c[src_col],
                         "partial": c[f"{src_col}_count"].cast(i64)})

    outdeg = (edges_ds.map_batches(count_partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
              .groupby(src_col).aggregate(Sum("partial", alias_name="d")))

    # joined ONCE, pinned for reuse across every iteration
    edges_deg = _pin(schema_pinned_join(
        edges_ds, outdeg, on=(src_col,), num_partitions=P,
        left_schema=pa.schema([(src_col, i64), (dst_col, i64)]),
        right_schema=pa.schema([(src_col, i64), ("d", i64)])), P)

    def init(b: pa.Table) -> pa.Table:
        return pa.table({
            node_col: b[node_col].cast(i64),
            "rank": pa.array(np.full(b.num_rows, init_rank, np.int64)),
        })

    ranks = _pin(nodes_ds.map_batches(init, batch_format="pyarrow",
                                      zero_copy_batch=True), P)

    # the zero-contribution rows are identical every round — pin them once
    # like edges_deg, or the nodes source re-executes per iteration
    zeros_pinned = None

    def rename_ranks(b: pa.Table) -> pa.Table:
        return pa.table({src_col: b[node_col], "rank": b["rank"]})

    def contrib(b: pa.Table) -> pa.Table:
        rank = np.asarray(b["rank"], dtype=np.int64)
        d = np.asarray(b["d"], dtype=np.int64)
        t = pa.table({dst_col: b[dst_col],
                      "c": pa.array(rank // d, i64)})
        # per-batch combiner: pre-sum per dst before the shuffle
        g = t.group_by(dst_col).aggregate([("c", "sum")])
        return pa.table({dst_col: g[dst_col],
                         "c": g["c_sum"].cast(i64)})

    def zeros(b: pa.Table) -> pa.Table:
        return pa.table({dst_col: b[node_col].cast(i64),
                         "c": pa.array(np.zeros(b.num_rows, np.int64))})

    out_schema = pa.schema([(node_col, i64), ("rank", i64)])

    def finish(b: pa.Table) -> pa.Table:
        # groupby output: pin the schema on empty hash partitions
        if b.num_rows == 0 or dst_col not in b.column_names:
            return out_schema.empty_table()
        s = np.asarray(b["s"], dtype=np.int64)
        return pa.table({
            node_col: b[dst_col],
            "rank": pa.array(base + (damping_pct * s) // 100, i64),
        })

    for _ in range(iterations):
        joined = schema_pinned_join(
            edges_deg, ranks.map_batches(rename_ranks,
                                         batch_format="pyarrow",
                                         zero_copy_batch=True),
            on=(src_col,), num_partitions=P,
            left_schema=pa.schema([(src_col, i64), (dst_col, i64),
                                   ("d", i64)]),
            right_schema=pa.schema([(src_col, i64), ("rank", i64)]))
        if zeros_pinned is None:
            zeros_pinned = _pin(nodes_ds.map_batches(
                zeros, batch_format="pyarrow", zero_copy_batch=True), P)
        inflow_rows = (joined.map_batches(contrib, batch_format="pyarrow",
                                          zero_copy_batch=True)
                       .union(zeros_pinned))
        ranks = _pin(inflow_rows.groupby(dst_col)
                     .aggregate(Sum("c", alias_name="s"))
                     .map_batches(finish, batch_format="pyarrow",
                                  zero_copy_batch=True), P)
    return ranks


def pagerank_broadcast(nodes_ds, edges_ds, *, iterations: int = 10,
                       damping_pct: int = 85, scale: int = 10 ** 12,
                       node_col: str = "node", src_col: str = "src",
                       dst_col: str = "dst"):
    """(node, rank) int64 — identical output to :func:`pagerank_int`
    (same integer arithmetic, asserted in tests), different physical
    plan: the rank VECTOR is the broadcast small side (PCA-style
    sufficient-statistics shape).  A host-level web graph has ~10^8
    nodes (a 0.8 GB int64 vector — one `ray.put` object per node per
    round) while the edge table is the 10^12-row big side that stays
    distributed; each iteration is one sweep over the edge blocks
    emitting per-block pre-summed sparse contributions, reduced on the
    driver with `np.add.at` (rows <= blocks x distinct dst per block).
    No shuffle at all.  For page-level graphs whose node set exceeds
    broadcast size, use :func:`pagerank_int`.

    The iteration loop runs as RAW Ray tasks over the materialized edge
    block refs — one of the few places the Dataset API is the wrong
    altitude: a per-iteration `map_batches` pipeline pays ~0.3 s of
    executor startup per round (10+ rounds = seconds of pure overhead)
    for what is a fixed task fan-out + driver reduce.  The endpoint
    index (searchsorted positions of src/dst) is also computed ONCE and
    pinned per block, so each round is just gather/divide/scatter."""
    import ray

    id_chunks = [np.asarray(bt[node_col], dtype=np.int64)
                 for bt in nodes_ds.select_columns([node_col])
                 .iter_batches(batch_format="pyarrow")]
    ids = np.sort(np.concatenate(id_chunks)) if id_chunks else \
        np.empty(0, dtype=np.int64)
    n = len(ids)
    if n == 0:
        import ray.data
        return ray.data.from_arrow(pa.table({node_col: pa.array([],
                                                                pa.int64()),
                                             "rank": pa.array([],
                                                              pa.int64())}))
    init_rank = scale // n
    base = ((100 - damping_pct) * init_rank) // 100
    edges = edges_ds.materialize()
    ids_ref = ray.put(ids)

    def _index(ids_arr: np.ndarray, col, name: str) -> np.ndarray:
        v = np.asarray(col, dtype=np.int64)
        pos = np.searchsorted(ids_arr, v)
        pos_c = np.minimum(pos, len(ids_arr) - 1)
        if not (ids_arr[pos_c] == v).all():
            # a silent mis-map would corrupt ranks — fail the batch
            raise ValueError(f"edge {name} endpoint not in node set")
        return pos

    @ray.remote(num_returns=2)
    def index_block(tbl: pa.Table, ids_arr: np.ndarray):
        """One-time per-block endpoint indexing (validates both ends).
        Returns the pinned (src_idx, dst_idx) pair and the block's
        out-degree partial."""
        s = _index(ids_arr, tbl[src_col], src_col)
        d = _index(ids_arr, tbl[dst_col], dst_col)
        j, c = np.unique(s, return_counts=True)
        return (np.stack([s, d]).astype(np.int64),
                (j.astype(np.int64), c.astype(np.int64)))

    @ray.remote
    def flow_block(sd: np.ndarray, deg_arr: np.ndarray,
                   rank_arr: np.ndarray):
        s, d = sd
        c = rank_arr[s] // deg_arr[s]
        j, inv = np.unique(d, return_inverse=True)
        acc = np.zeros(len(j), dtype=np.int64)
        np.add.at(acc, inv, c)
        return j, acc

    sd_refs = []
    deg_futs = []
    for blk in edges.to_arrow_refs():
        sd, dp = index_block.remote(blk, ids_ref)
        sd_refs.append(sd)           # stays in the object store
        deg_futs.append(dp)          # small partial, reduced on driver
    deg = np.zeros(n, dtype=np.int64)
    for j, c in ray.get(deg_futs):   # endpoint-validation errors surface here
        np.add.at(deg, j, c)
    deg_ref = ray.put(deg)

    ranks = np.full(n, init_rank, dtype=np.int64)
    for _ in range(iterations):
        rank_ref = ray.put(ranks)
        futs = [flow_block.remote(sd, deg_ref, rank_ref) for sd in sd_refs]
        inflow = np.zeros(n, dtype=np.int64)
        for j, c in ray.get(futs):
            np.add.at(inflow, j, c)
        ranks = base + (damping_pct * inflow) // 100

    import ray.data
    return ray.data.from_arrow(pa.table({
        node_col: pa.array(ids, pa.int64()),
        "rank": pa.array(ranks, pa.int64()),
    }))


def pagerank_sql(edges_sql: str, *, iterations: int = 10,
                 damping_pct: int = 85, scale: int = 10 ** 12,
                 nodes_table: str = "documents",
                 node_col: str = "doc_id") -> str:
    """Mechanically generated K-level CTE chain mirroring the integer
    update rule exactly.  ``edges_sql`` must select (src, dst) from the
    same node domain."""
    D = damping_pct
    parts = [f"nodes AS (SELECT {node_col} AS node FROM {nodes_table})",
             "nn AS (SELECT count(*) AS c FROM nodes)",
             f"edges AS ({edges_sql})",
             "outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS d "
             "FROM edges GROUP BY src)",
             f"r0 AS (SELECT node, CAST({scale} // (SELECT c FROM nn) "
             "AS BIGINT) AS rank FROM nodes)"]
    base = (f"(({100 - D}) * ({scale} // (SELECT c FROM nn))) // 100")
    for t in range(1, iterations + 1):
        parts.append(f"""r{t} AS (
  SELECT nd.node,
         CAST({base} + ({D} * COALESCE(inf.s, 0)) // 100 AS BIGINT) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank // o.d) AS s
    FROM edges e
    JOIN r{t - 1} r ON e.src = r.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst) inf USING (node))""")
    chain = ",\n".join(parts)
    return (f"WITH {chain}\n"
            f"SELECT node AS {node_col}, rank FROM r{iterations}")
