"""Link-graph operators: distributed fixed-point PageRank over an edge
Dataset, plus the deterministic synthetic link graph the contract uses.

Not in the reference (its corpora are flat BEIR collections); a web-scale
index pipeline needs link analysis next to the text index (crawl
prioritization, spam/quality priors, ranking signals). The operator is
Ray-Data-shaped end to end: per-iteration work is two hash-partitioned
groupbys (co-locate pr with edges by src, then reduce contributions by
dst) — the driver only ever sees scalars (N, dangling mass), never nodes
or edges.

Determinism contract (the reason this is *fixed-point*): float PageRank
sums in-neighbor contributions per node, and float summation order is
neither partition-independent nor engine-portable (numpy pairwise !=
DuckDB list_sum != strict sequential — measured). All mass here is int64
micro-units (SCALE = 10^12) with integer division, so every sum is exact
and order-free; results are bit-identical across partitionings, CPU
counts, and engines, and a DuckDB oracle reproduces them exactly.

    pr_q[0]    = SCALE // N                       (per node)
    contrib    = pr_q[src] // outdeg[src]         (per edge)
    dm         = sum(pr_q[dangling]) // N         (dangling redistribution)
    pr_q[t+1]  = (3*SCALE) // (20*N)              [= (1-d)/N, d = 0.85]
               + (17 * (sum(contrib by dst) + dm)) // 20

Overflow: total mass <= SCALE = 10^12, so 17 * per-node sums stay far
below 2^63. Quantization error is 1e-12 per op — ranking-irrelevant.

Scale shape: edges are the big table and are re-tagged per iteration with
two int32 partition keys (a map_batches scan — no driver round trip); pr
is one small (node, pr_q) row per node, co-partitioned by the same hash.
At 10^12 edges the per-iteration cost is two shuffles of (dst, contrib)
rows — the canonical Pregel-style PageRank exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 10**12
_DAMP_NUM, _DAMP_DEN = 17, 20  # damping 0.85 as an exact rational
_MIX = np.uint64(0x9E3779B97F4A7C15)

# deterministic synthetic link offsets (pairwise differences never divide
# the corpus sizes in play, so the three out-edges of a doc are distinct)
LINK_OFFSETS = (7, 28, 63)


def _part_of(key: np.ndarray, n_parts: int) -> np.ndarray:
    h = key.astype(np.uint64) * _MIX
    return ((h >> np.uint64(33)) % np.uint64(n_parts)).astype(np.int32)


def synth_links(docs_ds, n_docs: int):
    """Deterministic link graph over the documents table: doc ``i`` links
    to ``(i + off + n_chars_i) % N`` for each offset — a content-derived,
    SQL-reproducible rule (the contract oracle re-derives it). Self-loops
    dropped, duplicate edges deduped. Every node keeps >= 2 out-edges for
    any N not divisible by an offset difference, so the synthetic graph
    has no dangling nodes (the operator still handles them)."""

    def edges(batch: pa.Table) -> pa.Table:
        src = batch.column("doc_id").to_numpy().astype(np.int64)
        nch = batch.column("n_chars").to_numpy().astype(np.int64)
        outs, outd = [], []
        for off in LINK_OFFSETS:
            dst = (src + off + nch) % n_docs
            keep = dst != src
            outs.append(src[keep])
            outd.append(dst[keep])
        s = np.concatenate(outs)
        d = np.concatenate(outd)
        # batch-local dedup (the rule can only collide within one src,
        # and a src never spans batches in a parquet row-group read —
        # but dedup globally anyway via lexsort+unique per batch)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        keep = np.ones(s.size, dtype=bool)
        keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        return pa.table(
            {"src": pa.array(s[keep], pa.int64()),
             "dst": pa.array(d[keep], pa.int64())}
        )

    return docs_ds.map_batches(edges, batch_format="pyarrow")


def _outdegrees(edges_ds, n_parts: int):
    """(src, outdeg) via the repo's hash-partitioned combiner shape."""

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy().astype(np.int64)
        u, c = np.unique(src, return_counts=True)
        return pa.table(
            {"src": pa.array(u, pa.int64()),
             "cnt": pa.array(c.astype(np.int64), pa.int64()),
             "part": pa.array(_part_of(u, n_parts))}
        )

    def final(g: pa.Table) -> pa.Table:
        src = g.column("src").to_numpy()
        u, inv = np.unique(src, return_inverse=True)
        sums = np.zeros(u.size, dtype=np.int64)
        np.add.at(sums, inv, g.column("cnt").to_numpy())
        return pa.table(
            {"src": pa.array(u, pa.int64()),
             "outdeg": pa.array(sums, pa.int64())}
        )

    return (
        edges_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final, batch_format="pyarrow")
    )


def _node_table(edges_ds, n_parts: int):
    """Distinct node ids from both edge endpoints (hash-partition dedup)."""

    def explode(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy().astype(np.int64)
        d = batch.column("dst").to_numpy().astype(np.int64)
        u = np.unique(np.concatenate([s, d]))
        return pa.table(
            {"node": pa.array(u, pa.int64()),
             "part": pa.array(_part_of(u, n_parts))}
        )

    def dedup(g: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.array(np.unique(g.column("node").to_numpy()),
                              pa.int64())}
        )

    return (
        edges_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup, batch_format="pyarrow")
    )


def pagerank(edges_ds, *, iters: int = 10, n_parts: int = 64,
             n_nodes: int | None = None, mode: str = "auto",
             broadcast_limit: int = 2_000_000,
             seeds: "np.ndarray | None" = None) -> "ray.data.Dataset":  # noqa: F821,E501
    """Fixed-point PageRank (damping 17/20) -> Dataset (node, pr_q).

    ``pr_q`` is int64 micro-units of probability mass (``SCALE`` = 1e12);
    divide by SCALE for the float value. Exact integer arithmetic makes
    the result independent of partitioning, summation order, and engine —
    the module docstring pins the update rule the DuckDB oracle replays.

    ``edges_ds`` needs (src:int64, dst:int64), pre-deduped (parallel
    edges count double, as in the classic formulation over a multigraph).
    Dangling mass (nodes with no out-edges) redistributes uniformly.
    ``n_nodes`` skips the node-count pass when the caller knows N.

    Two execution paths, bit-identical by integer exactness (the repo's
    standard broadcast-threshold routing — cf. dedup.attach_pair_payloads):

    - ``broadcast`` (n <= ``broadcast_limit``): the pr/outdeg vectors (8
      bytes/node) live on the driver and broadcast once per iteration via
      ``ray.put``; each edge batch emits per-batch exact partial sums
      (an integer combiner), ONE small hash groupby reduces them to
      <= N rows. Per-iteration cost: one edges scan + one tiny shuffle.
    - ``distributed`` (above the limit): pr is a co-partitioned Dataset;
      each iteration is the canonical Pregel exchange — co-locate pr
      with edges by hash(src), emit contributions, reduce by hash(dst).
      Nothing node- or edge-sized ever reaches the driver.

    ``seeds`` (sorted-deduped internally) switches to PERSONALIZED
    PageRank (TrustRank-style): teleport and dangling mass go only to
    the seed set, split uniformly over |seeds| —

        base_v    = (3*SCALE) // (20*|seeds|)  if v in seeds else 0
        pr_q[t+1] = base_v + (17*(sum(contrib by dst)
                                  + (dm if v in seeds else 0))) // 20

    with ``dm = sum(pr_q[dangling]) // |seeds|``. Initialization stays
    uniform over all nodes (pinned spec — the oracle replays it). The
    seed array is broadcast once via ``ray.put`` (personalization sets
    are small by definition); ``seeds=None`` is byte-identical to the
    classic rule above.
    """
    import ray

    nodes = _node_table(edges_ds, n_parts).materialize()
    n = int(n_nodes) if n_nodes is not None else int(nodes.count())
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "pr_q": pa.array([], pa.int64())})
        )
    if seeds is not None:
        seeds = np.unique(np.asarray(seeds, dtype=np.int64))
        if seeds.size == 0:
            raise ValueError("pagerank: seeds must be non-empty when given")
    n_t = int(seeds.size) if seeds is not None else n
    base = (3 * SCALE) // (_DAMP_DEN * n_t)

    deg = _outdegrees(edges_ds, n_parts)

    if mode == "broadcast" or (mode == "auto" and n <= broadcast_limit):
        return _pagerank_broadcast(
            edges_ds, nodes, deg, n=n, base=base, iters=iters,
            n_parts=n_parts, seeds=seeds, n_t=n_t,
        )

    # static per-iteration state: (node, pr_q, outdeg) co-partitioned with
    # the edges by hash(node) == hash(src). outdeg == 0 marks dangling.
    def seed_pr(g: pa.Table) -> pa.Table:
        return g.append_column(
            "pr_q",
            pa.array(np.full(g.num_rows, SCALE // n, np.int64), pa.int64()),
        )

    def tag_nodes(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy().astype(np.int64)
        return pa.table(
            {"node": batch.column("node"),
             "outdeg": pa.nulls(batch.num_rows, pa.int64()),
             "part": pa.array(_part_of(node, n_parts))}
        )

    def tag_deg(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy().astype(np.int64)
        return pa.table(
            {"node": batch.column("src"),
             "outdeg": batch.column("outdeg").cast(pa.int64()),
             "part": pa.array(_part_of(src, n_parts))}
        )

    def join_deg(g: pa.Table) -> pa.Table:
        valid = g.column("outdeg").combine_chunks().is_valid().to_numpy(
            zero_copy_only=False
        )
        node = g.column("node").to_numpy().astype(np.int64)
        degv = g.column("outdeg").to_numpy(zero_copy_only=False)
        left = node[~valid]
        rn = node[valid]
        rdeg = degv[valid].astype(np.int64)
        order = np.argsort(rn, kind="stable")
        rn_s, rdeg_s = rn[order], rdeg[order]
        out = np.zeros(left.size, dtype=np.int64)
        if rn_s.size:
            pos = np.minimum(
                np.searchsorted(rn_s, left), rn_s.size - 1
            )
            m = rn_s[pos] == left
            out[m] = rdeg_s[pos[m]]
        return pa.table(
            {"node": pa.array(left, pa.int64()),
             "outdeg": pa.array(out, pa.int64())}
        )

    tagged = nodes.map_batches(tag_nodes, batch_format="pyarrow").union(
        deg.map_batches(tag_deg, batch_format="pyarrow")
    )
    state = (
        tagged.groupby("part")
        .map_groups(join_deg, batch_format="pyarrow")
        .map_batches(seed_pr, batch_format="pyarrow")
        .materialize()
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy().astype(np.int64)
        return pa.table(
            {"node": batch.column("src"),
             "dst": batch.column("dst"),
             "part": pa.array(_part_of(src, n_parts))}
        )

    edges_tagged = edges_ds.map_batches(
        tag_edges, batch_format="pyarrow"
    ).materialize()

    def dangling_partial(batch: pa.Table) -> pa.Table:
        deg_v = batch.column("outdeg").to_numpy()
        pr_v = batch.column("pr_q").to_numpy()
        return pa.table(
            {"dmass": pa.array([int(pr_v[deg_v == 0].sum())], pa.int64())}
        )

    # one upfront scan: a graph with no dangling nodes (e.g. the synthetic
    # contract graph) skips the per-iteration dangling-mass pass entirely
    import pyarrow.compute as pc

    has_dangling = any(
        int(pc.sum(b.column("dmass")).as_py() or 0) > 0
        for b in state.map_batches(
            dangling_partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
    )

    seeds_ref = ray.put(seeds) if seeds is not None else None

    for _ in range(iters):
        # dangling mass: exact integer sum (order-free), scalar to driver
        if has_dangling:
            dparts = state.map_batches(
                dangling_partial, batch_format="pyarrow"
            ).to_pandas()
            dm = int(dparts["dmass"].sum()) // n_t
        else:
            dm = 0

        # phase 1: co-locate pr/outdeg with edges by src, emit contribs
        def emit_contribs(g: pa.Table) -> pa.Table:
            is_edge = g.column("dst").combine_chunks().is_valid().to_numpy(
                zero_copy_only=False
            )
            if not is_edge.any():
                return pa.table(
                    {"dst": pa.array([], pa.int64()),
                     "contrib": pa.array([], pa.int64())}
                )
            node_all = g.column("node").to_numpy().astype(np.int64)
            pr_all = g.column("pr_q").to_numpy(zero_copy_only=False)
            deg_all = g.column("outdeg").to_numpy(zero_copy_only=False)
            st = ~is_edge
            node = node_all[st]
            order = np.argsort(node, kind="stable")
            node_s = node[order]
            pr_s = pr_all[st].astype(np.int64)[order]
            deg_s = deg_all[st].astype(np.int64)[order]
            src = node_all[is_edge]
            pos = np.searchsorted(node_s, src)
            # every edge src exists in the node table by construction
            contrib = pr_s[pos] // np.maximum(deg_s[pos], 1)
            # dst rode through the padded union as float64 (the shared
            # schema); values are node ids <= 2^53, exact
            dst = g.column("dst").to_numpy(
                zero_copy_only=False
            )[is_edge].astype(np.int64)
            return pa.table(
                {"dst": pa.array(dst, pa.int64()),
                 "contrib": pa.array(contrib.astype(np.int64), pa.int64())}
            )

        def tag_state_for_join(batch: pa.Table) -> pa.Table:
            node = batch.column("node").to_numpy().astype(np.int64)
            return pa.table(
                {"node": batch.column("node"),
                 "pr_q": batch.column("pr_q").cast(pa.int64()),
                 "outdeg": batch.column("outdeg").cast(pa.int64()),
                 "dst": pa.nulls(batch.num_rows, pa.float64()),
                 "part": pa.array(_part_of(node, n_parts))}
            )

        def tag_edges_for_join(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch.column("node"),
                 "pr_q": pa.nulls(batch.num_rows, pa.int64()),
                 "outdeg": pa.nulls(batch.num_rows, pa.int64()),
                 "dst": batch.column("dst").cast(pa.float64()),
                 "part": batch.column("part")}
            )

        # materialized: fusing both shuffles into one plan makes the
        # second sort's boundary sampling re-execute the first (measured
        # ~4x wall time); the message table is the canonical Pregel
        # per-iteration intermediate anyway
        contribs = (
            state.map_batches(tag_state_for_join, batch_format="pyarrow")
            .union(
                edges_tagged.map_batches(
                    tag_edges_for_join, batch_format="pyarrow"
                )
            )
            .groupby("part")
            .map_groups(emit_contribs, batch_format="pyarrow")
            .materialize()
        )

        # phase 2: reduce contributions by dst (exact integer sums), then
        # apply the update rule per node; zero-inlink nodes get base + dm
        def tag_contrib(batch: pa.Table) -> pa.Table:
            dst = batch.column("dst").to_numpy().astype(np.int64)
            return pa.table(
                {"node": pa.array(dst, pa.int64()),
                 "contrib": batch.column("contrib"),
                 "outdeg": pa.nulls(batch.num_rows, pa.int64()),
                 "part": pa.array(_part_of(dst, n_parts))}
            )

        def tag_state_for_update(batch: pa.Table) -> pa.Table:
            node = batch.column("node").to_numpy().astype(np.int64)
            return pa.table(
                {"node": batch.column("node"),
                 "contrib": pa.nulls(batch.num_rows, pa.int64()),
                 "outdeg": batch.column("outdeg").cast(pa.int64()),
                 "part": pa.array(_part_of(node, n_parts))}
            )

        def update(g: pa.Table, base=base, dm=dm,
                   seeds_ref=seeds_ref) -> pa.Table:
            is_state = g.column("outdeg").combine_chunks().is_valid() \
                .to_numpy(zero_copy_only=False)
            node_all = g.column("node").to_numpy().astype(np.int64)
            st_node = node_all[is_state]
            st_deg = g.column("outdeg").to_numpy(
                zero_copy_only=False
            )[is_state].astype(np.int64)
            cb = ~is_state
            # exact int64 contribution sums per node, order-free
            s = np.zeros(st_node.size, dtype=np.int64)
            if cb.any():
                cn = node_all[cb]
                cv = g.column("contrib").to_numpy(
                    zero_copy_only=False
                )[cb].astype(np.int64)
                order = np.argsort(st_node, kind="stable")
                st_sorted = st_node[order]
                pos = np.minimum(
                    np.searchsorted(st_sorted, cn),
                    max(st_sorted.size - 1, 0),
                )
                # every contrib dst is a node in this partition's state
                # by the shared hash partitioning; the match guard keeps
                # a violation from silently corrupting a neighbor
                m = st_sorted[pos] == cn if st_sorted.size else \
                    np.zeros(cn.size, bool)
                np.add.at(s, order[pos[m]], cv[m])
            if seeds_ref is None:
                pr = base + (_DAMP_NUM * (s + dm)) // _DAMP_DEN
            else:
                import ray

                sd = ray.get(seeds_ref)  # zero-copy sorted seed ids
                pos = np.searchsorted(sd, st_node)
                m = (pos < sd.size) & (
                    sd[np.minimum(pos, sd.size - 1)] == st_node
                )
                pr = (np.where(m, base, 0)
                      + (_DAMP_NUM * (s + np.where(m, dm, 0)))
                      // _DAMP_DEN)
            return pa.table(
                {"node": pa.array(st_node, pa.int64()),
                 "outdeg": pa.array(st_deg, pa.int64()),
                 "pr_q": pa.array(pr.astype(np.int64), pa.int64())}
            )

        state = (
            contribs.map_batches(tag_contrib, batch_format="pyarrow")
            .union(
                state.map_batches(
                    tag_state_for_update, batch_format="pyarrow"
                )
            )
            .groupby("part")
            .map_groups(update, batch_format="pyarrow")
            .materialize()
        )

    def emit(batch: pa.Table) -> pa.Table:
        return batch.select(["node", "pr_q"])

    return state.map_batches(emit, batch_format="pyarrow")


def _pagerank_broadcast(edges_ds, nodes, deg, *, n: int, base: int,
                        iters: int, n_parts: int,
                        seeds: "np.ndarray | None" = None,
                        n_t: int | None = None):
    """Broadcast-path PageRank: driver-resident (node, outdeg, pr) vectors
    (<= broadcast_limit rows, 8 B each), integer combiner per edge batch,
    one small hash groupby per iteration. Bit-identical to the
    distributed path (integer arithmetic is order-free)."""
    import ray
    import ray.data as rd

    n_t = n if n_t is None else n_t
    node_ids = np.sort(
        np.concatenate(
            [b.column("node").to_numpy()
             for b in nodes.iter_batches(batch_format="pyarrow")]
            or [np.empty(0, np.int64)]
        ).astype(np.int64)
    )
    outdeg = np.zeros(node_ids.size, dtype=np.int64)
    for b in deg.iter_batches(batch_format="pyarrow"):
        pos = np.searchsorted(node_ids, b.column("src").to_numpy())
        outdeg[pos] = b.column("outdeg").to_numpy()
    dangling = outdeg == 0
    pr = np.full(node_ids.size, SCALE // n, dtype=np.int64)
    if seeds is None:
        base_v, dm_m = np.int64(base), np.ones(node_ids.size, np.int64)
    else:
        pos = np.searchsorted(seeds, node_ids)
        m = (pos < seeds.size) & (
            seeds[np.minimum(pos, seeds.size - 1)] == node_ids
        )
        base_v = np.where(m, base, 0).astype(np.int64)
        dm_m = m.astype(np.int64)

    edges_mat = edges_ds.materialize()

    for _ in range(iters):
        dm = int(pr[dangling].sum()) // n_t
        contrib_vec = pr // np.maximum(outdeg, 1)
        ref = ray.put((node_ids, contrib_vec))

        def partial(batch: pa.Table, ref=ref) -> pa.Table:
            ids, cv = ray.get(ref)  # zero-copy numpy from the store
            src = batch.column("src").to_numpy().astype(np.int64)
            dst = batch.column("dst").to_numpy().astype(np.int64)
            c = cv[np.searchsorted(ids, src)]
            ud, inv = np.unique(dst, return_inverse=True)
            sums = np.zeros(ud.size, dtype=np.int64)
            np.add.at(sums, inv, c)
            return pa.table(
                {"node": pa.array(ud, pa.int64()),
                 "psum": pa.array(sums, pa.int64())}
            )

        # the driver already holds the node vector (that IS the
        # broadcast-path contract), so per-batch partials merge here by
        # exact int64 scatter-add — no per-iteration shuffle; addition
        # is order-free so the result stays bit-identical
        s = np.zeros(node_ids.size, dtype=np.int64)
        for b in edges_mat.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            pos = np.searchsorted(node_ids, b.column("node").to_numpy())
            np.add.at(s, pos, b.column("psum").to_numpy())
        pr = base_v + (_DAMP_NUM * (s + dm * dm_m)) // _DAMP_DEN

    return rd.from_arrow(
        pa.table({"node": pa.array(node_ids, pa.int64()),
                  "pr_q": pa.array(pr, pa.int64())})
    )


HITS_SCALE = 10**6  # see overflow note in hits() — keeps (r*S) in int64


def _norm_div(raw: np.ndarray, total: int) -> np.ndarray:
    """Exact ``(raw * HITS_SCALE) // total`` without int128: with
    raw = q*total + r, ``raw*S//total == q*S + (r*S)//total`` (algebraic
    identity, exact). r < total, so r*S < total*S — int64-safe under the
    documented ``total * HITS_SCALE < 2**63`` bound."""
    q = raw // total
    r = raw - q * total
    return q * HITS_SCALE + (r * HITS_SCALE) // total


def hits(edges_ds, *, iters: int = 10, n_parts: int = 64,
         mode: str = "auto", broadcast_limit: int = 2_000_000
         ) -> "ray.data.Dataset":  # noqa: F821
    """Fixed-point HITS (Kleinberg 1999 hubs & authorities) -> Dataset
    (node, hub_q, auth_q) in int64 micro-units of L1 mass (HITS_SCALE).

    Update rule (the DuckDB oracle replays it exactly):

        h_q[0]    = HITS_SCALE // N                    (per node)
        a_raw[v]  = sum over in-edges (u, v) of h_q[u] (exact int64)
        a_q[v]    = (a_raw[v] * HITS_SCALE) // sum(a_raw)   (L1 norm)
        h_raw[u]  = sum over out-edges (u, v) of a_q[v]
        h_q[u]    = (h_raw[u] * HITS_SCALE) // sum(h_raw)

    L1 normalization (not the classical L2) keeps every operation exact
    integer arithmetic — same determinism contract as :func:`pagerank`:
    bit-identical across partitionings, CPU counts, and engines. The
    normalizing division is computed by the int64-safe two-step identity
    (:func:`_norm_div`); the SQL oracle uses HUGEINT directly.

    Overflow bound: sum(a_raw) = sum_u outdeg(u) * h_q[u]
    <= outdeg_max * HITS_SCALE, so the identity's r*S term fits int64
    while outdeg_max (and indeg_max for the hub phase) stays below
    ~9.2e6 — far above any real page's link count; asserted at runtime.

    Scale shape: per iteration, each phase is one padded-union hash join
    (state onto edges by the owning endpoint) + one hash-partitioned
    reduce by the other endpoint; the driver sees only the two
    normalizing totals (exact int partial sums). States stay SPARSE
    during iteration (auth rows exist only for nodes with in-edges, hub
    rows only for edge sources — absent = 0 exactly); the full node
    table is zero-filled once at emit. Below ``broadcast_limit`` nodes
    the state vectors live on the driver and edges stream through an
    integer combiner per batch — bit-identical by integer exactness.
    """
    import ray.data as rd

    if iters < 1:
        raise ValueError("hits: iters must be >= 1")
    nodes = _node_table(edges_ds, n_parts).materialize()
    n = int(nodes.count())
    if n == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "hub_q": pa.array([], pa.int64()),
                      "auth_q": pa.array([], pa.int64())})
        )

    if mode == "broadcast" or (mode == "auto" and n <= broadcast_limit):
        return _hits_broadcast(edges_ds, nodes, n=n, iters=iters,
                               n_parts=n_parts)
    return _hits_distributed(edges_ds, nodes, n=n, iters=iters,
                             n_parts=n_parts)


def _hits_phase_checks(total: int) -> None:
    if total * HITS_SCALE >= 2**63:
        raise OverflowError(
            "hits: normalizing total exceeds the int64-safe bound "
            "(outdeg/indeg beyond ~9.2e6); shrink HITS_SCALE"
        )


def _hits_broadcast(edges_ds, nodes, *, n: int, iters: int, n_parts: int):
    import ray
    import ray.data as rd

    node_ids = np.sort(
        np.concatenate(
            [b.column("node").to_numpy()
             for b in nodes.iter_batches(batch_format="pyarrow")]
        ).astype(np.int64)
    )
    h = np.full(node_ids.size, HITS_SCALE // n, dtype=np.int64)
    a = np.zeros(node_ids.size, dtype=np.int64)
    edges_mat = edges_ds.materialize()

    def sweep(vec: np.ndarray, src_col: str, dst_col: str) -> np.ndarray:
        """raw[dst] = sum over edges of vec[src] (exact int combiner)."""
        ref = ray.put((node_ids, vec))

        def partial(batch: pa.Table, ref=ref) -> pa.Table:
            ids, v = ray.get(ref)
            s = batch.column(src_col).to_numpy().astype(np.int64)
            d = batch.column(dst_col).to_numpy().astype(np.int64)
            c = v[np.searchsorted(ids, s)]
            ud, inv = np.unique(d, return_inverse=True)
            sums = np.zeros(ud.size, dtype=np.int64)
            np.add.at(sums, inv, c)
            return pa.table(
                {"node": pa.array(ud, pa.int64()),
                 "psum": pa.array(sums, pa.int64())}
            )

        # driver-side exact int64 merge of per-batch partials — the node
        # vector is already driver-resident on this path, so the
        # per-phase shuffle (2 x iters of them) buys nothing; order-free
        # integer addition keeps it bit-identical
        raw = np.zeros(node_ids.size, dtype=np.int64)
        for b in edges_mat.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            pos = np.searchsorted(node_ids, b.column("node").to_numpy())
            np.add.at(raw, pos, b.column("psum").to_numpy())
        return raw

    for _ in range(iters):
        a_raw = sweep(h, "src", "dst")
        ta = int(a_raw.sum())
        if ta == 0:
            a = np.zeros_like(a)
            h = np.zeros_like(h)
            break
        _hits_phase_checks(ta)
        a = _norm_div(a_raw, ta)
        h_raw = sweep(a, "dst", "src")
        th = int(h_raw.sum())
        _hits_phase_checks(th)
        h = _norm_div(h_raw, th)

    return rd.from_arrow(
        pa.table({"node": pa.array(node_ids, pa.int64()),
                  "hub_q": pa.array(h, pa.int64()),
                  "auth_q": pa.array(a, pa.int64())})
    )


def _hits_distributed(edges_ds, nodes, *, n: int, iters: int,
                      n_parts: int):
    """Sparse-state HITS: two (join + reduce) exchanges per iteration via
    the repo's padded-union relational helpers; driver sees only the two
    totals. States carry only nodes that can be nonzero (see hits())."""
    from webindex.relational import hash_join_attach, hash_partitioned_groupby

    edges_mat = edges_ds.materialize()

    def seed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch.column("node"),
             "v_q": pa.array(
                 np.full(batch.num_rows, HITS_SCALE // n, np.int64),
                 pa.int64())}
        )

    h_state = nodes.map_batches(seed, batch_format="pyarrow").materialize()

    def total_of(state) -> int:
        def part_sum(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {"t": pa.array(
                    [int(pc.sum(batch.column("v_q")).as_py() or 0)],
                    pa.int64())}
            )

        return sum(
            r["t"]
            for r in state.map_batches(
                part_sum, batch_format="pyarrow"
            ).take_all()
        )

    def sweep(state, key: str, other: str):
        """state joins edges on ``key``; contributions reduce by ``other``
        into the next raw state (sum of v_q)."""
        joined = hash_join_attach(
            edges_mat, key, state, ["v_q"],
            rows_types={"src": pa.int64(), "dst": pa.int64()},
            val_types={"v_q": pa.int64()},
            n_parts=n_parts, side_key="node",
        )

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            # the padded-union join leaves int columns as float64 dtype
            # (values exact, <= HITS_SCALE << 2^53) — re-pin to int64 so
            # the next shuffle hashes integer keys, and sums stay int64
            df = df.astype({other: np.int64, "v_q": np.int64})
            return df.groupby(other, sort=False)["v_q"].sum().reset_index()

        def final(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(other, sort=False)["v_q"].sum().reset_index()
            return g.rename(columns={other: "node"})

        return hash_partitioned_groupby(
            joined, [other], partial, final, n_parts=n_parts
        ).materialize()

    def normalize(state, total: int):
        def norm(batch: pa.Table) -> pa.Table:
            raw = batch.column("v_q").to_numpy().astype(np.int64)
            return pa.table(
                {"node": batch.column("node"),
                 "v_q": pa.array(_norm_div(raw, total), pa.int64())}
            )

        return state.map_batches(norm, batch_format="pyarrow").materialize()

    a_state = None
    for _ in range(iters):
        a_raw = sweep(h_state, "src", "dst")
        ta = total_of(a_raw)
        if ta == 0:
            import ray.data as rd

            empty = rd.from_arrow(
                pa.table({"node": pa.array([], pa.int64()),
                          "v_q": pa.array([], pa.int64())})
            )
            a_state, h_state = empty, empty
            break
        _hits_phase_checks(ta)
        a_state = normalize(a_raw, ta)
        h_raw = sweep(a_state, "dst", "src")
        th = total_of(h_raw)
        _hits_phase_checks(th)
        h_state = normalize(h_raw, th)

    # zero-fill emit over the full node table (one padded-union groupby)
    def tag(ds, col):
        def f(batch: pa.Table, col=col) -> pa.Table:
            node = batch.column("node").to_numpy().astype(np.int64)
            zero = pa.array(np.zeros(batch.num_rows, np.int64), pa.int64())
            v = batch.column("v_q") if "v_q" in batch.column_names else zero
            return pa.table(
                {"node": batch.column("node"),
                 "hub_q": v if col == "hub_q" else zero,
                 "auth_q": v if col == "auth_q" else zero,
                 "part": pa.array(_part_of(node, n_parts))}
            )

        return ds.map_batches(f, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        node = g.column("node").to_numpy()
        u, inv = np.unique(node, return_inverse=True)
        hq = np.zeros(u.size, dtype=np.int64)
        aq = np.zeros(u.size, dtype=np.int64)
        np.add.at(hq, inv, g.column("hub_q").to_numpy())
        np.add.at(aq, inv, g.column("auth_q").to_numpy())
        return pa.table(
            {"node": pa.array(u, pa.int64()),
             "hub_q": pa.array(hq, pa.int64()),
             "auth_q": pa.array(aq, pa.int64())}
        )

    return (
        tag(nodes, "none").union(tag(h_state, "hub_q"))
        .union(tag(a_state, "auth_q"))
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
    )


def hits_reference(edges: list[tuple[int, int]], *, iters: int = 10
                   ) -> dict[int, tuple[int, int]]:
    """Single-threaded replay of the exact HITS spec (test oracle):
    node -> (hub_q, auth_q), Python ints (no overflow concerns)."""
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    h = {v: HITS_SCALE // n for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        a_raw = {v: 0 for v in nodes}
        for s, d in edges:
            a_raw[d] += h[s]
        ta = sum(a_raw.values())
        if ta == 0:
            return {v: (0, 0) for v in nodes}
        a = {v: (a_raw[v] * HITS_SCALE) // ta for v in nodes}
        h_raw = {v: 0 for v in nodes}
        for s, d in edges:
            h_raw[s] += a[d]
        th = sum(h_raw.values())
        h = {v: (h_raw[v] * HITS_SCALE) // th for v in nodes}
    return {v: (h[v], a[v]) for v in nodes}


def pagerank_reference(edges: list[tuple[int, int]], *, iters: int = 10,
                       seeds: set[int] | None = None) -> dict[int, int]:
    """Single-threaded replay of the exact fixed-point spec (test oracle);
    ``seeds`` replays the personalized rule (see :func:`pagerank`)."""
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    n_t = len(seeds) if seeds is not None else n
    outdeg: dict[int, int] = {}
    inlinks: dict[int, list[int]] = {v: [] for v in nodes}
    for s, d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
        inlinks[d].append(s)
    base = (3 * SCALE) // (_DAMP_DEN * n_t)
    pr = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        dm = sum(pr[v] for v in nodes if outdeg.get(v, 0) == 0) // n_t
        nxt = {}
        for v in nodes:
            s = sum(pr[u] // outdeg[u] for u in inlinks[v])
            is_seed = seeds is None or v in seeds
            nxt[v] = ((base if is_seed else 0)
                      + (_DAMP_NUM * (s + (dm if is_seed else 0)))
                      // _DAMP_DEN)
        pr = nxt
    return pr
