"""Distributed graph operators: duplicate-pair clustering and PageRank.

The pair-producing dedup family (``ops.dedup`` / ``ops.similarity``)
stops at verified duplicate PAIRS; real corpus curation needs the
transitive closure — "these 40k pages are all the same boilerplate,
keep one".  :func:`connected_components` turns a pair list into
(node, component) labels with min-label propagation plus pointer
doubling: every iteration shuffles only narrow int64 columns (never
text), the label table is bounded by the number of nodes that appear
in ANY pair (a small fraction of the corpus), and convergence needs
O(log diameter) rounds — duplicate clusters are near-cliques, so 2-3
in practice.

:func:`pagerank` is the crawl-side twin: link analysis over a
(src, dst) edge list for frontier prioritization (rank hosts, crawl
the reputable ones first).  Fixed-iteration power method; each
iteration is one narrow join + one pre-combined groupby-sum, dangling
mass is redistributed exactly.

The reference engine has no graph surface; these belong to the
training-data-pipeline layer (SURVEY.md "beyond the reference").
Scale notes: edges are materialized once and re-joined per iteration;
rank/label state is (int64, int64|float64) rows — at 10^10 edges the
per-iteration shuffle moves ids only, comparable to the minhash band
shuffle, and never the documents.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from torray.ops.join import safe_join


def _empty_int64_table(cols: tuple[str, ...]) -> pa.Table:
    return pa.table({c: pa.array([], pa.int64()) for c in cols})


def _rename(ds, mapping: dict[str, str]):
    def f(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(f, batch_format="pyarrow")


def connected_components(pairs_ds, *, id_a: str = "id_a",
                         id_b: str = "id_b", num_partitions: int = 4,
                         max_iters: int = 64):
    """Label every node of an undirected pair list with the MINIMUM
    node id reachable from it (its connected component).

    Returns a Dataset ``(node, component)`` covering exactly the nodes
    that appear in at least one pair.  Hash-to-min propagation:

        label(x) <- min(label(x), min over edges (x,y) of label(y))

    iterated to fixpoint, ACCELERATED by pointer doubling
    (label(x) <- label(label(x)) after every propagation round), so a
    path component of diameter d converges in O(log d) rounds rather
    than O(d).  Labels only ever decrease, so the global label SUM is
    a monotone convergence witness: one cheap aggregate per round on
    the driver, no old-vs-new join.  Each round is two hash joins
    (edges x labels, labels x labels — int64 keys/payloads only) and
    one pre-combined groupby-min; the label table is materialized per
    round to keep the lineage flat (and the join's input blocks
    clean).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Min

    def symmetrize(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.concat_arrays([
                t.column(id_a).combine_chunks().cast(pa.int64()),
                t.column(id_b).combine_chunks().cast(pa.int64())]),
            "dst": pa.concat_arrays([
                t.column(id_b).combine_chunks().cast(pa.int64()),
                t.column(id_a).combine_chunks().cast(pa.int64())]),
        })

    edges = pairs_ds.map_batches(symmetrize,
                                 batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(_empty_int64_table(("node", "component")))

    # Per-block partial min(label) over sorted runs — combiner before
    # the groupby shuffle.
    def min_per_key(key: str, val: str):
        def f(t: pa.Table) -> pa.Table:
            k = t.column(key).to_numpy(zero_copy_only=False)
            v = t.column(val).to_numpy(zero_copy_only=False)
            order = np.argsort(k, kind="stable")
            k, v = k[order], v[order]
            cut = np.concatenate(([True], k[1:] != k[:-1]))
            return pa.table({
                "node": pa.array(k[cut], pa.int64()),
                "label": pa.array(
                    np.minimum.reduceat(v, np.nonzero(cut)[0]), pa.int64()),
            })

        return f

    def grouped_min(ds):
        out = (ds.map_batches(min_per_key("src", "lab"),
                              batch_format="pyarrow")
               .groupby("node").aggregate(Min("label")))
        return _rename(out, {"min(label)": "label"}).materialize()

    # label(x) = min(x, neighbors(x)) — first propagation fused in.
    labels = grouped_min(edges.map_batches(
        lambda t: pa.table({
            "src": t.column("src"),
            "lab": pa.compute.min_element_wise(t.column("src"),
                                               t.column("dst"))}),
        batch_format="pyarrow"))

    prev_sum = labels.sum("label")
    for _ in range(max_iters):
        # Propagate: every edge (src, dst) offers label(src) to dst,
        # then a grouped min folds offers with the current labels.
        prop = safe_join(edges, labels, "inner", num_partitions,
                         on=("src",), right_on=("node",))
        prop = prop.map_batches(
            lambda t: pa.table({"src": t.column("dst"),
                                "lab": t.column("label")}),
            batch_format="pyarrow")
        own = labels.map_batches(
            lambda t: pa.table({"src": t.column("node"),
                                "lab": t.column("label")}),
            batch_format="pyarrow")
        labels = grouped_min(prop.union(own))
        # Pointer doubling: label(x) <- label(label(x)).  A label is
        # always itself a node id of the pair graph, so the self-join
        # always matches; doubling halves every label-chain, giving
        # O(log diameter) rounds where propagation alone is O(diameter).
        as_target = labels.map_batches(
            lambda t: pa.table({"sn": t.column("node"),
                                "newlab": t.column("label")}),
            batch_format="pyarrow")
        jumped = safe_join(labels, as_target, "inner",
                           num_partitions,
                           on=("label",), right_on=("sn",))
        labels = jumped.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "label": t.column("newlab")}),
            batch_format="pyarrow").materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return _rename(labels, {"label": "component"})


def pagerank(edges_ds, *, damping: float = 0.85, iters: int = 3,
             num_partitions: int = 4, src: str = "src",
             dst: str = "dst", weight: str | None = None,
             scaled_int: bool = True):
    """Power-iteration PageRank over a directed (src, dst) edge list.

    Returns ``(node, rank_e9)`` (rank scaled by 1e9, rounded to int64 —
    hash-stable across engines) or ``(node, rank)`` float64 when
    ``scaled_int=False``.  Exact dangling handling: rank mass sitting
    on nodes with no out-edges is redistributed uniformly each
    iteration, so ranks always sum to 1.

    ``weight`` names an edge-weight column: contributions become
    ``rank * w / out_weight(src)`` (link-count-weighted host ranking);
    unweighted edges use w = 1.0 through the identical code path, so
    the two modes are bit-identical where weights are all 1.

    Per iteration: one int64 join (edges x ranks on src) whose
    contribution rows are pre-combined per batch before the
    groupby-sum (the combiner bounds the shuffle by the number of
    DISTINCT dst per block, not by edge count), plus two scalar
    aggregates on the driver.  Rank state is materialized per round.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    def to_edges(t: pa.Table) -> pa.Table:
        if weight:
            w = t.column(weight).combine_chunks().cast(pa.float64())
            # Guard the out-weight denominator: a zero/negative/null/
            # NaN weight would make deg = Sum(w) <= 0 or NaN for its
            # source, turning rank*w/deg into inf/NaN that
            # nan_to_num would silently zero — breaking the
            # ranks-sum-to-1 invariant this function documents.
            # Weights are a caller contract; fail loudly per batch.
            wn = w.to_numpy(zero_copy_only=False)
            if w.null_count or not np.all(np.isfinite(wn)) \
                    or np.any(wn <= 0.0):
                raise ValueError(
                    "pagerank: edge weights must be finite, non-null "
                    "and > 0 (got a null/NaN/<=0 value in column "
                    f"{weight!r})")
        else:
            w = pa.array(np.ones(t.num_rows, np.float64), pa.float64())
        return pa.table({
            "src": t.column(src).combine_chunks().cast(pa.int64()),
            "dst": t.column(dst).combine_chunks().cast(pa.int64()),
            "w": w})

    edges = edges_ds.map_batches(
        to_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            _empty_int64_table(("node", "rank_e9")) if scaled_int else
            pa.table({"node": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.float64())}))

    nodes = (edges.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t.column("src").combine_chunks(),
            t.column("dst").combine_chunks()])}),
        batch_format="pyarrow")
        .groupby("node").aggregate(Count()))
    nodes = nodes.map_batches(lambda t: t.select(["node"]),
                              batch_format="pyarrow").materialize()
    n = nodes.count()

    deg = edges.groupby("src").aggregate(Sum("w"))
    deg = _rename(deg, {"sum(w)": "deg"}).materialize()

    # ranks: (node, rank) joined with out-degree once so the per-iter
    # join ships rank/deg in one row.
    ranks = nodes.map_batches(
        lambda t: t.append_column(
            "rank", pa.array(np.full(t.num_rows, 1.0 / n), pa.float64())),
        batch_format="pyarrow").materialize()

    def combine_contrib(t: pa.Table) -> pa.Table:
        d = t.column("dst").to_numpy(zero_copy_only=False)
        c = (t.column("rank").to_numpy(zero_copy_only=False)
             * t.column("w").to_numpy(zero_copy_only=False)
             / t.column("deg").to_numpy(zero_copy_only=False))
        order = np.argsort(d, kind="stable")
        d, c = d[order], c[order]
        cut = np.concatenate(([True], d[1:] != d[:-1]))
        return pa.table({
            "node": pa.array(d[cut], pa.int64()),
            "contrib": pa.array(np.add.reduceat(c, np.nonzero(cut)[0]),
                                pa.float64()),
        })

    for _ in range(iters):
        with_deg = safe_join(ranks, deg, "left_outer",
                             num_partitions,
                             on=("node",), right_on=("src",))
        with_deg = with_deg.materialize()
        # Mass on dangling nodes (no out-edges) redistributes uniformly.
        dangling = with_deg.map_batches(
            lambda t: pa.table({"d_rank": pa.compute.if_else(
                pa.compute.is_null(t.column("deg")),
                t.column("rank"), pa.scalar(0.0))}),
            batch_format="pyarrow").sum("d_rank")
        non_dangling = with_deg.map_batches(
            lambda t: t.filter(pa.compute.is_valid(t.column("deg")))
            .select(["node", "rank", "deg"]),
            batch_format="pyarrow")
        contrib = safe_join(
            edges, non_dangling, "inner",
            num_partitions, on=("src",), right_on=("node",))
        in_sum = (contrib.map_batches(combine_contrib,
                                      batch_format="pyarrow")
                  .groupby("node").aggregate(Sum("contrib")))
        in_sum = _rename(in_sum, {"sum(contrib)": "contrib"})
        base = (1.0 - damping) / n + damping * dangling / n
        joined = safe_join(nodes, in_sum, "left_outer",
                           num_partitions, on=("node",))
        ranks = joined.map_batches(
            lambda t, base=base: pa.table({
                "node": t.column("node"),
                "rank": pa.array(
                    base + damping * np.nan_to_num(
                        t.column("contrib").to_numpy(zero_copy_only=False)
                        .astype(np.float64)),
                    pa.float64())}),
            batch_format="pyarrow").materialize()

    if not scaled_int:
        return ranks
    return ranks.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "rank_e9": pa.array(
                np.rint(t.column("rank").to_numpy(zero_copy_only=False)
                        * 1e9).astype(np.int64), pa.int64())}),
        batch_format="pyarrow")


def cooccurrence_edges(ds, *, group_col: str, item_col: str,
                       max_group: int | None = None,
                       num_partitions: int = 64):
    """Distinct undirected co-occurrence edges: item pairs that share
    a group (parts in the same order, terms in the same doc).  Pair
    emission rides :func:`torray.ops.dedup.salted_bucket_pairs` (hash-
    partitioned runs, no Python call per group; ``max_group`` caps
    degenerate groups — pass None for the exact emission); self-pairs
    (an item twice in one group) are dropped and the pair stream is
    deduped by one narrow (id_a, id_b) groupby.  Output: canonical
    ``(u, v)`` int64 rows with ``u < v``.
    """
    import ray
    from torray.ops.dedup import salted_bucket_pairs

    pairs = salted_bucket_pairs(
        ds.select_columns([group_col, item_col]),
        group_col, item_col, max_bucket=max_group,
        num_partitions=num_partitions)

    def clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("u", "v"))
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        # block-local dedupe combiner: repeated pairs never enter the
        # global shuffle (one packed-uint64 np.unique per block)
        packed = np.unique(
            np.minimum(a, b).astype(np.uint64) * np.uint64(1 << 32)
            + (np.maximum(a, b).astype(np.uint64)
               & np.uint64(0xFFFFFFFF))) \
            if (len(a) and a.max() < 1 << 31 and b.max() < 1 << 31) \
            else None
        if packed is not None:
            return pa.table({
                "u": pa.array((packed >> np.uint64(32)).astype(
                    np.int64), pa.int64()),
                "v": pa.array(
                    (packed & np.uint64(0xFFFFFFFF)).astype(np.int64),
                    pa.int64())})
        d = pa.table({"u": pa.array(np.minimum(a, b), pa.int64()),
                      "v": pa.array(np.maximum(a, b), pa.int64())})
        return d.group_by(["u", "v"]).aggregate([])

    def keys_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("u", "v"))
        return t.select(["u", "v"])

    return (pairs.map_batches(clean, batch_format="pyarrow")
            .groupby(["u", "v"]).aggregate(ray.data.aggregate.Count())
            .map_batches(keys_only, batch_format="pyarrow"))


def _attach_int_value(left_ds, values_ds, key: str, out_name: str,
                      left_cols: tuple[str, ...],
                      num_partitions: int = 64):
    """Co-partitioned run-scan attach of ``values_ds`` (``(node, val)``
    int64 rows, node unique) onto every ``left_ds`` row by the int64
    ``key`` column — the int-key twin of
    :func:`torray.ops.text._count_attach`: both sides hash-partition
    on splitmix64(key), one segmented last-index scan per partition
    pairs each left row with its value (missing keys attach 0)."""
    from torray.ops.dedup import _mix64
    from torray.ops.window import _segmented_last_index

    npart = np.uint64(num_partitions)
    mid_cols = tuple(left_cols) + (out_name, "__side", "__part")

    def tag_left(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(mid_cols)
        k = t.column(key).to_numpy(zero_copy_only=False)
        part = (_mix64(k.astype(np.uint64))
                % npart).astype(np.int64)
        cols = {c: t.column(c) for c in left_cols}
        cols[out_name] = pa.nulls(t.num_rows, pa.int64())
        cols["__side"] = pa.array(np.ones(t.num_rows, np.int64),
                                  pa.int64())
        cols["__part"] = pa.array(part, pa.int64())
        return pa.table(cols)

    def tag_values(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(mid_cols)
        k = t.column("node").to_numpy(zero_copy_only=False)
        part = (_mix64(k.astype(np.uint64))
                % npart).astype(np.int64)
        cols = {}
        for c in left_cols:
            cols[c] = (t.column("node") if c == key
                       else pa.nulls(t.num_rows, pa.int64()))
        cols[out_name] = t.column("val").cast(pa.int64())
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int64),
                                  pa.int64())
        cols["__part"] = pa.array(part, pa.int64())
        return pa.table(cols)

    out_cols = tuple(left_cols) + (out_name,)

    def scan(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty_int64_table(out_cols)
        k = group.column(key).to_numpy(zero_copy_only=False)
        side = group.column("__side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, k))
        ks, ss = k[order], side[order]
        run_id = np.cumsum(np.concatenate(
            ([True], ks[1:] != ks[:-1]))) - 1
        last_v = _segmented_last_index(ss == 0, run_id)
        lpos = np.flatnonzero(ss == 1)
        match = last_v[lpos]
        import pyarrow.compute as pc
        vv = pc.fill_null(group.column(out_name), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        attached = np.where(match >= 0,
                            vv[order[np.clip(match, 0, None)]], 0)
        take = pa.array(order[lpos], pa.int64())
        cols = {c: group.column(c).take(take) for c in left_cols}
        cols[out_name] = pa.array(attached, pa.int64())
        return pa.table(cols)

    tagged = (left_ds.map_batches(tag_left, batch_format="pyarrow")
              .union(values_ds.map_batches(tag_values,
                                           batch_format="pyarrow")))
    return (tagged.groupby("__part")
            .map_groups(scan, batch_format="pyarrow"))


def triangle_count(edges_ds, *, num_partitions: int = 64) -> pa.Table:
    """EXACT global triangle count over a canonical undirected edge
    list (``(u, v)`` int64 rows, ``u < v``, distinct — e.g.
    :func:`cooccurrence_edges` output).

    The classic all-to-all-hostile graph kernel, done as three narrow
    int64 shuffles (node-iterator with degree orientation, MPC-style):

    1. degrees — explode endpoints, one pre-combined groupby count;
    2. orient each edge from its lower-(degree, id) endpoint and emit
       wedges: hash(src)-partitioned runs of the oriented adjacency,
       all neighbor pairs per run (the degree orientation bounds
       out-degree by O(sqrt(m)), so total wedges are O(m^1.5) instead
       of sum(deg^2) — the hub-safe bound);
    3. close — tagged union of wedge rows and the canonical edge set,
       hash-partitioned on (u, v), one sorted run-scan counts wedges
       whose (u, v) run also holds an edge row.

    Each triangle is counted exactly once (its unique minimum vertex
    under the (degree, id) total order is the wedge center).  Returns
    a one-row Table ``(n_edges, n_triangles)`` — both exact int64.
    """
    import ray
    from ray.data.aggregate import Sum

    from torray.ops.dedup import _mix64, salted_bucket_pairs

    edges = edges_ds.materialize()  # consumed 3x (degrees/orient/close)
    n_edges = edges.count()

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("node", "__n"))
        nodes = pa.concat_arrays([
            t.column("u").combine_chunks(),
            t.column("v").combine_chunks()])
        g = pa.TableGroupBy(pa.table({"node": nodes}),
                            "node").aggregate([([], "count_all")])
        return pa.table({"node": g.column("node"),
                         "__n": g.column("count_all").cast(pa.int64())})

    degrees = (edges.map_batches(explode, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("__n")))

    def to_val(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("node", "val"))
        return pa.table({"node": t.column("node"),
                         "val": t.column("sum(__n)").cast(pa.int64())})

    deg_ds = degrees.map_batches(to_val, batch_format="pyarrow")
    with_du = _attach_int_value(edges, deg_ds, "u", "deg_u",
                                ("u", "v"), num_partitions)
    with_dv = _attach_int_value(with_du, deg_ds, "v", "deg_v",
                                ("u", "v", "deg_u"), num_partitions)

    def orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("src", "dst"))
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        du = t.column("deg_u").to_numpy(zero_copy_only=False)
        dv = t.column("deg_v").to_numpy(zero_copy_only=False)
        # total order (degree, id); u < v already breaks degree ties
        u_first = du <= dv
        return pa.table({
            "src": pa.array(np.where(u_first, u, v), pa.int64()),
            "dst": pa.array(np.where(u_first, v, u), pa.int64())})

    oriented = with_dv.map_batches(orient, batch_format="pyarrow")
    wedges = salted_bucket_pairs(oriented, "src", "dst",
                                 max_bucket=None,
                                 num_partitions=num_partitions)

    def tag_wedge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("u", "v", "__side", "__part"))
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        u, v = np.minimum(a, b), np.maximum(a, b)
        part = (_mix64(u.astype(np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15)
                       + v.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "__side": pa.array(
                             np.ones(len(u), np.int64), pa.int64()),
                         "__part": pa.array(part, pa.int64())})

    def tag_edge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("u", "v", "__side", "__part"))
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        part = (_mix64(u.astype(np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15)
                       + v.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({"u": t.column("u"), "v": t.column("v"),
                         "__side": pa.array(
                             np.zeros(len(u), np.int64), pa.int64()),
                         "__part": pa.array(part, pa.int64())})

    def close_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty_int64_table(("__n",))
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        s = group.column("__side").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, v, u))
        us, vs, ss = u[order], v[order], s[order]
        new_run = np.concatenate(
            ([True], (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])))
        run_id = np.cumsum(new_run) - 1
        nruns = run_id[-1] + 1
        has_edge = np.zeros(nruns, np.int64)
        np.add.at(has_edge, run_id, (ss == 0).astype(np.int64))
        wedge_n = np.zeros(nruns, np.int64)
        np.add.at(wedge_n, run_id, (ss == 1).astype(np.int64))
        total = int(wedge_n[has_edge > 0].sum())
        return pa.table({"__n": pa.array([total], pa.int64())})

    tagged = (wedges.map_batches(tag_wedge, batch_format="pyarrow")
              .union(edges.map_batches(tag_edge,
                                       batch_format="pyarrow")))
    parts = (tagged.groupby("__part")
             .map_groups(close_partition, batch_format="pyarrow"))
    n_tri = parts.sum("__n") or 0
    return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                     "n_triangles": pa.array([int(n_tri)], pa.int64())})


def bfs_hops(edges_ds, seeds, *, src: str = "src", dst: str = "dst",
             max_hops: int = 4, num_partitions: int = 4):
    """Multi-source BFS hop distance over a directed (src, dst) edge
    list: every node reachable from any seed within ``max_hops`` hops
    gets the MINIMUM hop count (seeds are 0).  Output ``(node, hops)``
    int64 rows — exactly the bounded-depth recursive-CTE semantics
    (``WITH RECURSIVE ... WHERE d < max_hops`` then ``MIN(d)``), so a
    SQL engine can replay it for the correctness gate.

    Frontier-based: each round joins the edges against only the nodes
    DISCOVERED LAST ROUND (never the whole distance table), offers
    ``d+1`` to their out-neighbors, and folds offers into the distance
    table with a per-block partial min + one grouped min — the
    per-round shuffle is (int64 node, int64 d) rows bounded by the
    frontier's out-degree sum.  Rounds stop early when a frontier
    empties.  At 10^10 edges one round costs what one pagerank
    iteration costs; distance/frontier tables are id-only.

    The reference engine's closest analogue is crawl-depth tracking
    (the implicit BFS-by-round of TorSpider.py:562-618's max_depth
    loop); this is the offline twin over an extracted link graph.
    ``seeds`` is a Python int list (broadcast in the task closure) or
    a Dataset with a ``node`` column (folded on the driver — seed sets
    are small by contract).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Min

    if isinstance(seeds, (list, tuple, np.ndarray)):
        seed_t = pa.table({"node": pa.array(
            sorted({int(s) for s in seeds}), pa.int64())})
    else:
        refs = [t for t in ray.get(seeds.to_arrow_refs()) if t.num_rows]
        seed_t = (pa.concat_tables(refs).select(["node"])
                  .group_by(["node"]).aggregate([])
                  if refs else _empty_int64_table(("node",)))
    if seed_t.num_rows == 0:
        return ray.data.from_arrow(_empty_int64_table(("node", "hops")))

    cpus = int(ray.cluster_resources().get("CPU", 0) or num_partitions)
    num_partitions = max(2, min(num_partitions, cpus))

    def edges_narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column(src).combine_chunks().cast(pa.int64()),
            "dst": t.column(dst).combine_chunks().cast(pa.int64())})

    edges = edges_ds.map_batches(edges_narrow,
                                 batch_format="pyarrow").materialize()

    def min_d(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("node", "d"))
        k = t.column("node").to_numpy(zero_copy_only=False)
        v = t.column("d").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        cut = np.concatenate(([True], k[1:] != k[:-1]))
        return pa.table({
            "node": pa.array(k[cut], pa.int64()),
            "d": pa.array(np.minimum.reduceat(v, np.nonzero(cut)[0]),
                          pa.int64())})

    dist = ray.data.from_arrow(seed_t.append_column(
        "d", pa.array(np.zeros(seed_t.num_rows, np.int64),
                      pa.int64()))).materialize()
    frontier = dist
    for r in range(1, max_hops + 1):
        offers = safe_join(edges, frontier, "inner",
                           num_partitions,
                           on=("src",), right_on=("node",))
        offers = offers.map_batches(
            lambda t, _r=r: pa.table({
                "node": t.column("dst").combine_chunks(),
                "d": pa.array(np.full(t.num_rows, _r, np.int64),
                              pa.int64())}),
            batch_format="pyarrow")
        dist = (dist.union(offers)
                .map_batches(min_d, batch_format="pyarrow")
                .groupby("node").aggregate(Min("d")))
        dist = _rename(dist, {"min(d)": "d"}).materialize()
        # The repartition folds away the schemaless 0-row blocks the
        # filter can emit — the hash join rejects them (same
        # workaround as the dedup candidate paths).
        frontier = (dist.map_batches(
            lambda t, _r=r: t.filter(
                pa.compute.equal(t.column("d"), _r)),
            batch_format="pyarrow")
            .repartition(num_partitions).materialize())
        if frontier.count() == 0:
            break
    return _rename(dist, {"d": "hops"})


def _in_sorted(vals: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Vectorized membership test against a SORTED int64 array —
    searchsorted + equality check, O(n log m), no Python rows."""
    if len(sorted_arr) == 0:
        return np.zeros(len(vals), bool)
    idx = np.searchsorted(sorted_arr, vals)
    idx = np.minimum(idx, len(sorted_arr) - 1)
    return sorted_arr[idx] == vals


def kcore(edges_ds, *, k: int, src: str = "src", dst: str = "dst",
          max_iters: int = 64, num_partitions: int = 4):
    """Nodes of the k-core of an undirected graph: the maximal
    subgraph where every node keeps degree >= k — the standard
    "dense part of the link graph" cut (spam farms and boilerplate
    rings survive aggressive coring; the periphery doesn't).

    Iterative peeling: compute degrees (per-block sorted-run count
    combiner -> one grouped sum), drop nodes under ``k``, drop their
    incident edges, repeat until no node falls.  The falling set is
    broadcast-peeled (ray.put once + a sorted-searchsorted isin per
    batch — map-only, no shuffle) while it fits the broadcast cap;
    an adversarially-huge first-round fall set falls back to two
    distributed semi-joins against the survivors.  Convergence is monotone (node set only shrinks)
    and each round's shuffle carries (int64, int64) edge rows of the
    SURVIVING subgraph only.  Returns ``(node,)`` int64 rows.

    Worst case (a long path peeled one node per round) needs O(n)
    rounds; web-ish graphs cascade in a handful.  ``max_iters`` caps
    the loop; the loop breaks early at the fixpoint.  Rows-only op
    (peeling has no closed SQL form) — pytest checks it against a
    sequential numpy peel.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    cpus = int(ray.cluster_resources().get("CPU", 0) or num_partitions)
    num_partitions = max(2, min(num_partitions, cpus))

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t.column(src).combine_chunks().cast(pa.int64())
        b = t.column(dst).combine_chunks().cast(pa.int64())
        keep = pa.compute.not_equal(a, b)  # self-loops never peel
        a, b = a.filter(keep), b.filter(keep)
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    def dedupe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("src", "dst"))
        return t.group_by(["src", "dst"]).aggregate([])

    edges = (edges_ds.map_batches(symmetrize, batch_format="pyarrow")
             .map_batches(dedupe, batch_format="pyarrow")
             .groupby(["src", "dst"]).aggregate(ray.data.aggregate.Count())
             .map_batches(lambda t: t.select(["src", "dst"]),
                          batch_format="pyarrow").materialize())

    def count_per_src(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("node", "deg"))
        s = t.column("src").to_numpy(zero_copy_only=False)
        s = np.sort(s)
        cut = np.concatenate(([True], s[1:] != s[:-1]))
        starts = np.nonzero(cut)[0]
        return pa.table({
            "node": pa.array(s[cut], pa.int64()),
            "deg": pa.array(np.diff(np.append(starts, len(s))),
                            pa.int64())})

    broadcast_limit = 5_000_000
    for _ in range(max_iters):
        deg = (edges.map_batches(count_per_src, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("deg")))
        deg = _rename(deg, {"sum(deg)": "deg"}).materialize()
        bad_ds = deg.map_batches(
            lambda t: t.filter(pa.compute.less(t.column("deg"), k))
            .select(["node"]),
            batch_format="pyarrow").materialize()
        n_bad = bad_ds.count()
        good = (deg.map_batches(
            lambda t: t.filter(
                pa.compute.greater_equal(t.column("deg"), k))
            .select(["node"]),
            batch_format="pyarrow")
            .repartition(num_partitions).materialize())
        if n_bad == 0:
            return good
        if good.count() == 0:
            return ray.data.from_arrow(_empty_int64_table(("node",)))
        if n_bad <= broadcast_limit:
            # The falling set is usually tiny after round 1: broadcast
            # it once and peel with a vectorized isin per batch — two
            # map-only passes instead of two all-to-all hash joins.
            bad_tbl = pa.concat_tables(
                [t for t in ray.get(bad_ds.to_arrow_refs())
                 if t.num_rows])
            bad_ref = ray.put(np.sort(
                bad_tbl.column("node").to_numpy(
                    zero_copy_only=False)))

            def drop_bad(t: pa.Table, _ref=bad_ref) -> pa.Table:
                bad = ray.get(_ref)
                s_ = t.column("src").to_numpy(zero_copy_only=False)
                d_ = t.column("dst").to_numpy(zero_copy_only=False)
                keep = (~_in_sorted(s_, bad)) & (~_in_sorted(d_, bad))
                return t.filter(pa.array(keep))

            edges = edges.map_batches(
                drop_bad, batch_format="pyarrow").materialize()
        else:
            # adversarially-huge fall set (first round of a sparse
            # graph): stay fully distributed with two semi-joins
            # against the survivors
            for key in ("src", "dst"):
                edges = safe_join(edges, good, "inner",
                                  num_partitions,
                                  on=(key,), right_on=("node",))
            edges = edges.map_batches(
                lambda t: t.select(["src", "dst"]),
                batch_format="pyarrow").materialize()
    return good


def node_clustering(edges_ds, *, num_partitions: int = 64):
    """EXACT per-node triangle count and LOCAL CLUSTERING COEFFICIENT
    over a canonical undirected edge list (``(u, v)`` int64 rows,
    ``u < v``, distinct) — "how clique-like is each node's
    neighborhood", the per-node refinement of :func:`triangle_count`.

    Same degree-oriented node-iterator (wedges bounded O(m^1.5), all
    shuffles int64) with two changes: each wedge CARRIES ITS CENTER
    out of the salted pair emission (``salted_bucket_pairs``
    ``emit_key``), and a closed wedge credits all three corners —
    center and both endpoints — so every node's count is exact, not
    just the global total.  Per-partition credits pre-combine with an
    Arrow ``group_by`` before the one narrow (node, count) shuffle.

    Returns ``(node, degree, triangles, wedge_pairs, clustering)``
    for every node of the graph; ``wedge_pairs = C(degree, 2)`` and
    ``clustering = triangles / wedge_pairs`` is the ONE mirrored
    float64 divide of two exact ints (NULL when ``degree < 2``,
    matching SQL division semantics on a NULL-guarded denominator).
    """
    import ray
    from ray.data.aggregate import Sum

    from torray.ops.dedup import _mix64, salted_bucket_pairs

    edges = edges_ds.materialize()  # consumed 3x (degrees/orient/close)

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("node", "__n"))
        nodes = pa.concat_arrays([
            t.column("u").combine_chunks(),
            t.column("v").combine_chunks()])
        g = pa.TableGroupBy(pa.table({"node": nodes}),
                            "node").aggregate([([], "count_all")])
        return pa.table({"node": g.column("node"),
                         "__n": g.column("count_all").cast(pa.int64())})

    degrees = (edges.map_batches(explode, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("__n")))

    def to_val(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("node", "val"))
        return pa.table({"node": t.column("node"),
                         "val": t.column("sum(__n)").cast(pa.int64())})

    deg_ds = degrees.map_batches(to_val, batch_format="pyarrow")
    with_du = _attach_int_value(edges, deg_ds, "u", "deg_u",
                                ("u", "v"), num_partitions)
    with_dv = _attach_int_value(with_du, deg_ds, "v", "deg_v",
                                ("u", "v", "deg_u"), num_partitions)

    def orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("src", "dst"))
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        du = t.column("deg_u").to_numpy(zero_copy_only=False)
        dv = t.column("deg_v").to_numpy(zero_copy_only=False)
        u_first = du <= dv
        return pa.table({
            "src": pa.array(np.where(u_first, u, v), pa.int64()),
            "dst": pa.array(np.where(u_first, v, u), pa.int64())})

    oriented = with_dv.map_batches(orient, batch_format="pyarrow")
    wedges = salted_bucket_pairs(oriented, "src", "dst",
                                 max_bucket=None,
                                 num_partitions=num_partitions,
                                 emit_key=True)

    def tag_wedge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(
                ("u", "v", "__c", "__side", "__part"))
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        u, v = np.minimum(a, b), np.maximum(a, b)
        part = (_mix64(u.astype(np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15)
                       + v.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "__c": t.column("key"),
                         "__side": pa.array(
                             np.ones(len(u), np.int64), pa.int64()),
                         "__part": pa.array(part, pa.int64())})

    def tag_edge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(
                ("u", "v", "__c", "__side", "__part"))
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        part = (_mix64(u.astype(np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15)
                       + v.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({"u": t.column("u"), "v": t.column("v"),
                         "__c": pa.array(
                             np.zeros(len(u), np.int64), pa.int64()),
                         "__side": pa.array(
                             np.zeros(len(u), np.int64), pa.int64()),
                         "__part": pa.array(part, pa.int64())})

    def close_credit(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty_int64_table(("node", "__n"))
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        c = group.column("__c").to_numpy(zero_copy_only=False)
        s = group.column("__side").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, v, u))
        us, vs, cs, ss = u[order], v[order], c[order], s[order]
        new_run = np.concatenate(
            ([True], (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])))
        run_id = np.cumsum(new_run) - 1
        nruns = run_id[-1] + 1
        has_edge = np.zeros(nruns, np.int64)
        np.add.at(has_edge, run_id, (ss == 0).astype(np.int64))
        closed = (ss == 1) & (has_edge[run_id] > 0)
        if not closed.any():
            return _empty_int64_table(("node", "__n"))
        nodes = np.concatenate([cs[closed], us[closed], vs[closed]])
        g = pa.TableGroupBy(
            pa.table({"node": pa.array(nodes, pa.int64())}),
            "node").aggregate([([], "count_all")])
        return pa.table({"node": g.column("node"),
                         "__n": g.column("count_all").cast(pa.int64())})

    tagged = (wedges.map_batches(tag_wedge, batch_format="pyarrow")
              .union(edges.map_batches(tag_edge,
                                       batch_format="pyarrow")))
    tri = (tagged.groupby("__part")
           .map_groups(close_credit, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("__n")))
    tri_vals = tri.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "val": t.column("sum(__n)").cast(
                                pa.int64())})
        if t.num_rows else _empty_int64_table(("node", "val")),
        batch_format="pyarrow")

    deg_rows = degrees.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "degree": t.column("sum(__n)").cast(
                                pa.int64())})
        if t.num_rows else _empty_int64_table(("node", "degree")),
        batch_format="pyarrow")
    with_tri = _attach_int_value(deg_rows, tri_vals, "node",
                                 "triangles", ("node", "degree"),
                                 num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "node": pa.array([], pa.int64()),
                "degree": pa.array([], pa.int64()),
                "triangles": pa.array([], pa.int64()),
                "wedge_pairs": pa.array([], pa.int64()),
                "clustering": pa.array([], pa.float64())})
        deg = t.column("degree").to_numpy(zero_copy_only=False)
        tri_n = t.column("triangles").to_numpy(zero_copy_only=False)
        pairs = deg * (deg - 1) // 2
        with np.errstate(divide="ignore", invalid="ignore"):
            cl = tri_n.astype(np.float64) / pairs.astype(np.float64)
        return pa.table({
            "node": t.column("node"),
            "degree": pa.array(deg, pa.int64()),
            "triangles": pa.array(tri_n, pa.int64()),
            "wedge_pairs": pa.array(pairs, pa.int64()),
            "clustering": pa.array(
                np.where(pairs > 0, cl, np.nan), pa.float64(),
                mask=(pairs == 0))})

    return with_tri.map_batches(finish, batch_format="pyarrow")


def common_neighbors(edges_ds, *, min_common: int = 2,
                     max_degree: int | None = None,
                     num_partitions: int = 64):
    """Link prediction by EXACT common-neighbor counts: for every
    NON-ADJACENT node pair, how many neighbors the two share — the
    classic "people you may know" candidate generator, and the crawl
    twin "hosts co-linked from N shared pages but never from each
    other".

    Each shared neighbor ``c`` of a pair (u, v) is exactly one wedge
    centered at ``c`` in the full undirected adjacency, so: explode
    each canonical edge into both directions, emit all neighbor pairs
    per center (the salted run-scan pair emission, no Python per
    center), count per (u, v) with a per-partition Arrow combiner,
    and subtract adjacency via the tagged-union run-scan (runs that
    contain an edge row are ADJACENT — dropped, they're triangles not
    predictions).

    Wedge volume is sum(deg^2), which a hub dominates uselessly (a
    host linked from everywhere "shares" it with everyone);
    ``max_degree`` EXCLUDES centers above the cap from wedge emission
    — part of the operator's definition (mirror it in any oracle),
    the standard link-prediction hub cut, and the 100 TB contract:
    with it, wedges are bounded by n * max_degree^2.

    Returns ``(id_a, id_b, common)``, ``id_a < id_b``, for non-
    adjacent pairs with ``common >= min_common``.
    """
    import ray
    from ray.data.aggregate import Sum

    from torray.ops.dedup import _mix64, salted_bucket_pairs

    edges = edges_ds.materialize()  # consumed 2x (wedges + adjacency)

    def explode_und(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("center", "nb"))
        u = t.column("u").combine_chunks()
        v = t.column("v").combine_chunks()
        return pa.table({
            "center": pa.concat_arrays([u, v]),
            "nb": pa.concat_arrays([v, u])})

    adj = edges.map_batches(explode_und, batch_format="pyarrow")
    if max_degree is not None:
        def count_deg(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _empty_int64_table(("node", "__n"))
            g = pa.TableGroupBy(
                t.select(["center"]).rename_columns(["node"]),
                "node").aggregate([([], "count_all")])
            return pa.table({
                "node": g.column("node"),
                "__n": g.column("count_all").cast(pa.int64())})

        deg = (adj.map_batches(count_deg, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("__n")))
        deg_vals = deg.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "val": t.column("sum(__n)").cast(
                                    pa.int64())})
            if t.num_rows else _empty_int64_table(("node", "val")),
            batch_format="pyarrow")
        adj = _attach_int_value(adj, deg_vals, "center", "__deg",
                                ("center", "nb"), num_partitions)
        cap = max_degree

        def cut(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _empty_int64_table(("center", "nb"))
            keep = pc.less_equal(t.column("__deg"), cap)
            return t.filter(keep).select(["center", "nb"])

        adj = adj.map_batches(cut, batch_format="pyarrow")

    wedges = salted_bucket_pairs(adj, "center", "nb", max_bucket=None,
                                 num_partitions=num_partitions)

    def tag_wedge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("u", "v", "__n", "__side",
                                       "__part"))
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        u, v = np.minimum(a, b), np.maximum(a, b)
        # per-block combine: one (u, v, count) row per distinct pair
        g = pa.TableGroupBy(pa.table({
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64())}), ["u", "v"]).aggregate(
            [([], "count_all")])
        gu = g.column("u").to_numpy(zero_copy_only=False)
        gv = g.column("v").to_numpy(zero_copy_only=False)
        part = (_mix64(gu.astype(np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15)
                       + gv.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            "u": g.column("u"), "v": g.column("v"),
            "__n": g.column("count_all").cast(pa.int64()),
            "__side": pa.array(np.ones(len(gu), np.int64), pa.int64()),
            "__part": pa.array(part, pa.int64())})

    def tag_edge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("u", "v", "__n", "__side",
                                       "__part"))
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        part = (_mix64(u.astype(np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15)
                       + v.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            "u": t.column("u"), "v": t.column("v"),
            "__n": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            "__side": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            "__part": pa.array(part, pa.int64())})

    thresh = min_common

    def predict(group: pa.Table) -> pa.Table:
        out_cols = ("id_a", "id_b", "common")
        if group.num_rows == 0:
            return _empty_int64_table(out_cols)
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        n = group.column("__n").to_numpy(zero_copy_only=False)
        s = group.column("__side").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, v, u))
        us, vs, ns, ss = u[order], v[order], n[order], s[order]
        new_run = np.concatenate(
            ([True], (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])))
        run_id = np.cumsum(new_run) - 1
        nruns = run_id[-1] + 1
        has_edge = np.zeros(nruns, np.int64)
        np.add.at(has_edge, run_id, (ss == 0).astype(np.int64))
        common = np.zeros(nruns, np.int64)
        np.add.at(common, run_id, ns)
        firsts = np.flatnonzero(new_run)
        keep = (has_edge == 0) & (common >= thresh)
        if not keep.any():
            return _empty_int64_table(out_cols)
        pos = firsts[keep]
        return pa.table({"id_a": pa.array(us[pos], pa.int64()),
                         "id_b": pa.array(vs[pos], pa.int64()),
                         "common": pa.array(common[keep], pa.int64())})

    tagged = (wedges.map_batches(tag_wedge, batch_format="pyarrow")
              .union(edges.map_batches(tag_edge,
                                       batch_format="pyarrow")))
    return (tagged.groupby("__part")
            .map_groups(predict, batch_format="pyarrow"))


def edge_embeddedness(edges_ds, *, num_partitions: int = 64):
    """EXACT per-EDGE embeddedness: for every existing edge (u, v),
    the number of common neighbors (= triangles containing the edge)
    and the Jaccard of the two endpoint neighborhoods — the classic
    tie-strength signal (embedded edges are strong ties; an edge with
    zero common neighbors is a bridge).  The adjacent-pair complement
    of :func:`common_neighbors`.

    Cost is triangle-bounded, not wedge-squared: the same degree-
    oriented wedge close as :func:`node_clustering`, but a closed
    wedge credits its three EDGES ((u,v), (c,u), (c,v)) instead of
    its corners; degrees attach with the co-partitioned int run-scan.

    Returns ``(id_a, id_b, common, union_size, jaccard)`` for every
    edge, ``union_size = deg_u + deg_v - 2 - common`` (neighborhoods
    excluding the endpoints themselves) and ``jaccard`` the ONE
    mirrored float divide (NULL when the union is empty — two
    degree-1 endpoints).
    """
    import ray
    from ray.data.aggregate import Sum

    from torray.ops.dedup import _mix64, salted_bucket_pairs

    edges = edges_ds.materialize()

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("node", "__n"))
        nodes = pa.concat_arrays([
            t.column("u").combine_chunks(),
            t.column("v").combine_chunks()])
        g = pa.TableGroupBy(pa.table({"node": nodes}),
                            "node").aggregate([([], "count_all")])
        return pa.table({"node": g.column("node"),
                         "__n": g.column("count_all").cast(pa.int64())})

    degrees = (edges.map_batches(explode, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("__n")))
    deg_vals = degrees.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "val": t.column("sum(__n)").cast(
                                pa.int64())})
        if t.num_rows else _empty_int64_table(("node", "val")),
        batch_format="pyarrow")
    with_du = _attach_int_value(edges, deg_vals, "u", "deg_u",
                                ("u", "v"), num_partitions)
    with_dv = _attach_int_value(with_du, deg_vals, "v", "deg_v",
                                ("u", "v", "deg_u"), num_partitions)
    with_deg = with_dv.materialize()  # consumed 2x (orient + finish)

    def orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("src", "dst"))
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        du = t.column("deg_u").to_numpy(zero_copy_only=False)
        dv = t.column("deg_v").to_numpy(zero_copy_only=False)
        u_first = du <= dv
        return pa.table({
            "src": pa.array(np.where(u_first, u, v), pa.int64()),
            "dst": pa.array(np.where(u_first, v, u), pa.int64())})

    oriented = with_deg.map_batches(orient, batch_format="pyarrow")
    wedges = salted_bucket_pairs(oriented, "src", "dst",
                                 max_bucket=None,
                                 num_partitions=num_partitions,
                                 emit_key=True)

    def tag_wedge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(
                ("u", "v", "__c", "__side", "__part"))
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        u, v = np.minimum(a, b), np.maximum(a, b)
        part = (_mix64(u.astype(np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15)
                       + v.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "__c": t.column("key"),
                         "__side": pa.array(
                             np.ones(len(u), np.int64), pa.int64()),
                         "__part": pa.array(part, pa.int64())})

    def tag_edge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(
                ("u", "v", "__c", "__side", "__part"))
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        part = (_mix64(u.astype(np.uint64)
                       * np.uint64(0x9E3779B97F4A7C15)
                       + v.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({"u": t.column("u"), "v": t.column("v"),
                         "__c": pa.array(
                             np.zeros(len(u), np.int64), pa.int64()),
                         "__side": pa.array(
                             np.zeros(len(u), np.int64), pa.int64()),
                         "__part": pa.array(part, pa.int64())})

    def close_edge_credit(group: pa.Table) -> pa.Table:
        out_cols = ("eu", "ev", "__n")
        if group.num_rows == 0:
            return _empty_int64_table(out_cols)
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        c = group.column("__c").to_numpy(zero_copy_only=False)
        s = group.column("__side").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, v, u))
        us, vs, cs, ss = u[order], v[order], c[order], s[order]
        new_run = np.concatenate(
            ([True], (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])))
        run_id = np.cumsum(new_run) - 1
        nruns = run_id[-1] + 1
        has_edge = np.zeros(nruns, np.int64)
        np.add.at(has_edge, run_id, (ss == 0).astype(np.int64))
        closed = (ss == 1) & (has_edge[run_id] > 0)
        if not closed.any():
            return _empty_int64_table(out_cols)
        cu, cv, cc = us[closed], vs[closed], cs[closed]
        # the triangle {u, v, c} embeds all three of its edges
        eu = np.concatenate([cu, np.minimum(cc, cu),
                             np.minimum(cc, cv)])
        ev = np.concatenate([cv, np.maximum(cc, cu),
                             np.maximum(cc, cv)])
        g = pa.TableGroupBy(pa.table({
            "eu": pa.array(eu, pa.int64()),
            "ev": pa.array(ev, pa.int64())}), ["eu", "ev"]).aggregate(
            [([], "count_all")])
        return pa.table({"eu": g.column("eu"), "ev": g.column("ev"),
                         "__n": g.column("count_all").cast(pa.int64())})

    tagged = (wedges.map_batches(tag_wedge, batch_format="pyarrow")
              .union(edges.map_batches(tag_edge,
                                       batch_format="pyarrow")))
    per_edge = (tagged.groupby("__part")
                .map_groups(close_edge_credit, batch_format="pyarrow")
                .groupby(["eu", "ev"]).aggregate(Sum("__n")))

    # attach common counts back onto the degree-annotated edges via
    # the packed-edge int key (u << 32 unsafe at 10^10 nodes: mix)
    def pack_vals(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("node", "val"))
        eu = t.column("eu").to_numpy(zero_copy_only=False)
        ev = t.column("ev").to_numpy(zero_copy_only=False)
        key = _mix64(eu.astype(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15)
                     + ev.astype(np.uint64)).astype(np.int64)
        return pa.table({"node": pa.array(key, pa.int64()),
                         "val": t.column("sum(__n)").cast(pa.int64())})

    def pack_left(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(
                ("u", "v", "deg_u", "deg_v", "__ek"))
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        key = _mix64(u.astype(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15)
                     + v.astype(np.uint64)).astype(np.int64)
        return t.append_column("__ek", pa.array(key, pa.int64()))

    cn_vals = per_edge.map_batches(pack_vals, batch_format="pyarrow")
    left = with_deg.map_batches(pack_left, batch_format="pyarrow")
    attached = _attach_int_value(
        left, cn_vals, "__ek", "common",
        ("u", "v", "deg_u", "deg_v", "__ek"), num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "common": pa.array([], pa.int64()),
                "union_size": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64())})
        du = t.column("deg_u").to_numpy(zero_copy_only=False)
        dv = t.column("deg_v").to_numpy(zero_copy_only=False)
        cn = t.column("common").to_numpy(zero_copy_only=False)
        union = du + dv - 2 - cn
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = cn.astype(np.float64) / union.astype(np.float64)
        return pa.table({
            "id_a": t.column("u"), "id_b": t.column("v"),
            "common": pa.array(cn, pa.int64()),
            "union_size": pa.array(union, pa.int64()),
            "jaccard": pa.array(np.where(union > 0, jac, np.nan),
                                pa.float64(), mask=(union == 0))})

    return attached.map_batches(finish, batch_format="pyarrow")


def hits(edges_ds, *, iters: int = 2, num_partitions: int = 4,
         src: str = "src", dst: str = "dst"):
    """HITS hubs-and-authorities over a directed (src, dst) edge
    list — the classic complement to :func:`pagerank` for link
    analysis on a crawl graph (a good HUB points at many good
    authorities; a good AUTHORITY is pointed at by many good hubs).

    Fixed-iteration mutual recursion with L1 normalization (sums to
    1 — keeps every step a plain SUM the SQL oracle can unroll; the
    classical L2 variant only differs by a constant factor per
    iteration, so rankings are identical):

        auth = normalize( sum over in-edges of hub )
        hub  = normalize( sum over out-edges of auth )

    Returns ``(node, hub_e9, auth_e9)`` — both scaled by 1e9 and
    rounded to int64 (hash-stable; magnitudes after L1 normalization
    keep the float drift orders below the rounding grain).  Nodes
    with no in-edges get authority 0, no out-edges hub 0.

    Scale shape mirrors pagerank: edges materialize once; per
    half-iteration one int64 join + a per-batch pre-combined
    groupby-sum whose shuffle is bounded by distinct endpoints per
    block, plus one scalar normalization aggregate.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    edges = edges_ds.map_batches(
        lambda t: pa.table({
            "src": t.column(src).combine_chunks().cast(pa.int64()),
            "dst": t.column(dst).combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "hub_e9": pa.array([], pa.int64()),
            "auth_e9": pa.array([], pa.int64())}))

    nodes = (edges.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t.column("src").combine_chunks(),
            t.column("dst").combine_chunks()])}),
        batch_format="pyarrow")
        .groupby("node").aggregate(Count()))
    nodes = nodes.map_batches(lambda t: t.select(["node"]),
                              batch_format="pyarrow").materialize()
    n = nodes.count()

    def combine_per(key: str):
        def f(t: pa.Table) -> pa.Table:
            k = t.column(key).to_numpy(zero_copy_only=False)
            v = t.column("w").to_numpy(zero_copy_only=False)
            order = np.argsort(k, kind="stable")
            k, v = k[order], v[order]
            cut = np.concatenate(([True], k[1:] != k[:-1]))
            return pa.table({
                "node": pa.array(k[cut], pa.int64()),
                "w": pa.array(np.add.reduceat(v, np.nonzero(cut)[0]),
                              pa.float64())})
        return f

    def half_step(weights, edge_key: str, out_key: str):
        """weights: (node, w) on the edge_key side -> normalized
        (node, w) accumulated on the out_key side."""
        contrib = safe_join(edges, weights, "inner", num_partitions,
                            on=(edge_key,), right_on=("node",))
        contrib = contrib.map_batches(
            lambda t, k=out_key: pa.table({
                k: t.column(k), "w": t.column("w")}),
            batch_format="pyarrow")
        raw = (contrib.map_batches(combine_per(out_key),
                                   batch_format="pyarrow")
               .groupby("node").aggregate(Sum("w")))
        raw = _rename(raw, {"sum(w)": "w"}).materialize()
        total = raw.sum("w")
        joined = safe_join(nodes, raw, "left_outer", num_partitions,
                           on=("node",))
        return joined.map_batches(
            lambda t, s=total: pa.table({
                "node": t.column("node"),
                "w": pa.array(np.nan_to_num(
                    t.column("w").to_numpy(zero_copy_only=False)
                    .astype(np.float64)) / s, pa.float64())}),
            batch_format="pyarrow").materialize()

    hub = nodes.map_batches(
        lambda t: t.append_column(
            "w", pa.array(np.full(t.num_rows, 1.0 / n), pa.float64())),
        batch_format="pyarrow").materialize()
    auth = None
    for _ in range(iters):
        auth = half_step(hub, "src", "dst")
        hub = half_step(auth, "dst", "src")

    both = safe_join(hub, _rename(auth, {"w": "a"}), "inner",
                     num_partitions, on=("node",))
    return both.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "hub_e9": pa.array(np.rint(
                t.column("w").to_numpy(zero_copy_only=False) * 1e9
            ).astype(np.int64), pa.int64()),
            "auth_e9": pa.array(np.rint(
                t.column("a").to_numpy(zero_copy_only=False) * 1e9
            ).astype(np.int64), pa.int64())}),
        batch_format="pyarrow")


def personalized_pagerank(edges_ds, seeds, *, damping: float = 0.85,
                          iters: int = 3, num_partitions: int = 4,
                          src: str = "src", dst: str = "dst"):
    """Personalized PageRank: teleport lands on the SEED SET only
    (uniformly), not on every node — the "related pages /
    similar-host discovery" primitive (rank the graph by proximity
    to a trusted seed list, e.g. curated hosts feeding frontier
    priority).

    ``seeds`` is a bounded iterable of int64 node ids (a
    personalization set is small by construction; it is broadcast
    once via ``ray.put`` and probed with ``np.isin`` per batch —
    never joined).  Update rule per iteration, dangling mass
    returned to the seeds:

        rank = ((1-d) + d*dangling) * v + d * contrib,
        v(node) = 1/|S| if node in S else 0

    Returns ``(node, rank_e9)`` over all nodes of the edge list.
    Identical scale shape to :func:`pagerank`: one narrow int64 join
    + pre-combined groupby-sum per iteration.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    seed_arr = np.unique(np.asarray(list(seeds), np.int64))
    if seed_arr.size == 0:
        raise ValueError("personalized_pagerank needs >=1 seed")
    seeds_ref = ray.put(seed_arr)

    edges = edges_ds.map_batches(
        lambda t: pa.table({
            "src": t.column(src).combine_chunks().cast(pa.int64()),
            "dst": t.column(dst).combine_chunks().cast(pa.int64()),
            "w": pa.array(np.ones(t.num_rows, np.float64),
                          pa.float64())}),
        batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank_e9": pa.array([], pa.int64())}))

    nodes = (edges.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t.column("src").combine_chunks(),
            t.column("dst").combine_chunks()])}),
        batch_format="pyarrow")
        .groupby("node").aggregate(Count()))
    nodes = nodes.map_batches(lambda t: t.select(["node"]),
                              batch_format="pyarrow").materialize()

    deg = edges.groupby("src").aggregate(Sum("w"))
    deg = _rename(deg, {"sum(w)": "deg"}).materialize()
    ns = float(seed_arr.size)

    def v_of(node_col) -> np.ndarray:
        s = ray.get(seeds_ref)
        node = node_col.to_numpy(zero_copy_only=False)
        return np.where(np.isin(node, s), 1.0 / ns, 0.0)

    ranks = nodes.map_batches(
        lambda t: t.append_column(
            "rank", pa.array(v_of(t.column("node")), pa.float64())),
        batch_format="pyarrow").materialize()

    def combine_contrib(t: pa.Table) -> pa.Table:
        d = t.column("dst").to_numpy(zero_copy_only=False)
        c = (t.column("rank").to_numpy(zero_copy_only=False)
             * t.column("w").to_numpy(zero_copy_only=False)
             / t.column("deg").to_numpy(zero_copy_only=False))
        order = np.argsort(d, kind="stable")
        d, c = d[order], c[order]
        cut = np.concatenate(([True], d[1:] != d[:-1]))
        return pa.table({
            "node": pa.array(d[cut], pa.int64()),
            "contrib": pa.array(np.add.reduceat(c, np.nonzero(cut)[0]),
                                pa.float64())})

    for _ in range(iters):
        with_deg = safe_join(ranks, deg, "left_outer",
                             num_partitions,
                             on=("node",), right_on=("src",))
        with_deg = with_deg.materialize()
        dangling = with_deg.map_batches(
            lambda t: pa.table({"d_rank": pc.if_else(
                pc.is_null(t.column("deg")),
                t.column("rank"), pa.scalar(0.0))}),
            batch_format="pyarrow").sum("d_rank")
        non_dangling = with_deg.map_batches(
            lambda t: t.filter(pc.is_valid(t.column("deg")))
            .select(["node", "rank", "deg"]),
            batch_format="pyarrow")
        contrib = safe_join(
            edges, non_dangling, "inner",
            num_partitions, on=("src",), right_on=("node",))
        in_sum = (contrib.map_batches(combine_contrib,
                                      batch_format="pyarrow")
                  .groupby("node").aggregate(Sum("contrib")))
        in_sum = _rename(in_sum, {"sum(contrib)": "contrib"})
        base_coef = (1.0 - damping) + damping * dangling
        joined = safe_join(nodes, in_sum, "left_outer",
                           num_partitions, on=("node",))
        ranks = joined.map_batches(
            lambda t, bc=base_coef: pa.table({
                "node": t.column("node"),
                "rank": pa.array(
                    bc * v_of(t.column("node"))
                    + damping * np.nan_to_num(
                        t.column("contrib")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64)),
                    pa.float64())}),
            batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "rank_e9": pa.array(
                np.rint(t.column("rank").to_numpy(zero_copy_only=False)
                        * 1e9).astype(np.int64), pa.int64())}),
        batch_format="pyarrow")


def label_propagation(edges_ds, *, iters: int = 2,
                      num_partitions: int = 4,
                      src: str = "src", dst: str = "dst"):
    """Synchronous label-propagation community detection (LPA,
    Raghavan et al. 2007) made deterministic: every node starts
    labeled with its own id; each iteration every node adopts the
    most frequent label among its IN-neighbors, ties to the SMALLEST
    label, nodes with no in-edges keep their label.  Pass a
    symmetrized edge list for the undirected semantics.  Fixed
    ``iters`` (synchronous LPA's halting is data-dependent; for
    corpus/community diagnostics a fixed small count is the useful —
    and SQL-oracle-able — contract).  Returns ``(node, community)``.

    Per iteration: one int64 join (edges x labels), then
    ``ops.orderagg.group_mode`` — per-block distinct
    (node, label, count) Arrow combiners, ONE narrow (node, label)
    shuffle, hashed-partition run-scan winner pick, no Python call
    per node — and one left join back onto the label table.  Label
    state is 2 int64 columns; per-iteration cost matches
    :func:`pagerank`, never touching documents.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Count

    from torray.ops.orderagg import group_mode

    edges = edges_ds.map_batches(
        lambda t: pa.table({
            "src": t.column(src).combine_chunks().cast(pa.int64()),
            "dst": t.column(dst).combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            _empty_int64_table(("node", "community")))

    nodes = (edges.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t.column("src").combine_chunks(),
            t.column("dst").combine_chunks()])}),
        batch_format="pyarrow")
        .groupby("node").aggregate(Count()))
    labels = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node").cast(pa.int64()),
                            "lab": t.column("node").cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        contrib = safe_join(edges, labels, "inner", num_partitions,
                            on=("src",), right_on=("node",))
        contrib = contrib.map_batches(
            lambda t: pa.table({"node": t.column("dst"),
                                "lab": t.column("lab")}),
            batch_format="pyarrow")
        win = group_mode(contrib, group_col="node", value_col="lab",
                         num_partitions=max(num_partitions * 16, 64))
        win = win.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "__new": t.column("lab")}),
            batch_format="pyarrow")
        joined = safe_join(labels, win, "left_outer", num_partitions,
                           on=("node",))
        labels = joined.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "lab": pc.coalesce(t.column("__new"),
                                   t.column("lab")).cast(pa.int64())}),
            batch_format="pyarrow").materialize()

    return labels.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "community": t.column("lab")}),
        batch_format="pyarrow")


def resolve_redirects(edges_ds, *, src: str = "src", dst: str = "dst",
                      max_hops: int = 32, num_partitions: int = 4):
    """Resolve redirect CHAINS to their final target: input is one
    outgoing redirect per source URL (``src -> dst``; if a source
    appears twice the lexicographically smallest dst wins, so the op
    is deterministic on dirty data), output is
    ``(src, final, hops, cycle)`` for every source — ``final`` the
    first non-redirecting URL reached, ``hops`` the exact chain
    length, ``cycle=true`` for sources trapped in a loop (their
    ``final``/``hops`` are then the pointer-doubling fixpoint values,
    deterministic but not meaningful).  The crawl-side companion of
    the reference's per-response redirect handling
    (/root/reference/TorSpider.py:182-205 resolves ONE hop per fetch;
    a corpus pipeline resolves the whole map at once).

    Pointer doubling: the jump table M_k(u) = (endpoint, hops after
    <= 2^k jumps) self-joins ceil(log2(max_hops)) times —
    O(log max_hops) narrow (url, url, int64) shuffles total, never a
    per-hop pass, so 10^9-edge redirect maps resolve in ~5 rounds.
    """
    import math

    import ray
    import ray.data

    from torray.ops.orderagg import group_argmax

    empty = pa.table({
        "src": pa.array([], pa.string()),
        "final": pa.array([], pa.string()),
        "hops": pa.array([], pa.int64()),
        "cycle": pa.array([], pa.bool_())})

    edges = edges_ds.map_batches(
        lambda t: pa.table({
            "u": t.column(src).cast(pa.string()),
            "v": t.column(dst).cast(pa.string())}),
        batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(empty)
    # dedup multi-edges deterministically: smallest dst per src
    edges = group_argmax(edges, group_col="u", order_cols=["v"],
                         mode="min", num_partitions=num_partitions)

    m = edges.map_batches(
        lambda t: pa.table({
            "u": t.column("u"), "v": t.column("v"),
            "h": pa.array(np.ones(t.num_rows, np.int64), pa.int64())}),
        batch_format="pyarrow").materialize()

    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(rounds):
        m2 = m.map_batches(
            lambda t: pa.table({
                "u2": t.column("u"), "v2": t.column("v"),
                "h2": t.column("h")}),
            batch_format="pyarrow")
        j = safe_join(m, m2, "left_outer", num_partitions,
                      on=("v",), right_on=("u2",))
        m = j.map_batches(
            lambda t: pa.table({
                "u": t.column("u"),
                "v": pc.coalesce(t.column("v2"), t.column("v")),
                "h": pc.add(
                    t.column("h").cast(pa.int64()),
                    pc.coalesce(t.column("h2"),
                                pa.scalar(0)).cast(pa.int64()))}),
            batch_format="pyarrow").materialize()

    # a source whose endpoint is STILL a redirect source after the
    # doubling rounds sits on a cycle (an acyclic chain longer than
    # 2^rounds >= max_hops is out of contract)
    keys = edges.map_batches(
        lambda t: pa.table({"u2": t.column("u"),
                            "__is_src": pa.array(
                                np.ones(t.num_rows, np.int64),
                                pa.int64())}),
        batch_format="pyarrow")
    j = safe_join(m, keys, "left_outer", num_partitions,
                  on=("v",), right_on=("u2",))
    return j.map_batches(
        lambda t: pa.table({
            "src": t.column("u"),
            "final": t.column("v"),
            "hops": t.column("h").cast(pa.int64()),
            "cycle": pc.is_valid(t.column("__is_src"))}),
        batch_format="pyarrow")


def reciprocal_pairs(edges_ds, *, src: str = "src", dst: str = "dst",
                     num_partitions: int = 4):
    """Classify every undirected node pair of a DIRECTED edge list by
    reciprocity — ``(id_a, id_b, reciprocal)`` with ``id_a < id_b``,
    ``reciprocal=true`` iff BOTH directions exist.  High reciprocal
    density between host groups is the classic link-farm / link-ring
    signal (organic web links are overwhelmingly one-way); self-loops
    are dropped.

    Scale shape: each block reduces to DISTINCT (a, b, dir) int64
    triples via Arrow C++ ``group_by`` (dir = 1 forward, 2 backward
    of the canonical order); ONE narrow groupby folds min/max dir —
    a pair is reciprocal exactly when both 1 and 2 survive."""
    from ray.data.aggregate import Max, Min

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "dir": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        s = t.column(src).to_numpy(zero_copy_only=False).astype(
            np.int64)
        d = t.column(dst).to_numpy(zero_copy_only=False).astype(
            np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        if not len(s):
            return empty
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        direction = np.where(s < d, 1, 2).astype(np.int64)
        tbl = pa.table({"id_a": pa.array(a, pa.int64()),
                        "id_b": pa.array(b, pa.int64()),
                        "dir": pa.array(direction, pa.int64())})
        return tbl.group_by(["id_a", "id_b", "dir"]).aggregate([])

    folded = (edges_ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["id_a", "id_b"])
              .aggregate(Min("dir"), Max("dir")))
    return folded.map_batches(
        lambda t: pa.table({
            "id_a": t.column("id_a"),
            "id_b": t.column("id_b"),
            "reciprocal": pc.and_(
                pc.equal(t.column("min(dir)"), 1),
                pc.equal(t.column("max(dir)"), 2))}),
        batch_format="pyarrow")


def negative_edges(edges_ds, *, k: int = 5, seed: int = 1,
                   src: str = "src", dst: str = "dst",
                   num_partitions: int = 4,
                   broadcast_limit: int = 100_000_000,
                   method: str | None = None):
    """Deterministic NEGATIVE sampling for link-prediction training:
    for every distinct source node, up to ``k`` candidate
    non-neighbors drawn hash-uniformly from the observed node set —
    ``(src, dst)`` rows guaranteed absent from the input edge list
    (and never self-loops).  Candidates are ``_mix64(src, seed, i)``
    draws, so the sample is a pure function of (graph, seed): reruns
    and resumes reproduce it.

    Two scale regimes, auto-selected by the distinct-node count
    (``method`` pins ``"broadcast"`` / ``"partitioned"``):

    - **broadcast** (<= ``broadcast_limit`` nodes, default 10^8): the
      sorted node array broadcasts once via ``ray.put`` (8 bytes a
      node); candidate generation is one numpy pass per batch.
    - **partitioned** (beyond — no driver-side node array): each draw
      routes by hash to one of ``num_partitions^2`` node buckets and
      picks within the bucket by a second hash; draws and node rows
      co-shuffle on the bucket id (ONE narrow int64 exchange) and a
      per-partition run-scan resolves every draw against its bucket's
      sorted node array.  Bucket sizes vary ~sqrt(n/buckets), so
      per-node inclusion probability deviates from uniform by the
      same factor — negligible for training negatives and
      deterministic for a given (graph, seed, num_partitions).

    The exactness vet is the same in both regimes: ONE distributed
    anti-join of (src, dst) int64 rows against the true edges.  After
    collision and neighbor removal a node may carry slightly fewer
    than ``k`` negatives — the standard contract (oversample ``k`` if
    exact counts matter).
    """
    import ray
    import ray.data

    from torray.ops.dedup import _mix64
    from torray.ops.join import safe_join

    edges = edges_ds.map_batches(
        lambda t: pa.table({
            "src": t.column(src).combine_chunks().cast(pa.int64()),
            "dst": t.column(dst).combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(_empty_int64_table(("src", "dst")))

    nodes_tbl = (edges.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t.column("src").combine_chunks(),
            t.column("dst").combine_chunks()])}),
        batch_format="pyarrow")
        .groupby("node").count()
        .map_batches(lambda t: t.select(["node"]),
                     batch_format="pyarrow")).materialize()

    if method is None:
        method = ("broadcast" if nodes_tbl.count() <= broadcast_limit
                  else "partitioned")

    if method == "broadcast":
        nodes_sorted = np.sort(np.unique(
            nodes_tbl.to_pandas()["node"].to_numpy().astype(np.int64)))
        nodes_ref = ray.put(nodes_sorted)

        def gen(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _empty_int64_table(("src", "dst"))
            pool = ray.get(nodes_ref)
            s = t.column("node").to_numpy(
                zero_copy_only=False).astype(np.int64)
            srcs = np.repeat(s, k)
            i = np.tile(np.arange(k, dtype=np.int64), len(s))
            key = (_mix64(srcs.astype(np.uint64))
                   ^ _mix64((i + seed * 0x9E3779B9).astype(np.uint64)))
            cand = pool[(key % np.uint64(len(pool))).astype(np.int64)]
            keep = cand != srcs
            pairs = pa.table({
                "src": pa.array(srcs[keep], pa.int64()),
                "dst": pa.array(cand[keep], pa.int64())})
            # dedup repeated (src, dst) draws within the batch
            return pairs.group_by(["src", "dst"]).aggregate([])

        cands = nodes_tbl.map_batches(gen, batch_format="pyarrow")
        return safe_join(cands, edges, "left_anti", num_partitions,
                         on=("src", "dst"))

    # -- partitioned regime: no driver-side node array ---------------
    n_buckets = max(16, num_partitions * num_partitions)

    def draw_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"b": pa.array([], pa.int64()),
                             "src": pa.array([], pa.int64()),
                             "pick": pa.array([], pa.int64()),
                             "is_node": pa.array([], pa.int8())})
        s = t.column("node").to_numpy(
            zero_copy_only=False).astype(np.int64)
        srcs = np.repeat(s, k)
        i = np.tile(np.arange(k, dtype=np.int64), len(s))
        key = (_mix64(srcs.astype(np.uint64))
               ^ _mix64((i + seed * 0x9E3779B9).astype(np.uint64)))
        b = (key % np.uint64(n_buckets)).astype(np.int64)
        pick = _mix64(key).view(np.int64)
        return pa.table({
            "b": pa.array(b, pa.int64()),
            "src": pa.array(srcs, pa.int64()),
            "pick": pa.array(pick, pa.int64()),
            "is_node": pa.array(np.zeros(len(srcs), np.int8),
                                pa.int8())})

    def node_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"b": pa.array([], pa.int64()),
                             "src": pa.array([], pa.int64()),
                             "pick": pa.array([], pa.int64()),
                             "is_node": pa.array([], pa.int8())})
        v = t.column("node").to_numpy(
            zero_copy_only=False).astype(np.int64)
        b = (_mix64(v.astype(np.uint64))
             % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "b": pa.array(b, pa.int64()),
            "src": pa.array(v, pa.int64()),  # carries the node id
            "pick": pa.array(np.zeros(len(v), np.int64), pa.int64()),
            "is_node": pa.array(np.ones(len(v), np.int8), pa.int8())})

    tagged = (nodes_tbl.map_batches(draw_rows, batch_format="pyarrow")
              .union(nodes_tbl.map_batches(node_rows,
                                           batch_format="pyarrow")))

    def tag_part(t: pa.Table) -> pa.Table:
        b = t.column("b").to_numpy(zero_copy_only=False)
        part = (_mix64(b.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    def resolve(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty_int64_table(("src", "dst"))
        b = group.column("b").to_numpy(zero_copy_only=False)
        sv = group.column("src").to_numpy(zero_copy_only=False)
        pk = group.column("pick").to_numpy(zero_copy_only=False)
        isn = group.column("is_node").to_numpy(
            zero_copy_only=False).astype(bool)
        # one lexsort: within each bucket, node rows first (sorted by
        # id — the bucket's deterministic pool), then draw rows
        order = np.lexsort((sv, ~isn, b))
        b_s, sv_s, pk_s, isn_s = b[order], sv[order], pk[order], isn[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        ends = np.r_[starts[1:], len(b_s)]
        out_src, out_dst = [], []
        for s0, e0 in zip(starts, ends):
            nmask = isn_s[s0:e0]
            pool = sv_s[s0:e0][nmask]  # sorted node ids (lexsort key)
            if pool.size == 0:
                continue
            d_src = sv_s[s0:e0][~nmask]
            d_pick = pk_s[s0:e0][~nmask]
            if d_src.size == 0:
                continue
            cand = pool[(d_pick.view(np.uint64)
                         % np.uint64(pool.size)).astype(np.int64)]
            keep = cand != d_src
            out_src.append(d_src[keep])
            out_dst.append(cand[keep])
        if not out_src:
            return _empty_int64_table(("src", "dst"))
        pairs = pa.table({
            "src": pa.array(np.concatenate(out_src), pa.int64()),
            "dst": pa.array(np.concatenate(out_dst), pa.int64())})
        return pairs.group_by(["src", "dst"]).aggregate([])

    cands = (tagged.map_batches(tag_part, batch_format="pyarrow")
             .groupby("__part")
             .map_groups(resolve, batch_format="pyarrow"))
    # cross-partition duplicate draws collapse in the anti-join's
    # grouped build side?  No — dedup explicitly: a (src, dst) pair
    # can only repeat within one bucket, already deduped above, but
    # the same pair may arise from two different buckets' pools.
    cands = cands.groupby(["src", "dst"]).count().map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
    return safe_join(cands, edges, "left_anti", num_partitions,
                     on=("src", "dst"))
