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
        prop = edges.join(labels, "inner", num_partitions=num_partitions,
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
        jumped = labels.join(as_target, "inner",
                             num_partitions=num_partitions,
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
             dst: str = "dst", scaled_int: bool = True):
    """Power-iteration PageRank over a directed (src, dst) edge list.

    Returns ``(node, rank_e9)`` (rank scaled by 1e9, rounded to int64 —
    hash-stable across engines) or ``(node, rank)`` float64 when
    ``scaled_int=False``.  Exact dangling handling: rank mass sitting
    on nodes with no out-edges is redistributed uniformly each
    iteration, so ranks always sum to 1.

    Per iteration: one int64 join (edges x ranks on src) whose
    contribution rows are pre-combined per batch before the
    groupby-sum (the combiner bounds the shuffle by the number of
    DISTINCT dst per block, not by edge count), plus two scalar
    aggregates on the driver.  Rank state is materialized per round.
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

    deg = edges.groupby("src").aggregate(Count())
    deg = _rename(deg, {"count()": "deg"}).materialize()

    # ranks: (node, rank) joined with out-degree once so the per-iter
    # join ships rank/deg in one row.
    ranks = nodes.map_batches(
        lambda t: t.append_column(
            "rank", pa.array(np.full(t.num_rows, 1.0 / n), pa.float64())),
        batch_format="pyarrow").materialize()

    def combine_contrib(t: pa.Table) -> pa.Table:
        d = t.column("dst").to_numpy(zero_copy_only=False)
        c = (t.column("rank").to_numpy(zero_copy_only=False)
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
        with_deg = ranks.join(deg, "left_outer",
                              num_partitions=num_partitions,
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
        contrib = edges.join(
            non_dangling, "inner",
            num_partitions=num_partitions, on=("src",), right_on=("node",))
        in_sum = (contrib.map_batches(combine_contrib,
                                      batch_format="pyarrow")
                  .groupby("node").aggregate(Sum("contrib")))
        in_sum = _rename(in_sum, {"sum(contrib)": "contrib"})
        base = (1.0 - damping) / n + damping * dangling / n
        joined = nodes.join(in_sum, "left_outer",
                            num_partitions=num_partitions, on=("node",))
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
