"""Order-sensitive grouped aggregates Ray Data lacks natively: the
argmax/argmin ROW per group (SQL ``row_number() OVER (PARTITION BY g
ORDER BY ...) = 1``) and ordered ``string_agg`` (deterministic
adjacency/list building).

Scale shape (the package's combiner discipline): each block first
reduces to its per-group LOCAL winners / distinct pairs with one
vectorized lexsort run-scan (an Arrow-native combiner — losing rows
never leave their block), then ONE ``groupby`` on a hashed coarse
partition id repeats the same run-scan over the block winners.  The
shuffle carries at most ``groups x blocks`` narrow rows; no Python
call per group on the hot path (``group_string_agg``'s final
per-run ``str.join`` is the one documented exception — it runs once
per group inside an already-materialized partition, not as a Ray
``map_groups`` task per key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["group_argmax", "group_string_agg", "group_mode"]


def _best_rows(t: pa.Table, group_col: str, order_cols: list[str],
               mode: str) -> pa.Table:
    """One lexsort + run-scan: the row with the lexicographically
    greatest (``mode='max'``) / least (``'min'``) ``order_cols`` tuple
    per group.  Ties beyond the listed columns cannot survive —
    callers must make the tuple unique (include an id column)."""
    if t.num_rows == 0:
        return t
    g = t.column(group_col).to_numpy(zero_copy_only=False)
    keys = tuple(t.column(c).to_numpy(zero_copy_only=False)
                 for c in reversed(order_cols)) + (g,)
    order = np.lexsort(keys)
    gs = g[order]
    starts = np.flatnonzero(np.concatenate(([True], gs[1:] != gs[:-1])))
    if mode == "max":
        pick = np.append(starts[1:], len(gs)) - 1
    else:
        pick = starts
    return t.take(pa.array(np.sort(order[pick]), pa.int64()))


def group_argmax(ds, *, group_col: str, order_cols: list[str],
                 keep_cols: list[str] | None = None, mode: str = "max",
                 num_partitions: int = 64):
    """For each group, the single row with the extreme ``order_cols``
    tuple — SQL ``SELECT ... QUALIFY row_number() OVER (PARTITION BY
    group ORDER BY o1 DESC, o2 DESC, ...) = 1`` (``mode='max'``; ASC
    for ``'min'``).  Returns ``(group_col, *order_cols,
    *keep_cols)``.

    ``order_cols`` must be a deterministic total order within each
    group (append an id column to break value ties), or the winner is
    partition-dependent.
    """
    from torray.ops.window import _hash_col_np

    if mode not in ("max", "min"):
        raise ValueError(f"unknown mode {mode!r}")
    cols = [group_col] + [c for c in order_cols if c != group_col]
    for c in keep_cols or []:
        if c not in cols:
            cols.append(c)

    def partial(t: pa.Table) -> pa.Table:
        t = _best_rows(t.select(cols), group_col, order_cols, mode)
        if t.num_rows == 0:
            return t.append_column("__part", pa.array([], pa.int64()))
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        part = (_hash_col_np(g)
                % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    def scan_partition(group: pa.Table) -> pa.Table:
        return _best_rows(group, group_col, order_cols,
                          mode).drop_columns(["__part"])

    return (ds.select_columns(cols)
            .map_batches(partial, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def group_mode(ds, *, group_col: str, value_col: str,
               out_count: str = "n", num_partitions: int = 64):
    """The MODE per group — the most frequent ``value_col`` per
    ``group_col``, ties broken by ascending value (SQL
    ``row_number() OVER (PARTITION BY g ORDER BY count(*) DESC, v)
    = 1`` over the grouped counts).  Returns
    ``(group_col, value_col, out_count)``.

    Scale shape: each block collapses to DISTINCT (group, value,
    count) partials via Arrow C++ ``group_by`` (repeats never leave
    their block), ONE ``groupby([group, value])`` sum folds partials,
    then :func:`group_argmax` picks each group's winner with its
    combiner + hashed-partition run-scan — no Python call per group
    anywhere.  The shuffles carry distinct (group, value) pairs, which
    is the information-theoretic floor for an exact mode."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = (t.select([group_col, value_col])
             .group_by([group_col, value_col])
             .aggregate([([], "count_all")]))
        return pa.table({group_col: g.column(group_col),
                         value_col: g.column(value_col),
                         "__n": g.column("count_all").cast(pa.int64())})

    counts = (ds.select_columns([group_col, value_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby([group_col, value_col]).aggregate(Sum("__n")))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("sum(__n)").cast(pa.int64())
        neg = pa.array(-n.to_numpy(zero_copy_only=False), pa.int64())
        return pa.table({group_col: t.column(group_col),
                         value_col: t.column(value_col),
                         out_count: n, "__negn": neg})

    picked = group_argmax(
        counts.map_batches(finish, batch_format="pyarrow"),
        group_col=group_col, order_cols=["__negn", value_col],
        keep_cols=[out_count], mode="min",
        num_partitions=num_partitions)
    return picked.map_batches(
        lambda t: t.drop_columns(["__negn"]), batch_format="pyarrow")


def group_string_agg(ds, *, group_col: str, value_col: str,
                     sep: str = ",", out_col: str = "agg",
                     num_partitions: int = 64):
    """SQL ``string_agg(DISTINCT value, sep ORDER BY value)`` per
    group: the sorted distinct values of each group joined by ``sep``
    — deterministic regardless of partitioning.  Returns
    ``(group_col, out_col)``.

    Combiner: per-block DISTINCT (group, value) pairs via Arrow C++
    ``group_by`` (repeats never leave their block); the one shuffle
    carries those narrow pairs.  Inside each coarse partition one
    lexsort orders every group's values, runs collapse duplicate
    values, and a single ``str.join`` per group builds the string
    (bounded Python: one join per group over in-memory slices, not a
    Ray task per key).  A group's distinct-value list must fit in a
    task — string_agg over unbounded-cardinality values is a contract
    violation on any engine."""
    from torray.ops.window import _hash_col_np

    def partial(t: pa.Table) -> pa.Table:
        d = (t.select([group_col, value_col])
             .group_by([group_col, value_col]).aggregate([]))
        if d.num_rows == 0:
            return d.append_column("__part", pa.array([], pa.int64()))
        g = d.column(group_col).to_numpy(zero_copy_only=False)
        part = (_hash_col_np(g)
                % np.uint64(num_partitions)).astype(np.int64)
        return d.append_column("__part", pa.array(part, pa.int64()))

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                group_col: pa.array(
                    [], group.schema.field(group_col).type),
                out_col: pa.array([], pa.string())})
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        v = group.column(value_col).to_numpy(zero_copy_only=False)
        v = v.astype(str) if v.dtype != object else v
        order = np.lexsort((v, g))
        gs, vs = g[order], v[order]
        # drop duplicate (group, value) pairs surviving across blocks
        keep = np.concatenate(
            ([True], (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])))
        gs, vs, order = gs[keep], vs[keep], order[keep]
        starts = np.flatnonzero(np.concatenate(
            ([True], gs[1:] != gs[:-1])))
        bounds = np.append(starts, len(gs))
        joined = [sep.join(vs[bounds[i]:bounds[i + 1]])
                  for i in range(len(starts))]
        return pa.table({
            group_col: group.column(group_col).take(
                pa.array(order[starts], pa.int64())),
            out_col: pa.array(joined, pa.string()),
        })

    return (ds.select_columns([group_col, value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))
