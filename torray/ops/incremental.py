"""Incremental aggregate-state maintenance (materialized-view
pattern): keep a small grouped-aggregate STATE table current by
folding in only the DELTA since the last run, never rescanning the
100 TB base.

Additive aggregates (count, sum — and anything derived from them:
mean, share, HHI) form a commutative monoid, so yesterday's state
rows are just more partials: ``aggregate_state`` turns a raw slice
into mergeable state, and ``merge_agg_state`` unions any number of
state tables and re-folds.  Correctness certificate: merging state(A)
with state(B) is value-identical to aggregating A ∪ B from scratch —
which is exactly what the SQL oracle recomputes.

Scale shape: the delta is read with predicate pushdown (only new row
groups leave storage); per-block Arrow combiners collapse it to
(group, partials) before the ONE narrow shuffle; the prior state is a
bounded table of group rows that simply unions into that shuffle.
Floats never sum: value columns integer-scale per batch (same exact
``round()`` contract as ``ops.moments``).

The reference recomputes SpiderStats from scratch each call
(SpiderStats.py:46-170); this belongs to the training-data-pipeline
layer (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["aggregate_state", "merge_agg_state"]


def _scaled_int(col, scale: int) -> pa.Array:
    v = col.to_numpy(zero_copy_only=False).astype(np.float64)
    prod = v * scale
    return pa.array(
        np.copysign(np.floor(np.abs(prod) + 0.5), prod).astype(
            np.int64), pa.int64())


def aggregate_state(ds, *, group_cols, value_col: str | None = None,
                    scale: int = 100):
    """Collapse a raw slice into mergeable state rows
    ``(*group_cols, n, sum_scaled)`` — exact int64 partials
    (``sum_scaled`` is 0 when ``value_col`` is None)."""
    from ray.data.aggregate import Sum

    gcols = list(group_cols)

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or gcols[0] not in t.column_names:
            out = {c: pa.array([], pa.string()) for c in gcols}
            out["n"] = pa.array([], pa.int64())
            out["sum_scaled"] = pa.array([], pa.int64())
            return pa.table(out)
        cols = {c: t.column(c) for c in gcols}
        if value_col is not None:
            cols["__v"] = _scaled_int(t.column(value_col), scale)
            g = pa.table(cols).group_by(gcols).aggregate(
                [("__v", "sum"), ([], "count_all")])
            sums = g.column("__v_sum").cast(pa.int64())
        else:
            g = pa.table(cols).group_by(gcols).aggregate(
                [([], "count_all")])
            sums = pa.nulls(g.num_rows, pa.int64()).fill_null(0)
        out = {c: g.column(c) for c in gcols}
        out["n"] = g.column("count_all").cast(pa.int64())
        out["sum_scaled"] = sums
        return pa.table(out)

    folded = (ds.map_batches(combine, batch_format="pyarrow")
              .groupby(gcols).aggregate(Sum("n"), Sum("sum_scaled")))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            out = {c: pa.array([], pa.string()) for c in gcols}
            out["n"] = pa.array([], pa.int64())
            out["sum_scaled"] = pa.array([], pa.int64())
            return pa.table(out)
        out = {c: t.column(c) for c in gcols}
        out["n"] = t.column("sum(n)").cast(pa.int64())
        out["sum_scaled"] = t.column("sum(sum_scaled)").cast(pa.int64())
        return pa.table(out)

    return folded.map_batches(finish, batch_format="pyarrow")


def merge_agg_state(states, *, group_cols):
    """Union any number of state Datasets (``aggregate_state``
    output schema) and re-fold — the incremental-update step.  State
    rows are already partials, so the merge is ONE narrow shuffle of
    group rows only."""
    from ray.data.aggregate import Sum

    gcols = list(group_cols)
    it = iter(states)
    union = next(it)
    for s in it:
        union = union.union(s)
    folded = union.groupby(gcols).aggregate(Sum("n"),
                                            Sum("sum_scaled"))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            out = {c: pa.array([], pa.string()) for c in gcols}
            out["n"] = pa.array([], pa.int64())
            out["sum_scaled"] = pa.array([], pa.int64())
            return pa.table(out)
        out = {c: t.column(c) for c in gcols}
        out["n"] = t.column("sum(n)").cast(pa.int64())
        out["sum_scaled"] = t.column("sum(sum_scaled)").cast(pa.int64())
        return pa.table(out)

    return folded.map_batches(finish, batch_format="pyarrow")
