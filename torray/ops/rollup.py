"""GROUP BY ROLLUP / grouping-sets over a Dataset.

Ray Data has groupby but no multi-level aggregation.  The scale-aware
construction: aggregate the FINEST level once (the only pass over raw
data, the only shuffle that moves row-derived partials), then derive
every coarser prefix level by re-aggregating the finest level's
output — which is groups-sized, orders of magnitude smaller than the
input — and the grand total by a driver-side aggregate of the same.
All levels union into one Dataset with SQL ROLLUP's NULL convention
(a level's unused key columns are NULL, the grand-total row is
all-NULL).

Aggregates are SUM + COUNT; sum an integer column (or pre-scale
floats) if bit-exact reproducibility against a SQL engine matters —
re-aggregating float partials is not associativity-safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["grouping_sets", "rollup", "cube", "pivot_counts", "pivot_sum", "group_share", "unpivot", "explode_list", "count_histogram"]


def count_histogram(dim_ds, fact_ds, *, dim_key: str, fact_key: str,
                    count_name: str = "n_rows",
                    hist_name: str = "n_keys",
                    num_partitions: int = 64):
    """TPC-H Q13 shape: the distribution of dimension keys by their
    fact-row count, INCLUDING keys with zero fact rows (the LEFT JOIN
    that makes Q13 interesting) -> ``(count_name, hist_name)``.

    Scale shape: per-block ``np.unique`` count partials over the fact
    key (narrow int64 (key, n) rows enter the only raw-data shuffle),
    ONE groupby(key) sum, then the co-partitioned run-scan attach from
    ``ops.graph`` pairs every dimension key with its count (missing
    keys attach 0 — counts are >= 1 so 0 is a free sentinel).  The
    final histogram re-aggregates counts-sized data.  No broadcast of
    either side; both shuffles carry int64 pairs only."""
    import ray.data
    from ray.data.aggregate import Sum

    from torray.ops.graph import _attach_int_value, _empty_int64_table

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("node", "val"))
        k = t.column(fact_key).to_numpy(zero_copy_only=False)
        uk, c = np.unique(k, return_counts=True)
        return pa.table({"node": pa.array(uk.astype(np.int64)),
                         "val": pa.array(c.astype(np.int64))})

    def rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("node", "val"))
        return pa.table({"node": t.column("node"),
                         "val": t.column("sum(val)")})

    counts = (fact_ds.select_columns([fact_key])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("node").aggregate(Sum("val"))
              .map_batches(rename, batch_format="pyarrow"))
    attached = _attach_int_value(
        dim_ds.select_columns([dim_key]), counts, dim_key, count_name,
        (dim_key,), num_partitions=num_partitions)

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table(("node", "val"))
        k = t.column(count_name).to_numpy(zero_copy_only=False)
        uk, c = np.unique(k, return_counts=True)
        return pa.table({"node": pa.array(uk.astype(np.int64)),
                         "val": pa.array(c.astype(np.int64))})

    def hist_rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_int64_table((count_name, hist_name))
        return pa.table({count_name: t.column("node"),
                         hist_name: t.column("sum(val)")})

    return (attached.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("node").aggregate(Sum("val"))
            .map_batches(hist_rename, batch_format="pyarrow"))


def grouping_sets(ds, keys: list[str], value_col: str,
                  sets: list[tuple[str, ...]], *,
                  sum_name: str = "sum_value", count_name: str = "n"):
    """``GROUP BY GROUPING SETS(...)`` with SUM(value_col) and
    COUNT(*): one finest-level shuffle over the raw data, then every
    requested grouping set re-aggregates the finest PARTIALS (bounded
    by the finest group count, orders of magnitude smaller than the
    input).  A set's unused key columns come back NULL; the empty set
    is the all-NULL grand-total row.  Each ``sets`` entry must be a
    subset of ``keys`` (that is what makes it derivable from the
    finest partials).
    """
    import ray.data
    from ray.data.aggregate import Count, Sum

    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s!r} is not a subset of "
                             f"keys {keys!r}")
    _sch = ds.schema()
    _base = getattr(_sch, "base_schema", None)
    # a derived zero-block dataset has no schema: type the empty
    # result's keys int64 (nothing will ever be read from them)
    key_types = ({f.name: f.type for f in _base if f.name in keys}
                 if isinstance(_base, pa.Schema)
                 else {k: pa.int64() for k in keys})

    def _shape(t: pa.Table, present: list[str]) -> pa.Table:
        n = t.num_rows
        cols = {}
        for k in keys:
            if k in present:
                cols[k] = t.column(k).cast(key_types[k])
            else:
                cols[k] = pa.nulls(n, key_types[k])
        cols[sum_name] = t.column("__sum").cast(pa.int64())
        cols[count_name] = t.column("__n").cast(pa.int64())
        return pa.table(cols)

    finest = (ds.select_columns(keys + [value_col])
              .groupby(keys)
              .aggregate(Sum(value_col), Count())
              .map_batches(
                  lambda t: t.rename_columns(
                      keys + ["__sum", "__n"]),
                  batch_format="pyarrow")
              .materialize())

    levels = []
    for s in sets:
        cols = [k for k in keys if k in s]  # canonical key order
        if len(cols) == len(keys):
            levels.append(finest.map_batches(
                lambda t: _shape(t, keys), batch_format="pyarrow"))
        elif cols:
            levels.append(
                finest.groupby(cols)
                .aggregate(Sum("__sum"), Sum("__n"))
                .map_batches(
                    lambda t, p=tuple(cols): _shape(
                        t.rename_columns(list(p) + ["__sum", "__n"]),
                        list(p)),
                    batch_format="pyarrow"))
        else:
            total = finest.aggregate(Sum("__sum"), Sum("__n"))
            # SQL semantics for the () grouping set over zero rows:
            # exactly one row, SUM NULL, COUNT 0
            gsum, gn = total["sum(__sum)"], total["sum(__n)"]
            levels.append(ray.data.from_arrow(pa.table({
                **{k: pa.nulls(1, key_types[k]) for k in keys},
                sum_name: (pa.array([int(gsum)], pa.int64())
                           if gsum is not None
                           else pa.nulls(1, pa.int64())),
                count_name: pa.array([int(gn) if gn is not None else 0],
                                     pa.int64()),
            })))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def rollup(ds, keys: list[str], value_col: str, *,
           sum_name: str = "sum_value", count_name: str = "n"):
    """``GROUP BY ROLLUP(*keys)``: the prefix grouping sets
    ``keys, keys[:-1], ..., ()`` — see :func:`grouping_sets` for the
    single-raw-shuffle construction and NULL conventions."""
    sets = [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    return grouping_sets(ds, keys, value_col, sets,
                         sum_name=sum_name, count_name=count_name)


def cube(ds, keys: list[str], value_col: str, *,
         sum_name: str = "sum_value", count_name: str = "n"):
    """``GROUP BY CUBE(*keys)``: every subset of ``keys`` — see
    :func:`grouping_sets`.  2^len(keys) levels, all derived from ONE
    raw-data shuffle."""
    from itertools import combinations

    sets = [c for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets(ds, keys, value_col, sets,
                         sum_name=sum_name, count_name=count_name)


def pivot_counts(ds, group_col: str, pivot_col: str,
                 values: list[str], *, prefix: str = "n_"):
    """Pivot a categorical column into per-value count columns
    (``SELECT group, COUNT(*) FILTER (pivot = v) AS n_v ...``), the
    feature-engineering staple Ray Data has no operator for.

    Scale shape: each block folds its rows into ONE partial row per
    group (vectorized ``np.unique`` over group x category codes), so
    the groupby shuffle carries ``groups x blocks`` narrow int64 rows
    — never the input — and a Sum per category finishes.  ``values``
    fixes the output schema; rows whose pivot value is not listed
    count toward no column (they still count toward no total either —
    add a sentinel value to ``values`` if you need an "other" bucket).
    """
    import ray.data
    from ray.data.aggregate import Sum

    vals = list(values)
    idx = {v: i for i, v in enumerate(vals)}
    cols = [f"{prefix}{v}" for v in vals]

    def fold(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        p = t.column(pivot_col).to_pylist()
        code = np.asarray([idx.get(v, -1) for v in p], np.int64)
        keep = code >= 0
        g, code = g[keep], code[keep]
        if len(g) == 0:
            return pa.table({group_col: pa.array(
                [], t.schema.field(group_col).type),
                **{c: pa.array([], pa.int64()) for c in cols}})
        ug, inv = np.unique(g, return_inverse=True)
        counts = np.zeros((len(ug), len(vals)), np.int64)
        np.add.at(counts, (inv, code), 1)
        return pa.table({
            group_col: pa.array(ug, t.schema.field(group_col).type),
            **{c: pa.array(counts[:, i], pa.int64())
               for i, c in enumerate(cols)}})

    agg = (ds.select_columns([group_col, pivot_col])
           .map_batches(fold, batch_format="pyarrow")
           .groupby(group_col)
           .aggregate(*[Sum(c) for c in cols]))

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [c[len("sum("):-1] if c.startswith("sum(") else c
             for c in t.column_names])

    return agg.map_batches(rename, batch_format="pyarrow")


def pivot_sum(ds, group_col: str, pivot_col: str, values: list[str],
              value_col: str, *, prefix: str = "sum_",
              scale: int = 100):
    """Pivot a categorical column into per-value SUM columns
    (``SELECT group, sum(v) FILTER (pivot = x) AS sum_x ...``) — the
    value twin of :func:`pivot_counts`.

    Exactness contract: sums accumulate as scaled int64
    (``round(v * scale)`` half away from zero, matching SQL
    ``round``); each output float is ONE mirrored division
    ``sum_scaled / scale`` — bit-identical to the SQL twin.  Rows with
    NULL ``value_col`` contribute 0 (SQL sum-FILTER yields NULL for an
    empty set; this op emits 0.0 — mirror with ``coalesce`` in SQL).

    Scale shape: identical to :func:`pivot_counts` — one partial row
    per (group, block) via a vectorized 2-D scatter-add, groups x
    blocks narrow int64 rows into ONE groupby, Sum per category.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from torray.ops.moments import _cents

    vals = list(values)
    idx = {v: i for i, v in enumerate(vals)}
    cols = [f"{prefix}{v}" for v in vals]

    def fold(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        p = t.column(pivot_col).to_pylist()
        v = pc.fill_null(_cents(t.column(value_col), scale),
                         0).to_numpy(zero_copy_only=False)
        code = np.asarray([idx.get(x, -1) for x in p], np.int64)
        keep = code >= 0
        g, code, v = g[keep], code[keep], v[keep]
        if len(g) == 0:
            return pa.table({group_col: pa.array(
                [], t.schema.field(group_col).type),
                **{c: pa.array([], pa.int64()) for c in cols}})
        ug, inv = np.unique(g, return_inverse=True)
        sums = np.zeros((len(ug), len(vals)), np.int64)
        np.add.at(sums, (inv, code), v)
        return pa.table({
            group_col: pa.array(ug, t.schema.field(group_col).type),
            **{c: pa.array(sums[:, i], pa.int64())
               for i, c in enumerate(cols)}})

    agg = (ds.select_columns([group_col, pivot_col, value_col])
           .map_batches(fold, batch_format="pyarrow")
           .groupby(group_col)
           .aggregate(*[Sum(c) for c in cols]))

    def finish(t: pa.Table) -> pa.Table:
        out = {group_col: t.column(group_col)}
        for c in cols:
            s = pc.fill_null(t.column(f"sum({c})"), 0).to_numpy(
                zero_copy_only=False).astype(np.float64)
            out[c] = pa.array(s / float(scale), pa.float64())
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def group_share(ds, *, key_col: str = "event_type",
                value_col: str = "value", scale: int = 100):
    """Per-group share of the global total (SQL ``sum(v) / sum(v)
    OVER ()``): exact scaled-int64 group sums plus each group's
    float64 fraction of the grand total.

    Scale shape: per-block Arrow ``group_by`` partials (raw rows never
    leave their block), then ONE single-partition fold over the
    groups x blocks partial rows — the same bounded driver-sized
    reduction as ``rollup``'s grand-total row, valid because the
    partial set is groups-bounded, not data-bounded.  ``share`` is
    one float64 division over the exact int sums, mirrored token for
    token by the SQL oracle (bit-identical).  Output: (key_col,
    sum_cents, share).
    """
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column(value_col), float(scale)),
                     round_mode="half_towards_infinity"),
            pa.int64())
        sub = pa.table({key_col: t.column(key_col), "c": cents})
        agg = sub.group_by([key_col]).aggregate([("c", "sum")])
        return pa.table({key_col: agg.column(key_col),
                         "s": agg.column("c_sum").cast(pa.int64()),
                         "__one": pa.array(
                             np.zeros(agg.num_rows, np.int64))})

    def fold(group: pa.Table) -> pa.Table:
        key_type = group.schema.field(key_col).type
        if group.num_rows == 0:
            return pa.table({key_col: pa.array([], key_type),
                             "sum_cents": pa.array([], pa.int64()),
                             "share": pa.array([], pa.float64())})
        agg = (group.select([key_col, "s"])
               .group_by([key_col]).aggregate([("s", "sum")]))
        sc = agg.column("s_sum").to_numpy(zero_copy_only=False)
        total = np.int64(sc.sum())
        share = sc.astype(np.float64) / np.float64(total)
        return pa.table({key_col: agg.column(key_col),
                         "sum_cents": pa.array(sc, pa.int64()),
                         "share": pa.array(share, pa.float64())})

    return (ds.select_columns([key_col, value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("__one")
            .map_groups(fold, batch_format="pyarrow"))


def unpivot(ds, *, id_cols: list[str], value_cols: list[str],
            name_col: str = "metric", value_col: str = "val"):
    """UNPIVOT / melt: widen-to-long reshape — each input row emits
    one ``(id_cols..., name_col, value_col)`` row per entry of
    ``value_cols`` (the inverse of :func:`pivot_sum`; SQL equivalent
    is the ``UNION ALL`` of one SELECT per measure, or ``UNPIVOT``).

    Scale shape: a stateless ``map_batches`` — zero shuffle, output
    exactly ``len(value_cols)``x the input rows.  Per batch the
    reshape is ``len(value_cols)`` column slices concatenated (Arrow
    table concat, no per-row Python); measures cast to float64, the
    one common NUMERIC type (mirror the oracle with
    ``CAST(... AS DOUBLE)``).  NULL measures are kept (SQL UNION ALL
    keeps them too)."""
    narrow = ds.select_columns(list(id_cols) + list(value_cols))

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for vc in value_cols:
            cols = {c: t.column(c) for c in id_cols}
            cols[name_col] = pa.array([vc] * t.num_rows, pa.string())
            cols[value_col] = pc.cast(t.column(vc), pa.float64())
            parts.append(pa.table(cols))
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts)

    return narrow.map_batches(melt, batch_format="pyarrow")


def explode_list(ds, *, id_col: str, list_col: str,
                 pos_col: str = "pos", value_col: str = "val",
                 value_type: "pa.DataType | None" = None):
    """UNNEST WITH ORDINALITY: explode a list column to one
    ``(id, pos, val)`` row per element (``pos`` 0-based).  The third
    member of the reshape family (:func:`pivot_sum` /
    :func:`unpivot`), and the substrate trick several ops here use
    inline (embedding centroids, bigram explode) exposed as a
    first-class operator.

    Scale shape: stateless ``map_batches``, zero shuffle.  Per batch
    the values come out with ONE ``flatten()`` (zero-copy view of the
    list child array); ids/positions are ``np.repeat`` / offset
    arithmetic.  NULL and empty lists emit no rows (SQL ``unnest``
    semantics)."""
    narrow = ds.select_columns([id_col, list_col])

    def explode(t: pa.Table) -> pa.Table:
        col = t.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        vals = col.flatten()  # valid slots only, concatenated
        if value_type is not None:
            vals = vals.cast(value_type)
        total = int(lens.sum())
        row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        starts = np.concatenate(([0], np.cumsum(lens)))
        pos = np.arange(total, dtype=np.int64) - starts[row_of]
        return pa.table({
            id_col: pc.take(t.column(id_col),
                            pa.array(row_of, pa.int64())),
            pos_col: pa.array(pos, pa.int64()),
            value_col: vals,
        })

    return narrow.map_batches(explode, batch_format="pyarrow")
