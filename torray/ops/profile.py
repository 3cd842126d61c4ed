"""Distributed one-pass table profiling.

Data-engineering staple the reference lacks but any 100 TB corpus
intake needs first: per-column row/null counts, EXACT distinct
cardinality, and min/max — computed as per-block Arrow partials (one
partial row per column per block; the stats shuffle is columns x
blocks rows, never data rows) plus one narrow (col, value) distinct
shuffle for the exact cardinality.  The final fold is bounded at one
row per profiled column.

Exactness contract: counts are exact int64; min/max for numeric and
timestamp columns are the EXACT values cast once to float64 (no
arithmetic — bit-identical to SQL ``CAST(min(x) AS DOUBLE)``; epoch
microseconds stay below 2^53 so the cast is lossless), string min/max
stay strings.  Distinct counting shuffles Arrow's shortest-round-trip
string rendering of each value — injective on doubles, so no
collision undercount is possible (unlike a hash sketch); ``-0.0`` is
normalized to ``0.0`` first to mirror SQL equality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["profile_table"]


_OUT_SCHEMA = pa.schema([
    ("col", pa.string()), ("n", pa.int64()), ("n_null", pa.int64()),
    ("n_distinct", pa.int64()),
    ("min_num", pa.float64()), ("max_num", pa.float64()),
    ("min_str", pa.string()), ("max_str", pa.string())])


def _as_comparable(arr: pa.ChunkedArray | pa.Array):
    """(numeric_view_or_None, is_numeric): timestamps become epoch
    micros int64; ints/floats pass through; strings return None."""
    t = arr.type
    if pa.types.is_timestamp(t):
        return pc.cast(arr, pa.int64()), True
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return arr, True
    return None, False


def _distinct_strings(arr, numeric) -> pa.Array:
    """Per-block distinct non-null values as injective strings."""
    vals = pc.drop_null(arr).unique() if isinstance(arr, pa.Array) \
        else pc.drop_null(arr).combine_chunks().unique()
    if numeric is not None and pa.types.is_floating(arr.type):
        # normalize -0.0 == 0.0 (SQL equality) before rendering
        vals = pc.add(vals, 0.0)
        vals = vals.unique()
    if not pa.types.is_string(vals.type):
        vals = pc.cast(vals, pa.string())
    return vals


def profile_table(ds, columns: list[str] | None = None) -> pa.Table:
    """Profile ``columns`` (default: all) of ``ds``.

    Returns a bounded pyarrow Table, one row per column:
    ``(col, n, n_null, n_distinct, min_num, max_num, min_str,
    max_str)`` — numeric/timestamp columns fill the ``_num`` pair
    (exact float64 casts), string columns the ``_str`` pair; the other
    pair is NULL.  ``n_distinct`` excludes NULLs (SQL
    ``count(DISTINCT col)`` semantics).
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    if columns is None:
        columns = list(ds.schema().names)
    ds = ds.select_columns(list(columns))

    stats_schema = pa.schema([
        ("col", pa.string()), ("n", pa.int64()), ("n_null", pa.int64()),
        ("min_num", pa.float64()), ("max_num", pa.float64()),
        ("min_str", pa.string()), ("max_str", pa.string())])

    def stats_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return stats_schema.empty_table()
        rows = {f.name: [] for f in stats_schema}
        for name in columns:
            arr = batch.column(name)
            rows["col"].append(name)
            rows["n"].append(batch.num_rows)
            rows["n_null"].append(arr.null_count)
            num, is_num = _as_comparable(arr)
            if is_num:
                mm = pc.min_max(num)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                rows["min_num"].append(
                    None if mn is None else float(mn))
                rows["max_num"].append(
                    None if mx is None else float(mx))
                rows["min_str"].append(None)
                rows["max_str"].append(None)
            else:
                mm = pc.min_max(arr)
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["min_str"].append(mm["min"].as_py())
                rows["max_str"].append(mm["max"].as_py())
        return pa.table(rows).cast(stats_schema)

    stats = (ds.map_batches(stats_partial, batch_format="pyarrow")
             .groupby("col").aggregate(
                 Sum("n"), Sum("n_null"),
                 Min("min_num"), Max("max_num"),
                 Min("min_str"), Max("max_str")))

    dv_schema = pa.schema([("col", pa.string()), ("v", pa.string())])

    def distinct_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return dv_schema.empty_table()
        parts = []
        for name in columns:
            arr = batch.column(name)
            num, _ = _as_comparable(arr)
            vals = _distinct_strings(
                num if num is not None else arr, num)
            if len(vals):
                parts.append(pa.table({
                    "col": pa.array([name] * len(vals)), "v": vals}))
        if not parts:
            return dv_schema.empty_table()
        return pa.concat_tables(parts).cast(dv_schema)

    cnt_schema = pa.schema([("col", pa.string()),
                            ("__n", pa.int64())])

    def count_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return cnt_schema.empty_table()
        g = pa.TableGroupBy(batch.select(["col"]), "col").aggregate(
            [([], "count_all")])
        return pa.table({
            "col": g.column("col"),
            "__n": g.column("count_all").cast(pa.int64())}).cast(
                cnt_schema)

    distinct = (ds.map_batches(distinct_partial,
                               batch_format="pyarrow")
                .groupby(["col", "v"])
                .aggregate(ray.data.aggregate.Count())
                .map_batches(count_partial, batch_format="pyarrow")
                .groupby("col").aggregate(Sum("__n")))

    # bounded folds: one row per profiled column on each side
    st = {r["col"]: r for r in stats.take_all()}
    dc = {r["col"]: int(r["sum(__n)"]) for r in distinct.take_all()}
    rows = {f.name: [] for f in _OUT_SCHEMA}
    for name in columns:
        r = st.get(name)
        rows["col"].append(name)
        rows["n"].append(0 if r is None else int(r["sum(n)"]))
        rows["n_null"].append(
            0 if r is None else int(r["sum(n_null)"]))
        rows["n_distinct"].append(dc.get(name, 0))
        for out, key in (("min_num", "min(min_num)"),
                         ("max_num", "max(max_num)"),
                         ("min_str", "min(min_str)"),
                         ("max_str", "max(max_str)")):
            v = None if r is None else r.get(key)
            rows[out].append(v)
    return pa.table(rows).cast(_OUT_SCHEMA)
