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

__all__ = ["profile_table", "profile_correlations"]


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
        _sch = ds.schema()
        columns = list(_sch.names) if _sch is not None else []
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


def profile_correlations(ds, cols: list[str], *,
                         scales: "list[int] | int" = 1,
                         num_partitions: int = 4):
    """One-pass pairwise Pearson correlation matrix over numeric
    columns — the multi-column profiling companion to
    :func:`profile_table`.  Returns one row per unordered pair
    ``(col_a, col_b, n, corr)`` (a < b by column order).

    Exactness contract (the :func:`torray.ops.moments.group_cov`
    recipe, widened to all pairs in ONE streaming pass): column i
    rounds to ``scales[i]``-scaled int64s per block (per-column scales
    — corr is invariant to linear scaling, so each column picks the
    finest scale its magnitude allows without overflowing), every per-pair partial
    (n, sx, sy, sxy, sxx, syy) accumulates exactly in int64, the tiny
    pairs x blocks partial table folds in one bounded aggregate, and

        corr = (n*sxy - sx*sy) / sqrt((n*sxx - sx^2) * (n*syy - sy^2))

    runs in float64 with ONE cast per exact integer sum (the cross
    products overflow int64 at ~1e7 rows), term-for-term mirrored in
    SQL — identical in any engine computing the same integer sums
    (and equal to both population and sample r; the n / n-1 factors
    cancel).
    Overflow bound per pair: ``n * max(|x|*sx) * max(|y|*sy) < 2^63``
    — pick each scale accordingly (dollars, not cents, for 10^5-dollar
    prices at 10^9 rows); the calling query records the choices.
    Rows with a NULL/NaN in ANY profiled column are dropped (SQL
    corr() pairwise-complete differs — this op is listwise, mirrored
    by a WHERE clause in the oracle)."""
    import ray
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    from torray.ops.moments import _cents

    pairs = [(i, j) for i in range(len(cols))
             for j in range(i + 1, len(cols))]
    col_scales = ([int(scales)] * len(cols)
                  if isinstance(scales, (int, float)) else
                  [int(x) for x in scales])
    if len(col_scales) != len(cols):
        raise ValueError("scales must match cols")

    def partial(t: pa.Table) -> pa.Table:
        mats = []
        ok = np.ones(t.num_rows, bool)
        for c in cols:
            v = t.column(c).to_numpy(zero_copy_only=False).astype(
                np.float64)
            ok &= ~np.isnan(v)
            mats.append(v)
        scaled = []
        for v, sc in zip(mats, col_scales):
            prod = v[ok] * sc
            scaled.append(np.copysign(np.floor(np.abs(prod) + 0.5),
                                      prod).astype(np.int64))
        rows = {"pair": [], "n": [], "sx": [], "sy": [], "sxy": [],
                "sxx": [], "syy": []}
        n = int(ok.sum())
        for pidx, (i, j) in enumerate(pairs):
            x, y = scaled[i], scaled[j]
            rows["pair"].append(pidx)
            rows["n"].append(n)
            rows["sx"].append(int(x.sum()))
            rows["sy"].append(int(y.sum()))
            rows["sxy"].append(int((x * y).sum()))
            rows["sxx"].append(int((x * x).sum()))
            rows["syy"].append(int((y * y).sum()))
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in rows.items()})

    agg = (ds.select_columns(cols)
           .map_batches(partial, batch_format="pyarrow")
           .groupby("pair").aggregate(
               Sum("n"), Sum("sx"), Sum("sy"), Sum("sxy"),
               Sum("sxx"), Sum("syy")))

    def finish(t: pa.Table) -> pa.Table:
        p = t.column("pair").to_numpy(zero_copy_only=False)
        n = t.column("sum(n)").to_numpy(zero_copy_only=False)
        sx = t.column("sum(sx)").to_numpy(zero_copy_only=False)
        sy = t.column("sum(sy)").to_numpy(zero_copy_only=False)
        sxy = t.column("sum(sxy)").to_numpy(zero_copy_only=False)
        sxx = t.column("sum(sxx)").to_numpy(zero_copy_only=False)
        syy = t.column("sum(syy)").to_numpy(zero_copy_only=False)
        # products of the exact sums overflow int64 (n*sumsq ~ 1e20 at
        # 1e7 rows) — the FINAL expression runs in float64 with one
        # cast per exact integer sum, term-for-term mirrored in SQL
        fn, fsx, fsy = (n.astype(np.float64), sx.astype(np.float64),
                        sy.astype(np.float64))
        fsxy, fsxx, fsyy = (sxy.astype(np.float64),
                            sxx.astype(np.float64),
                            syy.astype(np.float64))
        num = fn * fsxy - fsx * fsy
        den = np.sqrt((fn * fsxx - fsx * fsx)
                      * (fn * fsyy - fsy * fsy))
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = num / den
        valid = den > 0
        return pa.table({
            "col_a": pa.array([cols[pairs[int(x)][0]] for x in p],
                              pa.string()),
            "col_b": pa.array([cols[pairs[int(x)][1]] for x in p],
                              pa.string()),
            "n": pa.array(n, pa.int64()),
            "corr": pa.array(np.where(valid, corr, np.nan),
                             pa.float64(), mask=~valid)})

    return agg.map_batches(finish, batch_format="pyarrow")
