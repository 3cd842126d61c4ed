"""Exactness-safe statistical moments and histograms over a Ray
Dataset — the distributive aggregates (mean / variance / stddev /
fixed-width histogram) a curation pipeline needs for quality-score
calibration and value-distribution audits.

Float SUMs are not associative, so a naively distributed
``var_pop(value)`` depends on reduction order and can never hash-match
a SQL oracle.  Both operators here avoid that the same way
``events_value_stats`` does (``__ray_entry__._q_events_value_stats``):
values are integer-scaled per batch (``round(v * scale)`` half away
from zero, matching SQL ``round()``), summed EXACTLY in int64 —
associative, order-independent — and every float column in the output
is derived from those exact integers with one fixed expression that
the SQL oracle mirrors token for token, so the driver's value-hash
comparison holds bitwise.

Scale shape: one vectorized ``map_batches`` partial (Arrow hash
aggregate inside the batch — the combiner), then a single ``groupby``
whose shuffle carries one narrow row per (group, block).  Zero
full-row shuffles, no driver folds.

int64 headroom: with ``scale=100`` the squared term holds
``sum(cents^2) <= 9.2e18``, i.e. ~3.8e9 rows at value<=500 per group
— beyond that pass a smaller ``scale`` (the contract is explicit, not
silently lossy: overflow raises in numpy's checked cast below).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["group_moments", "value_histogram", "group_cov",
           "group_linreg", "group_weighted_mean", "group_gini",
           "group_weighted_median", "group_concentration"]


def group_weighted_median(ds, *, group_col: str, value_col: str,
                          weight_col: str, value_scale: int = 100,
                          weight_scale: int = 100,
                          num_partitions: int = 64):
    """EXACT per-group lower weighted median: the smallest scaled
    value ``v`` whose cumulative scaled weight reaches half the
    group's total (``2*cumw >= totw``).  TIE-ORDER INVARIANT: a value
    qualifies iff the cumulative weight through ALL its ties reaches
    half, so the answer does not depend on intra-tie order — which is
    what lets the SQL oracle's ``min(v) FILTER (2*cumw >= totw)``
    over an arbitrary-tie-order running sum match exactly.  Output
    ``(group, n, total_w_scaled, wmedian)`` with ``wmedian`` the ONE
    mirrored ``v / value_scale`` float op.

    Scale shape: hash(group) coarse partitions, ONE shuffle, lexsort
    + segmented cumsum/reduceat per partition — Python once per
    partition, never per group."""
    from torray.ops.window import _hash_col_np

    from torray.ops.window import _ds_field_type

    gtype = _ds_field_type(ds, group_col)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "__sv": pa.array([], pa.int64()),
                             "__sw": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        g = batch.column(group_col).to_numpy(zero_copy_only=False)

        def _scaled(name, scale):
            x = np.asarray(batch.column(name).to_numpy(
                zero_copy_only=False), np.float64) * scale
            return np.copysign(np.floor(np.abs(x) + 0.5),
                               x).astype(np.int64)

        part = (_hash_col_np(g)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            group_col: batch.column(group_col),
            "__sv": pa.array(_scaled(value_col, value_scale)),
            "__sw": pa.array(_scaled(weight_col, weight_scale)),
            "__part": pa.array(part, pa.int64()),
        })

    empty = pa.table({group_col: pa.array([], gtype),
                      "n": pa.array([], pa.int64()),
                      "total_w_scaled": pa.array([], pa.int64()),
                      "wmedian": pa.array([], pa.float64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        sv = group.column("__sv").to_numpy(zero_copy_only=False)
        sw = group.column("__sw").to_numpy(zero_copy_only=False)
        order = np.lexsort((sv, g))
        g, sv, sw = g[order], sv[order], sw[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], g[1:] != g[:-1])))
        lens = np.diff(np.append(starts, len(g))).astype(np.int64)
        run = np.repeat(np.arange(len(starts)), lens)
        cum = np.cumsum(sw)
        offs = np.concatenate(([0], cum[starts[1:] - 1]))
        cumw = cum - offs[run]
        totw = np.add.reduceat(sw, starts)
        qual = 2 * cumw >= totw[run]
        pos = np.where(qual, np.arange(len(g), dtype=np.int64),
                       np.iinfo(np.int64).max)
        med_idx = np.minimum.reduceat(pos, starts)
        return pa.table({
            group_col: pa.array(g[starts]),
            "n": pa.array(lens),
            "total_w_scaled": pa.array(totw.astype(np.int64)),
            "wmedian": pa.array(
                sv[med_idx].astype(np.float64) / value_scale,
                pa.float64()),
        })

    return (ds.select_columns([group_col, value_col, weight_col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def group_gini(ds, *, group_col: str = "event_type",
               value_col: str = "value", scale: int = 100,
               num_partitions: int = 64):
    """EXACT per-group Gini coefficient over the scaled integers
    ``v = round(value * scale)`` (half away from zero = SQL round):

        G = (2*W - (n+1)*S) / (n*S),   W = sum(i * v_(i)),

    with ``v_(i)`` ascending and ``i`` 1-based.  W is TIE-INVARIANT
    (equal values contribute identically under any tie order), so the
    integer core (n, S, W) is deterministic and the final ``gini`` is
    ONE mirrored float expression — bit-identical to the SQL oracle's
    ``row_number()`` formulation.  All-zero-sum groups yield NULL.

    Scale shape: hash(group) -> ``num_partitions`` coarse partitions,
    ONE shuffle, then per partition a lexsort + segmented reduceat —
    Python once per partition, never per group.  int64 headroom:
    W <= n^2 * max|v|, fine through ~10^7-row groups at cents scale;
    past that raise ``scale`` down or sub-aggregate."""
    from torray.ops.window import _hash_col_np

    from torray.ops.window import _ds_field_type

    gtype = _ds_field_type(ds, group_col)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "__sv": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        prod = np.asarray(v, np.float64) * scale
        sv = np.copysign(np.floor(np.abs(prod) + 0.5),
                         prod).astype(np.int64)
        part = (_hash_col_np(g)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            group_col: batch.column(group_col),
            "__sv": pa.array(sv, pa.int64()),
            "__part": pa.array(part, pa.int64()),
        })

    empty = pa.table({group_col: pa.array([], gtype),
                      "n": pa.array([], pa.int64()),
                      "sum_scaled": pa.array([], pa.int64()),
                      "w_scaled": pa.array([], pa.int64()),
                      "gini": pa.array([], pa.float64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        sv = group.column("__sv").to_numpy(zero_copy_only=False)
        order = np.lexsort((sv, g))
        g, sv = g[order], sv[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], g[1:] != g[:-1])))
        lens = np.diff(np.append(starts, len(g))).astype(np.int64)
        run = np.repeat(np.arange(len(starts)), lens)
        i = np.arange(len(g), dtype=np.int64) - starts[run] + 1
        S = np.add.reduceat(sv, starts)
        W = np.add.reduceat(i * sv, starts)
        n = lens
        nf, Sf, Wf = (n.astype(np.float64), S.astype(np.float64),
                      W.astype(np.float64))
        den = nf * Sf
        with np.errstate(divide="ignore", invalid="ignore"):
            gini = (2.0 * Wf - (nf + 1.0) * Sf) / den
        bad = den == 0.0
        return pa.table({
            group_col: pa.array(g[starts]),
            "n": pa.array(n),
            "sum_scaled": pa.array(S.astype(np.int64)),
            "w_scaled": pa.array(W.astype(np.int64)),
            "gini": pa.array(np.where(bad, np.nan, gini),
                             pa.float64(), mask=bad),
        })

    return (ds.select_columns([group_col, value_col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def _cents(col: pa.ChunkedArray, scale: int) -> pa.ChunkedArray:
    # half AWAY from zero = SQL round(); Arrow's default half_to_even
    # would diverge on exact-.5 products (ADVICE r3).
    return pc.cast(pc.round(pc.multiply(col, float(scale)),
                            round_mode="half_towards_infinity"),
                   pa.int64())


def group_moments(ds, *, group_col: str = "event_type",
                  value_col: str = "value", scale: int = 100):
    """Per-group ``(n, sum_scaled, sumsq_scaled, mean, var_pop,
    stddev_pop)`` with the integer-core / derived-float contract above.

    ``mean`` is in original value units; ``var_pop``/``stddev_pop``
    are population moments (the ``/n`` SQL variants).  The float
    derivations are exactly::

        mean       = (sum_scaled / n) / scale
        var_pop    = (sumsq_scaled - sum_scaled*sum_scaled/n) / n
                     / (scale*scale)
        stddev_pop = sqrt(var_pop)

    evaluated in float64 in this operation order on both sides (the
    oracle in ``__ray_entry__.oracle_sql()['events_value_var']``
    spells the same tree), so results are bit-identical to DuckDB.
    """
    import ray.data

    def partial(t: pa.Table) -> pa.Table:
        # Drop null/NaN values up front (SQL aggregate semantics; the
        # r3 ADVICE NaN-in-quantiles defect class) — `n` counts valid
        # values, like count(value) over a NaN-free column.
        v = t.column(value_col)
        valid = pc.and_kleene(v.is_valid(),
                              pc.invert(pc.is_nan(pc.cast(
                                  v, pa.float64()))))
        if not pc.all(valid).as_py():
            idx = pa.array(np.flatnonzero(
                valid.to_numpy(zero_copy_only=False)), pa.int64())
            t = t.take(idx)
        c = _cents(t.column(value_col), scale)
        cn = c.to_numpy(zero_copy_only=False)
        # checked square: overflow must raise, not wrap
        sq = np.multiply(cn, cn, dtype=np.int64)
        if len(cn) and (np.abs(cn) > 3_037_000_499).any():
            raise OverflowError(
                f"{value_col} * scale={scale} exceeds int64 square "
                "headroom; pass a smaller scale")
        g = pa.table({group_col: t.column(group_col), "__c": c,
                      "__q": pa.array(sq, pa.int64())})
        agg = pa.TableGroupBy(g, group_col).aggregate(
            [("__c", "sum"), ("__q", "sum"), ([], "count_all")])
        mapping = {"__c_sum": "__s", "__q_sum": "__qq",
                   "count_all": "__n"}
        return agg.rename_columns(
            [mapping.get(c_, c_) for c_ in agg.column_names])

    merged = (ds.select_columns([group_col, value_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(group_col)
              .aggregate(ray.data.aggregate.Sum("__s"),
                         ray.data.aggregate.Sum("__qq"),
                         ray.data.aggregate.Sum("__n")))

    sc2 = float(scale) * float(scale)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "sum_scaled": pa.array([], pa.int64()),
                             "sumsq_scaled": pa.array([], pa.int64()),
                             "mean": pa.array([], pa.float64()),
                             "var_pop": pa.array([], pa.float64()),
                             "stddev_pop": pa.array([], pa.float64())})
        s = t.column("sum(__s)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        q = t.column("sum(__qq)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = t.column("sum(__n)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sf = s.astype(np.float64)
        qf = q.astype(np.float64)
        nf = n.astype(np.float64)
        mean = (sf / nf) / float(scale)
        var = (qf - sf * sf / nf) / nf / sc2
        return pa.table({
            group_col: t.column(group_col),
            "n": pa.array(n, pa.int64()),
            "sum_scaled": pa.array(s, pa.int64()),
            "sumsq_scaled": pa.array(q, pa.int64()),
            "mean": pa.array(mean, pa.float64()),
            "var_pop": pa.array(var, pa.float64()),
            "stddev_pop": pa.array(np.sqrt(var), pa.float64()),
        })

    return merged.map_batches(finish, batch_format="pyarrow")


def group_cov(ds, *, group_col: str, x_col: str, y_col: str,
              scale_x: int = 1, scale_y: int = 1):
    """Per-group EXACT population covariance and Pearson correlation
    of ``round(x * scale_x) / scale_x`` vs ``round(y * scale_y) /
    scale_y`` — the same integer-core / derived-float contract as
    :func:`group_moments`: the five cross sums (x, y, xy, x², y²)
    accumulate exactly in int64, and ``covar_pop`` / ``corr`` are one
    fixed float64 expression over them that the SQL oracle mirrors
    token for token, so the driver hash-check holds bitwise.

    Output: ``(group, n, covar_pop, corr)``.  Rows with a null/NaN on
    EITHER side are dropped (SQL covar_pop semantics).

    int64 headroom: per-term products are preflight-checked (raise,
    never wrap); the summed headroom is ~9.2e18 / max-term rows per
    group — pick scales so the LARGER column stays small (e.g. whole
    units, not cents, for a price column).

    Scale shape: identical to group_moments — per-batch Arrow hash
    aggregate, one narrow (group, 6 ints) shuffle, zero driver folds.
    """
    import ray.data

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(x_col), pa.float64())
        y = pc.cast(t.column(y_col), pa.float64())
        valid = pc.and_kleene(
            pc.and_kleene(x.is_valid(), pc.invert(pc.is_nan(x))),
            pc.and_kleene(y.is_valid(), pc.invert(pc.is_nan(y))))
        if not pc.all(valid).as_py():
            idx = pa.array(np.flatnonzero(
                valid.to_numpy(zero_copy_only=False)), pa.int64())
            t = t.take(idx)
        cx = _cents(t.column(x_col), scale_x).to_numpy(
            zero_copy_only=False)
        cy = _cents(t.column(y_col), scale_y).to_numpy(
            zero_copy_only=False)
        if len(cx):
            ax, ay = np.abs(cx).max(), np.abs(cy).max()
            if (ax > 3_037_000_499 or ay > 3_037_000_499
                    or float(ax) * float(ay) > 9.2e18):
                raise OverflowError(
                    f"scaled {x_col}/{y_col} exceed int64 product "
                    "headroom; pass smaller scale_x/scale_y")
        g = pa.table({group_col: t.column(group_col),
                      "__x": pa.array(cx, pa.int64()),
                      "__y": pa.array(cy, pa.int64()),
                      "__xy": pa.array(cx * cy, pa.int64()),
                      "__xx": pa.array(cx * cx, pa.int64()),
                      "__yy": pa.array(cy * cy, pa.int64())})
        agg = pa.TableGroupBy(g, group_col).aggregate(
            [("__x", "sum"), ("__y", "sum"), ("__xy", "sum"),
             ("__xx", "sum"), ("__yy", "sum"), ([], "count_all")])
        mapping = {"__x_sum": "__sx", "__y_sum": "__sy",
                   "__xy_sum": "__sxy", "__xx_sum": "__sxx",
                   "__yy_sum": "__syy", "count_all": "__n"}
        return agg.rename_columns(
            [mapping.get(c_, c_) for c_ in agg.column_names])

    merged = (ds.select_columns([group_col, x_col, y_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(group_col)
              .aggregate(ray.data.aggregate.Sum("__sx"),
                         ray.data.aggregate.Sum("__sy"),
                         ray.data.aggregate.Sum("__sxy"),
                         ray.data.aggregate.Sum("__sxx"),
                         ray.data.aggregate.Sum("__syy"),
                         ray.data.aggregate.Sum("__n")))

    sxy_div = float(scale_x) * float(scale_y)
    sxx_div = float(scale_x) * float(scale_x)
    syy_div = float(scale_y) * float(scale_y)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "covar_pop": pa.array([], pa.float64()),
                             "corr": pa.array([], pa.float64())})
        cols = {k: t.column(f"sum({k})").to_numpy(
            zero_copy_only=False).astype(np.float64)
            for k in ("__sx", "__sy", "__sxy", "__sxx", "__syy")}
        n = t.column("sum(__n)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nf = n.astype(np.float64)
        # the exact expression tree the SQL oracle mirrors:
        cov = ((cols["__sxy"] - cols["__sx"] * cols["__sy"] / nf)
               / nf / sxy_div)
        vx = ((cols["__sxx"] - cols["__sx"] * cols["__sx"] / nf)
              / nf / sxx_div)
        vy = ((cols["__syy"] - cols["__sy"] * cols["__sy"] / nf)
              / nf / syy_div)
        return pa.table({
            group_col: t.column(group_col),
            "n": pa.array(n, pa.int64()),
            "covar_pop": pa.array(cov, pa.float64()),
            "corr": pa.array(cov / np.sqrt(vx * vy), pa.float64()),
        })

    return merged.map_batches(finish, batch_format="pyarrow")


def value_histogram(ds, *, value_col: str = "value", lo: float,
                    hi: float, nbins: int, group_cols: list[str] | None
                    = None):
    """Fixed-width histogram of ``value_col`` over ``[lo, hi)``:
    ``bin = floor((v - lo) / width)``, rows outside the range are
    dropped (half-open on the right, so ``v == hi`` is out).  Returns
    ``(bin, n)`` — or ``(*group_cols, bin, n)`` for a per-group
    histogram.  The bin expression is one float64 subtraction +
    division + floor, identical on both sides, so the SQL oracle
    hash-matches exactly.

    Scale shape: the per-batch Arrow hash-aggregate combiner again —
    the shuffle carries at most ``nbins`` (x groups) rows per block
    regardless of input size."""
    import ray.data

    if not (nbins > 0 and hi > lo):
        raise ValueError("need nbins > 0 and hi > lo")
    width = (float(hi) - float(lo)) / nbins
    gcols = list(group_cols or [])
    keys = gcols + ["bin"]

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        v = np.asarray(v, np.float64)
        keep = (v >= lo) & (v < hi) & ~np.isnan(v)
        b = np.floor((v[keep] - float(lo)) / width).astype(np.int64)
        cols = {c: pc.take(t.column(c),
                           pa.array(np.flatnonzero(keep), pa.int64()))
                for c in gcols}
        cols["bin"] = pa.array(b, pa.int64())
        agg = pa.TableGroupBy(pa.table(cols), keys).aggregate(
            [([], "count_all")])
        return agg.rename_columns(
            ["__n" if c == "count_all" else c for c in agg.column_names])

    merged = (ds.select_columns(gcols + [value_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(keys if len(keys) > 1 else "bin")
              .aggregate(ray.data.aggregate.Sum("__n")))
    return merged.map_batches(
        lambda t: t.rename_columns(
            ["n" if c == "sum(__n)" else c for c in t.column_names]),
        batch_format="pyarrow")


def group_linreg(ds, *, group_col: str, x_col: str, y_col: str,
                 scale_x: int = 1, scale_y: int = 1):
    """Per-group EXACT OLS simple linear regression (``y = slope*x +
    intercept``) from the same five int64 cross sums as
    :func:`group_cov` — ``regr_slope`` / ``regr_intercept`` with the
    integer-core / derived-float contract: both floats are one fixed
    float64 expression over exact sums, mirrored token for token by
    the SQL oracle (driver hash-check holds bitwise).  Zero-variance-x
    groups yield NULL slope/intercept (the float var tree compares
    equal to 0.0 identically on both engines).

    Output: ``(group, n, slope, intercept)``.  Null/NaN on either side
    drops the row (SQL regr_* semantics).  Same int64 headroom
    preflight as group_cov.

    Scale shape: identical to group_moments — per-batch Arrow hash
    aggregate, one narrow (group, 6 ints) shuffle, zero driver folds.
    """
    import ray.data

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(x_col), pa.float64())
        y = pc.cast(t.column(y_col), pa.float64())
        valid = pc.and_kleene(
            pc.and_kleene(x.is_valid(), pc.invert(pc.is_nan(x))),
            pc.and_kleene(y.is_valid(), pc.invert(pc.is_nan(y))))
        if not pc.all(valid).as_py():
            idx = pa.array(np.flatnonzero(
                valid.to_numpy(zero_copy_only=False)), pa.int64())
            t = t.take(idx)
        cx = _cents(t.column(x_col), scale_x).to_numpy(
            zero_copy_only=False)
        cy = _cents(t.column(y_col), scale_y).to_numpy(
            zero_copy_only=False)
        if len(cx):
            ax, ay = np.abs(cx).max(), np.abs(cy).max()
            if (ax > 3_037_000_499 or ay > 3_037_000_499
                    or float(ax) * float(ay) > 9.2e18):
                raise OverflowError(
                    f"scaled {x_col}/{y_col} exceed int64 product "
                    "headroom; pass smaller scale_x/scale_y")
        g = pa.table({group_col: t.column(group_col),
                      "__x": pa.array(cx, pa.int64()),
                      "__y": pa.array(cy, pa.int64()),
                      "__xy": pa.array(cx * cy, pa.int64()),
                      "__xx": pa.array(cx * cx, pa.int64())})
        agg = pa.TableGroupBy(g, group_col).aggregate(
            [("__x", "sum"), ("__y", "sum"), ("__xy", "sum"),
             ("__xx", "sum"), ([], "count_all")])
        mapping = {"__x_sum": "__sx", "__y_sum": "__sy",
                   "__xy_sum": "__sxy", "__xx_sum": "__sxx",
                   "count_all": "__n"}
        return agg.rename_columns(
            [mapping.get(c_, c_) for c_ in agg.column_names])

    merged = (ds.select_columns([group_col, x_col, y_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(group_col)
              .aggregate(ray.data.aggregate.Sum("__sx"),
                         ray.data.aggregate.Sum("__sy"),
                         ray.data.aggregate.Sum("__sxy"),
                         ray.data.aggregate.Sum("__sxx"),
                         ray.data.aggregate.Sum("__n")))

    sxy_div = float(scale_x) * float(scale_y)
    sxx_div = float(scale_x) * float(scale_x)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "slope": pa.array([], pa.float64()),
                             "intercept": pa.array([], pa.float64())})
        cols = {k: t.column(f"sum({k})").to_numpy(
            zero_copy_only=False).astype(np.float64)
            for k in ("__sx", "__sy", "__sxy", "__sxx")}
        n = t.column("sum(__n)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nf = n.astype(np.float64)
        # the exact expression tree the SQL oracle mirrors:
        cov = ((cols["__sxy"] - cols["__sx"] * cols["__sy"] / nf)
               / nf / sxy_div)
        vx = ((cols["__sxx"] - cols["__sx"] * cols["__sx"] / nf)
              / nf / sxx_div)
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = cov / vx
            intercept = (cols["__sy"] / nf / float(scale_y)
                         - slope * (cols["__sx"] / nf
                                    / float(scale_x)))
        bad = vx == 0.0
        return pa.table({
            group_col: t.column(group_col),
            "n": pa.array(n, pa.int64()),
            "slope": pa.array(
                np.where(bad, np.nan, slope), pa.float64(),
                mask=bad),
            "intercept": pa.array(
                np.where(bad, np.nan, intercept), pa.float64(),
                mask=bad),
        })

    return merged.map_batches(finish, batch_format="pyarrow")


def group_weighted_mean(ds, *, group_col: str, value_col: str,
                        weight_col: str, scale: int = 100,
                        out_col: str = "wmean"):
    """EXACT per-group weighted mean ``sum(w*v)/sum(w)`` over scaled
    integers: ``wv = round(w*scale) * round(v*scale)`` accumulates in
    int64 (both factors exact), the final value is ONE IEEE division
    of the two exact sums — the oracle mirrors
    ``CAST(sum(wi*vi) AS DOUBLE) / CAST(sum(wi) AS DOUBLE) / scale``
    token for token.  Zero-total-weight groups yield NULL.

    Scale shape: per-block Arrow group_by partials (one row per group
    per block), ONE narrow groupby, division at the end — the
    standard combiner discipline; int64 bound |w*s| * |v*s| * rows
    per group < 2^63 (documented, same contract as group_moments).
    """
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                group_col: pa.array(
                    [], t.schema.field(group_col).type),
                "__wv": pa.array([], pa.int64()),
                "__w": pa.array([], pa.int64())})
        wv = pc.multiply(_cents(t.column(weight_col), scale),
                         _cents(t.column(value_col), scale))
        d = pa.table({group_col: t.column(group_col),
                      "__wv": wv,
                      "__w": _cents(t.column(weight_col), scale)})
        g = pa.TableGroupBy(d, group_col).aggregate(
            [("__wv", "sum"), ("__w", "sum")])
        return pa.table({
            group_col: g.column(group_col),
            "__wv": g.column("__wv_sum").cast(pa.int64()),
            "__w": g.column("__w_sum").cast(pa.int64())})

    agg = (ds.select_columns([group_col, value_col, weight_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(group_col).aggregate(Sum("__wv"), Sum("__w")))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                group_col: pa.array(
                    [], t.schema.field(group_col).type),
                out_col: pa.array([], pa.float64())})
        wv = t.column("sum(__wv)").to_numpy(zero_copy_only=False)
        w = t.column("sum(__w)").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            m = (wv.astype(np.float64) / w.astype(np.float64)
                 / float(scale))
        return pa.table({
            group_col: t.column(group_col),
            out_col: pa.array(np.where(w == 0, np.nan, m),
                              pa.float64(), mask=(w == 0))})

    return agg.map_batches(finish, batch_format="pyarrow")


def group_concentration(ds, *, group_col: str, cat_col: str):
    """EXACT per-group Herfindahl–Hirschman concentration of a
    categorical column — the corpus-mixing diagnostic ("is this
    language slice dominated by one source?"): HHI = sum over
    categories of (share)^2, 1/n_cats (uniform) .. 1.0 (monoculture).

    Everything that has to be exact IS exact integers: per-block
    Arrow ``group_by`` combiners collapse rows to (group, cat, count)
    before ONE narrow two-key shuffle; a second one-row-per-(group,
    block) shuffle folds sum(cnt), sum(cnt^2) and the category count;
    ``hhi`` is the ONE float64 expression
    ``sumsq / (n_rows * n_rows)`` that the SQL oracle mirrors token
    for token.  int64 headroom: cnt^2 <= 9.2e18 holds per-category
    counts up to ~3e9 rows.

    Returns ``(group, n_rows, n_cats, sumsq, hhi)``.
    """
    from ray.data.aggregate import Sum

    def count_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or group_col not in t.column_names:
            return pa.table({
                "__g": pa.array([], pa.string()),
                "__c": pa.array([], pa.string()),
                "__n": pa.array([], pa.int64())})
        g = (t.select([group_col, cat_col])
             .group_by([group_col, cat_col])
             .aggregate([([], "count_all")]))
        return pa.table({
            "__g": g.column(group_col).cast(pa.string()),
            "__c": g.column(cat_col).cast(pa.string()),
            "__n": g.column("count_all").cast(pa.int64())})

    pair_counts = (ds.select_columns([group_col, cat_col])
                   .map_batches(count_pairs, batch_format="pyarrow")
                   .groupby(["__g", "__c"]).aggregate(Sum("__n")))

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "__g": pa.array([], pa.string()),
                "__n": pa.array([], pa.int64()),
                "__sq": pa.array([], pa.int64()),
                "__k": pa.array([], pa.int64())})
        cnt = t.column("sum(__n)").cast(pa.int64())
        sq = pc.multiply_checked(cnt, cnt)
        base = pa.table({"__g": t.column("__g"), "__n": cnt,
                         "__sq": sq})
        g = base.group_by("__g").aggregate(
            [("__n", "sum"), ("__sq", "sum"), ([], "count_all")])
        return pa.table({
            "__g": g.column("__g"),
            "__n": g.column("__n_sum").cast(pa.int64()),
            "__sq": g.column("__sq_sum").cast(pa.int64()),
            "__k": g.column("count_all").cast(pa.int64())})

    folded = (pair_counts.map_batches(fold, batch_format="pyarrow")
              .groupby("__g").aggregate(Sum("__n"), Sum("__sq"),
                                        Sum("__k")))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                group_col: pa.array([], pa.string()),
                "n_rows": pa.array([], pa.int64()),
                "n_cats": pa.array([], pa.int64()),
                "sumsq": pa.array([], pa.int64()),
                "hhi": pa.array([], pa.float64())})
        n = t.column("sum(__n)").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        sq = t.column("sum(__sq)").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        k = t.column("sum(__k)").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nf = n.astype(np.float64)
        hhi = sq.astype(np.float64) / (nf * nf)
        return pa.table({
            group_col: t.column("__g"),
            "n_rows": pa.array(n, pa.int64()),
            "n_cats": pa.array(k, pa.int64()),
            "sumsq": pa.array(sq, pa.int64()),
            "hhi": pa.array(hhi, pa.float64())})

    return folded.map_batches(finish, batch_format="pyarrow")
