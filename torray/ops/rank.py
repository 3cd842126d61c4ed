"""Per-group ranking operators: deterministic top-k rows per group.

``group_topk`` is the standard "best k documents per domain / per
language" cut of corpus curation.  It is shuffle-light by
construction: every upstream batch is cut to at most k rows per group
*before* the ``groupby`` exchange (a correct partial — the global
top-k per group is contained in the union of per-batch top-k's), so
the shuffle carries O(k * groups * blocks) narrow rows instead of
whole groups.  The final per-group cut is the same vectorized sort.

Determinism: ties on the score are broken by ascending id, so results
are independent of partitioning and execution order (the same
property the sampling ops in :mod:`torray.ops.sampling` guarantee),
and the operator has an exact SQL equivalent
(``row_number() OVER (PARTITION BY g ORDER BY score DESC, id)``)
that the driver hash-checks against DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["group_topk", "topk_table", "top_frequent", "global_rank",
           "group_rank"]


def topk_table(t: pa.Table, group_col: str, score_col: str, k: int,
               id_col: str, descending: bool = True) -> pa.Table:
    """Vectorized top-k-per-group cut of ONE Arrow table: sort by
    (group, score, id) with one lexsort, then keep the first k
    positions of every group run.  No Python rows."""
    if t.num_rows == 0:
        return t
    groups = t.column(group_col).to_numpy(zero_copy_only=False)
    scores = t.column(score_col).to_numpy(zero_copy_only=False)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    # Factorize the group values so lexsort runs on int codes even for
    # string groups.
    _, codes = np.unique(groups, return_inverse=True)
    skey = -scores if descending else scores
    order = np.lexsort((ids, skey, codes))
    sorted_codes = codes[order]
    # Rank within each group run: position minus the run's start.
    boundary = np.empty(len(order), np.bool_)
    boundary[0] = True
    np.not_equal(sorted_codes[1:], sorted_codes[:-1], out=boundary[1:])
    run_start = np.maximum.accumulate(
        np.where(boundary, np.arange(len(order)), 0))
    rank = np.arange(len(order)) - run_start
    keep = order[rank < k]
    return t.take(pa.array(np.sort(keep), pa.int64()))


def group_topk(ds, group_col: str, score_col: str, k: int, id_col: str,
               *, descending: bool = True):
    """Top-k rows per group by ``score_col`` (ties broken by ascending
    ``id_col``).  One narrow shuffle: batches are pre-cut to k rows
    per group, then a single ``groupby().map_groups`` finishes the
    cut.  Returns the full input columns of the surviving rows."""

    def partial(batch: pa.Table) -> pa.Table:
        return topk_table(batch, group_col, score_col, k, id_col,
                          descending)

    def final(group: pa.Table) -> pa.Table:
        return topk_table(group, group_col, score_col, k, id_col,
                          descending)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(final, batch_format="pyarrow"))


def top_frequent(ds, col: str, k: int, *, out_count: str = "n"):
    """EXACT top-k most frequent values of ``col`` (ties broken by
    ascending value) -> ``(col, n)``, the heavy-hitters cut (hot hosts,
    boilerplate sources, dominant n-grams).

    Scale shape: each block collapses to its DISTINCT (value, count)
    partial via one Arrow ``group_by`` (the combiner — the shuffle
    carries distinct-per-block rows, never raw rows), a single
    ``groupby().sum`` folds partials, then every result batch is cut to
    its local top-k and one final single-task merge picks the global
    top-k from ``k x blocks`` candidate rows.  No full sort, no
    second pass: unlike a lossy Misra-Gries sketch this is exact for
    any distribution, at the cost of the distinct-key shuffle (bounded
    by total DISTINCT values, which is what a count must touch
    anyway)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([col]).group_by(col).aggregate([([], "count_all")])
        return pa.table({col: g.column(col),
                         "__n": g.column("count_all").cast(pa.int64())})

    def local_cut(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        n = t.column(out_count).to_numpy(zero_copy_only=False)
        vals = t.column(col).to_numpy(zero_copy_only=False)
        _, codes = np.unique(vals, return_inverse=True)
        order = np.lexsort((codes, -n))[:k]
        return t.take(pa.array(np.sort(order), pa.int64()))

    summed = (ds.select_columns([col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(col).aggregate(Sum("__n")))
    summed = summed.map_batches(
        lambda t: t.rename_columns(
            [out_count if c == "sum(__n)" else c for c in t.column_names]),
        batch_format="pyarrow")
    return (summed.map_batches(local_cut, batch_format="pyarrow")
            .repartition(1)
            .map_batches(local_cut, batch_format="pyarrow"))


def global_rank(ds, *, value_col: str, id_col: str,
                descending: bool = False, method: str = "rank",
                num_buckets: int = 256, ntile_k: int | None = None):
    """EXACT global window rank of every row by ``value_col`` WITHOUT
    a global sort.  ``method`` selects the SQL window function:

    - ``'rank'`` — ``rank() OVER (ORDER BY value)``, ties share the
      min rank; returns ``(id_col, rnk)``.
    - ``'row_number'`` — ``row_number() OVER (ORDER BY value, id)``,
      deterministic ties; returns ``(id_col, rnk)``.
    - ``'dense_rank'`` — ``dense_rank() OVER (ORDER BY value)``; needs
      one extra exact distinct-count pass per bucket
      (:func:`torray.ops.sketch.exact_distinct_by` — block-local
      partials would double-count values split across blocks);
      returns ``(id_col, rnk)``.
    - ``'percent_rank'`` — ``(rank() - 1) / (n - 1)`` as the explicit
      float64 expression (mirrored token for token by the SQL oracle,
      so bitwise-equal); returns ``(id_col, pct)``.
    - ``'ntile'`` — ``ntile(ntile_k) OVER (ORDER BY value, id)`` with
      the standard first-``n % k``-tiles-get-the-extra-row split,
      pure integer math; returns ``(id_col, tile)``.
    - ``'cume_dist'`` — ``cume_dist() OVER (ORDER BY value)`` =
      (rows with value <= this row's value) / n, the one float64
      division both engines perform identically; returns
      ``(id_col, cd)``.

    A naive implementation is ``ds.sort(value_col)`` — an all-to-all
    range exchange of EVERY column plus a second pass to number rows
    across blocks.  This one is the two-pass counting shape instead:

    1. ~``num_buckets`` approximate splitter values come from the
       one-pass, shuffle-free :func:`torray.ops.sketch.approx_quantiles`
       sample (approximation only affects bucket BALANCE, never
       correctness).
    2. Rows bucket by ``searchsorted(splitters, v)`` — equal values
       always land in the same bucket, so ties never straddle a
       boundary — and per-bucket row counts fold to an exclusive
       prefix (``num_buckets`` ints on the driver, O(buckets) not
       O(rows)).
    3. ONE ``groupby(bucket)`` sorts each bucket locally (lexsort) and
       emits ``prefix[bucket] + local rank`` — exact global ranks from
       a shuffle that carries only ``(bucket, value, id)`` narrow rows.

    Partitioning assumption: a bucket (~N/num_buckets rows, balanced
    by the quantile splitters) fits in a task; size ``num_buckets`` to
    the cluster.  Nulls/NaNs in ``value_col`` are dropped (SQL
    aggregate semantics)."""
    from torray.ops.sketch import approx_quantiles

    if method not in ("rank", "row_number", "dense_rank",
                      "percent_rank", "ntile", "cume_dist"):
        raise ValueError(f"unknown method {method!r}")
    if method == "ntile" and not (ntile_k and ntile_k > 0):
        raise ValueError("method='ntile' needs ntile_k > 0")
    out_name, out_type = {
        "percent_rank": ("pct", pa.float64()),
        "cume_dist": ("cd", pa.float64()),
        "ntile": ("tile", pa.int64()),
    }.get(method, ("rnk", pa.int64()))
    narrow = ds.select_columns([value_col, id_col])

    qs = [i / num_buckets for i in range(1, num_buckets)]
    est = approx_quantiles(narrow, value_col, qs)
    splitters = np.unique(np.asarray(list(est.values()), np.float64))
    if descending:
        splitters = np.sort(-splitters)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__b": pa.array([], pa.int64()),
                             "__v": pa.array([], pa.float64()),
                             id_col: t.column(id_col)})
        v = t.column(value_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        if descending:
            v = -v
        keep = ~np.isnan(v)
        if not keep.all():
            idx = pa.array(np.flatnonzero(keep), pa.int64())
            ids = pc.take(t.column(id_col), idx)
            v = v[keep]
        else:
            ids = t.column(id_col)
        b = np.searchsorted(splitters, v, side="left").astype(np.int64)
        return pa.table({"__b": pa.array(b, pa.int64()),
                         "__v": pa.array(v, pa.float64()),
                         id_col: ids})

    tagged = narrow.map_batches(tag, batch_format="pyarrow")
    tagged = tagged.materialize()  # two consumers: counts + rank scan

    # Exclusive prefix of bucket counts — O(num_buckets) driver state.
    def bucket_counts(t: pa.Table) -> pa.Table:
        g = t.select(["__b"]).group_by("__b").aggregate(
            [([], "count_all")])
        return g.rename_columns(["__b", "__n"])

    import ray
    counts = np.zeros(len(splitters) + 1, np.int64)
    for ref in tagged.map_batches(
            bucket_counts, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            np.add.at(counts,
                      t.column("__b").to_numpy(zero_copy_only=False),
                      t.column("__n").to_numpy(zero_copy_only=False))
    prefix = np.concatenate(([0], np.cumsum(counts)[:-1]))
    n_total = int(counts.sum())

    dprefix = None
    if method == "dense_rank":
        # Exclusive prefix of exact per-bucket DISTINCT-value counts.
        # Block-local distinct partials can NOT be summed (a value
        # split across two blocks of one bucket would count twice), so
        # this reuses the exact grouped COUNT DISTINCT op — the same
        # ties-never-straddle-buckets property makes the global dense
        # index the bucket prefix + a local cumsum.
        from torray.ops.sketch import exact_distinct_by

        dcounts = np.zeros(len(splitters) + 1, np.int64)
        dt = exact_distinct_by(tagged.select_columns(["__b", "__v"]),
                               "__b", "__v", out_col="__nd")
        for ref in dt.to_arrow_refs():
            t = ray.get(ref)
            if t.num_rows:
                np.add.at(
                    dcounts,
                    t.column("__b").to_numpy(zero_copy_only=False),
                    t.column("__nd").to_numpy(zero_copy_only=False))
        dprefix = np.concatenate(([0], np.cumsum(dcounts)[:-1]))

    def rank_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             out_name: pa.array([], out_type)})
        v = g.column("__v").to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        b = int(g.column("__b")[0].as_py())
        order = np.lexsort((ids, v))
        vs = v[order]
        if method == "row_number":
            out = prefix[b] + 1 + np.arange(len(vs), dtype=np.int64)
        elif method == "ntile":
            rn = prefix[b] + 1 + np.arange(len(vs), dtype=np.int64)
            q, r = divmod(n_total, ntile_k)
            cut = r * (q + 1)
            # np.where evaluates both arms; guard q == 0 (n < k) where
            # every row lands in the rn <= cut arm anyway
            out = np.where(rn <= cut, (rn - 1) // (q + 1) + 1,
                           r + (rn - 1 - cut) // max(q, 1) + 1)
        elif method == "dense_rank":
            newv = np.concatenate(([True], vs[1:] != vs[:-1]))
            out = dprefix[b] + np.cumsum(newv, dtype=np.int64)
        elif method == "cume_dist":
            # rows <= v = bucket prefix + the tie run's END position
            # (ties never straddle buckets, so the local run end is
            # exact); one int->float division, same tree as SQL.
            starts = np.flatnonzero(np.concatenate(
                ([True], vs[1:] != vs[:-1])))
            lens = np.diff(np.append(starts, len(vs)))
            ends = np.repeat(starts + lens, lens)
            out = (prefix[b] + ends).astype(np.float64) / n_total
        else:  # rank / percent_rank share the min-rank core
            starts = np.flatnonzero(np.concatenate(
                ([True], vs[1:] != vs[:-1])))
            lens = np.diff(np.append(starts, len(vs)))
            out = prefix[b] + 1 + np.repeat(starts, lens)
            if method == "percent_rank":
                out = ((out - 1).astype(np.float64) / (n_total - 1)
                       if n_total > 1
                       else np.zeros(len(vs), np.float64))
        return pa.table({
            id_col: pc.take(g.column(id_col),
                            pa.array(order, pa.int64())),
            out_name: pa.array(out, out_type),
        })

    return (tagged.groupby("__b")
            .map_groups(rank_bucket, batch_format="pyarrow"))


def group_rank(ds, *, group_col: str, value_col: str, id_col: str,
               method: str = "rank", descending: bool = False,
               ntile_k: int | None = None, num_partitions: int = 64):
    """EXACT per-group window rank: the ``PARTITION BY group`` family
    of :func:`global_rank` —

    - ``'rank'`` — ``rank() OVER (PARTITION BY g ORDER BY v)``
    - ``'row_number'`` — ties broken by ascending ``id_col``
    - ``'dense_rank'``
    - ``'percent_rank'`` — ``(rank - 1) / (n_group - 1)``, 0.0 for
      singleton groups, one float64 division mirrored by the oracle
    - ``'cume_dist'`` — (group rows <= v) / n_group
    - ``'ntile'`` — first ``n % k`` tiles get the extra row, pure
      integer math

    Returns ``(id_col, rnk|pct|cd|tile)``.

    Scale shape: the partition RUN-SCAN (see
    :func:`torray.ops.window.sessionize`) — groups hash into
    ``num_partitions`` coarse partitions, ONE ``groupby`` on the
    partition id, then one lexsort + segmented numpy rank per
    partition.  Never a Python call per group, and unlike
    ``global_rank`` no splitter/prefix passes are needed: ranks reset
    at every group boundary, so each partition is self-contained.
    The shuffle carries only ``(group, value, id)`` narrow rows.

    Partitioning assumption: one GROUP must fit in a task (the same
    contract as ``group_quantiles``); hot groups want the salted
    composition upstream.  Null/NaN values are dropped (document the
    oracle with ``WHERE v IS NOT NULL``; SQL window functions would
    otherwise rank NULL rows too)."""
    from torray.ops.window import _ds_field_type, _hash_col_np

    if method not in ("rank", "row_number", "dense_rank",
                      "percent_rank", "ntile", "cume_dist"):
        raise ValueError(f"unknown method {method!r}")
    if method == "ntile" and not (ntile_k and ntile_k > 0):
        raise ValueError("method='ntile' needs ntile_k > 0")
    out_name, out_type = {
        "percent_rank": ("pct", pa.float64()),
        "cume_dist": ("cd", pa.float64()),
        "ntile": ("tile", pa.int64()),
    }.get(method, ("rnk", pa.int64()))
    id_type = _ds_field_type(ds, id_col)
    grp_type = _ds_field_type(ds, group_col)
    narrow = ds.select_columns([group_col, value_col, id_col])

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                group_col: pa.array([], grp_type),
                value_col: pa.array([], pa.float64()),
                id_col: pa.array([], id_type),
                "__part": pa.array([], pa.int64())})
        v = pc.cast(t.column(value_col), pa.float64())
        keep = pc.and_kleene(v.combine_chunks().is_valid(),
                             pc.invert(pc.is_nan(v)))
        t = t.filter(keep)
        v = pc.cast(t.column(value_col), pa.float64())
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        part = (_hash_col_np(g) % np.uint64(num_partitions)).astype(
            np.int64)
        return pa.table({group_col: t.column(group_col),
                         value_col: v,
                         id_col: t.column(id_col),
                         "__part": pa.array(part, pa.int64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             out_name: pa.array([], out_type)})
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        v = group.column(value_col).to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        _, codes = np.unique(g, return_inverse=True)
        skey = -v if descending else v
        order = np.lexsort((ids, skey, codes))
        c, vs = codes[order], skey[order]
        n = len(c)
        new_grp = np.concatenate(([True], c[1:] != c[:-1]))
        gstarts = np.flatnonzero(new_grp)
        glens = np.diff(np.append(gstarts, n))
        run_start = np.repeat(gstarts, glens)
        run_len = np.repeat(glens, glens)
        r = np.arange(n, dtype=np.int64) - run_start  # 0-based in grp

        if method == "row_number":
            out = r + 1
        elif method == "ntile":
            k = int(ntile_k)
            q, rem = run_len // k, run_len % k
            cut = (q + 1) * rem
            out = np.where(r < cut, r // np.maximum(q + 1, 1) + 1,
                           rem + (r - cut) // np.maximum(q, 1) + 1)
        else:
            new_tie = new_grp | np.concatenate(([True],
                                                vs[1:] != vs[:-1]))
            tstarts = np.flatnonzero(new_tie)
            tlens = np.diff(np.append(tstarts, n))
            tie_start = np.repeat(tstarts, tlens)
            if method == "dense_rank":
                out = (np.cumsum(new_tie, dtype=np.int64)
                       - np.repeat(np.cumsum(new_tie, dtype=np.int64)
                                   [gstarts], glens) + 1)
            elif method == "cume_dist":
                tie_end = np.repeat(tstarts + tlens, tlens)
                out = ((tie_end - run_start).astype(np.float64)
                       / run_len)
            else:  # rank / percent_rank
                out = tie_start - run_start + 1
                if method == "percent_rank":
                    out = np.where(
                        run_len > 1,
                        (out - 1).astype(np.float64)
                        / np.maximum(run_len - 1, 1),
                        0.0)
        return pa.table({
            id_col: pc.take(group.column(id_col),
                            pa.array(order, pa.int64())),
            out_name: pa.array(out, out_type),
        })

    return (narrow.map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))
