"""Distributed multiset-to-set operations Ray Data lacks natively:
``INTERSECT`` and ``EXCEPT`` (SQL DISTINCT semantics) between two
Datasets on a key column.

Scale shape (the same combiner discipline as the rest of the ops
package): each side first collapses to its per-block DISTINCT keys
with one Arrow ``group_by`` (repeated keys never leave their block),
the two sides are tagged and unioned, and ONE ``groupby`` on a hashed
coarse partition id runs a vectorized run-scan that decides every key
in the partition at once — never a Python call per key, never a
driver-side set.  The shuffle carries at most
``distinct-keys-per-block x blocks`` narrow (key, side) rows.

Anti-join cousins with different contracts live elsewhere:
``ops.bloom.bloom_antijoin`` keeps the LEFT ROWS (all columns,
duplicates preserved) that have no match; ``except_distinct`` returns
the distinct KEY SET difference, exactly SQL ``EXCEPT``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["intersect_distinct", "except_distinct", "union_distinct",
           "except_all", "intersect_all", "table_diff",
           "union_by_name"]


def _tagged_distinct(ds, col: str, out: str, side: int,
                     num_partitions: int):
    from torray.ops.dedup import _mix64, fnv1a64_strings

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({out: pa.array([], t.schema.field(col).type),
                             "__side": pa.array([], pa.int8()),
                             "__part": pa.array([], pa.int64())})
        d = t.select([col]).group_by(col).aggregate([])
        keys = d.column(col)
        if pa.types.is_integer(keys.type):
            h = _mix64(keys.to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        else:
            h = fnv1a64_strings(keys.combine_chunks() if isinstance(
                keys, pa.ChunkedArray) else keys)
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        n = d.num_rows
        return pa.table({out: keys,
                         "__side": pa.array(
                             np.full(n, side, np.int8), pa.int8()),
                         "__part": pa.array(part, pa.int64())})

    return ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow")


def _setop(left_ds, right_ds, *, left_col: str, right_col: str,
           out_col: str | None, mode: str, num_partitions: int):
    out = out_col or left_col

    def decide(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({out: pa.array([], pa.int64())})
        keys = group.column(out)
        side = group.column("__side").to_numpy(zero_copy_only=False)
        # factorize keys (int or string) to int codes for the lexsort
        _, codes = np.unique(keys.to_numpy(zero_copy_only=False),
                             return_inverse=True)
        order = np.lexsort((side, codes))
        c, s = codes[order], side[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], c[1:] != c[:-1])))
        # per key run: any left row? any right row? (side asc-sorted
        # inside the run, so min == 0 <=> left present, max == 1 <=>
        # right present)
        ends = np.append(starts[1:], len(c)) - 1
        has_left = s[starts] == 0
        has_right = s[ends] == 1
        if mode == "intersect":
            win = has_left & has_right
        elif mode == "union":
            win = np.ones(len(starts), bool)
        else:  # except
            win = has_left & ~has_right
        take = order[starts[win]]
        return pa.table({out: keys.take(pa.array(np.sort(take),
                                                 pa.int64()))})

    tagged = (_tagged_distinct(left_ds, left_col, out, 0,
                               num_partitions)
              .union(_tagged_distinct(right_ds, right_col, out, 1,
                                      num_partitions)))
    return (tagged.groupby("__part")
            .map_groups(decide, batch_format="pyarrow"))


def intersect_distinct(left_ds, right_ds, *, left_col: str,
                       right_col: str, out_col: str | None = None,
                       num_partitions: int = 64):
    """SQL ``SELECT left_col FROM l INTERSECT SELECT right_col FROM
    r``: the distinct keys present on BOTH sides."""
    return _setop(left_ds, right_ds, left_col=left_col,
                  right_col=right_col, out_col=out_col,
                  mode="intersect", num_partitions=num_partitions)


def except_distinct(left_ds, right_ds, *, left_col: str,
                    right_col: str, out_col: str | None = None,
                    num_partitions: int = 64):
    """SQL ``SELECT left_col FROM l EXCEPT SELECT right_col FROM r``:
    the distinct left keys with no right occurrence."""
    return _setop(left_ds, right_ds, left_col=left_col,
                  right_col=right_col, out_col=out_col,
                  mode="except", num_partitions=num_partitions)


def union_distinct(left_ds, right_ds, *, left_col: str,
                   right_col: str, out_col: str | None = None,
                   num_partitions: int = 64):
    """SQL ``SELECT left_col FROM l UNION SELECT right_col FROM r``:
    the distinct keys of the combined sides (set union, duplicates
    collapsed across AND within tables) — same tagged-union run-scan,
    every key run wins."""
    return _setop(left_ds, right_ds, left_col=left_col,
                  right_col=right_col, out_col=out_col,
                  mode="union", num_partitions=num_partitions)


def _tagged_counts(ds, col: str, out: str, side: int,
                   num_partitions: int):
    """Per-block (key, count) partials — the BAG twin of
    :func:`_tagged_distinct` (multiplicities ride along; repeated
    keys still never leave their block uncombined)."""
    from torray.ops.dedup import _mix64, fnv1a64_strings

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({out: pa.array([], t.schema.field(col).type),
                             "__n": pa.array([], pa.int64()),
                             "__side": pa.array([], pa.int8()),
                             "__part": pa.array([], pa.int64())})
        g = t.select([col]).group_by(col).aggregate(
            [([], "count_all")])
        keys = g.column(col)
        if pa.types.is_integer(keys.type):
            h = _mix64(keys.to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        else:
            h = fnv1a64_strings(keys.combine_chunks() if isinstance(
                keys, pa.ChunkedArray) else keys)
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        n = g.num_rows
        return pa.table({out: keys,
                         "__n": g.column("count_all").cast(pa.int64()),
                         "__side": pa.array(
                             np.full(n, side, np.int8), pa.int8()),
                         "__part": pa.array(part, pa.int64())})

    return ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow")


def _bagop(left_ds, right_ds, *, left_col: str, right_col: str,
           out_col: str | None, mode: str, num_partitions: int):
    out = out_col or left_col

    def decide(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({out: pa.array([], pa.int64())})
        keys = group.column(out)
        side = group.column("__side").to_numpy(zero_copy_only=False)
        cnt = group.column("__n").to_numpy(zero_copy_only=False)
        _, codes = np.unique(keys.to_numpy(zero_copy_only=False),
                             return_inverse=True)
        order = np.lexsort((side, codes))
        c, s, n = codes[order], side[order], cnt[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], c[1:] != c[:-1])))
        ca = np.add.reduceat(np.where(s == 0, n, 0), starts)
        cb = np.add.reduceat(np.where(s == 1, n, 0), starts)
        if mode == "except_all":
            m = np.maximum(ca - cb, 0)
        else:  # intersect_all
            m = np.minimum(ca, cb)
        win = m > 0
        take = np.repeat(order[starts[win]], m[win])
        return pa.table({out: keys.take(pa.array(take, pa.int64()))})

    tagged = (_tagged_counts(left_ds, left_col, out, 0, num_partitions)
              .union(_tagged_counts(right_ds, right_col, out, 1,
                                    num_partitions)))
    return (tagged.groupby("__part")
            .map_groups(decide, batch_format="pyarrow"))


def except_all(left_ds, right_ds, *, left_col: str, right_col: str,
               out_col: str | None = None, num_partitions: int = 64):
    """SQL ``EXCEPT ALL`` (bag semantics): each key emitted
    ``max(0, count_left - count_right)`` times.  Same combiner + one
    narrow (key, count, side) shuffle + vectorized run-scan shape as
    the DISTINCT set ops — multiplicities materialize only in the
    final ``np.repeat``, never as duplicate shuffle rows."""
    return _bagop(left_ds, right_ds, left_col=left_col,
                  right_col=right_col, out_col=out_col,
                  mode="except_all", num_partitions=num_partitions)


def intersect_all(left_ds, right_ds, *, left_col: str,
                  right_col: str, out_col: str | None = None,
                  num_partitions: int = 64):
    """SQL ``INTERSECT ALL`` (bag semantics): each key emitted
    ``min(count_left, count_right)`` times — see :func:`except_all`."""
    return _bagop(left_ds, right_ds, left_col=left_col,
                  right_col=right_col, out_col=out_col,
                  mode="intersect_all", num_partitions=num_partitions)


def table_diff(ds_a, ds_b, *, key_col: str,
               compare_cols: list[str],
               num_partitions: int = 64):
    """Versioned-table diff: classify every key as ``'added'`` (in B
    only), ``'removed'`` (in A only) or ``'changed'`` (in both, any
    compared column differs — NULL-safe, SQL ``IS DISTINCT FROM``
    semantics; float NaN == NaN) — the pipeline regression-test /
    snapshot-drift primitive.  Unchanged keys emit nothing.  Returns
    ``(key_col, status)`` rows.

    Contract: ``key_col`` is unique within each side (a versioned
    table).  Scale shape: both sides stream through a narrow
    projection (key, side, compared cols), ONE hash(key) coarse
    shuffle co-locates each key's <= 2 rows, and one lexsort +
    adjacent-pair vectorized compare per PARTITION decides every key
    at once.  Only keys and compared columns ever shuffle.
    """
    import pyarrow.compute as pc

    from torray.ops.dedup import _mix64

    def side(ds, tag_val: int):
        def f(t: pa.Table) -> pa.Table:
            k = t.column(key_col).to_numpy(zero_copy_only=False)
            part = (_mix64(k.astype(np.int64))
                    % np.uint64(num_partitions)).astype(np.int64)
            out = {key_col: t.column(key_col)}
            for c in compare_cols:
                out[c] = t.column(c)
            out["__side"] = pa.array(
                np.full(t.num_rows, tag_val, np.int64), pa.int64())
            out["__part"] = pa.array(part, pa.int64())
            return pa.table(out)

        return ds.select_columns([key_col] + compare_cols).map_batches(
            f, batch_format="pyarrow")

    empty = pa.table({key_col: pa.array([], pa.int64()),
                      "status": pa.array([], pa.string())})

    def scan_partition(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        k = g.column(key_col).to_numpy(zero_copy_only=False)
        s = g.column("__side").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, k))
        k, s = k[order], s[order]
        first = np.concatenate(([True], k[1:] != k[:-1]))
        last = np.concatenate((k[1:] != k[:-1], [True]))
        single = first & last
        out_k = [k[single & (s == 1)], k[single & (s == 0)]]
        out_s = [np.full(int((single & (s == 1)).sum()), "added",
                         object),
                 np.full(int((single & (s == 0)).sum()), "removed",
                         object)]
        # paired keys: row i is the A row, i+1 the B row
        pair_a = np.flatnonzero(first & ~last)
        if len(pair_a):
            changed = np.zeros(len(pair_a), bool)
            gt = g.take(pa.array(order, pa.int64()))
            for c in compare_cols:
                col = gt.column(c)
                a_vals = col.take(pa.array(pair_a, pa.int64()))
                b_vals = col.take(pa.array(pair_a + 1, pa.int64()))
                neq = pc.not_equal(a_vals, b_vals)
                # IS DISTINCT FROM: NULL==NULL, NaN==NaN
                a_null = pc.is_null(a_vals, nan_is_null=True)
                b_null = pc.is_null(b_vals, nan_is_null=True)
                neq = pc.or_kleene(
                    pc.and_(pc.fill_null(neq, False),
                            pc.and_(pc.invert(a_null),
                                    pc.invert(b_null))),
                    pc.xor(a_null, b_null))
                changed |= neq.to_numpy(zero_copy_only=False)
            out_k.append(k[pair_a][changed])
            out_s.append(np.full(int(changed.sum()), "changed",
                                 object))
        kk = np.concatenate(out_k) if out_k else np.empty(0, np.int64)
        ss = (np.concatenate(out_s) if out_s
              else np.empty(0, object))
        return pa.table({key_col: pa.array(kk, pa.int64()),
                         "status": pa.array(ss, pa.string())})

    both = side(ds_a, 0).union(side(ds_b, 1))
    return (both.groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def union_by_name(*datasets, strict_types: bool = True):
    """Schema-evolution ``UNION ALL BY NAME``: concatenate Datasets
    whose schemas differ by column SET, aligning columns by name and
    null-filling the ones a side lacks (the standard way to read a
    100 TB lake whose shards were written across schema versions).

    A column present on several sides with CONFLICTING types is a hard
    error under ``strict_types`` (silent coercion is a data bug);
    ``strict_types=False`` casts to the first-seen type instead.

    Scale shape: pure per-batch projection (add null columns + reorder)
    on each side, then Ray's ``union`` — zero shuffle, zero
    materialization; the null columns cost O(1) per batch (Arrow null
    arrays are lazily allocated bitmaps)."""
    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")
    fields: dict[str, pa.DataType] = {}
    for ds in datasets:
        sch = getattr(ds.schema(), "base_schema", None)
        if not isinstance(sch, pa.Schema):
            continue  # zero-block derived side: no columns AND no rows
        for f in sch:
            have = fields.get(f.name)
            if have is None:
                fields[f.name] = f.type
            elif have != f.type and strict_types:
                raise TypeError(
                    f"union_by_name: column {f.name!r} has conflicting "
                    f"types {have} vs {f.type}")
    names = list(fields)
    if not names:  # every side is a schemaless zero-block dataset
        return datasets[0]

    def align(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = []
        for name in names:
            if name in batch.column_names:
                col = batch.column(name)
                if col.type != fields[name]:
                    col = col.cast(fields[name])
            else:
                col = pa.nulls(n, fields[name])
            cols.append(col)
        return pa.table(dict(zip(names, cols)))

    aligned = [ds.map_batches(align, batch_format="pyarrow")
               for ds in datasets]
    out = aligned[0]
    return out.union(*aligned[1:]) if len(aligned) > 1 else out
