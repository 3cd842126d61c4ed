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
           "except_all", "intersect_all"]


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
