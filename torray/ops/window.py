"""Time-window operators over an events Dataset
(``event_id, ts, user_id, event_type, value, props`` — TESTDATA.md):
tumbling-window aggregation, gap-based sessionization, and an as-of
join — the operators SURVEY.md §2 flags as "Ray Data lacks, build as
composition" (custom-operator rows of the brief).

All three follow the same shape: derive the partition key in a
``map_batches`` (vectorized), then ONE ``groupby(key)`` with the
order-sensitive logic inside ``map_groups`` (sort within group —
partitioning assumption: a group fits in a task, which holds for
per-user/per-window slices of even very large event streams; a hot key
would be salted by time range first).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["tumbling_window", "hopping_window", "sessionize", "asof_join"]


def tumbling_window(events_ds, *, window_s: int = 21600,
                    key_col: str = "event_type"):
    """Count/min/max aggregate per (tumbling window, key).

    Window derivation is vectorized per batch (epoch // width); the
    aggregate itself pre-combines inside the batch before the single
    ``groupby`` (partial aggregation — the shuffle carries one row per
    (window, key) per batch, not per event)."""

    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch.column("ts"), pa.int64())  # microseconds
        win = pc.cast(pc.divide(epoch, window_s * 1_000_000), pa.int64())
        t = pa.table({
            "window": win,
            key_col: batch.column(key_col),
            "event_id": batch.column("event_id"),
        })
        # In-batch combine: one row per (window, key), zero-conversion
        # (Arrow hash-aggregate — no pandas round-trip).
        agg = pa.TableGroupBy(t, ["window", key_col]).aggregate(
            [("event_id", "count"), ("event_id", "min"), ("event_id", "max")])
        mapping = {"event_id_count": "n", "event_id_min": "min_event",
                   "event_id_max": "max_event"}
        return agg.rename_columns(
            [mapping.get(c, c) for c in agg.column_names])

    partials = events_ds.select_columns(
        ["ts", key_col, "event_id"]).map_batches(
        partial, batch_format="pyarrow")

    merged = partials.groupby(["window", key_col]).aggregate(
        ray.data.aggregate.Sum("n"),
        ray.data.aggregate.Min("min_event"),
        ray.data.aggregate.Max("max_event"),
    )
    final = {"sum(n)": "n", "min(min_event)": "min_event",
             "max(max_event)": "max_event"}
    return merged.map_batches(
        lambda t: t.rename_columns(
            [final.get(c, c) for c in t.column_names]),
        batch_format="pyarrow")


def hopping_window(events_ds, *, window_s: int = 21600, hop_s: int = 7200,
                   key_col: str = "event_type"):
    """Count aggregate per (hopping window, key): windows of
    ``window_s`` advancing every ``hop_s`` — each event belongs to the
    windows indexed ``floor((t-window)/hop)+1 .. floor(t/hop)``.

    The explode is vectorized (np.repeat over a constant-ish window
    count per event) and pre-combined per batch exactly like
    :func:`tumbling_window`: the shuffle carries one row per
    (window, key) per batch, never per (event, window)."""
    import ray.data

    win_us = window_s * 1_000_000
    hop_us = hop_s * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        hi = us // hop_us
        lo = (us - win_us) // hop_us + 1
        counts = (hi - lo + 1).astype(np.int64)
        total = int(counts.sum())
        # exploded window index: lo[i] + 0..counts[i]-1 per event.
        reps = np.repeat(lo, counts)
        offs = np.arange(total) - np.repeat(
            np.cumsum(counts) - counts, counts)
        windows = reps + offs
        keys = pc.take(batch.column(key_col),
                       pa.array(np.repeat(np.arange(len(us)), counts),
                                pa.int64()))
        t = pa.table({"window": pa.array(windows, pa.int64()),
                      key_col: keys})
        agg = pa.TableGroupBy(t, ["window", key_col]).aggregate(
            [([], "count_all")])
        return agg.rename_columns(
            ["n" if c == "count_all" else c for c in agg.column_names])

    partials = events_ds.select_columns(["ts", key_col]).map_batches(
        partial, batch_format="pyarrow")
    merged = partials.groupby(["window", key_col]).aggregate(
        ray.data.aggregate.Sum("n"))
    return merged.map_batches(
        lambda t: t.rename_columns(
            ["n" if c == "sum(n)" else c for c in t.column_names]),
        batch_format="pyarrow")


def sessionize(events_ds, *, gap_s: int = 1800):
    """Per-user session count under a gap threshold: a new session
    starts when the time since the previous event (by (ts, event_id)
    order) exceeds ``gap_s``.  One groupby(user) shuffle; the windowed
    scan inside the group is pure numpy."""

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts_sorted = ts[order]
        gaps = np.diff(ts_sorted)
        n_sessions = 1 + int((gaps > gap_s * 1_000_000).sum())
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "n_events": pa.array([group.num_rows], pa.int64()),
        })

    return events_ds.select_columns(
        ["user_id", "ts", "event_id"]).groupby("user_id").map_groups(
        per_user, batch_format="pyarrow")


def asof_join(left_ds, right_ds, *, left_key: str, right_key: str,
              left_ts: str, right_ts: str, right_value_cols: list[str],
              num_partitions: int = 8):
    """As-of LEFT join: for each left row, the right row with the same
    key and the greatest ``right_ts`` <= ``left_ts`` (nulls when none).

    Expressed Ray-Data-first: tag both sides, union them (schema-
    aligned), ONE ``groupby(key)``, and a per-group merge scan over the
    time-sorted union — the standard distributed as-of strategy (the
    partitioning assumption is per-key group size, as for any
    co-grouped join; a hot key would be range-salted by time).

    The right side must be unique per (key, ts) — pre-reduce it if not
    (ties at equal ts would otherwise be resolved by arrival order,
    which is partitioning-dependent)."""

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {
            "__key": t.column(left_key).cast(pa.int64()),
            "__ts": t.column(left_ts).cast(pa.int64()),
            "__side": pa.array([0] * t.num_rows, pa.int8()),
        }
        for name in t.column_names:
            cols["l_" + name] = t.column(name)
        for name in right_value_cols:
            cols["r_" + name] = pa.nulls(t.num_rows,
                                         _right_types[name])
        return pa.table(cols)

    right_tbl_schema = right_ds.schema()
    _right_types = {
        name: right_tbl_schema.base_schema.field(name).type
        for name in right_value_cols
    }
    left_schema = left_ds.schema()
    _left_names = list(left_schema.names)
    _left_types = {n: left_schema.base_schema.field(n).type
                   for n in _left_names}

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {
            "__key": t.column(right_key).cast(pa.int64()),
            "__ts": t.column(right_ts).cast(pa.int64()),
            "__side": pa.array([1] * t.num_rows, pa.int8()),
        }
        for name in _left_names:
            cols["l_" + name] = pa.nulls(t.num_rows, _left_types[name])
        for name in right_value_cols:
            cols["r_" + name] = t.column(name)
        return pa.table(cols)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.select_columns(
            list({right_key, right_ts, *right_value_cols})
        ).map_batches(tag_right, batch_format="pyarrow"))

    def merge(group: pa.Table) -> pa.Table:
        # Vectorized as-of merge: sort the right rows once by ts, then
        # one np.searchsorted places every left row against the latest
        # right ts <= its own (side='right' keeps the <= semantics at
        # equal timestamps).  No Python rows.
        ts = group.column("__ts").to_numpy(zero_copy_only=False)
        side = group.column("__side").to_numpy(zero_copy_only=False)
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side == 1)
        cols: dict[str, pa.Array] = {}
        l_take = pa.array(l_idx, pa.int64())
        for n in _left_names:
            cols[n] = pc.take(group.column("l_" + n), l_take)
        if r_idx.size and l_idx.size:
            r_order = np.argsort(ts[r_idx], kind="stable")
            r_sorted_ts = ts[r_idx][r_order]
            pos = np.searchsorted(r_sorted_ts, ts[l_idx], side="right") - 1
            valid = pos >= 0
            src = r_idx[r_order[np.clip(pos, 0, None)]]
            r_take = pa.array(src, pa.int64())
            valid_arr = pa.array(valid)
            for n in right_value_cols:
                taken = pc.take(group.column("r_" + n), r_take)
                cols[n] = pc.if_else(
                    valid_arr, taken, pa.nulls(len(valid), _right_types[n]))
        else:
            for n in right_value_cols:
                cols[n] = pa.nulls(int(l_idx.size), _right_types[n])
        return pa.Table.from_arrays(
            [cols[n] for n in (*_left_names, *right_value_cols)],
            schema=pa.schema(
                [(n, _left_types[n]) for n in _left_names]
                + [(n, _right_types[n]) for n in right_value_cols]))

    return tagged.groupby("__key").map_groups(merge, batch_format="pyarrow")
