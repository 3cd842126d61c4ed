"""Time-window operators over an events Dataset
(``event_id, ts, user_id, event_type, value, props`` — TESTDATA.md):
tumbling-window aggregation, gap-based sessionization, and an as-of
join — the operators SURVEY.md §2 flags as "Ray Data lacks, build as
composition" (custom-operator rows of the brief).

All three follow the same shape: derive the partition key in a
``map_batches`` (vectorized), then ONE ``groupby(key)`` with the
order-sensitive logic inside ``map_groups`` (sort within group —
partitioning assumption: a group fits in a task, which holds for
per-user/per-window slices of even very large event streams).  For
keys too hot for that assumption, :func:`sessionize` and
:func:`asof_join` take ``salt_range_s``: the group is salt-split by
coarse time range and merged exactly (algebraic session partials /
carry rows), bounding every task at the price of one extra narrow
shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["tumbling_window", "hopping_window", "sessionize", "asof_join",
           "interval_join", "running_total", "lag_delta", "moving_agg",
           "lead_delta", "resample", "transition_counts",
           "session_bounds", "trailing_window_distinct", "ewma",
           "lag_values", "moving_zscore", "state_intervals",
           "overlap_join"]


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


def _pack_lut(k: np.ndarray, s: np.ndarray, vals: np.ndarray):
    """(key, salt) -> value lookup table as ZERO-COPY numpy arrays:
    ``pack = key * M + (salt - s_min)`` with ``M`` the salt range,
    sorted by the packed key.  Packed-array broadcast matters: a
    multi-million-entry python dict costs seconds PER ``ray.get``
    deserialization, while plasma-backed numpy arrays are zero-copy.
    Falls back to the dict when packing would overflow int64."""
    if len(k) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64), 1, 0)
    s_min = int(s.min())
    m = int(s.max()) - s_min + 1
    if int(np.abs(k).max()) < (2 ** 62) // m:
        packed = k.astype(np.int64) * m + (s.astype(np.int64) - s_min)
        order = np.argsort(packed)  # == lexsort by (key, salt)
        return (packed[order], vals[order].astype(np.int64), m, s_min)
    return {(int(a), int(b)): int(v) for a, b, v in zip(k, s, vals)}


def _lut_lookup(lut, run_k: np.ndarray,
                run_s: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (value, found) lookup against a :func:`_pack_lut`
    table (python-dict fallback loops)."""
    if isinstance(lut, dict):
        vals = np.zeros(len(run_k), np.int64)
        found = np.zeros(len(run_k), np.bool_)
        for i, (a, b) in enumerate(zip(run_k, run_s)):
            v = lut.get((int(a), int(b)))
            if v is not None:
                vals[i] = v
                found[i] = True
        return vals, found
    packed, table_vals, m, s_min = lut
    if len(packed) == 0:
        return (np.zeros(len(run_k), np.int64),
                np.zeros(len(run_k), np.bool_))
    # a salt OUTSIDE the table's [s_min, s_min + m) range would alias
    # into a neighboring key's packed slot: reject it up front (it is
    # a genuine miss — e.g. a key's globally-first time range).
    s_rel = run_s.astype(np.int64) - s_min
    in_range = (s_rel >= 0) & (s_rel < m)
    want = run_k.astype(np.int64) * m + np.where(in_range, s_rel, 0)
    pos = np.searchsorted(packed, want).clip(0, len(packed) - 1)
    found = in_range & (packed[pos] == want)
    return np.where(found, table_vals[pos], 0), found


class _RunningFixup:
    """Actor-pool stage for :func:`running_total`'s salted path: the
    per-(key, range) offset table is fetched ONCE per actor
    (``ray.get`` of a multi-million-entry dict per TASK measured
    7,368 core-s at 10M rows — the classic broadcast-deserialization
    trap the actor-pool pattern exists for)."""

    def __init__(self, lut_ref, id_col: str):
        import ray

        self.lut = ray.get(lut_ref)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # schemaless empty map_groups blocks
            return pa.table({self.id_col: pa.array([], pa.int64()),
                             "running": pa.array([], pa.int64())})
        bk = batch.column("__key").to_numpy(zero_copy_only=False)
        bs = batch.column("__salt").to_numpy(zero_copy_only=False)
        # segments are contiguous runs after the partition scan; look
        # up each RUN's offset once, assign vectorized per run.
        starts = np.flatnonzero(np.concatenate(
            ([True], (bk[1:] != bk[:-1]) | (bs[1:] != bs[:-1]))))
        lens = np.diff(np.append(starts, len(bk)))
        off_runs, _ = _lut_lookup(self.lut, bk[starts], bs[starts])
        add = np.repeat(off_runs, lens)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "running": pa.array(
                batch.column("__local").to_numpy(zero_copy_only=False)
                + add, pa.int64()),
        })


class _LagFixup:
    """Actor-pool stage for :func:`lag_delta`'s salted path — same
    fetch-once rationale as :class:`_RunningFixup`; a lookup MISS
    marks the key's globally-first range (gap stays NULL)."""

    def __init__(self, lut_ref, id_col: str):
        import ray

        self.lut = ray.get(lut_ref)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({self.id_col: pa.array([], pa.int64()),
                             "gap_us": pa.array([], pa.int64())})
        bk = batch.column("__key").to_numpy(zero_copy_only=False)
        bs = batch.column("__salt").to_numpy(zero_copy_only=False)
        gap = batch.column("__gap").to_numpy(
            zero_copy_only=False).copy()
        first = batch.column("__first").to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(first)
        vals, found = _lut_lookup(self.lut, bk[idx], bs[idx])
        gap[idx[found]] = vals[found]
        null_mask = np.zeros(len(gap), np.bool_)
        null_mask[idx[~found]] = True  # key's global first row
        out = pa.array(gap.astype(np.int64), pa.int64())
        if null_mask.any():
            out = pc.if_else(pa.array(null_mask),
                             pa.nulls(len(gap), pa.int64()), out)
        return pa.table({self.id_col: batch.column(self.id_col),
                         "gap_us": out})


def _segmented_cumsum(vals: np.ndarray,
                      starts: np.ndarray) -> np.ndarray:
    """Per-segment cumulative sum over a segment-sorted array:
    ``starts`` are the 0-based first indices of each segment."""
    c = np.cumsum(vals)
    seg_lens = np.diff(np.append(starts, len(vals)))
    prev = np.concatenate(([0], c[starts[1:] - 1]))
    return c - np.repeat(prev, seg_lens)


def _segmented_last_index(flag: np.ndarray,
                          run_id: np.ndarray) -> np.ndarray:
    """For each position ``i`` (array order), the largest ``j <= i``
    with ``flag[j]`` True and ``run_id[j] == run_id[i]``; -1 when the
    current run has no earlier flagged row.  ``run_id`` must be
    nondecreasing (i.e. the array is segment-sorted).  One vectorized
    pass: encode ``run*(n+1) + (pos+1 if flag else 0)``, global
    ``np.maximum.accumulate``, decode — a later run's base exceeds any
    earlier run's encoded value, so the cummax never leaks a match
    across run boundaries."""
    n = len(flag)
    pos1 = np.where(flag, np.arange(1, n + 1, dtype=np.int64),
                    np.int64(0))
    base = run_id.astype(np.int64) * np.int64(n + 1)
    return np.maximum.accumulate(base + pos1) - base - 1


def running_total(events_ds, *, key_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  value_col: str = "value", scale: int = 100,
                  salt_range_s: int | None = None,
                  num_partitions: int = 64,
                  fixup_mode: str = "auto",
                  broadcast_segments_limit: int = 2_000_000):
    """Per-key cumulative sum ordered by ``(ts, id)`` — the ordered
    window aggregate ``SUM(v) OVER (PARTITION BY key ORDER BY ts, id)``
    Ray Data has no operator for.  Returns ``(id, running)`` rows.

    Values are integer-scaled (``round(v * scale)`` as int64) before
    summing, so partial sums are exact and associative — the salted
    two-phase path below and any SQL engine's segment-tree windowed
    SUM produce bit-identical results, which float accumulation order
    would not guarantee.

    Both paths use the salted RUN-SCAN shape, never a per-(key[,salt])
    ``map_groups``: a ``groupby([key, salt])`` costs one Python call
    per distinct group, and at 10M rows x 100k keys x 90 time ranges
    that is millions of singleton groups (measured: 679 s; the
    run-scan rewrite below is ~20x faster).  Keys are hashed into
    ``num_partitions`` coarse partitions (a (key, salt) run never
    straddles two), ONE groupby on the partition id, then one lexsort
    + segmented ``np.cumsum`` per partition.

    Default path: partition = hash(key) — every key's rows land in
    one task (the groupby(key) partitioning assumption, minus the
    per-group Python calls).  ``salt_range_s`` is the hot-key path:
    partition = hash(key, ts//range), each (key, range) segment gets
    its LOCAL cumsums, and per-(key, range) OFFSETS (exclusive prefix
    of range totals per key) fix up every event in one vectorized
    pass.  Two offset plans, selected by ``fixup_mode``:

    - ``broadcast`` — fold the (key, range, total) rows into a packed
      numpy LUT on the driver, ``ray.put`` once, fetch once per actor
      (:class:`_RunningFixup`).  Zero extra shuffles; right when the
      salt exists for a FEW hot keys (segments ≈ hot keys x ranges).
    - ``join`` — the many-keys-many-ranges path (salting EVERY key at
      10^7+ keys x ranges makes the driver fold itself the
      bottleneck): offsets compute distributed (run-scan over the
      totals rows partitioned by key hash) and attach to the partials
      with a (key, range)-co-partitioned run-scan join.  One extra
      narrow shuffle of the partials; nothing folds on the driver.
    - ``auto`` (default) — one ``count()`` of the materialized totals
      rows picks: broadcast iff <= ``broadcast_segments_limit``.

    Both plans are bit-identical (integer partials; equivalence is
    test-verified).
    """
    cols = [key_col, ts_col, id_col, value_col]
    from torray.ops.dedup import _mix64

    range_us = None if salt_range_s is None else salt_range_s * 1_000_000

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            out = {c: pa.array([], pa.int64()) for c in
                   cols + ["__salt", "__part"]}
            return pa.table(out)
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        if range_us is None:
            salt = np.zeros(len(k), np.int64)
        else:
            epoch = batch.column(ts_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            salt = (epoch // range_us).astype(np.int64)
        part = ((_mix64(k.astype(np.int64))
                 ^ _mix64(~salt)) % np.uint64(num_partitions)).astype(
            np.int64)
        out = {c: batch.column(c) for c in cols}
        out["__salt"] = pa.array(salt, pa.int64())
        out["__part"] = pa.array(part, pa.int64())
        return pa.table(out)

    def scan_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "__key": pa.array([], pa.int64()),
                          "__salt": pa.array([], pa.int64()),
                          "__local": pa.array([], pa.int64()),
                          "__pos": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        s = group.column("__salt").to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        v = group.column(value_col).to_numpy(zero_copy_only=False)
        prod = np.asarray(v, np.float64) * scale
        # half AWAY from zero, matching SQL round(); np.round's
        # banker's rounding would diverge on exact-.5 products.
        scaled = np.copysign(np.floor(np.abs(prod) + 0.5),
                             prod).astype(np.int64)
        order = np.lexsort((ids, ts, s, k))
        k, s, ids, scaled = k[order], s[order], ids[order], scaled[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], (k[1:] != k[:-1]) | (s[1:] != s[:-1]))))
        cum = _segmented_cumsum(scaled, starts)
        # __pos = 0-based position inside the (key, salt) segment —
        # carried so the range-total fold below can identify a
        # segment's true LAST row even if dynamic block splitting
        # scatters the segment across blocks in any order (cumsums are
        # not monotone with negative values, so max(__local) is no
        # substitute).
        seg_lens = np.diff(np.append(starts, len(k)))
        pos = np.arange(len(k), dtype=np.int64) - np.repeat(starts,
                                                            seg_lens)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "__key": pa.array(k, pa.int64()),
            "__salt": pa.array(s, pa.int64()),
            "__local": pa.array(cum, pa.int64()),
            "__pos": pa.array(pos, pa.int64()),
        })

    narrow = events_ds.select_columns(cols)
    partials = (narrow.map_batches(tag, batch_format="pyarrow")
                .groupby("__part")
                .map_groups(scan_partition, batch_format="pyarrow"))
    if range_us is None:
        # single segment per key: the local cumsum IS the answer
        return partials.map_batches(
            lambda t: (t.select([id_col, "__local"])
                       .rename_columns([id_col, "running"])
                       if t.num_rows else
                       pa.table({id_col: pa.array([], pa.int64()),
                                 "running": pa.array([], pa.int64())})),
            batch_format="pyarrow")

    import ray

    partials = partials.materialize()

    # Range totals = each (key, salt) segment's LAST local cumsum; a
    # (key, salt, total) row per segment — bounded by keys x ranges,
    # the hot-key regime's small side.
    def totals(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # schemaless empty map_groups blocks
            return pa.table({"k": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64())})
        k = t.column("__key").to_numpy(zero_copy_only=False)
        s = t.column("__salt").to_numpy(zero_copy_only=False)
        c = t.column("__local").to_numpy(zero_copy_only=False)
        p = t.column("__pos").to_numpy(zero_copy_only=False)
        # Keep this block's MAX-__pos row per (key, salt) — position
        # is intrinsic to the row, so the fold is independent of any
        # block/row ordering the executor produces.
        order = np.lexsort((p, s, k))
        k, s, c, p = k[order], s[order], c[order], p[order]
        last = np.concatenate(
            (np.flatnonzero((k[1:] != k[:-1]) | (s[1:] != s[:-1])),
             [len(k) - 1]))
        return pa.table({"k": pa.array(k[last], pa.int64()),
                         "s": pa.array(s[last], pa.int64()),
                         "t": pa.array(c[last], pa.int64()),
                         "p": pa.array(p[last], pa.int64())})

    totals_ds = partials.map_batches(
        totals, batch_format="pyarrow").materialize()
    if fixup_mode == "auto":
        fixup_mode = ("broadcast"
                      if totals_ds.count() <= broadcast_segments_limit
                      else "join")
    if fixup_mode == "join":
        return _running_join_fixup(partials, totals_ds, id_col,
                                   num_partitions)
    if fixup_mode != "broadcast":
        raise ValueError(f"unknown fixup_mode {fixup_mode!r}")

    tot_tables = [t for t in ray.get(totals_ds.to_arrow_refs())
                  if t.num_rows]
    if tot_tables:
        tot = pa.concat_tables(tot_tables)
        tk = tot.column("k").to_numpy(zero_copy_only=False)
        ts_ = tot.column("s").to_numpy(zero_copy_only=False)
        tt = tot.column("t").to_numpy(zero_copy_only=False)
        tp = tot.column("p").to_numpy(zero_copy_only=False)
    else:  # empty input
        tk = ts_ = tt = tp = np.empty(0, np.int64)
    # A huge (key, range) segment's output may be SPLIT across blocks
    # by dynamic block splitting, yielding several candidate "last
    # rows"; the true range total is the one with the MAX in-segment
    # position (__pos), an order-independent criterion.
    order = np.lexsort((tp, ts_, tk))
    tk, ts_, tt = tk[order], ts_[order], tt[order]
    last = np.concatenate(
        (np.flatnonzero((tk[1:] != tk[:-1]) | (ts_[1:] != ts_[:-1])),
         [len(tk) - 1])) if len(tk) else np.empty(0, np.int64)
    tk, ts_, tt = tk[last], ts_[last], tt[last]
    # Exclusive prefix sum of range totals per key = the offset every
    # event in that (key, range) segment needs — all numpy (the 10M-row
    # probe measured the per-entry Python dict build as a driver
    # bottleneck at millions of segments).
    key_starts = np.flatnonzero(np.concatenate(
        ([True], tk[1:] != tk[:-1]))) if len(tk) else np.empty(0, np.int64)
    offsets = (_segmented_cumsum(tt, key_starts) - tt) if len(tk) \
        else np.empty(0, np.int64)
    lut_ref = ray.put(_pack_lut(tk, ts_, offsets))
    return partials.map_batches(
        _RunningFixup,
        fn_constructor_kwargs={"lut_ref": lut_ref, "id_col": id_col},
        batch_format="pyarrow", concurrency=(1, 8))


def _running_join_fixup(partials, totals_ds, id_col: str,
                        num_partitions: int):
    """Distributed offset attach for :func:`running_total`'s salted
    path (``fixup_mode='join'``): per-(key, range) offsets compute as
    a run-scan over the totals rows partitioned by key hash, then join
    onto the partials with a (key, range)-co-partitioned run-scan —
    nothing folds on the driver (at 10^7 segments the broadcast plan's
    driver fold + ~100MB+ LUT put IS the bottleneck)."""
    from torray.ops.dedup import _mix64

    npart = np.uint64(num_partitions)

    def tag_tot(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        k = t.column("k").to_numpy(zero_copy_only=False)
        part = (_mix64(k) % npart).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    def offsets_partition(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "off": pa.array([], pa.int64())})
        k = g.column("k").to_numpy(zero_copy_only=False)
        s = g.column("s").to_numpy(zero_copy_only=False)
        t = g.column("t").to_numpy(zero_copy_only=False)
        p = g.column("p").to_numpy(zero_copy_only=False)
        # per (key, salt): keep the MAX-__pos candidate (split blocks
        # emit several); then per key: exclusive prefix of totals
        order = np.lexsort((p, s, k))
        k, s, t = k[order], s[order], t[order]
        last = np.concatenate(
            (np.flatnonzero((k[1:] != k[:-1]) | (s[1:] != s[:-1])),
             [len(k) - 1]))
        k, s, t = k[last], s[last], t[last]
        key_starts = np.flatnonzero(np.concatenate(
            ([True], k[1:] != k[:-1])))
        off = _segmented_cumsum(t, key_starts) - t
        return pa.table({"k": pa.array(k, pa.int64()),
                         "s": pa.array(s, pa.int64()),
                         "off": pa.array(off, pa.int64())})

    offsets_ds = (totals_ds.map_batches(tag_tot, batch_format="pyarrow")
                  .groupby("__part")
                  .map_groups(offsets_partition, batch_format="pyarrow"))

    join_schema = pa.schema([
        (id_col, pa.int64()), ("__key", pa.int64()),
        ("__salt", pa.int64()), ("__local", pa.int64()),
        ("__off", pa.int64()), ("__side", pa.int8()),
        ("__jpart", pa.int64()),
    ])

    def _jpart(k: np.ndarray, s: np.ndarray) -> np.ndarray:
        return ((_mix64(k) ^ _mix64(~s)) % npart).astype(np.int64)

    def tag_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return join_schema.empty_table()
        k = t.column("__key").to_numpy(zero_copy_only=False)
        s = t.column("__salt").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table({
            id_col: t.column(id_col),
            "__key": t.column("__key"),
            "__salt": t.column("__salt"),
            "__local": t.column("__local"),
            "__off": pa.nulls(n, pa.int64()),
            "__side": pa.array(np.ones(n, np.int8), pa.int8()),
            "__jpart": pa.array(_jpart(k, s), pa.int64()),
        }).cast(join_schema)

    def tag_offsets(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return join_schema.empty_table()
        k = t.column("k").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table({
            id_col: pa.nulls(n, pa.int64()),
            "__key": t.column("k"),
            "__salt": t.column("s"),
            "__local": pa.nulls(n, pa.int64()),
            "__off": t.column("off"),
            "__side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "__jpart": pa.array(_jpart(k, s), pa.int64()),
        }).cast(join_schema)

    def attach_partition(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "running": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        k = g.column("__key").to_numpy(zero_copy_only=False)
        s = g.column("__salt").to_numpy(zero_copy_only=False)
        side = g.column("__side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, s, k))
        ks, ss, sides = k[order], s[order], side[order]
        run_id = np.cumsum(np.concatenate(
            ([True], (ks[1:] != ks[:-1]) | (ss[1:] != ss[:-1])))) - 1
        last_off = _segmented_last_index(sides == 0, run_id)
        ppos = np.flatnonzero(sides == 1)
        if ppos.size == 0:
            return empty
        match = last_off[ppos]
        offv = pc.fill_null(g.column("__off"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # every (key, range) segment has a totals row, so a miss can
        # only mean zero offset (the key's first range)
        add = np.where(match >= 0,
                       offv[order[np.clip(match, 0, None)]], 0)
        take = pa.array(order[ppos], pa.int64())
        local = pc.fill_null(g.column("__local"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)[order[ppos]]
        return pa.table({
            id_col: pc.take(g.column(id_col), take),
            "running": pa.array(local + add, pa.int64()),
        })

    tagged = (partials.map_batches(tag_partials, batch_format="pyarrow")
              .union(offsets_ds.map_batches(tag_offsets,
                                            batch_format="pyarrow")))
    return (tagged.groupby("__jpart")
            .map_groups(attach_partition, batch_format="pyarrow"))


def lag_delta(events_ds, *, key_col: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id",
              salt_range_s: int | None = None,
              num_partitions: int = 64,
              fixup_mode: str = "auto",
              broadcast_segments_limit: int = 2_000_000):
    """Per-key LAG: each row's microsecond gap to the key's previous
    row in ``(ts, id)`` order (NULL for the key's first row) —
    ``epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY key ORDER BY
    ts, id)``.  Returns ``(id, gap_us)``.

    Same partition run-scan shape as :func:`running_total` (one
    groupby on a hashed partition id, lexsort + segmented ``np.diff``
    per partition — never a Python call per key).  ``salt_range_s``
    is the hot-key path: partials compute their internal gaps and
    report boundary (first_ts, last_ts) rows; consecutive ranges
    stitch (monotone timeline, same argument as :func:`sessionize`)
    into a fix-up that assigns each range's FIRST row its
    cross-boundary gap — every other row's gap is already local.
    ``fixup_mode`` selects broadcast-LUT vs distributed join exactly
    as in :func:`running_total` (``auto`` picks by segment count vs
    ``broadcast_segments_limit``); plans are bit-identical
    (test-verified)."""
    from torray.ops.dedup import _mix64

    cols = [key_col, ts_col, id_col]
    range_us = None if salt_range_s is None else salt_range_s * 1_000_000

    def tag(batch: pa.Table) -> pa.Table:
        # zero-row batches flow through the generic path (see
        # moving_agg's tag) so the emitted schema is block-invariant
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        if range_us is None:
            salt = np.zeros(len(k), np.int64)
        else:
            epoch = batch.column(ts_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            salt = (epoch // range_us).astype(np.int64)
        part = ((_mix64(k.astype(np.int64))
                 ^ _mix64(~salt)) % np.uint64(num_partitions)).astype(
            np.int64)
        out = {c: batch.column(c) for c in cols}
        out["__salt"] = pa.array(salt, pa.int64())
        out["__part"] = pa.array(part, pa.int64())
        return pa.table(out)

    def scan_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "__key": pa.array([], pa.int64()),
                          "__salt": pa.array([], pa.int64()),
                          "__gap": pa.array([], pa.int64()),
                          "__first": pa.array([], pa.bool_()),
                          "__ts": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        s = group.column("__salt").to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, s, k))
        k, s, ts, ids = k[order], s[order], ts[order], ids[order]
        first = np.concatenate(
            ([True], (k[1:] != k[:-1]) | (s[1:] != s[:-1])))
        gaps = np.zeros(len(ts), np.int64)
        gaps[1:] = np.diff(ts)
        gaps[first] = 0
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "__key": pa.array(k, pa.int64()),
            "__salt": pa.array(s, pa.int64()),
            "__gap": pa.array(gaps, pa.int64()),
            "__first": pa.array(first, pa.bool_()),
            "__ts": pa.array(ts, pa.int64()),
        })

    narrow = events_ds.select_columns(cols)
    partials = (narrow.map_batches(tag, batch_format="pyarrow")
                .groupby("__part")
                .map_groups(scan_partition, batch_format="pyarrow"))

    if range_us is None:
        def plain(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "gap_us": pa.array([], pa.int64())})
            gaps = t.column("__gap").to_numpy(zero_copy_only=False)
            first = t.column("__first").to_numpy(zero_copy_only=False)
            arr = pc.if_else(pa.array(first),
                             pa.nulls(len(gaps), pa.int64()),
                             pa.array(gaps, pa.int64()))
            return pa.table({id_col: t.column(id_col), "gap_us": arr})

        return partials.map_batches(plain, batch_format="pyarrow")

    import ray

    partials = partials.materialize()

    def bounds(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "first_ts": pa.array([], pa.int64()),
                             "last_ts": pa.array([], pa.int64())})
        k = t.column("__key").to_numpy(zero_copy_only=False)
        s = t.column("__salt").to_numpy(zero_copy_only=False)
        ts = t.column("__ts").to_numpy(zero_copy_only=False)
        run = np.concatenate(
            (np.flatnonzero((k[1:] != k[:-1]) | (s[1:] != s[:-1])) + 1,
             [len(k)]))
        starts = np.concatenate(([0], run[:-1]))
        lasts = run - 1
        return pa.table({"k": pa.array(k[starts], pa.int64()),
                         "s": pa.array(s[starts], pa.int64()),
                         "first_ts": pa.array(ts[starts], pa.int64()),
                         "last_ts": pa.array(ts[lasts], pa.int64())})

    # Per-(key, range) boundary rows; blocks may split a segment, so
    # fold duplicates keeping min(first_ts) / max(last_ts) (timestamps
    # inside one segment are sorted, so these are exact).  All numpy —
    # per-entry python folds are a driver bottleneck at millions of
    # segments.
    bounds_ds = partials.map_batches(
        bounds, batch_format="pyarrow").materialize()
    if fixup_mode == "auto":
        fixup_mode = ("broadcast"
                      if bounds_ds.count() <= broadcast_segments_limit
                      else "join")
    if fixup_mode == "join":
        return _lag_join_fixup(partials, bounds_ds, id_col,
                               num_partitions)
    if fixup_mode != "broadcast":
        raise ValueError(f"unknown fixup_mode {fixup_mode!r}")

    bt_tables = [t for t in ray.get(bounds_ds.to_arrow_refs())
                 if t.num_rows]
    if bt_tables:
        bt = pa.concat_tables(bt_tables)
        bk_ = bt.column("k").to_numpy(zero_copy_only=False)
        bs_ = bt.column("s").to_numpy(zero_copy_only=False)
        bf = bt.column("first_ts").to_numpy(zero_copy_only=False)
        bl = bt.column("last_ts").to_numpy(zero_copy_only=False)
    else:  # empty input
        bk_ = bs_ = bf = bl = np.empty(0, np.int64)
    order = np.lexsort((bs_, bk_))
    bk_, bs_, bf, bl = bk_[order], bs_[order], bf[order], bl[order]
    if len(bk_):
        starts = np.flatnonzero(np.concatenate(
            ([True], (bk_[1:] != bk_[:-1]) | (bs_[1:] != bs_[:-1]))))
        first_min = np.minimum.reduceat(bf, starts)
        last_max = np.maximum.reduceat(bl, starts)
        kk, ss = bk_[starts], bs_[starts]
        # each NON-first range's first-row gap = its first_ts minus
        # the key's previous non-empty range's last_ts
        not_first = np.concatenate(([False], kk[1:] == kk[:-1]))
        gaps = np.empty(len(kk), np.int64)
        gaps[not_first] = (first_min[not_first]
                           - last_max[np.flatnonzero(not_first) - 1])
        lut_ref = ray.put(_pack_lut(kk[not_first], ss[not_first],
                                    gaps[not_first]))
    else:
        lut_ref = ray.put(_pack_lut(np.empty(0, np.int64),
                                    np.empty(0, np.int64),
                                    np.empty(0, np.int64)))
    return partials.map_batches(
        _LagFixup,
        fn_constructor_kwargs={"lut_ref": lut_ref, "id_col": id_col},
        batch_format="pyarrow", concurrency=(1, 8))


def _lag_join_fixup(partials, bounds_ds, id_col: str,
                    num_partitions: int):
    """Distributed cross-boundary-gap attach for :func:`lag_delta`'s
    salted path (``fixup_mode='join'``) — the lag analogue of
    :func:`_running_join_fixup`: per-(key, range) boundary gaps
    compute as a run-scan over the bounds rows partitioned by key
    hash (a key's FIRST range emits no row — its first event's gap is
    NULL), then attach to each segment's first row with a (key,
    range)-co-partitioned run-scan join."""
    from torray.ops.dedup import _mix64

    npart = np.uint64(num_partitions)

    def tag_bounds(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "first_ts": pa.array([], pa.int64()),
                             "last_ts": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        k = t.column("k").to_numpy(zero_copy_only=False)
        part = (_mix64(k) % npart).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    def gaps_partition(g: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64()),
                          "gap": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        k = g.column("k").to_numpy(zero_copy_only=False)
        s = g.column("s").to_numpy(zero_copy_only=False)
        bf = g.column("first_ts").to_numpy(zero_copy_only=False)
        bl = g.column("last_ts").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, k))
        k, s, bf, bl = k[order], s[order], bf[order], bl[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], (k[1:] != k[:-1]) | (s[1:] != s[:-1]))))
        first_min = np.minimum.reduceat(bf, starts)
        last_max = np.maximum.reduceat(bl, starts)
        kk, ss = k[starts], s[starts]
        not_first = np.concatenate(([False], kk[1:] == kk[:-1]))
        if not not_first.any():
            return empty
        gaps = (first_min[not_first]
                - last_max[np.flatnonzero(not_first) - 1])
        return pa.table({"k": pa.array(kk[not_first], pa.int64()),
                         "s": pa.array(ss[not_first], pa.int64()),
                         "gap": pa.array(gaps, pa.int64())})

    gaps_ds = (bounds_ds.map_batches(tag_bounds, batch_format="pyarrow")
               .groupby("__part")
               .map_groups(gaps_partition, batch_format="pyarrow"))

    join_schema = pa.schema([
        (id_col, pa.int64()), ("__key", pa.int64()),
        ("__salt", pa.int64()), ("__gap", pa.int64()),
        ("__first", pa.bool_()), ("__bgap", pa.int64()),
        ("__side", pa.int8()), ("__jpart", pa.int64()),
    ])

    def _jpart(k: np.ndarray, s: np.ndarray) -> np.ndarray:
        return ((_mix64(k) ^ _mix64(~s)) % npart).astype(np.int64)

    def tag_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return join_schema.empty_table()
        k = t.column("__key").to_numpy(zero_copy_only=False)
        s = t.column("__salt").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table({
            id_col: t.column(id_col),
            "__key": t.column("__key"),
            "__salt": t.column("__salt"),
            "__gap": t.column("__gap"),
            "__first": t.column("__first"),
            "__bgap": pa.nulls(n, pa.int64()),
            "__side": pa.array(np.ones(n, np.int8), pa.int8()),
            "__jpart": pa.array(_jpart(k, s), pa.int64()),
        }).cast(join_schema)

    def tag_gaps(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return join_schema.empty_table()
        k = t.column("k").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table({
            id_col: pa.nulls(n, pa.int64()),
            "__key": t.column("k"),
            "__salt": t.column("s"),
            "__gap": pa.nulls(n, pa.int64()),
            "__first": pa.nulls(n, pa.bool_()),
            "__bgap": t.column("gap"),
            "__side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "__jpart": pa.array(_jpart(k, s), pa.int64()),
        }).cast(join_schema)

    def attach_partition(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "gap_us": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        k = g.column("__key").to_numpy(zero_copy_only=False)
        s = g.column("__salt").to_numpy(zero_copy_only=False)
        side = g.column("__side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, s, k))
        ks, ss, sides = k[order], s[order], side[order]
        run_id = np.cumsum(np.concatenate(
            ([True], (ks[1:] != ks[:-1]) | (ss[1:] != ss[:-1])))) - 1
        last_gap = _segmented_last_index(sides == 0, run_id)
        ppos = np.flatnonzero(sides == 1)
        if ppos.size == 0:
            return empty
        match = last_gap[ppos]
        bgap = pc.fill_null(g.column("__bgap"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        take = order[ppos]
        gap = pc.fill_null(g.column("__gap"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)[take].copy()
        first = g.column("__first").to_numpy(
            zero_copy_only=False)[take].astype(bool)
        found = (match >= 0) & first
        gap[found] = bgap[order[np.clip(match, 0, None)]][found]
        # a first row with NO gap row is the key's globally-first
        # range: gap stays NULL
        null_mask = first & (match < 0)
        out = pa.array(gap, pa.int64())
        if null_mask.any():
            out = pc.if_else(pa.array(null_mask),
                             pa.nulls(len(gap), pa.int64()), out)
        return pa.table({
            id_col: pc.take(g.column(id_col),
                            pa.array(take, pa.int64())),
            "gap_us": out,
        })

    tagged = (partials.map_batches(tag_partials, batch_format="pyarrow")
              .union(gaps_ds.map_batches(tag_gaps,
                                         batch_format="pyarrow")))
    return (tagged.groupby("__jpart")
            .map_groups(attach_partition, batch_format="pyarrow"))


def _ds_field_type(ds, col: str,
                   default: "pa.DataType" = None) -> "pa.DataType":
    """Arrow type of a Dataset column, robust to pandas-block schemas
    (``base_schema`` is only a ``pa.Schema`` for Arrow blocks; pandas
    object columns report ``object`` and resolve to ``pa.string()``,
    the only object dtype these ops accept).  A DERIVED zero-block
    dataset reports ``schema() is None`` in Ray — ``default``
    (int64 unless overridden) types the op's empty result instead of
    crashing on an attribute of None."""
    sch = ds.schema()
    if sch is None:
        return default if default is not None else pa.int64()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base.field(col).type
    t = dict(zip(sch.names, sch.types)).get(col)
    return t if isinstance(t, pa.DataType) else pa.string()


def _hash_col_np(arr: np.ndarray) -> np.ndarray:
    """uint64 hash of a numpy key column (int-like via splitmix64,
    anything else via the vectorized FNV string fold)."""
    from torray.ops.dedup import _mix64, fnv1a64_strings

    if np.issubdtype(arr.dtype, np.integer):
        return _mix64(arr.astype(np.int64))
    return fnv1a64_strings(pa.array(arr.astype(str)))


def sessionize(events_ds, *, gap_s: int = 1800,
               salt_range_s: int | None = None,
               num_partitions: int = 64):
    """Per-user session count under a gap threshold: a new session
    starts when the time since the previous event (by (ts, event_id)
    order) exceeds ``gap_s``.

    Both paths use the partition RUN-SCAN shape (see
    :func:`running_total`): users are hashed into ``num_partitions``
    coarse partitions, ONE groupby on the partition id, then one
    lexsort + segmented numpy reduction per partition — never a
    Python call per user (a ``groupby(user).map_groups`` costs one
    interpreter call per user; at 10^7 users that overhead dwarfs the
    actual scan — the engine's own analytics_xl probe measured the
    same pathology at 679 s for running_total before this shape).

    ``salt_range_s`` is the hot-key path: rows partition by
    hash(user, ts // range) so one user's data spreads over bounded
    tasks; per-(user, range) session PARTIALS (first_ts, last_ts,
    n_sessions, n_events) are merged algebraically by a second,
    narrow run-scan — two adjacent ranges bridge into one session iff
    the boundary gap <= ``gap_s`` (time ranges partition the timeline
    monotonically, so consecutive non-empty partials are consecutive
    in time and the merge is exact, verified equal to the unsalted
    path by test)."""
    gap_us = gap_s * 1_000_000
    range_us = None if salt_range_s is None else salt_range_s * 1_000_000
    narrow = events_ds.select_columns(["user_id", "ts", "event_id"])

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "ts": pa.array([], pa.int64()),
                             "event_id": pa.array([], pa.int64()),
                             "__salt": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        hu = _hash_col_np(u)
        if range_us is None:
            salt = np.zeros(len(u), np.int64)
            part = (hu % np.uint64(num_partitions)).astype(np.int64)
        else:
            epoch = batch.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            salt = (epoch // range_us).astype(np.int64)
            from torray.ops.dedup import _mix64
            part = ((hu ^ _mix64(~salt))
                    % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts").cast(pa.int64()),
            "event_id": batch.column("event_id"),
            "__salt": pa.array(salt, pa.int64()),
            "__part": pa.array(part, pa.int64()),
        })

    def scan_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "__salt": pa.array([], pa.int64()),
                          "first_ts": pa.array([], pa.int64()),
                          "last_ts": pa.array([], pa.int64()),
                          "n_sessions": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        s = group.column("__salt").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, s, u))
        u, s, ts = u[order], s[order], ts[order]
        new_run = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (s[1:] != s[:-1])))
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(u)))
        ends = starts + lens - 1
        brk = np.zeros(len(u), np.int64)
        brk[1:] = ((ts[1:] - ts[:-1]) > gap_us) & ~new_run[1:]
        n_sessions = 1 + _segmented_cumsum(brk, starts)[ends]
        return pa.table({
            "user_id": pc.take(group.column("user_id"),
                               pa.array(order[starts], pa.int64())),
            "__salt": pa.array(s[starts], pa.int64()),
            "first_ts": pa.array(ts[starts], pa.int64()),
            "last_ts": pa.array(ts[ends], pa.int64()),
            "n_sessions": pa.array(n_sessions, pa.int64()),
            "n_events": pa.array(lens, pa.int64()),
        })

    partials = (narrow.map_batches(tag, batch_format="pyarrow")
                .groupby("__part")
                .map_groups(scan_partition, batch_format="pyarrow"))

    def strip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        return t.select(["user_id", "n_sessions", "n_events"])

    if range_us is None:
        # one run per user: the partial IS the answer
        return partials.map_batches(strip, batch_format="pyarrow")

    # Merge the per-(user, range) partials with a second run-scan
    # (narrow rows: one per non-empty (user, range)).
    def tag_merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "__salt": pa.array([], pa.int64()),
                             "first_ts": pa.array([], pa.int64()),
                             "last_ts": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "__mpart": pa.array([], pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        part = (_hash_col_np(u)
                % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__mpart", pa.array(part, pa.int64()))

    def merge_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "n_sessions": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        s = group.column("__salt").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, u))
        u, s = u[order], s[order]
        first = group.column("first_ts").to_numpy(
            zero_copy_only=False)[order]
        last = group.column("last_ts").to_numpy(
            zero_copy_only=False)[order]
        nse = group.column("n_sessions").to_numpy(
            zero_copy_only=False)[order]
        nev = group.column("n_events").to_numpy(
            zero_copy_only=False)[order]
        new_run = np.concatenate(([True], u[1:] != u[:-1]))
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(u)))
        ends = starts + lens - 1
        # adjacent non-empty ranges of one user bridge iff boundary
        # gap <= gap_us (subtracts one session from the partial sum)
        bridged = np.zeros(len(u), np.int64)
        bridged[1:] = ((first[1:] - last[:-1]) <= gap_us) & ~new_run[1:]
        tot_sess = _segmented_cumsum(nse - bridged, starts)[ends]
        tot_ev = _segmented_cumsum(nev, starts)[ends]
        return pa.table({
            "user_id": pc.take(group.column("user_id"),
                               pa.array(order[starts], pa.int64())),
            "n_sessions": pa.array(tot_sess, pa.int64()),
            "n_events": pa.array(tot_ev, pa.int64()),
        })

    return (partials.map_batches(tag_merge, batch_format="pyarrow")
            .groupby("__mpart")
            .map_groups(merge_partition, batch_format="pyarrow"))


def asof_join(left_ds, right_ds, *, left_key: str, right_key: str,
              left_ts: str, right_ts: str, right_value_cols: list[str],
              num_partitions: int = 64, salt_range_s: int | None = None,
              direction: str = "backward"):
    """As-of LEFT join: for each left row, the right row with the same
    key and the greatest ``right_ts`` <= ``left_ts`` (nulls when none).

    ``direction="forward"`` flips the match to the SMALLEST
    ``right_ts`` >= ``left_ts`` (next-event-after semantics, equality
    inclusive) by negating both timestamp tags — the entire backward
    machinery (run-scan merge, salted carry rows) is reused unchanged,
    since forward-asof on ts is exactly backward-asof on -ts.  Output
    columns (including the left ts) are untouched; only the internal
    ``__ts``/``__salt`` tags negate.

    Expressed Ray-Data-first: tag both sides, union them (schema-
    aligned), then the partition RUN-SCAN shape (see
    :func:`running_total`): (key, range) pairs hash into
    ``num_partitions`` coarse partitions, ONE groupby on the partition
    id, and the merge scan handles EVERY (key, range) run in the
    partition with one lexsort + one segmented last-right-index pass
    (:func:`_segmented_last_index`) — never a Python call per key (a
    ``groupby(key).map_groups`` costs one interpreter call per key; at
    10^7 keys that overhead dwarfs the merge itself, the pathology the
    engine's analytics_xl probe measured at 679 s for running_total).
    The partitioning assumption is per-key group size, as for any
    co-grouped join; ``salt_range_s`` removes even that.

    ``salt_range_s`` is the hot-key path: both sides are additionally
    salted by coarse time range (``salt = ts // salt_range_s``) and the
    merge groups become (key, range) — bounded however hot the key.
    Exactness across range boundaries is restored by CARRY rows: the
    latest right row per (key, range) is reduced first (narrow), and
    for every left-occupied range the latest right from any EARLIER
    range is injected into that range's group with its true timestamp
    (it precedes every left in the range, and loses to any in-range
    right, exactly reproducing the unsalted scan — equivalence is
    test-verified).  Cost: one extra narrow shuffle of per-range
    right maxima and left (key, range) presence.

    The right side must be unique per (key, ts) — pre-reduce it if not
    (ties at equal ts would otherwise be resolved by arrival order,
    which is partitioning-dependent)."""

    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    _sign = -1 if direction == "forward" else 1

    range_us = (salt_range_s * 1_000_000) if salt_range_s else None

    def _salt_of(ts_arr: pa.Array) -> pa.Array:
        if range_us is None:
            return pa.array([0] * len(ts_arr), pa.int64())
        return pc.cast(pc.divide(ts_arr, range_us), pa.int64())

    def tag_left(t: pa.Table) -> pa.Table:
        ts = t.column(left_ts).cast(pa.int64())
        if _sign < 0:
            ts = pc.multiply(ts, pa.scalar(-1, pa.int64()))
        cols = {
            "__key": t.column(left_key).cast(pa.int64()),
            "__ts": ts,
            "__salt": _salt_of(ts),
            "__side": pa.array([0] * t.num_rows, pa.int8()),
        }
        for name in t.column_names:
            cols["l_" + name] = t.column(name)
        for name in right_value_cols:
            cols["r_" + name] = pa.nulls(t.num_rows,
                                         _right_types[name])
        return pa.table(cols)

    # a DERIVED zero-block side reports schema() = None: fall back to
    # no carried columns / int64 so the zero-row plan still builds
    _r_base = getattr(right_ds.schema(), "base_schema", None)
    _right_types = ({n: _r_base.field(n).type for n in right_value_cols}
                    if isinstance(_r_base, pa.Schema)
                    else {n: pa.int64() for n in right_value_cols})
    left_schema = left_ds.schema()
    _l_base = getattr(left_schema, "base_schema", None)
    _left_names = list(left_schema.names) if left_schema is not None else []
    _left_types = ({n: _l_base.field(n).type for n in _left_names}
                   if isinstance(_l_base, pa.Schema)
                   else {n: pa.string() for n in _left_names})

    def _right_rows_table(key_arr, ts_arr, salt_arr, r_cols: dict,
                          n: int) -> pa.Table:
        cols = {
            "__key": key_arr,
            "__ts": ts_arr,
            "__salt": salt_arr,
            "__side": pa.array([1] * n, pa.int8()),
        }
        for name in _left_names:
            cols["l_" + name] = pa.nulls(n, _left_types[name])
        for name in right_value_cols:
            cols["r_" + name] = r_cols[name]
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        ts = t.column(right_ts).cast(pa.int64())
        if _sign < 0:
            ts = pc.multiply(ts, pa.scalar(-1, pa.int64()))
        return _right_rows_table(
            t.column(right_key).cast(pa.int64()), ts, _salt_of(ts),
            {name: t.column(name) for name in right_value_cols},
            t.num_rows)

    right_narrow = right_ds.select_columns(
        list({right_key, right_ts, *right_value_cols}))
    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_narrow.map_batches(tag_right, batch_format="pyarrow"))

    from torray.ops.dedup import _mix64

    def _part_of(k: np.ndarray, s: np.ndarray | None = None) -> np.ndarray:
        h = _mix64(k.astype(np.int64))
        if s is not None:
            h = h ^ _mix64(~s.astype(np.int64))
        return (h % np.uint64(num_partitions)).astype(np.int64)

    def _tagged_empty() -> pa.Table:
        # Fixed-schema empty table: map stages over map_groups output
        # can receive SCHEMALESS 0-row blocks (Ray quirk); guards must
        # emit the full union schema, never echo the empty input.
        cols = {"__key": pa.array([], pa.int64()),
                "__ts": pa.array([], pa.int64()),
                "__salt": pa.array([], pa.int64()),
                "__side": pa.array([], pa.int8())}
        for name in _left_names:
            cols["l_" + name] = pa.array([], _left_types[name])
        for name in right_value_cols:
            cols["r_" + name] = pa.array([], _right_types[name])
        return pa.table(cols)

    if range_us is not None:
        # -- carry rows: exactness across range boundaries ------------
        # (1) Left-occupied (key, range) pairs — narrow presence set,
        # pre-distinct per batch, then a run-scan distinct (one lexsort
        # + run starts per partition; a groupby((key, salt)) aggregate
        # is the measured multi-column-groupby pathology).
        def left_presence(t: pa.Table) -> pa.Table:
            ts = t.column(left_ts).cast(pa.int64())
            if _sign < 0:  # forward mode salts in negated-ts space
                ts = pc.multiply(ts, pa.scalar(-1, pa.int64()))
            nt = pa.table({"__key": t.column(left_key).cast(pa.int64()),
                           "__salt": _salt_of(ts)})
            nt = pa.TableGroupBy(nt, ["__key", "__salt"]).aggregate(
                [([], "count_all")]).select(["__key", "__salt"])
            k = nt.column("__key").to_numpy(zero_copy_only=False)
            s = nt.column("__salt").to_numpy(zero_copy_only=False)
            return nt.append_column(
                "__part", pa.array(_part_of(k, s), pa.int64()))

        def distinct_partition(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return pa.table({"__key": pa.array([], pa.int64()),
                                 "__salt": pa.array([], pa.int64())})
            k = group.column("__key").to_numpy(zero_copy_only=False)
            s = group.column("__salt").to_numpy(zero_copy_only=False)
            order = np.lexsort((s, k))
            ks, ss = k[order], s[order]
            starts = np.flatnonzero(np.concatenate(
                ([True], (ks[1:] != ks[:-1]) | (ss[1:] != ss[:-1]))))
            take = pa.array(np.sort(order[starts]), pa.int64())
            return group.take(take).select(["__key", "__salt"])

        presence = (left_ds.map_batches(left_presence,
                                        batch_format="pyarrow")
                    .groupby("__part")
                    .map_groups(distinct_partition,
                                batch_format="pyarrow"))

        # (2) Latest right row per (key, range) — one narrow run-scan
        # reduce of the right side: lexsort by (key, salt, ts), keep
        # run ENDS (per-range maxima rise monotonically with the range
        # index, so "latest right in any earlier range" is just the
        # highest earlier range's maximum).
        def tag_part_ks(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column("__part",
                                       pa.array([], pa.int64()))
            k = t.column("__key").to_numpy(zero_copy_only=False)
            s = t.column("__salt").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__part", pa.array(_part_of(k, s), pa.int64()))

        def latest_partition(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return _tagged_empty()
            k = group.column("__key").to_numpy(zero_copy_only=False)
            s = group.column("__salt").to_numpy(zero_copy_only=False)
            ts = group.column("__ts").to_numpy(zero_copy_only=False)
            order = np.lexsort((ts, s, k))
            ks, ss = k[order], s[order]
            ends = np.flatnonzero(np.concatenate(
                ((ks[1:] != ks[:-1]) | (ss[1:] != ss[:-1]), [True])))
            take = pa.array(np.sort(order[ends]), pa.int64())
            return group.take(take).drop_columns(["__part"])

        right_latest = (right_narrow.map_batches(
            tag_right, batch_format="pyarrow")
            .map_batches(tag_part_ks, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(latest_partition, batch_format="pyarrow"))

        # (3) Per key: for every left-occupied range, inject the latest
        # right from the nearest earlier range (true timestamp kept —
        # it precedes all lefts in the range and loses to in-range
        # rights, so the merge below needs no special casing).  Run
        # scan: partition by hash(key) alone (the carry decision spans
        # a key's ranges), sort (key, salt, side) so the marker at a
        # range precedes that range's own right, and the segmented
        # last-right index at each marker IS the nearest earlier
        # range's maximum.
        def build_carry_partition(group: pa.Table) -> pa.Table:
            empty = _right_rows_table(
                pa.array([], pa.int64()), pa.array([], pa.int64()),
                pa.array([], pa.int64()),
                {n: pa.array([], _right_types[n])
                 for n in right_value_cols}, 0)
            if group.num_rows == 0:
                return empty
            k = group.column("__key").to_numpy(zero_copy_only=False)
            s = group.column("__salt").to_numpy(zero_copy_only=False)
            side = group.column("__side").to_numpy(zero_copy_only=False)
            order = np.lexsort((side, s, k))
            ks, ss, sides = k[order], s[order], side[order]
            run_id = np.cumsum(np.concatenate(
                ([True], ks[1:] != ks[:-1]))) - 1
            last_r = _segmented_last_index(sides == 1, run_id)
            mpos = np.flatnonzero(sides == 0)
            match = last_r[mpos]
            valid = match >= 0
            src = order[np.clip(match, 0, None)][valid]
            tgt = ss[mpos][valid]
            if src.size == 0:
                return empty
            take = pa.array(src, pa.int64())
            return _right_rows_table(
                pc.take(group.column("__key"), take),
                pc.take(group.column("__ts"), take),
                pa.array(tgt, pa.int64()),
                {n: pc.take(group.column("r_" + n), take)
                 for n in right_value_cols},
                len(src))

        # Presence rows ride as side=0 markers (no payload) so one
        # partition scan sees both; they are consumed by
        # build_carry_partition and never reach the merge.
        def presence_as_marker(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _tagged_empty()
            n = t.num_rows
            cols = {
                "__key": t.column("__key"),
                "__ts": pa.nulls(n, pa.int64()),
                "__salt": t.column("__salt"),
                "__side": pa.array([0] * n, pa.int8()),
            }
            for name in _left_names:
                cols["l_" + name] = pa.nulls(n, _left_types[name])
            for name in right_value_cols:
                cols["r_" + name] = pa.nulls(n, _right_types[name])
            return pa.table(cols)

        def tag_part_k(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _tagged_empty().append_column(
                    "__part", pa.array([], pa.int64()))
            k = t.column("__key").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__part", pa.array(_part_of(k), pa.int64()))

        carry = (presence.map_batches(presence_as_marker,
                                      batch_format="pyarrow")
                 .union(right_latest)
                 .map_batches(tag_part_k, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(build_carry_partition,
                             batch_format="pyarrow"))
        tagged = tagged.union(carry)

    _out_schema = pa.schema(
        [(n, _left_types[n]) for n in _left_names]
        + [(n, _right_types[n]) for n in right_value_cols])

    def merge_partition(group: pa.Table) -> pa.Table:
        # Vectorized as-of merge over EVERY (key, range) run in the
        # partition at once: lexsort by (key, salt, ts, right-first at
        # equal ts — the <= semantics), then one segmented
        # last-right-index pass places every left row against the
        # latest right ts <= its own.  No Python rows, no Python
        # groups.
        if group.num_rows == 0:
            return _out_schema.empty_table()
        k = group.column("__key").to_numpy(zero_copy_only=False)
        s = group.column("__salt").to_numpy(zero_copy_only=False)
        ts = group.column("__ts").to_numpy(zero_copy_only=False)
        side = group.column("__side").to_numpy(zero_copy_only=False)
        order = np.lexsort((1 - side, ts, s, k))
        ks, ss, sides = k[order], s[order], side[order]
        run_id = np.cumsum(np.concatenate(
            ([True], (ks[1:] != ks[:-1]) | (ss[1:] != ss[:-1])))) - 1
        last_r = _segmented_last_index(sides == 1, run_id)
        lpos = np.flatnonzero(sides == 0)
        match = last_r[lpos]
        valid = match >= 0
        cols: dict[str, pa.Array] = {}
        l_take = pa.array(order[lpos], pa.int64())
        for n in _left_names:
            cols[n] = pc.take(group.column("l_" + n), l_take)
        if lpos.size:
            src = order[np.clip(match, 0, None)]
            r_take = pa.array(src, pa.int64())
            valid_arr = pa.array(valid)
            for n in right_value_cols:
                taken = pc.take(group.column("r_" + n), r_take)
                cols[n] = pc.if_else(
                    valid_arr, taken,
                    pa.nulls(len(valid), _right_types[n]))
        else:
            for n in right_value_cols:
                cols[n] = pa.array([], _right_types[n])
        return pa.Table.from_arrays(
            [cols[n] for n in (*_left_names, *right_value_cols)],
            schema=_out_schema)

    # Unsalted mode has a constant __salt of 0, so partitioning on the
    # (key, salt) hash degrades to the key hash in that case.
    def tag_part_merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _tagged_empty().append_column(
                "__part", pa.array([], pa.int64()))
        k = t.column("__key").to_numpy(zero_copy_only=False)
        s = t.column("__salt").to_numpy(zero_copy_only=False)
        return t.append_column(
            "__part", pa.array(_part_of(k, s), pa.int64()))

    return (tagged.map_batches(tag_part_merge, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(merge_partition, batch_format="pyarrow"))


def interval_join(left_ds, right_ds, *, left_ts: str, right_start: str,
                  right_end: str, left_key: str | None = None,
                  right_key: str | None = None,
                  right_value_cols: list[str], bin_s: int | None = None,
                  sub_salt: int = 1, max_group_rows: int | None = None,
                  num_partitions: int = 64):
    """INNER range join: every (left, right) pair with equal keys (when
    given) and ``right_start <= left_ts < right_end``.  The operator
    Ray Data lacks outright ("range join" row of SURVEY.md §2's
    custom-op guidance) — e.g. "attach each event to the order whose
    fulfilment window it fell into".

    Distributed strategy (standard bounded-interval binning): pick a
    time-bin width ``bin_s`` >= the longest right interval.  Each left
    row lands in exactly ONE bin (``ts // bin``); each right interval
    is replicated to every bin it overlaps (<= 2 when the bound
    holds, bounded by interval/bin otherwise).  A matching pair then
    meets in exactly the left row's bin — no cross-bin pairs, no
    dedup pass.  Partition RUN-SCAN shape (see :func:`running_total`):
    (key, bin, sub) triples hash into ``num_partitions`` coarse
    partitions, ONE groupby on the partition id, and pair emission
    handles every run in the partition with one primary lexsort plus
    one merged boundary sort (each right contributes [start) / [end)
    boundaries; a single cumsum turns each boundary into its
    lefts-before-it count) — output-linear, no Python rows, no Python
    call per (key, bin) group.

    ``bin_s=None`` computes max(right_end - right_start) with one
    narrow aggregate pass over the right side.  Partitioning
    assumption: a (key, bin) slice fits in a task — tighten ``bin_s``
    for hot keys (more bins, more right replication, smaller groups).

    HOT-BIN guards, for the one group shape tighter bins cannot fix
    (many lefts AND many rights landing on one (key, bin)):

    - ``sub_salt=S`` splits each group's LEFTS S ways by a timestamp
      hash and replicates the group's rights to all S sub-groups —
      every pair still meets exactly once, so the output is unchanged
      (test-verified) while the widest task shrinks ~S-fold on the
      left side.  Cost: S× right replication inside hot bins only.
    - ``max_group_rows=N`` makes the contract a hard error instead of
      an OOM: any (key, bin, sub) group wider than N rows raises with
      the observed size and the knobs to turn (tighten ``bin_s``,
      raise ``sub_salt``)."""
    us = 1_000_000
    if sub_salt < 1:
        raise ValueError("sub_salt must be >= 1")

    if bin_s is None:
        span = right_ds.map_batches(
            lambda t: pa.table({"span": [
                int(pc.max(pc.subtract(
                    t.column(right_end).cast(pa.int64()),
                    t.column(right_start).cast(pa.int64()))
                ).as_py() or 0) if t.num_rows else 0]}),
            batch_format="pyarrow").max("span")
        bin_us = max(int(span or 0), us)
    else:
        bin_us = bin_s * us

    left_schema = left_ds.schema()
    _l_base = getattr(left_schema, "base_schema", None)
    _left_names = list(left_schema.names) if left_schema is not None else []
    _left_types = ({n: _l_base.field(n).type for n in _left_names}
                   if isinstance(_l_base, pa.Schema)
                   else {n: pa.string() for n in _left_names})
    _r_base = getattr(right_ds.schema(), "base_schema", None)
    _right_types = ({n: _r_base.field(n).type for n in right_value_cols}
                    if isinstance(_r_base, pa.Schema)
                    else {n: pa.int64() for n in right_value_cols})

    def _key_arr(t: pa.Table, col: str | None) -> pa.Array:
        if col is None:
            return pa.array(np.zeros(t.num_rows, np.int64))
        return t.column(col).cast(pa.int64()).combine_chunks()

    from torray.ops.dedup import _mix64

    def tag_left(t: pa.Table) -> pa.Table:
        ts = t.column(left_ts).cast(pa.int64())
        if sub_salt == 1:
            sub = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        else:
            tsn = ts.to_numpy(zero_copy_only=False)
            sub = pa.array(
                (_mix64(tsn) % np.uint64(sub_salt)).astype(np.int64),
                pa.int64())
        cols = {
            "__key": _key_arr(t, left_key),
            "__bin": pc.cast(pc.divide(ts, bin_us), pa.int64()),
            "__sub": sub,
            "__ts": ts,
            "__end": pa.nulls(t.num_rows, pa.int64()),
            "__side": pa.array([0] * t.num_rows, pa.int8()),
        }
        for name in _left_names:
            cols["l_" + name] = t.column(name)
        for name in right_value_cols:
            cols["r_" + name] = pa.nulls(t.num_rows, _right_types[name])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        # Replicate each interval to every bin it overlaps (vectorized:
        # one pass per replication offset; offsets are bounded by the
        # bin_s >= interval-length contract, typically 0 and 1).
        start = t.column(right_start).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        end = t.column(right_end).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        key = _key_arr(t, right_key).to_numpy(zero_copy_only=False)
        b0 = start // bin_us
        # Half-open [start, end): an interval ending exactly on a bin
        # edge does not reach into that bin.
        b1 = np.maximum(b0, (end - 1) // bin_us)
        n_bins = (b1 - b0 + 1).astype(np.int64)
        total = int(n_bins.sum())
        src = np.repeat(np.arange(len(start), dtype=np.int64), n_bins)
        offs = (np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(n_bins) - n_bins, n_bins))
        bins = b0[src] + offs
        if sub_salt > 1:
            # rights go to every left sub-group of their bin — a pair
            # still meets exactly once (the left's sub)
            src = np.repeat(src, sub_salt)
            bins = np.repeat(bins, sub_salt)
            sub = np.tile(np.arange(sub_salt, dtype=np.int64), total)
            total *= sub_salt
        else:
            sub = np.zeros(total, np.int64)
        take = pa.array(src, pa.int64())
        cols = {
            "__key": pa.array(key[src], pa.int64()),
            "__bin": pa.array(bins, pa.int64()),
            "__sub": pa.array(sub, pa.int64()),
            "__ts": pa.array(start[src], pa.int64()),
            "__end": pa.array(end[src], pa.int64()),
            "__side": pa.array(np.ones(total, np.int8)),
        }
        for name in _left_names:
            cols["l_" + name] = pa.nulls(total, _left_types[name])
        for name in right_value_cols:
            cols["r_" + name] = pc.take(t.column(name), take)
        return pa.table(cols)

    right_narrow = right_ds.select_columns(
        list(dict.fromkeys(
            ([right_key] if right_key else [])
            + [right_start, right_end] + right_value_cols)))
    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_narrow.map_batches(tag_right, batch_format="pyarrow"))

    out_schema = pa.schema(
        [(n, _left_types[n]) for n in _left_names]
        + [(n, _right_types[n]) for n in right_value_cols])

    def _iv_tagged_empty() -> pa.Table:
        cols = {"__key": pa.array([], pa.int64()),
                "__bin": pa.array([], pa.int64()),
                "__sub": pa.array([], pa.int64()),
                "__ts": pa.array([], pa.int64()),
                "__end": pa.array([], pa.int64()),
                "__side": pa.array([], pa.int8())}
        for name in _left_names:
            cols["l_" + name] = pa.array([], _left_types[name])
        for name in right_value_cols:
            cols["r_" + name] = pa.array([], _right_types[name])
        return pa.table(cols)

    def tag_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _iv_tagged_empty().append_column(
                "__part", pa.array([], pa.int64()))
        k = t.column("__key").to_numpy(zero_copy_only=False)
        b = t.column("__bin").to_numpy(zero_copy_only=False)
        sb = t.column("__sub").to_numpy(zero_copy_only=False)
        h = _mix64(k) ^ _mix64(~b) ^ _mix64(sb + 0x9E37)
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    def emit_partition(group: pa.Table) -> pa.Table:
        # Pair emission over EVERY (key, bin, sub) run in the
        # partition at once (no Python call per group): primary
        # lexsort puts each run's lefts contiguous and ts-sorted; one
        # merged boundary sort (each right contributes a [start) and
        # an [end) boundary, boundaries before lefts at equal t = the
        # side='left' searchsorted rule) turns every boundary into a
        # lefts-before-it count via one cumsum; pair expansion stays
        # output-linear.
        if group.num_rows == 0:
            return out_schema.empty_table()
        k = group.column("__key").to_numpy(zero_copy_only=False)
        b = group.column("__bin").to_numpy(zero_copy_only=False)
        sb = group.column("__sub").to_numpy(zero_copy_only=False)
        ts = group.column("__ts").to_numpy(zero_copy_only=False)
        side = group.column("__side").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, side, sb, b, k))
        ks, bs, sbs = k[order], b[order], sb[order]
        sides, tss = side[order], ts[order]
        new_run = np.concatenate(
            ([True], (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])
             | (sbs[1:] != sbs[:-1])))
        run_id = np.cumsum(new_run) - 1
        n_runs = int(run_id[-1]) + 1
        if max_group_rows is not None:
            starts = np.flatnonzero(new_run)
            lens = np.diff(np.append(starts, len(ks)))
            if int(lens.max()) > max_group_rows:
                i = int(starts[int(np.argmax(lens))])
                raise ValueError(
                    f"interval_join group (key={ks[i]}, bin={bs[i]}) "
                    f"has {int(lens.max())} rows > max_group_rows="
                    f"{max_group_rows}; tighten bin_s or raise "
                    f"sub_salt")
        is_l = sides == 0
        L_take = order[is_l]
        l_run = run_id[is_l]
        L_ts = tss[is_l]
        r_sorted = np.flatnonzero(~is_l)
        r_orig = order[r_sorted]
        r_run = run_id[r_sorted]
        r_start = tss[r_sorted]
        n_l, n_r = len(L_take), len(r_orig)
        if n_l == 0 or n_r == 0:
            return out_schema.empty_table()
        endv = pc.fill_null(group.column("__end"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        r_end = endv[r_orig]
        run_left_start = np.searchsorted(l_run, np.arange(n_runs))
        ev_run = np.concatenate((l_run, r_run, r_run))
        ev_t = np.concatenate((L_ts, r_start, r_end))
        ev_w = np.concatenate((np.ones(n_l, np.int64),
                               np.zeros(2 * n_r, np.int64)))
        eorder = np.lexsort((ev_w, ev_t, ev_run))
        cum = np.cumsum(ev_w[eorder])
        inv = np.empty(len(eorder), np.int64)
        inv[eorder] = np.arange(len(eorder))
        cnt_at = cum[inv]
        lo = cnt_at[n_l:n_l + n_r] - run_left_start[r_run]
        hi = cnt_at[n_l + n_r:] - run_left_start[r_run]
        counts = (hi - lo).astype(np.int64)
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        r_rep = np.repeat(np.arange(n_r, dtype=np.int64), counts)
        offs = (np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts))
        l_in_L = run_left_start[r_run[r_rep]] + lo[r_rep] + offs
        l_take = pa.array(L_take[l_in_L], pa.int64())
        r_take = pa.array(r_orig[r_rep], pa.int64())
        cols = [pc.take(group.column("l_" + n), l_take)
                for n in _left_names]
        cols += [pc.take(group.column("r_" + n), r_take)
                 for n in right_value_cols]
        return pa.Table.from_arrays(cols, schema=out_schema)

    return (tagged.map_batches(tag_part, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(emit_partition, batch_format="pyarrow"))


def moving_agg(events_ds, *, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               value_col: str = "value", frame: int = 5,
               scale: int = 100, num_partitions: int = 64):
    """Per-key ROWS-frame moving aggregate — ``SUM(v) OVER (PARTITION
    BY key ORDER BY ts, id ROWS BETWEEN frame-1 PRECEDING AND CURRENT
    ROW)`` plus its AVG — the bounded sliding window Ray Data has no
    operator for.  Returns ``(id, mov_sum, mov_avg)``: ``mov_sum`` is
    the exact int64 sum in ``round(v * scale)`` units (associative, so
    any SQL engine's windowed SUM over the same scaled integers is
    bit-identical); ``mov_avg = mov_sum / (scale * cnt)`` as the ONE
    float64 division both engines perform on the same two integers
    (``cnt`` = actual rows in the frame, < ``frame`` near a key's
    start).

    Same partition run-scan shape as :func:`running_total`'s default
    path (hash(key) -> coarse partition, ONE groupby on the partition
    id, lexsort + segmented cumsum per partition — never a Python call
    per key): the frame sum is ``cum[i] - cum[i - frame]`` with the
    subtrahend clamped at the segment start, fully vectorized.
    Partitioning assumption: a key's rows fit in one task (same as any
    co-grouped op).  A ROWS frame only needs ``frame - 1`` carry rows
    across a time split, so a salted hot-key variant is cheap if ever
    needed; at the events-table key cardinality the hash partitioning
    bounds every task already."""
    from torray.ops.dedup import _mix64

    cols = [key_col, ts_col, id_col, value_col]

    def tag(batch: pa.Table) -> pa.Table:
        # zero-row batches flow through the generic path so the
        # emitted schema (ts timestamp, value float, ...) is
        # block-invariant — an all-int64 empty special case would
        # clash with non-empty blocks in the shuffle union
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        part = (_mix64(k.astype(np.int64))
                % np.uint64(num_partitions)).astype(np.int64)
        out = {c: batch.column(c) for c in cols}
        out["__part"] = pa.array(part, pa.int64())
        return pa.table(out)

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "mov_sum": pa.array([], pa.int64()),
                      "mov_avg": pa.array([], pa.float64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        v = group.column(value_col).to_numpy(zero_copy_only=False)
        prod = np.asarray(v, np.float64) * scale
        # half AWAY from zero, matching SQL round() (np.round banks)
        scaled = np.copysign(np.floor(np.abs(prod) + 0.5),
                             prod).astype(np.int64)
        order = np.lexsort((ids, ts, k))
        k, ids, scaled = k[order], ids[order], scaled[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], k[1:] != k[:-1])))
        cum = _segmented_cumsum(scaled, starts)
        seg_lens = np.diff(np.append(starts, len(k)))
        pos = np.arange(len(k), dtype=np.int64) - np.repeat(starts,
                                                            seg_lens)
        sub_idx = np.maximum(np.arange(len(k), dtype=np.int64) - frame,
                             0)
        sub = np.where(pos >= frame, cum[sub_idx], 0)
        mov = cum - sub
        cnt = np.minimum(pos + 1, frame)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "mov_sum": pa.array(mov, pa.int64()),
            "mov_avg": pa.array(mov.astype(np.float64)
                                / (scale * cnt).astype(np.float64),
                                pa.float64()),
        })

    return (events_ds.select_columns(cols)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def lead_delta(events_ds, *, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               num_partitions: int = 64):
    """Per-key LEAD: each row's microsecond gap TO the key's next row
    in ``(ts, id)`` order (NULL for the key's last row) —
    ``lead(epoch_us(ts)) OVER (PARTITION BY key ORDER BY ts, id) -
    epoch_us(ts)``.  Returns ``(id, gap_us)`` — the forward mirror of
    :func:`lag_delta` (idle-time-ahead, time-to-next-event labels).

    Same partition run-scan shape (hash(key) partitions, one lexsort +
    one ``np.diff`` per partition, never a Python call per key).  For
    hot keys, note every gap except a segment's last is local to the
    segment — the salted variant of :func:`lag_delta` stitches the
    mirror-image boundary if ever needed."""
    from torray.ops.dedup import _mix64

    cols = [key_col, ts_col, id_col]

    def tag(batch: pa.Table) -> pa.Table:
        # zero-row batches flow through the generic path so the
        # emitted schema (ts timestamp, value float, ...) is
        # block-invariant — an all-int64 empty special case would
        # clash with non-empty blocks in the shuffle union
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        part = (_mix64(k.astype(np.int64))
                % np.uint64(num_partitions)).astype(np.int64)
        out = {c: batch.column(c) for c in cols}
        out["__part"] = pa.array(part, pa.int64())
        return pa.table(out)

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "gap_us": pa.array([], pa.int64())})
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, k))
        k, ts, ids = k[order], ts[order], ids[order]
        same_next = np.concatenate((k[1:] == k[:-1], [False]))
        gaps = np.empty(len(k), np.int64)
        gaps[:-1] = ts[1:] - ts[:-1]
        gaps[-1] = 0
        arr = pa.array(gaps, pa.int64())
        arr = pc.if_else(pa.array(same_next), arr,
                         pa.nulls(len(k), pa.int64()))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "gap_us": arr})

    return (events_ds.select_columns(cols)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def moving_agg_range(events_ds, *, key_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     value_col: str = "value",
                     range_us: int = 600_000_000, scale: int = 100,
                     num_partitions: int = 64):
    """Per-key TIME-RANGE-frame moving aggregate — ``SUM(v) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN range_us PRECEDING AND
    CURRENT ROW)`` plus its AVG and COUNT — the time-based sliding
    window (RANGE frame) companion to :func:`moving_agg`'s ROWS frame.
    RANGE semantics: the frame holds every row of the key whose ts is
    in ``[ts_i - range_us, ts_i]`` INCLUSIVE — equal-ts peers are all
    in, regardless of tie order, exactly like SQL.  Returns
    ``(id, range_sum, range_avg, range_cnt)``; ``range_sum`` is the
    exact int64 sum in ``round(v * scale)`` units so any SQL engine's
    windowed SUM over the same scaled integers is bit-identical, and
    ``range_avg = range_sum / (scale * cnt)`` is the ONE float64
    division both engines perform on the same two integers.

    Scale shape: the same partition run-scan as :func:`moving_agg`
    (hash(key) -> coarse partition, ONE groupby on the partition id,
    lexsort per partition — never a Python call per key).  The frame
    bounds are found WITHOUT a per-key loop by lifting each key
    segment's timestamps into a disjoint band (``ts_rel + seg_id *
    stride`` with ``stride > ts_span + range_us``) so two global
    ``np.searchsorted`` calls resolve every row's frame start/end at
    once; the frame sum is then a difference of two global cumsum
    reads.  Partitioning assumption: a key's rows fit in one task
    (same contract as every co-grouped op here)."""
    from torray.ops.dedup import _mix64

    cols = [key_col, ts_col, id_col, value_col]

    def tag(batch: pa.Table) -> pa.Table:
        # zero-row batches flow through the generic path so the
        # emitted schema (ts timestamp, value float, ...) is
        # block-invariant — an all-int64 empty special case would
        # clash with non-empty blocks in the shuffle union
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        part = (_mix64(k.astype(np.int64))
                % np.uint64(num_partitions)).astype(np.int64)
        out = {c: batch.column(c) for c in cols}
        out["__part"] = pa.array(part, pa.int64())
        return pa.table(out)

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "range_sum": pa.array([], pa.int64()),
                      "range_avg": pa.array([], pa.float64()),
                      "range_cnt": pa.array([], pa.int64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        v = group.column(value_col).to_numpy(zero_copy_only=False)
        prod = np.asarray(v, np.float64) * scale
        # half AWAY from zero, matching SQL round() (np.round banks)
        scaled = np.copysign(np.floor(np.abs(prod) + 0.5),
                             prod).astype(np.int64)
        order = np.lexsort((ids, ts, k))
        k, ts, ids, scaled = k[order], ts[order], ids[order], \
            scaled[order]
        n = len(k)
        starts = np.flatnonzero(np.concatenate(
            ([True], k[1:] != k[:-1])))
        seg_lens = np.diff(np.append(starts, n))
        seg_id = np.repeat(np.arange(len(starts), dtype=np.int64),
                           seg_lens)
        ts_rel = ts - ts.min()
        stride = int(ts_rel.max()) + int(range_us) + 2
        if stride * len(starts) > (1 << 62):  # pragma: no cover
            raise ValueError(
                "moving_agg_range: band lift would overflow int64 "
                "(ts span x segments too large for one partition) — "
                "raise num_partitions")
        ts_adj = ts_rel + seg_id * stride
        lo = np.searchsorted(ts_adj, ts_adj - range_us, side="left")
        hi = np.searchsorted(ts_adj, ts_adj, side="right")
        cum = np.cumsum(scaled)
        mov = cum[hi - 1] - np.where(lo > 0, cum[lo - 1], 0)
        cnt = (hi - lo).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "range_sum": pa.array(mov, pa.int64()),
            "range_avg": pa.array(mov.astype(np.float64)
                                  / (scale * cnt).astype(np.float64),
                                  pa.float64()),
            "range_cnt": pa.array(cnt, pa.int64()),
        })

    return (events_ds.select_columns(cols)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def funnel_steps(events_ds, steps, *, key_col: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type",
                 num_partitions: int = 64):
    """Ordered-sequence funnel — for each step ``i`` of the event-type
    sequence ``steps``, how many keys performed ``steps[0..i]`` in
    strict timestamp order (each step strictly AFTER the earliest
    completion time of the previous one — the standard product-funnel
    definition: t1 = min ts of step0; t_i = min ts of step_i with
    ts > t_{i-1}).  Returns ``(step, users)`` with ``step`` 1-based —
    the MATCH_RECOGNIZE-lite sequence detector Ray Data has no
    operator for.

    Scale shape: the tag stage maps the type string to a small step
    ordinal and DROPS every non-step row before the shuffle, so the
    exchange carries only (key, ts, step_no) int64 rows for relevant
    events.  Inside each hash(key) partition the per-key thresholds
    advance with the same disjoint-band ``np.searchsorted`` lift as
    :func:`moving_agg_range` — ``len(steps)`` vectorized passes, never
    a Python call per key.  A failed step parks the key's threshold
    past its band so later steps fail for free."""
    steps = list(steps)
    n_steps = len(steps)
    if n_steps == 0:
        raise ValueError("funnel_steps: need at least one step")

    def tag(batch: pa.Table) -> pa.Table:
        # zero-row / zero-match batches flow through the generic path
        # so the emitted schema (incl. the key's real type) is
        # block-invariant; keys may be int or string (_hash_col_np)
        et = batch.column(type_col)
        step_no = pa.nulls(batch.num_rows, pa.int64())
        for i, s in enumerate(steps):
            step_no = pc.if_else(pc.equal(et, s),
                                 pa.scalar(i, pa.int64()), step_no)
        keep = pc.is_valid(step_no)
        t = batch.filter(keep)
        step_no = step_no.filter(keep)
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        part = (_hash_col_np(k)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            key_col: t.column(key_col),
            "__ts": t.column(ts_col).cast(pa.int64()),
            "__step": step_no,
            "__part": pa.array(part, pa.int64()),
        })

    empty_out = pa.table({"step": pa.array([], pa.int64()),
                          "users": pa.array([], pa.int64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        ts = group.column("__ts").to_numpy(zero_copy_only=False)
        sn = group.column("__step").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, k))
        k, ts, sn = k[order], ts[order], sn[order]
        n = len(k)
        starts = np.flatnonzero(np.concatenate(
            ([True], k[1:] != k[:-1])))
        nseg = len(starts)
        seg_lens = np.diff(np.append(starts, n))
        seg_id = np.repeat(np.arange(nseg, dtype=np.int64), seg_lens)
        ts_rel = ts - ts.min()
        stride = int(ts_rel.max()) + 2
        if stride * (nseg + 1) > (1 << 62):  # pragma: no cover
            raise ValueError("funnel_steps: band lift would overflow "
                             "int64 — raise num_partitions")
        ts_adj = ts_rel + seg_id * stride
        bands = np.arange(nseg, dtype=np.int64) * stride
        th = bands - 1  # pre-step threshold: anything in band beats it
        counts = np.zeros(n_steps, np.int64)
        for i in range(n_steps):
            m = sn == i
            sts = ts_adj[m]
            sseg = seg_id[m]
            if len(sts) == 0:
                th = bands + stride  # nobody advances
                continue
            idx = np.searchsorted(sts, th, side="right")
            found = idx < len(sts)
            # first candidate past the threshold must be in the SAME
            # key's band to count
            cand_seg = np.full(nseg, -1, np.int64)
            cand_seg[found] = sseg[idx[found]]
            hit = cand_seg == np.arange(nseg, dtype=np.int64)
            counts[i] = int(hit.sum())
            th = np.where(hit, sts[np.where(hit, idx, 0)],
                          bands + stride)  # park failures past band
        return pa.table({
            "step": pa.array(np.arange(1, n_steps + 1, dtype=np.int64),
                             pa.int64()),
            "users": pa.array(counts, pa.int64()),
        })

    def fold(g: pa.Table) -> pa.Table:
        return pa.table({
            "step": g.column("step").slice(0, 1),
            "users": pa.array(
                [int(g.column("users").to_numpy(
                    zero_copy_only=False).sum())], pa.int64()),
        })

    return (events_ds.select_columns([key_col, ts_col, type_col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow")
            .groupby("step")
            .map_groups(fold, batch_format="pyarrow"))


def window_distinct(events_ds, *, ts_col: str = "ts",
                    val_col: str = "user_id",
                    window_us: int = 3_600_000_000,
                    num_partitions: int = 64):
    """EXACT distinct-value count per tumbling window — ``COUNT
    (DISTINCT val) GROUP BY epoch_us(ts) // window_us`` — the
    unique-visitors-per-hour query.  Returns ``(window_start_us,
    users)`` with ``window_start_us`` the window's inclusive start in
    epoch microseconds (int64, timezone-free on purpose).

    Scale shape: each block pre-deduplicates to its DISTINCT (window,
    value) pairs with Arrow's C++ ``group_by`` (combiner — repeated
    values never leave their block), then ONE hash(window) partition
    shuffle of those narrow int64 pairs feeds a lexsort run-scan that
    finishes every window in its partition (one Python call per
    PARTITION, not per window).  The shuffle is bounded by true
    distinct pairs x blocks."""
    from torray.ops.dedup import _mix64

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"__w": pa.array([], pa.int64()),
                             "__v": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        # integer division (exact; epochs are positive so it is
        # floor division, matching SQL // on the same ints)
        w = pc.divide(batch.column(ts_col).cast(pa.int64()),
                      pa.scalar(window_us, pa.int64()))
        t = pa.table({"__w": w, "__v": batch.column(val_col)})
        t = t.group_by(["__w", "__v"]).aggregate([])
        wn = t.column("__w").to_numpy(zero_copy_only=False)
        part = (_mix64(wn.astype(np.int64))
                % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    empty = pa.table({"window_start_us": pa.array([], pa.int64()),
                      "users": pa.array([], pa.int64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        w = group.column("__w").to_numpy(zero_copy_only=False)
        v = group.column("__v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, w))
        w, v = w[order], v[order]
        fresh = np.concatenate(([True],
                                (w[1:] != w[:-1]) | (v[1:] != v[:-1])))
        w, v = w[fresh], v[fresh]
        starts = np.flatnonzero(np.concatenate(
            ([True], w[1:] != w[:-1])))
        cnt = np.diff(np.append(starts, len(w)))
        return pa.table({
            "window_start_us": pa.array(w[starts] * window_us,
                                        pa.int64()),
            "users": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    return (events_ds.select_columns([ts_col, val_col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def cohort_retention(events_ds, *, key_col: str = "user_id",
                     ts_col: str = "ts",
                     period_us: int = 604_800_000_000,
                     num_partitions: int = 64):
    """Cohort retention — keys grouped by the period (default week) of
    their FIRST event; for each (cohort_period, period_offset) the
    count of cohort keys active in that later period.  Returns
    ``(cohort_period, period_offset, users)`` where ``cohort_period =
    epoch_us(first ts) // period_us`` and ``period_offset = active
    period - cohort_period`` (offset 0 row = cohort size).  The
    classic retention-triangle query.

    Scale shape: blocks combine to DISTINCT (key, period) int64 pairs
    (Arrow C++ group_by), ONE hash(key) shuffle co-locates each key's
    pairs, and a lexsort run-scan derives the cohort (the segment's
    first period — the min, since the segment is sorted) and emits
    pre-counted (cohort, offset, n) partials; a second TINY shuffle of
    those calendar-bounded partials (periods^2 rows x partitions at
    worst) folds them with one vectorized run-scan per partition —
    never a Python call per key or per cohort cell."""
    from torray.ops.dedup import _mix64

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"__k": pa.array([], pa.int64()),
                             "__p": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        p = pc.divide(batch.column(ts_col).cast(pa.int64()),
                      pa.scalar(period_us, pa.int64()))
        t = pa.table({"__k": batch.column(key_col).cast(pa.int64()),
                      "__p": p})
        t = t.group_by(["__k", "__p"]).aggregate([])
        k = t.column("__k").to_numpy(zero_copy_only=False)
        part = (_mix64(k.astype(np.int64))
                % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    cell_schema = pa.schema([("__c", pa.int64()), ("__o", pa.int64()),
                             ("__n", pa.int64()),
                             ("__part2", pa.int64())])

    def scan_keys(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return cell_schema.empty_table()
        k = group.column("__k").to_numpy(zero_copy_only=False)
        p = group.column("__p").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, k))
        k, p = k[order], p[order]
        fresh = np.concatenate(([True],
                                (k[1:] != k[:-1]) | (p[1:] != p[:-1])))
        k, p = k[fresh], p[fresh]
        starts = np.flatnonzero(np.concatenate(
            ([True], k[1:] != k[:-1])))
        seg_lens = np.diff(np.append(starts, len(k)))
        cohort = np.repeat(p[starts], seg_lens)
        offset = p - cohort
        order2 = np.lexsort((offset, cohort))
        c2, o2 = cohort[order2], offset[order2]
        cstarts = np.flatnonzero(np.concatenate(
            ([True], (c2[1:] != c2[:-1]) | (o2[1:] != o2[:-1]))))
        n = np.diff(np.append(cstarts, len(c2))).astype(np.int64)
        c_out, o_out = c2[cstarts], o2[cstarts]
        part2 = (_mix64(c_out * np.int64(1_000_003) + o_out)
                 % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({"__c": pa.array(c_out, pa.int64()),
                         "__o": pa.array(o_out, pa.int64()),
                         "__n": pa.array(n, pa.int64()),
                         "__part2": pa.array(part2, pa.int64())})

    empty_out = pa.table({"cohort_period": pa.array([], pa.int64()),
                          "period_offset": pa.array([], pa.int64()),
                          "users": pa.array([], pa.int64())})

    def fold_cells(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        c = group.column("__c").to_numpy(zero_copy_only=False)
        o = group.column("__o").to_numpy(zero_copy_only=False)
        n = group.column("__n").to_numpy(zero_copy_only=False)
        order = np.lexsort((o, c))
        c, o, n = c[order], o[order], n[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], (c[1:] != c[:-1]) | (o[1:] != o[:-1]))))
        sums = np.add.reduceat(n, starts)
        return pa.table({
            "cohort_period": pa.array(c[starts], pa.int64()),
            "period_offset": pa.array(o[starts], pa.int64()),
            "users": pa.array(sums.astype(np.int64), pa.int64()),
        })

    return (events_ds.select_columns([key_col, ts_col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_keys, batch_format="pyarrow")
            .groupby("__part2")
            .map_groups(fold_cells, batch_format="pyarrow"))


def resample(events_ds, *, key_col: str = "event_type",
             ts_col: str = "ts", value_col: str = "value",
             width_s: int = 3600, scale: int = 100,
             num_partitions: int = 64,
             max_windows_per_group: int = 5_000_000):
    """Gap-filled time-series resample: per key, count + scaled-int sum
    for EVERY ``width_s`` window between that key's first and last
    event — missing windows come back as explicit zero rows (the SQL
    ``generate_series`` + LEFT JOIN idiom).

    Scale shape: each block pre-aggregates (key, window) partials with
    one Arrow C++ ``group_by`` (raw rows never leave their block; the
    shuffle carries at most keys x windows-touched narrow rows per
    block, hash-partitioned by key so a key's whole timeline lands in
    one partition).  Inside the partition ONE lexsort + ``reduceat``
    folds cross-block partials and the dense grids are built fully
    vectorized (repeat/cumsum offsets + one scatter — no per-key
    Python beyond slice bookkeeping).  Output is linear in the filled
    span: ``max_windows_per_group`` hard-errors instead of silently
    materializing a runaway grid for a key spanning decades at
    second resolution.  Sums are half-away-from-zero scaled int64
    (``sum_cents`` at the default scale), bit-comparable to SQL.
    Output: (key_col, window, n_events, sum_cents) where ``window`` =
    floor(epoch_seconds / width_s).
    """
    import pyarrow.compute as _pc

    width_us = np.int64(width_s) * np.int64(1_000_000)

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        w = ts // width_us
        cents = _pc.cast(
            _pc.round(_pc.multiply(t.column(value_col), float(scale)),
                      round_mode="half_towards_infinity"),
            pa.int64())
        sub = pa.table({key_col: t.column(key_col),
                        "w": pa.array(w, pa.int64()),
                        "c": cents})
        agg = (sub.group_by([key_col, "w"])
               .aggregate([("c", "sum"), ("c", "count")]))
        kk = agg.column(key_col).to_numpy(zero_copy_only=False)
        part = (_hash_col_np(kk)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({key_col: agg.column(key_col),
                         "w": agg.column("w"),
                         "s": agg.column("c_sum").cast(pa.int64()),
                         "n": agg.column("c_count").cast(pa.int64()),
                         "__part": pa.array(part, pa.int64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        key_type = group.schema.field(key_col).type
        if group.num_rows == 0:
            return pa.table({key_col: pa.array([], key_type),
                             "window": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "sum_cents": pa.array([], pa.int64())})
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        s = group.column("s").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, k))
        k, w, s, n = k[order], w[order], s[order], n[order]
        # fold cross-block partials of the same (key, window)
        new = np.concatenate(
            ([True], (k[1:] != k[:-1]) | (w[1:] != w[:-1])))
        idx = np.flatnonzero(new)
        kc, wc = k[idx], w[idx]
        sc = np.add.reduceat(s, idx)
        nc = np.add.reduceat(n, idx)
        # per-key runs over the combined rows
        knew = np.concatenate(([True], kc[1:] != kc[:-1]))
        kstarts = np.flatnonzero(knew)
        kends = np.append(kstarts[1:], len(kc))
        w0 = wc[kstarts]
        w1 = wc[kends - 1]
        spans = (w1 - w0 + 1).astype(np.int64)
        if spans.max(initial=0) > max_windows_per_group:
            bad = kc[kstarts[int(np.argmax(spans))]]
            raise ValueError(
                f"resample grid for key {bad!r} spans {spans.max()} "
                f"windows > max_windows_per_group="
                f"{max_windows_per_group}; widen width_s or raise "
                f"the cap")
        offsets = np.concatenate(([0], np.cumsum(spans[:-1])))
        total = int(spans.sum())
        key_idx = np.repeat(np.arange(len(kstarts)), spans)
        grid = (np.arange(total, dtype=np.int64)
                - offsets[key_idx] + w0[key_idx])
        gn = np.zeros(total, np.int64)
        gs = np.zeros(total, np.int64)
        row_key_idx = np.cumsum(knew) - 1
        pos = offsets[row_key_idx] + (wc - w0[row_key_idx])
        gn[pos] = nc
        gs[pos] = sc
        # idx[kstarts] are positions in the SORTED arrays; map back to
        # original row positions for the typed Arrow take
        sorted_take = pa.array(order[idx[kstarts]][key_idx], pa.int64())
        keys_out = group.column(key_col).take(sorted_take)
        return pa.table({key_col: keys_out,
                         "window": pa.array(grid, pa.int64()),
                         "n_events": pa.array(gn, pa.int64()),
                         "sum_cents": pa.array(gs, pa.int64())})

    return (events_ds.select_columns([key_col, ts_col, value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def transition_counts(events_ds, *, key_col: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      cat_col: str = "event_type",
                      num_partitions: int = 64):
    """Per-key ordered transition (first-order Markov) matrix over a
    categorical column: for every key's event sequence ordered by
    ``(ts, id)``, count each adjacent ``(src, dst)`` category pair and
    attach the conditional probability ``p = n / sum(n per src)``.

    Exactness contract: counts are EXACT int64; ``p`` is ONE IEEE
    float64 divide of two exact ints, mirrored token for token by the
    SQL ``CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY src) AS
    DOUBLE)`` — bit-identical.  Ordering within a key is total
    (``id`` is unique), so the matrix is partition-invariant.

    Scale shape: hash(key) -> ``num_partitions`` coarse partitions,
    ONE groupby; inside each partition a lexsort + adjacent-shift scan
    emits pair rows and pre-combines them (the cross-partition shuffle
    carries at most |cats|^2 rows per partition, never per event).
    Per-src totals attach via the co-partitioned run-scan join
    (:func:`torray.ops.text._count_attach`) — no driver-side fold of
    the category vocabulary.

    Output: ``(src, dst, n, p)``.
    """
    import ray
    from ray.data.aggregate import Sum

    from torray.ops.dedup import _mix64

    npart = np.uint64(num_partitions)
    pair_schema = pa.schema([("src", pa.string()), ("dst", pa.string()),
                             ("__n", pa.int64()), ("__part", pa.int64())])

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([key_col, ts_col, id_col, cat_col])
        k = batch.column(key_col).cast(pa.int64())
        part = (_mix64(k.to_numpy(zero_copy_only=False)
                       .astype(np.uint64)) % npart).astype(np.int64)
        return pa.table({
            key_col: k,
            "__ts": batch.column(ts_col).cast(pa.int64()),
            id_col: batch.column(id_col).cast(pa.int64()),
            cat_col: batch.column(cat_col),
            "__part": pa.array(part, pa.int64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pair_schema.empty_table()
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        ts = group.column("__ts").to_numpy(zero_copy_only=False)
        ei = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ei, ts, k))
        ks = k[order]
        cs = group.column(cat_col).take(
            pa.array(order, pa.int64())).combine_chunks()
        same = pa.array(ks[1:] == ks[:-1])
        n1 = len(cs) - 1
        src = cs.slice(0, n1).filter(same)
        dst = cs.slice(1, n1).filter(same)
        t = pa.table({"src": src, "dst": dst})
        g = pa.TableGroupBy(t, ["src", "dst"]).aggregate(
            [([], "count_all")])
        g = g.append_column("__part", pa.nulls(g.num_rows, pa.int64()))
        return pa.table({"src": g.column("src"),
                         "dst": g.column("dst"),
                         "__n": g.column("count_all").cast(pa.int64()),
                         "__part": g.column("__part")}).cast(pair_schema)

    counts = (events_ds.select_columns(
        [key_col, ts_col, id_col, cat_col])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(scan_partition, batch_format="pyarrow")
        .groupby(["src", "dst"]).aggregate(Sum("__n"))
        .materialize())  # two consumers: totals + attach

    def to_n(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("src", pa.string()),
                              ("dst", pa.string()),
                              ("n", pa.int64())]).empty_table()
        return pa.table({"src": t.column("src"), "dst": t.column("dst"),
                         "n": t.column("sum(__n)").cast(pa.int64())})

    def to_key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("key", pa.string()),
                              ("__n", pa.int64())]).empty_table()
        return pa.table({"key": t.column("src"),
                         "__n": t.column("sum(__n)").cast(pa.int64())})

    from torray.ops.text import _count_attach

    n_ds = counts.map_batches(to_n, batch_format="pyarrow")
    tot_ds = (counts.map_batches(to_key, batch_format="pyarrow")
              .groupby("key").aggregate(Sum("__n")))
    with_tot = _count_attach(
        n_ds, tot_ds, "src", "tot",
        [("src", pa.string()), ("dst", pa.string()), ("n", pa.int64())],
        num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([
                ("src", pa.string()), ("dst", pa.string()),
                ("n", pa.int64()), ("p", pa.float64())]).empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        tot = t.column("tot").to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pa.table({"src": t.column("src"), "dst": t.column("dst"),
                         "n": t.column("n"),
                         "p": pa.array(n / tot, pa.float64())})

    return with_tot.map_batches(finish, batch_format="pyarrow")


def session_bounds(events_ds, *, gap_s: int = 1800,
                   key_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id",
                   num_partitions: int = 64):
    """Per-key session TABLE (not just counts): ``(key, session_id,
    start_us, end_us, n_events)`` under the inactivity-gap rule — a
    new session starts when the gap since the previous event (by
    (ts, id) order) exceeds ``gap_s``.  The SQL mirror is the classic
    gaps-and-islands window chain; every output is an exact int64.

    Scale shape: the :func:`sessionize` partition run-scan, extended
    to emit one row per session: lexsort (key, ts, id), vectorized
    break flags, per-key session ids via a segmented cumsum, then
    min/max/count per (key, session) run with ``np.*.reduceat`` —
    Python once per partition."""
    from torray.ops.dedup import _mix64

    npart = np.uint64(num_partitions)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("__key", "__ts", "__id", "__part")})
        k = batch.column(key_col).cast(pa.int64())
        part = (_mix64(k.to_numpy(zero_copy_only=False)
                       .astype(np.uint64)) % npart).astype(np.int64)
        return pa.table({
            "__key": k,
            "__ts": batch.column(ts_col).cast(pa.int64()),
            "__id": batch.column(id_col).cast(pa.int64()),
            "__part": pa.array(part, pa.int64())})

    out_cols = (key_col, "session_id", "start_us", "end_us",
                "n_events")
    gap_us = gap_s * 1_000_000

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in out_cols})
        k = group.column("__key").to_numpy(zero_copy_only=False)
        ts = group.column("__ts").to_numpy(zero_copy_only=False)
        ei = group.column("__id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ei, ts, k))
        ks, tss = k[order], ts[order]
        new_key = np.concatenate(([True], ks[1:] != ks[:-1]))
        brk = new_key | np.concatenate(
            ([False], (tss[1:] - tss[:-1]) > gap_us))
        # per-key session index: cumsum of breaks minus the cumsum at
        # each key's first row (segmented reset, fully vectorized)
        b = np.cumsum(brk)
        key_first = np.repeat(b[new_key], np.diff(
            np.append(np.flatnonzero(new_key), len(ks))))
        sid = b - key_first + 1
        sess_start = np.flatnonzero(brk)
        sess_len = np.diff(np.append(sess_start, len(ks)))
        return pa.table({
            key_col: pa.array(ks[sess_start], pa.int64()),
            "session_id": pa.array(sid[sess_start], pa.int64()),
            "start_us": pa.array(tss[sess_start], pa.int64()),
            "end_us": pa.array(
                np.maximum.reduceat(tss, sess_start), pa.int64()),
            "n_events": pa.array(sess_len, pa.int64())})

    return (events_ds.select_columns([key_col, ts_col, id_col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def trailing_window_distinct(events_ds, *, ts_col: str = "ts",
                             key_col: str = "user_id",
                             window_days: int = 7,
                             num_partitions: int = 64):
    """Rolling DAU-style metric: for every day that has at least one
    event, the count of DISTINCT keys over the trailing
    ``window_days`` days (day d counts events in [d-6, d] for the
    7-day window).  All outputs exact int64.

    Scale shape: overlapping windows cannot pre-combine distincts, so
    each event row replicates into ``window_days`` (day-bucket, key)
    int64 rows — vectorized ``np.repeat`` + modular offsets, the
    standard hopping-window replication — deduped per block before
    the shuffle; buckets for days with no events of their own are
    dropped against a broadcast day set (bounded: one entry per
    calendar day in the data); the distinct count itself is
    :func:`torray.ops.sketch.exact_distinct_by`'s partition scan.
    Cost is ``window_days`` x the input in narrow int rows — the
    exact-answer floor for sliding distinct; use the HLL variant when
    ~1.6% error is acceptable.
    """
    import ray

    from torray.ops.sketch import exact_distinct_by

    day_us = 86_400_000_000

    def day_partial(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor_temporal(t.column(ts_col), unit="day"),
                    pa.int64())
        return pa.table({"day": pc.unique(d.combine_chunks())})

    days = set()
    for row in (events_ds.select_columns([ts_col])
                .map_batches(day_partial, batch_format="pyarrow")
                .take_all()):
        days.add(int(row["day"]))
    days_ref = ray.put(days)

    def replicate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             key_col: pa.array([], pa.int64())})
        d = pc.cast(pc.floor_temporal(t.column(ts_col), unit="day"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        k = t.column(key_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n = len(d)
        bucket = (np.repeat(d, window_days)
                  + np.tile(np.arange(window_days, dtype=np.int64)
                            * day_us, n))
        keys = np.repeat(k, window_days)
        actual = ray.get(days_ref)
        keep = np.isin(bucket,
                       np.fromiter(actual, np.int64, len(actual)))
        out = pa.table({"day": pa.array(bucket[keep], pa.int64()),
                        key_col: pa.array(keys[keep], pa.int64())})
        # block-local dedupe: repeated (day, key) never shuffle
        return out.group_by(["day", key_col]).aggregate([])

    buckets = (events_ds.select_columns([ts_col, key_col])
               .map_batches(replicate, batch_format="pyarrow"))
    out = exact_distinct_by(buckets, "day", key_col,
                            out_col="n_distinct",
                            num_partitions=num_partitions)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["day_us", "n_distinct"])

    return out.map_batches(rename, batch_format="pyarrow")


def ewma(ds, *, key_col: str = "user_id", ts_col: str = "ts",
         id_col: str = "event_id", value_col: str = "value",
         alpha: float = 0.3, out_col: str = "ewma",
         num_partitions: int = 64):
    """Per-key exponentially weighted moving average ordered by
    ``(ts, id)`` — the streaming decay score SQL window frames cannot
    express (``y_i = alpha*x_i + (1-alpha)*y_{i-1}``, ``y_0 = x_0``,
    pandas ``ewm(alpha, adjust=False)`` semantics).  Returns
    ``(id, ewma)`` rows.

    The recurrence is a first-order AFFINE scan, and affine maps
    compose associatively: ``(a2,b2)∘(a1,b1) = (a1*a2, a2*b1+b2)``.
    So instead of a Python loop per key (the per-key ``map_groups``
    pathology) each hash(key) partition runs ONE vectorized
    Hillis-Steele scan over its lexsorted rows — log2(n) numpy passes,
    no Python per row or per key.  Segment boundaries need no special
    case: a segment-start row carries ``a=0``, which kills any carry
    from the previous key algebraically.

    Scale notes: the same associativity means a HOT key could be
    salt-split by time range and stitched with per-segment (A, B)
    fixups, exactly the :func:`running_total` salted shape — not
    wired here because EWMA's decay term ``(1-alpha)^len`` underflows
    to 0 beyond ~1e4 rows, so distant-past segments contribute
    nothing representable; the scan truncates identically.  Float
    note: the scan re-associates additions, so results can differ
    from the sequential recurrence in the last ULPs (rows-only op;
    the pytest reference checks to 1e-9 relative).
    """
    from torray.ops.dedup import _mix64

    cols = [key_col, ts_col, id_col, value_col]
    a = float(alpha)
    if not 0.0 < a <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha!r}")

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        part = (_mix64(k.astype(np.int64))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            "k": pa.array(k.astype(np.int64), pa.int64()),
            "t": batch.column(ts_col).combine_chunks().cast(pa.int64()),
            "i": batch.column(id_col).combine_chunks().cast(pa.int64()),
            "v": pc.cast(batch.column(value_col), pa.float64()),
            "__part": pa.array(part, pa.int64())})

    def scan_partition(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             out_col: pa.array([], pa.float64())})
        k = g.column("k").to_numpy(zero_copy_only=False)
        t = g.column("t").to_numpy(zero_copy_only=False)
        i = g.column("i").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, k))
        k, i, v = k[order], i[order], v[order]
        n = len(k)
        starts = np.concatenate(([True], k[1:] != k[:-1]))
        # y_i = A_i * y_{i-1} + B_i ; segment starts pin y to x.
        A = np.where(starts, 0.0, 1.0 - a)
        B = np.where(starts, v, a * v)
        off = 1
        while off < n:
            # compose element i with the scan result ending at i-off
            A2 = A[off:] * A[:-off]
            B2 = B[off:] + A[off:] * B[:-off]
            A[off:], B[off:] = A2, B2
            off *= 2
        return pa.table({id_col: pa.array(i, pa.int64()),
                         out_col: pa.array(B, pa.float64())})

    return (ds.select_columns(cols)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def lag_values(ds, *, key_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id", value_col: str = "value",
               out_col: str = "prev", offset: int = 1,
               num_partitions: int = 64):
    """Per-key LAG(value, offset) by ``(ts, id)`` order — the previous
    VALUE (any numeric column), where :func:`lag_delta` /
    :func:`lead_delta` carry timestamps.  Returns ``(id, value,
    out_col)`` — value a pure passthrough — with NULL for the first
    ``offset`` rows of each key, exactly SQL
    ``LAG(value, offset) OVER (PARTITION BY key ORDER BY ts, id)``.

    The value column is a pure PASSTHROUGH (no arithmetic), so
    downstream mirrored expressions — pct-change, diffs — stay
    bit-identical to a SQL engine reading the same parquet.  Same
    partition run-scan shape as :func:`running_total`: hash(key)
    coarse partitions, one lexsort + one vectorized shift per
    partition, Python once per PARTITION."""
    from torray.ops.dedup import _mix64

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        part = (_mix64(k.astype(np.int64))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            "k": pa.array(k.astype(np.int64), pa.int64()),
            "t": batch.column(ts_col).combine_chunks().cast(pa.int64()),
            "i": batch.column(id_col).combine_chunks().cast(pa.int64()),
            "v": pc.cast(batch.column(value_col), pa.float64()),
            "__part": pa.array(part, pa.int64())})

    def scan_partition(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             value_col: pa.array([], pa.float64()),
                             out_col: pa.array([], pa.float64())})
        k = g.column("k").to_numpy(zero_copy_only=False)
        t = g.column("t").to_numpy(zero_copy_only=False)
        i = g.column("i").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, t, k))
        k, i, v = k[order], i[order], v[order]
        prev = np.empty_like(v)
        prev[offset:] = v[:-offset] if offset else v
        prev[:offset] = np.nan
        # a row whose key differs from the row `offset` back starts a
        # new key segment -> NULL
        valid = np.ones(len(k), bool)
        valid[:offset] = False
        if offset:
            valid[offset:] = k[offset:] == k[:-offset]
        return pa.table({
            id_col: pa.array(i, pa.int64()),
            value_col: pa.array(v, pa.float64()),
            out_col: pa.array(
                np.where(valid, prev, np.nan), pa.float64(),
                mask=~valid)})

    return (ds.select_columns([key_col, ts_col, id_col, value_col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def moving_zscore(events_ds, *, key_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  value_col: str = "value", frame: int = 20,
                  scale: int = 100, num_partitions: int = 64):
    """Per-key trailing-window z-score — the streaming anomaly signal:
    how many frame-local standard deviations the current value sits
    from the frame mean (``ROWS BETWEEN frame-1 PRECEDING AND CURRENT
    ROW``).  Returns ``(id, z)``; rows with fewer than 2 frame rows or
    zero frame variance are NULL.

    Exactness contract: frame sum and sum-of-squares are exact int64
    in ``round(v*scale)`` units (two segmented cumsums, same run-scan
    as :func:`moving_agg`), and

        z = (v*cnt - sum) / sqrt(cnt*sumsq - sum^2)

    is ONE mirrored float expression over three exact integers — the
    algebraic collapse of (v - mean)/std that never divides early, so
    any SQL engine replays it bit-identically.  Overflow bound:
    ``cnt*sumsq`` needs ``frame * (v*scale)^2 * frame < 2^63`` —
    centi-scaled values to ~3e7 at frame 20."""
    from torray.ops.dedup import _mix64

    cols = [key_col, ts_col, id_col, value_col]

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        part = (_mix64(k.astype(np.int64))
                % np.uint64(num_partitions)).astype(np.int64)
        out = {c: batch.column(c) for c in cols}
        out["__part"] = pa.array(part, pa.int64())
        return pa.table(out)

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "z": pa.array([], pa.float64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        v = group.column(value_col).to_numpy(zero_copy_only=False)
        prod = np.asarray(v, np.float64) * scale
        scaled = np.copysign(np.floor(np.abs(prod) + 0.5),
                             prod).astype(np.int64)
        order = np.lexsort((ids, ts, k))
        k, ids, scaled = k[order], ids[order], scaled[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], k[1:] != k[:-1])))
        cum = _segmented_cumsum(scaled, starts)
        cumsq = _segmented_cumsum(scaled * scaled, starts)
        seg_lens = np.diff(np.append(starts, len(k)))
        pos = np.arange(len(k), dtype=np.int64) - np.repeat(starts,
                                                            seg_lens)
        sub_idx = np.maximum(np.arange(len(k), dtype=np.int64) - frame,
                             0)
        in_frame = pos >= frame
        fsum = cum - np.where(in_frame, cum[sub_idx], 0)
        fsq = cumsq - np.where(in_frame, cumsq[sub_idx], 0)
        cnt = np.minimum(pos + 1, frame)
        num = scaled * cnt - fsum
        den = cnt * fsq - fsum * fsum
        valid = (cnt >= 2) & (den > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = num.astype(np.float64) / np.sqrt(
                den.astype(np.float64))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "z": pa.array(np.where(valid, z, np.nan), pa.float64(),
                          mask=~valid)})

    return (events_ds.select_columns(cols)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def state_intervals(events_ds, *, key_col: str = "user_id",
                    state_col: str = "event_type", ts_col: str = "ts",
                    id_col: str = "event_id",
                    num_partitions: int = 64):
    """SCD Type-2 interval construction (gaps-and-islands over a
    STATE column): per key ordered by ``(ts, id)``, consecutive equal
    states collapse to one row ``(key, state, valid_from, valid_to)``
    — ``valid_from`` the run's first timestamp, ``valid_to`` the next
    run's first timestamp, NULL for the key's current (last) state.
    The standard change-log -> dimension-table build.

    Partition RUN-SCAN shape (see :func:`sessionize`): keys hash into
    ``num_partitions`` coarse partitions, ONE groupby on the partition
    id, then one lexsort + boundary masks per partition — never a
    Python call per key.  The shuffle carries (key, state, ts, id)
    rows once; output is one row per state CHANGE, usually a small
    fraction of the input.
    """

    narrow = events_ds.select_columns([key_col, state_col, ts_col,
                                       id_col])

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                state_col: pa.array([], pa.string()),
                "__ts": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "__part": pa.array([], pa.int64())})
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        part = (_hash_col_np(k)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            key_col: batch.column(key_col),
            state_col: batch.column(state_col),
            "__ts": batch.column(ts_col).cast(pa.int64()),
            id_col: batch.column(id_col),
            "__part": pa.array(part, pa.int64())})

    ts_type = pa.timestamp("us")

    def scan_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({
            key_col: pa.array([], pa.int64()),
            "state": pa.array([], pa.string()),
            "valid_from": pa.array([], ts_type),
            "valid_to": pa.array([], ts_type)})
        if group.num_rows == 0:
            return empty
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        ts = group.column("__ts").to_numpy(zero_copy_only=False)
        eid = group.column(id_col).to_numpy(zero_copy_only=False)
        st = group.column(state_col).to_numpy(zero_copy_only=False)
        # factorize so the break mask runs on int codes even for
        # string keys/states
        _, kcode = np.unique(k, return_inverse=True)
        _, scode = np.unique(st, return_inverse=True)
        order = np.lexsort((eid, ts, kcode))
        kc, sc, tso = kcode[order], scode[order], ts[order]
        n = len(order)
        new_key = np.empty(n, np.bool_)
        new_key[0] = True
        np.not_equal(kc[1:], kc[:-1], out=new_key[1:])
        new_run = new_key.copy()
        new_run[1:] |= sc[1:] != sc[:-1]
        starts = np.flatnonzero(new_run)
        # valid_to = next run's first ts when that run is the SAME
        # key, else NULL (the key's open current state)
        nxt = np.empty(len(starts), np.int64)
        nxt[:-1] = tso[starts[1:]]
        nxt[-1] = 0
        same_key = np.empty(len(starts), np.bool_)
        same_key[:-1] = ~new_key[starts[1:]]
        same_key[-1] = False
        vf = pa.array(tso[starts], pa.int64()).cast(ts_type)
        vt = pa.array(np.where(same_key, nxt, 0), pa.int64(),
                      mask=~same_key).cast(ts_type)
        take = pa.array(order[starts], pa.int64())
        return pa.table({
            key_col: pc.take(group.column(key_col), take),
            "state": pc.take(group.column(state_col), take),
            "valid_from": vf,
            "valid_to": vt})

    return (narrow.map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def overlap_join(ds, *, id_col: str, start_col: str, end_col: str,
                 key_col: str | None = None, bin_s: int | None = None,
                 sub_salt: int = 1, max_group_rows: int | None = None,
                 num_partitions: int = 64):
    """Self interval-OVERLAP join: every unordered pair of rows with
    equal keys (when given) whose half-open intervals
    ``[start, end)`` intersect — e.g. "orders of the same customer
    whose fulfilment windows overlapped".  Interval x interval, where
    :func:`interval_join` is point x interval.

    Reduction (no new shuffle machinery): two intervals overlap iff
    the LATER-starting one's start lies inside the other — so one
    :func:`interval_join` of interval STARTS against the intervals
    finds every overlapping pair.  A pair is emitted twice only when
    starts tie exactly (each start is inside the other); the
    vectorized keep-rule ``(r_start, r_id) < (l_start, l_id)`` keeps
    exactly one direction of every pair — and drops self-matches —
    without any distinct pass.  Output: ``(key?, id_a, id_b)`` with
    ``id_a < id_b``.

    Inherits interval_join's scale contract: bounded-interval binning,
    ``sub_salt`` / ``max_group_rows`` hot-bin guards.
    """
    # interval_join keeps ORIGINAL column names on both sides of its
    # output; rename the left (point) side first so names never
    # collide with the right interval's columns.
    left_cols = [id_col, start_col] + ([key_col] if key_col else [])

    def as_points(t: pa.Table) -> pa.Table:
        cols = {"__lid": t.column(id_col),
                "__lts": t.column(start_col)}
        if key_col:
            cols["__lkey"] = t.column(key_col)
        return pa.table(cols)

    left = ds.select_columns(left_cols).map_batches(
        as_points, batch_format="pyarrow")

    pairs = interval_join(
        left, ds, left_ts="__lts", right_start=start_col,
        right_end=end_col, left_key="__lkey" if key_col else None,
        right_key=key_col, right_value_cols=[id_col, start_col],
        bin_s=bin_s,
        sub_salt=sub_salt, max_group_rows=max_group_rows,
        num_partitions=num_partitions)

    out_key = ["key"] if key_col else []

    def finish(t: pa.Table) -> pa.Table:
        empty = {k: pa.array([], pa.int64()) for k in
                 out_key + ["id_a", "id_b"]}
        if t.num_rows == 0:
            return pa.table(empty)
        lid = t.column("__lid").to_numpy(zero_copy_only=False)
        rid = t.column(id_col).to_numpy(zero_copy_only=False)
        lts = t.column("__lts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        rts = t.column(start_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = (rts < lts) | ((rts == lts) & (rid < lid))
        if not keep.any():
            return pa.table(empty)
        lid, rid = lid[keep], rid[keep]
        cols = {}
        if key_col:
            cols["key"] = t.column("__lkey").filter(
                pa.array(keep)).cast(pa.int64())
        cols["id_a"] = pa.array(np.minimum(lid, rid), pa.int64())
        cols["id_b"] = pa.array(np.maximum(lid, rid), pa.int64())
        return pa.table(cols)

    return pairs.map_batches(finish, batch_format="pyarrow")
