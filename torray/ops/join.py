"""Broadcast (map-side) hash join: join a huge Dataset against a
small dimension table WITHOUT shuffling the big side.

Ray Data's native ``Dataset.join`` is always a hash-shuffle of both
sides; for the "fact stream x dimension table" shape that dominates
analytics (and this engine's own pagestore/fetch lookups,
`torray/pagestore.py`), the standard fix is a broadcast join: collect
the small side ONCE, ``ray.put`` it, and join every big-side batch
against it in-task with Arrow's C++ hash join — zero shuffle, the big
side streams.

Row-level independence makes the per-batch join exact for ``inner``
and ``left outer`` (each output row depends on one big-side row plus
the broadcast table only).  Join types whose semantics span big-side
rows (right/full outer, anti) are NOT offered here — those need the
shuffle join.

The small side is the memory bound: one copy in the object store
(shared by all workers on a node via plasma, not per-task), so a
dimension table of millions of rows is fine; ``small_cap_rows``
guards against accidentally broadcasting a fact table.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["broadcast_join", "skew_join", "safe_join"]


def broadcast_join(big_ds, small_ds, *, on, right_on=None,
                   how: str = "inner", small_cap_rows: int = 10_000_000):
    """Join ``big_ds`` with the (small) ``small_ds`` on key columns.

    ``on`` / ``right_on``: str or list of str.  ``how``: ``"inner"``
    or ``"left outer"`` (Arrow join-type names).  Raises if the small
    side exceeds ``small_cap_rows`` — at that size use the shuffle
    join instead.
    """
    import ray

    if how not in ("inner", "left outer"):
        raise ValueError(
            f"broadcast_join supports 'inner'/'left outer', got {how!r} "
            "(right/full/anti semantics span big-side rows: use the "
            "shuffle join)")
    keys = [on] if isinstance(on, str) else list(on)
    rkeys = keys if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))

    small_tables = [t for t in ray.get(small_ds.to_arrow_refs())
                    if t.num_rows]
    if small_tables:
        small = pa.concat_tables(small_tables)
    else:
        sch = getattr(small_ds.schema(), "base_schema", None)
        if not isinstance(sch, pa.Schema):
            # empty DERIVED small side: Ray reports no schema at all.
            # Degrade to keys-only (typed from the LEFT keys, which
            # must be comparable anyway): inner -> zero rows, left
            # outer -> left rows with no extra columns.
            from torray.ops.window import _ds_field_type

            lk = [on] if isinstance(on, str) else list(on)
            rk = lk if right_on is None else (
                [right_on] if isinstance(right_on, str)
                else list(right_on))
            sch = pa.schema([(r, _ds_field_type(big_ds, l))
                             for l, r in zip(lk, rk)])
        small = sch.empty_table()
    if small.num_rows > small_cap_rows:
        raise ValueError(
            f"small side has {small.num_rows} rows > cap "
            f"{small_cap_rows}: broadcast would not be small")
    small = small.combine_chunks()
    ref = ray.put(small)

    def join_batch(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        return t.join(s, keys=keys, right_keys=rkeys, join_type=how)

    return big_ds.map_batches(join_batch, batch_format="pyarrow")


def skew_join(left_ds, right_ds, *, on: str, right_on: str | None = None,
              hot_threshold: int = 1_000_000, k_hot: int = 64,
              num_partitions: int = 32,
              small_cap_rows: int = 10_000_000):
    """Skew-aware INNER equi-join for two large datasets whose join key
    is hot on the left (the fact side): keys with ``>= hot_threshold``
    left rows are joined MAP-SIDE against a broadcast slice of the
    right side, everything else goes through the ordinary hash-shuffle
    join — the standard two-plan split that keeps one hot key (a
    viral host, a bot user, a default value) from pinning an entire
    shuffle partition on one task.

    Scale shape: hot-key detection is :func:`torray.ops.rank.
    top_frequent` (distinct-per-block combiners; the shuffle carries
    distinct keys, never rows), so the pre-pass costs one narrow
    count.  At most ``k_hot`` keys go hot; their RIGHT rows (a few
    rows per key for a fact⋈dimension join) broadcast once via
    ``ray.put`` and the hot left rows stream through an Arrow C++
    join per batch — zero shuffle for exactly the rows that would
    have skewed.  Cold rows take Ray's native hash join, whose
    partitions are now bounded.  Output = left columns + non-key
    right columns (both plans produce this schema; their union is the
    exact inner join, since the hot/cold key sets are disjoint)."""
    import ray

    from torray.ops.rank import top_frequent

    # Ray's hash-shuffle join schedules one aggregator actor per
    # partition; asking for more partitions than the cluster has CPUs
    # leaves the actor pool waiting forever (observed: a 32-partition
    # join wedged a 4-CPU test cluster).  Cap by the actual cluster —
    # at 256 nodes the cap is a no-op, on a laptop it prevents the
    # deadlock.
    cluster_cpus = int(ray.cluster_resources().get("CPU", 0) or
                      num_partitions)
    num_partitions = max(2, min(num_partitions, cluster_cpus))

    rkey = right_on or on
    counts = top_frequent(left_ds.select_columns([on]), on, k_hot)
    hot_tbl = counts.to_arrow_refs()
    hot_parts = [t for t in ray.get(hot_tbl) if t.num_rows]
    if hot_parts:
        ht = pa.concat_tables(hot_parts)
        import pyarrow.compute as pc
        ht = ht.filter(pc.greater_equal(ht.column("n"), hot_threshold))
        hot_vals = ht.column(on).combine_chunks()
    else:
        from torray.ops.window import _ds_field_type

        hot_vals = pa.chunked_array(
            [pa.array([], _ds_field_type(left_ds, on))])

    if len(hot_vals) == 0:
        return safe_join(left_ds, right_ds, "inner", num_partitions,
                         on=(on,), right_on=(rkey,))

    hot_ref = ray.put(hot_vals)

    def split(keep_hot: bool, key: str):
        import pyarrow.compute as pc

        def f(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t.column(key), value_set=ray.get(hot_ref))
            return t.filter(mask if keep_hot else pc.invert(mask))
        return f

    left_hot = left_ds.map_batches(split(True, on),
                                   batch_format="pyarrow")
    left_cold = left_ds.map_batches(split(False, on),
                                    batch_format="pyarrow")
    right_hot = right_ds.map_batches(split(True, rkey),
                                     batch_format="pyarrow")
    right_cold = right_ds.map_batches(split(False, rkey),
                                      batch_format="pyarrow")

    hot_joined = broadcast_join(left_hot, right_hot, on=on,
                                right_on=rkey, how="inner",
                                small_cap_rows=small_cap_rows)
    cold_joined = safe_join(left_cold, right_cold, "inner",
                            num_partitions, on=(on,), right_on=(rkey,))
    return hot_joined.union(cold_joined)


_ARROW_VERB = {"inner": "inner", "left_outer": "left outer",
               "right_outer": "right outer", "full_outer": "full outer",
               "left_semi": "left semi", "left_anti": "left anti"}


def safe_join(left_ds, right_ds, join_type: str,
              num_partitions: int | None = None, *, on,
              right_on=None, left_suffix: str | None = None,
              right_suffix: str | None = None, **kw):
    """``Dataset.join`` with the zero-block guard.

    Ray 2.49's hash-shuffle join crashes (acero ``ArrowInvalid: No
    match ... for key field reference``) whenever one side produces
    ZERO blocks — the aggregator builds a schemaless empty partition
    and the Arrow join can't resolve the key column.  A side is
    zero-block exactly when (a) its plan reports ``schema() is None``
    or (b) a filter/transform eliminated every row.  (a) is free to
    check; (b) costs one ``limit(1)`` probe per side — streaming
    early-exit, so on real data it touches one block, and on the
    engine's join inputs (which are materialized anyway, for this same
    Ray bug) it is metadata-only.

    When a side IS empty, the join result is computed driver-side on
    typed zero-row tables with pyarrow's own ``Table.join`` — the same
    call Ray's aggregator makes, so names/suffixes/types match the
    distributed path exactly.  A schemaless empty side contributes its
    key columns (typed from the other side) only; its value columns
    are unknowable, which only affects zero-row output.
    """
    import ray.data

    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = (lkeys if right_on is None else
             ([right_on] if isinstance(right_on, str) else list(right_on)))

    def _known(ds, fetch):
        try:
            sch = ds.schema(fetch_if_missing=fetch)
        except Exception:
            sch = None
        base = getattr(sch, "base_schema", None)
        # a 0-field schema is Ray's other spelling of "no schema"
        # (derived datasets whose every block is a schemaless empty)
        if isinstance(base, pa.Schema) and len(base) > 0:
            return base
        return None

    def probe(ds, keys, other_ds, other_keys):
        # metadata first (free).  A side whose schema is only known
        # from METADATA can still be runtime-schemaless: Ray's read of
        # an empty parquet emits 0-column blocks, so the broadcast fix
        # has nothing to ship — resolve emptiness from the metadata
        # row count (free for reads), falling back to one limit(1)
        # probe only when the count is unknown.  A side whose schema
        # came from a FETCH (which executed the lineage) proved a
        # schema-bearing block exists at runtime, and zero-ROW sides
        # with real blocks are safe in the native join because
        # torray._rayfix guarantees the schema broadcast reaches every
        # aggregator partition.
        sch = _known(ds, False)
        if sch is not None:
            try:
                mc = ds._meta_count()
            except Exception:
                mc = None
            if mc is None:
                mc = 1 if ds.limit(1).count() else 0
            return sch, mc == 0
        sch = _known(ds, True)
        if sch is not None:
            return sch, False
        osch = _known(other_ds, False) or _known(other_ds, True)
        fields = ([(k, osch.field(ok).type)
                   for k, ok in zip(keys, other_keys)]
                  if osch is not None
                  and all(ok in osch.names for ok in other_keys)
                  else [(k, pa.int64()) for k in keys])
        return pa.schema(fields), True

    lsch, lempty = probe(left_ds, lkeys, right_ds, rkeys)
    rsch, rempty = probe(right_ds, rkeys, left_ds, lkeys)
    if lempty or rempty:
        lt, rt = lsch.empty_table(), rsch.empty_table()
        verb = _ARROW_VERB[join_type]
        # rows can only survive from a NON-empty side under outer/anti
        # semantics; pad that side per batch by joining it against the
        # typed empty other side — the exact acero call the distributed
        # path makes, so names/suffixes/coalescing match, and it is
        # row-independent (the empty side contributes no matches)
        left_live = (not lempty) and join_type in (
            "left_outer", "full_outer", "left_anti")
        right_live = (not rempty) and join_type in (
            "right_outer", "full_outer")
        if left_live:
            return left_ds.map_batches(
                lambda t: (lt if t.num_rows == 0 else t)
                .join(rt, keys=lkeys, right_keys=rkeys,
                      join_type=verb, left_suffix=left_suffix,
                      right_suffix=right_suffix),
                batch_format="pyarrow")
        if right_live:
            return right_ds.map_batches(
                lambda t: lt.join(rt if t.num_rows == 0 else t,
                                  keys=lkeys, right_keys=rkeys,
                                  join_type=verb, left_suffix=left_suffix,
                                  right_suffix=right_suffix),
                batch_format="pyarrow")
        out = lt.join(rt, keys=lkeys, right_keys=rkeys, join_type=verb,
                      left_suffix=left_suffix, right_suffix=right_suffix)
        return ray.data.from_arrow(out)
    import ray

    if num_partitions is None:
        num_partitions = max(
            2, int(ray.cluster_resources().get("CPU", 4)))
    return left_ds.join(right_ds, join_type, num_partitions,
                        on=tuple(lkeys), right_on=tuple(rkeys),
                        left_suffix=left_suffix,
                        right_suffix=right_suffix, **kw)
