"""Referential-integrity audit: exact dangling-foreign-key counts.

A 100 TB ingest is never clean; before a join-heavy pipeline runs, the
engine should be able to SAY "0.3% of lineitem rows reference an order
that does not exist" rather than silently dropping them in an inner
join.  :func:`referential_audit` measures one child->parent edge
exactly; :func:`fk_audit` folds a whole schema's edge list into one
small audit table.

Scale shape: the child side collapses to DISTINCT (key, row_count)
with a per-block Arrow ``group_by`` combiner BEFORE the one narrow
shuffle (the groupby carries distinct keys only — never child rows),
null keys ride the combiner as Arrow null groups (SQL semantics: a
NULL FK is "unknown", counted separately, never dangling), and the
membership check against the parent is :func:`~torray.ops.bloom.
bloom_antijoin` — bloom-negative keys stream straight to the dangling
set with zero shuffle, only probe survivors enter the exact check.
Both sides' data columns never move: the audit touches key columns
only.  All row/key totals fold from one-row-per-block partials, so
the driver never holds the distinct-key table.

The reference engine trusts its own SQLite writes; this belongs to
the training-data-pipeline layer (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["referential_audit", "fk_audit", "dataset_checksum"]


def _result_table(relation: str, child_rows: int, null_keys: int,
                  dangling_rows: int, dangling_keys: int) -> pa.Table:
    return pa.table({
        "relation": pa.array([relation], pa.string()),
        "child_rows": pa.array([child_rows], pa.int64()),
        "null_keys": pa.array([null_keys], pa.int64()),
        "dangling_rows": pa.array([dangling_rows], pa.int64()),
        "dangling_keys": pa.array([dangling_keys], pa.int64()),
    })


def _fold_int(ds, col: str) -> int:
    """Sum an int64 column from one-row-per-block partials (driver
    holds block-count rows, never data rows)."""
    import ray

    return int(sum(
        int(pc.sum(b.column(col)).as_py() or 0)
        for b in ray.get(ds.to_arrow_refs()) if b.num_rows))


def referential_audit(child_ds, child_key: str, parent_ds,
                      parent_key: str, relation: str | None = None,
                      *, num_partitions: int = 64,
                      broadcast_limit: int = 5_000_000):
    """EXACT foreign-key audit of one ``child.child_key ->
    parent.parent_key`` edge.

    Returns a ONE-ROW Dataset ``(relation, child_rows, null_keys,
    dangling_rows, dangling_keys)``:

    - ``child_rows``   — total child rows (null keys included);
    - ``null_keys``    — child rows whose key IS NULL (SQL: unknown,
      not dangling — ``NOT EXISTS`` keeps them out of the dangling
      count, exactly as a LEFT JOIN probe would);
    - ``dangling_rows``— child rows whose non-null key has NO parent;
    - ``dangling_keys``— distinct such keys.

    Scale shape (measured at 10M child rows: the naive raw-key
    ``groupby`` + hash-join formulation cost 110 s; this one ~10 s):
    the child collapses to DISTINCT (key, count) via per-block Arrow
    combiners tagged into ``num_partitions`` coarse hash partitions —
    ONE narrow shuffle, Python once per PARTITION (the
    ``exact_distinct_by`` shape).  Membership: when the parent's
    distinct keys fit ``broadcast_limit`` they broadcast once via
    ``ray.put`` and every partition probes vectorized
    (``pc.is_in``) with ZERO further shuffle; a larger parent falls
    back to :func:`~torray.ops.bloom.bloom_antijoin` (bloom-negative
    keys skip the exact join).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from torray.ops.dedup import _mix64, fnv1a64_strings

    if relation is None:
        relation = f"{child_key}->{parent_key}"
    key_type = child_ds.schema().base_schema.field(child_key).type

    def _key_hash(col) -> "np.ndarray":
        import numpy as np

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            return _mix64(col.cast(pa.int64()).fill_null(0).to_numpy(
                zero_copy_only=False).astype(np.int64).view(np.uint64))
        return fnv1a64_strings(col.cast(pa.string()).fill_null(""))

    import numpy as np

    npart = np.uint64(num_partitions)

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or child_key not in t.column_names:
            return pa.table({"__fk": pa.array([], key_type),
                             "__n": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        g = (t.select([child_key]).group_by(child_key)
             .aggregate([([], "count_all")]))
        fk = g.column(child_key)
        nulls = pc.is_null(fk).to_numpy(zero_copy_only=False)
        part = (_key_hash(fk) % npart).astype(np.int64)
        part[nulls] = 0  # null keys co-locate deterministically
        return pa.table({
            "__fk": fk,
            "__n": g.column("count_all").cast(pa.int64()),
            "__part": pa.array(part, pa.int64())})

    tagged = (child_ds.select_columns([child_key])
              .map_batches(combine, batch_format="pyarrow"))

    # Parent distinct keys: per-block combiner, then either a driver
    # fold + broadcast (small parent) or the bloom path (large).
    n_parent = parent_ds.count()
    use_broadcast = n_parent <= broadcast_limit

    if use_broadcast:
        def pdistinct(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or parent_key not in t.column_names:
                return pa.table({"__pk": pa.array([], key_type)})
            g = (t.select([parent_key]).group_by(parent_key)
                 .aggregate([]))
            return pa.table({
                "__pk": g.column(parent_key).drop_null()})

        pk_tables = [t for t in ray.get(
            parent_ds.select_columns([parent_key])
            .map_batches(pdistinct, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows]
        if pk_tables:
            pk_all = pa.concat_tables(pk_tables)
            pk_set = (pk_all.group_by("__pk").aggregate([])
                      .column("__pk").combine_chunks())
        else:
            pk_set = pa.array([], key_type)
        pk_ref = ray.put(pk_set)
    else:
        pk_ref = None

    out_schema = pa.schema([
        ("__nrows", pa.int64()), ("__nulls", pa.int64()),
        ("__drows", pa.int64()), ("__dkeys", pa.int64())])

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        g = (group.select(["__fk", "__n"]).group_by("__fk")
             .aggregate([("__n", "sum")]))
        fk = g.column("__fk")
        n = g.column("__n_sum").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        nulls = pc.is_null(fk).to_numpy(zero_copy_only=False)
        total = int(n.sum())
        null_rows = int(n[nulls].sum())
        if pk_ref is not None:
            pk = ray.get(pk_ref)
            hit = pc.is_in(fk, value_set=pk).to_numpy(
                zero_copy_only=False)
            dangle = ~hit & ~nulls
            drows, dkeys = int(n[dangle].sum()), int(dangle.sum())
        else:
            drows = dkeys = -1  # resolved by the bloom path below
        return pa.table({
            "__nrows": pa.array([total], pa.int64()),
            "__nulls": pa.array([null_rows], pa.int64()),
            "__drows": pa.array([drows], pa.int64()),
            "__dkeys": pa.array([dkeys], pa.int64())})

    parts_ds = (tagged.groupby("__part")
                .map_groups(scan_partition, batch_format="pyarrow")
                .materialize())
    parts = [t for t in ray.get(parts_ds.to_arrow_refs())
             if t.num_rows]
    child_rows = sum(int(pc.sum(t.column("__nrows")).as_py() or 0)
                     for t in parts)
    null_keys_rows = sum(int(pc.sum(t.column("__nulls")).as_py() or 0)
                         for t in parts)

    if use_broadcast:
        dangling_rows = sum(
            int(pc.sum(t.column("__drows")).as_py() or 0)
            for t in parts)
        dangling_keys = sum(
            int(pc.sum(t.column("__dkeys")).as_py() or 0)
            for t in parts)
        return ray.data.from_arrow(_result_table(
            relation, child_rows, null_keys_rows, dangling_rows,
            dangling_keys))

    # large-parent path: exact anti-join of the distinct child keys
    from torray.ops.bloom import bloom_antijoin

    def distinct_keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__fk": pa.array([], key_type),
                             "__n": pa.array([], pa.int64())})
        g = (t.select(["__fk", "__n"]).group_by("__fk")
             .aggregate([("__n", "sum")]))
        keep = g.filter(g.column("__fk").is_valid())
        return pa.table({
            "__fk": keep.column("__fk"),
            "__n": keep.column("__n_sum").cast(pa.int64())})

    keys = (tagged.groupby("__part")
            .map_groups(distinct_keys, batch_format="pyarrow")
            .materialize())
    if child_rows - null_keys_rows == 0:
        return ray.data.from_arrow(_result_table(
            relation, child_rows, null_keys_rows, 0, 0))
    dangling = bloom_antijoin(
        keys, parent_ds.select_columns([parent_key]),
        big_key="__fk", small_key=parent_key).materialize()
    dangling_keys = int(dangling.count())
    dangling_rows = 0 if dangling_keys == 0 else _fold_int(
        dangling.map_batches(
            lambda t: pa.table({"__t": pa.array(
                [int(pc.sum(t.column("__n")).as_py() or 0)],
                pa.int64())})
            if t.num_rows else pa.table(
                {"__t": pa.array([], pa.int64())}),
            batch_format="pyarrow"), "__t")
    return ray.data.from_arrow(_result_table(
        relation, child_rows, null_keys_rows, dangling_rows,
        dangling_keys))


def fk_audit(relations):
    """Audit a list of FK edges; returns one Dataset with one row per
    edge (``relations``: iterable of ``(relation_name, child_ds,
    child_key, parent_ds, parent_key)``).  Each edge audit is a
    bounded one-row result, so the union is driver-safe at any
    schema size."""
    import ray
    import ray.data

    tables = []
    for name, child_ds, child_key, parent_ds, parent_key in relations:
        one = referential_audit(child_ds, child_key, parent_ds,
                                parent_key, relation=name)
        tables.append(pa.concat_tables(
            [t for t in ray.get(one.to_arrow_refs()) if t.num_rows]))
    return ray.data.from_arrow(pa.concat_tables(tables))


def dataset_checksum(ds, cols):
    """Order- and partition-INVARIANT content checksum: a commutative
    fold (uint64 wraparound SUM) of per-row hashes over the selected
    columns — the replica/resume verifier ("did the re-run, the
    compaction, or the copy on the other cluster produce the same
    multiset of rows?") that never needs a sort or a shuffle.

    Per block: each column vectorized-hashes (splitmix64 for ints,
    FNV-1a for strings — the same kernels the dedup/bloom ops use,
    no Python per value), columns mix into one row hash, rows fold to
    ONE (count, sum) partial per block; the driver folds block
    partials.  Any single-row change flips the checksum with
    probability 1 - 2^-64; swapping rows between partitions cannot.

    Returns a one-row Dataset ``(n_rows, checksum)`` (checksum is the
    uint64 sum bit-cast to int64).  Multiset semantics: duplicate
    rows each contribute.
    """
    import ray
    import ray.data

    from torray.ops.dedup import _mix64, fnv1a64_strings

    cols = list(cols)

    def _col_hash(col) -> "np.ndarray":
        import numpy as np

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
        if pa.types.is_integer(t) or pa.types.is_temporal(t):
            base = col.cast(pa.int64()).fill_null(0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            h = _mix64(base.view(np.uint64))
        elif pa.types.is_floating(t):
            base = col.fill_null(0.0).to_numpy(
                zero_copy_only=False).astype(np.float64)
            base = np.where(base == 0.0, 0.0, base)  # -0.0 == 0.0
            h = _mix64(base.view(np.uint64))
        else:
            h = fnv1a64_strings(col.cast(pa.string()).fill_null(""))
        # nulls hash distinctly from any value (incl. 0 / "")
        return np.where(null_mask, np.uint64(0x9E3779B97F4A7C15), h)

    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or cols[0] not in t.column_names:
            return pa.table({"__n": pa.array([], pa.int64()),
                             "__s": pa.array([], pa.int64())})
        acc = np.zeros(t.num_rows, np.uint64)
        for c in cols:
            acc = _mix64(acc + _col_hash(t.column(c)))
        with np.errstate(over="ignore"):
            total = np.uint64(np.sum(acc, dtype=np.uint64))
        return pa.table({
            "__n": pa.array([t.num_rows], pa.int64()),
            "__s": pa.array([int(total.view(np.int64))], pa.int64())})

    parts = [t for t in ray.get(
        ds.select_columns(cols).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    n = sum(int(pc.sum(t.column("__n")).as_py() or 0) for t in parts)
    s = np.uint64(0)
    with np.errstate(over="ignore"):
        for t in parts:
            vals = t.column("__s").to_numpy(
                zero_copy_only=False).astype(np.int64)
            s = s + np.uint64(np.sum(vals.view(np.uint64),
                                     dtype=np.uint64))
    return ray.data.from_arrow(pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "checksum": pa.array([int(s.view(np.int64))], pa.int64())}))
