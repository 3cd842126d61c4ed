"""Sequence packing for pretraining-batch construction: assign every
document a bin id such that bins partition the GLOBAL concatenation
order into fixed-capacity token chunks — the standard concat-and-chunk
packing (a document belongs to the chunk its first token lands in,
``bin = floor(global_start_offset / bin_cap)``).

This formulation is deterministic (global order = ``id_col`` asc),
exact, fully vectorized, and — unlike greedy first-fit, which is an
inherently sequential scan — distributable with the same two-pass
counting shape as :func:`torray.ops.rank.global_rank`:

1. approximate id splitters bucket the rows (balance only — ids are
   unique so buckets never split a tie),
2. per-bucket TOKEN sums fold to an exclusive prefix on the driver
   (O(buckets) ints, never O(rows)),
3. ONE ``groupby(bucket)`` sorts each bucket by id and emits
   ``(prefix_tokens[bucket] + local exclusive cumsum) // bin_cap``.

SQL twin (hash-checked by the driver)::

    sum(len) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING) - len
    -- = the exclusive global offset; bin = offset // bin_cap
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["pack_sequences"]


def pack_sequences(ds, *, id_col: str, len_col: str, bin_cap: int,
                   num_buckets: int = 128):
    """Returns ``(id_col, bin)``: the concat-and-chunk bin of every
    row when rows are laid out in ``id_col`` order and split every
    ``bin_cap`` tokens.  ``len_col`` must be a non-negative integer
    token/char count; ids must be unique (they define the order).

    Partitioning assumption: a bucket (~N/num_buckets rows) fits in a
    task; size ``num_buckets`` to the cluster."""
    import ray

    from torray.ops.sketch import approx_quantiles

    if bin_cap <= 0:
        raise ValueError("bin_cap must be positive")
    narrow = ds.select_columns([id_col, len_col])

    qs = [i / num_buckets for i in range(1, num_buckets)]
    est = approx_quantiles(narrow, id_col, qs)
    splitters = np.unique(np.asarray(list(est.values()), np.float64))

    def tag(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        b = np.searchsorted(splitters, ids, side="left").astype(
            np.int64)
        return pa.table({"__b": pa.array(b, pa.int64()),
                         id_col: t.column(id_col),
                         "__len": pc.cast(t.column(len_col),
                                          pa.int64())})

    tagged = narrow.map_batches(tag, batch_format="pyarrow")
    tagged = tagged.materialize()  # two consumers: sums + pack scan

    def bucket_sums(t: pa.Table) -> pa.Table:
        g = t.select(["__b", "__len"]).group_by("__b").aggregate(
            [("__len", "sum")])
        return g.rename_columns(["__b", "__t"])

    tok = np.zeros(len(splitters) + 1, np.int64)
    for ref in tagged.map_batches(
            bucket_sums, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            np.add.at(tok,
                      t.column("__b").to_numpy(zero_copy_only=False),
                      t.column("__t").to_numpy(zero_copy_only=False))
    prefix = np.concatenate(([0], np.cumsum(tok)[:-1]))

    def pack_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                id_col: pa.array([], g.schema.field(id_col).type),
                "bin": pa.array([], pa.int64())})
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        lens = g.column("__len").to_numpy(zero_copy_only=False)
        b = int(g.column("__b")[0].as_py())
        order = np.argsort(ids, kind="stable")
        ls = lens[order]
        start = prefix[b] + np.cumsum(ls) - ls  # exclusive offsets
        return pa.table({
            id_col: pc.take(g.column(id_col),
                            pa.array(order, pa.int64())),
            "bin": pa.array(start // bin_cap, pa.int64()),
        })

    return (tagged.groupby("__b")
            .map_groups(pack_bucket, batch_format="pyarrow"))
