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

__all__ = ["broadcast_join"]


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
    small = (pa.concat_tables(small_tables) if small_tables
             else small_ds.schema().base_schema.empty_table())
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
