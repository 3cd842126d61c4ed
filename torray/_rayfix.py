"""Targeted fix for a Ray 2.49 hash-shuffle join crash on sparse inputs.

Upstream bug (``ray/data/_internal/execution/operators/hash_shuffle.py``,
Ray 2.49.x): the hash-shuffle operator disseminates each side's schema to
every aggregator partition by fanning out empty schema'd shards from the
FIRST block of each input sequence (``send_empty_blocks=True``).  But
``_shuffle_block`` short-circuits on a zero-row input block *before* that
broadcast, while the driver unconditionally marks the sequence's schema
as broadcast.  Any side whose first block happens to be empty (routine
after a selective ``filter``) therefore never ships its schema, and
every partition that receives no rows from that side builds a
SCHEMALESS empty table — ``JoiningShuffleAggregation.finalize`` then
dies in acero with ``ArrowInvalid: No match ... for key field
reference``.  This bites real pipelines, not just empty inputs: a 3-row
table joined at ``num_partitions=4`` crashes whenever block order puts
an empty block first.

The fix wraps the ``_shuffle_block`` remote function: when asked to
broadcast schemas and handed a zero-row block, it performs the
schema-broadcast fan-out itself (the exact shards the original code
builds for non-empty blocks) instead of short-circuiting; every other
call path delegates verbatim to the original implementation.

Applied at ``import torray`` time, guarded to Ray 2.49.x: on any other
version the patch is a no-op so an upstream fix wins.
"""

from __future__ import annotations

_PATCHED = False


def apply() -> bool:
    """Install the patch (idempotent). Returns True when active."""
    global _PATCHED
    if _PATCHED:
        return True

    import ray

    if not ray.__version__.startswith("2.49."):
        return False

    from ray.data._internal.execution.operators import hash_shuffle as _hs

    _orig = _hs._shuffle_block._function

    @ray.remote
    def _shuffle_block_schema_safe(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        if send_empty_blocks:
            from ray.data._internal.table_block import TableBlockAccessor
            from ray.data.block import BlockAccessor, BlockExecStats, BlockType

            stats = BlockExecStats.builder()
            blk = block_transformer(block) if block_transformer else block
            blk = TableBlockAccessor.try_convert_block_type(
                blk, block_type=BlockType.ARROW
            )
            if blk.num_rows == 0 and len(blk.schema) > 0:
                # the case upstream drops: broadcast this (empty) block's
                # schema to EVERY partition so no aggregator ends up
                # schemaless, then ack like a normal shuffle task.
                empty = _hs._create_empty_table(blk.schema)
                empty_ref = ray.put(empty)
                waits = [
                    pool.get_aggregator_for_partition(pid).submit.remote(
                        input_index, pid, empty_ref
                    )
                    for pid in range(pool.num_partitions)
                ]
                while waits:
                    _, waits = ray.wait(waits, num_returns=len(waits), timeout=1)
                meta = BlockAccessor.for_block(blk).get_metadata(
                    exec_stats=stats.build()
                )
                return meta, {}
        return _orig(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=block_transformer,
            send_empty_blocks=send_empty_blocks,
            override_partition_id=override_partition_id,
        )

    _hs._shuffle_block = _shuffle_block_schema_safe

    # Companion driver-side fix: the operator marks a sequence's schema
    # as broadcast after its FIRST shuffle task regardless of whether
    # that block could carry a schema (a groupby upstream emits
    # SCHEMALESS empty blocks for empty partitions, and one of those
    # being first silently disables the broadcast for the whole
    # sequence).  Instead, as soon as a bundle WITH a schema arrives,
    # fan out typed empty shards to every partition from the driver —
    # driver->actor calls are ordered, so these land before any
    # driver-issued finalize().  Bundles with no schema leave the flag
    # unset so a later schema-bearing bundle still broadcasts.
    import pyarrow as pa

    _orig_add = _hs.HashShufflingOperatorBase._do_add_input_inner

    def _add_input_schema_safe(self, input_bundle, input_index):
        if not self._has_schemas_broadcasted[input_index]:
            sch = getattr(input_bundle.schema, "base_schema",
                          input_bundle.schema)
            if isinstance(sch, pa.Schema) and len(sch) > 0:
                empty_ref = ray.put(_hs._create_empty_table(sch))
                pool = self._aggregator_pool
                for pid in range(pool.num_partitions):
                    pool.get_aggregator_for_partition(pid).submit.remote(
                        input_index, pid, empty_ref
                    )
                self._has_schemas_broadcasted[input_index] = True
                return _orig_add(self, input_bundle, input_index)
            # This bundle cannot deliver a schema (no/0-field schema and
            # only zero-row blocks — upstream groupbys emit those for
            # empty partitions), but the original loop still flips the
            # broadcast flag on its first block.  Undo that so the next
            # schema-bearing bundle still broadcasts.
            if all((m.num_rows or 0) == 0 for m in input_bundle.metadata):
                out = _orig_add(self, input_bundle, input_index)
                self._has_schemas_broadcasted[input_index] = False
                return out
        return _orig_add(self, input_bundle, input_index)

    _hs.HashShufflingOperatorBase._do_add_input_inner = _add_input_schema_safe

    _PATCHED = True
    return True
