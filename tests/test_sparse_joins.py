"""Sparse/hostile join coverage: `safe_join` and the Ray 2.49 schema-
broadcast fix (torray/_rayfix.py).

Ray 2.49's hash-shuffle join crashes whenever an aggregator partition
receives zero blocks from one side — routine with empty inputs, tiny
inputs at num_partitions > rows, or a side whose FIRST block is a
schemaless empty (every upstream groupby emits those for empty
partitions).  These tests plant each of those shapes and check the
join result against pyarrow's own Table.join on the same data.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from torray.ops.join import safe_join


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


LEFT = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                 "v": pa.array([10, 20, 30, 40], pa.int64())})
RIGHT = pa.table({"k": pa.array([2, 4, 9], pa.int64()),
                  "w": pa.array([5, 7, 9], pa.int64())})


def _rows(ds_or_tbl):
    if isinstance(ds_or_tbl, pa.Table):
        t = ds_or_tbl
    else:
        parts = list(ds_or_tbl.iter_batches(batch_format="pyarrow"))
        parts = [p for p in parts if p.num_rows or p.num_columns]
        if parts:
            t = pa.concat_tables(parts, promote_options="default")
        else:
            sch = getattr(ds_or_tbl.schema(), "base_schema", None)
            t = sch.empty_table() if isinstance(sch, pa.Schema) \
                else pa.table({})
    cols = sorted(t.column_names)
    rows = [tuple(r[c] for c in cols) for r in t.to_pylist()]
    return cols, sorted(rows, key=lambda r: tuple(
        (x is None, x) for x in r))


@pytest.mark.parametrize("how", ["inner", "left_outer", "full_outer"])
def test_safe_join_tiny_high_partitions(ray_session, how):
    got = safe_join(_ds(LEFT), _ds(RIGHT), how, 8, on=("k",))
    want = LEFT.join(RIGHT, keys=["k"],
                     join_type=how.replace("_", " "))
    assert _rows(got) == _rows(want)


@pytest.mark.parametrize("how", ["inner", "left_outer", "full_outer"])
def test_safe_join_one_side_empty(ray_session, how):
    empty_right = RIGHT.slice(0, 0)
    got = safe_join(_ds(LEFT), _ds(empty_right), how, 4, on=("k",))
    want = LEFT.join(empty_right, keys=["k"],
                     join_type=how.replace("_", " "))
    assert _rows(got) == _rows(want)


def test_safe_join_derived_schemaless_side(ray_session):
    # a filter that kills every row yields zero-block/schemaless sides
    right = _ds(RIGHT).filter(expr="w > 100")
    got = safe_join(_ds(LEFT), right, "inner", 4, on=("k",))
    assert got.count() == 0
    got2 = safe_join(_ds(LEFT), right, "left_outer", 4, on=("k",))
    assert got2.count() == LEFT.num_rows


def test_join_after_groupby_first_block_schemaless(ray_session):
    # upstream groupbys emit schemaless empty blocks for empty
    # partitions; one of those arriving FIRST used to permanently
    # disable Ray's schema broadcast for the whole sequence
    left = _ds(LEFT).groupby("k").count()
    right = _ds(RIGHT).groupby("k").count()
    got = safe_join(left, right, "full_outer", 8,
                    on=("k",), right_on=("k",),
                    left_suffix="_l", right_suffix="_r")
    # keys 1..4 from left, 2/4/9 from right -> 5 distinct keys
    assert got.count() == 5


def test_raw_dataset_join_sparse_survives_rayfix(ray_session):
    # the _rayfix schema-broadcast patch must make even a RAW
    # Dataset.join survive the sparse-side case
    left = _ds(LEFT).groupby("k").count()
    right = _ds(RIGHT).filter(expr="w >= 7").groupby("k").count()
    j = left.join(right, "inner", num_partitions=8, on=("k",),
                  left_suffix="_l", right_suffix="_r")
    assert j.count() == 1  # only k=4 survives the filter on both sides
