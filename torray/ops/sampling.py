"""Deterministic sampling / splitting operators for training-data
pipelines: hash-based train/test splits and per-group row caps.

Both are pure ``map_batches`` / ``map_groups`` transforms keyed on a
stable content hash (md5 of the id), so results are independent of
partitioning, ordering, and cluster size — the property that makes a
split reproducible across reruns of a 100 TB pipeline.  Both have
exact SQL equivalents (the md5-prefix trick: the first 8 lowercase hex
chars compare lexicographically exactly like the integer they encode),
so the driver hash-checks them against DuckDB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["hash_split", "sample_per_group", "filter_by_quantile"]


def _hash_prefix(value, salt: str) -> str:
    return hashlib.md5(f"{value}{salt}".encode()).hexdigest()[:8]


def hash_split(ds, id_col: str, test_frac: float = 0.2, salt: str = ""):
    """Add a ``split`` column ('train' / 'test'): a row is 'test' iff
    the first 8 hex chars of ``md5(id || salt)`` fall below the
    fraction threshold.  Deterministic per id; changing ``salt``
    re-rolls the split without touching the data."""
    threshold = format(int(test_frac * 0x100000000), "08x")

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        splits = ["test" if _hash_prefix(v, salt) < threshold else "train"
                  for v in ids]
        return batch.append_column("split", pa.array(splits, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def sample_per_group(ds, group_col: str, n: int, id_col: str,
                     salt: str = ""):
    """Keep at most ``n`` rows per group — the rows with the smallest
    ``md5(id || salt)`` (ties broken by id).  One ``groupby`` shuffle;
    the per-group cut is a vectorized argsort.  This is the standard
    per-source / per-domain cap of web-corpus curation, made
    deterministic and partition-independent."""

    def cut(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        keys = np.asarray([_hash_prefix(v, salt) for v in ids])
        order = np.lexsort((np.asarray(ids), keys))[:n]
        return group.take(pa.array(np.sort(order), pa.int64()))

    return ds.groupby(group_col).map_groups(cut, batch_format="pyarrow")


def filter_by_quantile(ds, col: str, q: float, *, keep: str = "ge"):
    """Quantile-gated filter — the curation primitive "drop the worst
    X% of the corpus by this score" (quality gating, length flooring).

    The cut point is computed EXACTLY by
    :func:`torray.ops.sketch.exact_quantiles` (shuffle-free multipass
    selection, ``quantile_disc`` semantics), then applied as one
    vectorized streaming filter — two extra passes over one column,
    zero shuffles, and the result is reproducible bit-for-bit against
    ``WHERE col >= (SELECT quantile_disc(col, q) ...)``.

    ``keep``: ``"ge"`` keeps rows >= the cut (drop the bottom),
    ``"le"`` keeps rows <= the cut (drop the top).
    """
    import pyarrow.compute as pc

    from torray.ops.sketch import exact_quantiles

    if keep not in ("ge", "le"):
        raise ValueError(f"keep must be 'ge' or 'le', got {keep!r}")
    cut = exact_quantiles(ds, col, [q])[float(q)]
    if np.isnan(cut):
        return ds  # empty input: nothing to gate
    op = pc.greater_equal if keep == "ge" else pc.less_equal
    return ds.map_batches(
        lambda t: t.filter(op(pc.cast(t.column(col), pa.float64()), cut)),
        batch_format="pyarrow")
