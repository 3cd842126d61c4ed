"""Per-group ranking operators: deterministic top-k rows per group.

``group_topk`` is the standard "best k documents per domain / per
language" cut of corpus curation.  It is shuffle-light by
construction: every upstream batch is cut to at most k rows per group
*before* the ``groupby`` exchange (a correct partial — the global
top-k per group is contained in the union of per-batch top-k's), so
the shuffle carries O(k * groups * blocks) narrow rows instead of
whole groups.  The final per-group cut is the same vectorized sort.

Determinism: ties on the score are broken by ascending id, so results
are independent of partitioning and execution order (the same
property the sampling ops in :mod:`torray.ops.sampling` guarantee),
and the operator has an exact SQL equivalent
(``row_number() OVER (PARTITION BY g ORDER BY score DESC, id)``)
that the driver hash-checks against DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["group_topk", "topk_table"]


def topk_table(t: pa.Table, group_col: str, score_col: str, k: int,
               id_col: str, descending: bool = True) -> pa.Table:
    """Vectorized top-k-per-group cut of ONE Arrow table: sort by
    (group, score, id) with one lexsort, then keep the first k
    positions of every group run.  No Python rows."""
    if t.num_rows == 0:
        return t
    groups = t.column(group_col).to_numpy(zero_copy_only=False)
    scores = t.column(score_col).to_numpy(zero_copy_only=False)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    # Factorize the group values so lexsort runs on int codes even for
    # string groups.
    _, codes = np.unique(groups, return_inverse=True)
    skey = -scores if descending else scores
    order = np.lexsort((ids, skey, codes))
    sorted_codes = codes[order]
    # Rank within each group run: position minus the run's start.
    boundary = np.empty(len(order), np.bool_)
    boundary[0] = True
    np.not_equal(sorted_codes[1:], sorted_codes[:-1], out=boundary[1:])
    run_start = np.maximum.accumulate(
        np.where(boundary, np.arange(len(order)), 0))
    rank = np.arange(len(order)) - run_start
    keep = order[rank < k]
    return t.take(pa.array(np.sort(keep), pa.int64()))


def group_topk(ds, group_col: str, score_col: str, k: int, id_col: str,
               *, descending: bool = True):
    """Top-k rows per group by ``score_col`` (ties broken by ascending
    ``id_col``).  One narrow shuffle: batches are pre-cut to k rows
    per group, then a single ``groupby().map_groups`` finishes the
    cut.  Returns the full input columns of the surviving rows."""

    def partial(batch: pa.Table) -> pa.Table:
        return topk_table(batch, group_col, score_col, k, id_col,
                          descending)

    def final(group: pa.Table) -> pa.Table:
        return topk_table(group, group_col, score_col, k, id_col,
                          descending)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(final, batch_format="pyarrow"))
