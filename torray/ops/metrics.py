"""Exact distributed model-evaluation metrics: ROC AUC and
calibration bins.

A training-data pipeline that scores documents (quality classifiers,
fluency models, dedup verifiers) needs to EVALUATE those scorers at
corpus scale: AUC against a labeled slice, and reliability/calibration
curves.  Both operators here follow the repo's exactness discipline
(see ``ops.moments``): scores are integer-scaled per batch, every
count/rank statistic is an exact int64 (object-int where products can
exceed int64), and each float in the output is ONE mirrored expression
the SQL oracle reproduces token for token.

:func:`auc_exact` computes the Mann–Whitney formulation of ROC AUC
with PROPER TIE HANDLING (average ranks):

    AUC = (2*R_pos - n_pos*(n_pos+1)) / (2 * n_pos * n_neg)

where ``R_pos`` is the rank-sum of the positive class under average
ranks, accumulated as the exact integer ``2*R_pos`` (twice the rank
sum is always integral even when tie groups have even size).  For a
tie group at distinct score ``s`` with ``n`` members, ``cum`` rows
strictly below it, and ``n_pos_s`` positives, every member's doubled
average rank is ``2*cum + n + 1``, so

    2*R_pos = sum over distinct scores of n_pos_s * (2*cum + n + 1).

Scale shape: per-block Arrow ``group_by`` combiners collapse rows to
``(scaled_score, n, n_pos)`` — the shuffle is bounded by
distinct-scores x blocks, never row count; one narrow groupby-sum;
then a single-task fold over the DISTINCT-SCORE table, which is
bounded by the score value domain (with ``scale=100`` and scores in
[0, 1000) that is at most 100k rows regardless of corpus size — the
fold is O(domain), not O(rows)).  The big products use object-int
numpy so 10^10-row corpora cannot overflow.

:func:`calibration_bins` is the reliability diagram: fixed-width score
bins, per-bin exact ``(n, n_pos, sum_score_scaled)``; ``mean_score``
and ``frac_pos`` are the two mirrored divides.  Per-block bincount
combiners bound the shuffle by bins x blocks.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["auc_exact", "calibration_bins", "rank_eval",
           "auc_by_group"]


def _scaled_int(col: pa.ChunkedArray, scale: int) -> np.ndarray:
    """round(v * scale) half away from zero (SQL round()), int64."""
    x = np.asarray(col.to_numpy(zero_copy_only=False),
                   np.float64) * scale
    return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)


def auc_exact(ds, *, label_col: str, score_col: str,
              scale: int = 100):
    """EXACT ROC AUC of ``score_col`` against boolean/0-1
    ``label_col`` with average-rank tie handling (the Mann–Whitney
    statistic — identical to what sklearn's ``roc_auc_score``
    computes, but distributed and integer-exact).

    Returns a one-row Dataset ``(n_pos, n_neg, auc)``; ``auc`` is the
    ONE mirrored float divide
    ``(2*R_pos - n_pos*(n_pos+1)) / (2*n_pos*n_neg)`` from exact
    integer numerator and denominator (NULL when either class is
    empty, matching SQL division-by-zero-free semantics).

    Scores are compared at ``scale`` decimal-int resolution
    (``round(score*scale)``), which the SQL oracle mirrors — for
    2-decimal inputs and ``scale>=100`` this is exact equality.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__s": pa.array([], pa.int64()),
                             "__n": pa.array([], pa.int64()),
                             "__p": pa.array([], pa.int64())})
        s = _scaled_int(t.column(score_col), scale)
        lab = np.asarray(t.column(label_col).to_numpy(
            zero_copy_only=False), np.int64)
        base = pa.table({"__s": pa.array(s, pa.int64()),
                         "__one": pa.array(
                             np.ones(len(s), np.int64), pa.int64()),
                         "__lab": pa.array(lab, pa.int64())})
        g = base.group_by("__s").aggregate(
            [("__one", "sum"), ("__lab", "sum")])
        return pa.table({
            "__s": g.column("__s"),
            "__n": g.column("__one_sum").cast(pa.int64()),
            "__p": g.column("__lab_sum").cast(pa.int64())})

    per_score = (ds.select_columns([label_col, score_col])
                 .map_batches(partial, batch_format="pyarrow")
                 .groupby("__s").aggregate(Sum("__n"), Sum("__p")))

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_pos": pa.array([0], pa.int64()),
                             "n_neg": pa.array([0], pa.int64()),
                             "auc": pa.array([None], pa.float64())})
        s = t.column("__s").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n = t.column("sum(__n)").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        p = t.column("sum(__p)").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.argsort(s, kind="stable")
        n, p = n[order], p[order]
        cum = np.concatenate(([0], np.cumsum(n)[:-1]))
        # object ints: p * (2*cum + n + 1) can pass int64 at 10^10
        # rows; the table is bounded by the score domain, so the
        # object-dtype elementwise product stays cheap.
        two_rpos = int(np.sum(p.astype(object)
                              * (2 * cum + n + 1).astype(object)))
        n_pos = int(np.sum(p, dtype=np.int64))
        n_tot = int(np.sum(n, dtype=np.int64))
        n_neg = n_tot - n_pos
        if n_pos == 0 or n_neg == 0:
            auc = None
        else:
            num = two_rpos - n_pos * (n_pos + 1)
            den = 2 * n_pos * n_neg
            auc = float(num) / float(den)
        return pa.table({
            "n_pos": pa.array([n_pos], pa.int64()),
            "n_neg": pa.array([n_neg], pa.int64()),
            "auc": pa.array([auc], pa.float64())})

    return per_score.repartition(1).map_batches(
        fold, batch_format="pyarrow")


def calibration_bins(ds, *, label_col: str, score_col: str,
                     bin_width: float, n_bins: int,
                     scale: int = 100):
    """Reliability-diagram bins: fixed-width score buckets
    ``bin = floor(score_scaled / bin_width_scaled)`` clamped to
    ``[0, n_bins-1]``, with exact per-bin ``(n, n_pos,
    sum_score_scaled)`` and the two mirrored floats
    ``mean_score = sum_score_scaled / (scale * n)`` and
    ``frac_pos = n_pos / n``.

    Returns ``(bin, n, n_pos, mean_score, frac_pos)`` sorted by bin;
    only non-empty bins appear (SQL GROUP BY semantics).  Per-block
    bincount combiners bound the shuffle by ``n_bins x blocks``.
    """
    from ray.data.aggregate import Sum

    w = int(round(bin_width * scale))
    if w <= 0:
        raise ValueError("bin_width must be positive at this scale")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "__n": pa.array([], pa.int64()),
                             "__p": pa.array([], pa.int64()),
                             "__ss": pa.array([], pa.int64())})
        s = _scaled_int(t.column(score_col), scale)
        lab = np.asarray(t.column(label_col).to_numpy(
            zero_copy_only=False), np.int64)
        b = np.clip(s // w, 0, n_bins - 1)
        cnt = np.bincount(b, minlength=n_bins)
        pos = np.bincount(b[lab != 0], minlength=n_bins)
        ssum = np.zeros(n_bins, np.int64)
        np.add.at(ssum, b, s)  # exact int64, no float53 boundary
        keep = cnt > 0
        idx = np.nonzero(keep)[0]
        return pa.table({
            "bin": pa.array(idx.astype(np.int64), pa.int64()),
            "__n": pa.array(cnt[keep].astype(np.int64), pa.int64()),
            "__p": pa.array(pos[keep].astype(np.int64), pa.int64()),
            "__ss": pa.array(ssum[keep], pa.int64())})

    folded = (ds.select_columns([label_col, score_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("bin").aggregate(Sum("__n"), Sum("__p"),
                                        Sum("__ss")))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "bin": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "n_pos": pa.array([], pa.int64()),
                "mean_score": pa.array([], pa.float64()),
                "frac_pos": pa.array([], pa.float64())})
        n = t.column("sum(__n)").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        p = t.column("sum(__p)").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ss = t.column("sum(__ss)").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nf = n.astype(np.float64)
        return pa.table({
            "bin": t.column("bin").cast(pa.int64()),
            "n": pa.array(n, pa.int64()),
            "n_pos": pa.array(p, pa.int64()),
            "mean_score": pa.array(
                ss.astype(np.float64) / (float(scale) * nf),
                pa.float64()),
            "frac_pos": pa.array(p.astype(np.float64) / nf,
                                 pa.float64())})

    return folded.map_batches(finish, batch_format="pyarrow").sort("bin")


def rank_eval(ds, *, query_col: str = "query_id",
              doc_col: str = "doc_id", score_col: str = "score",
              rel_col: str = "rel", k: int = 10,
              num_partitions: int = 64):
    """Per-query ranking-evaluation metrics for a scored candidate
    table ``(query, doc, score, rel)`` -> ``(query_id, n_docs,
    n_rel, first_rel_rank, rel_at_k, ndcg_e9)``:

    - ``first_rel_rank``: 1-based rank of the first relevant doc
      (reciprocal = MRR contribution; null when the query has none),
    - ``rel_at_k``: relevant docs inside the top ``k`` (precision@k
      numerator — exact int),
    - ``ndcg_e9``: binary-gain NDCG@k scaled by 1e9 and rounded to
      int64 (hash-stable; null when n_rel = 0).

    Ranking order is (score DESC, doc ASC) — a deterministic total
    order, so every metric is partition-invariant.  Shape: the
    standard hashed-partition run-scan — queries colocate by hash,
    ONE lexsort per partition, per-query folds via reduceat; no
    Python call per query."""
    from torray.ops.window import _hash_col_np

    cols = [query_col, doc_col, score_col, rel_col]

    def tag(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        if t.num_rows == 0:
            return t.append_column("__part", pa.array([], pa.int64()))
        q = t.column(query_col).to_numpy(zero_copy_only=False)
        part = (_hash_col_np(q)
                % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    disc = 1.0 / np.log2(np.arange(2, k + 2, dtype=np.float64))
    idcg_prefix = np.concatenate(([0.0], np.cumsum(disc)))

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "n_rel": pa.array([], pa.int64()),
                "first_rel_rank": pa.array([], pa.int64()),
                "rel_at_k": pa.array([], pa.int64()),
                "ndcg_e9": pa.array([], pa.int64())})
        q = group.column(query_col).to_numpy(zero_copy_only=False)
        d = group.column(doc_col).to_numpy(zero_copy_only=False)
        s = group.column(score_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        r = group.column(rel_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, -s, q))
        q, r = q[order], (r[order] != 0)
        starts = np.flatnonzero(np.concatenate(
            ([True], q[1:] != q[:-1])))
        lens = np.diff(np.append(starts, len(q)))
        pos = np.arange(len(q), dtype=np.int64) - np.repeat(
            starts, lens)  # 0-based rank within the query
        n_rel = np.add.reduceat(r.astype(np.int64), starts)
        # first relevant rank: min pos among relevant rows per run
        big = len(q) + 1
        frr_src = np.where(r, pos + 1, big)
        frr = np.minimum.reduceat(frr_src, starts)
        frr_arr = pa.array(
            np.where(frr == big, None, frr).tolist(), pa.int64())
        topk = r & (pos < k)
        rel_at_k = np.add.reduceat(topk.astype(np.int64), starts)
        gains = np.where(topk, np.concatenate(
            (disc, np.zeros(1)))[np.minimum(pos, k)], 0.0)
        dcg = np.add.reduceat(gains, starts)
        idcg = idcg_prefix[np.minimum(n_rel, k)]
        with np.errstate(divide="ignore", invalid="ignore"):
            ndcg = np.where(idcg > 0, dcg / idcg, np.nan)
        ndcg_arr = pa.array(
            [None if np.isnan(x) else int(round(x * 1e9))
             for x in ndcg], pa.int64())
        return pa.table({
            "query_id": pa.array(q[starts].tolist()),
            "n_docs": pa.array(lens, pa.int64()),
            "n_rel": pa.array(n_rel, pa.int64()),
            "first_rel_rank": frr_arr,
            "rel_at_k": pa.array(rel_at_k, pa.int64()),
            "ndcg_e9": ndcg_arr})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def auc_by_group(ds, *, group_col: str, label_col: str,
                 score_col: str, num_partitions: int = 64):
    """EXACT per-group ROC AUC -> ``(group, n, n_pos, auc)`` — the
    segment-sliced companion of :func:`auc_exact` (per-language model
    quality, per-source drift).  Mann-Whitney rank-sum with
    average-rank tie handling kept ALL-INTEGER until the final
    mirrored divide: a tie run's doubled average rank is
    ``2*rank_lo + len - 1`` (always int), so
    ``auc = (sum2 - n_pos*(n_pos+1)) / (2*n_pos*n_neg)`` is exact on
    both engine and SQL sides.  Null when a group lacks a class.

    Shape: hashed-partition run-scan — groups colocate by hash, ONE
    lexsort per partition, tie runs and positive sums fold with
    reduceat; no Python per group."""
    from torray.ops.window import _hash_col_np

    cols = [group_col, label_col, score_col]

    def tag(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        if t.num_rows == 0:
            return t.append_column("__part", pa.array([], pa.int64()))
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        part = (_hash_col_np(g)
                % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "group": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "n_pos": pa.array([], pa.int64()),
                "auc": pa.array([], pa.float64())})
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        y = (group.column(label_col).to_numpy(
            zero_copy_only=False).astype(np.int64) != 0)
        s = group.column(score_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        order = np.lexsort((s, g))
        g, y, s = g[order], y[order], s[order]
        gstarts = np.flatnonzero(np.concatenate(
            ([True], g[1:] != g[:-1])))
        glens = np.diff(np.append(gstarts, len(g)))
        # tie runs within each group: same group AND same score
        tstarts = np.flatnonzero(np.concatenate(
            ([True], (g[1:] != g[:-1]) | (s[1:] != s[:-1]))))
        tlens = np.diff(np.append(tstarts, len(g)))
        # 1-based low rank of each tie run WITHIN its group
        grp_of_run = np.searchsorted(gstarts, tstarts, "right") - 1
        rank_lo = tstarts - gstarts[grp_of_run] + 1
        rank2 = 2 * rank_lo + tlens - 1  # doubled average rank (int)
        rank2_per_row = np.repeat(rank2, tlens)
        n_pos = np.add.reduceat(y.astype(np.int64), gstarts)
        sum2 = np.add.reduceat(
            np.where(y, rank2_per_row, 0), gstarts)
        n_neg = glens - n_pos
        u2 = sum2 - n_pos * (n_pos + 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            auc = u2 / (2.0 * n_pos * n_neg)
        auc_arr = pa.array(
            [None if (np_ == 0 or nn == 0) else float(a)
             for a, np_, nn in zip(auc, n_pos, n_neg)], pa.float64())
        return pa.table({
            "group": pa.array(g[gstarts].tolist()),
            "n": pa.array(glens, pa.int64()),
            "n_pos": pa.array(n_pos, pa.int64()),
            "auc": auc_arr})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))
