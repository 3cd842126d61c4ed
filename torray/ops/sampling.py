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

__all__ = ["hash_split", "sample_per_group", "filter_by_quantile",
           "select_within_budget", "epoch_shuffle",
           "sample_global_k", "stratified_split", "weighted_sample_k",
           "winsorize", "mix_sources"]


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
                     salt: str = "", num_partitions: int = 64):
    """Keep at most ``n`` rows per group — the rows with the smallest
    ``md5(id || salt)`` (ties broken by id).  This is the standard
    per-source / per-domain cap of web-corpus curation, made
    deterministic and partition-independent.

    Partition RUN-SCAN shape (no Python call per group): groups hash
    into ``num_partitions`` coarse partitions, ONE groupby on the
    partition id, then one lexsort of (group, key, id) + a vectorized
    in-run rank cut per partition — a ``groupby(group).map_groups``
    would cost one interpreter call per group (millions of singleton
    calls at per-domain cardinality).  The md5 sort keys stay
    per-row md5 (they are the documented SQL-equivalent contract)."""
    from torray.ops.window import _hash_col_np

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "__skey", pa.array([], pa.string())).append_column(
                "__part", pa.array([], pa.int64()))
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        part = (_hash_col_np(g)
                % np.uint64(num_partitions)).astype(np.int64)
        keys = [_hash_prefix(v, salt)
                for v in batch.column(id_col).to_pylist()]
        return batch.append_column(
            "__skey", pa.array(keys, pa.string())).append_column(
            "__part", pa.array(part, pa.int64()))

    drop = ["__skey", "__part"]

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.drop_columns(
                [c for c in drop if c in group.column_names])
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        keys = group.column("__skey").to_numpy(zero_copy_only=False)
        ids = np.asarray(group.column(id_col).to_pylist())
        order = np.lexsort((ids, keys, g))
        gs = g[order]
        starts = np.flatnonzero(np.concatenate(([True],
                                                gs[1:] != gs[:-1])))
        lens = np.diff(np.append(starts, len(gs)))
        rank = np.arange(len(gs)) - np.repeat(starts, lens)
        keep = order[rank < n]
        return group.take(pa.array(np.sort(keep), pa.int64())
                          ).drop_columns(drop)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def sample_global_k(ds, id_col: str, k: int, salt: str = ""):
    """EXACTLY ``k`` rows sampled globally and deterministically: the
    rows with the ``k`` smallest ``(md5(id || salt) prefix, id)`` keys
    — a reproducible uniform sample whose membership is independent of
    partitioning, ordering, and cluster size (unlike
    ``Dataset.random_sample``, which is fraction-based and
    seed-per-run).  Changing ``salt`` re-rolls the sample.

    Scale shape: every block is cut to its LOCAL k smallest keys (a
    correct partial — the global k are contained in the union), so
    only ``k x blocks`` candidate rows reach the single-task final
    cut.  No shuffle, no sort, no driver pass over ids.  SQL
    equivalent: ``ORDER BY substr(md5(id || salt), 1, 8), id LIMIT
    k``."""

    def keyed(t: pa.Table) -> pa.Table:
        keys = pa.array([_hash_prefix(v, salt)
                         for v in t.column(id_col).to_pylist()],
                        pa.string())
        return t.append_column("__skey", keys)

    def cut(t: pa.Table) -> pa.Table:
        if t.num_rows > k:
            keys = t.column("__skey").to_numpy(zero_copy_only=False)
            ids = np.asarray(t.column(id_col).to_pylist())
            order = np.lexsort((ids, keys))[:k]
            t = t.take(pa.array(np.sort(order), pa.int64()))
        return t

    return (ds.map_batches(lambda t: cut(keyed(t)),
                           batch_format="pyarrow")
            .repartition(1)
            .map_batches(lambda t: cut(t).drop_columns(["__skey"]),
                         batch_format="pyarrow"))


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


def stratified_split(ds, *, group_col: str, id_col: str,
                     fractions: dict[str, int] | None = None,
                     salt: str = "", num_partitions: int = 64):
    """EXACT stratified train/val/test assignment: within every group
    (stratum), rows are ranked by the deterministic key ``(md5(id ||
    salt) prefix, id)`` and the first ``ceil(pct_1% * n)`` ranks get
    split 1, the next slice split 2, and so on — every stratum hits
    its target proportions exactly (vs :func:`hash_split`, which is
    proportional only in expectation), and membership is independent
    of partitioning, ordering, and cluster size.  Returns
    ``(id_col, split)``.

    ``fractions`` maps split name -> INTEGER percent (insertion order
    = slice order; must sum to 100).  Integer percents make the cut
    points exact integer arithmetic ``(cum_pct * n + 99) // 100`` on
    BOTH engines — a float ``ceil(0.8 * n)`` computes 4.0000000000002
    for some n and silently shifts a boundary rank.

    Scale shape: the same partition run-scan as
    :func:`sample_per_group` (groups hash into coarse partitions, ONE
    groupby on the partition id, one lexsort + vectorized threshold
    compare per partition — no Python call per group).  The md5 keys
    are the SQL-reproducibility contract (DuckDB ``md5()``), computed
    once per row in the tag pass."""
    from torray.ops.window import _hash_col_np

    fractions = fractions or {"train": 80, "val": 10, "test": 10}
    names = list(fractions)
    pcts = np.asarray([int(fractions[n]) for n in names], np.int64)
    if pcts.sum() != 100 or (pcts < 0).any():
        raise ValueError(
            f"fractions must be non-negative integer percents summing "
            f"to 100, got {fractions}")
    cum = np.cumsum(pcts)  # cut points; last is 100 -> rank < n always

    from torray.ops.window import _ds_field_type

    id_type = _ds_field_type(ds, id_col)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             "__g": pa.array([], pa.string()),
                             "__key": pa.array([], pa.string()),
                             "__part": pa.array([], pa.int64())})
        ids = batch.column(id_col).to_pylist()
        keys = pa.array([_hash_prefix(v, salt) for v in ids],
                        pa.string())
        g = batch.column(group_col).cast(pa.string())
        part = (_hash_col_np(np.asarray(g.to_pylist()))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({id_col: batch.column(id_col),
                         "__g": g, "__key": keys,
                         "__part": pa.array(part, pa.int64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             "split": pa.array([], pa.string())})
        g = np.asarray(group.column("__g").to_pylist())
        k = np.asarray(group.column("__key").to_pylist())
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k, g))
        g_s = g[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], g_s[1:] != g_s[:-1])))
        lens = np.diff(np.append(starts, len(g_s)))
        rank = (np.arange(len(g_s), dtype=np.int64)
                - np.repeat(starts, lens))
        n = np.repeat(lens, lens)
        # label = number of cut points at or below this rank
        label = np.zeros(len(g_s), np.int64)
        for c in cum[:-1]:
            label += rank >= (c * n + 99) // 100
        take = pa.array(order, pa.int64())
        return pa.table({
            id_col: group.column(id_col).take(take),
            "split": pa.array(np.asarray(names, object)[label],
                              pa.string()),
        })

    return (ds.select_columns([group_col, id_col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def weighted_sample_k(ds, id_col: str, weight_col: str, k: int,
                      salt: str = ""):
    """Deterministic weighted sample WITHOUT replacement: the ``k``
    rows with the largest ``u ** (1 / w)`` keys, where ``u`` is the
    md5-derived uniform ``int(md5(id || salt)[:8], 16) / 2**32`` and
    ``w`` the row's weight — the Efraimidis-Spirakis A-Res scheme
    (Inf. Proc. Letters 2006, public algorithm): inclusion probability
    is proportional to weight, membership is reproducible and
    independent of partitioning and cluster size, and changing
    ``salt`` re-rolls.  Non-positive / null weights never win
    (their key is 0).

    Scale shape: same as :func:`sample_global_k` — every block cuts to
    its LOCAL top-k keys (a correct partial), so only ``k x blocks``
    candidate rows reach the single-task final cut; no shuffle, no
    sort, no driver pass.  SQL equivalent: ``ORDER BY
    pow(u, 1.0 / w) DESC, id LIMIT k`` over the same md5 uniforms
    (both engines evaluate one IEEE ``pow``; ties are broken by id)."""

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        u = np.array([int(_hash_prefix(v, salt), 16) for v in ids],
                     np.float64) / float(1 << 32)
        w = np.asarray(t.column(weight_col).to_numpy(
            zero_copy_only=False), np.float64)
        good = np.isfinite(w) & (w > 0)
        key = np.zeros(len(u), np.float64)
        key[good] = u[good] ** (1.0 / w[good])
        return t.append_column("__wkey", pa.array(key, pa.float64()))

    def cut(t: pa.Table) -> pa.Table:
        if t.num_rows > k:
            keys = t.column("__wkey").to_numpy(zero_copy_only=False)
            ids = np.asarray(t.column(id_col).to_pylist())
            order = np.lexsort((ids, -keys))[:k]
            t = t.take(pa.array(np.sort(order), pa.int64()))
        return t

    return (ds.map_batches(lambda t: cut(keyed(t)),
                           batch_format="pyarrow")
            .repartition(1)
            .map_batches(lambda t: cut(t).drop_columns(["__wkey"]),
                         batch_format="pyarrow"))


def winsorize(ds, col: str, *, lo_q: float = 0.01, hi_q: float = 0.99,
              out_col: str | None = None):
    """Winsorize (clip) a column at exact quantile cut points — the
    outlier-taming step before normalization/statistics: values below
    the ``lo_q`` quantile move up to it, values above ``hi_q`` move
    down to it.

    Both cuts come from ONE :func:`torray.ops.sketch.exact_quantiles`
    call (shuffle-free multipass selection, ``quantile_disc``
    semantics), then a single vectorized streaming clamp — zero
    shuffles, and because clamping is pure comparison + copy (no
    float arithmetic) the output is reproducible bit-for-bit against
    the SQL ``CASE``-with-scalar-subquery form.  ``out_col`` defaults
    to replacing ``col`` in place.
    """
    import pyarrow.compute as pc

    from torray.ops.sketch import exact_quantiles

    if not (0.0 <= lo_q <= hi_q <= 1.0):
        raise ValueError("need 0 <= lo_q <= hi_q <= 1")
    cuts = exact_quantiles(ds, col, [lo_q, hi_q])
    lo_cut, hi_cut = cuts[float(lo_q)], cuts[float(hi_q)]
    target = out_col or col

    def clamp(t: pa.Table) -> pa.Table:
        if np.isnan(lo_cut):
            v = t.column(col)  # empty input: nothing to clamp
        else:
            v = pc.min_element_wise(
                pc.max_element_wise(
                    pc.cast(t.column(col), pa.float64()), lo_cut),
                hi_cut)
        if target in t.column_names:
            return t.set_column(
                t.column_names.index(target), target, v)
        return t.append_column(target, v)

    return ds.map_batches(clamp, batch_format="pyarrow")


def mix_sources(ds, *, source_col: str, id_col: str,
                fractions: dict[str, float],
                default_frac: float = 0.0, salt: str = ""):
    """Training-data mixing: keep each row with its SOURCE's target
    sampling rate — the corpus-mixture step of LLM data curation
    ("webtext at 30%, code at 100%, forums at 10%").  A row survives
    iff the first 8 hex chars of ``md5(id || salt)`` fall below its
    source's threshold — deterministic per id (re-runs and incremental
    builds sample identically), independent across salts, and exactly
    reproducible in SQL for the oracle.  Sources absent from
    ``fractions`` get ``default_frac``.

    Scale shape: stateless vectorized filter per batch, zero shuffle;
    the per-source rates ride the task closure.  The md5 is the same
    chunked digest loop as :func:`hash_split` — id counts per batch,
    not corpus-bounded."""
    def _thr(f: float) -> str:
        # frac >= 1.0 would format to 9 hex chars and break the
        # 8-char lexicographic compare; 'zzzzzzzz' > any hex string
        return ("zzzzzzzz" if f >= 1.0
                else format(int(f * 0x100000000), "08x"))

    thresholds = {s: _thr(f) for s, f in fractions.items()}
    default_thr = _thr(default_frac)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        srcs = batch.column(source_col).to_pylist()
        mask = [(_hash_prefix(v, salt)
                 < thresholds.get(s, default_thr))
                for v, s in zip(ids, srcs)]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def select_within_budget(ds, *, score_col: str, cost_col: str,
                         budget: int, id_col: str,
                         num_buckets: int = 256):
    """Global best-first selection under a COST BUDGET: keep rows in
    (score DESC, id ASC) order while the running cost total stays
    <= ``budget`` — the "fill the token budget with the best
    documents" primitive of corpus construction.  Returns
    ``(id_col, score_col, cost_col, cum_cost)`` for the selected
    rows; SQL twin is ``QUALIFY SUM(cost) OVER (ORDER BY score DESC,
    id ROWS UNBOUNDED PRECEDING) <= budget``.

    Exactness needs integer costs (token counts) — cumulative int64
    sums are order-exact on both engines.

    Shape (the :func:`torray.ops.rank.global_rank` two-pass counting
    skeleton — no global sort): approximate score splitters bucket
    the rows (equal scores never straddle a bucket); per-bucket cost
    TOTALS fold to an O(buckets) driver prefix from the top; ONE
    ``groupby(bucket)`` pass lexsorts each bucket locally, adds its
    exclusive prefix to the local cumsum, and emits survivors.
    Buckets whose entire prefix already exceeds the budget are cut
    without emitting rows."""
    import numpy as np

    from ray.data.aggregate import Sum

    from torray.ops.sketch import approx_quantiles

    qs = [i / num_buckets for i in range(1, num_buckets)]
    splits = np.unique(np.asarray(
        list(approx_quantiles(ds, score_col, qs).values()),
        dtype=np.float64))

    def tag(t: pa.Table) -> pa.Table:
        t = t.select([id_col, score_col, cost_col])
        if t.num_rows == 0:
            return t.append_column("__b", pa.array([], pa.int64()))
        v = t.column(score_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)  # null/NaN scores never selected
        t, v = t.filter(pa.array(ok)), v[ok]
        b = np.searchsorted(splits, v, side="left").astype(np.int64)
        return t.append_column("__b", pa.array(b, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def totals(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__b": pa.array([], pa.int64()),
                             "__c": pa.array([], pa.int64())})
        g = (t.select(["__b", cost_col]).group_by("__b")
             .aggregate([(cost_col, "sum")]))
        return pa.table({
            "__b": g.column("__b"),
            "__c": g.column(f"{cost_col}_sum").cast(pa.int64())})

    tot = (tagged.map_batches(totals, batch_format="pyarrow")
           .groupby("__b").aggregate(Sum("__c"))).to_pandas()
    per_bucket = np.zeros(len(splits) + 1, np.int64)
    if len(tot):
        per_bucket[tot["__b"].to_numpy()] = \
            tot["sum(__c)"].to_numpy()
    # exclusive prefix of cost ABOVE each bucket (higher score first)
    above = (np.cumsum(per_bucket[::-1])[::-1]
             - per_bucket)

    def scan_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            score_col: pa.array([], pa.float64()),
            cost_col: pa.array([], pa.int64()),
            "cum_cost": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        b = int(group.column("__b")[0].as_py())
        base = int(above[b])
        if base > budget:
            return empty
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        v = group.column(score_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        c = group.column(cost_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, -v))
        ids, v, c = ids[order], v[order], c[order]
        cum = base + np.cumsum(c)
        keep = cum <= budget
        return pa.table({
            id_col: pa.array(ids[keep]),
            score_col: pa.array(v[keep], pa.float64()),
            cost_col: pa.array(c[keep], pa.int64()),
            "cum_cost": pa.array(cum[keep], pa.int64())})

    return (tagged.groupby("__b")
            .map_groups(scan_bucket, batch_format="pyarrow"))


def epoch_shuffle(ds, *, id_col: str, epoch: int, salt: str = "v1"):
    """Deterministic GLOBAL shuffle order for one training epoch:
    ``(id, pos)`` with ``pos`` = 1-based position in
    ``ORDER BY md5(salt || epoch || ':' || id), id`` — a different
    but fully reproducible permutation per epoch, independent of
    partitioning and cluster size (``ray.data.random_shuffle`` is
    neither reproducible across cluster shapes nor SQL-checkable;
    this is the md5-prefix trick of :func:`hash_split` extended to a
    total order).

    Shape: the md5 hex key's FIRST BYTE buckets rows uniformly by
    construction (256 buckets, no quantile pass needed); per-bucket
    counts fold to an O(256) driver prefix; ONE ``groupby(bucket)``
    lexsorts each bucket and emits ``prefix + local position``.  The
    shuffle carries (bucket, key, id) narrow rows only."""
    import numpy as np

    from ray.data.aggregate import Count

    prefix = f"{salt}{epoch}:"

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "__k": pa.array([], pa.string()),
                "__b": pa.array([], pa.int64())})
        ids = t.column(id_col).to_pylist()
        keys = [hashlib.md5(f"{prefix}{i}".encode()).hexdigest()
                for i in ids]
        b = [int(k[:2], 16) for k in keys]
        return pa.table({id_col: t.column(id_col),
                         "__k": pa.array(keys, pa.string()),
                         "__b": pa.array(b, pa.int64())})

    tagged = ds.select_columns([id_col]).map_batches(
        tag, batch_format="pyarrow").materialize()
    counts = tagged.groupby("__b").aggregate(Count()).to_pandas()
    per_bucket = np.zeros(256, np.int64)
    if len(counts):
        per_bucket[counts["__b"].to_numpy()] = \
            counts["count()"].to_numpy()
    prefix_rows = np.concatenate(
        ([0], np.cumsum(per_bucket)[:-1]))

    def scan_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        b = int(group.column("__b")[0].as_py())
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        keys = group.column("__k").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        pos = (prefix_rows[b] + 1
               + np.arange(group.num_rows, dtype=np.int64))
        return pa.table({id_col: pa.array(ids[order]),
                         "pos": pa.array(pos, pa.int64())})

    return (tagged.groupby("__b")
            .map_groups(scan_bucket, batch_format="pyarrow"))
