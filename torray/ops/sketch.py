"""Distributed sketches: HyperLogLog approximate distinct count.

HLL (Flajolet et al. 2007, public algorithm) is THE way to count
distinct keys at 100 TB without a shuffle: each batch folds its
values into a 2^b-byte register array (vectorized ``np.maximum.at``),
per-block registers ride back as single binary rows (one per block,
KBs total regardless of input size), and the driver merges with one
elementwise max — no ``unique``/``groupby`` exchange at all.  The
estimate is deterministic for a given hash function, so results are
partition- and order-independent.

Hashing: int64 columns go through the same splitmix64 finalizer the
dedup ops use (:func:`torray.ops.dedup._mix64`, vectorized); string /
binary columns through the vectorized FNV-1a fold
(:func:`torray.ops.dedup.fnv1a64_strings` — no Python call per value).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from torray.ops.dedup import _mix64, fnv1a64_strings

__all__ = ["hll_registers", "hll_estimate", "approx_distinct", "hll_overlap",
           "approx_distinct_by", "approx_quantiles", "exact_quantiles",
           "exact_quantiles_cont", "exact_mad", "group_quantiles",
           "group_quantiles_cont",
           "exact_distinct_by", "group_standardize",
           "group_minmax_normalize", "iqr_outliers", "robust_zscore",
           "count_min_sketch", "count_min_estimate",
           "group_quantiles_approx"]


def _hash_values(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_integer(t):
        vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return _mix64(vals.astype(np.int64))
    return fnv1a64_strings(col)


def _hll_idx_rho(hashes: np.ndarray, b: int) -> tuple[np.ndarray,
                                                       np.ndarray]:
    """(register index, rho) pairs for uint64 hashes: index = top b
    bits, rho = leading-zero run of the remaining 64-b bits + 1.
    Fully vectorized (exact bit loop — the float64 exponent trick is
    lossy)."""
    idx = (hashes >> np.uint64(64 - b)).astype(np.int64)
    w = (hashes << np.uint64(b)) | np.uint64((1 << b) - 1)  # sentinel
    rho = np.ones(hashes.size, np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = w
    alive = np.ones(hashes.size, np.bool_)
    for _ in range(64 - b):
        zero_here = alive & ((cur & mask) == 0)
        rho[zero_here] += 1
        alive &= zero_here
        if not alive.any():
            break
        cur = cur << np.uint64(1)
    return idx, rho


def hll_registers(hashes: np.ndarray, b: int = 12) -> np.ndarray:
    """Fold uint64 hashes into a 2^b uint8 register array: register
    index = top b bits, value = max(leading-zero run of the remaining
    64-b bits + 1).  Fully vectorized (bit ops + ``np.maximum.at``)."""
    m = 1 << b
    reg = np.zeros(m, np.uint8)
    if hashes.size == 0:
        return reg
    idx, rho = _hll_idx_rho(hashes, b)
    np.maximum.at(reg, idx, rho)
    return reg


def _hll_estimate_rows(reg: np.ndarray) -> np.ndarray:
    """Row-wise HLL estimates for a (k, m) register matrix — the
    vectorized twin of :func:`hll_estimate` (same alpha, same
    linear-counting correction), one numpy pass for ALL groups."""
    k, m = reg.shape
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else \
        {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.exp2(-reg.astype(np.float64)).sum(axis=1)
    zeros = (reg == 0).sum(axis=1)
    lc = m * np.log(m / np.maximum(zeros, 1))
    return np.where((est <= 2.5 * m) & (zeros > 0), lc, est)


def hll_estimate(reg: np.ndarray) -> float:
    """Standard HLL estimate with small-range (linear counting)
    correction."""
    m = reg.size
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else \
        {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, col: str, b: int = 12) -> int:
    """Approximate COUNT(DISTINCT col): ~1.04/sqrt(2^b) relative
    error (b=12 -> ~1.6%).  One streaming pass; driver-side data is
    one 2^b-byte row per block."""

    def fold(batch: pa.Table) -> pa.Table:
        reg = hll_registers(_hash_values(batch.column(col)), b)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        fold, batch_format="pyarrow").take_all()
    if not parts:
        return 0
    merged = np.zeros(1 << b, np.uint8)
    for row in parts:
        np.maximum(merged, np.frombuffer(row["reg"], np.uint8),
                   out=merged)
    return int(round(hll_estimate(merged)))


def approx_distinct_by(ds, group_col: str, col: str, b: int = 12,
                       out_col: str = "approx_distinct",
                       num_partitions: int = 64):
    """Approximate COUNT(DISTINCT col) PER GROUP -> Dataset
    ``(group_col, approx_distinct)``.

    Per batch, values fold into one register row per (group, block) —
    the shuffle carries ``2^b``-byte sketch rows bounded by groups x
    blocks, never the raw values.  FULLY vectorized at every stage
    (the 10^7-group bar every grouped op here meets): the block fold
    scatters ALL groups at once into a (groups, 2^b) matrix with ONE
    2-D ``np.maximum.at`` and emits it as a fixed-size-binary column
    via a single buffer copy; the merge is a partition RUN-SCAN
    (hash(group) partitions, lexsort + ``np.maximum.reduceat`` over
    the stacked register matrix) with row-wise vectorized estimates —
    never a Python call per group on either side."""
    from torray.ops.window import _ds_field_type, _hash_col_np

    m = 1 << b
    gtype = _ds_field_type(ds, group_col)

    def fold(batch: pa.Table) -> pa.Table:
        keys = batch.column(group_col).to_numpy(zero_copy_only=False)
        hashes = _hash_values(batch.column(col))
        uniq, inv = np.unique(keys, return_inverse=True)
        reg2d = np.zeros((len(uniq), m), np.uint8)
        if hashes.size:
            idx, rho = _hll_idx_rho(hashes, b)
            np.maximum.at(reg2d, (inv, idx), rho)
        regs = pa.Array.from_buffers(
            pa.binary(m), len(uniq),
            [None, pa.py_buffer(np.ascontiguousarray(reg2d).tobytes())])
        part = (_hash_col_np(uniq)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            group_col: pa.array(uniq, type=gtype),
            "__reg": regs,
            "__part": pa.array(part, pa.int64()),
        })

    empty_out = pa.table({group_col: pa.array([], gtype),
                          out_col: pa.array([], pa.int64())})

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        col_reg = group.column("__reg")
        if isinstance(col_reg, pa.ChunkedArray):
            col_reg = col_reg.combine_chunks()
        buf = np.frombuffer(col_reg.buffers()[1], np.uint8)
        mat = buf[col_reg.offset * m:
                  (col_reg.offset + len(col_reg)) * m].reshape(-1, m)
        order = np.argsort(g, kind="stable")
        g, mat = g[order], mat[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], g[1:] != g[:-1])))
        merged = np.maximum.reduceat(mat, starts, axis=0)
        est = np.round(_hll_estimate_rows(merged)).astype(np.int64)
        take = pa.array(order[starts], pa.int64())
        import pyarrow.compute as pc

        return pa.table({
            group_col: pc.take(group.column(group_col), take),
            out_col: pa.array(est, pa.int64()),
        })

    return (ds.select_columns([group_col, col])
            .map_batches(fold, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(merge, batch_format="pyarrow"))


def _compress_weighted(vals: np.ndarray, wts: np.ndarray,
                       cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Re-compress a weighted sorted sample to <= cap points by strided
    selection over cumulative weight (each kept point absorbs the
    weight of the run it ends).  Rank error added per compression is
    <= total_weight / cap."""
    if vals.size <= cap:
        return vals, wts
    cum = np.cumsum(wts)
    total = cum[-1]
    # cut points at equal cumulative-weight strides
    targets = (np.arange(1, cap + 1) / cap) * total
    idx = np.unique(np.searchsorted(cum, targets, side="left").clip(
        0, vals.size - 1))
    new_w = np.diff(np.concatenate(([0.0], cum[idx])))
    return vals[idx], new_w


def approx_quantiles(ds, col: str, quantiles, *,
                     block_cap: int = 4096,
                     merge_cap: int = 16384) -> dict[float, float]:
    """Approximate quantiles of a numeric column in ONE streaming pass.

    Each block contributes a sorted strided sample of <= ``block_cap``
    weighted points (weight = rows absorbed); the driver folds block
    samples into a running weighted sample re-compressed to
    ``merge_cap`` points whenever it doubles, so driver memory stays
    O(merge_cap) no matter how many blocks stream past — no shuffle,
    no sort.  Rank error is bounded by ~N/block_cap per block plus
    N/merge_cap per driver compression (log-many of them); with the
    defaults that's well under 1% of N.  Nulls/NaNs are dropped."""
    vals_acc = np.empty(0, np.float64)
    wts_acc = np.empty(0, np.float64)

    def fold(batch: pa.Table) -> pa.Table:
        v = batch.column(col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        v = np.sort(v[~np.isnan(v)])
        if v.size > block_cap:
            v, w = _compress_weighted(v, np.ones(v.size), block_cap)
        else:
            w = np.ones(v.size)
        return pa.table({"v": pa.array(v, pa.float64()),
                         "w": pa.array(w, pa.float64())})

    for batch in ds.select_columns([col]).map_batches(
            fold, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        bv = batch.column("v").to_numpy(zero_copy_only=False)
        bw = batch.column("w").to_numpy(zero_copy_only=False)
        order = np.argsort(np.concatenate([vals_acc, bv]), kind="stable")
        vals_acc = np.concatenate([vals_acc, bv])[order]
        wts_acc = np.concatenate([wts_acc, bw])[order]
        if vals_acc.size > 2 * merge_cap:
            vals_acc, wts_acc = _compress_weighted(vals_acc, wts_acc,
                                                   merge_cap)
    if vals_acc.size == 0:
        return {float(q): float("nan") for q in quantiles}
    cum = np.cumsum(wts_acc)
    total = cum[-1]
    out = {}
    for q in quantiles:
        pos = int(np.searchsorted(cum, q * total, side="left").clip(
            0, vals_acc.size - 1))
        out[float(q)] = float(vals_acc[pos])
    return out


def _disc_rank(q: float, n: int) -> int:
    """SQL ``quantile_disc`` rank rule: 0-based index
    ``max(0, ceil(q*n) - 1)`` into the ascending-sorted values."""
    return max(0, int(np.ceil(float(q) * n)) - 1)


def _clean_proj(ds, col: str):
    """One-column projection with NULLs and NaNs dropped (SQL
    aggregate semantics — NaN is not null in Arrow, so it must go
    explicitly or it inflates the Count-based rank n while never
    landing in a histogram bin)."""
    import pyarrow.compute as pc

    def _clean(t: pa.Table) -> pa.Table:
        v = pc.drop_null(t.column(col).cast(pa.float64()))
        return pa.table({"v": v.filter(pc.invert(pc.is_nan(v)))})

    return ds.select_columns([col]).map_batches(
        _clean, batch_format="pyarrow")


def exact_quantiles(ds, col: str, quantiles, *, bins: int = 4096,
                    final_cap: int = 1 << 16,
                    max_passes: int = 8) -> dict[float, float]:
    """EXACT quantiles (``quantile_disc`` semantics — see
    :func:`_disc_rank`) of a numeric column WITHOUT a distributed sort.

    Iterative histogram refinement (the classic distributed selection
    recipe — see :func:`_values_at_ranks` for the passes and the scale
    shape): NO shuffle, O(bins) per-block partials, the column
    re-streams once per pass.  Nulls/NaNs are dropped (SQL aggregate
    semantics)."""
    from ray.data.aggregate import Count, Max, Min

    proj = _clean_proj(ds, col)
    stats = proj.aggregate(Count("v", ignore_nulls=True),
                           Min("v"), Max("v"))
    n = int((stats or {}).get("count(v)") or 0)
    if n == 0:
        return {float(q): float("nan") for q in quantiles}
    gmin, gmax = float(stats["min(v)"]), float(stats["max(v)"])
    ranks = sorted({_disc_rank(q, n) for q in quantiles})
    at = _values_at_ranks(proj, n, gmin, gmax, ranks, bins=bins,
                          final_cap=final_cap, max_passes=max_passes)
    return {float(q): at[_disc_rank(q, n)] for q in quantiles}


def exact_quantiles_cont(ds, col: str, quantiles, *, bins: int = 4096,
                         final_cap: int = 1 << 16,
                         max_passes: int = 8) -> dict[float, float]:
    """EXACT interpolated quantiles (``quantile_cont`` /
    ``percentile_cont`` semantics) without a distributed sort: the
    target position is ``pos = q * (n - 1)``; the result interpolates
    the two bracketing order statistics as ``v[floor(pos)] +
    (v[ceil(pos)] - v[floor(pos)]) * (pos - floor(pos))`` — that float
    expression tree is the documented contract (an oracle computing
    the same tree from the same two ranks matches bitwise; DuckDB's
    built-in ``quantile_cont`` agrees to the last ULP on the same
    doubles).

    Same engine as :func:`exact_quantiles`: one (count, min, max)
    pass, then histogram-refinement selection of the <= 2x|quantiles|
    distinct bracketing ranks — still zero shuffles."""
    from ray.data.aggregate import Count, Max, Min

    proj = _clean_proj(ds, col)
    stats = proj.aggregate(Count("v", ignore_nulls=True),
                           Min("v"), Max("v"))
    n = int((stats or {}).get("count(v)") or 0)
    if n == 0:
        return {float(q): float("nan") for q in quantiles}
    gmin, gmax = float(stats["min(v)"]), float(stats["max(v)"])
    pos = {float(q): float(q) * (n - 1) for q in quantiles}
    ranks = sorted({int(np.floor(p)) for p in pos.values()}
                   | {int(np.ceil(p)) for p in pos.values()})
    at = _values_at_ranks(proj, n, gmin, gmax, ranks, bins=bins,
                          final_cap=final_cap, max_passes=max_passes)
    out = {}
    for q, p in pos.items():
        lo, hi = at[int(np.floor(p))], at[int(np.ceil(p))]
        frac = p - np.floor(p)
        out[q] = float(lo + (hi - lo) * frac)
    return out


def exact_mad(ds, col: str, *, bins: int = 4096,
              final_cap: int = 1 << 16) -> dict[str, float]:
    """EXACT median absolute deviation: ``median(|v - median(v)|)``
    with ``quantile_disc`` semantics on both medians — the robust
    spread statistic quality-gating pipelines want when outliers make
    stddev useless.  Returns ``{'median': m, 'mad': d}``.

    Two chained :func:`exact_quantiles` selections (each zero-shuffle,
    O(bins) per-block partials); the deviation column is derived
    lazily per batch (``|v - m|`` in float64, the same IEEE op the SQL
    oracle performs), never materialized.  Nulls/NaNs drop per SQL
    aggregate semantics."""
    import pyarrow.compute as pc

    med = exact_quantiles(ds, col, [0.5], bins=bins,
                          final_cap=final_cap)[0.5]
    if np.isnan(med):
        return {"median": med, "mad": float("nan")}

    def dev(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(col), pa.float64())
        return pa.table({"__dev": pc.abs(pc.subtract(v, med))})

    mad = exact_quantiles(
        ds.select_columns([col]).map_batches(dev,
                                             batch_format="pyarrow"),
        "__dev", [0.5], bins=bins, final_cap=final_cap)[0.5]
    return {"median": med, "mad": mad}


def _values_at_ranks(proj, n: int, gmin: float, gmax: float,
                     ranks, *, bins: int = 4096,
                     final_cap: int = 1 << 16,
                     max_passes: int = 8) -> dict[int, float]:
    """The histogram-refinement selection core: EXACT values at the
    given 0-based ``ranks`` of the ascending-sorted ``v`` column of
    ``proj`` (a cleaned one-column dataset), given its (n, min, max).

    Pass k histograms the still-unresolved candidate intervals into
    ``bins`` buckets (per-block int64[bins] partials, driver merges
    KBs) and each target rank's interval shrinks ~``bins``x.  Once an
    interval holds <= ``final_cap`` rows — or stops shrinking, which
    after a few passes means it is a handful of float ULPs wide — a
    last pass collects that interval's (value, count) pairs (unique'd
    per block, so heavy duplicates cost distinct values, not rows) and
    the driver picks the exact rank.  NO shuffle anywhere: every pass
    is a map_batches fold with O(bins) per-block output."""
    # Per target: (lo, hi, rank) — target sits at 0-based ``rank``
    # among values in [lo, hi(inclusive)); non-terminal refinement
    # intervals are half-open, and the inclusive final collect only
    # ever pads values AFTER the target rank (see below), so one
    # inclusive convention is safe throughout.
    state: dict[int, tuple[float, float, int]] = {
        int(r): (gmin, gmax, int(r)) for r in ranks}
    unresolved = {r for r, (lo, hi, _) in state.items() if hi > lo
                  and n > final_cap}

    for _ in range(max_passes):
        if not unresolved:
            break
        intervals = sorted({(state[q][0], state[q][1])
                            for q in unresolved})
        edge_list = []
        for lo, hi in intervals:
            e = np.linspace(lo, hi, bins + 1)
            edge_list.append(e if np.all(np.diff(e) > 0) else None)
        # intervals too narrow for distinct float edges resolve now
        for i, (lo, hi) in enumerate(intervals):
            if edge_list[i] is None:
                for q in list(unresolved):
                    if (state[q][0], state[q][1]) == (lo, hi):
                        unresolved.discard(q)
        live = [(iv, e) for iv, e in zip(intervals, edge_list)
                if e is not None]
        if not live:
            break

        def fold(t: pa.Table, live=live) -> pa.Table:
            v = t.column("v").to_numpy(zero_copy_only=False)
            idx, blobs = [], []
            for i, (_, edges) in enumerate(live):
                c, _ = np.histogram(v, bins=edges)
                idx.append(i)
                blobs.append(c.astype(np.int64).tobytes())
            return pa.table({"i": pa.array(idx, pa.int64()),
                             "h": pa.array(blobs, pa.binary())})

        merged = [np.zeros(bins, np.int64) for _ in live]
        for batch in proj.map_batches(
                fold, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            for i, blob in zip(batch.column("i").to_pylist(),
                               batch.column("h").to_pylist()):
                merged[i] += np.frombuffer(blob, np.int64)
        hist_of = {iv: merged[i] for i, (iv, _) in enumerate(live)}
        edges_of = {iv: e for iv, e in live}
        for q in list(unresolved):
            lo, hi, rank = state[q]
            if (lo, hi) not in hist_of:
                continue
            hist, edges = hist_of[(lo, hi)], edges_of[(lo, hi)]
            cum = np.cumsum(hist)
            b = min(int(np.searchsorted(cum, rank + 1, side="left")),
                    bins - 1)
            new_lo = float(edges[b])
            new_hi = float(edges[b + 1])
            new_rank = rank - (int(cum[b - 1]) if b > 0 else 0)
            state[q] = (new_lo, new_hi, new_rank)
            if int(hist[b]) <= final_cap or (new_lo, new_hi) == (lo, hi):
                unresolved.discard(q)

    intervals = sorted({(lo, hi) for lo, hi, _ in state.values()})

    def collect(t: pa.Table, intervals=intervals) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        out_i, out_v, out_c = [], [], []
        for i, (lo, hi) in enumerate(intervals):
            sel = v[(v >= lo) & (v <= hi)]
            if sel.size:
                u, c = np.unique(sel, return_counts=True)
                out_i.append(np.full(u.size, i, np.int64))
                out_v.append(u)
                out_c.append(c.astype(np.int64))
        if not out_i:
            return pa.table({"i": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64()),
                             "c": pa.array([], pa.int64())})
        return pa.table({
            "i": pa.array(np.concatenate(out_i), pa.int64()),
            "v": pa.array(np.concatenate(out_v), pa.float64()),
            "c": pa.array(np.concatenate(out_c), pa.int64())})

    # Driver merge is bounded by distinct values per candidate
    # interval (<= final_cap rows unless duplicates dominate, in which
    # case distinct << rows).
    agg: list[dict[float, int]] = [dict() for _ in intervals]
    for batch in proj.map_batches(
            collect, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for i, v, c in zip(batch.column("i").to_pylist(),
                           batch.column("v").to_pylist(),
                           batch.column("c").to_pylist()):
            agg[i][v] = agg[i].get(v, 0) + c
    iv_index = {iv: i for i, iv in enumerate(intervals)}
    out = {}
    for q, (lo, hi, rank) in state.items():
        acc, ans = 0, float("nan")
        for v, c in sorted(agg[iv_index[(lo, hi)]].items()):
            acc += c
            if acc > rank:
                ans = v
                break
        out[q] = float(ans)
    return out


def group_quantiles(ds, group_col: str, col: str, quantiles,
                    num_partitions: int = 64):
    """Exact per-group quantiles (``quantile_disc`` semantics) in long
    format ``(group, q, value)``.

    Partition RUN-SCAN shape (no Python call per group): groups hash
    into ``num_partitions`` coarse partitions, ONE groupby on the
    partition id, then one lexsort of (group, value) + a vectorized
    rank pick per group run inside each partition — at 10^7 groups
    the old ``groupby(group).map_groups`` paid one interpreter call
    per group for a handful of rows each.  Partitioning assumption: a
    group's VALUES fit in a task (same as any co-grouped op); for the
    global / hot-group case use :func:`exact_quantiles`, which never
    shuffles at all."""
    from torray.ops.window import _hash_col_np

    qs = np.asarray([float(q) for q in quantiles], np.float64)
    from torray.ops.window import _ds_field_type

    gtype = _ds_field_type(ds, group_col)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "__v": pa.array([], pa.float64()),
                             "__part": pa.array([], pa.int64())})
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        part = (_hash_col_np(g)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            group_col: batch.column(group_col),
            "__v": batch.column(col).cast(pa.float64()),
            "__part": pa.array(part, pa.int64()),
        })

    import pyarrow.compute as pc

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.float64())})
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        v = group.column("__v").to_numpy(zero_copy_only=False)
        # NaN sorts to the end of each group run; ranks use the
        # non-NaN count, so NaNs are dropped per group while all-NaN
        # groups still surface (value = NaN) like the SQL aggregate
        # over an all-NULL group.
        order = np.lexsort((v, g))
        g, v = g[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
        lens = np.diff(np.append(starts, len(g)))
        nan_per_run = np.add.reduceat(np.isnan(v).astype(np.int64),
                                      starts)
        n_valid = lens - nan_per_run
        # rank picks for ALL groups x quantiles at once:
        # rank = max(0, ceil(q*n) - 1) within each run
        ranks = np.maximum(
            0, np.ceil(qs[None, :] * n_valid[:, None]).astype(
                np.int64) - 1)
        idx = (starts[:, None] + ranks).ravel()
        vals = v[idx]
        vals[np.repeat(n_valid == 0, len(qs))] = np.nan
        n_groups = len(starts)
        take = pa.array(order[np.repeat(starts, len(qs))], pa.int64())
        return pa.table({
            group_col: pc.take(group.column(group_col), take),
            "q": pa.array(np.tile(qs, n_groups), pa.float64()),
            "value": pa.array(vals, pa.float64()),
        })

    return (ds.select_columns([group_col, col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))



def group_quantiles_cont(ds, group_col: str, col: str, quantiles,
                         num_partitions: int = 64):
    """Exact per-group INTERPOLATED quantiles (``quantile_cont`` /
    ``percentile_cont`` semantics) in long format ``(group, q,
    value)`` — the grouped companion to :func:`exact_quantiles_cont`.

    Same partition run-scan shape as :func:`group_quantiles` (groups
    hash into coarse partitions, ONE groupby on the partition id, one
    lexsort + vectorized picks per group run — no Python call per
    group).  Per group: ``pos = q * (n - 1)``; the result is
    ``v[floor(pos)] + (v[ceil(pos)] - v[floor(pos)]) * (pos -
    floor(pos))`` over the group's ascending non-NaN values — that
    float expression tree is the documented contract an SQL oracle
    mirrors bitwise.  NaNs drop per group; all-NaN groups surface with
    ``value = NaN`` (the SQL aggregate over an all-NULL group)."""
    from torray.ops.window import _hash_col_np

    qs = np.asarray([float(q) for q in quantiles], np.float64)
    from torray.ops.window import _ds_field_type

    gtype = _ds_field_type(ds, group_col)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "__v": pa.array([], pa.float64()),
                             "__part": pa.array([], pa.int64())})
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        part = (_hash_col_np(g)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            group_col: batch.column(group_col),
            "__v": batch.column(col).cast(pa.float64()),
            "__part": pa.array(part, pa.int64()),
        })

    import pyarrow.compute as pc

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.float64())})
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        v = group.column("__v").to_numpy(zero_copy_only=False)
        # nulls arrive as NaN from the float64 cast; NaN sorts to the
        # end of each group run, so ranks over n_valid skip them
        order = np.lexsort((v, g))
        g, v = g[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
        lens = np.diff(np.append(starts, len(g)))
        nan_per_run = np.add.reduceat(np.isnan(v).astype(np.int64),
                                      starts)
        n_valid = lens - nan_per_run
        # pos = q*(n-1) per (group, q); guard n_valid == 0 with a fake
        # n of 1 (pos 0) and overwrite with NaN below
        n_safe = np.maximum(n_valid, 1)
        pos = qs[None, :] * (n_safe[:, None] - 1).astype(np.float64)
        lo_r = np.floor(pos).astype(np.int64)
        hi_r = np.ceil(pos).astype(np.int64)
        lo = v[(starts[:, None] + lo_r).ravel()]
        hi = v[(starts[:, None] + hi_r).ravel()]
        frac = (pos - np.floor(pos)).ravel()
        vals = lo + (hi - lo) * frac
        vals[np.repeat(n_valid == 0, len(qs))] = np.nan
        n_groups = len(starts)
        take = pa.array(order[np.repeat(starts, len(qs))], pa.int64())
        return pa.table({
            group_col: pc.take(group.column(group_col), take),
            "q": pa.array(np.tile(qs, n_groups), pa.float64()),
            "value": pa.array(vals, pa.float64()),
        })

    return (ds.select_columns([group_col, col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def _group_hash(t: pa.Table, gcols: list[str]) -> np.ndarray:
    """uint64 hash of the composite group key (ints/timestamps via
    splitmix64, strings via fnv1a64; mixed chain-combined)."""
    h = np.zeros(t.num_rows, np.uint64)
    for c in gcols:
        arr = t.column(c)
        typ = arr.type
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            hc = fnv1a64_strings(arr.combine_chunks())
        elif (pa.types.is_integer(typ) or pa.types.is_timestamp(typ)
              or pa.types.is_date(typ)):
            hc = _mix64(pc.cast(arr, pa.int64()).to_numpy(
                zero_copy_only=False).astype(np.uint64))
        else:
            raise TypeError(
                f"unhashable group column type {typ} for {c!r}")
        h = _mix64(h * np.uint64(0x9E3779B97F4A7C15) + hc)
    return h


def exact_distinct_by(ds, group_col, col: str,
                      out_col: str = "n_distinct", *,
                      num_partitions: int = 64):
    """EXACT per-group COUNT(DISTINCT col) -> ``(*groups,
    n_distinct)`` — the precise companion to :func:`approx_distinct_by`
    for when the group cardinalities must be right, not estimated.
    ``group_col`` may be one column name or a list (composite key).

    Scale shape: each block pre-deduplicates to its DISTINCT (group,
    value) pairs with Arrow's C++ ``group_by`` (a combiner — repeated
    values never leave their block) and tags hash(group) ->
    ``num_partitions`` coarse partitions; ONE ``groupby("__part")``
    shuffle, then inside each partition one C++ two-level group_by
    (dedup across blocks, then count) — Python is called once per
    PARTITION, never per group (the per-key ``map_groups`` shape this
    replaces costs one interpreter call per distinct group: the
    engine's own measured pathology at 10^8 groups).  The shuffle is
    bounded by ``true distinct pairs x blocks`` worst case.  Choose
    the HLL variant when values-per-group are huge and ~1.6% error is
    acceptable — its shuffle is O(groups x blocks) register rows
    regardless of cardinality.
    """
    gcols = ([group_col] if isinstance(group_col, str)
             else list(group_col))
    npart = np.uint64(num_partitions)
    from torray.ops.window import _ds_field_type
    out_schema = pa.schema(
        [(c, _ds_field_type(ds, c)) for c in gcols]
        + [(out_col, pa.int64())])

    def fold(t: pa.Table) -> pa.Table:
        d = (t.select(gcols + [col])
             .group_by(gcols + [col]).aggregate([]))
        part = (_group_hash(d, gcols) % npart).astype(np.int64)
        return d.append_column("__part", pa.array(part, pa.int64()))

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:  # schemaless empty map_groups blocks
            return out_schema.empty_table()
        # a group never straddles partitions (hash of the full key)
        d = (group.drop_columns(["__part"])
             .group_by(gcols + [col]).aggregate([]))
        g = d.group_by(gcols).aggregate([([], "count_all")])
        cols = {c: g.column(c) for c in gcols}
        cols[out_col] = g.column("count_all").cast(pa.int64())
        return pa.table(cols).cast(out_schema)

    return (ds.select_columns(gcols + [col])
            .map_batches(fold, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def group_standardize(ds, group_col: str, col: str, *,
                      id_col: str = "event_id", scale: int = 100,
                      num_partitions: int = 64):
    """EXACT per-group z-score standardization (population std) —
    ``(id, z)`` with ``z = (sv - S/n) / sqrt(Q/n - (S/n)^2)`` over the
    scaled integers ``sv = round(value * scale)``, ``S = sum(sv)``,
    ``Q = sum(sv^2)`` (all int64, so both engines see identical
    integers and perform the identical float64 expression tree —
    bit-for-bit parity, the repo-wide exactness recipe).  A group with
    zero variance (or an all-NULL group) yields NULL z, matching the
    oracle's explicit CASE guard.

    Scale shape: the partition run-scan (hash(group) -> coarse
    partition, ONE groupby on the partition id, lexsort + segmented
    ``np.add.reduceat`` for S/Q/n, vectorized per-run broadcast back
    to rows — never a Python call per group).  Shuffle carries
    (group, id, sv) narrow rows.  int64 bound: |sv| <= ~3e9 keeps
    ``sum(sv^2)`` exact for 10^9-row groups; raise ``scale`` awareness
    accordingly (documented contract, not guessed at)."""
    from torray.ops.window import _hash_col_np

    from torray.ops.window import _ds_field_type

    gtype = _ds_field_type(ds, group_col)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "__id": pa.array([], pa.int64()),
                             "__sv": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        prod = np.asarray(v, np.float64) * scale
        # half AWAY from zero, matching SQL round() (np.round banks)
        sv = np.copysign(np.floor(np.abs(prod) + 0.5),
                         prod).astype(np.int64)
        part = (_hash_col_np(g)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            group_col: batch.column(group_col),
            "__id": batch.column(id_col).cast(pa.int64()),
            "__sv": pa.array(sv, pa.int64()),
            "__part": pa.array(part, pa.int64()),
        })

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "z": pa.array([], pa.float64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        ids = group.column("__id").to_numpy(zero_copy_only=False)
        sv = group.column("__sv").to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        g, ids, sv = g[order], ids[order], sv[order]
        n_rows = len(g)
        starts = np.flatnonzero(np.concatenate(
            ([True], g[1:] != g[:-1])))
        lens = np.diff(np.append(starts, n_rows)).astype(np.int64)
        s = np.add.reduceat(sv, starts)
        q = np.add.reduceat(sv * sv, starts)
        n = lens.astype(np.float64)
        m = s.astype(np.float64) / n
        var = q.astype(np.float64) / n - m * m
        m_row = np.repeat(m, lens)
        var_row = np.repeat(var, lens)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (sv.astype(np.float64) - m_row) / np.sqrt(var_row)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "z": pa.array(np.where(var_row <= 0, np.nan, z),
                          pa.float64(),
                          mask=(var_row <= 0)),
        })

    return (ds.select_columns([group_col, id_col, col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def group_minmax_normalize(ds, group_col: str, col: str, *,
                           id_col: str = "event_id", scale: int = 100,
                           num_partitions: int = 64):
    """EXACT per-group min-max normalization — ``(id, x)`` with
    ``x = (sv - min) / (max - min)`` over the scaled integers
    ``sv = round(value * scale)``: both engines see identical int64
    numerator and denominator and perform ONE identical IEEE divide —
    bit-for-bit parity.  A constant group (max == min) yields NULL,
    matching the oracle's CASE guard.

    Same scale shape as :func:`group_standardize`: hash(group) ->
    coarse partition, ONE groupby, lexsort + segmented
    ``np.minimum/maximum.reduceat`` — never a Python call per group.
    """
    from torray.ops.window import _hash_col_np

    from torray.ops.window import _ds_field_type

    gtype = _ds_field_type(ds, group_col)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "__id": pa.array([], pa.int64()),
                             "__sv": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        prod = np.asarray(v, np.float64) * scale
        sv = np.copysign(np.floor(np.abs(prod) + 0.5),
                         prod).astype(np.int64)
        part = (_hash_col_np(g)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            group_col: batch.column(group_col),
            "__id": batch.column(id_col).cast(pa.int64()),
            "__sv": pa.array(sv, pa.int64()),
            "__part": pa.array(part, pa.int64()),
        })

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "x": pa.array([], pa.float64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        ids = group.column("__id").to_numpy(zero_copy_only=False)
        sv = group.column("__sv").to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        g, ids, sv = g[order], ids[order], sv[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], g[1:] != g[:-1])))
        lens = np.diff(np.append(starts, len(g))).astype(np.int64)
        mn = np.minimum.reduceat(sv, starts)
        mx = np.maximum.reduceat(sv, starts)
        mn_row = np.repeat(mn, lens)
        rng_row = np.repeat(mx - mn, lens)
        with np.errstate(divide="ignore", invalid="ignore"):
            x = ((sv - mn_row).astype(np.float64)
                 / rng_row.astype(np.float64))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "x": pa.array(np.where(rng_row == 0, np.nan, x),
                          pa.float64(), mask=(rng_row == 0)),
        })

    return (ds.select_columns([group_col, id_col, col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def _cm_rows(hashes: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(depth, n) column indices for Count-Min: row i rehashes the
    value hash with a fixed odd seed through the same splitmix64
    finalizer — depth independent-enough hash rows, all vectorized."""
    idx = np.empty((depth, hashes.size), np.int64)
    for i in range(depth):
        seed = np.uint64(0x9E3779B97F4A7C15 * (2 * i + 1) & (2**64 - 1))
        idx[i] = (_mix64((hashes ^ seed).astype(np.int64))
                  % np.uint64(width)).astype(np.int64)
    return idx


def count_min_sketch(ds, col: str, *, width: int = 2048,
                     depth: int = 4) -> np.ndarray:
    """Count-Min sketch (Cormode & Muthukrishnan '05) of a column's
    value frequencies — THE bounded-memory grouped-count structure
    when the key cardinality is too large for an exact groupby.
    Returns the merged ``(depth, width)`` int64 count matrix.

    Scale shape: each block folds its values into a local matrix with
    ``depth`` vectorized ``np.add.at`` scatters and emits ONE binary
    row (depth x width x 8 bytes — 64 KB at the defaults, independent
    of block size); sketches merge by elementwise SUM, so the driver
    fold is one-row-per-block partials, never values — the same
    zero-shuffle shape as :func:`approx_distinct`.  Point-estimate
    error: ``est - true <= e/width * N`` with prob ``1 - e^-depth``
    (one-sided — Count-Min never undercounts)."""

    def fold(batch: pa.Table) -> pa.Table:
        h = _hash_values(batch.column(col))
        mat = np.zeros((depth, width), np.int64)
        if h.size:
            idx = _cm_rows(h, width, depth)
            for i in range(depth):
                np.add.at(mat[i], idx[i], 1)
        return pa.table({"cm": pa.array([mat.tobytes()], pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        fold, batch_format="pyarrow").take_all()
    merged = np.zeros((depth, width), np.int64)
    for row in parts:
        merged += np.frombuffer(row["cm"], np.int64).reshape(
            depth, width)
    return merged


def count_min_estimate(sketch: np.ndarray,
                       keys: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Point estimates for ``keys`` from a :func:`count_min_sketch`
    matrix: min over the depth rows, fully vectorized."""
    depth, width = sketch.shape
    h = _hash_values(keys if isinstance(keys, (pa.Array,
                                               pa.ChunkedArray))
                     else pa.array(keys))
    if h.size == 0:
        return np.empty(0, np.int64)
    idx = _cm_rows(h, width, depth)
    ests = np.stack([sketch[i][idx[i]] for i in range(depth)])
    return ests.min(axis=0)


def group_quantiles_approx(ds, group_col: str, col: str, quantiles, *,
                           block_cap: int = 512,
                           num_partitions: int = 64):
    """APPROXIMATE per-group quantiles in long format ``(group, q,
    value)`` — the hot-group companion to :func:`group_quantiles`:
    that op is exact but requires a group's VALUES to fit in one task;
    this one bounds per-group shuffle volume at ``block_cap`` weighted
    points per block (strided cumulative-weight compression, the same
    scheme as :func:`approx_quantiles`), so a group hotter than a task
    still works.  Rank error per group is bounded by ~rows_in_block /
    block_cap summed over that group's blocks (≤ group_rows /
    block_cap overall).

    Scale shape: block partials emit (group, value, weight) rows —
    ≤ ``block_cap`` per group per block, with only runs LONGER than
    the cap paying a Python compression call (≤ rows/cap of them);
    ONE hash(group) partition shuffle; the final fold is a lexsort +
    banded ``np.searchsorted`` weighted-rank pick — one Python call
    per PARTITION, never per group.  Partial volume per group is
    blocks × block_cap; at extreme block counts insert a tree-merge
    round (documented extension, not silently assumed)."""
    from torray.ops.window import _hash_col_np

    qs = np.asarray([float(q) for q in quantiles], np.float64)
    from torray.ops.window import _ds_field_type

    gtype = _ds_field_type(ds, group_col)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        ok = ~np.isnan(v)
        g, v = g[ok], v[ok]
        order = np.lexsort((v, g))
        g, v = g[order], v[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], g[1:] != g[:-1]))) if len(g) else \
            np.empty(0, np.int64)
        lens = np.diff(np.append(starts, len(g)))
        keep_idx = []
        wts = []
        for si, ln in zip(starts, lens):
            if ln <= block_cap:
                keep_idx.append(np.arange(si, si + ln))
                wts.append(np.ones(ln))
            else:
                run = v[si:si + ln]
                kv, kw = _compress_weighted(run, np.ones(ln),
                                            block_cap)
                # indices of the kept points within the run
                pos = np.searchsorted(
                    np.cumsum(np.ones(ln)), np.cumsum(kw))
                keep_idx.append(si + np.minimum(pos, ln - 1))
                wts.append(kw)
        if keep_idx:
            idx = np.concatenate(keep_idx)
            w = np.concatenate(wts)
        else:
            idx = np.empty(0, np.int64)
            w = np.empty(0, np.float64)
        gk = g[idx]
        part = (_hash_col_np(gk)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            group_col: pa.array(gk, gtype),
            "__v": pa.array(v[idx], pa.float64()),
            "__w": pa.array(w, pa.float64()),
            "__part": pa.array(part, pa.int64()),
        })

    empty_out = pa.table({group_col: pa.array([], gtype),
                          "q": pa.array([], pa.float64()),
                          "value": pa.array([], pa.float64())})

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        v = group.column("__v").to_numpy(zero_copy_only=False)
        w = group.column("__w").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, g))
        g, v, w = g[order], v[order], w[order]
        n = len(g)
        starts = np.flatnonzero(np.concatenate(
            ([True], g[1:] != g[:-1])))
        lens = np.diff(np.append(starts, n))
        run_id = np.repeat(np.arange(len(starts), dtype=np.int64),
                           lens)
        cum = np.cumsum(w)
        run_off = np.concatenate(([0.0], cum[starts[1:] - 1]))
        cw = cum - run_off[run_id]          # within-run cum weight
        totals = np.add.reduceat(w, starts)
        # banded weighted-rank pick: lift within-run cum weights into
        # disjoint bands, one global searchsorted for ALL (group, q)
        stride = float(totals.max()) + 1.0
        bands = np.arange(len(starts), dtype=np.float64) * stride
        cw_banded = cw + bands[run_id]
        # smallest point with cum weight >= q * total (per run)
        targets = (qs[None, :] * totals[:, None]
                   + bands[:, None]).ravel()
        idx = np.searchsorted(cw_banded, targets, side="left")
        ends = np.append(starts[1:], n) - 1
        idx = np.minimum(idx, np.repeat(ends, len(qs)))
        take = pa.array(order[np.repeat(starts, len(qs))], pa.int64())
        import pyarrow.compute as pc

        return pa.table({
            group_col: pc.take(group.column(group_col), take),
            "q": pa.array(np.tile(qs, len(starts)), pa.float64()),
            "value": pa.array(v[idx], pa.float64()),
        })

    return (ds.select_columns([group_col, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(fold, batch_format="pyarrow"))


def iqr_outliers(ds, group_col: str, col: str, *,
                 id_col: str = "event_id", scale: int = 100,
                 k_halves: int = 3, num_partitions: int = 64):
    """EXACT per-group Tukey-fence outlier flags — ``(id,
    is_outlier)`` with the classic ``v < q1 - 1.5*IQR or
    v > q3 + 1.5*IQR`` rule, evaluated ENTIRELY in integers: over the
    scaled values ``sv = round(value * scale)`` the fences compare as
    ``2*sv < 2*q1 - k*(q3 - q1)`` / ``2*sv > 2*q3 + k*(q3 - q1)``
    (``k_halves=3`` = the 1.5 multiplier doubled), so no float ever
    enters the decision and the SQL mirror is bit-free-identical.
    q1/q3 use the ``ceil(p*n)``-th order statistic in pure integer
    arithmetic — verified equal to DuckDB's ``quantile_disc``.

    Scale shape: the standard partition run-scan (hash(group) ->
    coarse partition, ONE groupby, per-partition lexsort by (group,
    value) + integer rank picks per run — no Python call per group).
    """
    from torray.ops.window import _hash_col_np

    from torray.ops.window import _ds_field_type

    gtype = _ds_field_type(ds, group_col)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "__id": pa.array([], pa.int64()),
                             "__sv": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        prod = np.asarray(v, np.float64) * scale
        sv = np.copysign(np.floor(np.abs(prod) + 0.5),
                         prod).astype(np.int64)
        part = (_hash_col_np(g)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            group_col: batch.column(group_col),
            "__id": batch.column(id_col).cast(pa.int64()),
            "__sv": pa.array(sv, pa.int64()),
            "__part": pa.array(part, pa.int64()),
        })

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "is_outlier": pa.array([], pa.bool_())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        ids = group.column("__id").to_numpy(zero_copy_only=False)
        sv = group.column("__sv").to_numpy(zero_copy_only=False)
        order = np.lexsort((sv, g))
        g, ids, sv = g[order], ids[order], sv[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], g[1:] != g[:-1])))
        lens = np.diff(np.append(starts, len(g))).astype(np.int64)
        # ceil(p*n)-th order statistic, integer arithmetic
        i25 = starts + (lens + 3) // 4 - 1
        i75 = starts + (3 * lens + 3) // 4 - 1
        q1 = np.repeat(sv[i25], lens)
        q3 = np.repeat(sv[i75], lens)
        iqr = q3 - q1
        flag = ((2 * sv < 2 * q1 - k_halves * iqr)
                | (2 * sv > 2 * q3 + k_halves * iqr))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "is_outlier": pa.array(flag, pa.bool_()),
        })

    return (ds.select_columns([group_col, id_col, col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def robust_zscore(ds, group_col: str, col: str, *,
                  id_col: str = "event_id", scale: int = 100,
                  num_partitions: int = 64):
    """EXACT per-group robust z-score ``(sv - median) / MAD`` over the
    scaled integers ``sv = round(value * scale)``: the median and the
    MAD (median absolute deviation) are both INTEGER order statistics
    (the ``ceil(p*n)`` rule, equal to SQL ``quantile_disc``), so the
    output is ONE IEEE divide of two exact ints — bit-identical to the
    mirror.  Zero-MAD groups yield NULL (the oracle's CASE guard).
    The robust twin of :func:`group_standardize` — outliers cannot
    poison the location/scale estimates.

    Scale shape: one hash(group) partition run-scan; the median comes
    from a (group, value) lexsort + integer rank pick per run, the MAD
    from a SECOND vectorized lexsort of the absolute deviations keyed
    by the same runs — two in-partition sorts, zero extra shuffles,
    Python once per partition."""
    from torray.ops.window import _hash_col_np

    from torray.ops.window import _ds_field_type

    gtype = _ds_field_type(ds, group_col)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "__id": pa.array([], pa.int64()),
                             "__sv": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        prod = np.asarray(v, np.float64) * scale
        sv = np.copysign(np.floor(np.abs(prod) + 0.5),
                         prod).astype(np.int64)
        part = (_hash_col_np(g)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            group_col: batch.column(group_col),
            "__id": batch.column(id_col).cast(pa.int64()),
            "__sv": pa.array(sv, pa.int64()),
            "__part": pa.array(part, pa.int64()),
        })

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "rz": pa.array([], pa.float64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        ids = group.column("__id").to_numpy(zero_copy_only=False)
        sv = group.column("__sv").to_numpy(zero_copy_only=False)
        order = np.lexsort((sv, g))
        g, ids, sv = g[order], ids[order], sv[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], g[1:] != g[:-1])))
        lens = np.diff(np.append(starts, len(g))).astype(np.int64)
        run = np.repeat(np.arange(len(starts)), lens)
        med_idx = starts + (lens + 1) // 2 - 1  # ceil(n/2)-th
        med_row = sv[med_idx][run]
        dev = np.abs(sv - med_row)
        # second keyed sort: deviations within the same runs
        dorder = np.lexsort((dev, run))
        dev_s = dev[dorder]
        mad_row = dev_s[med_idx][run]  # same rank rule, same runs
        with np.errstate(divide="ignore", invalid="ignore"):
            rz = ((sv - med_row).astype(np.float64)
                  / mad_row.astype(np.float64))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "rz": pa.array(np.where(mad_row == 0, np.nan, rz),
                           pa.float64(), mask=(mad_row == 0)),
        })

    return (ds.select_columns([group_col, id_col, col])
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def hll_overlap(ds, group_col: str, col: str, b: int = 12,
                num_partitions: int = 16):
    """Approximate pairwise SLICE OVERLAP via HLL register algebra:
    for every pair of groups (corpus slices — languages, sources,
    train/val splits), estimate |A|, |B|, |A ∪ B| (the union is EXACT
    register-wise: elementwise max of the two sketches) and derive
    |A ∩ B| = |A| + |B| - |A ∪ B| (inclusion–exclusion, clamped at
    0) and the Jaccard — the sketch-based scale path beside the
    EXACT ``ops.text.vocab_overlap``: values never shuffle, only
    ``2^b``-byte register rows bounded by groups x blocks do, and NO
    second pass over the data is ever needed for a new pair.

    Intended for BOUNDED group counts (slice diagnostics): the driver
    folds one ``2^b``-byte register row per group and the pairwise
    table is groups^2 rows.  Error ~1.04/sqrt(2^b) on each cardinality
    (b=12 -> ~1.6%); the intersection inherits roughly the union's
    absolute error, so tiny intersections of huge slices are noise —
    use the exact op when that matters.

    Returns a Dataset ``(group_a, group_b, est_a, est_b, est_union,
    est_intersection, est_jaccard)`` with ``group_a < group_b``.
    """
    import ray
    import ray.data

    from torray.ops.window import _ds_field_type, _hash_col_np

    m = 1 << b
    gtype = _ds_field_type(ds, group_col)

    def fold(batch: pa.Table) -> pa.Table:
        keys = batch.column(group_col).to_numpy(zero_copy_only=False)
        hashes = _hash_values(batch.column(col))
        uniq, inv = np.unique(keys, return_inverse=True)
        reg2d = np.zeros((len(uniq), m), np.uint8)
        if hashes.size:
            idx, rho = _hll_idx_rho(hashes, b)
            np.maximum.at(reg2d, (inv, idx), rho)
        regs = pa.Array.from_buffers(
            pa.binary(m), len(uniq),
            [None, pa.py_buffer(np.ascontiguousarray(reg2d).tobytes())])
        return pa.table({group_col: pa.array(uniq, type=gtype),
                         "__reg": regs})

    parts = [t for t in ray.get(
        ds.select_columns([group_col, col])
        .map_batches(fold, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    empty = pa.table({
        "group_a": pa.array([], gtype), "group_b": pa.array([], gtype),
        "est_a": pa.array([], pa.int64()),
        "est_b": pa.array([], pa.int64()),
        "est_union": pa.array([], pa.int64()),
        "est_intersection": pa.array([], pa.int64()),
        "est_jaccard": pa.array([], pa.float64())})
    if not parts:
        return ray.data.from_arrow(empty)
    allp = pa.concat_tables(parts)  # one 2^b-byte row per (group,
    g = allp.column(group_col).to_numpy(zero_copy_only=False)  # block)
    col_reg = allp.column("__reg").combine_chunks()
    buf = np.frombuffer(col_reg.buffers()[1], np.uint8)
    mat = buf[col_reg.offset * m:
              (col_reg.offset + len(col_reg)) * m].reshape(-1, m)
    order = np.argsort(g, kind="stable")
    g, mat = g[order], mat[order]
    starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
    merged = np.maximum.reduceat(mat, starts, axis=0)
    groups = g[starts]
    est = _hll_estimate_rows(merged)
    k = len(groups)
    out = {c: [] for c in ("group_a", "group_b", "est_a", "est_b",
                           "est_union", "est_intersection",
                           "est_jaccard")}
    for i in range(k):
        for j in range(i + 1, k):
            u = float(_hll_estimate_rows(
                np.maximum(merged[i], merged[j])[None, :])[0])
            a, bb = float(est[i]), float(est[j])
            inter = max(0.0, a + bb - u)
            out["group_a"].append(groups[i])
            out["group_b"].append(groups[j])
            out["est_a"].append(int(round(a)))
            out["est_b"].append(int(round(bb)))
            out["est_union"].append(int(round(u)))
            out["est_intersection"].append(int(round(inter)))
            out["est_jaccard"].append(inter / u if u > 0 else 0.0)
    return ray.data.from_arrow(pa.table({
        "group_a": pa.array(out["group_a"], gtype),
        "group_b": pa.array(out["group_b"], gtype),
        "est_a": pa.array(out["est_a"], pa.int64()),
        "est_b": pa.array(out["est_b"], pa.int64()),
        "est_union": pa.array(out["est_union"], pa.int64()),
        "est_intersection": pa.array(out["est_intersection"],
                                     pa.int64()),
        "est_jaccard": pa.array(out["est_jaccard"], pa.float64())}))
