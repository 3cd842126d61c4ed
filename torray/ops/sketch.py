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
dedup ops use (:func:`torray.ops.dedup._mix64`, vectorized); strings
through per-value md5 with a bounded per-process memo.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from torray.ops.dedup import _mix64

__all__ = ["hll_registers", "hll_estimate", "approx_distinct",
           "approx_distinct_by", "approx_quantiles"]


def _hash_values(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_integer(t):
        vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return _mix64(vals.astype(np.int64))
    out = np.empty(len(col), np.uint64)
    for i, v in enumerate(col.to_pylist()):
        out[i] = int.from_bytes(
            hashlib.md5(str(v).encode()).digest()[:8], "big")
    return out


def hll_registers(hashes: np.ndarray, b: int = 12) -> np.ndarray:
    """Fold uint64 hashes into a 2^b uint8 register array: register
    index = top b bits, value = max(leading-zero run of the remaining
    64-b bits + 1).  Fully vectorized (bit ops + ``np.maximum.at``)."""
    m = 1 << b
    reg = np.zeros(m, np.uint8)
    if hashes.size == 0:
        return reg
    idx = (hashes >> np.uint64(64 - b)).astype(np.int64)
    w = (hashes << np.uint64(b)) | np.uint64((1 << b) - 1)  # sentinel
    # leading zeros of w via float64 exponent trick is lossy; use the
    # exact bit loop over 64-b positions in vector form instead:
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
    np.maximum.at(reg, idx, rho)
    return reg


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
                       out_col: str = "approx_distinct"):
    """Approximate COUNT(DISTINCT col) PER GROUP -> Dataset
    ``(group_col, approx_distinct)``.

    Per batch, values fold into one register row per (group, block) —
    so the groupby shuffle carries ``2^b``-byte sketch rows bounded by
    groups x blocks, never the raw values; a ``map_groups`` pass
    merges registers with an elementwise max and estimates.  The same
    register-merge shape every warehouse engine uses for grouped
    approx_count_distinct."""

    def fold(batch: pa.Table) -> pa.Table:
        keys = batch.column(group_col).to_numpy(zero_copy_only=False)
        hashes = _hash_values(batch.column(col))
        uniq, inv = np.unique(keys, return_inverse=True)
        regs = []
        for gi in range(len(uniq)):
            regs.append(hll_registers(hashes[inv == gi], b).tobytes())
        return pa.table({
            group_col: pa.array(uniq, type=batch.schema.field(
                group_col).type),
            "__reg": pa.array(regs, pa.binary()),
        })

    def merge(group: pa.Table) -> pa.Table:
        reg = np.zeros(1 << b, np.uint8)
        for buf in group.column("__reg").to_pylist():
            np.maximum(reg, np.frombuffer(buf, np.uint8), out=reg)
        return pa.table({
            group_col: group.column(group_col).slice(0, 1),
            out_col: pa.array([int(round(hll_estimate(reg)))],
                              pa.int64()),
        })

    return (ds.select_columns([group_col, col])
            .map_batches(fold, batch_format="pyarrow")
            .groupby(group_col)
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
