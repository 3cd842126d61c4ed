"""Bloom-filter semi-join: filter a huge table by key membership in a
smaller table WITHOUT shuffling the huge side first.

The classic distributed-join optimization (runtime filters in every
warehouse engine): fold the small side's join keys into a Bloom bit
array (per-block partial arrays OR-merged on the driver — the same
merge shape as the HLL sketch in :mod:`torray.ops.sketch`), broadcast
the bits once with ``ray.put``, and probe each big-side batch with
vectorized bit tests.  Survivors are a SUPERSET of the true matches
(Bloom filters have no false negatives); an optional exact pass joins
the (already shrunken) survivor stream against the small side's
distinct keys to drop the false positives, making the result an EXACT
semi-join whose shuffle moves only ``true matches + fp_rate x big``
rows instead of the whole big side.

Sizing: ``m_bits = 16 x |small keys|`` gives ~0.6% false positives
with 4 hash probes (k = m/n x ln2 ~ 11 would be lower still; 4 keeps
the probe cheap and the fp rate is dominated by the exact pass
anyway).  The bit array is ``m_bits / 8`` bytes — 2 MB per 10^6 keys
— well inside broadcast range for the "dimension table vs event
stream" shape this op exists for.

Hashing reuses the splitmix64 finalizer (:func:`torray.ops.dedup._mix64`)
with per-probe salts; string keys go through the vectorized FNV-1a
fold (:func:`torray.ops.dedup.fnv1a64_strings`) — never a Python hash
call per value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from torray.ops.dedup import _mix64, fnv1a64_strings

__all__ = ["bloom_bits", "bloom_probe", "bloom_semijoin",
           "bloom_antijoin"]

_SALTS = (0x243F6A8885A308D3, 0x13198A2E03707344,
          0xA4093822299F31D0, 0x082EFA98EC4E6C89)


def _key_hashes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return col.cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64).view(np.uint64)
    return fnv1a64_strings(col)


def _bit_positions(hashes: np.ndarray, m_bits: int,
                   n_hashes: int) -> list[np.ndarray]:
    return [
        (_mix64((hashes ^ np.uint64(_SALTS[i % len(_SALTS)]))
                .view(np.int64)) % np.uint64(m_bits)).astype(np.int64)
        for i in range(n_hashes)
    ]


def bloom_bits(small_ds, key: str, *, m_bits: int = 1 << 23,
               n_hashes: int = 4) -> np.ndarray:
    """Fold ``small_ds[key]`` into a packed Bloom bit array (uint8,
    ``m_bits/8`` bytes).  Per-block partials ride back as single
    binary rows; the driver OR-merges KBs-to-MBs regardless of row
    count."""

    def fold(batch: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, np.uint8)
        h = _key_hashes(batch.column(key))
        for pos in _bit_positions(h, m_bits, n_hashes):
            np.bitwise_or.at(bits, pos >> 3,
                             np.left_shift(1, pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = np.zeros(m_bits // 8, np.uint8)
    for row in small_ds.select_columns([key]).map_batches(
            fold, batch_format="pyarrow").take_all():
        np.bitwise_or(merged, np.frombuffer(row["bits"], np.uint8),
                      out=merged)
    return merged


def bloom_probe(hashes: np.ndarray, bits: np.ndarray, m_bits: int,
                n_hashes: int) -> np.ndarray:
    """Vectorized membership probe -> bool mask (no false negatives)."""
    mask = np.ones(hashes.size, np.bool_)
    for pos in _bit_positions(hashes, m_bits, n_hashes):
        mask &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
        if not mask.any():
            break
    return mask


def bloom_semijoin(big_ds, small_ds, *, big_key: str, small_key: str,
                   m_bits: int = 1 << 23, n_hashes: int = 4,
                   exact: bool = True, num_partitions: int = 8):
    """Rows of ``big_ds`` whose ``big_key`` appears in
    ``small_ds[small_key]`` (each row at most once, regardless of how
    many small-side matches exist).

    ``exact=False`` stops after the broadcast Bloom probe: a streaming
    superset with ~``(1 - e^{-kn/m})^k`` false positives and zero
    shuffles — the right mode when a downstream exact join follows
    anyway.  ``exact=True`` (default) adds an inner join of the
    survivor stream against the small side's distinct keys, so only
    Bloom survivors (not the whole big side) enter the shuffle."""
    import ray

    bits_ref = ray.put(bloom_bits(small_ds, small_key, m_bits=m_bits,
                                  n_hashes=n_hashes))

    def probe(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        mask = bloom_probe(_key_hashes(batch.column(big_key)), bits,
                           m_bits, n_hashes)
        return batch.filter(pa.array(mask))

    survivors = big_ds.map_batches(probe, batch_format="pyarrow")
    if not exact:
        return survivors
    # Bounded by matches + fp_rate x big; materialize so a zero-hit
    # probe (fully disjoint inputs) short-circuits instead of feeding
    # the hash join all-empty schemaless blocks (it rejects those).
    survivors = survivors.materialize()
    if survivors.count() == 0:
        return survivors

    def distinct_keys(t: pa.Table) -> pa.Table:
        g = t.select([small_key]).group_by(small_key).aggregate([])
        return g.rename_columns(["__sj_key"])

    keys = (small_ds.select_columns([small_key])
            .map_batches(distinct_keys, batch_format="pyarrow")
            .groupby("__sj_key").map_groups(
                lambda t: t.slice(0, 1), batch_format="pyarrow"))
    # Empty map_groups partitions emit schemaless 0-row blocks that the
    # hash join rejects; the repartition+materialize folds them away
    # (same workaround as ops.dedup's candidate path).
    keys = keys.repartition(2).materialize()
    from torray.ops.join import safe_join

    joined = safe_join(survivors, keys, "inner", num_partitions,
                       on=(big_key,), right_on=("__sj_key",))
    drop = [c for c in ("__sj_key",)]
    return joined.map_batches(
        lambda t: t.drop_columns([c for c in drop if c in t.column_names]),
        batch_format="pyarrow")


def bloom_antijoin(big_ds, small_ds, *, big_key: str, small_key: str,
                   m_bits: int = 1 << 23, n_hashes: int = 4,
                   num_partitions: int = 8):
    """EXACT anti-join: rows of ``big_ds`` whose ``big_key`` does NOT
    appear in ``small_ds[small_key]`` (SQL ``NOT EXISTS``).

    The Bloom filter's no-false-negatives guarantee works for the
    anti side too, just inverted: a row that FAILS the broadcast probe
    is definitely absent from the small side and streams straight to
    the output with ZERO shuffle.  Only probe survivors — true
    matches plus the ~0.6% false positives — need the exact check, a
    left-outer join against the small side's distinct keys keeping
    the unmatched rows.  At the "event stream vs dimension table"
    shape, the shuffle therefore carries ``matches + fp_rate x big``
    rows, not the big side.

    Null big-side keys never probe equal to anything (NOT EXISTS
    semantics keeps them); key columns are assumed non-null, matching
    :func:`bloom_semijoin`.
    """
    import ray

    bits_ref = ray.put(bloom_bits(small_ds, small_key, m_bits=m_bits,
                                  n_hashes=n_hashes))

    def split(batch: pa.Table, want_hit: bool) -> pa.Table:
        bits = ray.get(bits_ref)
        mask = bloom_probe(_key_hashes(batch.column(big_key)), bits,
                           m_bits, n_hashes)
        return batch.filter(pa.array(mask if want_hit else ~mask))

    _sch = big_ds.schema()
    out_cols = list(_sch.names) if _sch is not None else []
    definite = big_ds.map_batches(
        lambda t: split(t, False), batch_format="pyarrow")
    # The probe-hit stream is bounded by matches + fp_rate x big, so
    # materializing it is cheap at any input size — and necessary:
    # when NO row probes positive (fully disjoint corpora) every
    # block is a schemaless 0-row block the hash join rejects.
    maybe = big_ds.map_batches(
        lambda t: split(t, True), batch_format="pyarrow").materialize()
    if maybe.count() == 0:
        return definite.map_batches(
            lambda t: t.select(out_cols), batch_format="pyarrow")

    def distinct_keys(t: pa.Table) -> pa.Table:
        g = t.select([small_key]).group_by(small_key).aggregate([])
        g = g.rename_columns(["__aj_key"])
        return g.append_column(
            "__aj_hit", pa.array(np.ones(len(g), np.int8), pa.int8()))

    keys = (small_ds.select_columns([small_key])
            .map_batches(distinct_keys, batch_format="pyarrow")
            .groupby("__aj_key").map_groups(
                lambda t: t.slice(0, 1), batch_format="pyarrow"))
    # Same schemaless-empty-block join workaround as bloom_semijoin.
    keys = keys.repartition(2).materialize()
    from torray.ops.join import safe_join

    joined = safe_join(maybe, keys, "left_outer", num_partitions,
                       on=(big_key,), right_on=("__aj_key",))

    def unmatched(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.is_null(
            t.column("__aj_hit"))).select(out_cols)

    verified = joined.map_batches(unmatched, batch_format="pyarrow")
    return definite.map_batches(
        lambda t: t.select(out_cols), batch_format="pyarrow"
    ).union(verified)
