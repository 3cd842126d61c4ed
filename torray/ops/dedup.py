"""Deduplication operators over a documents Dataset.

Five families, each expressed shuffle-consciously:

- **Exact**: content hash inside ``map_batches`` (partial), then ONE
  ``groupby(hash)`` shuffle keeping the min doc_id per group.  The
  hash, not the text, is the shuffle key — at 100 TB the text bytes
  stay in their blocks.
- **MinHash + LSH** (Broder '97; banding per Mining of Massive
  Datasets ch.3): shingle -> 128 minhashes via tabulation over a
  stable 64-bit mixer -> b bands of r rows -> ``groupby(band_key)``;
  candidate pairs inside a bucket are verified with true shingle
  Jaccard.  One narrow shuffle of (band_key, doc_id) rows.
- **SimHash** (Charikar '02): 64-bit signature from token hashes;
  near-dups = Hamming distance <= k found by 4-way band rotation
  groupby (Manku et al. WWW'07).
- **n-gram Jaccard**: direct pairwise verify within candidate buckets
  (used standalone for small inputs / as the verifier for LSH).
- **Embedding cosine**: near-dup pairs above a cosine threshold over
  the embeddings table, blocked matmul per batch against a broadcast
  (``ray.put``) matrix — see ``torray.ops.similarity``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "mirror_hosts",
    "exact_dedup",
    "minhash_signatures_batch",
    "minhash_lsh_dedup",
    "simhash_batch",
    "simhash_dedup",
    "jaccard",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "prefix_jaccard_pairs",
    "bounded_pair_positions",
    "fnv1a64_strings",
    "salted_bucket_pairs",
    "pair_counts",
    "shared_passage_pairs",
    "deletion_neighborhood_keys",
    "edit_distance_le1",
    "edit_distance_pairs",
]

_WORD_RE = re.compile(r"\S+")


def _md5_64(data: bytes) -> int:
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain; Steele et al. '14) —
    deterministic, process-stable 64-bit mixing for salt assignment."""
    x = x.astype(np.uint64).copy()
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def fnv1a64_strings(col) -> np.ndarray:
    """Vectorized, process-stable 64-bit hash of an Arrow string /
    binary array -> uint64 numpy array (FNV-1a over the value bytes,
    finalized through :func:`_mix64` for avalanche in the high bits —
    HLL registers / Bloom bit positions use those).

    Shape: the value bytes are scattered once into a zero-padded
    (rows x maxlen) uint8 matrix, then ONE numpy pass per byte
    COLUMN folds all rows simultaneously — O(total_bytes) work with
    maxlen vector ops instead of one Python hash call per value.  Row
    chunks cap the padded matrix at ~64 MB so a skewed batch cannot
    balloon memory; values longer than ``_FNV_LONG_CUT`` bytes are
    folded through md5 first (length is intrinsic to the value, so
    the hash stays consistent across batches/partitions).  Nulls hash
    like the empty string.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(
            col.type) or pa.types.is_binary(col.type)
            or pa.types.is_large_binary(col.type)):
        col = col.cast(pa.string())
    col = col.cast(pa.large_binary())
    n = len(col)
    out = np.empty(n, np.uint64)
    if n == 0:
        return out
    buffers = col.buffers()
    offsets = np.frombuffer(buffers[1], np.int64,
                            count=n + 1, offset=col.offset * 8)
    data = (np.frombuffer(buffers[2], np.uint8) if buffers[2] is not None
            else np.empty(0, np.uint8))
    lengths = offsets[1:] - offsets[:-1]
    if col.null_count:
        null = col.is_null().to_numpy(zero_copy_only=False)
        lengths = np.where(null, 0, lengths)

    long_rows = np.flatnonzero(lengths > _FNV_LONG_CUT)
    for i in long_rows:
        out[i] = int.from_bytes(
            hashlib.md5(data[offsets[i]:offsets[i] + lengths[i]]
                        .tobytes()).digest()[:8], "big")
    short = (np.flatnonzero(lengths <= _FNV_LONG_CUT)
             if long_rows.size else np.arange(n))

    prime = np.uint64(0x100000001B3)
    basis = np.uint64(0xCBF29CE484222325)
    chunk = max(1, (64 << 20) // (_FNV_LONG_CUT + 1))
    with np.errstate(over="ignore"):
        for c0 in range(0, short.size, chunk):
            rows = short[c0:c0 + chunk]
            ln = lengths[rows]
            maxlen = int(ln.max()) if rows.size else 0
            h = np.full(rows.size, basis, np.uint64)
            if maxlen:
                total = int(ln.sum())
                rr = np.repeat(np.arange(rows.size), ln)
                cc = (np.arange(total)
                      - np.repeat(np.cumsum(ln) - ln, ln))
                src = np.repeat(offsets[rows], ln) + cc
                mat = np.zeros((rows.size, maxlen), np.uint8)
                mat[rr, cc] = data[src]
                for j in range(maxlen):
                    alive = ln > j
                    hj = (h ^ mat[:, j].astype(np.uint64)) * prime
                    h = np.where(alive, hj, h)
            out[rows] = h
    # splitmix64 finalizer: FNV-1a's raw high bits avalanche poorly on
    # short keys, and HLL/Bloom consumers index by the TOP bits.
    return _mix64(out)


_FNV_LONG_CUT = 4096


def bounded_pair_positions(ids_sorted: np.ndarray,
                           cap: int | None) -> tuple[np.ndarray, np.ndarray]:
    """Candidate-pair POSITIONS (i < j into ``ids_sorted``) for one LSH
    bucket, with degenerate buckets bounded.

    A bucket of m docs naively emits O(m^2) pairs; at web scale one
    boilerplate/empty-document bucket would quadratically flood the
    pair shuffle.  Buckets wider than ``cap`` are salt-split into
    ~``m/cap`` sub-buckets by a splitmix64 hash of the doc id (all
    pairs within a sub-bucket) plus a connectivity star: the global
    bucket minimum is paired with each sub-bucket minimum, so every
    member stays reachable from the bucket's keeper — a group of
    identical documents still collapses to one keeper even though not
    every cross-sub-bucket pair is emitted.  Output size is O(m*cap)
    instead of O(m^2); the lost pairs are the documented recall
    trade-off of capping (raise ``cap`` to recover them, or pass
    ``cap=None`` for the exact all-pairs emission — used by the exact
    set-similarity ops where capping would change the answer).
    """
    n = len(ids_sorted)
    if n < 2:
        e = np.empty(0, np.int64)
        return e, e
    if cap is None or n <= cap:
        ii, jj = np.triu_indices(n, 1)
        return ii.astype(np.int64), jj.astype(np.int64)
    n_groups = -(-n // cap)
    salt = (_mix64(ids_sorted) % np.uint64(n_groups)).astype(np.int64)
    pos = np.arange(n, dtype=np.int64)
    out_i, out_j = [], []
    star_targets = []
    for g in range(n_groups):
        members = pos[salt == g]
        m = len(members)
        if m == 0:
            continue
        if members[0] != 0:
            star_targets.append(members[0])
        if m >= 2:
            ii, jj = np.triu_indices(m, 1)
            out_i.append(members[ii])
            out_j.append(members[jj])
    if star_targets:
        t = np.asarray(star_targets, np.int64)
        out_i.append(np.zeros(len(t), np.int64))
        out_j.append(t)
    if not out_i:
        e = np.empty(0, np.int64)
        return e, e
    return np.concatenate(out_i), np.concatenate(out_j)


def salted_bucket_pairs(ds, key_col: str, id_col: str, *,
                        max_bucket: int | None, num_partitions: int = 64,
                        payload_col: str | None = None,
                        pair_filter=None, emit_payload: bool = False,
                        emit_key: bool = False):
    """(int64 key, int64 id) rows -> bounded candidate ``(id_a, id_b)``
    pairs, one pair stream per BUCKET (= distinct key) — without one
    Python call per bucket.

    ``groupby(key).map_groups`` invokes Python once per distinct key;
    at web scale almost every band bucket is a singleton, so that is
    millions of no-op calls (measured: 14 s of a 34 s minhash run at
    100k docs).  Instead the keys are salted into ``num_partitions``
    coarse groups (a bucket never straddles two — the salt is a pure
    function of the key), and within a partition buckets are RUNS of
    the lexsorted key column: multi-member runs are selected
    vectorized, and only those few reach Python
    (:func:`bounded_pair_positions` per run, same capping contract).

    ``payload_col`` (uint64/int64) rides along sorted with the ids;
    ``pair_filter(pay_a, pay_b)`` then vets each candidate pair
    vectorized (e.g. simhash xor+popcount) before it is emitted.
    With ``emit_payload=True`` the surviving pairs carry their
    payloads out as ``pay_a`` / ``pay_b`` int64 columns (e.g. set
    sizes for exact Jaccard, where the downstream aggregate needs
    them without a second join against the corpus).
    """
    cols = [key_col, id_col] + ([payload_col] if payload_col else [])
    out_cols = (["id_a", "id_b", "pay_a", "pay_b"]
                if emit_payload else ["id_a", "id_b"])
    if emit_key:  # carry the bucket key out with each pair (e.g. the
        out_cols = out_cols + ["key"]  # wedge CENTER in graph kernels)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # schemaless empty map_groups blocks
            out = {c: pa.array([], pa.int64()) for c in cols}
            out["__part"] = pa.array([], pa.int64())
            return pa.table(out)
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        part = (_mix64(k) % np.uint64(num_partitions)).astype(np.int64)
        out = {c: t.column(c) for c in cols}
        out["__part"] = pa.array(part, pa.int64())
        return pa.table(out)

    def run_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.array([], pa.int64()) for c in out_cols})
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        if len(k) < 2:
            return empty
        order = np.lexsort((ids, k))
        k, ids = k[order], ids[order]
        pay = None
        if payload_col is not None:
            pay = group.column(payload_col).to_numpy(
                zero_copy_only=False)[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        ends = np.append(starts[1:], len(k))
        multi = np.flatnonzero(ends - starts >= 2)
        out_a, out_b, out_pa, out_pb, out_k = [], [], [], [], []
        for m in multi:
            s, e = starts[m], ends[m]
            run_ids = ids[s:e]
            run_pay = pay[s:e] if pay is not None else None
            # dedup repeated ids within the bucket (keep first payload)
            keep = np.concatenate(([True], run_ids[1:] != run_ids[:-1]))
            run_ids = run_ids[keep]
            if run_pay is not None:
                run_pay = run_pay[keep]
            if len(run_ids) < 2:
                continue
            ii, jj = bounded_pair_positions(run_ids, max_bucket)
            if pair_filter is not None and len(ii):
                mask = pair_filter(run_pay[ii], run_pay[jj])
                ii, jj = ii[mask], jj[mask]
            if len(ii):
                out_a.append(run_ids[ii])
                out_b.append(run_ids[jj])
                if emit_payload:
                    out_pa.append(run_pay[ii])
                    out_pb.append(run_pay[jj])
                if emit_key:
                    out_k.append(np.full(len(ii), k[s], np.int64))
        if not out_a:
            return empty
        out = {
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
        }
        if emit_payload:
            out["pay_a"] = pa.array(
                np.concatenate(out_pa).view(np.int64), pa.int64())
            out["pay_b"] = pa.array(
                np.concatenate(out_pb).view(np.int64), pa.int64())
        if emit_key:
            out["key"] = pa.array(np.concatenate(out_k), pa.int64())
        return pa.table(out)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(run_pairs, batch_format="pyarrow"))


def pair_counts(pairs_ds, *, with_payload: bool = False,
                num_partitions: int = 64, count_col: str = "n_shared"):
    """Reduce a ``(id_a, id_b[, pay_a, pay_b])`` pair stream to one row
    per distinct pair with its occurrence count — the aggregation every
    pair-generating op needs, done as a salted run-scan.

    Ray's generic multi-column ``groupby().aggregate()`` measured ~500
    core-seconds on 1.3M pair rows (sf0.1 n-gram Jaccard) where this
    shape — partition tag (pure function of the pair), ONE groupby on
    the small partition id, one lexsort + vectorized run-length count
    inside each partition — is sub-second.  Payloads (constant per
    pair by construction) keep their first occurrence.
    """
    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # schemaless empty map_groups blocks
            cols = {c: pa.array([], pa.int64())
                    for c in (["id_a", "id_b"]
                              + (["pay_a", "pay_b"] if with_payload
                                 else []))}
            cols["__part2"] = pa.array([], pa.int64())
            return pa.table(cols)
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        mixed = _mix64(a.astype(np.int64)) ^ _mix64(~b.astype(np.int64))
        part = (mixed % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__part2", pa.array(part, pa.int64()))

    out_cols = ["id_a", "id_b", count_col] + (
        ["pay_a", "pay_b"] if with_payload else [])

    def reduce_runs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out_cols})
        a = group.column("id_a").to_numpy(zero_copy_only=False)
        b = group.column("id_b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))))
        counts = np.diff(np.append(starts, len(a)))
        out = {
            "id_a": pa.array(a[starts], pa.int64()),
            "id_b": pa.array(b[starts], pa.int64()),
            count_col: pa.array(counts.astype(np.int64), pa.int64()),
        }
        if with_payload:
            for c in ("pay_a", "pay_b"):
                p = group.column(c).to_numpy(zero_copy_only=False)[order]
                out[c] = pa.array(p[starts].astype(np.int64), pa.int64())
        return pa.table(out)

    return (pairs_ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__part2")
            .map_groups(reduce_runs, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Exact dedup.
# ---------------------------------------------------------------------------


def exact_dedup(docs_ds, text_col: str = "text"):
    """Keep the smallest doc_id per exact text; returns
    (keeper_id, n_dups) per distinct text hash.

    Partial work (hashing) happens in map_batches; the groupby moves
    only (hash, doc_id)."""
    import ray.data

    def hash_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hashes = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                  for t in texts]
        return pa.table({
            "text_hash": pa.array(hashes, pa.string()),
            "doc_id": batch.column("doc_id"),
        })

    hashed = docs_ds.select_columns(["doc_id", text_col]).map_batches(
        hash_batch, batch_format="pyarrow")
    agg = hashed.groupby("text_hash").aggregate(
        ray.data.aggregate.Min("doc_id"),
        ray.data.aggregate.Count(),
    )
    return agg.map_batches(
        lambda t: pa.table({
            "text_hash": t.column("text_hash"),
            "keeper_id": t.column("min(doc_id)"),
            "n_dups": t.column("count()"),
        }),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# MinHash + LSH.
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1

# Candidate sets at or below this many pairs take the broadcast
# verify path (id set shipped once via ray.put; ~16 MB of int64 ids
# at the cap).  Larger sets stay fully distributed.
_PREFILTER_MAX_PAIRS = 2_000_000


def _shingles(text: str, k: int = 3) -> set[int]:
    """Word k-gram shingles as stable 64-bit hashes."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        return {_md5_64(" ".join(words).encode())} if words else set()
    return {_md5_64(" ".join(words[i:i + k]).encode())
            for i in range(len(words) - k + 1)}


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures_batch(batch: pa.Table, *, num_perm: int = 128,
                             shingle_k: int = 3,
                             text_col: str = "text") -> pa.Table:
    a, b = _PERMS.setdefault(num_perm, _perm_params(num_perm))
    texts = batch.column(text_col).to_pylist()
    sigs = []
    for t in texts:
        sh = np.fromiter(_shingles(t or "", shingle_k), dtype=np.uint64)
        if len(sh) == 0:
            sigs.append(np.zeros(num_perm, dtype=np.uint64))
            continue
        # (a*x + b) mod p per permutation, min over shingles.
        vals = (np.multiply.outer(a, sh) + b[:, None]) % _MERSENNE
        sigs.append(vals.min(axis=1).astype(np.uint64))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "minhash": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.uint64(), num_perm)),
    })


_PERMS: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def jaccard(text_a: str, text_b: str, shingle_k: int = 3) -> float:
    sa, sb = _shingles(text_a, shingle_k), _shingles(text_b, shingle_k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_dedup(docs_ds, *, num_perm: int = 128, bands: int = 32,
                      threshold: float = 0.8, shingle_k: int = 3,
                      text_col: str = "text", num_partitions: int = 8,
                      max_bucket: int = 256):
    """Near-duplicate PAIRS (id_a < id_b, true-Jaccard-verified >=
    threshold) via MinHash banding.

    Pipeline: signatures (map_batches) -> explode to (band_key, doc_id)
    rows — the band shuffle moves NOTHING but a ~24-byte key pair per
    band, never the text — -> groupby(band_key) emits candidate pairs
    -> one dedup groupby collapses multi-band hits -> the surviving
    pairs fetch texts for the exact-Jaccard verify via two hash joins
    against the documents table PRE-FILTERED to candidate ids (the
    candidate id set is broadcast once with ``ray.put``; the filter is
    a streaming ``np.isin`` per batch), so only candidate documents'
    text ever enters a shuffle — non-candidate text bytes never leave
    their blocks.

    Degenerate band buckets (many docs sharing one band value —
    boilerplate, empty pages, adversarial corpora) are bounded by
    ``max_bucket``: see :func:`bounded_pair_positions` (salt-split +
    connectivity star, O(m*cap) candidate rows instead of O(m^2)).
    """
    rows = num_perm // bands
    _FNV = np.uint64(1099511628211)

    def banded(batch: pa.Table) -> pa.Table:
        sig_batch = minhash_signatures_batch(
            batch, num_perm=num_perm, shingle_k=shingle_k, text_col=text_col)
        n = len(sig_batch)
        col = sig_batch.column("minhash").combine_chunks()
        sigs = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.uint64).reshape(n, num_perm)
        ids = sig_batch.column("doc_id").to_numpy(zero_copy_only=False)
        # int64 band key: band index in the top 6 bits, FNV fold of the
        # band's rows below (56-bit value space per band — collisions
        # only create extra verify candidates, never wrong results,
        # because every pair is exact-Jaccard verified downstream).
        keys = np.empty(bands * n, np.uint64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                h = np.zeros(n, np.uint64)
                for r in range(rows):
                    h = h * _FNV + sigs[:, b * rows + r]
                keys[b * n:(b + 1) * n] = (
                    (np.uint64(b) << np.uint64(56)) | (h >> np.uint64(8)))
        return pa.table({
            "band_key": pa.array(keys.view(np.int64), pa.int64()),
            "doc_id": pa.array(np.tile(ids, bands), pa.int64()),
        })

    import ray.data

    candidates = (
        pair_counts(  # same pair can surface from several bands: dedup
            salted_bucket_pairs(
                docs_ds.select_columns(["doc_id", text_col])
                .map_batches(banded, batch_format="pyarrow"),
                "band_key", "doc_id", max_bucket=max_bucket))
        .map_batches(lambda t: t.select(["id_a", "id_b"]),
                     batch_format="pyarrow")
    )
    # Candidates are id pairs only — object-store materialization is
    # cheap at any corpus size and avoids re-running the banding DAG
    # for each join below; the count() short-circuits no-candidates.
    candidates = candidates.materialize()
    n_cand = candidates.count()
    if n_cand == 0:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64())}))
    verify_ds = docs_ds.select_columns(["doc_id", text_col])
    if n_cand <= _PREFILTER_MAX_PAIRS:
        # Common case: candidates are a tiny fraction of the corpus.
        # Pull the (bounded) id pairs once, rebuild them as ONE clean
        # block (sidesteps the schemaless-0-row-block join bug without
        # a second repartition+materialize), and broadcast the id set
        # so the verify joins below shuffle ONLY candidate documents —
        # non-candidate text never leaves its block.
        import ray as _ray

        cand_tbl = pa.concat_tables(
            [t for t in _ray.get(candidates.to_arrow_refs())
             if t.num_rows])
        candidates = ray.data.from_arrow(cand_tbl)
        cand_ids = np.unique(np.concatenate([
            cand_tbl.column("id_a").to_numpy(zero_copy_only=False),
            cand_tbl.column("id_b").to_numpy(zero_copy_only=False)]))
        ids_ref = _ray.put(cand_ids)

        def prefilter(t: pa.Table) -> pa.Table:
            import ray as _r

            mask = np.isin(
                t.column("doc_id").to_numpy(zero_copy_only=False),
                _r.get(ids_ref))
            return t.filter(pa.array(mask))

        # Materialized: both verify joins consume this stream; without
        # the pin each join re-reads and re-filters the whole corpus.
        # It holds CANDIDATE documents only, so it is bounded by the
        # candidate set, not the corpus.
        verify_ds = verify_ds.map_batches(
            prefilter, batch_format="pyarrow").materialize()
    else:
        # Adversarially-huge candidate sets: stay fully distributed.
        # The repartition folds away the schemaless 0-row blocks that
        # empty map_groups partitions emit; the second materialize
        # keeps the join DAG's aggregator CPU reservations minimal.
        candidates = candidates.repartition(num_partitions).materialize()

    def side(ds, id_name: str, text_name: str):
        return ds.map_batches(
            lambda t: pa.table({id_name: t.column("doc_id"),
                                text_name: t.column(text_col)}),
            batch_format="pyarrow")

    from torray.ops.join import safe_join

    joined = safe_join(
        candidates, side(verify_ds, "id_a", "__text_a"), "inner",
        num_partitions, on=("id_a",))
    joined = safe_join(
        joined, side(verify_ds, "id_b", "__text_b"), "inner",
        num_partitions, on=("id_b",))

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        # A hub document appears in MANY candidate pairs (boilerplate);
        # memoize its shingle set per batch instead of re-shingling it
        # for every pair it participates in.
        ida = batch.column("id_a").to_pylist()
        idb = batch.column("id_b").to_pylist()
        ta = batch.column("__text_a").to_pylist()
        tb = batch.column("__text_b").to_pylist()
        sh: dict[int, set] = {}
        for i, t in zip(ida + idb, ta + tb):
            if i not in sh:
                sh[i] = _shingles(t or "", shingle_k)
        keep = []
        for a, b in zip(ida, idb):
            sa, sb = sh[a], sh[b]
            if not sa and not sb:
                keep.append(1.0 >= threshold)
            elif not sa or not sb:
                keep.append(0.0 >= threshold)
            else:
                inter = len(sa & sb)
                keep.append(
                    inter / (len(sa) + len(sb) - inter) >= threshold)
        return batch.filter(pa.array(keep)).select(["id_a", "id_b"])

    return joined.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash.
# ---------------------------------------------------------------------------


# Token-hash memo: vocabularies are zipfian, so most tokens repeat;
# the memo turns the md5-per-token cost into a dict hit.  Capped so a
# long-lived worker cannot grow without bound.
_TOKEN_HASHES: dict[str, int] = {}
_TOKEN_HASHES_CAP = 1 << 20


def _token_hash(tok: str) -> int:
    h = _TOKEN_HASHES.get(tok)
    if h is None:
        h = _md5_64(tok.encode())
        if len(_TOKEN_HASHES) < _TOKEN_HASHES_CAP:
            _TOKEN_HASHES[tok] = h
    return h


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    out = []
    shifts = np.arange(64, dtype=np.uint64)
    weights = np.uint64(1) << shifts
    for t in texts:
        tokens = _WORD_RE.findall((t or "").lower())
        if not tokens:
            out.append(0)
            continue
        hs = np.fromiter((_token_hash(tok) for tok in tokens),
                         dtype=np.uint64, count=len(tokens))
        # (n_tokens, 64) bit matrix -> per-bit vote in one reduction.
        votes = ((hs[:, None] >> shifts) & np.uint64(1)).astype(
            np.int64).sum(axis=0) * 2 - len(tokens)
        out.append(int(weights[votes > 0].sum()))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "simhash": pa.array(out, pa.uint64()),
    })


_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via a byte lookup table."""
    v = v.astype(np.uint64)
    out = np.zeros(len(v), np.int64)
    for k in range(8):
        out += _POP8[((v >> np.uint64(8 * k)) &
                      np.uint64(0xFF)).astype(np.int64)]
    return out


def simhash_dedup(docs_ds, *, max_hamming: int = 3, text_col: str = "text",
                  max_bucket: int = 256):
    """Near-dup pairs with simhash Hamming distance <= max_hamming.

    Candidate generation: split the 64-bit signature into 4 16-bit
    bands; any pair within Hamming <= 3 shares at least one exact band
    (pigeonhole, Manku et al.) -> groupby(band value) then in-bucket
    verify.  Shuffles only (band_key, doc_id, simhash).  Degenerate
    buckets are bounded by ``max_bucket`` exactly as in
    :func:`minhash_lsh_dedup` (salt-split + connectivity star via
    :func:`bounded_pair_positions`); the Hamming check itself is a
    vectorized xor+popcount over the candidate positions."""

    def banded(batch: pa.Table) -> pa.Table:
        sig_batch = simhash_batch(batch, text_col)
        n = len(sig_batch)
        ids = sig_batch.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = sig_batch.column("simhash").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        # int64 band key: band index in bits 16-17, 16-bit chunk below
        # — fully vectorized, no per-doc Python.
        keys = np.empty(4 * n, np.uint64)
        for band in range(4):
            chunk = (sigs >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            keys[band * n:(band + 1) * n] = (
                (np.uint64(band) << np.uint64(16)) | chunk)
        return pa.table({
            "band_key": pa.array(keys.view(np.int64), pa.int64()),
            "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
            "simhash": pa.array(np.tile(sigs, 4).view(np.int64),
                                pa.int64()),
        })

    def hamming_ok(pay_a: np.ndarray, pay_b: np.ndarray) -> np.ndarray:
        return _popcount64(pay_a.view(np.uint64)
                           ^ pay_b.view(np.uint64)) <= max_hamming

    pair_ds = salted_bucket_pairs(
        docs_ds.select_columns(["doc_id", text_col])
        .map_batches(banded, batch_format="pyarrow"),
        "band_key", "doc_id", max_bucket=max_bucket,
        payload_col="simhash", pair_filter=hamming_ok)
    return pair_counts(pair_ds).map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")


_ROLL_BASE = np.uint64(1099511628211)
_ROLL_INV = np.uint64(pow(1099511628211, -1, 1 << 64))


def shingle_hash_rows(texts, k: int) -> tuple[np.ndarray, np.ndarray,
                                              np.ndarray]:
    """DISTINCT word ``k``-gram hashes for every text of a batch,
    fully vectorized -> ``(hash uint64, doc_idx int64, set_size
    int64)`` rows.

    Semantics mirror :func:`_shingles` (equality over lowercased
    ``\\S+`` word SEQUENCES; docs with 1..k-1 words collapse to one
    whole-doc shingle; wordless docs emit nothing) but the hash is a
    positional polynomial over vectorized per-word FNV hashes —
    ``h(i..j) = (S[j+1]-S[i]) * base^-i`` with prefix sums in
    wrap-around uint64 (the spans.py rolling-hash construction lifted
    from characters to words) — ONE numpy pass per batch instead of
    one Python md5 per shingle, which measured 197 s of a 216 s
    containment run at 100k docs before this rewrite.
    """
    words_per = [_WORD_RE.findall(t.lower()) if t else []
                 for t in texts]
    lens = np.fromiter((len(w) for w in words_per), np.int64,
                       len(words_per))
    n = int(lens.sum())
    z = np.empty(0, np.int64)
    if n == 0:
        return z.view(np.uint64), z, z
    flat = [w for ws in words_per for w in ws]
    W = fnv1a64_strings(pa.array(flat, pa.string())) + np.uint64(1)
    pw = np.empty(n, np.uint64)
    pw[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _ROLL_BASE, np.uint64), out=pw[1:])
    S = np.zeros(n + 1, np.uint64)
    np.cumsum(W * pw, out=S[1:])
    ipw = np.empty(n, np.uint64)
    ipw[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _ROLL_INV, np.uint64), out=ipw[1:])
    starts = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=starts[1:])

    # full k-grams: window start positions fully inside one doc
    if n >= k:
        m = n - k + 1
        gpos = np.arange(m, dtype=np.int64)
        di = np.searchsorted(starts[1:], gpos, side="right")
        ok = gpos + k <= starts[di + 1]
        gpos, di = gpos[ok], di[ok]
        h_full = (S[gpos + k] - S[gpos]) * ipw[gpos]
    else:
        h_full = np.empty(0, np.uint64)
        di = z
    # short docs (0 < len < k): one whole-doc shingle each
    short = np.flatnonzero((lens > 0) & (lens < k))
    if len(short):
        s0 = starts[short]
        h_short = (S[starts[short + 1]] - S[s0]) * ipw[s0]
        h = np.concatenate([h_full, h_short])
        d = np.concatenate([di, short])
    else:
        h, d = h_full, di
    if not len(h):
        return z.view(np.uint64), z, z
    # distinct per doc + per-doc set sizes, via one lexsort
    order = np.lexsort((h, d))
    h, d = h[order], d[order]
    keep = np.concatenate(([True], (h[1:] != h[:-1]) | (d[1:] != d[:-1])))
    h, d = h[keep], d[keep]
    seg = np.concatenate(([True], d[1:] != d[:-1]))
    sizes = np.diff(np.append(np.flatnonzero(seg), len(d)))
    return h, d, np.repeat(sizes, sizes).astype(np.int64)


def _make_shingle_explode(text_col: str, shingle_k: int):
    """map_batches fn: documents -> distinct-shingle rows
    ``(gram, doc_id, set_size)`` (int64; empty-shingle docs emit
    nothing) — vectorized via :func:`shingle_hash_rows`."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        h, di, sz = shingle_hash_rows(texts, shingle_k)
        if not len(h):
            return pa.table({"gram": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "set_size": pa.array([], pa.int64())})
        return pa.table({
            "gram": pa.array(h.view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[di].astype(np.int64), pa.int64()),
            "set_size": pa.array(sz, pa.int64())})

    return explode


def ngram_jaccard_pairs(docs_ds, *, threshold: float = 0.8,
                        shingle_k: int = 3, text_col: str = "text",
                        max_bucket: int | None = None,
                        num_partitions: int = 64):
    """All pairs with word ``shingle_k``-gram Jaccard >= threshold —
    EXACT set similarity, computed distributed (no LSH, no O(n^2)
    driver block).  The exact baseline the probabilistic family
    (:func:`minhash_lsh_dedup`, :func:`simhash_dedup`) is validated
    against, and a real operator in its own right on corpora where
    exactness matters (eval-set contamination audits, gold dedup).

    Scale shape (the shared-token inverted-index construction behind
    PPJoin-style exact joins, without the prefix filter): each
    document emits its DISTINCT shingle hashes once as narrow
    ``(gram, doc_id, set_size)`` int64 rows — text bytes never leave
    their blocks.  One shuffle groups by gram; the per-pair emission
    count across buckets IS ``|A ∩ B|``, and with the set sizes
    carried on the pair rows the Jaccard is
    ``shared / (|A| + |B| - shared)`` after the final pair-count
    groupby — no verify join back to the corpus at all.

    ``max_bucket=None`` (default) keeps the op exact; a corpus-wide
    gram (stopword run, boilerplate) emits O(m^2) pairs for its m
    members, which is inherent to exactness.  Pass ``max_bucket`` to
    bound degenerate buckets with the LSH family's salt-split
    semantics; capping UNDERCOUNTS shared grams for salt-separated
    pairs, so the capped mode is a high-precision subset — it may
    drop borderline pairs, never invent one.

    Docs whose shingle set is empty (no tokens) pair with nothing,
    matching :func:`jaccard`'s empty-vs-nonempty = 0.0 convention.
    """
    explode = _make_shingle_explode(text_col, shingle_k)

    pairs = salted_bucket_pairs(
        docs_ds.select_columns(["doc_id", text_col])
        .map_batches(explode, batch_format="pyarrow"),
        "gram", "doc_id", max_bucket=max_bucket,
        num_partitions=num_partitions,
        payload_col="set_size", emit_payload=True)
    agg = pair_counts(pairs, with_payload=True,
                      num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        shared = t.column("n_shared").to_numpy(
            zero_copy_only=False).astype(np.float64)
        sa = t.column("pay_a").to_numpy(
            zero_copy_only=False).astype(np.float64)
        sb = t.column("pay_b").to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = shared / (sa + sb - shared) >= threshold
        return t.filter(pa.array(keep)).select(["id_a", "id_b"])

    return agg.map_batches(finish, batch_format="pyarrow")


def ngram_containment_pairs(docs_ds, *, threshold: float = 0.8,
                            shingle_k: int = 3, text_col: str = "text",
                            max_bucket: int | None = None,
                            num_partitions: int = 64):
    """All pairs where the smaller document's word ``shingle_k``-gram
    set is >= ``threshold`` CONTAINED in the other —
    ``shared / min(|A|, |B|)`` — exact and distributed.

    Containment is the asymmetric complement to
    :func:`ngram_jaccard_pairs`: a short quote embedded verbatim in a
    long page has near-zero Jaccard (the union is dominated by the
    long side) but containment ~1.0, which is exactly the
    quote-inclusion / page-wrapping duplication shape web corpora are
    full of (same article + different boilerplate shell).  Same scale
    shape as the Jaccard op: distinct shingles leave each block once
    as narrow int64 ``(gram, doc_id, set_size)`` rows, one shuffle,
    pair-emission count = ``|A ∩ B|``, set sizes ride the pair rows —
    no verify join, text bytes never shuffle.

    ``max_bucket`` semantics match :func:`ngram_jaccard_pairs`
    (``None`` = exact; capped = high-precision subset).
    """
    explode = _make_shingle_explode(text_col, shingle_k)

    pairs = salted_bucket_pairs(
        docs_ds.select_columns(["doc_id", text_col])
        .map_batches(explode, batch_format="pyarrow"),
        "gram", "doc_id", max_bucket=max_bucket,
        num_partitions=num_partitions,
        payload_col="set_size", emit_payload=True)
    agg = pair_counts(pairs, with_payload=True,
                      num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        shared = t.column("n_shared").to_numpy(
            zero_copy_only=False).astype(np.float64)
        sa = t.column("pay_a").to_numpy(
            zero_copy_only=False).astype(np.float64)
        sb = t.column("pay_b").to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = shared / np.minimum(sa, sb) >= threshold
        return t.filter(pa.array(keep)).select(["id_a", "id_b"])

    return agg.map_batches(finish, batch_format="pyarrow")


def prefix_jaccard_pairs(docs_ds, *, threshold: float = 0.8,
                         shingle_k: int = 3, text_col: str = "text",
                         num_partitions: int = 64,
                         max_candidate_pairs: int | None = 50_000_000,
                         fallback: str = "warn"):
    """EXACT n-gram Jaccard join with PPJoin-style PREFIX FILTERING
    (Chaudhuri et al. SSJoin '06 / Bayardo et al. WWW'07, public
    algorithm) — same output as :func:`ngram_jaccard_pairs`, but
    candidate generation is bounded on hot-gram corpora WITHOUT losing
    exactness.

    Prefix-filter lemma: under any global total order on grams, two
    sets with ``J >= threshold`` share at least one gram among the
    first ``|X| - ceil(threshold*|X|) + 1`` grams of EACH set.  Using
    ascending document frequency as the order puts the RAREST grams
    in the prefixes, so prefix buckets are small by construction and
    the corpus-wide boilerplate gram that floods
    :func:`ngram_jaccard_pairs`' bucket pairing never generates
    candidates at all.

    Stages (all narrow int64 shuffles):
    1. explode distinct (gram, doc_id, set_size) rows;
    2. groupby(gram) run-scan attaches df = bucket length to each row;
    3. groupby(doc) run-scan sorts each doc's grams by (df, gram) and
       keeps its prefix;
    4. bucket-pair the PREFIX rows (exact, uncapped — prefixes are
       rare grams) and dedup into candidate pairs;
    5. verify: re-bucket the FULL gram rows of candidate documents
       only (broadcast id filter), count shared grams per surviving
       pair, Jaccard from the carried set sizes.

    The verify's pair emission is restricted to candidate pairs with
    a broadcast membership probe BEFORE the shuffle, so hot grams
    among candidate docs cost in-task compute, never shuffle rows.

    REGIME GUARD: on a corpus with no document-frequency tail (every
    gram hot — e.g. near-identical boilerplate docs) the prefix
    filter cannot prune and candidate volume degenerates toward
    O(n^2) — that cost is exact-join-INHERENT, not an implementation
    defect (446 s at 100 k degenerate docs, measured).  Before
    pairing, the op computes the free upper bound
    ``sum_over_prefix_rows(df - 1) / 2`` from the df it already
    carries; when it exceeds ``max_candidate_pairs``, ``fallback``
    decides: ``"warn"`` (default) logs the measured bound and
    proceeds, ``"error"`` raises, ``"minhash"`` routes to
    :func:`minhash_lsh_dedup` at the same threshold (exact-verified
    pairs, but probabilistic recall < 1 — the documented trade for a
    bounded candidate stream), ``"none"`` disables the check.
    """
    import ray
    import ray.data

    explode = _make_shingle_explode(text_col, shingle_k)
    rows = docs_ds.select_columns(["doc_id", text_col]).map_batches(
        explode, batch_format="pyarrow")

    # -- stage 2: df per gram, attached to every (gram, doc) row.
    def tag_gram(t: pa.Table) -> pa.Table:
        g = t.column("gram").to_numpy(zero_copy_only=False)
        part = (_mix64(g) % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    def attach_df(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "set_size": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        g = group.column("gram").to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        g_s = g[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], g_s[1:] != g_s[:-1])))
        lens = np.diff(np.append(starts, len(g_s)))
        df_sorted = np.repeat(lens, lens)
        df = np.empty(len(g), np.int64)
        df[order] = df_sorted
        return pa.table({
            "gram": group.column("gram"),
            "doc_id": group.column("doc_id"),
            "set_size": group.column("set_size"),
            "df": pa.array(df, pa.int64())})

    with_df = (rows.map_batches(tag_gram, batch_format="pyarrow")
               .groupby("__part")
               .map_groups(attach_df, batch_format="pyarrow"))

    # -- stage 3: keep each doc's prefix under the (df, gram) order.
    def tag_doc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "set_size": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64()),
                             "__dpart": pa.array([], pa.int64())})
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        part = (_mix64(d) % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__dpart", pa.array(part, pa.int64()))

    def cut_prefix(group: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "set_size": pa.array([], pa.int64()),
                          "df": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        g = group.column("gram").to_numpy(zero_copy_only=False)
        df = group.column("df").to_numpy(zero_copy_only=False)
        sz = group.column("set_size").to_numpy(zero_copy_only=False)
        order = np.lexsort((g, df, d))
        d_s, g_s, sz_s = d[order], g[order], sz[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], d_s[1:] != d_s[:-1])))
        rank = np.arange(len(d_s)) - np.repeat(
            starts, np.diff(np.append(starts, len(d_s))))
        plen = sz_s - np.ceil(threshold * sz_s).astype(np.int64) + 1
        keep = rank < plen
        df_arr = group.column("df").to_numpy(
            zero_copy_only=False)[order]
        return pa.table({
            "gram": pa.array(g_s[keep], pa.int64()),
            "doc_id": pa.array(d_s[keep], pa.int64()),
            "set_size": pa.array(sz_s[keep], pa.int64()),
            "df": pa.array(df_arr[keep], pa.int64())})

    prefix_rows = (with_df.map_batches(tag_doc, batch_format="pyarrow")
                   .groupby("__dpart")
                   .map_groups(cut_prefix, batch_format="pyarrow"))

    # -- regime guard: candidate upper bound from the carried df
    # (each prefix row can pair with at most df-1 docs; /2 for
    # double counting).  Zero shuffle: one pass of per-block sums
    # over the materialized narrow rows (materialized only when the
    # guard is on, so it also feeds stage 4 without recompute).
    if max_candidate_pairs is not None and fallback != "none":
        prefix_rows = prefix_rows.materialize()
        def bound_partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"b": pa.array([0], pa.int64())})
            df_np = t.column("df").to_numpy(zero_copy_only=False)
            return pa.table({"b": pa.array(
                [int((df_np - 1).sum())], pa.int64())})

        bound = (prefix_rows.map_batches(
            bound_partial, batch_format="pyarrow").sum("b") or 0) // 2
        if bound > max_candidate_pairs:
            msg = (
                f"prefix_jaccard_pairs: candidate upper bound "
                f"{bound:,} exceeds max_candidate_pairs="
                f"{max_candidate_pairs:,} — the corpus has no df "
                "tail, so the prefix filter cannot prune and the "
                "exact join degenerates toward O(n^2) candidates")
            if fallback == "error":
                raise RuntimeError(msg)
            if fallback == "minhash":
                import logging
                logging.getLogger(__name__).warning(
                    "%s; routing to minhash_lsh_dedup (exact-verified "
                    "pairs, probabilistic recall < 1)", msg)
                return minhash_lsh_dedup(
                    docs_ds, threshold=threshold, shingle_k=shingle_k,
                    text_col=text_col,
                    num_partitions=min(num_partitions, 8))
            import warnings
            warnings.warn(msg, RuntimeWarning, stacklevel=2)

    prefix_rows = prefix_rows.map_batches(
        lambda t: t.drop_columns(["df"]), batch_format="pyarrow")

    # -- stage 4: candidates from prefix co-occurrence (exact by
    # lemma), with PPJoin's LENGTH filter vetting each candidate
    # in-task: J >= t forces min(|A|,|B|) >= t * max(|A|,|B|), so
    # size-mismatched pairs never shuffle (pure pruning — exact).
    def _len_ok(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
        lo = np.minimum(sa, sb).astype(np.float64)
        hi = np.maximum(sa, sb).astype(np.float64)
        return lo >= threshold * hi

    candidates = pair_counts(
        salted_bucket_pairs(prefix_rows, "gram", "doc_id",
                            max_bucket=None,
                            num_partitions=num_partitions,
                            payload_col="set_size",
                            pair_filter=_len_ok)
    ).map_batches(lambda t: t.select(["id_a", "id_b"]),
                  batch_format="pyarrow").materialize()
    if candidates.count() == 0:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64())}))

    cand_tbl = pa.concat_tables(
        [t for t in ray.get(candidates.to_arrow_refs()) if t.num_rows])
    # Rebuild the candidate set as clean block(s): the map_groups
    # output carries schemaless 0-row blocks the hash join rejects
    # (same workaround as minhash_lsh_dedup's candidate path).
    candidates = ray.data.from_arrow(cand_tbl)
    ca = cand_tbl.column("id_a").to_numpy(zero_copy_only=False)
    cb = cand_tbl.column("id_b").to_numpy(zero_copy_only=False)
    ids_ref = ray.put(np.unique(np.concatenate([ca, cb])))

    # -- stage 5 verify: ship each candidate doc's GRAM ARRAY (not its
    # text) through two hash joins against the candidate pairs, then
    # count the exact intersection per pair with per-batch memoized
    # sets — work is O(candidates x set size), independent of how hot
    # any gram is (re-bucketing full gram rows would be O(bucket^2)
    # per hot gram even after a membership filter).
    def gram_lists(t: pa.Table, id_name: str, col: str) -> pa.Table:
        ids = ray.get(ids_ref)
        mask = np.isin(t.column("doc_id").to_numpy(zero_copy_only=False),
                       ids)
        t = t.filter(pa.array(mask))
        texts = t.column(text_col).to_pylist()
        h, di, _sz = shingle_hash_rows(texts, shingle_k)
        # h/di arrive sorted by doc index; slice each doc's hash run
        # into its blob (int64 bytes, not a list column: Acero joins
        # reject list non-key fields)
        seg_starts = np.flatnonzero(np.concatenate(
            ([True], di[1:] != di[:-1]))) if len(di) else np.empty(
                0, np.int64)
        seg_ends = np.append(seg_starts[1:], len(di)) \
            if len(seg_starts) else seg_starts
        blob_by_doc = {int(di[s]): h[s:e].tobytes()
                       for s, e in zip(seg_starts, seg_ends)}
        out_blobs = [blob_by_doc.get(i, b"") for i in range(len(texts))]
        return pa.table({id_name: t.column("doc_id"),
                         col: pa.array(out_blobs, pa.binary())})

    # Join parallelism is deliberately small: each Ray hash join
    # reserves an aggregator-actor pool per partition, and two chained
    # joins at the salting partition count would starve the cluster's
    # CPUs (observed as a deadlock at num_partitions=64 on 16 cpus).
    join_parts = 8
    docs_narrow = docs_ds.select_columns(["doc_id", text_col])
    side_a = docs_narrow.map_batches(
        lambda t: gram_lists(t, "id_a", "__ga"),
        batch_format="pyarrow").materialize()
    side_b = docs_narrow.map_batches(
        lambda t: gram_lists(t, "id_b", "__gb"),
        batch_format="pyarrow")
    from torray.ops.join import safe_join

    joined = safe_join(candidates, side_a, "inner",
                       join_parts, on=("id_a",))
    joined = safe_join(joined, side_b, "inner",
                       join_parts, on=("id_b",))

    def verify(batch: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        ida = batch.column("id_a").to_pylist()
        idb = batch.column("id_b").to_pylist()
        ga = batch.column("__ga").to_pylist()
        gb = batch.column("__gb").to_pylist()
        memo: dict[int, frozenset] = {}
        for i, g in zip(ida + idb, ga + gb):
            if i not in memo:
                memo[i] = frozenset(np.frombuffer(g, np.uint64))
        keep = []
        for a, b in zip(ida, idb):
            sa, sb = memo[a], memo[b]
            inter = len(sa & sb)
            keep.append(inter / (len(sa) + len(sb) - inter) >= threshold)
        return batch.filter(pa.array(keep)).select(["id_a", "id_b"])

    return joined.map_batches(verify, batch_format="pyarrow")


def shared_passage_pairs(docs_ds, *, n: int = 20, min_shared: int = 1,
                         sample_mod: int = 1, max_bucket: int = 256,
                         text_col: str = "text",
                         num_partitions: int = 8):
    """Document pairs sharing at least ``min_shared`` exact word
    ``n``-gram passages -> ``(id_a, id_b, n_shared)``.

    The exact-substring complement to whole-document minhash (the
    motivation of Lee et al. 2022, "Deduplicating Training Data...",
    public recipe at n-gram granularity): two documents that are
    globally dissimilar but embed the same boilerplate paragraph are
    invisible to document-level similarity yet caught here, because
    detection is per PASSAGE, not per document.

    Scale shape: each document emits its DISTINCT n-gram hashes once
    (vectorized rolling hash — :func:`torray.ops.decontam.ngram_hashes`);
    the one shuffle carries narrow ``(gram, doc_id)`` int64 rows,
    O(tokens) worst case, reducible by ``sample_mod`` (keep only grams
    with ``hash %% sample_mod == 0`` — winnowing-style deterministic
    fingerprint sampling; a shared passage of w words still collides
    with probability ~1-(1-1/mod)^(w-n+1)).  Per-gram buckets are
    bounded by :func:`bounded_pair_positions` exactly like the LSH
    family, so a corpus-wide boilerplate passage cannot flood the pair
    stream; the final pair dedup/count is a second narrow groupby.
    """
    from torray.ops.decontam import ngram_hashes

    def explode(batch: pa.Table) -> pa.Table:
        gram_out, id_out = [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column(text_col).to_pylist()):
            g = np.unique(ngram_hashes(t or "", n))
            if sample_mod > 1 and g.size:
                g = g[g % np.uint64(sample_mod) == 0]
            if g.size:
                gram_out.append(g.view(np.int64))
                id_out.append(np.full(g.size, did, np.int64))
        if not gram_out:
            return pa.table({"gram": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table({
            "gram": pa.array(np.concatenate(gram_out), pa.int64()),
            "doc_id": pa.array(np.concatenate(id_out), pa.int64())})

    # One bucket per distinct gram — cardinality ~ token count, the
    # worst case for per-bucket Python calls; the salted run-scan
    # (salted_bucket_pairs) is what makes this op viable at scale.
    pairs = salted_bucket_pairs(
        docs_ds.select_columns(["doc_id", text_col])
        .map_batches(explode, batch_format="pyarrow"),
        "gram", "doc_id", max_bucket=max_bucket)
    counted = pair_counts(pairs, num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        if min_shared > 1:
            t = t.filter(pa.compute.greater_equal(
                t.column("n_shared"), min_shared))
        return t.select(["id_a", "id_b", "n_shared"])

    return counted.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Edit-distance <= 1 similarity join (SymSpell deletion neighborhood)
# ---------------------------------------------------------------------------

_ED_B = np.uint64(1099511628211)  # FNV prime; odd -> invertible mod 2^64
_ED_BINV = np.uint64(pow(1099511628211, -1, 1 << 64))


def _string_buffers(col):
    """(lengths, starts, data) numpy views of an Arrow string/binary
    array — zero-copy except the null fixup (nulls read as empty)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (pa.types.is_binary(col.type)
            or pa.types.is_large_binary(col.type)):
        col = col.cast(pa.string())
    col = col.cast(pa.large_binary())
    n = len(col)
    buffers = col.buffers()
    offsets = np.frombuffer(buffers[1], np.int64, count=n + 1,
                            offset=col.offset * 8)
    data = (np.frombuffer(buffers[2], np.uint8)
            if buffers[2] is not None else np.empty(0, np.uint8))
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    if col.null_count:
        null = col.is_null().to_numpy(zero_copy_only=False)
        lengths = np.where(null, 0, lengths)
    return lengths, offsets[:-1].astype(np.int64), data


def deletion_neighborhood_keys(col, *, max_len: int = 256):
    """uint64 bucket keys of the SymSpell distance-1 deletion
    neighborhood of every string in an Arrow array: the string's own
    polynomial hash plus the hash of each single-character deletion —
    ``L+1`` keys per string of length L, all computed VECTORIZED from
    two cumulative passes (no per-string Python, no variant strings
    ever materialized).

    Two strings within edit distance 1 always share >= 1 key (equal;
    deletion: the shorter IS a variant of the longer; substitution:
    deleting the differing position of each yields the same string).
    Hash equality is 64-bit-polynomial equality, so collisions can
    only ADD candidates — every pair is exact-verified downstream.

    Math: with base B (odd, so B^-1 exists mod 2^64) and per-string
    byte prefix sums ``T(i) = sum_{q<i} c_q * B^-q``, the standard
    polynomial hash of the string minus position i is
    ``B^(L-2) * T(i) + B^(L-1) * (T(L) - T(i+1))`` — independent of i
    in the first factor, so every deletion key costs O(1) after ONE
    cumsum over the batch's bytes.  Returns ``(keys, key_row)`` where
    ``key_row[k]`` is the source row index of ``keys[k]``."""
    lengths, starts, data = _string_buffers(col)
    n = len(lengths)
    if n == 0:
        e = np.empty(0, np.uint64)
        return e, np.empty(0, np.int64)
    maxlen = int(lengths.max()) if n else 0
    if maxlen > max_len:
        raise ValueError(
            f"edit-distance keys are for SHORT strings (titles, names,"
            f" queries): got length {maxlen} > max_len={max_len}")
    total = int(lengths.sum())
    with np.errstate(over="ignore"):
        powb = np.multiply.accumulate(
            np.concatenate(([np.uint64(1)],
                            np.full(max(maxlen, 1), _ED_B, np.uint64))))
        powbinv = np.multiply.accumulate(
            np.concatenate(([np.uint64(1)],
                            np.full(max(maxlen, 1), _ED_BINV,
                                    np.uint64))))
        # pow_sh[j] = B^(j-1): exponent -1 appears for L == 1 (the
        # deletion variant is the empty string; its key folds to 0)
        pow_sh = np.concatenate(([_ED_BINV], powb[:-1]))

        row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        flat_start = np.concatenate(
            ([0], np.cumsum(lengths))).astype(np.int64)
        local = np.arange(total, dtype=np.int64) - flat_start[row_of]
        c = data[starts[row_of] + local].astype(np.uint64)
        w = c * powbinv[local]
        cw = np.concatenate(([np.uint64(0)], np.cumsum(w)))
        tall = cw[flat_start[1:]] - cw[flat_start[:-1]]

        self_keys = np.where(
            lengths > 0, powb[np.maximum(lengths - 1, 0)] * tall,
            np.uint64(0))
        lr = lengths[row_of]
        tpre = cw[flat_start[row_of] + local] - cw[flat_start[row_of]]
        tpre1 = (cw[flat_start[row_of] + local + 1]
                 - cw[flat_start[row_of]])
        del_keys = (pow_sh[lr - 1] * tpre
                    + powb[lr - 1] * (tall[row_of] - tpre1))
    keys = np.concatenate([self_keys, del_keys])
    key_row = np.concatenate([np.arange(n, dtype=np.int64), row_of])
    return _mix64(keys), key_row


def _pad_matrices(col, width: int):
    """(forward, reversed) int16 char matrices of an Arrow string
    array, padded with 256 (never equal to a real byte), plus
    lengths — the substrate of the vectorized distance-1 check."""
    lengths, starts, data = _string_buffers(col)
    n = len(lengths)
    mat = np.full((n, max(width, 1)), 256, np.int16)
    rmat = np.full((n, max(width, 1)), 256, np.int16)
    total = int(lengths.sum())
    if total:
        row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        flat_start = np.concatenate(([0], np.cumsum(lengths)))
        local = np.arange(total, dtype=np.int64) - flat_start[row_of]
        byte = data[starts[row_of] + local]
        mat[row_of, local] = byte
        rmat[row_of, lengths[row_of] - 1 - local] = byte
    return mat, rmat, lengths


def edit_distance_le1(col_a, col_b) -> np.ndarray:
    """Vectorized exact pairwise edit distance capped at 1 for two
    equal-length Arrow string arrays: int8 per pair — 0 (equal),
    1 (distance exactly 1), -1 (distance > 1).  No DP table: distance
    <= 1 is decidable from common-prefix + common-suffix lengths
    (one mismatch scan on the forward matrices, one on the reversed),
    all rows simultaneously."""
    la_tmp, _, _ = _string_buffers(col_a)
    lb_tmp, _, _ = _string_buffers(col_b)
    width = int(max(la_tmp.max(initial=0), lb_tmp.max(initial=0), 1))
    ma, ra, la = _pad_matrices(col_a, width)
    mb, rb, lb = _pad_matrices(col_b, width)
    m = ma != mb
    any_m = m.any(axis=1)
    p = np.where(any_m, m.argmax(axis=1), width)
    mr = ra != rb
    any_r = mr.any(axis=1)
    s = np.where(any_r, mr.argmax(axis=1), width)
    minl = np.minimum(la, lb)
    p = np.minimum(p, minl)
    s = np.minimum(s, minl)
    diff = np.abs(la - lb)
    eq = (diff == 0) & ~any_m
    one = ((diff == 0) & any_m & (p + s >= la - 1)) | \
          ((diff == 1) & (p + s >= minl))
    return np.where(eq, 0, np.where(one, 1, -1)).astype(np.int8)


def edit_distance_pairs(ds, *, id_col: str, text_col: str,
                        max_len: int = 256, num_partitions: int = 64,
                        max_bucket: int | None = None):
    """EXACT edit-distance <= 1 string-similarity SELF-JOIN:
    ``(id_a < id_b, dist)`` for every pair of rows whose ``text_col``
    values are equal (dist 0) or one edit apart (dist 1) — typo/
    near-miss clustering of titles, product names, queries, hostnames.

    Scale shape (the SymSpell split of the O(n^2) join):

    1. :func:`deletion_neighborhood_keys` per batch — ``L+1`` int64
       keys per string, fully vectorized; TEXT NEVER ENTERS THE KEY
       SHUFFLE, only (key, id) int64 rows.
    2. :func:`salted_bucket_pairs` emits candidate pairs per key
       bucket (run-scan, no Python call per bucket);
       :func:`pair_counts` collapses the ~L duplicate sightings of
       each true pair to one row.
    3. Verify joins fetch ONLY candidate texts (broadcast-id
       prefilter, the :func:`minhash_lsh_dedup` pattern) and
       :func:`edit_distance_le1` rejects hash-collision noise with an
       exact vectorized check — no DP, one mismatch scan forward +
       one reversed.

    Exactness contract: ``max_bucket=None`` (default) emits ALL
    bucket pairs — a clique of k identical strings costs O(k^2) pairs,
    inherent to the exact answer (run :func:`exact_dedup` first on
    dirty corpora, or pass ``max_bucket`` to cap with the documented
    recall trade-off).  Strings longer than ``max_len`` raise: the
    deletion neighborhood is a short-string design (reference point:
    SymSpell; Norvig's spelling-corrector neighborhood)."""
    import ray as _ray
    import ray.data

    # Dataset.join spawns one aggregator actor per partition; more
    # partitions than cluster CPUs wedges the pool (observed on a
    # 4-CPU test cluster) — cap like ops.join.skew_join does.
    cluster_cpus = int(_ray.cluster_resources().get("CPU", 0)
                       or num_partitions)
    join_partitions = max(2, min(num_partitions, cluster_cpus))

    narrow = ds.select_columns([id_col, text_col])

    def emit_keys(t: pa.Table) -> pa.Table:
        keys, key_row = deletion_neighborhood_keys(
            t.column(text_col), max_len=max_len)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "del_key": pa.array(keys.view(np.int64), pa.int64()),
            id_col: pa.array(ids[key_row], pa.int64()),
        })

    candidates = pair_counts(
        salted_bucket_pairs(
            narrow.map_batches(emit_keys, batch_format="pyarrow"),
            "del_key", id_col, max_bucket=max_bucket,
            num_partitions=num_partitions),
        num_partitions=num_partitions,
    ).map_batches(lambda t: t.select(["id_a", "id_b"]),
                  batch_format="pyarrow").materialize()

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})
    n_cand = candidates.count()
    if n_cand == 0:
        return ray.data.from_arrow(empty)

    verify_ds = narrow
    if n_cand <= _PREFILTER_MAX_PAIRS:
        cand_tbl = pa.concat_tables(
            [t for t in _ray.get(candidates.to_arrow_refs())
             if t.num_rows])
        candidates = ray.data.from_arrow(cand_tbl)
        cand_ids = np.unique(np.concatenate([
            cand_tbl.column("id_a").to_numpy(zero_copy_only=False),
            cand_tbl.column("id_b").to_numpy(zero_copy_only=False)]))
        ids_ref = _ray.put(cand_ids)

        def prefilter(t: pa.Table) -> pa.Table:
            mask = np.isin(
                t.column(id_col).to_numpy(zero_copy_only=False),
                _ray.get(ids_ref))
            return t.filter(pa.array(mask))

        verify_ds = verify_ds.map_batches(
            prefilter, batch_format="pyarrow").materialize()
    else:
        candidates = candidates.repartition(
            num_partitions).materialize()

    def side(id_name: str, text_name: str):
        return verify_ds.map_batches(
            lambda t, i=id_name, x=text_name: pa.table(
                {i: t.column(id_col), x: t.column(text_col)}),
            batch_format="pyarrow")

    from torray.ops.join import safe_join

    joined = safe_join(candidates, side("id_a", "__text_a"), "inner",
                       join_partitions, on=("id_a",))
    joined = safe_join(joined, side("id_b", "__text_b"), "inner",
                       join_partitions, on=("id_b",))

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        d = edit_distance_le1(batch.column("__text_a"),
                              batch.column("__text_b"))
        keep = d >= 0
        return pa.table({
            "id_a": batch.column("id_a").filter(pa.array(keep)),
            "id_b": batch.column("id_b").filter(pa.array(keep)),
            "dist": pa.array(d[keep].astype(np.int64), pa.int64()),
        })

    return joined.map_batches(verify, batch_format="pyarrow")


def mirror_hosts(ds, *, host_col: str = "host", text_col: str = "text",
                 min_shared: int = 1, max_bucket: int | None = None,
                 num_partitions: int = 64):
    """Mirror-site / shared-boilerplate detection: for every pair of
    HOSTS the EXACT count of identical page texts they share, plus
    each host's distinct-page count and the page-set Jaccard —
    ``(host_a, host_b, n_shared, n_a, n_b, jaccard)`` with
    ``host_a < host_b`` (string order) and ``n_shared >=
    min_shared``.  The webtext twin of ``ops.text.vocab_overlap``
    (same machinery, page-text granularity): mirrors, CDN clones and
    template farms surface as high-Jaccard host pairs — prune them
    BEFORE document-level dedup pays for their pages.

    Scale shape: each block emits DISTINCT (text-hash, host-id) int64
    rows once (text never shuffles; host ids are
    :func:`fnv1a64_strings` of the host, the name map rides as a
    small distinct (gid, host) dataset — no driver fold over hosts);
    :func:`salted_bucket_pairs` buckets by content hash with
    cross-block id-dedup so a page shared by g hosts emits C(g, 2)
    pairs exactly once each (``max_bucket`` optionally caps
    ubiquitous-boilerplate buckets — capping trades exactness for a
    bound, default exact); :func:`pair_counts` folds to per-pair
    totals; sizes come from ``exact_distinct_by`` over the same rows.
    A second independent content hash vets every candidate pair, so
    a 64-bit bucket collision can only drop a pair, never invent one.
    """
    import ray
    import ray.data

    from torray.ops.join import safe_join
    from torray.ops.sketch import exact_distinct_by

    empty = pa.table({
        "host_a": pa.array([], pa.string()),
        "host_b": pa.array([], pa.string()),
        "n_shared": pa.array([], pa.int64()),
        "n_a": pa.array([], pa.int64()),
        "n_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64())})

    def explode(t: pa.Table) -> pa.Table:
        out_empty = pa.table({"h1": pa.array([], pa.int64()),
                              "h2": pa.array([], pa.int64()),
                              "gid": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return out_empty
        keep = pc.and_(pc.is_valid(t.column(host_col)),
                       pc.is_valid(t.column(text_col)))
        t = t.filter(keep)
        if t.num_rows == 0:
            return out_empty
        texts = t.column(text_col)
        h1 = fnv1a64_strings(texts)
        # Independent second hash: PREFIX the sentinel.  A suffix
        # would be ineffective — fnv1a64 is a streaming hash and the
        # _mix64 finalizer is bijective, so two texts with equal h1
        # share the FNV state at end-of-text and any common suffix
        # keeps them colliding.  A differing *prefix* diverges the
        # state from byte 0 (and changes the md5 input entirely on
        # the long-text path), making h1/h2 genuinely independent.
        h2 = fnv1a64_strings(pc.binary_join_element_wise(
            pa.scalar("\x01"), texts.cast(pa.string()), ""))
        gid = fnv1a64_strings(t.column(host_col))
        tbl = pa.table({
            "h1": pa.array(h1.view(np.int64), pa.int64()),
            "h2": pa.array(h2.view(np.int64), pa.int64()),
            "gid": pa.array(gid.view(np.int64), pa.int64())})
        return tbl.group_by(["h1", "h2", "gid"]).aggregate([])

    rows = (ds.select_columns([host_col, text_col])
            .map_batches(explode, batch_format="pyarrow")
            .materialize())
    if rows.count() == 0:
        return ray.data.from_arrow(empty)

    def name_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"gid": pa.array([], pa.int64()),
                             "host": pa.array([], pa.string())})
        gid = fnv1a64_strings(t.column(host_col))
        tbl = pa.table({"gid": pa.array(gid.view(np.int64), pa.int64()),
                        "host": t.column(host_col).cast(pa.string())})
        return tbl.group_by(["gid", "host"]).aggregate([])

    names = (ds.select_columns([host_col])
             .map_batches(name_rows, batch_format="pyarrow")
             .groupby(["gid", "host"]).count()
             .map_batches(lambda t: t.select(["gid", "host"]),
                          batch_format="pyarrow"))
    sizes = exact_distinct_by(rows, "gid", "h1",
                              num_partitions=num_partitions)
    info = safe_join(names, sizes, "inner", 4, on=("gid",))

    pairs = salted_bucket_pairs(
        rows, "h1", "gid", max_bucket=max_bucket,
        num_partitions=num_partitions, payload_col="h2",
        pair_filter=lambda a, b: a == b)
    counts = pair_counts(pairs, num_partitions=num_partitions)
    if min_shared > 1:
        counts = counts.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t.column("n_shared"), min_shared)),
            batch_format="pyarrow")
    # no surviving pair -> typed empty (a zero-block pipeline tail
    # loses its schema; callers and the driver compare need columns)
    counts = counts.materialize()
    if counts.count() == 0:
        return ray.data.from_arrow(empty)

    j = safe_join(counts, info, "inner", 4,
                  on=("id_a",), right_on=("gid",))
    j = j.map_batches(
        lambda t: pa.table({
            "id_b": t.column("id_b"), "n_shared": t.column("n_shared"),
            "ha": t.column("host"), "na": t.column("n_distinct")}),
        batch_format="pyarrow")
    j = safe_join(j, info, "inner", 4, on=("id_b",), right_on=("gid",))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        ha = t.column("ha").cast(pa.string())
        hb = t.column("host").cast(pa.string())
        na = t.column("na").cast(pa.int64())
        nb = t.column("n_distinct").cast(pa.int64())
        sh = t.column("n_shared").cast(pa.int64())
        swap = pc.greater(ha, hb)
        host_a = pc.if_else(swap, hb, ha)
        host_b = pc.if_else(swap, ha, hb)
        n_a = pc.if_else(swap, nb, na)
        n_b = pc.if_else(swap, na, nb)
        shn = sh.to_numpy(zero_copy_only=False).astype(np.float64)
        un = (n_a.to_numpy(zero_copy_only=False)
              + n_b.to_numpy(zero_copy_only=False)
              - sh.to_numpy(zero_copy_only=False)).astype(np.float64)
        return pa.table({"host_a": host_a, "host_b": host_b,
                         "n_shared": sh, "n_a": n_a, "n_b": n_b,
                         "jaccard": pa.array(shn / un, pa.float64())})

    return j.map_batches(finish, batch_format="pyarrow")
