"""Similarity search over an embedding column (``embeddings`` table:
``vec_id:int64, embedding:list<float>, label:int32``).

- ``knn_bruteforce``: exact top-k cosine.  The query matrix is
  broadcast ONCE via ``ray.put`` (every task reads the same object-
  store copy — never re-shipped per batch); each batch computes a
  vectorized partial top-k (numpy matmul), and the tiny per-batch
  top-k tables are merged at the end (k × num_queries rows — driver-
  safe at any corpus size).
- ``lsh_knn``: the scale path — random-hyperplane LSH (Charikar '02)
  buckets the corpus once; queries probe only their bucket (plus
  optional multiprobe neighbors).  Recall < 1, cost ~ corpus/2^bits.
- ``embedding_cosine_dedup``: near-dup pairs above a cosine threshold,
  blocked all-pairs against a broadcast normalized matrix (exact;
  the LSH bucketing bounds the candidate set at scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["knn_bruteforce", "lsh_knn", "embedding_cosine_dedup"]


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def knn_bruteforce(emb_ds, query_vecs: np.ndarray, k: int = 10,
                   vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k for each query row.

    Returns a Dataset of (query_idx, vec_id, score) — k rows per query,
    ordered by (score desc, vec_id) with deterministic tie-breaks.
    """
    import ray

    queries = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(queries)  # broadcast once

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        mat = _batch_matrix(batch, vec_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if mat.size == 0:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        sims = _normalize(mat) @ q.T  # (n, num_q)
        out_q, out_id, out_s = [], [], []
        kk = min(k, sims.shape[0])
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            # top-k by (score desc, vec_id asc) — deterministic ties.
            idx = np.lexsort((ids, -col))[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table({"query_idx": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partials = emb_ds.select_columns([id_col, vec_col]).map_batches(
        partial_topk, batch_format="pyarrow")

    # Merge: partials hold <= k rows per (batch, query); global top-k per
    # query is a tiny sort — safe to finish on the driver.
    merged = partials.to_arrow_refs()
    tables = [t for t in ray.get(merged) if t.num_rows]
    if not tables:
        empty = pa.table({"query_idx": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        return ray.data.from_arrow(empty)
    allp = pa.concat_tables(tables)
    qi = allp.column("query_idx").to_numpy(zero_copy_only=False)
    ids = allp.column("vec_id").to_numpy(zero_copy_only=False)
    scores = allp.column("score").to_numpy(zero_copy_only=False)
    keep_q, keep_id, keep_s = [], [], []
    for q in np.unique(qi):
        mask = qi == q
        order = np.lexsort((ids[mask], -scores[mask]))[:k]
        keep_q.extend([int(q)] * len(order))
        keep_id.extend(ids[mask][order].tolist())
        keep_s.extend(scores[mask][order].tolist())
    result = pa.table({"query_idx": pa.array(keep_q, pa.int64()),
                       "vec_id": pa.array(keep_id, pa.int64()),
                       "score": pa.array(keep_s, pa.float64())})
    return ray.data.from_arrow(result)


def _hyperplanes(dim: int, bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim))


def lsh_knn(emb_ds, query_vecs: np.ndarray, k: int = 10, bits: int = 8,
            vec_col: str = "embedding", id_col: str = "vec_id",
            seed: int = 11):
    """Approximate top-k: random-hyperplane signatures bucket the corpus
    (one narrow groupby); each query searches only its own bucket.

    Returns (query_idx, vec_id, score) with <= k rows per query;
    queries whose bucket is empty return no rows (multiprobe left as a
    documented extension)."""
    import ray

    queries = _normalize(np.asarray(query_vecs, dtype=np.float64))
    planes = _hyperplanes(queries.shape[1], bits, seed)
    q_sigs = (queries @ planes.T > 0).astype(np.uint8)
    q_keys = np.packbits(q_sigs, axis=1, bitorder="little")[:, 0].astype(int) \
        if bits <= 8 else None
    if q_keys is None:
        raise ValueError("bits > 8 not supported by this packing")
    q_ref = ray.put(queries)
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        mat = _batch_matrix(batch, vec_col)
        if mat.size == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             vec_col: batch.column(vec_col)})
        sigs = (_normalize(mat) @ pl.T > 0).astype(np.uint8)
        keys = np.packbits(sigs, axis=1, bitorder="little")[:, 0].astype(np.int64)
        return pa.table({"bucket": pa.array(keys, pa.int64()),
                         id_col: batch.column(id_col),
                         vec_col: batch.column(vec_col)})

    by_query_bucket: dict[int, list[int]] = {}
    for qi, key in enumerate(q_keys):
        by_query_bucket.setdefault(int(key), []).append(qi)

    def search_bucket(group: pa.Table) -> pa.Table:
        bucket = group.column("bucket")[0].as_py()
        q_idxs = by_query_bucket.get(bucket, [])
        if not q_idxs:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        q = ray.get(q_ref)[q_idxs]
        mat = _normalize(_batch_matrix(group, vec_col))
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        sims = mat @ q.T
        out_q, out_id, out_s = [], [], []
        kk = min(k, sims.shape[0])
        for col_i, qi in enumerate(q_idxs):
            col = sims[:, col_i]
            idx = np.lexsort((ids, -col))[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table({"query_idx": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    return (
        emb_ds.select_columns([id_col, vec_col])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(search_bucket, batch_format="pyarrow")
    )


def embedding_cosine_dedup(emb_ds, threshold: float = 0.98,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id"):
    """Near-duplicate pairs (id_a < id_b) with cosine >= threshold.

    Exact blocked all-pairs: the full normalized matrix is broadcast
    once (ray.put); each batch computes its block-vs-all slab.  At
    10^9+ vectors, replace the broadcast with LSH bucketing (see
    lsh_knn) — the per-batch kernel is identical."""
    import ray

    full = pa.concat_tables(
        [t for t in ray.get(emb_ds.select_columns([id_col, vec_col])
                            .to_arrow_refs()) if t.num_rows])
    all_ids = full.column(id_col).to_numpy(zero_copy_only=False)
    all_mat = _normalize(_batch_matrix(full, vec_col))
    mat_ref = ray.put(all_mat)
    ids_ref = ray.put(all_ids)

    def block_pairs(batch: pa.Table) -> pa.Table:
        mat_all = ray.get(mat_ref)
        ids_all = ray.get(ids_ref)
        block = _normalize(_batch_matrix(batch, vec_col))
        block_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if block.size == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        sims = block @ mat_all.T
        bi, aj = np.nonzero(sims >= threshold)
        out = set()
        for i, j in zip(bi, aj):
            a, b = int(block_ids[i]), int(ids_all[j])
            if a < b:
                out.add((a, b))
        out = sorted(out)
        return pa.table({"id_a": pa.array([p[0] for p in out], pa.int64()),
                         "id_b": pa.array([p[1] for p in out], pa.int64())})

    return emb_ds.select_columns([id_col, vec_col]).map_batches(
        block_pairs, batch_format="pyarrow")
