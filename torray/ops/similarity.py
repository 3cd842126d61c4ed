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
- ``ivf_knn``: the other scale path — k-means coarse quantizer (IVF,
  Jégou et al.) trained on a bounded sample; queries probe their
  ``nprobe`` nearest cells.
- ``embedding_cosine_dedup``: near-dup pairs above a cosine threshold —
  exact distributed block-nested-loop (one task per block pair, blocks
  read from the object store; the driver only ever holds refs).
- ``embedding_cosine_dedup_lsh``: the approximate scale path — LSH
  bucket blocking (OR-amplified hash tables) with an exact cosine
  verify on the candidates; shuffles only (bucket_key, vec_id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["knn_bruteforce", "lsh_knn", "ivf_knn", "kmeans_cluster",
           "embedding_cosine_dedup", "embedding_cosine_dedup_lsh",
           "semantic_dedup", "group_centroids", "hard_negatives",
           "pq_train", "pq_encode", "pq_knn", "pq_knn_rerank",
           "HashedNgramEncoder", "encode_documents"]


class HashedNgramEncoder:
    """Actor-pool DOCUMENT ENCODER — the GPU-model-shaped stage
    pattern with a deterministic featurizer standing in for a model
    checkpoint (this container has no torch; swapping ``__init__`` to
    load a real encoder and ``__call__`` to run batched inference is
    the one-for-one substitution).

    Pattern contract (what a real model stage must do on Ray Data):
    - ALL state builds ONCE per actor in ``__init__`` (here: the
      per-dimension sign convention and compiled tokenizer come from
      the seed; for a real model: checkpoint load + device move),
      never per batch;
    - ``__call__`` encodes one Arrow batch fully vectorized and emits
      the vectors COLUMNAR (``list<float32>``, the ``embeddings``
      table schema) so downstream ANN / SemDeDup stages consume them
      zero-copy;
    - batch size is the caller's memory knob (vectors are dim x 4
      bytes a row; payload text never leaves the task).

    Featurization: signed feature hashing (Weinberger et al. '09,
    public recipe) over the DISTINCT word ``n``-gram hashes of
    :func:`torray.ops.dedup.shingle_hash_rows` — slot ``h % dim``,
    sign from bit 63 of ``h ^ seed_mix``, then L2 normalization.
    Deterministic: a pure function of (text, dim, n, seed) —
    identical across reruns, batch splits and cluster shapes."""

    def __init__(self, dim: int = 64, n: int = 3, seed: int = 5,
                 text_col: str = "text", id_col: str = "doc_id",
                 out_col: str = "embedding"):
        from torray.ops.dedup import _mix64

        self.dim = int(dim)
        self.n = int(n)
        self.text_col = text_col
        self.id_col = id_col
        self.out_col = out_col
        # seed folded once here, not per batch
        self.seed_mix = _mix64(np.uint64(
            (seed * 0x9E3779B97F4A7C15) % (1 << 64)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from torray.ops.dedup import shingle_hash_rows

        ids = batch.column(self.id_col).combine_chunks().cast(pa.int64())
        texts = batch.column(self.text_col).to_pylist()
        rows = len(texts)
        mat = np.zeros((rows, self.dim), np.float32)
        if rows:
            h, di, _sz = shingle_hash_rows(texts, self.n)
            if h.size:
                hx = h ^ self.seed_mix
                slot = (hx % np.uint64(self.dim)).astype(np.int64)
                sign = np.where((hx >> np.uint64(63)).astype(bool),
                                np.float32(-1.0), np.float32(1.0))
                np.add.at(mat, (di, slot), sign)
            mat = _normalize(mat.astype(np.float64)).astype(np.float32)
        vecs = pa.ListArray.from_arrays(
            pa.array(np.arange(rows + 1, dtype=np.int32) * self.dim,
                     pa.int32()),
            pa.array(mat.ravel(), pa.float32()))
        return pa.table({"vec_id": ids, self.out_col: vecs})


def encode_documents(docs_ds, *, dim: int = 64, n: int = 3,
                     seed: int = 5, text_col: str = "text",
                     id_col: str = "doc_id", concurrency: int = 4,
                     batch_size: int = 256):
    """Documents -> ``(vec_id, embedding)`` via a
    :class:`HashedNgramEncoder` ACTOR POOL (``concurrency`` actors,
    state built once each; ``batch_size`` bounds per-actor working
    set).  Output matches the ``embeddings`` table schema, so every
    ANN / dedup / clustering op in this module runs on it directly —
    the full text->vector->SemDeDup chain with no driver hop."""
    return docs_ds.select_columns([id_col, text_col]).map_batches(
        HashedNgramEncoder,
        fn_constructor_kwargs={"dim": dim, "n": n, "seed": seed,
                               "text_col": text_col, "id_col": id_col},
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow")


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    if col not in batch.column_names:
        # schemaless zero-row block (Ray emits those for empty
        # upstream partitions): no vectors, not an error
        if batch.num_rows == 0:
            return np.empty((0, 0), np.float64)
        raise KeyError(f"column {col!r} missing from batch "
                       f"({batch.column_names})")
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
            seed: int = 11, multiprobe: int = 0):
    """Approximate top-k: random-hyperplane signatures bucket the corpus
    (one narrow groupby); each query searches its own bucket plus, with
    ``multiprobe`` > 0, every bucket within that Hamming distance of
    its signature (Lv et al. VLDB'07 — recovers recall lost to
    near-boundary hyperplane flips without growing the corpus shuffle).

    Supports up to 62 signature bits (integer bucket key).  Returns
    (query_idx, vec_id, score) with <= k rows per query, globally
    merged across probed buckets; queries all of whose probed buckets
    are empty return no rows."""
    import itertools

    import ray

    if bits > 62:
        raise ValueError("bits > 62 not supported (int64 bucket key)")
    queries = _normalize(np.asarray(query_vecs, dtype=np.float64))
    planes = _hyperplanes(queries.shape[1], bits, seed)
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))
    q_sigs = (queries @ planes.T > 0).astype(np.int64)
    q_keys = q_sigs @ weights
    q_ref = ray.put(queries)
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        mat = _batch_matrix(batch, vec_col)
        if mat.size == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             vec_col: batch.column(vec_col)})
        sigs = (_normalize(mat) @ pl.T > 0).astype(np.int64)
        keys = sigs @ weights
        return pa.table({"bucket": pa.array(keys, pa.int64()),
                         id_col: batch.column(id_col),
                         vec_col: batch.column(vec_col)})

    by_query_bucket: dict[int, list[int]] = {}
    for qi, key in enumerate(q_keys):
        probes = {int(key)}
        for dist in range(1, multiprobe + 1):
            for flip in itertools.combinations(range(bits), dist):
                mask = 0
                for b in flip:
                    mask |= 1 << b
                probes.add(int(key) ^ mask)
        for p in probes:
            by_query_bucket.setdefault(p, []).append(qi)

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

    per_bucket = (
        emb_ds.select_columns([id_col, vec_col])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(search_bucket, batch_format="pyarrow")
    )

    def final_topk(group: pa.Table) -> pa.Table:
        # A query's candidates span several probed buckets: merge to a
        # global top-k (each corpus vector lives in exactly one bucket,
        # so no dedup is needed — just the k-cut).
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        scores = group.column("score").to_numpy(zero_copy_only=False)
        idx = np.lexsort((ids, -scores))[:k]
        take = pa.array(idx, pa.int64())
        return pa.table({
            "query_idx": pc.take(group.column("query_idx"), take),
            "vec_id": pc.take(group.column("vec_id"), take),
            "score": pc.take(group.column("score"), take),
        })

    return per_bucket.groupby("query_idx").map_groups(
        final_topk, batch_format="pyarrow")


def _block_pair_table(ta: pa.Table, tb: pa.Table, diagonal: bool,
                      threshold: float, vec_col: str,
                      id_col: str) -> pa.Table:
    """Exact cosine>=threshold pairs between two blocks (one task of the
    block-pair fan-out).  Runs as a plain Ray task over two object-store
    block refs — zero-copy reads, nothing lands on the driver."""
    a_mat = _normalize(_batch_matrix(ta, vec_col))
    b_mat = _normalize(_batch_matrix(tb, vec_col))
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    if a_mat.size == 0 or b_mat.size == 0:
        return empty
    a_ids = ta.column(id_col).to_numpy(zero_copy_only=False)
    b_ids = tb.column(id_col).to_numpy(zero_copy_only=False)
    sims = a_mat @ b_mat.T
    ai, bj = np.nonzero(sims >= threshold)
    if ai.size == 0:
        return empty
    ida, idb = a_ids[ai], b_ids[bj]
    if diagonal:
        keep = ida < idb
        ida, idb = ida[keep], idb[keep]
    else:
        lo = np.minimum(ida, idb)
        hi = np.maximum(ida, idb)
        keep = lo < hi  # drop (impossible) id self-collisions across blocks
        ida, idb = lo[keep], hi[keep]
    order = np.lexsort((idb, ida))
    return pa.table({"id_a": pa.array(ida[order], pa.int64()),
                     "id_b": pa.array(idb[order], pa.int64())})


def _train_centroids(emb_ds, n_clusters: int, train_sample: int,
                     iters: int, vec_col: str, seed: int) -> np.ndarray:
    """Spherical k-means on a bounded sample (driver-side numpy over
    ``train_sample`` rows only — never the corpus)."""
    import ray

    parts = [t for t in ray.get(
        emb_ds.select_columns([vec_col]).limit(train_sample)
        .to_arrow_refs()) if t.num_rows]
    if not parts:  # empty corpus: no centroids, assignment is a no-op
        return np.empty((0, 0), np.float64)
    sample_tbl = pa.concat_tables(parts)
    sample = _normalize(_batch_matrix(sample_tbl, vec_col))
    # Canonicalize the sample ORDER before seeding: blocks arrive in
    # whatever order the streaming executor finished them, and
    # rng.choice picks by POSITION — without this sort two executions
    # of the same lineage could train different centroids (observed:
    # a SplitBlocks(16) read reordered the sample between passes).
    # Sorting by row bytes makes the centroids a pure function of the
    # sample SET.
    sample = sample[np.lexsort(sample.T[::-1])]
    rng = np.random.RandomState(seed)
    n_clusters = min(n_clusters, len(sample))
    centroids = sample[rng.choice(len(sample), n_clusters, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def kmeans_cluster(emb_ds, n_clusters: int = 16, train_sample: int = 4096,
                   iters: int = 10, vec_col: str = "embedding",
                   id_col: str = "vec_id", seed: int = 17,
                   return_centroids: bool = False):
    """Semantic clustering of an embedding corpus -> (vec_id, cluster,
    sim) — cosine similarity to the assigned centroid included (the
    SemDeDup-style signal: within-cluster near-centroid duplicates).

    Scale shape: the quantizer trains on a bounded sample, centroids
    broadcast once via ``ray.put``, and assignment is one vectorized
    matmul per batch — the corpus streams, nothing shuffles."""
    import ray

    centroids = _train_centroids(emb_ds, n_clusters, train_sample,
                                 iters, vec_col, seed)
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        mat = _batch_matrix(batch, vec_col)
        if mat.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        sims = _normalize(mat) @ cents.T
        best = np.argmax(sims, axis=1)
        return pa.table({
            id_col: batch.column(id_col),
            "cluster": pa.array(best, pa.int64()),
            "sim": pa.array(sims[np.arange(len(best)), best],
                            pa.float64()),
        })

    out = emb_ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow")
    # return_centroids: hand back the trained quantizer alongside the
    # assignment so invariant checks / encode-then-search callers use
    # EXACTLY the centroids this execution assigned against.
    return (out, centroids) if return_centroids else out


def semantic_dedup(emb_ds, *, n_clusters: int = 16,
                   threshold: float = 0.95, train_sample: int = 4096,
                   iters: int = 10, vec_col: str = "embedding",
                   id_col: str = "vec_id", seed: int = 17,
                   pair_chunk: int = 2048):
    """SemDeDup-style near-duplicate pairs (Abbas et al. 2023, public
    recipe): cluster the corpus with a bounded-sample k-means, then
    search for cosine-similar pairs ONLY within each cluster ->
    ``(id_a, id_b, sim)`` with ``id_a < id_b``.

    Scale shape: centroids broadcast once; ONE groupby(cluster)
    shuffle carries (cluster, id, vector-as-binary) rows; each cluster
    group runs a chunked in-task matmul (``pair_chunk`` x ``pair_chunk``
    tiles, so task memory is bounded regardless of cluster width).
    Cross-cluster near-dups are missed by construction — that is the
    approximation; size ``n_clusters ~ corpus/10k`` so groups stay
    task-sized.  The exact twin is
    :func:`embedding_cosine_dedup`; the LSH twin is
    :func:`embedding_cosine_dedup_lsh`."""
    import ray

    centroids = _train_centroids(emb_ds, n_clusters, train_sample,
                                 iters, vec_col, seed)
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        mat = _batch_matrix(batch, vec_col)
        if mat.size == 0:
            return pa.table({
                "cluster": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "__vec": pa.array([], pa.binary())})
        normed = _normalize(mat)
        best = np.argmax(normed @ cents.T, axis=1)
        return pa.table({
            "cluster": pa.array(best, pa.int64()),
            id_col: batch.column(id_col),
            "__vec": pa.array(
                [normed[i].astype(np.float32).tobytes()
                 for i in range(len(best))], pa.binary()),
        })

    def pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        bufs = group.column("__vec").to_pylist()
        m = len(ids)
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if m < 2:
            return empty
        mat = np.frombuffer(b"".join(bufs), np.float32).reshape(
            m, -1).astype(np.float64)
        order = np.argsort(ids, kind="stable")
        ids, mat = ids[order], mat[order]
        out_a, out_b, out_s = [], [], []
        for i0 in range(0, m, pair_chunk):
            a = mat[i0:i0 + pair_chunk]
            for j0 in range(i0, m, pair_chunk):
                sims = a @ mat[j0:j0 + pair_chunk].T
                ii, jj = np.nonzero(sims >= threshold)
                gi, gj = ii + i0, jj + j0
                keep = gi < gj
                out_a.append(ids[gi[keep]])
                out_b.append(ids[gj[keep]])
                out_s.append(sims[ii[keep], jj[keep]])
        if not out_a:
            return empty
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    return (emb_ds.select_columns([id_col, vec_col])
            .map_batches(assign, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(pairs, batch_format="pyarrow"))


def ivf_knn(emb_ds, query_vecs: np.ndarray, k: int = 10,
            n_clusters: int = 16, nprobe: int = 4,
            train_sample: int = 4096, iters: int = 10,
            vec_col: str = "embedding", id_col: str = "vec_id",
            seed: int = 17):
    """IVF (inverted-file) approximate top-k: k-means centroids trained
    on a bounded sample, corpus assigned to its nearest centroid (one
    narrow groupby), each query probed against only its ``nprobe``
    nearest cells — the classic coarse-quantizer ANN layout (Jégou et
    al., TPAMI'11; public algorithm).

    Scale shape: training reads a ``train_sample``-row sample (bounded
    regardless of corpus size), centroids broadcast once via
    ``ray.put``, assignment is a vectorized matmul per batch, and the
    cell search shuffles only (cell, vec_id, vec) rows of probed
    cells.  Recall rises with ``nprobe`` (= 1 - P(true neighbor in an
    unprobed cell))."""
    import ray

    queries = _normalize(np.asarray(query_vecs, dtype=np.float64))
    centroids = _train_centroids(emb_ds, n_clusters, train_sample,
                                 iters, vec_col, seed)
    cent_ref = ray.put(centroids)
    q_ref = ray.put(queries)

    # Each query probes its nprobe nearest cells.
    q_cells = np.argsort(-(queries @ centroids.T), axis=1)[:, :nprobe]
    by_cell: dict[int, list[int]] = {}
    for qi, cells in enumerate(q_cells):
        for c in cells:
            by_cell.setdefault(int(c), []).append(qi)

    def assign_cells(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        mat = _batch_matrix(batch, vec_col)
        if mat.size == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             vec_col: batch.column(vec_col)})
        cells = np.argmax(_normalize(mat) @ cents.T, axis=1)
        keep = np.isin(cells, list(by_cell))  # drop unprobed cells early
        t = batch.append_column("cell", pa.array(cells, pa.int64()))
        return t.filter(pa.array(keep)).select([
            "cell", id_col, vec_col])

    def search_cell(group: pa.Table) -> pa.Table:
        cell = group.column("cell")[0].as_py()
        q_idxs = by_cell.get(cell, [])
        empty = pa.table({"query_idx": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if not q_idxs:
            return empty
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

    per_cell = (
        emb_ds.select_columns([id_col, vec_col])
        .map_batches(assign_cells, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(search_cell, batch_format="pyarrow")
    )

    def final_topk(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        scores = group.column("score").to_numpy(zero_copy_only=False)
        idx = np.lexsort((ids, -scores))[:k]
        take = pa.array(idx, pa.int64())
        return pa.table({
            "query_idx": pc.take(group.column("query_idx"), take),
            "vec_id": pc.take(group.column("vec_id"), take),
            "score": pc.take(group.column("score"), take),
        })

    return per_cell.groupby("query_idx").map_groups(
        final_topk, batch_format="pyarrow")


def embedding_cosine_dedup(emb_ds, threshold: float = 0.98,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           num_blocks: int = 8):
    """Near-duplicate pairs (id_a < id_b) with cosine >= threshold —
    EXACT, with no whole-table materialization anywhere.

    Distributed block-nested-loop: the (id, vec) projection is split
    into ``num_blocks`` object-store blocks; one Ray task per block
    pair (i <= j) computes its slab's matmul and emits only the
    (id_a, id_b) hits.  The driver touches block *refs* and the tiny
    pair tables, never a vector.  Total work is O(n^2/num_blocks^2) per
    task — the unavoidable cost of an exact all-pairs; for approximate
    scale-out see :func:`embedding_cosine_dedup_lsh`."""
    import ray
    import ray.data

    refs = (emb_ds.select_columns([id_col, vec_col])
            .repartition(num_blocks).to_arrow_refs())
    task = ray.remote(num_cpus=1)(_block_pair_table)
    out_refs = [
        task.remote(refs[i], refs[j], i == j, threshold, vec_col, id_col)
        for i in range(len(refs)) for j in range(i, len(refs))
    ]
    return ray.data.from_arrow_refs(out_refs)


def embedding_cosine_dedup_lsh(emb_ds, threshold: float = 0.98,
                               bits: int = 8, tables: int = 8,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id", seed: int = 11,
                               num_partitions: int = 8,
                               max_bucket: int = 256):
    """Approximate near-dup pairs: random-hyperplane LSH blocking
    (OR-amplified across ``tables`` independent hash tables), exact
    cosine verify on the candidates — the 10^9+-vector path.

    Shuffle discipline mirrors ``minhash_lsh_dedup``: the bucket
    shuffle carries only (bucket_key, vec_id); the verify joins run
    against the embeddings table pre-filtered to candidate ids
    (broadcast id set), so only candidate vectors enter a shuffle.
    Degenerate buckets are bounded by ``max_bucket``
    (:func:`torray.ops.dedup.bounded_pair_positions`: salt-split +
    connectivity star, O(m*cap) rows).  Recall < 1 (a pair survives
    iff it collides in >= 1 table: 1-(1-p^bits)^tables with
    p = 1 - theta/pi); raise ``tables`` or lower ``bits`` for recall,
    the reverse for cost."""
    import ray  # noqa: F401  (Dataset ops only)

    from torray.ops.dedup import _PREFILTER_MAX_PAIRS, salted_bucket_pairs

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, vec_col)
        if mat.size == 0:
            return pa.table({"bucket_key": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        mat = _normalize(mat)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        weights = 1 << np.arange(bits, dtype=np.int64)
        keys = np.empty(tables * n, np.int64)
        for l in range(tables):
            planes = _hyperplanes(mat.shape[1], bits, seed + 101 * l)
            sigs = (mat @ planes.T > 0).astype(np.int64)
            # int64 bucket key: table index above the bits-wide bucket —
            # vectorized, no per-row Python string keys.
            keys[l * n:(l + 1) * n] = (l << bits) | (sigs @ weights)
        return pa.table({"bucket_key": pa.array(keys, pa.int64()),
                         id_col: pa.array(np.tile(ids, tables),
                                          pa.int64())})

    import ray.data

    candidates = (
        salted_bucket_pairs(
            emb_ds.select_columns([id_col, vec_col])
            .map_batches(bucketize, batch_format="pyarrow"),
            "bucket_key", id_col, max_bucket=max_bucket)
        .groupby(["id_a", "id_b"]).count()
        .map_batches(lambda t: t.select(["id_a", "id_b"]),
                     batch_format="pyarrow")
    )
    # Id pairs only — bounded; the count() short-circuits no-candidates.
    candidates = candidates.materialize()
    n_cand = candidates.count()
    if n_cand == 0:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64())}))
    verify_src = emb_ds.select_columns([id_col, vec_col])
    if n_cand <= _PREFILTER_MAX_PAIRS:
        # Rebuild the bounded pair set as one clean block (avoids the
        # schemaless-0-row-block join bug without a second
        # repartition+materialize) and broadcast the candidate id set:
        # the verify joins then shuffle only candidate vectors.
        cand_tbl = pa.concat_tables(
            [t for t in ray.get(candidates.to_arrow_refs())
             if t.num_rows])
        candidates = ray.data.from_arrow(cand_tbl)
        cand_ids = np.unique(np.concatenate([
            cand_tbl.column("id_a").to_numpy(zero_copy_only=False),
            cand_tbl.column("id_b").to_numpy(zero_copy_only=False)]))
        ids_ref = ray.put(cand_ids)

        def prefilter(t: pa.Table) -> pa.Table:
            import ray as _r

            mask = np.isin(
                t.column(id_col).to_numpy(zero_copy_only=False),
                _r.get(ids_ref))
            return t.filter(pa.array(mask))

        verify_src = verify_src.map_batches(prefilter,
                                            batch_format="pyarrow")
    else:
        # The repartition folds away schemaless 0-row blocks from empty
        # map_groups partitions; the second materialize keeps the join
        # DAG's aggregator CPU reservations minimal.
        candidates = candidates.repartition(num_partitions).materialize()

    def side(name_id: str, name_vec: str):
        # Arrow hash joins reject list-typed payload columns; carry the
        # vector as a float32 byte blob and decode after the join.
        def enc(t: pa.Table) -> pa.Table:
            mat = _batch_matrix(t, vec_col).astype(np.float32)
            blobs = [mat[i].tobytes() for i in range(mat.shape[0])]
            return pa.table({name_id: t.column(id_col),
                             name_vec: pa.array(blobs, pa.binary())})

        return verify_src.map_batches(enc, batch_format="pyarrow")

    from torray.ops.join import safe_join

    joined = safe_join(candidates, side("id_a", "__vec_a"), "inner",
                       num_partitions, on=("id_a",))
    joined = safe_join(joined, side("id_b", "__vec_b"), "inner",
                       num_partitions, on=("id_b",))

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        va = _normalize(np.stack([
            np.frombuffer(b, np.float32).astype(np.float64)
            for b in batch.column("__vec_a").to_pylist()]))
        vb = _normalize(np.stack([
            np.frombuffer(b, np.float32).astype(np.float64)
            for b in batch.column("__vec_b").to_pylist()]))
        cos = np.einsum("ij,ij->i", va, vb)
        return batch.filter(pa.array(cos >= threshold)).select(
            ["id_a", "id_b"])

    return joined.map_batches(verify, batch_format="pyarrow")


def group_centroids(emb_ds, *, group_col: str = "label",
                    vec_col: str = "embedding", scale: int = 1_000_000,
                    num_partitions: int = 64):
    """EXACT per-group embedding centroid, long format — ``(group,
    dim, centroid)`` with ``dim`` 0-based and ``centroid`` the mean of
    ``round(component * scale)`` micro-units divided back out: the
    per-dim sum is an exact int64, so any SQL engine summing the same
    scaled integers agrees bit-for-bit, and ``centroid = sum_micro /
    (scale * n)`` is the ONE float64 division both engines perform on
    the same two integers (the repo-wide exactness recipe — see
    ``ops.window.running_total``).

    Scale shape: each block folds to (group, dim, sum_micro, n)
    int64 partials with ONE ``np.add.at`` scatter (groups x dims rows
    per block — the raw vectors never leave their block), then a
    hash(group) partition shuffle of those partials feeds a lexsort +
    ``np.add.reduceat`` fold — one Python call per PARTITION.  The
    shuffle volume is bounded by groups x dims x blocks, independent
    of row count."""
    from torray.ops.dedup import _mix64

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"__g": pa.array([], pa.int64()),
                          "__d": pa.array([], pa.int64()),
                          "__s": pa.array([], pa.int64()),
                          "__n": pa.array([], pa.int64()),
                          "__part": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        mat = _batch_matrix(batch, vec_col)
        n, d = mat.shape
        if d == 0:
            return empty
        prod = mat * scale
        # half AWAY from zero, matching SQL round() (np.round banks)
        scaled = np.copysign(np.floor(np.abs(prod) + 0.5),
                             prod).astype(np.int64)
        g = batch.column(group_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ug, inv = np.unique(g, return_inverse=True)
        k = len(ug)
        sums = np.zeros((k, d), np.int64)
        np.add.at(sums, inv, scaled)
        cnt = np.bincount(inv, minlength=k).astype(np.int64)
        g_out = np.repeat(ug, d)
        part = (_mix64(np.repeat(ug, d))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            "__g": pa.array(g_out, pa.int64()),
            "__d": pa.array(np.tile(np.arange(d, dtype=np.int64), k),
                            pa.int64()),
            "__s": pa.array(sums.ravel(), pa.int64()),
            "__n": pa.array(np.repeat(cnt, d), pa.int64()),
            "__part": pa.array(part, pa.int64()),
        })

    empty_out = pa.table({group_col: pa.array([], pa.int64()),
                          "dim": pa.array([], pa.int64()),
                          "centroid": pa.array([], pa.float64())})

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        g = group.column("__g").to_numpy(zero_copy_only=False)
        d = group.column("__d").to_numpy(zero_copy_only=False)
        s = group.column("__s").to_numpy(zero_copy_only=False)
        n = group.column("__n").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        g, d, s, n = g[order], d[order], s[order], n[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], (g[1:] != g[:-1]) | (d[1:] != d[:-1]))))
        tot = np.add.reduceat(s, starts)
        cnt = np.add.reduceat(n, starts)
        return pa.table({
            group_col: pa.array(g[starts], pa.int64()),
            "dim": pa.array(d[starts], pa.int64()),
            "centroid": pa.array(tot.astype(np.float64)
                                 / (scale * cnt).astype(np.float64),
                                 pa.float64()),
        })

    return (emb_ds.select_columns([group_col, vec_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(fold, batch_format="pyarrow"))


def _merge_topk_partials(partials_ds, k: int):
    """Driver merge of per-block (query_idx, vec_id, score) top-k
    partials — k x blocks rows per query, bounded at any corpus size."""
    import ray
    import ray.data

    tables = [t for t in ray.get(partials_ds.to_arrow_refs())
              if t.num_rows]
    empty = pa.table({"query_idx": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if not tables:
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
    return ray.data.from_arrow(pa.table({
        "query_idx": pa.array(keep_q, pa.int64()),
        "vec_id": pa.array(keep_id, pa.int64()),
        "score": pa.array(keep_s, pa.float64())}))


def pq_train(emb_ds, *, m: int = 4, ksub: int = 256,
             train_sample: int = 4096, iters: int = 10,
             vec_col: str = "embedding", seed: int = 23) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al., TPAMI'11)
    on a bounded driver-side sample: vectors L2-normalize (cosine
    geometry), split into ``m`` subspaces, and each subspace gets its
    own ``ksub``-centroid k-means — so a d-dim float32 vector
    compresses to ``m`` bytes (d*4/m x smaller).  Returns codebooks
    shaped ``(m, ksub, d/m)`` float64; the corpus is never pulled —
    only ``train_sample`` rows reach the driver (the
    :func:`_train_centroids` contract)."""
    import ray

    sample_tbl = pa.concat_tables(
        [t for t in ray.get(
            emb_ds.select_columns([vec_col]).limit(train_sample)
            .to_arrow_refs()) if t.num_rows])
    sample = _normalize(_batch_matrix(sample_tbl, vec_col))
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    kk = min(ksub, n)
    rng = np.random.RandomState(seed)
    books = np.empty((m, kk, dsub), np.float64)
    for j in range(m):
        sub = sample[:, j * dsub:(j + 1) * dsub]
        cents = sub[rng.choice(n, kk, replace=False)]
        for _ in range(iters):
            # argmin ||x-c||^2 = argmin (|c|^2 - 2 x.c) — matmul form
            d2 = (cents * cents).sum(1)[None, :] - 2.0 * (sub @ cents.T)
            assign = np.argmin(d2, axis=1)
            for c in range(kk):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(emb_ds, books: np.ndarray, *, vec_col: str = "embedding",
              id_col: str = "vec_id"):
    """Encode every corpus vector to ``m`` uint8 codes (nearest
    codebook centroid per subspace).  Returns ``(vec_id,
    code: fixed_size_list<uint8, m>)`` — the persisted form a 100 TB
    embedding store searches from (16-64x smaller than the floats;
    write once with the partitioned sink, search many times).
    Codebooks broadcast once via ``ray.put``; encoding is m matmul
    argmins per batch, no Python rows."""
    import ray

    m, kk, dsub = books.shape
    books_ref = ray.put(books)

    def encode(batch: pa.Table) -> pa.Table:
        bks = ray.get(books_ref)
        mat = _batch_matrix(batch, vec_col)
        if mat.size == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "code": pa.array([], pa.list_(pa.uint8(), m))})
        mat = _normalize(mat)
        n = mat.shape[0]
        codes = np.empty((n, m), np.uint8)
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            cents = bks[j]
            d2 = (cents * cents).sum(1)[None, :] - 2.0 * (sub @ cents.T)
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        flat = pa.array(codes.reshape(-1), pa.uint8())
        return pa.table({
            id_col: batch.column(id_col),
            "code": pa.FixedSizeListArray.from_arrays(flat, m)})

    return emb_ds.select_columns([id_col, vec_col]).map_batches(
        encode, batch_format="pyarrow")


def pq_knn(codes_ds, books: np.ndarray, query_vecs: np.ndarray,
           k: int = 10, *, id_col: str = "vec_id"):
    """Approximate cosine top-k over PQ codes via asymmetric distance
    computation (ADC): each query precomputes one ``(m, ksub)`` lookup
    table (``LUT[j] = q_sub_j @ books[j].T``) so a database vector's
    score is ``sum_j LUT[j][code_j]`` — a table gather, never a float
    reconstruction.  Queries+LUTs broadcast once; per-batch scoring is
    m vectorized gathers + adds over the uint8 code matrix; per-block
    top-k partials merge on the driver (k x blocks rows).  Recall is
    bounded by quantization error — recall-tested against
    :func:`knn_bruteforce` in pytest."""
    import ray

    m, kk, dsub = books.shape
    queries = _normalize(np.asarray(query_vecs, dtype=np.float64))
    # (nq, m, ksub): LUT[q, j, c] = <q_sub_j, centroid c of book j>
    luts = np.stack([queries[:, j * dsub:(j + 1) * dsub] @ books[j].T
                     for j in range(m)], axis=1)
    lut_ref = ray.put(luts)

    def partial_topk(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        if batch.num_rows == 0:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        code_col = batch.column("code")
        if isinstance(code_col, pa.ChunkedArray):
            code_col = code_col.combine_chunks()
        codes = code_col.flatten().to_numpy(
            zero_copy_only=False).reshape(-1, m)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        nq = lut.shape[0]
        # scores (nq, n): sum over subspaces of LUT gathers
        scores = np.zeros((nq, len(ids)), np.float64)
        for j in range(m):
            scores += lut[:, j, codes[:, j]]
        out_q, out_id, out_s = [], [], []
        kb = min(k, len(ids))
        for q in range(nq):
            col = scores[q]
            idx = np.lexsort((ids, -col))[:kb]
            out_q.extend([q] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table({"query_idx": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partials = codes_ds.map_batches(partial_topk,
                                    batch_format="pyarrow")
    return _merge_topk_partials(partials, k)


def pq_knn_rerank(emb_ds, codes_ds, books: np.ndarray,
                  query_vecs: np.ndarray, k: int = 10,
                  shortlist: int = 100, *, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """The production PQ pipeline: ADC over the compressed codes
    builds a ``shortlist``-deep candidate set per query (cheap — the
    code store is 16-64x smaller than the floats), then ONLY the
    shortlisted vectors are re-scored exactly against the original
    embeddings and the true top-k of the shortlist returned.  Recall
    is the SHORTLIST's recall (0.98 at shortlist=10k on the pytest
    corpus shape) while the exact-scan cost drops from the corpus to
    nq x shortlist rows.

    The shortlist folds on the driver (nq x shortlist id rows,
    bounded) and broadcasts once; the rerank pass streams the
    embedding corpus with a vectorized membership prefilter, so
    non-candidates never score.
    """
    import ray

    cand = pq_knn(codes_ds, books, query_vecs, k=shortlist,
                  id_col=id_col)
    tables = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
    if not tables:
        return cand
    ct = pa.concat_tables(tables)
    cq = ct.column("query_idx").to_numpy(zero_copy_only=False)
    cid = ct.column("vec_id").to_numpy(zero_copy_only=False)
    queries = _normalize(np.asarray(query_vecs, dtype=np.float64))
    allow = {int(q): set(cid[cq == q].tolist()) for q in np.unique(cq)}
    union_ids = np.unique(cid)
    state_ref = ray.put((queries, allow, union_ids))

    def rerank(batch: pa.Table) -> pa.Table:
        qs, allow_, union = ray.get(state_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mask = np.isin(ids, union)
        if not mask.any():
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        sub = batch.filter(pa.array(mask))
        ids = ids[mask]
        mat = _normalize(_batch_matrix(sub, vec_col))
        sims = mat @ qs.T  # (n, nq)
        out_q, out_id, out_s = [], [], []
        for q in range(qs.shape[0]):
            ok = np.array([i in allow_.get(q, ()) for i in ids])
            if not ok.any():
                continue
            col = np.where(ok, sims[:, q], -np.inf)
            kb = min(k, int(ok.sum()))
            idx = np.lexsort((ids, -col))[:kb]
            out_q.extend([q] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table({"query_idx": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partials = emb_ds.select_columns([id_col, vec_col]).map_batches(
        rerank, batch_format="pyarrow")
    return _merge_topk_partials(partials, k)


def hard_negatives(emb_ds, anchor_ids, k: int = 10,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   label_col: str = "label"):
    """EXACT contrastive hard-negative mining: for each anchor vector,
    the top-k most cosine-similar corpus vectors whose ``label_col``
    DIFFERS from the anchor's — the classic negative pool for
    contrastive / triplet training (near the anchor in embedding
    space, but from another class, so the loss actually has to work).

    Distribution shape (same contract as :func:`knn_bruteforce`):
    the anchor rows are pulled with ONE bounded filtered scan
    (``len(anchor_ids)`` rows), normalized and broadcast once via
    ``ray.put``; every corpus batch computes a masked vectorized
    partial top-k (one matmul, the label mask applied per anchor
    column); the driver merge handles <= k x anchors x blocks rows.
    Corpus vectors never shuffle.  An anchor can never return itself
    (its own label matches, so the mask removes it).

    Returns a Dataset ``(query_id, vec_id, score)`` ordered per anchor
    by (score desc, vec_id) with deterministic tie-breaks; anchors
    with no differently-labeled corpus row contribute zero rows.
    """
    import ray
    import ray.data

    wanted = pa.array(np.asarray(list(anchor_ids), dtype=np.int64))

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({})
        return t.filter(pc.is_in(t.column(id_col), value_set=wanted))

    got = [t for t in ray.get(
        emb_ds.select_columns([id_col, vec_col, label_col])
        .map_batches(pick, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if not got:
        return ray.data.from_arrow(empty)
    anchors = pa.concat_tables(got)
    qids = anchors.column(id_col).to_numpy(zero_copy_only=False).astype(
        np.int64)
    qlabels = anchors.column(label_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    qmat = _normalize(_batch_matrix(anchors, vec_col))
    state_ref = ray.put((qids, qlabels, qmat))

    def partial(batch: pa.Table) -> pa.Table:
        qids_, qlabels_, q = ray.get(state_ref)
        mat = _batch_matrix(batch, vec_col)
        if mat.size == 0:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        sims = _normalize(mat) @ q.T  # (n, num_anchors)
        out_q, out_id, out_s = [], [], []
        kk = min(k, sims.shape[0])
        for qi in range(sims.shape[1]):
            col = np.where(labels != qlabels_[qi], sims[:, qi], -np.inf)
            idx = np.lexsort((ids, -col))[:kk]
            idx = idx[col[idx] != -np.inf]
            out_q.extend([int(qids_[qi])] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        # query_idx carries the anchor's vec_id directly — the merge
        # groups on values, so no positional remap is needed.
        return pa.table({"query_idx": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partials = emb_ds.select_columns(
        [id_col, vec_col, label_col]).map_batches(
        partial, batch_format="pyarrow")
    merged = _merge_topk_partials(partials, k)
    return merged.map_batches(
        lambda t: t.rename_columns(
            ["query_id" if c == "query_idx" else c
             for c in t.column_names]),
        batch_format="pyarrow")
