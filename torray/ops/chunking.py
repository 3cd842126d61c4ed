"""Training-sequence preparation operators: sliding-window document
chunking (the "split every document into model-context-sized pieces"
pass that precedes sequence packing) and exact corpus-wide adjacent
byte-pair counting (the first merge step of BPE tokenizer training).

Both are zero-shuffle by construction on their hot path:

- :func:`chunk_documents` is a pure per-batch explode — every chunk is
  derived from one document, so no row ever crosses a block boundary.
  The explode is fully Arrow/numpy vectorized (list-offset arithmetic
  + one ``pc.take`` + ``pc.binary_join``); no Python loop touches a
  token.
- :func:`bpe_pair_counts` collapses each block to a <=65,536-slot
  count vector (the pair space of byte x byte) before the single
  ``groupby`` — the shuffle carries at most 65,536 narrow int rows per
  block regardless of corpus size, which is the textbook combiner
  bound for this op.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["chunk_documents", "bpe_pair_counts", "word_frequencies",
           "bpe_train", "bpe_encode"]

_CHUNK_SCHEMA_COLS = ("chunk_id", "n_tokens", "chunk")


def chunk_documents(docs_ds, *, window: int, stride: int,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Split each document into sliding whitespace-token windows of
    ``window`` tokens advancing by ``stride`` -> one row per chunk:
    ``(id_col, chunk_id, n_tokens, chunk)``.

    Semantics (exactly SQL-expressible, hash-checked by the driver):
    tokens are the non-empty pieces of ``regexp_split(text, '\\s+')``;
    a chunk starts at every token offset ``0, stride, 2*stride, ...``
    strictly below the document's token count, spans
    ``min(window, n - start)`` tokens, and re-joins them with a single
    space.  ``chunk_id = start // stride``.  Zero-token documents emit
    nothing.  Tail chunks shorter than ``window`` are emitted (the
    packing stage downstream — :mod:`torray.ops.pack` — is where short
    pieces get combined), and with ``stride < window`` consecutive
    chunks overlap by ``window - stride`` tokens, the standard
    context-overlap recipe.

    Scale shape: a per-batch explode with no shuffle and no Python
    per-row work — list offsets and chunk index arrays are pure numpy,
    chunk text is one ``pc.take`` + ``pc.binary_join``.  Output size
    is ``~ window/stride x`` input tokens, so at 100 TB the op
    streams: each input block yields one output block and is released.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out_empty = pa.table({
            id_col: pa.array([], ids.type),
            "chunk_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk": pa.array([], pa.string()),
        })
        if batch.num_rows == 0:
            return out_empty
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(col, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()  # logical order, slice-offset safe
        raw_counts = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # '\s+' split leaves '' pieces at leading/trailing whitespace
        # (and for the empty document): drop them, recount per doc.
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n_docs = batch.num_rows
        doc_of_tok = np.repeat(np.arange(n_docs, dtype=np.int64),
                               raw_counts)
        counts = np.bincount(doc_of_tok[nonempty],
                             minlength=n_docs).astype(np.int64)
        flat_clean = flat.filter(pa.array(nonempty))
        tok_base = np.concatenate(([0], np.cumsum(counts)))
        # chunk fan-out per doc: ceil(n / stride), 0 for empty docs
        n_chunks = (counts + stride - 1) // stride
        total_chunks = int(n_chunks.sum())
        if total_chunks == 0:
            return out_empty
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_chunks)
        cum_chunks = np.cumsum(n_chunks) - n_chunks
        starts = (np.arange(total_chunks, dtype=np.int64)
                  - np.repeat(cum_chunks, n_chunks)) * stride
        lens = np.minimum(window, counts[doc_idx] - starts)
        # token index per (chunk, position) -> one flat take
        cum_lens = np.cumsum(lens) - lens
        idx = (np.repeat(tok_base[doc_idx] + starts, lens)
               + np.arange(int(lens.sum()), dtype=np.int64)
               - np.repeat(cum_lens, lens))
        taken = flat_clean.take(pa.array(idx, pa.int64()))
        chunk_offsets = np.concatenate(([0], np.cumsum(lens)))
        lists = pa.ListArray.from_arrays(
            pa.array(chunk_offsets, pa.int32()), taken)
        return pa.table({
            id_col: ids.take(pa.array(doc_idx, pa.int64())),
            "chunk_id": pa.array(starts // stride, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "chunk": pc.binary_join(lists, " "),
        })

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")


def bpe_pair_counts(docs_ds, k: int = 50, *, text_col: str = "text"):
    """EXACT top-``k`` most frequent adjacent byte pairs across the
    corpus (ties broken by ascending pair string) -> ``(pair, n)`` —
    the statistic the first BPE tokenizer-training merge is chosen
    from.  Pairs never span documents.

    Pairs are counted over UTF-8 BYTES (the byte-level BPE convention,
    e.g. GPT-2's tokenizer); on an ASCII corpus this is identical to
    character pairs, which is what the DuckDB ``substr`` oracle
    checks.  The returned ``pair`` column renders each byte pair
    latin-1, so ASCII pairs round-trip exactly.

    Scale shape: each block folds to one ``np.bincount`` over the
    65,536-slot pair space — the shuffle carries at most 65,536
    ``(pair:int32, n:int64)`` rows per block no matter how much text
    the block holds, then ONE small ``groupby('pair').sum`` merges the
    partials and a two-stage local-cut/merge picks the global top-k
    (same shape as :func:`torray.ops.rank.top_frequent`).  No text
    ever enters the shuffle.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"p": pa.array([], pa.int32()),
                          "__n": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(pa.large_string())  # int64 offsets: one code path
        off = np.frombuffer(col.buffers()[1], np.int64)[
            col.offset:col.offset + len(col) + 1]
        data = np.frombuffer(col.buffers()[2], np.uint8)
        a = data[off[0]:off[-1]]
        if a.size < 2:
            return empty
        pairs = (a[:-1].astype(np.uint16) << np.uint16(8)) | a[1:]
        valid = np.ones(a.size - 1, np.bool_)
        # a pair starting at (doc boundary - 1) spans two documents;
        # an EMPTY trailing document puts its boundary at a.size-1,
        # past the last pair slot — clip both ends
        bounds = (off[1:-1] - off[0]) - 1
        valid[bounds[(bounds >= 0) & (bounds < valid.size)]] = False
        counts = np.bincount(pairs[valid], minlength=65536)
        nz = np.flatnonzero(counts)
        return pa.table({"p": pa.array(nz.astype(np.int32), pa.int32()),
                         "__n": pa.array(counts[nz], pa.int64())})

    def local_cut(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        n = t.column("n").to_numpy(zero_copy_only=False)
        p = t.column("p").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, -n))[:k]
        return t.take(pa.array(np.sort(order), pa.int64()))

    def render(t: pa.Table) -> pa.Table:
        # <= k rows by here: emit in rank order (n desc, pair asc) and
        # decode the two bytes per surviving pair
        n = t.column("n").to_numpy(zero_copy_only=False)
        p = t.column("p").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, -n))
        raw = p[order].astype(">u2").tobytes()
        pair = pa.array([raw[2 * i:2 * i + 2].decode("latin-1")
                         for i in range(t.num_rows)], pa.string())
        return pa.table({"pair": pair,
                         "n": pa.array(n[order], pa.int64())})

    summed = (docs_ds.select_columns([text_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("p").aggregate(Sum("__n")))
    summed = summed.map_batches(
        lambda t: t.rename_columns(
            ["n" if c == "sum(__n)" else c for c in t.column_names]),
        batch_format="pyarrow")
    return (summed.map_batches(local_cut, batch_format="pyarrow")
            .repartition(1)
            .map_batches(local_cut, batch_format="pyarrow")
            .map_batches(render, batch_format="pyarrow"))


def word_frequencies(docs_ds, *, text_col: str = "text",
                     min_count: int = 1, max_words: int | None = None):
    """Corpus word-frequency table ``(word, n)`` — the bounded input
    BPE training folds over.  Words are non-empty ``'\\s+'`` splits.

    Scale shape: each block collapses to its distinct (word, count)
    partial with one Arrow ``group_by`` (raw text never shuffles), ONE
    ``groupby('word').sum`` merges, then optional gates bound the
    result: ``min_count`` drops hapax noise (typos/URLs — the unbounded
    tail of a web-scale vocabulary), ``max_words`` keeps the exact
    top-N by (count desc, word asc) via the same two-stage local-cut
    used by :func:`torray.ops.rank.top_frequent`."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(col, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        t = pa.table({"word": flat})
        g = t.group_by("word").aggregate([([], "count_all")])
        return pa.table({"word": g.column("word"),
                         "__n": g.column("count_all").cast(pa.int64())})

    summed = (docs_ds.select_columns([text_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("word").aggregate(Sum("__n")))
    summed = summed.map_batches(
        lambda t: t.rename_columns(
            ["n" if c == "sum(__n)" else c for c in t.column_names]),
        batch_format="pyarrow")
    if min_count > 1:
        summed = summed.filter(
            expr=f"n >= {int(min_count)}")
    if max_words is not None:
        k = int(max_words)

        def local_cut(t: pa.Table) -> pa.Table:
            if t.num_rows <= k:
                return t
            n = t.column("n").to_numpy(zero_copy_only=False)
            w = t.column("word").to_numpy(zero_copy_only=False)
            _, codes = np.unique(w, return_inverse=True)
            order = np.lexsort((codes, -n))[:k]
            return t.take(pa.array(np.sort(order), pa.int64()))

        summed = (summed.map_batches(local_cut, batch_format="pyarrow")
                  .repartition(1)
                  .map_batches(local_cut, batch_format="pyarrow"))
    return summed


def _merge_pair_in_word(syms: list, left: str, right: str) -> list:
    """One left-to-right non-overlapping merge pass ('aaa' with (a,a)
    -> ['aa','a'])."""
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(docs_ds, n_merges: int, *, text_col: str = "text",
              min_count: int = 1, max_words: int | None = 1_000_000,
              min_pair_count: int = 1) -> pa.Table:
    """Train ``n_merges`` BPE merges over the corpus -> Arrow table
    ``(rank, left, right, pair_count)`` (public recipe: Sennrich et
    al. 2016, minus the end-of-word marker — merges never cross a
    whitespace token, which :func:`bpe_encode` mirrors).

    Each round merges the adjacent symbol pair with the highest
    corpus count (ties -> lexicographically smallest (left, right)),
    applied left-to-right non-overlapping within each word.  Training
    stops early when no pair reaches ``min_pair_count``.

    Scale shape: the corpus pass is :func:`word_frequencies` (distinct
    (word, n) combiner shuffle — raw text never moves); the merge loop
    itself folds on the DRIVER over that bounded dictionary, exactly
    how production BPE trainers work (they train in-memory on word
    counts, not on the corpus).  ``max_words`` (default 1M) is the
    documented bound: at web scale the hapax tail is cut by
    ``min_count``/``max_words`` BEFORE driver collection, and the kept
    top-N dictionary is a few tens of MB.  Incremental pair-count
    maintenance makes the loop O(affected words) per merge, not
    O(vocabulary)."""
    import ray

    wf = word_frequencies(docs_ds, text_col=text_col,
                          min_count=min_count, max_words=max_words)
    tables = [t for t in ray.get(wf.to_arrow_refs()) if t.num_rows]
    empty = pa.table({"rank": pa.array([], pa.int64()),
                      "left": pa.array([], pa.string()),
                      "right": pa.array([], pa.string()),
                      "pair_count": pa.array([], pa.int64())})
    if not tables:
        return empty
    vocab_t = pa.concat_tables(tables)
    words = vocab_t.column("word").to_pylist()
    freqs = vocab_t.column("n").to_pylist()
    syms = [list(w) for w in words]

    # pair -> total count and pair -> {word ids containing it}
    from collections import Counter, defaultdict

    pair_counts: Counter = Counter()
    pair_words: dict = defaultdict(set)
    for wi, (s, f) in enumerate(zip(syms, freqs)):
        for a, b in zip(s, s[1:]):
            pair_counts[(a, b)] += f
            pair_words[(a, b)].add(wi)

    ranks, lefts, rights, counts_out = [], [], [], []
    for rank in range(n_merges):
        if not pair_counts:
            break
        # max count, ties -> smallest (left, right)
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < min_pair_count:
            break
        ranks.append(rank)
        lefts.append(left)
        rights.append(right)
        counts_out.append(cnt)
        for wi in list(pair_words[(left, right)]):
            s, f = syms[wi], freqs[wi]
            for a, b in zip(s, s[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                pair_words[(a, b)].discard(wi)
            s = _merge_pair_in_word(s, left, right)
            syms[wi] = s
            for a, b in zip(s, s[1:]):
                pair_counts[(a, b)] += f
                pair_words[(a, b)].add(wi)
    return pa.table({"rank": pa.array(ranks, pa.int64()),
                     "left": pa.array(lefts, pa.string()),
                     "right": pa.array(rights, pa.string()),
                     "pair_count": pa.array(counts_out, pa.int64())})


class _BpeEncoder:
    """Actor-pool BPE encode stage: the merge table is fetched ONCE
    per actor (``ray.get`` in ``__init__``), and a per-actor
    word -> encoding cache makes the per-word Python loop amortize to
    once per DISTINCT word per actor (the GPT-2 encoder's cache trick
    — Zipf means the cache absorbs almost every occurrence)."""

    def __init__(self, merges_ref, text_col: str, id_col: str):
        import ray

        merges = ray.get(merges_ref)
        self.rank = {(l, r): i for i, (l, r) in enumerate(
            zip(merges.column("left").to_pylist(),
                merges.column("right").to_pylist()))}
        self.text_col = text_col
        self.id_col = id_col
        self.cache: dict[str, list] = {}

    def _encode_word(self, w: str) -> list:
        got = self.cache.get(w)
        if got is not None:
            return got
        syms = list(w)
        rank = self.rank
        while len(syms) > 1:
            best_rank, best_pair = None, None
            for p in zip(syms, syms[1:]):
                r = rank.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, p
            if best_pair is None:
                break
            syms = _merge_pair_in_word(syms, *best_pair)
        self.cache[w] = syms
        return syms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_col = batch.column(self.id_col)
        if batch.num_rows == 0:
            return pa.table({
                self.id_col: pa.array([], ids_col.type),
                "n_words": pa.array([], pa.int64()),
                "n_bpe_tokens": pa.array([], pa.int64()),
            })
        import re

        texts = batch.column(self.text_col).to_pylist()
        n_words = np.empty(len(texts), np.int64)
        n_toks = np.empty(len(texts), np.int64)
        for i, s in enumerate(texts):
            ws = [w for w in re.split(r"\s+", s) if w]
            n_words[i] = len(ws)
            n_toks[i] = sum(len(self._encode_word(w)) for w in ws)
        return pa.table({
            self.id_col: ids_col,
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_toks, pa.int64()),
        })


def bpe_encode(docs_ds, merges: pa.Table, *, text_col: str = "text",
               id_col: str = "doc_id", concurrency=(1, 8)):
    """Apply trained BPE merges to the corpus -> per-document
    ``(id_col, n_words, n_bpe_tokens)`` (the compression/fertility
    statistic tokenizer evaluation needs).  Encoding follows the
    GPT-2 rule: repeatedly merge the LOWEST-rank pair present until
    none applies — for any word whose pairs were all merged during
    training this reproduces the training segmentation exactly
    (test-verified).

    The merge table rides ``ray.put`` once; each actor builds its
    rank dict and word cache once (:class:`_BpeEncoder`)."""
    import ray

    ref = ray.put(merges)
    return docs_ds.select_columns([id_col, text_col]).map_batches(
        _BpeEncoder,
        fn_constructor_kwargs={"merges_ref": ref, "text_col": text_col,
                               "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)
