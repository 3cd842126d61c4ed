"""Exact duplicate-substring detection and span removal.

The exact-substring dedup pass of LLM data pipelines (public recipe:
Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better" — their suffix-array ExactSubstr dedup): find every
``width``-character window that occurs more than once anywhere in the
corpus, then excise every occurrence except the globally first one,
merging overlapping excised windows into maximal spans.

Distributed shape
-----------------
*Detection* is a rolling-hash scan: each ``map_batches`` block hashes
every window of every document in ONE vectorized pass over the
batch's concatenated codepoints (polynomial rolling hash in
wrap-around ``uint64``; prefix sums + modular-inverse powers, no
Python loop over positions), then combines locally to unique
``(hash, n, min_winner)`` rows so repeated windows inside a block
never enter the shuffle.  The global reduce is one
``groupby(hash).aggregate(Sum, Min)`` over narrow int64 triplets,
filtered to ``n >= 2``.  The shuffle is O(total chars) int64 rows —
the inherent cost of EXACT every-position detection (a suffix array
touches every byte too); the sampled/winnowed variant at lower cost
is :func:`torray.ops.dedup.shared_passage_pairs`.

*Removal* broadcasts the duplicated-window table (sorted hash +
winner arrays, ``ray.put`` once, fetched once per actor) and streams
the corpus through an actor pool: membership via one
``np.searchsorted`` per batch, span coverage via a +1/-1 delta array
and one ``cumsum`` — no per-position Python.  The broadcast table is
bounded by ``max_dup_windows`` (hard error, not silent truncation):
duplicated windows are the pathology being removed, so the table is
small relative to the corpus by construction; if a corpus exceeds the
cap, raise ``width`` or run the winnowed variant first.

Hash fidelity: windows are compared by 64-bit rolling hash, not by
substring — at 2^64 a corpus needs ~10^9 DISTINCT duplicated windows
before a false merge is likely; the pytest suite cross-checks counts
and removals against a pure-substring reference and the SQL oracle
compares against real ``substr()`` windows.

Reference parity note: the TorSpider reference has no corpus ops at
all (it is a crawler, ``TorSpider.py``); this module is part of the
training-data layer built on top of the crawl output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "duplicate_window_table",
    "collect_duplicate_windows",
    "duplicate_window_counts",
    "remove_duplicate_spans",
]

_BASE = np.uint64(1099511628211)             # FNV64 prime, odd
_INV = np.uint64(pow(1099511628211, -1, 1 << 64))


def _empty_table(names_types) -> pa.Table:
    return pa.table({n: pa.array([], t) for n, t in names_types})


def _window_hash_rows(texts, width: int):
    """``(hash int64-view, doc_idx, pos)`` for every ``width``-char
    window of every text in the batch.

    One vectorized rolling-hash pass over the concatenated codepoints:
    ``h[i] = (S[i+W] - S[i]) * inv(base)^i`` with
    ``S[i] = sum_{j<i} c[j] * base^j`` in wrap-around uint64, so equal
    substrings hash equal regardless of position.  Windows crossing a
    document boundary are masked out afterwards — concatenation never
    bleeds because ``h[i]`` depends only on ``c[i..i+W-1]``.
    """
    lens = np.fromiter((len(t) if t else 0 for t in texts), np.int64,
                       len(texts))
    n = int(lens.sum())
    if n < width:
        z = np.empty(0, np.int64)
        return z, z, z
    blob = "".join(t or "" for t in texts)
    c = np.frombuffer(blob.encode("utf-32-le"),
                      np.uint32).astype(np.uint64) + np.uint64(1)
    pw = np.empty(n, np.uint64)
    pw[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _BASE, np.uint64), out=pw[1:])
    S = np.zeros(n + 1, np.uint64)
    np.cumsum(c * pw, out=S[1:])
    m = n - width + 1
    h = S[width:] - S[:m]
    ipw = np.empty(m, np.uint64)
    ipw[0] = 1
    if m > 1:
        np.cumprod(np.full(m - 1, _INV, np.uint64), out=ipw[1:])
    h = h * ipw
    starts = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    gpos = np.arange(m, dtype=np.int64)
    di = np.searchsorted(starts[1:], gpos, side="right")
    lpos = gpos - starts[di]
    ok = lpos + width <= lens[di]
    return h[ok].view(np.int64), di[ok], lpos[ok]


def _pack_winner(doc_ids: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Encode (doc_id, pos) as one order-preserving int64 so the
    global 'first occurrence' is a plain Min aggregate."""
    if len(doc_ids) and (int(doc_ids.min()) < 0
                         or int(doc_ids.max()) >= 1 << 31):
        raise ValueError(
            "span ops require doc ids in [0, 2^31); re-key the corpus")
    return (doc_ids.astype(np.int64) << np.int64(32)) \
        | pos.astype(np.int64)


def duplicate_window_table(ds, *, id_col: str = "doc_id",
                           text_col: str = "text", width: int = 60):
    """Dataset of ``(h, n, w)``: every window hash occurring >= 2
    times corpus-wide, its total count, and its packed first
    occurrence ``(doc_id << 32) | pos``."""
    import ray.data

    def combine(t: pa.Table) -> pa.Table:
        empty = _empty_table(
            (("h", pa.int64()), ("n", pa.int64()), ("w", pa.int64())))
        if t.num_rows == 0:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        texts = t.column(text_col).to_pylist()
        h, di, lpos = _window_hash_rows(texts, width)
        if not len(h):
            return empty
        wid = _pack_winner(ids[di], lpos)
        order = np.lexsort((wid, h))
        hs, ws = h[order], wid[order]
        first = np.ones(len(hs), bool)
        first[1:] = hs[1:] != hs[:-1]
        idx = np.flatnonzero(first)
        counts = np.diff(np.append(idx, len(hs)))
        return pa.table({"h": pa.array(hs[idx], pa.int64()),
                         "n": pa.array(counts.astype(np.int64)),
                         "w": pa.array(ws[idx], pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        empty = _empty_table(
            (("h", pa.int64()), ("n", pa.int64()), ("w", pa.int64())))
        if t.num_rows == 0:
            return empty
        t = t.filter(pc.greater_equal(t.column("sum(n)"), 2))
        return pa.table({"h": t.column("h"), "n": t.column("sum(n)"),
                         "w": t.column("min(w)")})

    return (ds.select_columns([id_col, text_col])
            .map_batches(combine, batch_format="pyarrow")
            .groupby("h")
            .aggregate(ray.data.aggregate.Sum("n"),
                       ray.data.aggregate.Min("w"))
            .map_batches(finish, batch_format="pyarrow"))


def collect_duplicate_windows(dup_ds, *,
                              max_dup_windows: int = 5_000_000):
    """Fold the (bounded) duplicated-window table to two aligned numpy
    arrays sorted by hash: ``(hashes int64, winners int64)``.  Hard
    error above ``max_dup_windows`` (never silent truncation)."""
    hs, ws, total = [], [], 0
    for b in dup_ds.select_columns(["h", "w"]).iter_batches(
            batch_format="pyarrow"):
        total += b.num_rows
        if total > max_dup_windows:
            raise ValueError(
                f"duplicated-window table exceeds max_dup_windows="
                f"{max_dup_windows}; raise `width` or run the winnowed "
                f"variant (shared_passage_pairs) first")
        hs.append(b.column("h").to_numpy(zero_copy_only=False))
        ws.append(b.column("w").to_numpy(zero_copy_only=False))
    if not hs:
        z = np.empty(0, np.int64)
        return z, z
    h = np.concatenate(hs)
    w = np.concatenate(ws)
    order = np.argsort(h)
    return np.ascontiguousarray(h[order]), np.ascontiguousarray(w[order])


class _SpanProbe:
    """Actor-pool stage: broadcast (hash, winner) arrays fetched once
    per actor; per batch one rolling-hash pass + one searchsorted."""

    def __init__(self, ref, id_col, text_col, width, remove):
        import ray
        self.h, self.w = ray.get(ref) if not isinstance(ref, tuple) \
            else ref
        self.id_col, self.text_col = id_col, text_col
        self.width, self.remove = width, remove

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pylist()
        h, di, lpos = _window_hash_rows(texts, self.width)
        if len(h) and len(self.h):
            p = np.searchsorted(self.h, h)
            p[p == len(self.h)] = 0
            member = self.h[p] == h
        else:
            p = np.zeros(len(h), np.int64)
            member = np.zeros(len(h), bool)
        if not self.remove:
            counts = np.bincount(di[member], minlength=len(texts))
            keep = np.flatnonzero(counts)
            return pa.table({
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_dup": pa.array(counts[keep].astype(np.int64))})
        selfw = _pack_winner(ids[di], lpos) if len(h) \
            else np.empty(0, np.int64)
        if len(self.w):
            excise = member & (self.w[p] != selfw)
        else:  # no duplicate window anywhere: nothing to excise
            excise = np.zeros(len(h), bool)
        lens = np.fromiter((len(t) if t else 0 for t in texts),
                           np.int64, len(texts))
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        delta = np.zeros(int(lens.sum()) + 1, np.int64)
        gstart = starts[di[excise]] + lpos[excise]
        np.add.at(delta, gstart, 1)
        np.add.at(delta, gstart + self.width, -1)
        covered = np.cumsum(delta[:-1]) > 0
        span_start = covered.copy()
        span_start[1:] &= ~covered[:-1]
        out_texts, n_removed, n_spans = [], [], []
        for i, t in enumerate(texts):
            s, e = starts[i], starts[i + 1]
            mk = covered[s:e]
            nrem = int(mk.sum())
            if nrem == 0:
                out_texts.append(t)
                n_removed.append(0)
                n_spans.append(0)
                continue
            cp = np.frombuffer((t or "").encode("utf-32-le"), np.uint32)
            out_texts.append(cp[~mk].tobytes().decode("utf-32-le"))
            n_removed.append(nrem)
            n_spans.append(int(span_start[s:e].sum()))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(out_texts, pa.string()),
            "n_removed": pa.array(n_removed, pa.int64()),
            "n_spans": pa.array(n_spans, pa.int64())})


def _pool_size(requested: int) -> int:
    """Cap the probe actor pool below cluster CPUs so upstream tasks
    can still schedule (an actor pool == cluster size starves the
    producing stage — same wedge class the hash-join cap in
    ``ops.join`` guards against)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 0) or requested)
    return max(1, min(requested, cpus - 1))


def duplicate_window_counts(ds, *, id_col: str = "doc_id",
                            text_col: str = "text", width: int = 60,
                            max_dup_windows: int = 5_000_000,
                            concurrency: int = 4):
    """Per-document duplicated-window counts -> ``(doc_id, n_dup)``,
    only documents with at least one duplicated window (matches the
    SQL join oracle)."""
    import ray

    dup = duplicate_window_table(ds, id_col=id_col, text_col=text_col,
                                 width=width)
    ref = ray.put(collect_duplicate_windows(
        dup, max_dup_windows=max_dup_windows))
    return ds.select_columns([id_col, text_col]).map_batches(
        _SpanProbe,
        fn_constructor_kwargs={"ref": ref, "id_col": id_col,
                               "text_col": text_col, "width": width,
                               "remove": False},
        batch_format="pyarrow", concurrency=_pool_size(concurrency))


def remove_duplicate_spans(ds, *, id_col: str = "doc_id",
                           text_col: str = "text", width: int = 60,
                           max_dup_windows: int = 5_000_000,
                           concurrency: int = 4):
    """Excise every non-first occurrence of every duplicated
    ``width``-char window (overlaps merged into maximal spans) ->
    ``(doc_id, text, n_removed, n_spans)`` for the whole corpus.
    'First' is the globally smallest ``(doc_id, pos)`` — deterministic
    and partition-invariant."""
    import ray

    dup = duplicate_window_table(ds, id_col=id_col, text_col=text_col,
                                 width=width)
    ref = ray.put(collect_duplicate_windows(
        dup, max_dup_windows=max_dup_windows))
    return ds.select_columns([id_col, text_col]).map_batches(
        _SpanProbe,
        fn_constructor_kwargs={"ref": ref, "id_col": id_col,
                               "text_col": text_col, "width": width,
                               "remove": True},
        batch_format="pyarrow", concurrency=_pool_size(concurrency))
