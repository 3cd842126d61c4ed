"""Benchmark decontamination: flag corpus documents that share word
n-grams with a (small) held-out test set — the standard train-set
hygiene pass of LLM data pipelines (n-gram overlap decontamination,
public recipe from the GPT-3 / PaLM appendices).

Shape: the test side is reduced to a sorted ``uint64`` array of
n-gram hashes (bounded: test sets are small by definition — the
builder materializes ONLY hashes, never text, and deduplicates as it
goes); the corpus side is a ``map_batches`` actor-pool stage that
fetches the broadcast hash array once per actor (``ray.put`` once,
``ray.get`` in ``__init__``) and probes each document's n-grams with
one ``np.searchsorted`` per batch.  No shuffle at all — the corpus
streams.

N-gram hashing is vectorized: per-word md5 hashes (memoized per
process — Zipf makes the hit rate high) combined over a sliding
window with fixed multipliers in wrap-around uint64, so a document's
n-grams hash in O(n) vector ops regardless of length.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

__all__ = ["build_ngram_set", "decontaminate", "ngram_hashes"]

_WORD_RE = re.compile(r"[A-Za-z0-9']+")
_B = np.uint64(0x9E3779B97F4A7C15)  # odd => invertible mod 2^64
_word_cache: dict[str, int] = {}


def _word_hashes(words: list[str]) -> np.ndarray:
    out = np.empty(len(words), np.uint64)
    cache = _word_cache
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            if len(cache) < 1_000_000:  # bound per-process memo
                cache[w] = h
        out[i] = h
    return out


def ngram_hashes(text: str, n: int = 8) -> np.ndarray:
    """uint64 hashes of all overlapping lowercased word n-grams."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < n:
        return np.empty(0, np.uint64)
    wh = _word_hashes(words)
    m = len(words) - n + 1
    acc = np.zeros(m, np.uint64)
    mult = 1
    for j in range(n):
        # array * scalar wraps mod 2^64 silently; keep the running
        # multiplier a Python int so the scalar product never warns.
        acc += wh[j:j + m] * np.uint64(mult)
        mult = (mult * int(_B)) & 0xFFFFFFFFFFFFFFFF
    return acc


def build_ngram_set(test_ds, text_col: str = "text",
                    n: int = 8) -> np.ndarray:
    """Sorted unique n-gram hash array of the test set.  Hashes (8
    bytes per distinct n-gram) are the only thing collected — for a
    100k-doc benchmark suite that is tens of MB, a broadcast-sized
    object by design."""
    parts = [
        np.unique(np.concatenate(
            [ngram_hashes(t or "", n) for t in
             batch.column(text_col).to_pylist()] or
            [np.empty(0, np.uint64)]))
        for batch in test_ds.select_columns([text_col]).iter_batches(
            batch_format="pyarrow")
    ]
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts))


class _Probe:
    """Actor-pool stage: broadcast hash set fetched once per actor."""

    def __init__(self, ref, n: int, threshold: float):
        import ray
        self.hashes = ray.get(ref) if not isinstance(ref, np.ndarray) \
            else ref
        self.n = n
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_grams = np.empty(len(texts), np.int64)
        n_hits = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            g = ngram_hashes(t or "", self.n)
            n_grams[i] = len(g)
            if len(g) == 0 or len(self.hashes) == 0:
                n_hits[i] = 0
                continue
            pos = np.searchsorted(self.hashes, g)
            pos[pos == len(self.hashes)] = 0
            n_hits[i] = int((self.hashes[pos] == g).sum())
        frac = n_hits / np.maximum(n_grams, 1)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_ngrams": pa.array(n_grams),
            "n_hits": pa.array(n_hits),
            "hit_frac": pa.array(frac, pa.float64()),
            "contaminated": pa.array(frac >= self.threshold),
        })


def decontaminate(corpus_ds, test_hashes: np.ndarray, *, n: int = 8,
                  threshold: float = 0.05, concurrency: int = 4):
    """Tag every corpus document with its test-set n-gram overlap ->
    (doc_id, n_ngrams, n_hits, hit_frac, contaminated).  ``threshold``
    is the hit fraction above which a doc counts as contaminated.
    The hash array is broadcast once (``ray.put``); the corpus
    streams through an actor pool."""
    import ray

    ref = ray.put(np.ascontiguousarray(test_hashes))
    return corpus_ds.select_columns(["doc_id", "text"]).map_batches(
        _Probe, fn_constructor_kwargs={
            "ref": ref, "n": n, "threshold": threshold},
        batch_format="pyarrow", concurrency=concurrency)
