"""Text-analysis operators over a documents Dataset
(``doc_id:int64, text:string, lang:string, source:string,
n_chars:int64`` — TESTDATA.md).

All operators are batched ``map_batches`` transforms over Arrow
blocks; per-row Python is limited to compiled-regex scans over each
string.  Patterns are compiled once per process at import (module
globals survive across batches in a Ray worker, the cheap analogue of
actor-pool ``__init__`` state for stateless regex stages).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "token_count_batch",
    "token_counts",
    "lang_id_batch",
    "lang_id",
    "quality_batch",
    "quality_scores",
    "fingerprint_batch",
    "fingerprints",
    "repetition_batch",
    "repetition_scores",
    "term_doc_frequency",
    "tfidf_top_terms",
    "char_class_counts_batch",
    "char_class_counts",
    "paragraph_dedup",
    "chunk_words",
    "bigram_lm_scores",
    "pmi_collocations",
    "doc_keywords",
    "json_field_batch",
    "json_field",
    "inverted_index",
    "bm25_topk",
    "pattern_hits",
    "vocab_overlap",
    "TextQualityModel",
    "model_score_documents",
    "gopher_rules_batch",
    "gopher_rules_filter",
    "html_to_text",
    "extract_page_text",
    "template_clusters",
    "compression_ratios",
]

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish word/number/punct splitter (GPT-2-style coarse classes,
# public regex idiom): words, numbers, punctuation runs.
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")
_WORD_RE = re.compile(r"[A-Za-z']+")

# Tiny per-language stopword profiles (language-ID heuristic: stopword
# hits + character frequencies; standard public n-gram/stopword
# approach, e.g. Cavnar & Trenkle '94).
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "was", "with", "his", "this", "are", "you", "not", "be"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von",
           "den", "im", "zu", "sich", "auf", "es", "ich"},
    "fr": {"le", "la", "les", "et", "des", "est", "une", "dans", "que",
           "pour", "qui", "pas", "sur", "au", "ce", "il"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "en", "que", "por",
           "con", "para", "del", "se", "no", "un"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document token counts: whitespace tokens (``\\S+``, the SQL-
    checkable definition) and a BPE-ish sub-word proxy count."""
    texts = batch.column(text_col).to_pylist()
    ws = [len(_TOKEN_RE.findall(t)) if t else 0 for t in texts]
    bpe = [len(_BPE_RE.findall(t)) if t else 0 for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(ws, pa.int64()),
        "n_bpe_tokens": pa.array(bpe, pa.int64()),
    })


def token_counts(docs_ds):
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pyarrow")


def _score_lang(text: str) -> str:
    words = _WORD_RE.findall(text.lower())
    if not words:
        return "und"
    best_lang, best = "und", 0.0
    for lang, stops in _STOPWORDS.items():
        hits = sum(1 for w in words if w in stops)
        score = hits / len(words)
        if score > best:
            best_lang, best = lang, score
    return best_lang if best > 0.0 else "und"


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    preds = [_score_lang(t) if t else "und" for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "lang_pred": pa.array(preds, pa.string()),
    })


def lang_id(docs_ds):
    """Stopword-profile language ID -> (doc_id, lang_pred)."""
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        lang_id_batch, batch_format="pyarrow")


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality signals per document: length, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio, and a composite
    0-1 score (C4/Gopher-style filters, public recipes)."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    filled = pc.fill_null(col, "")
    # Character-class counts run as vectorized RE2 kernels over the
    # whole column (no per-character Python).  RE2's ``\w`` is ASCII;
    # these are heuristic quality signals, documented as such.
    n_chars = pc.utf8_length(filled).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_punct = pc.count_substring_regex(filled, r"[^\w\s]").to_numpy(
        zero_copy_only=False).astype(np.float64)
    n_upper = pc.count_substring_regex(filled, r"\p{Lu}").to_numpy(
        zero_copy_only=False).astype(np.float64)
    safe_len = np.maximum(n_chars, 1).astype(np.float64)
    punct_ratio = n_punct / safe_len
    upper_ratio = n_upper / safe_len

    # Word-level signals need the token stream (stopword membership is
    # exact-match per extracted word); the per-row findall is a single
    # compiled-regex C scan per document.
    texts = filled.to_pylist()
    n = len(texts)
    stop_ratio = np.zeros(n, np.float64)
    mean_word_len = np.zeros(n, np.float64)
    for i, t in enumerate(texts):
        if not t:
            continue
        words = _WORD_RE.findall(t.lower())
        if words:
            stop_ratio[i] = sum(1 for w in words if w in _STOPWORDS["en"]) / len(words)
            mean_word_len[i] = sum(map(len, words)) / len(words)
    score = (
        np.clip(n_chars / 500.0, 0, 1) * 0.3
        + np.clip(1.0 - punct_ratio * 4.0, 0, 1) * 0.2
        + np.clip(stop_ratio * 5.0, 0, 1) * 0.3
        + np.clip(1.0 - upper_ratio * 3.0, 0, 1) * 0.2
    )
    score[n_chars == 0] = 0.0  # empty documents are unusable, not "clean"
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pa.array(n_chars),
        "punct_ratio": pa.array(punct_ratio),
        "stopword_ratio": pa.array(stop_ratio),
        "upper_ratio": pa.array(upper_ratio),
        "mean_word_len": pa.array(mean_word_len),
        "quality": pa.array(score),
    })


def quality_scores(docs_ds):
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow")


# Gopher rules (Rae et al. 2021, "Scaling Language Models" — their
# public quality-filter recipe) use this fixed 8-word English
# stop-list for the "contains stop words" rule.
_GOPHER_STOPWORDS = frozenset(
    ("the", "be", "to", "of", "and", "that", "have", "with"))
_LOWER_WORD_RE = re.compile(r"[a-z']+")


def gopher_rules_batch(batch: pa.Table, text_col: str = "text", *,
                       min_words: int = 20, max_words: int = 100_000,
                       min_mwl_x10: int = 38, max_mwl_x10: int = 100,
                       min_stopwords: int = 2) -> pa.Table:
    """Gopher-style quality rules, INTEGER-EXACT so the keep decision
    is bit-identical to the SQL oracle:

    - word count (``\\S+`` tokens) in ``[min_words, max_words]``;
    - mean word length in ``[min_mwl_x10/10, max_mwl_x10/10]``,
      compared cross-multiplied (``word_chars*10 >= 38*n_words``) so
      no float boundary exists;
    - at least ``min_stopwords`` occurrences of the fixed Gopher
      8-word stop-list (words = ``[a-z']+`` over the lowercased
      text).

    ``word_chars`` (total characters inside ``\\S+`` tokens) is
    computed without materializing tokens: it equals non-whitespace
    character count, one vectorized RE2 kernel over the column.
    Emits every document with its integer signals and the ``kept``
    verdict (filter downstream with ``kept`` to drop)."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    filled = pc.fill_null(col, "")
    n_words = pc.count_substring_regex(filled, r"\S+").to_numpy(
        zero_copy_only=False).astype(np.int64)
    word_chars = (
        pc.utf8_length(filled).to_numpy(zero_copy_only=False)
        - pc.count_substring_regex(filled, r"\s").to_numpy(
            zero_copy_only=False)).astype(np.int64)
    texts = filled.to_pylist()
    n_stop = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        if t:
            n_stop[i] = sum(
                1 for w in _LOWER_WORD_RE.findall(t.lower())
                if w in _GOPHER_STOPWORDS)
    kept = ((n_words >= min_words) & (n_words <= max_words)
            & (word_chars * 10 >= min_mwl_x10 * n_words)
            & (word_chars * 10 <= max_mwl_x10 * n_words)
            & (n_stop >= min_stopwords))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_words": pa.array(n_words),
        "word_chars": pa.array(word_chars),
        "n_stop": pa.array(n_stop),
        "kept": pa.array(kept),
    })


def gopher_rules_filter(docs_ds, *, text_col: str = "text", **rules):
    """Per-document Gopher quality-rule signals + keep verdict.
    Zero shuffle: one vectorized/regex-scan ``map_batches`` stage."""
    return docs_ds.select_columns(["doc_id", text_col]).map_batches(
        lambda t: gopher_rules_batch(t, text_col, **rules),
        batch_format="pyarrow")


_FP_BASE = 1000003
# Arithmetic is mod 2^64 (native uint64 wrap-around), which makes the
# whole rolling-hash computable as vectorized prefix ops: the base is
# odd, hence invertible mod 2^64.
_FP_INV = pow(_FP_BASE, -1, 1 << 64)


def _rolling_fingerprint(text: str, window: int = 64) -> int:
    """Deterministic document fingerprint: max of a Rabin-Karp rolling
    hash over byte windows (winnowing-style selection, Schleimer et al.
    SIGMOD'03 — public algorithm).

    Fully vectorized: window hash H_i = B^(w-1+i) * (P_{i+w-1} - P_{i-1})
    where P is the prefix sum of b_j * B^(-j) — cumprod/cumsum in
    uint64, no per-byte Python."""
    data = np.frombuffer(text.encode("utf-8", "replace"), dtype=np.uint8)
    n = int(data.size)
    if n == 0:
        return 0
    w = min(window, n)
    inv = np.uint64(_FP_INV)
    inv_pows = np.empty(n, np.uint64)
    inv_pows[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, inv, np.uint64), out=inv_pows[1:])
    prefix = np.cumsum(data.astype(np.uint64) * inv_pows, dtype=np.uint64)
    s = prefix[w - 1:].copy()
    s[1:] -= prefix[: n - w]
    b_pows = np.empty(n - w + 1, np.uint64)
    b_pows[0] = np.uint64(pow(_FP_BASE, w - 1, 1 << 64))
    if n - w > 0:
        np.cumprod(np.full(n - w, _FP_BASE, np.uint64), out=b_pows[1:])
        b_pows[1:] *= b_pows[0]
    return int((s * b_pows).max())


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    fps = [_rolling_fingerprint(t) if t else 0 for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(fps, pa.uint64()),
    })


def fingerprints(docs_ds):
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow")


def _doc_repetition(text: str) -> tuple:
    """Repetition signals for ONE document (Gopher-style repetition
    filters — Rae et al. 2021 §A1.1, public recipe; definitions below
    are the documented exact semantics of THIS implementation):

    - ``n_lines`` / ``n_dup_lines``: ``text.split('\\n')`` lines; dup
      count is occurrences beyond first of each distinct line.
    - ``dup_line_char_frac``: characters of those beyond-first line
      occurrences / total line characters.
    - ``top_2gram_char_frac``: characters covered by the most frequent
      word 2-gram (count * chars-in-gram) / total word characters.
    - ``dup_10gram_char_frac``: fraction of word characters covered by
      any word belonging to at least one duplicated (count >= 2)
      overlapping 10-gram.

    Single linear pass per doc (Counter + coverage mask) over the
    compiled-regex token stream."""
    from collections import Counter

    lines = text.split("\n")
    n_lines = len(lines)
    line_counts = Counter(lines)
    n_dup_lines = n_lines - len(line_counts)
    total_line_chars = sum(map(len, lines))
    dup_line_chars = sum(len(ln) * (c - 1)
                         for ln, c in line_counts.items() if c > 1)
    dup_line_char_frac = (dup_line_chars / total_line_chars
                          if total_line_chars else 0.0)

    words = _WORD_RE.findall(text.lower())
    word_lens = np.array([len(w) for w in words], np.int64)
    total_word_chars = int(word_lens.sum())

    top_2gram_char_frac = 0.0
    if len(words) >= 2 and total_word_chars:
        grams2 = Counter(zip(words, words[1:]))
        (w1, w2), cnt = max(
            grams2.items(),
            key=lambda kv: (kv[1], -len(kv[0][0]) - len(kv[0][1])))
        top_2gram_char_frac = min(
            1.0, cnt * (len(w1) + len(w2)) / total_word_chars)

    dup_10gram_char_frac = 0.0
    n = 10
    if len(words) >= n and total_word_chars:
        grams = [tuple(words[i:i + n]) for i in range(len(words) - n + 1)]
        counts = Counter(grams)
        covered = np.zeros(len(words), np.bool_)
        for i, g in enumerate(grams):
            if counts[g] > 1:
                covered[i:i + n] = True
        dup_10gram_char_frac = float(
            word_lens[covered].sum() / total_word_chars)

    return (n_lines, n_dup_lines, dup_line_char_frac,
            top_2gram_char_frac, dup_10gram_char_frac)


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    rows = [_doc_repetition(t or "") for t in texts]
    cols = list(zip(*rows)) if rows else ([], [], [], [], [])
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_lines": pa.array(cols[0], pa.int64()),
        "n_dup_lines": pa.array(cols[1], pa.int64()),
        "dup_line_char_frac": pa.array(cols[2], pa.float64()),
        "top_2gram_char_frac": pa.array(cols[3], pa.float64()),
        "dup_10gram_char_frac": pa.array(cols[4], pa.float64()),
    })


def repetition_scores(docs_ds):
    """Per-document repetition signals (see :func:`_doc_repetition`)
    -> (doc_id, n_lines, n_dup_lines, dup_line_char_frac,
    top_2gram_char_frac, dup_10gram_char_frac)."""
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        repetition_batch, batch_format="pyarrow")


def term_doc_frequency(docs_ds, text_col: str = "text"):
    """(term, df) document frequencies of the lowercased word
    vocabulary -> Dataset.

    The combiner shape: each block emits its DISTINCT (term,
    per-block df) partials via one ``np.unique`` pass, so the
    ``groupby(term)`` shuffle is bounded by distinct-terms-per-block
    (Zipf makes that a small multiple of the vocabulary), never by
    token count."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # keep only docs with >=1 term: np.unique([]) is a FLOAT64
        # empty array, and a block of all-wordless docs (whitespace-
        # only text exists at web scale) would concatenate to float64
        # and fail the string cast
        per_doc = [
            u for t in batch.column(text_col).to_pylist() if t
            for u in (np.unique(_WORD_RE.findall(t.lower())),)
            if u.size
        ]
        if not per_doc:
            return pa.table({"term": pa.array([], pa.string()),
                             "__df": pa.array([], pa.int64())})
        terms, counts = np.unique(np.concatenate(per_doc),
                                  return_counts=True)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "__df": pa.array(counts, pa.int64())})

    out = (docs_ds.select_columns([text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("term").aggregate(Sum("__df")))
    return out.map_batches(
        lambda t: t.rename_columns(
            ["df" if c == "sum(__df)" else c for c in t.column_names]),
        batch_format="pyarrow")


def tfidf_top_terms(docs_ds, k: int = 5, *, text_col: str = "text",
                    id_col: str = "doc_id", mode: str = "auto",
                    broadcast_vocab_limit: int = 4_000_000,
                    num_partitions: int = 64):
    """Top-k characteristic terms per document by tf-idf ->
    ``(doc_id, term, tf, score)``, ties broken by ascending term.

    idf = ln(N / df); score = tf * idf (raw counts — the classic
    formulation, deterministic given the corpus).

    Scale shape: document frequencies come from
    :func:`term_doc_frequency` (combiner-bounded shuffle), kept
    distributed (``materialize()`` of narrow (term, df) rows — never
    the corpus).  Two execution plans, selected by ``mode``:

    - ``broadcast`` — fold the vocabulary into a (sorted term-hash,
      df) array pair — 16 bytes per distinct term, fine up to ~10M
      vocab — and score with one streaming ``np.searchsorted`` probe
      pass.  Zero extra shuffles, but the fold lands on the driver.
    - ``join`` — the web-scale path (typo/URL vocabularies exceed any
      broadcast): explode (doc_id, term, tf) rows, co-partition them
      with the (term, df) rows by term hash, attach df with a
      segmented run-scan join inside each partition (sort by (term,
      side), :func:`torray.ops.window._segmented_last_index` — no
      Python call per term), then one more run-scan partitioned by
      doc hash for the per-document top-k cut.  Vocabulary never
      touches the driver.
    - ``auto`` (default) — one ``count()`` of the materialized df
      table picks: broadcast iff vocab <= ``broadcast_vocab_limit``.

    Both plans produce bit-identical scores (same double-precision
    ``tf * ln(N/df)``) and the same ascending-term tie rule; plan
    equivalence is test-verified."""
    import ray

    df_ds = term_doc_frequency(docs_ds, text_col).materialize()
    n_docs = max(docs_ds.count(), 1)
    if mode == "auto":
        mode = ("broadcast"
                if df_ds.count() <= broadcast_vocab_limit else "join")
    if mode == "join":
        return _tfidf_join(docs_ds, df_ds, n_docs, k,
                           text_col=text_col, id_col=id_col,
                           num_partitions=num_partitions)
    if mode != "broadcast":
        raise ValueError(f"unknown tfidf mode {mode!r}")

    df_parts = []
    from torray.ops.dedup import fnv1a64_strings

    for batch in df_ds.iter_batches(batch_format="pyarrow"):
        hs = fnv1a64_strings(batch.column("term"))
        df_parts.append((hs, batch.column("df").to_numpy(
            zero_copy_only=False).astype(np.int64)))
    if df_parts:
        all_h = np.concatenate([p[0] for p in df_parts])
        all_df = np.concatenate([p[1] for p in df_parts])
        order = np.argsort(all_h)
        vocab_h, vocab_df = all_h[order], all_df[order]
    else:
        vocab_h = np.empty(0, np.uint64)
        vocab_df = np.empty(0, np.int64)
    vocab_ref = ray.put((vocab_h, vocab_df))

    def score(batch: pa.Table) -> pa.Table:
        vh, vdf = ray.get(vocab_ref)
        ids_out, terms_out, tf_out, sc_out = [], [], [], []
        for did, t in zip(
                batch.column(id_col).to_pylist(),
                batch.column(text_col).to_pylist()):
            words = _WORD_RE.findall((t or "").lower())
            if not words:
                continue
            terms, tf = np.unique(words, return_counts=True)
            hs = fnv1a64_strings(pa.array(terms, pa.string()))
            pos = np.searchsorted(vh, hs)
            pos = pos.clip(0, max(len(vh) - 1, 0))
            df = np.where((len(vh) > 0) & (vh[pos] == hs),
                          vdf[pos], n_docs)
            sc = tf * np.log(n_docs / df)
            order = np.lexsort((terms, -sc))[:k]
            ids_out.extend([did] * len(order))
            terms_out.extend(terms[order])
            tf_out.extend(tf[order])
            sc_out.extend(sc[order])
        return pa.table({
            id_col: pa.array(ids_out, pa.int64()),
            "term": pa.array(terms_out, pa.string()),
            "tf": pa.array(tf_out, pa.int64()),
            "score": pa.array(sc_out, pa.float64()),
        })

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def _tfidf_join(docs_ds, df_ds, n_docs: int, k: int, *, text_col: str,
                id_col: str, num_partitions: int):
    """Join-formulation tf-idf (``tfidf_top_terms(mode='join')``):
    the vocabulary never leaves the cluster.

    (doc_id, term, tf) rows and (term, df) rows co-partition by term
    hash; a segmented run-scan join (sort by (term, side), df rows
    first) attaches df to every tf row with no Python call per term;
    a second run-scan partitioned by doc hash applies the per-document
    top-k cut.  Score arithmetic and tie rule are identical to the
    broadcast plan (equivalence is test-verified)."""
    from torray.ops.dedup import _mix64, fnv1a64_strings
    from torray.ops.window import _segmented_last_index

    npart = np.uint64(num_partitions)
    mid_schema = pa.schema([
        (id_col, pa.int64()), ("term", pa.string()),
        ("tf", pa.int64()), ("__df", pa.int64()),
        ("__side", pa.int8()), ("__part", pa.int64()),
    ])

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        terms_l, tf_l = [], []
        cnt = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            words = _WORD_RE.findall((t or "").lower())
            if not words:
                continue
            terms, tf = np.unique(words, return_counts=True)
            terms_l.append(terms)
            tf_l.append(tf)
            cnt[i] = len(terms)
        if not terms_l:
            return mid_schema.empty_table()
        all_terms = pa.array(np.concatenate(terms_l), pa.string())
        n = len(all_terms)
        part = (fnv1a64_strings(all_terms) % npart).astype(np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, cnt), pa.int64()),
            "term": all_terms,
            "tf": pa.array(np.concatenate(tf_l).astype(np.int64)),
            "__df": pa.nulls(n, pa.int64()),
            "__side": pa.array(np.ones(n, np.int8), pa.int8()),
            "__part": pa.array(part, pa.int64()),
        }).cast(mid_schema)

    def df_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return mid_schema.empty_table()
        part = (fnv1a64_strings(batch.column("term"))
                % npart).astype(np.int64)
        return pa.table({
            id_col: pa.nulls(n, pa.int64()),
            "term": batch.column("term"),
            "tf": pa.nulls(n, pa.int64()),
            "__df": batch.column("df").cast(pa.int64()),
            "__side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "__part": pa.array(part, pa.int64()),
        }).cast(mid_schema)

    scored_schema = pa.schema([
        (id_col, pa.int64()), ("term", pa.string()),
        ("tf", pa.int64()), ("score", pa.float64()),
        ("__dpart", pa.int64()),
    ])

    def join_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return scored_schema.empty_table()
        term = np.asarray(group.column("term").to_pylist())
        side = group.column("__side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, term))
        sides = side[order]
        ts_ = term[order]
        run_id = np.cumsum(np.concatenate(
            ([True], ts_[1:] != ts_[:-1]))) - 1
        last_df = _segmented_last_index(sides == 0, run_id)
        tpos = np.flatnonzero(sides == 1)
        match = last_df[tpos]
        dfv = pc.fill_null(group.column("__df"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # every corpus term has a df row; the n_docs fallback mirrors
        # the broadcast plan's unknown-term behavior exactly
        df_m = np.where(match >= 0,
                        dfv[order[np.clip(match, 0, None)]], n_docs)
        take = order[tpos]
        tfv = pc.fill_null(group.column("tf"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)[take]
        ids = pc.fill_null(group.column(id_col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)[take]
        sc = tfv * np.log(n_docs / df_m)
        dpart = (_mix64(ids) % npart).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "term": pa.array(term[take], pa.string()),
            "tf": pa.array(tfv, pa.int64()),
            "score": pa.array(sc, pa.float64()),
            "__dpart": pa.array(dpart, pa.int64()),
        })

    out_cols = [id_col, "term", "tf", "score"]

    def topk_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.schema(
                [f for f in scored_schema if f.name != "__dpart"]
            ).empty_table()
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        sc = group.column("score").to_numpy(zero_copy_only=False)
        terms = np.asarray(group.column("term").to_pylist())
        order = np.lexsort((terms, -sc, ids))
        ids_s = ids[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], ids_s[1:] != ids_s[:-1])))
        lens = np.diff(np.append(starts, len(ids_s)))
        rank = np.arange(len(ids_s)) - np.repeat(starts, lens)
        keep = order[rank < k]
        return group.take(pa.array(np.sort(keep), pa.int64())
                          ).select(out_cols)

    tagged = (docs_ds.select_columns([id_col, text_col])
              .map_batches(explode, batch_format="pyarrow")
              .union(df_ds.map_batches(df_rows,
                                       batch_format="pyarrow")))
    return (tagged.groupby("__part")
            .map_groups(join_partition, batch_format="pyarrow")
            .groupby("__dpart")
            .map_groups(topk_partition, batch_format="pyarrow"))


# Char classes counted by the quality heuristics, as RE2 kernels —
# fully vectorized (no Python per row) and each SQL-expressible via
# len(regexp_extract_all(..)), which is what makes this the
# oracle-checkable core under quality_scores' composite ratios.
_CHAR_CLASSES = (
    ("n_alpha", "[a-zA-Z]"),
    ("n_digit", "[0-9]"),
    ("n_space", r"\s"),
    ("n_punct", r"[^\sa-zA-Z0-9]"),
)


def char_class_counts_batch(batch: pa.Table,
                            text_col: str = "text") -> pa.Table:
    """Per-document character-class counts via ``pc.count_substring_regex``
    (Arrow RE2 kernels — zero-copy in, vectorized scan, no Python per
    row)."""
    col = batch.column(text_col)
    out = {"doc_id": batch.column("doc_id"),
           "n_chars_utf8": pc.cast(pc.utf8_length(col), pa.int64())}
    for name, pat in _CHAR_CLASSES:
        out[name] = pc.cast(pc.count_substring_regex(col, pat), pa.int64())
    return pa.table(out)


def char_class_counts(docs_ds, text_col: str = "text"):
    """Dataset of per-document char-class counts (alpha / digit /
    whitespace / punct / total), the integer substrate of
    :func:`quality_scores` — scale shape: column-pruned read, one
    stateless vectorized map, no shuffle."""
    return docs_ds.select_columns(["doc_id", text_col]).map_batches(
        char_class_counts_batch, batch_format="pyarrow")


# PII-ish scrub rules: (output count column, RE2 pattern, replacement).
# RE2 is the regex engine on BOTH sides of the correctness gate (Arrow
# binds RE2; DuckDB's regexp_replace is RE2 too), so one pattern string
# means one semantics.
_SCRUB_RULES = (
    ("n_email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("n_ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_normalize_batch(batch: pa.Table, text_col: str = "text",
                          rules=_SCRUB_RULES) -> pa.Table:
    """One vectorized pass of PII scrubbing + text normalization:
    count-then-replace each rule's matches (emails, IPv4s) with a
    placeholder token, lowercase, collapse runs of whitespace to one
    space, strip the ends.  All Arrow RE2 kernels — zero Python per
    row.  Emits ``(doc_id, clean_text, n_email, n_ipv4, ...)``."""
    col = batch.column(text_col)
    out = {"doc_id": batch.column("doc_id")}
    clean = col
    for name, pat, repl in rules:
        out[name] = pc.cast(pc.count_substring_regex(clean, pat),
                            pa.int64())
        clean = pc.replace_substring_regex(clean, pat, repl)
    clean = pc.utf8_lower(clean)
    clean = pc.replace_substring_regex(clean, r"\s+", " ")
    clean = pc.replace_substring_regex(clean, "^ | $", "")
    out["clean_text"] = clean
    return pa.table(out)


def scrub_normalize(docs_ds, *, text_col: str = "text"):
    """Dataset of scrubbed + normalized documents — the standard
    pre-tokenization hygiene map of an LLM data pipeline (redact
    emails/IPs, casefold, canonicalize whitespace).  Scale shape:
    column-pruned read, ONE stateless vectorized ``map_batches``, no
    shuffle, no state; the regexes are RE2 both here and in the SQL
    oracle so the driver hash-checks the transform exactly."""
    return docs_ds.select_columns(["doc_id", text_col]).map_batches(
        scrub_normalize_batch, batch_format="pyarrow")


def paragraph_dedup(ds, *, id_col: str = "doc_id",
                    text_col: str = "text", sep: str = "\n",
                    min_count: int = 2, out_col: str = "clean_text",
                    mode: str = "auto", bad_cap: int = 5_000_000):
    """C4-style repeated-paragraph removal: split each document into
    paragraphs on ``sep``, count every distinct paragraph across the
    WHOLE corpus, and delete each paragraph occurring ``>= min_count``
    times from every document (boilerplate — navigation, cookie
    banners, license blurbs — repeats across pages; prose does not).
    Returns ``(id_col, out_col)`` with surviving paragraphs rejoined
    by ``sep`` in their original order; a fully-boilerplate document
    survives as an empty string (the caller filters on length).

    Scale shape: the count pass collapses each block to DISTINCT
    (paragraph, n) partials via Arrow ``value_counts`` (repeats never
    leave their block), then ONE ``groupby(paragraph)`` sum — the
    shuffle carries distinct paragraph strings once each, the
    information-theoretic floor for an exact cross-corpus count.  The
    over-frequent survivors (a tiny fraction: only text that actually
    repeats) then flow through one of two plans, selected by ``mode``:

    - ``'broadcast'`` — collect the bad set once, ``ray.put``, and
      rewrite every document with pure Arrow kernels
      (``split_pattern`` -> ``is_in`` -> offset rebuild ->
      ``binary_join``), zero additional shuffle.  Right when the bad
      set is small (the common case: only text that repeats).
    - ``'join'`` — nothing folds on the driver: documents explode to
      (doc, idx, paragraph) rows, the bad flag attaches via a
      co-partitioned run-scan on hash(paragraph), surviving rows
      reassemble with a doc-hash run-scan (lexsort + offset
      ``binary_join`` — no Python call per doc), and fully-scrubbed
      documents are recovered by an id run-scan anti-join so they
      still emit ``''``.  Three extra narrow shuffles; the plan for
      boilerplate-heavy corpora where the bad set itself is huge.
    - ``'auto'`` (default) — one ``count()`` of the bad set picks:
      broadcast iff <= ``bad_cap``.

    Plans are row-identical (test-verified).
    """
    import ray
    from ray.data.aggregate import Sum

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"para": pa.array([], pa.string()),
                             "__n": pa.array([], pa.int64())})
        paras = pc.split_pattern(t.column(text_col), sep)
        flat = pc.list_flatten(paras)
        vc = flat.combine_chunks().value_counts()
        return pa.table({"para": vc.field("values"),
                         "__n": vc.field("counts").cast(pa.int64())})

    counts = (ds.select_columns([text_col])
              .map_batches(count_partial, batch_format="pyarrow")
              .groupby("para").aggregate(Sum("__n")))

    def over_threshold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"para": pa.array([], pa.string())})
        mask = pc.greater_equal(t.column("sum(__n)"), min_count)
        return t.filter(mask).select(["para"])

    bad_ds = counts.map_batches(over_threshold,
                                batch_format="pyarrow")
    from torray.ops.window import _ds_field_type

    id_type = _ds_field_type(ds, id_col)
    if mode == "auto":
        bad_ds = bad_ds.materialize()
        mode = "broadcast" if bad_ds.count() <= bad_cap else "join"
    if mode == "join":
        return _paragraph_dedup_join(ds, bad_ds, id_col=id_col,
                                     text_col=text_col, sep=sep,
                                     out_col=out_col, id_type=id_type)
    if mode != "broadcast":
        raise ValueError(f"unknown mode {mode!r}")

    bad_tbls = [t for t in ray.get(bad_ds.to_arrow_refs())
                if t.num_rows]
    bad = (pa.concat_tables(bad_tbls).column("para").combine_chunks()
           if bad_tbls else pa.chunked_array([pa.array([], pa.string())]))
    if len(bad) > bad_cap:
        raise ValueError(
            f"{len(bad)} over-frequent paragraphs > bad_cap {bad_cap}: "
            "broadcast would not be small (use mode='join')")
    bad_ref = ray.put(bad)

    def rewrite(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             out_col: pa.array([], pa.string())})
        bad_set = ray.get(bad_ref)
        paras = pc.split_pattern(t.column(text_col), sep).combine_chunks()
        flat = pc.list_flatten(paras)
        keep = pc.invert(pc.is_in(flat, value_set=bad_set))
        keep_np = keep.to_numpy(zero_copy_only=False)
        # rebuild list offsets over the kept paragraphs only
        lens = pc.list_value_length(paras).to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
        if len(flat):
            # reduceat needs indices < len; empty-run starts can sit at
            # the array end — clamp, then zero those runs' counts below
            kept_per_doc = np.add.reduceat(
                keep_np.astype(np.int64),
                np.minimum(starts, len(flat) - 1))
        else:
            kept_per_doc = np.zeros(len(lens), np.int64)
        kept_per_doc[lens == 0] = 0  # reduceat repeats on empty runs
        offsets = np.concatenate(([0], np.cumsum(kept_per_doc)))
        kept_list = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat.filter(keep))
        return pa.table({
            id_col: t.column(id_col),
            out_col: pc.binary_join(kept_list, sep),
        })

    return (ds.select_columns([id_col, text_col])
            .map_batches(rewrite, batch_format="pyarrow"))



def _paragraph_dedup_join(ds, bad_ds, *, id_col: str, text_col: str,
                          sep: str, out_col: str, id_type,
                          num_partitions: int = 64):
    """The driver-free plan of :func:`paragraph_dedup` (``mode=
    'join'``): bad-paragraph flags attach via a hash(paragraph)
    run-scan, docs reassemble via a hash(doc) run-scan, and
    fully-scrubbed docs are recovered with an id run-scan anti-join —
    three narrow shuffles, no collected state anywhere."""
    from torray.ops.dedup import _mix64, fnv1a64_strings
    from torray.ops.window import _hash_col_np

    npart = np.uint64(num_partitions)
    mid = pa.schema([(id_col, pa.int64()), ("__pidx", pa.int64()),
                     ("para", pa.string()), ("__side", pa.int8()),
                     ("__part", pa.int64())])

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mid.empty_table()
        paras = pc.split_pattern(t.column(text_col),
                                 sep).combine_chunks()
        flat = pc.list_flatten(paras)
        lens = pc.list_value_length(paras).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(ids, lens)
        starts = np.cumsum(lens) - lens
        pidx = (np.arange(len(flat), dtype=np.int64)
                - np.repeat(starts, lens))
        part = (fnv1a64_strings(flat) % npart).astype(np.int64)
        n = len(flat)
        return pa.table({
            id_col: pa.array(doc_ids, pa.int64()),
            "__pidx": pa.array(pidx, pa.int64()),
            "para": flat,
            "__side": pa.array(np.ones(n, np.int8), pa.int8()),
            "__part": pa.array(part, pa.int64()),
        }).cast(mid)

    def tag_bad(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mid.empty_table()
        col = t.column("para").combine_chunks()
        part = (fnv1a64_strings(col) % npart).astype(np.int64)
        n = t.num_rows
        return pa.table({
            id_col: pa.nulls(n, pa.int64()),
            "__pidx": pa.nulls(n, pa.int64()),
            "para": col,
            "__side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "__part": pa.array(part, pa.int64()),
        }).cast(mid)

    survivor_schema = pa.schema([
        (id_col, pa.int64()), ("__pidx", pa.int64()),
        ("para", pa.string()), ("__dpart", pa.int64())])

    def flag_scan(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return survivor_schema.empty_table()
        ks = np.asarray(group.column("para").to_pylist())
        side = group.column("__side").to_numpy(zero_copy_only=False)
        order = np.argsort(ks, kind="stable")
        ks_s, side_s = ks[order], side[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], ks_s[1:] != ks_s[:-1])))
        lens = np.diff(np.append(starts, len(ks_s)))
        run_has_bad = np.add.reduceat(
            (side_s == 0).astype(np.int64), starts) > 0
        bad_row = np.repeat(run_has_bad, lens)
        keep = order[(side_s == 1) & ~bad_row]
        take = pa.array(np.sort(keep), pa.int64())
        ids = group.column(id_col).take(take)
        dpart = (_mix64(ids.combine_chunks().cast(pa.int64())
                        .to_numpy(zero_copy_only=False))
                 % npart).astype(np.int64)
        return pa.table({
            id_col: ids,
            "__pidx": group.column("__pidx").take(take),
            "para": group.column("para").take(take),
            "__dpart": pa.array(dpart, pa.int64()),
        }).cast(survivor_schema)

    survivors = (ds.select_columns([id_col, text_col])
                 .map_batches(explode, batch_format="pyarrow")
                 .union(bad_ds.map_batches(tag_bad,
                                           batch_format="pyarrow"))
                 .groupby("__part")
                 .map_groups(flag_scan, batch_format="pyarrow"))

    out_schema = pa.schema([(id_col, pa.int64()),
                            (out_col, pa.string())])

    def reassemble(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        pidx = group.column("__pidx").to_numpy(zero_copy_only=False)
        order = np.lexsort((pidx, ids))
        ids_s = ids[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], ids_s[1:] != ids_s[:-1])))
        lens = np.diff(np.append(starts, len(ids_s)))
        flat = group.column("para").take(
            pa.array(order, pa.int64())).combine_chunks()
        doc_list = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(lens))),
                     pa.int32()), flat)
        return pa.table({
            id_col: pa.array(ids_s[starts], pa.int64()),
            out_col: pc.binary_join(doc_list, sep),
        }).cast(out_schema)

    rebuilt = (survivors.groupby("__dpart")
               .map_groups(reassemble, batch_format="pyarrow")
               .materialize())

    # anti-join: doc ids with NO surviving paragraph emit ''
    anti_mid = pa.schema([(id_col, pa.int64()),
                          ("__side", pa.int8()),
                          ("__part", pa.int64())])

    def tag_ids(side_val: int):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return anti_mid.empty_table()
            ids = t.column(id_col).cast(pa.int64())
            part = (_mix64(ids.to_numpy(zero_copy_only=False))
                    % npart).astype(np.int64)
            return pa.table({
                id_col: ids,
                "__side": pa.array(
                    np.full(t.num_rows, side_val, np.int8), pa.int8()),
                "__part": pa.array(part, pa.int64()),
            }).cast(anti_mid)
        return f

    def anti_scan(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        side = group.column("__side").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids_s, side_s = ids[order], side[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], ids_s[1:] != ids_s[:-1])))
        has_rebuilt = np.add.reduceat(
            (side_s == 0).astype(np.int64), starts) > 0
        missing = ids_s[starts][~has_rebuilt]
        return pa.table({
            id_col: pa.array(missing, pa.int64()),
            out_col: pa.array([""] * len(missing), pa.string()),
        }).cast(out_schema)

    empties = (ds.select_columns([id_col])
               .map_batches(tag_ids(1), batch_format="pyarrow")
               .union(rebuilt.select_columns([id_col])
                      .map_batches(tag_ids(0), batch_format="pyarrow"))
               .groupby("__part")
               .map_groups(anti_scan, batch_format="pyarrow"))
    return rebuilt.union(empties)


def chunk_words(ds, *, id_col: str = "doc_id", text_col: str = "text",
                words_per_chunk: int = 4, sep: str = "\n"):
    """Re-paragraph space-tokenized text into fixed ``words_per_chunk``
    word chunks joined by ``sep`` (the deterministic paragraph deriver
    for corpora whose documents carry no natural paragraph breaks —
    pairs with :func:`paragraph_dedup`).  Returns ``(id_col,
    text_col)`` with the rewritten text; the last chunk of a document
    may be shorter.

    Fully vectorized (one stateless map, zero shuffle): words flatten
    once, chunk boundaries come from integer offset arithmetic
    (``doc_start + w*i`` clamped at the doc end), and both rejoins are
    Arrow ``binary_join`` kernels — no Python loop over documents or
    chunks."""
    w = int(words_per_chunk)
    if w <= 0:
        raise ValueError("words_per_chunk must be positive")

    from torray.ops.window import _ds_field_type

    id_type = _ds_field_type(ds, id_col)

    def rechunk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             text_col: pa.array([], pa.string())})
        words = pc.split_pattern(t.column(text_col), " ").combine_chunks()
        flat = pc.list_flatten(words)
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_ends = np.cumsum(lens)
        doc_starts = doc_ends - lens
        chunks_per_doc = -(-lens // w)  # ceil; 0 only if lens == 0
        total = int(chunks_per_doc.sum())
        # per-chunk global index within its doc, then end offsets
        first_chunk = np.cumsum(chunks_per_doc) - chunks_per_doc
        i_in_doc = (np.arange(total, dtype=np.int64)
                    - np.repeat(first_chunk, chunks_per_doc))
        ends = np.minimum(
            np.repeat(doc_starts, chunks_per_doc) + w * (i_in_doc + 1),
            np.repeat(doc_ends, chunks_per_doc))
        chunk_list = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], ends)), pa.int32()), flat)
        chunk_strs = pc.binary_join(chunk_list, " ")
        d_offs = np.concatenate(([0], np.cumsum(chunks_per_doc)))
        doc_list = pa.ListArray.from_arrays(
            pa.array(d_offs, pa.int32()), chunk_strs)
        return pa.table({id_col: t.column(id_col),
                         text_col: pc.binary_join(doc_list, sep)})

    return (ds.select_columns([id_col, text_col])
            .map_batches(rechunk, batch_format="pyarrow"))


def _count_attach(left_ds, counts_ds, key: str, out_name: str,
                  left_fields: list, num_partitions: int = 64):
    """Co-partitioned run-scan attach of ``counts_ds``'s summed count
    (``(key, sum(__n))`` rows, e.g. a ``groupby(...).aggregate(Sum)``
    output) to every ``left_ds`` row by the string ``key`` column —
    the distributed alternative to folding a vocabulary on the driver:
    both sides hash-partition on fnv1a64(key), one segmented
    last-index scan per partition pairs each left row with its count.
    Missing keys attach 1 (guards log(0); corpus-trained counts never
    miss).  Shared by :func:`bigram_lm_scores` (two attaches) and
    :func:`pmi_collocations`."""
    from torray.ops.dedup import fnv1a64_strings
    from torray.ops.window import _segmented_last_index

    npart = np.uint64(num_partitions)
    mid = pa.schema(left_fields + [
        (out_name, pa.int64()), ("__side", pa.int8()),
        ("__part", pa.int64())])
    left_names = [f[0] for f in left_fields]

    def tag_left(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mid.empty_table()
        part = (fnv1a64_strings(t.column(key).combine_chunks())
                % npart).astype(np.int64)
        cols = {nm: t.column(nm) for nm in left_names}
        cols[out_name] = pa.nulls(t.num_rows, pa.int64())
        cols["__side"] = pa.array(
            np.ones(t.num_rows, np.int8), pa.int8())
        cols["__part"] = pa.array(part, pa.int64())
        return pa.table(cols).cast(mid)

    def tag_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mid.empty_table()
        part = (fnv1a64_strings(t.column("key").combine_chunks())
                % npart).astype(np.int64)
        cols = {}
        for nm, typ in left_fields:
            cols[nm] = (t.column("key") if nm == key
                        else pa.nulls(t.num_rows, typ))
        cols[out_name] = t.column("sum(__n)").cast(pa.int64())
        cols["__side"] = pa.array(
            np.zeros(t.num_rows, np.int8), pa.int8())
        cols["__part"] = pa.array(part, pa.int64())
        return pa.table(cols).cast(mid)

    out_schema = pa.schema(left_fields + [(out_name, pa.int64())])

    def scan(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        ks = np.asarray(group.column(key).to_pylist())
        side = group.column("__side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ks))
        ks_s, side_s = ks[order], side[order]
        run_id = np.cumsum(np.concatenate(
            ([True], ks_s[1:] != ks_s[:-1]))) - 1
        last_c = _segmented_last_index(side_s == 0, run_id)
        lpos = np.flatnonzero(side_s == 1)
        match = last_c[lpos]
        cv = pc.fill_null(group.column(out_name), 1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # every key has a count row (trained on the same corpus);
        # the 1 fallback only guards log(0) on malformed input
        attached = np.where(match >= 0,
                            cv[order[np.clip(match, 0, None)]], 1)
        take = pa.array(order[lpos], pa.int64())
        cols = {nm: group.column(nm).take(take)
                for nm in left_names}
        cols[out_name] = pa.array(attached, pa.int64())
        return pa.table(cols).cast(out_schema)

    tagged = (left_ds.map_batches(tag_left, batch_format="pyarrow")
              .union(counts_ds.map_batches(tag_counts,
                                           batch_format="pyarrow")))
    return (tagged.groupby("__part")
            .map_groups(scan, batch_format="pyarrow"))


def bigram_lm_scores(docs_ds, *, id_col: str = "doc_id",
                     text_col: str = "text", num_partitions: int = 64):
    """CCNet-style corpus-LM fluency signal: train a word-bigram model
    on the corpus itself (one pass of exact counts) and score every
    document by its mean bigram log-probability ``ln(n(w1 w2) /
    n(w1))`` — unusual word sequences (gibberish, keyword stuffing,
    OCR noise) score low, fluent prose scores high.  Returns one row
    per document with >= 2 words: ``(id, n_bigrams, sum_bigram_n,
    sum_head_n, avg_logprob)`` — the integer sums are the
    SQL-checkable core (exact corpus-count sums over the document's
    bigrams); ``avg_logprob`` is their float companion.

    Scale shape (everything distributed, nothing folds on the
    driver — the lesson of ``tfidf_top_terms``' join plan baked in
    from the start):

    - explode is vectorized (``split_pattern`` -> offset math ->
      ``binary_join_element_wise``; per-(doc, bigram) tf compression
      via one lexsort per block, no Python per doc or token);
    - bigram and head-word counts are per-block Arrow ``group_by``
      combiners + ONE narrow ``groupby`` each (shuffles carry
      distinct strings — the exact-count floor);
    - counts attach back via two co-partitioned run-scan joins
      (hash(key) partitions, segmented last-index scan — the
      ``_tfidf_join`` shape), so the vocabulary never exists in one
      place;
    - the per-document fold is one ``groupby(id)`` over five int64 /
      float64 columns.
    """
    import ray
    from ray.data.aggregate import Sum

    exploded_schema = pa.schema([
        (id_col, pa.int64()), ("w1", pa.string()),
        ("bg", pa.string()), ("tf", pa.int64())])

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return exploded_schema.empty_table()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        words = pc.split_pattern(batch.column(text_col),
                                 " ").combine_chunks()
        flat = pc.list_flatten(words)
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(flat)
        if n < 2:
            return exploded_schema.empty_table()
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        mask = doc_idx[1:] == doc_idx[:-1]
        w1 = flat.slice(0, n - 1).filter(pa.array(mask))
        w2 = flat.slice(1, n - 1).filter(pa.array(mask))
        bg = pc.binary_join_element_wise(w1, w2, " ")
        docs = ids[doc_idx[:-1][mask]]
        # per-(doc, bigram) tf in one lexsort (block-local combiner)
        bg_u = np.asarray(bg.to_pylist())
        if len(bg_u) == 0:
            return exploded_schema.empty_table()
        order = np.lexsort((bg_u, docs))
        d_s, b_s = docs[order], bg_u[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], (d_s[1:] != d_s[:-1]) | (b_s[1:] != b_s[:-1]))))
        tf = np.diff(np.append(starts, len(d_s)))
        take = pa.array(order[starts], pa.int64())
        return pa.table({
            id_col: pa.array(d_s[starts], pa.int64()),
            "w1": w1.take(take),
            "bg": bg.take(take),
            "tf": pa.array(tf, pa.int64()),
        }).cast(exploded_schema)

    # materialized because TWO consumers read it (the bigram-count
    # fold and the attach join); without this Ray re-executes the
    # explode per consumer.  The rows are (id, w1, bg, tf) — tf-
    # compressed, no document text — and spill to the object store
    # rather than any driver heap.
    exploded = (docs_ds.select_columns([id_col, text_col])
                .map_batches(explode, batch_format="pyarrow")
                .materialize())

    def count_partial(col: str):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"key": pa.array([], pa.string()),
                                 "__n": pa.array([], pa.int64())})
            g = (t.select([col, "tf"]).group_by(col)
                 .aggregate([("tf", "sum")]))
            return pa.table({"key": g.column(col),
                             "__n": g.column("tf_sum").cast(pa.int64())})
        return f

    bg_counts = (exploded.map_batches(count_partial("bg"),
                                      batch_format="pyarrow")
                 .groupby("key").aggregate(Sum("__n")))

    def uni_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"key": pa.array([], pa.string()),
                             "__n": pa.array([], pa.int64())})
        words = pc.split_pattern(batch.column(text_col),
                                 " ").combine_chunks()
        vc = pc.list_flatten(words).value_counts()
        return pa.table({"key": vc.field("values"),
                         "__n": vc.field("counts").cast(pa.int64())})

    uni_counts = (docs_ds.select_columns([text_col])
                  .map_batches(uni_partial, batch_format="pyarrow")
                  .groupby("key").aggregate(Sum("__n")))

    with_cb = _count_attach(exploded, bg_counts, "bg", "__cb",
                            [(id_col, pa.int64()), ("w1", pa.string()),
                             ("bg", pa.string()), ("tf", pa.int64())],
                            num_partitions)
    with_cu = _count_attach(with_cb, uni_counts, "w1", "__cu",
                            [(id_col, pa.int64()), ("w1", pa.string()),
                             ("bg", pa.string()), ("tf", pa.int64()),
                             ("__cb", pa.int64())],
                            num_partitions)

    def contrib(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "__nb": pa.array([], pa.int64()),
                "__scb": pa.array([], pa.int64()),
                "__scu": pa.array([], pa.int64()),
                "__lp": pa.array([], pa.float64())})
        tf = t.column("tf").to_numpy(zero_copy_only=False)
        cb = t.column("__cb").to_numpy(zero_copy_only=False)
        cu = t.column("__cu").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t.column(id_col),
            "__nb": pa.array(tf, pa.int64()),
            "__scb": pa.array(tf * cb, pa.int64()),
            "__scu": pa.array(tf * cu, pa.int64()),
            "__lp": pa.array(
                tf * np.log(cb.astype(np.float64)
                            / cu.astype(np.float64)), pa.float64()),
        })

    folded = (with_cu.map_batches(contrib, batch_format="pyarrow")
              .groupby(id_col)
              .aggregate(Sum("__nb"), Sum("__scb"), Sum("__scu"),
                         Sum("__lp")))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "sum_bigram_n": pa.array([], pa.int64()),
                "sum_head_n": pa.array([], pa.int64()),
                "avg_logprob": pa.array([], pa.float64())})
        nb = t.column("sum(__nb)").cast(pa.int64())
        lp = t.column("sum(__lp)").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t.column(id_col),
            "n_bigrams": nb,
            "sum_bigram_n": t.column("sum(__scb)").cast(pa.int64()),
            "sum_head_n": t.column("sum(__scu)").cast(pa.int64()),
            "avg_logprob": pa.array(
                lp / nb.to_numpy(zero_copy_only=False),
                pa.float64()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def pmi_collocations(docs_ds, *, text_col: str = "text", k: int = 15,
                     min_count: int = 3, num_partitions: int = 64):
    """Top-k word-bigram collocations by pointwise mutual information
    — the classic corpus-analysis signal for multiword expressions
    ("new york", "machine learning"): ``pmi = ln(p(w1,w2) /
    (p(w1) p(w2)))``, high when a pair co-occurs far above chance.

    Exactness contract: all counts are EXACT int64 (pair counts and
    both unigram counts); ranking uses the float64 ratio ``n_pair /
    (n_w1 * n_w2)`` — with the corpus totals constant this orders
    identically to PMI, and as ONE IEEE divide of exact ints it is
    bit-reproducible against the SQL mirror (no ``ln`` in the
    ordering).  Ties break on (w1, w2).  ``pmi`` itself is an
    un-hashed float companion.

    Scale shape: per-block bigram ``value_counts`` combiners + one
    narrow groupby each for pair and unigram counts (shuffles carry
    distinct strings — the exact-count floor); the ``min_count``
    gate cuts the hapax tail BEFORE the two :func:`_count_attach`
    run-scan joins, so the vocabulary never folds on the driver; the
    final cut is per-block top-k partials -> one k x blocks fold.
    Both count datasets are materialized (each has two consumers;
    rows are (string, int64) only, no document text).

    Output: ``(rank, w1, w2, n_pair, n_w1, n_w2, pmi)``.
    """
    from ray.data.aggregate import Sum

    pair_schema = pa.schema([("key", pa.string()),
                             ("__n", pa.int64())])

    def pair_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pair_schema.empty_table()
        words = pc.split_pattern(batch.column(text_col),
                                 " ").combine_chunks()
        flat = pc.list_flatten(words)
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(flat)
        if n < 2:
            return pair_schema.empty_table()
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        mask = doc_idx[1:] == doc_idx[:-1]
        w1 = flat.slice(0, n - 1).filter(pa.array(mask))
        w2 = flat.slice(1, n - 1).filter(pa.array(mask))
        vc = pc.binary_join_element_wise(w1, w2, " ").value_counts()
        return pa.table({
            "key": vc.field("values"),
            "__n": vc.field("counts").cast(pa.int64())}).cast(
                pair_schema)

    def uni_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pair_schema.empty_table()
        words = pc.split_pattern(batch.column(text_col),
                                 " ").combine_chunks()
        vc = pc.list_flatten(words).value_counts()
        return pa.table({
            "key": vc.field("values"),
            "__n": vc.field("counts").cast(pa.int64())}).cast(
                pair_schema)

    texts = docs_ds.select_columns([text_col])
    bg_counts = (texts.map_batches(pair_partial,
                                   batch_format="pyarrow")
                 .groupby("key").aggregate(Sum("__n")).materialize())
    uni_counts = (texts.map_batches(uni_partial,
                                    batch_format="pyarrow")
                  .groupby("key").aggregate(Sum("__n")).materialize())

    filt_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                             ("n_pair", pa.int64())])

    def gate_split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return filt_schema.empty_table()
        t = t.filter(pc.greater_equal(t.column("sum(__n)"),
                                      min_count))
        parts = pc.split_pattern(t.column("key"), " ")
        return pa.table({
            "w1": pc.list_element(parts, 0),
            "w2": pc.list_element(parts, 1),
            "n_pair": t.column("sum(__n)").cast(pa.int64())}).cast(
                filt_schema)

    gated = bg_counts.map_batches(gate_split, batch_format="pyarrow")
    with_w1 = _count_attach(
        gated, uni_counts, "w1", "n_w1",
        [("w1", pa.string()), ("w2", pa.string()),
         ("n_pair", pa.int64())], num_partitions)
    with_w2 = _count_attach(
        with_w1, uni_counts, "w2", "n_w2",
        [("w1", pa.string()), ("w2", pa.string()),
         ("n_pair", pa.int64()), ("n_w1", pa.int64())],
        num_partitions)

    scored_schema = pa.schema([
        ("w1", pa.string()), ("w2", pa.string()),
        ("n_pair", pa.int64()), ("n_w1", pa.int64()),
        ("n_w2", pa.int64()), ("__ratio", pa.float64())])

    def cut(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return scored_schema.empty_table()
        if "__ratio" not in t.column_names:
            ratio = (t.column("n_pair").to_numpy(
                zero_copy_only=False).astype(np.float64)
                / (t.column("n_w1").to_numpy(
                    zero_copy_only=False).astype(np.float64)
                   * t.column("n_w2").to_numpy(
                       zero_copy_only=False).astype(np.float64)))
            t = t.append_column("__ratio",
                                pa.array(ratio, pa.float64()))
        t = t.select([f.name for f in scored_schema])
        w1 = np.asarray(t.column("w1").to_pylist())
        w2 = np.asarray(t.column("w2").to_pylist())
        r = t.column("__ratio").to_numpy(zero_copy_only=False)
        order = np.lexsort((w2, w1, -r))[:k]
        return t.take(pa.array(order, pa.int64())).cast(scored_schema)

    # per-block partial cut bounds the fold to k x blocks rows
    topk = (with_w2.map_batches(cut, batch_format="pyarrow")
            .repartition(1)
            .map_batches(cut, batch_format="pyarrow"))

    # corpus totals for the pmi value (never hashed): one bounded
    # driver fold over each materialized count dataset
    n_tokens = uni_counts.sum("sum(__n)") or 0
    n_bigrams = bg_counts.sum("sum(__n)") or 0

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("rank", pa.int64())]
                + [(f.name, f.type) for f in scored_schema
                   if f.name != "__ratio"]
                + [("pmi", pa.float64())]).empty_table()
        const = (float(n_tokens) * float(n_tokens)
                 / max(float(n_bigrams), 1.0))
        pmi = np.log(t.column("__ratio").to_numpy(
            zero_copy_only=False) * const)
        return pa.table({
            "rank": pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64)),
            "w1": t.column("w1"), "w2": t.column("w2"),
            "n_pair": t.column("n_pair"), "n_w1": t.column("n_w1"),
            "n_w2": t.column("n_w2"),
            "pmi": pa.array(pmi, pa.float64())})

    return topk.map_batches(finish, batch_format="pyarrow")


def json_field_batch(batch: pa.Table, key: str, *,
                     col: str = "props", id_col: str = "event_id",
                     dtype: str = "int") -> pa.Table:
    """Extract one scalar field from a JSON-string column with a
    single vectorized RE2 pass (``pc.extract_regex``) — the
    flat-JSON-props fast path every event pipeline needs, with no
    Python-per-row json.loads.  ``dtype`` is ``"int"`` (value cast to
    int64) or ``"string"`` (quoted value, unescaped-quote bodies
    only).  A missing key yields NULL, matching SQL
    ``json_extract_string(...)``'s NULL.

    Contract: flat objects with primitive values (the shape the
    events table carries).  Nested objects/arrays need a real parser
    and are out of scope — documented, not guessed at."""
    import re as _re

    esc = _re.escape(key)
    if dtype == "int":
        pat = '"' + esc + '"\\s*:\\s*(?P<v>-?[0-9]+)'
        out_type = pa.int64()
    elif dtype == "string":
        pat = '"' + esc + '"\\s*:\\s*"(?P<v>[^"]*)"'
        out_type = pa.string()
    else:  # pragma: no cover
        raise ValueError(f"json_field_batch: unknown dtype {dtype!r}")
    hit = pc.extract_regex(batch.column(col), pat)
    val = pc.struct_field(hit, "v")
    if dtype == "int":
        val = pc.cast(val, pa.int64())
    return pa.table({id_col: batch.column(id_col),
                     key: val.combine_chunks()
                     if isinstance(val, pa.ChunkedArray) else val})


def json_field(ds, key: str, *, col: str = "props",
               id_col: str = "event_id", dtype: str = "int"):
    """Dataset of ``(id, key)`` — one JSON field pulled out of a
    string column.  Scale shape: column-pruned read, ONE stateless
    vectorized map, no shuffle; RE2 on both sides of the correctness
    gate (Arrow binds RE2; the oracle uses DuckDB's json extractor on
    the same strings)."""
    return ds.select_columns([id_col, col]).map_batches(
        lambda b: json_field_batch(b, key, col=col, id_col=id_col,
                                   dtype=dtype),
        batch_format="pyarrow")


def inverted_index(docs_ds, *, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 5,
                   num_partitions: int = 64):
    """Distributed inverted index (search posting lists): per lowercase
    word term, its document frequency and the comma-joined ascending
    doc-id posting list, restricted to terms with ``df >= min_df``.

    Scale shape: the per-block partial emits DISTINCT (term, doc_id)
    pairs (per-doc ``np.unique``, the same combiner as
    ``term_doc_frequency``) so repeated in-doc terms never leave their
    block; the ONE shuffle carries those narrow pairs hash-partitioned
    by term.  Inside each coarse partition a single lexsort groups
    every term's ids and the posting strings are built with one
    ``str.join`` per term — bounded Python (one call per emitted term
    over in-memory slices, never a Ray task per key; same contract as
    ``orderagg.group_string_agg``).  A term's posting list must fit in
    a task: index terms above the ``min_df`` floor but cap pathological
    stopword terms upstream (e.g. drop df > n_docs/2 terms post-hoc)
    if whole-corpus terms matter.  Output: (term, df, postings).
    """
    from torray.ops.window import _hash_col_np

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        terms, out_ids = [], []
        for i, txt in enumerate(texts):
            if not txt:
                continue
            u = np.unique(_WORD_RE.findall(txt.lower()))
            if len(u):
                terms.append(u)
                out_ids.append(np.full(len(u), ids[i], np.int64))
        if not terms:
            return pa.table({"term": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        tm = np.concatenate(terms)
        di = np.concatenate(out_ids)
        part = (_hash_col_np(tm)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({"term": pa.array(tm, pa.string()),
                         id_col: pa.array(di, pa.int64()),
                         "__part": pa.array(part, pa.int64())})

    def scan_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64()),
                          "postings": pa.array([], pa.string())})
        if group.num_rows == 0:
            return empty
        tm = group.column("term").to_numpy(zero_copy_only=False)
        di = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((di, tm))
        tms, dis = tm[order], di[order]
        starts = np.flatnonzero(
            np.concatenate(([True], tms[1:] != tms[:-1])))
        bounds = np.append(starts, len(tms))
        dfs = np.diff(bounds)
        keep = dfs >= min_df
        if not keep.any():
            return empty
        s, b, d = starts[keep], bounds[1:][keep], dfs[keep]
        dstr = dis.astype(str)
        postings = [",".join(dstr[s[i]:b[i]]) for i in range(len(s))]
        return pa.table({"term": pa.array(tms[s], pa.string()),
                         "df": pa.array(d, pa.int64()),
                         "postings": pa.array(postings, pa.string())})

    return (docs_ds.select_columns([id_col, text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


def bm25_topk(docs_ds, query_terms: list[str], *, k1: float = 1.2,
              b: float = 0.75, top_k: int = 10,
              text_col: str = "text", id_col: str = "doc_id"):
    """Distributed BM25 lexical retrieval: the global top-k documents
    for a bag-of-words query, scored with Robertson/Sparck-Jones BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), tf saturation ``k1``,
    length normalization ``b``).

    Scale shape: ONE tokenize pass over the corpus emits only
    query-term hits — (doc_id, doc_len, term, tf) rows for matched
    docs plus a per-block (n_docs, total_len) stats row — and that
    narrow hit-bounded set is materialized ONCE so the stats fold, the
    df fold, and the scoring pass reuse it without re-tokenizing the
    corpus (the materialized volume is bounded by matching docs x
    query terms, never by the corpus).  Corpus stats and per-term df
    fold driver-side over blocks-bounded partials; idf is a tiny
    broadcast closure.  Scoring is one vectorized map, the per-doc sum
    one narrow groupby, and the global top-k a per-block partial cut
    followed by a single k x blocks final task (the
    ``sample_global_k`` pattern) — the full scored set never sorts
    globally or lands on the driver.  Ordering is (score DESC,
    doc_id); score floats are the same expression tree both engines
    evaluate, so the int-only output (rank, doc_id, hit_terms,
    total_tf) is deterministic up to sub-ULP score collisions of
    distinct inputs (same acceptance as ``tfidf_top_terms``).
    Output: (rank, doc_id, hit_terms, total_tf).
    """
    qset = sorted({t.lower() for t in query_terms})
    qarr = np.array(qset)
    k1 = float(k1)
    b = float(b)

    def tf_partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        out_id, out_dl, out_term, out_tf = [], [], [], []
        n_docs = 0
        total_len = 0
        for i, txt in enumerate(texts):
            words = (np.array(_WORD_RE.findall(txt.lower()))
                     if txt else np.array([], str))
            n_docs += 1
            total_len += len(words)
            if not len(words):
                continue
            hit = words[np.isin(words, qarr)]
            if not len(hit):
                continue
            u, c = np.unique(hit, return_counts=True)
            out_term.append(u)
            out_tf.append(c)
            out_id.append(np.full(len(u), ids[i], np.int64))
            out_dl.append(np.full(len(u), len(words), np.int64))
        if out_id:
            tm = np.concatenate(out_term)
            hits = pa.table({
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "dl": pa.array(np.concatenate(out_dl), pa.int64()),
                "term": pa.array(tm, pa.string()),
                "tf": pa.array(np.concatenate(out_tf), pa.int64()),
                "kind": pa.array(np.zeros(len(tm), np.int64))})
        else:
            hits = pa.table({id_col: pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int64())})
        stats = pa.table({id_col: pa.array([n_docs], pa.int64()),
                          "dl": pa.array([total_len], pa.int64()),
                          "term": pa.array([""], pa.string()),
                          "tf": pa.array([0], pa.int64()),
                          "kind": pa.array([1], pa.int64())})
        return pa.concat_tables([hits, stats])

    rows = (docs_ds.select_columns([id_col, text_col])
            .map_batches(tf_partial, batch_format="pyarrow")
            .materialize())

    empty_final = pa.table({
        "rank": pa.array([], pa.int64()),
        id_col: pa.array([], pa.int64()),
        "hit_terms": pa.array([], pa.int64()),
        "total_tf": pa.array([], pa.int64())})

    stats = rows.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 1))
        .select([id_col, "dl"]),
        batch_format="pyarrow").to_pandas()
    # an empty corpus yields a column-less frame; no docs -> no hits
    n_docs = int(stats[id_col].sum()) if id_col in stats.columns else 0
    if n_docs == 0:
        import ray.data

        return ray.data.from_arrow(empty_final)
    total_len = int(stats["dl"].sum())
    avgdl = float(total_len) / float(n_docs)

    tf_rows = rows.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 0))
        .select([id_col, "dl", "term", "tf"]),
        batch_format="pyarrow")
    df_pdf = tf_rows.groupby("term").count().to_pandas()
    if "term" not in df_pdf.columns or not len(df_pdf):
        # no document contains any query term
        import ray.data

        return ray.data.from_arrow(empty_final)
    df_map = dict(zip(df_pdf["term"], df_pdf["count()"]))
    idf = {t: float(np.log(1.0 + (n_docs - df_map.get(t, 0) + 0.5)
                           / (df_map.get(t, 0) + 0.5)))
           for t in qset}

    def score_batch(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(
            zero_copy_only=False).astype(np.float64)
        dl = t.column("dl").to_numpy(
            zero_copy_only=False).astype(np.float64)
        terms = t.column("term").to_numpy(zero_copy_only=False)
        w = np.array([idf[x] for x in terms], np.float64)
        s = (w * (tf * (k1 + 1.0))
             / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        return pa.table({id_col: t.column(id_col),
                         "score": pa.array(s, pa.float64()),
                         "tf": t.column("tf"),
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    per_doc = (tf_rows.map_batches(score_batch, batch_format="pyarrow")
               .groupby(id_col).sum(["score", "tf", "one"]))

    def block_topk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sc = t.column("sum(score)").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sc))[:top_k]
        out = t.take(pa.array(order, pa.int64()))
        return out.append_column(
            "__one", pa.array(np.zeros(len(order), np.int64)))

    def final_cut(group: pa.Table) -> pa.Table:
        empty = pa.table({"rank": pa.array([], pa.int64()),
                          id_col: pa.array([], pa.int64()),
                          "hit_terms": pa.array([], pa.int64()),
                          "total_tf": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        sc = group.column("sum(score)").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sc))[:top_k]
        out = group.take(pa.array(order, pa.int64()))
        return pa.table({
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            id_col: out.column(id_col),
            "hit_terms": out.column("sum(one)").cast(pa.int64()),
            "total_tf": out.column("sum(tf)").cast(pa.int64())})

    return (per_doc.map_batches(block_topk, batch_format="pyarrow")
            .groupby("__one")
            .map_groups(final_cut, batch_format="pyarrow"))


def doc_keywords(docs_ds, *, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 3,
                 num_partitions: int = 64):
    """Top-k keywords PER DOCUMENT ranked by ``(tf DESC, df ASC,
    term ASC)`` — tf-idf keyword selection with an ALL-INTEGER
    ordering (rarer-corpus-wide breaks term-frequency ties), so the
    ranking is bit-free exact against the SQL window mirror: no float
    score ever enters the comparison.

    Scale shape: per-block (doc, term, tf) Arrow group_by partials
    (terms never leave their block uncombined); document frequency via
    per-block distinct (term, doc) + one narrow groupby; df attaches
    through the co-partitioned run-scan join (:func:`_count_attach` —
    no driver-side vocabulary); the final cut is a hash(doc) partition
    run-scan taking the first k of each doc run — Python once per
    partition.  Output: ``(doc_id, rank, term, tf, df)``.
    """
    from ray.data.aggregate import Sum

    from torray.ops.dedup import _mix64

    tf_schema = pa.schema([(id_col, pa.int64()),
                           ("term", pa.string()),
                           ("tf", pa.int64())])

    def tf_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return tf_schema.empty_table()
        words = pc.split_pattern(batch.column(text_col),
                                 " ").combine_chunks()
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        t = pa.table({
            id_col: pa.array(np.repeat(ids, lens), pa.int64()),
            "term": pc.list_flatten(words)})
        g = pa.TableGroupBy(t, [id_col, "term"]).aggregate(
            [([], "count_all")])
        return pa.table({
            id_col: g.column(id_col),
            "term": g.column("term"),
            "tf": g.column("count_all").cast(pa.int64())}).cast(
                tf_schema)

    # (doc, term, tf) rows are already per-block distinct per doc;
    # the docs themselves are distinct rows, so this IS the exact tf
    tf_ds = (docs_ds.select_columns([id_col, text_col])
             .map_batches(tf_partial, batch_format="pyarrow"))

    df_schema = pa.schema([("key", pa.string()),
                           ("__n", pa.int64())])

    def df_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return df_schema.empty_table()
        # each (doc, term) appears once per block here -> distinct
        # doc count per term is a plain count after a cross-block
        # (term, doc) dedupe is unnecessary: a doc's rows live in ONE
        # block (tf_partial groups within the doc's own block)
        g = pa.TableGroupBy(t.select(["term"]), "term").aggregate(
            [([], "count_all")])
        return pa.table({
            "key": g.column("term"),
            "__n": g.column("count_all").cast(pa.int64())}).cast(
                df_schema)

    df_ds = (tf_ds.map_batches(df_partial, batch_format="pyarrow")
             .groupby("key").aggregate(Sum("__n")))

    with_df = _count_attach(
        tf_ds, df_ds, "term", "df",
        [(id_col, pa.int64()), ("term", pa.string()),
         ("tf", pa.int64())], num_partitions)

    mid = pa.schema([(id_col, pa.int64()), ("term", pa.string()),
                     ("tf", pa.int64()), ("df", pa.int64()),
                     ("__part", pa.int64())])

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mid.empty_table()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        part = (_mix64(ids.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__part",
                               pa.array(part, pa.int64())).cast(mid)

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("rank", pa.int64()),
                            ("term", pa.string()),
                            ("tf", pa.int64()), ("df", pa.int64())])

    def cut_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        tf = group.column("tf").to_numpy(zero_copy_only=False)
        dfv = group.column("df").to_numpy(zero_copy_only=False)
        terms = np.asarray(group.column("term").to_pylist())
        order = np.lexsort((terms, dfv, -tf, ids))
        ids_s = ids[order]
        new_doc = np.concatenate(([True], ids_s[1:] != ids_s[:-1]))
        doc_id_run = np.cumsum(new_doc) - 1
        pos_in_doc = (np.arange(len(ids_s))
                      - np.flatnonzero(new_doc)[doc_id_run])
        keep = pos_in_doc < k
        take = pa.array(order[keep], pa.int64())
        out = group.take(take)
        return pa.table({
            id_col: out.column(id_col),
            "rank": pa.array(pos_in_doc[keep] + 1, pa.int64()),
            "term": out.column("term"),
            "tf": out.column("tf"),
            "df": out.column("df")}).cast(out_schema)

    return (with_df.map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(cut_partition, batch_format="pyarrow"))


def pattern_hits(ds, patterns, *, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Literal multi-pattern substring join: one ``(id, pattern)`` row
    per (document, pattern) where the document text CONTAINS the
    pattern — the phrase-blocklist / decontamination-by-literal shape
    (SQL: ``JOIN patterns p ON contains(text, p.pattern)``).

    The pattern list rides the task closure (small by contract) and
    each batch runs ONE vectorized ``pc.match_substring`` pass per
    pattern (Arrow C++ SIMD scan, no Python rows), so the cost is
    O(k) passes over each block and only (id, pattern) pairs ever
    leave it — text never shuffles.  Right-sized for blocklists up to
    a few thousand phrases; beyond that use
    :func:`torray.ops.decontam.decontaminate` (hashed n-gram set:
    one pass regardless of set size, but gram-granular rather than
    exact-substring).
    """
    from torray.ops.window import _ds_field_type

    plist = sorted({str(p) for p in patterns})
    id_type = _ds_field_type(ds, id_col)

    def hits(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        ids = t.column(id_col)
        out_ids: list = []
        out_pats: list = []
        for p in plist:
            sel = ids.filter(pc.match_substring(txt, p))
            if len(sel):
                out_ids.append(sel.combine_chunks())
                out_pats.append(pa.repeat(pa.scalar(p, pa.string()),
                                          len(sel)))
        if not out_ids:
            return pa.table({id_col: pa.array([], id_type),
                             "pattern": pa.array([], pa.string())})
        return pa.table({
            id_col: pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in out_ids]),
            "pattern": pa.concat_arrays(out_pats)})

    return ds.select_columns([id_col, text_col]).map_batches(
        hits, batch_format="pyarrow")


class TextQualityModel:
    """Actor-pool MODEL-INFERENCE stage for text: score every document
    with a (deterministic, numpy-only) logistic quality model over the
    :func:`quality_batch` feature vector — the shape a real classifier
    (fastText quality filter, learned toxicity head) plugs into.

    Stateful-stage contract: the "model" (weight vector) is built ONCE
    per actor in ``__init__`` (where a real pipeline would load
    weights from disk); ``__call__`` is fully batched — one feature
    pass + one matvec + one sigmoid per block, no Python rows.  Use as
    ``ds.map_batches(TextQualityModel, concurrency=N, batch_size=B,
    batch_format="pyarrow")``.  Swap ``_load_weights`` for a real
    model load; the Ray-side plumbing (actor pool, batch size, output
    schema) is what this class pins down and tests."""

    FEATURES = ("n_chars", "mean_word_len", "punct_ratio",
                "stopword_ratio", "upper_ratio", "quality")

    def __init__(self, seed: int = 41, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.w, self.b = self._load_weights(seed)

    @staticmethod
    def _load_weights(seed: int):
        rng = np.random.RandomState(seed)
        return rng.normal(scale=0.5, size=6), -0.1

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = quality_batch(batch, self.text_col)
        mat = np.stack([feats.column(c).to_numpy(
            zero_copy_only=False).astype(np.float64)
            for c in self.FEATURES], axis=1)
        # normalize the unbounded columns so the logistic is not
        # saturated by raw char counts
        mat[:, 0] = np.log1p(mat[:, 0])
        mat[:, 1] = np.log1p(mat[:, 1])
        logits = mat @ self.w + self.b
        score = 1.0 / (1.0 + np.exp(-logits))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "model_score": pa.array(score, pa.float64())})


def model_score_documents(docs_ds, *, concurrency: int = 2,
                          batch_size: int = 256):
    """Run :class:`TextQualityModel` as an actor pool over the corpus
    (weights load once per actor; scoring is one matvec per batch)."""
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        TextQualityModel, concurrency=concurrency,
        batch_size=batch_size, batch_format="pyarrow")


_VOCAB_WORD_RE = re.compile(r"\S+")  # mirrors SQL regexp_extract_all


def vocab_overlap(docs_ds, *, group_col: str = "lang",
                  text_col: str = "text", num_partitions: int = 64):
    """Pairwise vocabulary overlap between corpus slices: for every
    pair of groups (languages, sources, snapshots) the EXACT shared
    distinct-word count and vocabulary Jaccard — the corpus-mixing /
    drift diagnostic ("how much does the de slice share with nl?",
    "did this crawl snapshot's vocabulary move?").

    Scale shape: each block emits its DISTINCT (word-hash, group-id)
    int64 pairs once (text never shuffles); the pair machinery
    (:func:`torray.ops.dedup.salted_bucket_pairs`) groups by word
    hash with cross-block id-dedup inside partition run-scans, so a
    word shared by g groups emits C(g, 2) pair rows exactly once each
    regardless of document counts; ``pair_counts`` folds those to
    ``|V_a ∩ V_b|``; vocabulary sizes come from
    :func:`torray.ops.sketch.exact_distinct_by` over the same
    exploded rows.  Group count L is small (languages/sources), so
    the final L^2 combine is a bounded driver fold.  A second
    independent word hash vets each candidate pair, so a 64-bit
    bucket collision can only drop a pair (never invent one); at
    test vocabularies collisions do not occur at all.

    Returns (lang_a, lang_b, n_shared, n_a, n_b, jaccard) with group
    names sorted so ``lang_a < lang_b``, jaccard = one float divide
    over exact ints.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from torray.ops.dedup import (fnv1a64_strings, pair_counts,
                                  salted_bucket_pairs)
    from torray.ops.sketch import exact_distinct_by

    groups_pdf = (docs_ds.groupby(group_col).count().to_pandas()
                  if docs_ds.schema() is not None else None)
    names = (sorted(str(g) for g in groups_pdf[group_col].dropna())
             if groups_pdf is not None and group_col in groups_pdf
             else [])
    empty = pa.table({
        "lang_a": pa.array([], pa.string()),
        "lang_b": pa.array([], pa.string()),
        "n_shared": pa.array([], pa.int64()),
        "n_a": pa.array([], pa.int64()),
        "n_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64())})
    if len(names) < 1:
        return ray.data.from_arrow(empty)
    gid = {g: i for i, g in enumerate(names)}

    def explode(batch: pa.Table) -> pa.Table:
        seen: set = set()
        for g, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            if t is None or g is None:
                continue
            lid = gid.get(str(g))
            if lid is None:
                continue
            for w in set(_VOCAB_WORD_RE.findall(t.lower())):
                seen.add((w, lid))
        if not seen:
            return pa.table({"h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             "gid": pa.array([], pa.int64())})
        words = pa.array([w for w, _ in seen], pa.string())
        import pyarrow.compute as _pc

        h1 = fnv1a64_strings(words)
        # Independent second hash: sentinel byte PREFIXED (a suffix
        # would collide whenever h1 collides — fnv1a64 is streaming
        # and _mix64 is bijective, so equal end-of-word state plus a
        # shared suffix stays equal; a differing prefix diverges the
        # state from byte 0).
        h2 = fnv1a64_strings(_pc.binary_join_element_wise(
            pa.scalar("\x01"), words, ""))
        return pa.table({
            "h1": pa.array(h1.view(np.int64), pa.int64()),
            "h2": pa.array(h2.view(np.int64), pa.int64()),
            "gid": pa.array([i for _, i in seen], pa.int64())})

    rows = docs_ds.select_columns([group_col, text_col]).map_batches(
        explode, batch_format="pyarrow").materialize()

    sizes_pdf = exact_distinct_by(
        rows, "gid", "h1",
        num_partitions=num_partitions).to_pandas()
    n_by_gid = dict(zip(sizes_pdf["gid"], sizes_pdf["n_distinct"])) \
        if "gid" in sizes_pdf else {}

    pairs = pair_counts(
        salted_bucket_pairs(rows, "h1", "gid", max_bucket=None,
                            num_partitions=num_partitions,
                            payload_col="h2",
                            pair_filter=lambda a, b: a == b),
        num_partitions=num_partitions).to_pandas()

    if not len(pairs):
        return ray.data.from_arrow(empty)
    ga = pairs["id_a"].to_numpy()
    gb = pairs["id_b"].to_numpy()
    shared = pairs["n_shared"].to_numpy().astype(np.int64)
    na = np.array([n_by_gid.get(int(g), 0) for g in ga], np.int64)
    nb = np.array([n_by_gid.get(int(g), 0) for g in gb], np.int64)
    return ray.data.from_arrow(pa.table({
        "lang_a": pa.array([names[int(g)] for g in ga], pa.string()),
        "lang_b": pa.array([names[int(g)] for g in gb], pa.string()),
        "n_shared": pa.array(shared, pa.int64()),
        "n_a": pa.array(na, pa.int64()),
        "n_b": pa.array(nb, pa.int64()),
        "jaccard": pa.array(
            shared.astype(np.float64) / (na + nb - shared),
            pa.float64())}))


# --- HTML -> text extraction (the input_hint's text column is the
# extracted body text of the html column; this op IS that derivation)

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_HTML_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_ANY_TAG_RE = re.compile(r"<[^>]*>")
_WS_RUN_RE = re.compile(r"\s+")
# unescape order matters: &amp; LAST so '&amp;lt;' -> '&lt;' (the
# html.unescape single-pass convention for the named core set)
_ENTITIES = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def html_to_text(html) -> str:
    """Extract readable text from an HTML page: drop <script>/<style>
    subtrees and comments, strip every tag (each becomes a space, so
    block boundaries never glue words), decode the core named
    entities, collapse whitespace, strip.  Bytes are decoded as UTF-8
    with replacement.  Deterministic and layout-free — the
    Common-Crawl-style ``text`` column of the input_hint schema is
    exactly this derivation of ``html``."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    s = _SCRIPT_STYLE_RE.sub(" ", html)
    s = _HTML_COMMENT_RE.sub(" ", s)
    s = _ANY_TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RUN_RE.sub(" ", s).strip()


def extract_page_text(ds, *, html_col: str = "html",
                      out_col: str = "text",
                      keep_cols: list[str] | None = None):
    """Batched :func:`html_to_text` over a pages Dataset: emits
    ``keep_cols`` (default: every non-html column — page bytes never
    leave the block) plus ``out_col``.  Per-row work is compiled-regex
    scans only (C-dominated, same budget as the extract stage of the
    crawl engine)."""

    def extract(t: pa.Table) -> pa.Table:
        keep = (keep_cols if keep_cols is not None
                else [c for c in t.column_names if c != html_col])
        txt = [html_to_text(h) for h in
               t.column(html_col).to_pylist()]
        out = t.select(keep) if keep else pa.table(
            {}, schema=pa.schema([]))
        cols = {c: out.column(c) for c in out.column_names}
        cols[out_col] = pa.array(txt, pa.string())
        return pa.table(cols)

    return ds.map_batches(extract, batch_format="pyarrow")


_TAG_NAME_RE = re.compile(r"<(/?[A-Za-z][A-Za-z0-9]*)")


def template_clusters(ds, *, url_col: str = "url",
                      html_col: str = "html",
                      num_partitions: int = 64):
    """Cluster pages by DOM TEMPLATE: the fingerprint is a 64-bit
    hash of the page's full tag-name sequence (open and close tags,
    lowercased, attributes and text ignored) — pages generated by the
    same template collide regardless of content, the complement of
    content-hash dedup for boilerplate discovery.  Returns one row
    per template: ``(leader_url, n_pages, n_tags)`` with
    ``leader_url`` the lexicographically smallest member URL (a
    stable, partition-invariant cluster id) and ``n_tags`` the
    sequence length.

    Scale shape: tag sequences are single compiled-regex scans; each
    block collapses to per-fingerprint partials (min url, count,
    n_tags) via Arrow C++ ``group_by`` — page bytes and tag sequences
    never leave the block; ONE narrow (fp, url, n) shuffle, then the
    hashed-partition run-scan folds partials without per-cluster
    Python."""
    from torray.ops.dedup import fnv1a64_strings
    from torray.ops.window import _hash_col_np

    part_cols = ("__fp", "__url", "__n", "__tags")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "__fp": pa.array([], pa.int64()),
                "__url": pa.array([], pa.string()),
                "__n": pa.array([], pa.int64()),
                "__tags": pa.array([], pa.int64()),
                "__part": pa.array([], pa.int64())})
        urls, seqs, lens = [], [], []
        for u, h in zip(t.column(url_col).to_pylist(),
                        t.column(html_col).to_pylist()):
            if h is None:
                continue
            if isinstance(h, (bytes, bytearray, memoryview)):
                h = bytes(h).decode("utf-8", "replace")
            tags = _TAG_NAME_RE.findall(h)
            urls.append(u)
            seqs.append(" ".join(tags).lower())
            lens.append(len(tags))
        fp = fnv1a64_strings(pa.array(seqs, pa.string()))
        tbl = pa.table({
            "__fp": pa.array(fp.view(np.int64), pa.int64()),
            "__url": pa.array(urls, pa.string()),
            "__tags": pa.array(lens, pa.int64())})
        g = tbl.group_by(["__fp", "__tags"]).aggregate(
            [("__url", "min"), ([], "count_all")])
        fps = g.column("__fp").to_numpy(zero_copy_only=False)
        part = (_hash_col_np(fps)
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            "__fp": g.column("__fp"),
            "__url": g.column("__url_min"),
            "__n": g.column("count_all").cast(pa.int64()),
            "__tags": g.column("__tags"),
            "__part": pa.array(part, pa.int64())})

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"leader_url": pa.array([], pa.string()),
                             "n_pages": pa.array([], pa.int64()),
                             "n_tags": pa.array([], pa.int64())})
        g = (group.select(list(part_cols))
             .group_by(["__fp", "__tags"])
             .aggregate([("__url", "min"), ("__n", "sum")]))
        return pa.table({
            "leader_url": g.column("__url_min"),
            "n_pages": g.column("__n_sum").cast(pa.int64()),
            "n_tags": g.column("__tags")})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(fold, batch_format="pyarrow"))


def compression_ratios(ds, *, id_col: str = "doc_id",
                       text_col: str = "text", level: int = 6):
    """Per-document zlib compression ratio ``(id, n_bytes,
    n_compressed, ratio)`` — the cheap language-agnostic
    repetition/boilerplate signal (RefinedWeb/MassiveText-style
    filters drop documents that compress too well; random-looking
    binary-in-text compresses too badly).  ``ratio`` =
    n_compressed / n_bytes, 1-byte-exact from deterministic zlib
    (level pinned); empty/null text -> null ratio.

    Per-row work is one C zlib call (same budget class as the sha1
    page hasher); text never leaves the block."""
    import zlib

    def score(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        nb, nc, ratio = [], [], []
        for x in t.column(text_col).to_pylist():
            if not x:
                nb.append(0)
                nc.append(0)
                ratio.append(None)
                continue
            raw = x.encode("utf-8", "replace")
            comp = len(zlib.compress(raw, level))
            nb.append(len(raw))
            nc.append(comp)
            ratio.append(comp / len(raw))
        return pa.table({
            id_col: ids,
            "n_bytes": pa.array(nb, pa.int64()),
            "n_compressed": pa.array(nc, pa.int64()),
            "ratio": pa.array(ratio, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")
