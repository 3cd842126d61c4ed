"""Exact duplicate-substring span ops (torray.ops.spans) vs a
pure-substring reference implementation.

The reference here hashes nothing: it enumerates real ``width``-char
substrings with a dict, so these tests also validate the rolling
hash's fidelity (hash-equal == substring-equal on these corpora)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from torray.ops import spans

W = 24


def _corpus():
    rng = np.random.default_rng(7)
    alpha = np.array(list("abcdefghij "))
    passage = "".join(rng.choice(alpha, 40))      # planted shared passage
    inner = "".join(rng.choice(alpha, 30))        # repeated inside one doc
    docs = []
    for d in range(40):
        body = "".join(rng.choice(alpha, 120))
        if d % 5 == 0:
            body = body[:20] + passage + body[20:]
        if d == 7:
            body = inner + body + inner           # self-duplicate
        docs.append((d, body))
    docs.append((40, ""))                         # empty text
    docs.append((41, "short"))                    # shorter than width
    return docs


def _ref_counts(docs, width):
    from collections import Counter
    cnt = Counter()
    for _, t in docs:
        for i in range(len(t) - width + 1):
            cnt[t[i:i + width]] += 1
    out = {}
    for d, t in docs:
        k = sum(1 for i in range(len(t) - width + 1)
                if cnt[t[i:i + width]] >= 2)
        if k:
            out[d] = k
    return out


def _ref_remove(docs, width):
    occ = {}
    for d, t in sorted(docs):
        for i in range(len(t) - width + 1):
            w = t[i:i + width]
            if w in occ:
                occ[w] = (occ[w][0] + 1, occ[w][1])
            else:
                occ[w] = (1, (d, i))
    out = {}
    for d, t in docs:
        mark = np.zeros(len(t), bool)
        for i in range(len(t) - width + 1):
            w = t[i:i + width]
            n, win = occ[w]
            if n >= 2 and win != (d, i):
                mark[i:i + width] = True
        kept = "".join(ch for ch, m in zip(t, mark) if not m)
        runs = int(np.sum(mark[1:] & ~mark[:-1])
                   + (1 if len(mark) and mark[0] else 0))
        out[d] = (kept, int(mark.sum()), runs)
    return out


def _ds(docs, ray_session, nparts=1):
    import ray
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([t for _, t in docs], pa.string())})
    ds = ray.data.from_arrow(t)
    return ds.repartition(nparts) if nparts > 1 else ds


def test_duplicate_window_counts_match_reference(ray_session):
    docs = _corpus()
    ds = _ds(docs, ray_session, nparts=5)
    got = {r["doc_id"]: r["n_dup"]
           for r in spans.duplicate_window_counts(ds, width=W).take_all()}
    assert got == _ref_counts(docs, W)
    assert 7 in got                  # the self-duplicating doc is found


def test_remove_duplicate_spans_match_reference(ray_session):
    docs = _corpus()
    ds = _ds(docs, ray_session, nparts=4)
    got = {r["doc_id"]: (r["text"], r["n_removed"], r["n_spans"])
           for r in spans.remove_duplicate_spans(ds, width=W).take_all()}
    ref = _ref_remove(docs, W)
    assert len(got) == len(docs)     # untouched docs pass through
    assert got == ref
    # the globally-first occurrence survives: reassembling every kept
    # text must still contain the planted passage at least once
    all_text = "".join(v[0] for v in got.values())
    rng = np.random.default_rng(7)
    passage = "".join(rng.choice(np.array(list("abcdefghij ")), 40))
    assert passage in all_text


def test_partition_invariance(ray_session):
    docs = _corpus()
    a = {r["doc_id"]: r["n_dup"] for r in spans.duplicate_window_counts(
        _ds(docs, ray_session, 1), width=W).take_all()}
    b = {r["doc_id"]: r["n_dup"] for r in spans.duplicate_window_counts(
        _ds(docs, ray_session, 9), width=W).take_all()}
    assert a == b


def test_unicode_and_width_edges(ray_session):
    docs = [(0, "héllo wörld αβγδε " * 4), (1, "héllo wörld αβγδε " * 4),
            (2, "unrelated text entirely 123")]
    ds = _ds(docs, ray_session)
    got = {r["doc_id"]: r["n_dup"]
           for r in spans.duplicate_window_counts(ds, width=18).take_all()}
    assert got == _ref_counts(docs, 18)
    rem = {r["doc_id"]: r["text"]
           for r in spans.remove_duplicate_spans(ds, width=18).take_all()}
    ref = _ref_remove(docs, 18)
    assert rem == {d: v[0] for d, v in ref.items()}


def test_doc_id_range_guard(ray_session):
    ds = _ds([(1 << 31, "x" * 40), (3, "x" * 40)], ray_session)
    with pytest.raises(Exception):
        spans.duplicate_window_counts(ds, width=8).take_all()


def test_max_dup_windows_cap(ray_session):
    docs = [(0, "abcdefgh" * 8), (1, "abcdefgh" * 8)]
    ds = _ds(docs, ray_session)
    with pytest.raises(ValueError, match="max_dup_windows"):
        spans.duplicate_window_counts(ds, width=8, max_dup_windows=3)
