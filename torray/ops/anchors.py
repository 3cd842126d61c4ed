"""Anchor-text aggregation over a web-page corpus — the classic
webtext signal: the text other pages use when they LINK to a url is
a high-precision label for that url (search engines and LLM-pretrain
pipelines both harvest it; cf. Common Crawl's wat/anchor extractions).

Two stages:

:func:`anchor_pairs` scans ``(url, html)`` pages with ONE compiled
regex per batch loop (the per-doc ``finditer`` is C-dominated regex
work, the same budget as ``ops.text``'s compiled-scan kernels) and
emits ``(src, dst, anchor)`` rows — href as written (absolute or
relative, single/double/un-quoted), inner text with tags stripped and
whitespace collapsed, empty anchors dropped.  Page bytes never leave
the block: the emitted rows are the narrow extraction only.

:func:`anchor_summary` folds pairs into the per-target signal table
``(dst, n_refs, n_anchors, top_anchor, top_n)``:

- exact counts: per-block Arrow ``group_by(dst, anchor)`` combiners,
  then ONE ``groupby([dst, anchor])`` sum — the shuffle carries
  distinct pairs, never raw rows;
- totals/distincts fold from the globally-unique (dst, anchor, n)
  rows with a second per-block combiner + narrow ``groupby(dst)``;
- ``top_anchor`` = most-referenced anchor, ties to the
  lexicographically smallest (``ops.orderagg.group_argmax`` hashed
  run-scan — no Python call per target).

The reference crawler stores raw link lists only; anchor harvesting
belongs to the training-data layer (SURVEY.md "beyond the
reference").
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

__all__ = ["anchor_pairs", "anchor_summary", "canonical_pairs"]

_ANCHOR_RE = re.compile(
    rb"""<a\b[^>]*?\bhref\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)[^>]*>"""
    rb"""(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"\s+")


def anchor_pairs(ds, *, url_col: str = "url", html_col: str = "html"):
    """Extract ``(src, dst, anchor)`` rows from every ``<a href>`` of
    every page.  ``html_col`` may be binary or string.  Unclosed
    anchors are dropped (no ``</a>`` -> no text); hrefs are kept AS
    WRITTEN (canonicalize downstream with ``torray.urlnorm`` if the
    pipeline needs it — keeping extraction pure makes it oracle-able).
    """

    def extract(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string()),
                             "anchor": pa.array([], pa.string())})
        urls = t.column(url_col).to_pylist()
        htmls = t.column(html_col).to_pylist()
        src, dst, anc = [], [], []
        for u, h in zip(urls, htmls):
            if h is None:
                continue
            if isinstance(h, str):
                h = h.encode("utf-8", "replace")
            for m in _ANCHOR_RE.finditer(h):
                href = m.group(1)
                if href[:1] in (b'"', b"'"):
                    href = href[1:-1]
                href = href.strip()
                text = _WS_RE.sub(b" ", _TAG_RE.sub(b"", m.group(2))
                                  ).strip()
                if not href or not text:
                    continue
                src.append(u)
                dst.append(href.decode("utf-8", "replace"))
                anc.append(text.decode("utf-8", "replace"))
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string()),
                         "anchor": pa.array(anc, pa.string())})

    return ds.map_batches(extract, batch_format="pyarrow")


def anchor_summary(pairs_ds, *, num_partitions: int = 64):
    """Fold ``(src, dst, anchor)`` pairs into the per-target anchor
    signal ``(dst, n_refs, n_anchors, top_anchor, top_n)`` —
    ``n_refs`` total references, ``n_anchors`` exact distinct anchor
    strings, ``top_anchor`` the most frequent (ties: smallest
    string), ``top_n`` its count."""
    from ray.data.aggregate import Sum

    from torray.ops.join import safe_join
    from torray.ops.orderagg import group_argmax

    def pair_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"dst": pa.array([], pa.string()),
                             "anchor": pa.array([], pa.string()),
                             "__n": pa.array([], pa.int64())})
        g = (t.select(["dst", "anchor"])
             .group_by(["dst", "anchor"])
             .aggregate([([], "count_all")]))
        return pa.table({"dst": g.column("dst"),
                         "anchor": g.column("anchor"),
                         "__n": g.column("count_all").cast(pa.int64())})

    counts = (pairs_ds.map_batches(pair_counts, batch_format="pyarrow")
              .groupby(["dst", "anchor"]).aggregate(Sum("__n")))
    counts = counts.map_batches(
        lambda t: pa.table({"dst": t.column("dst"),
                            "anchor": t.column("anchor"),
                            "n": t.column("sum(__n)").cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    def totals_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"dst": pa.array([], pa.string()),
                             "__refs": pa.array([], pa.int64()),
                             "__k": pa.array([], pa.int64())})
        g = (t.select(["dst", "n"]).group_by("dst")
             .aggregate([("n", "sum"), ([], "count_all")]))
        return pa.table({"dst": g.column("dst"),
                         "__refs": g.column("n_sum").cast(pa.int64()),
                         "__k": g.column("count_all").cast(pa.int64())})

    totals = (counts.map_batches(totals_partial, batch_format="pyarrow")
              .groupby("dst").aggregate(Sum("__refs"), Sum("__k")))
    totals = totals.map_batches(
        lambda t: pa.table({
            "dst": t.column("dst"),
            "n_refs": t.column("sum(__refs)").cast(pa.int64()),
            "n_anchors": t.column("sum(__k)").cast(pa.int64())}),
        batch_format="pyarrow")

    def negn(t: pa.Table) -> pa.Table:
        return t.append_column("__negn", pa.array(
            -t.column("n").to_numpy(zero_copy_only=False), pa.int64()))

    top = group_argmax(
        counts.map_batches(negn, batch_format="pyarrow"),
        group_col="dst", order_cols=["__negn", "anchor"],
        keep_cols=["n"], mode="min", num_partitions=num_partitions)
    top = top.map_batches(
        lambda t: pa.table({"dst": t.column("dst"),
                            "top_anchor": t.column("anchor"),
                            "top_n": t.column("n").cast(pa.int64())}),
        batch_format="pyarrow")

    out = safe_join(totals, top, "inner", 4, on=("dst",))
    return out.map_batches(
        lambda t: t.select(["dst", "n_refs", "n_anchors",
                            "top_anchor", "top_n"]),
        batch_format="pyarrow")


_LINK_TAG_RE = re.compile(rb"<link\b[^>]*>", re.IGNORECASE)
_REL_CANON_RE = re.compile(
    rb"""\brel\s*=\s*("canonical"|'canonical'|canonical)(?=[\s/>])""",
    re.IGNORECASE)
_HREF_RE = re.compile(
    rb"""\bhref\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""", re.IGNORECASE)


def canonical_pairs(ds, *, url_col: str = "url",
                    html_col: str = "html"):
    """Extract ``(url, canonical)`` from each page's
    ``<link rel="canonical" href=...>`` — the publisher's own
    duplicate-consolidation signal (one row per page that declares
    one; FIRST declaration wins, matching how browsers and crawlers
    resolve repeats).  Attribute order inside the tag is free; all
    three quote styles parse; link tags without rel=canonical or
    without an href are ignored.  Same budget as
    :func:`anchor_pairs`: compiled-regex scans, page bytes never
    leave the block."""

    def extract(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"url": pa.array([], pa.string()),
                             "canonical": pa.array([], pa.string())})
        urls = t.column(url_col).to_pylist()
        htmls = t.column(html_col).to_pylist()
        src, dst = [], []
        for u, h in zip(urls, htmls):
            if h is None:
                continue
            if isinstance(h, str):
                h = h.encode("utf-8", "replace")
            for m in _LINK_TAG_RE.finditer(h):
                tag = m.group(0)
                if not _REL_CANON_RE.search(tag):
                    continue
                hm = _HREF_RE.search(tag)
                if not hm:
                    continue
                href = hm.group(1)
                if href[:1] in (b'"', b"'"):
                    href = href[1:-1]
                href = href.strip()
                if href:
                    src.append(u)
                    dst.append(href.decode("utf-8", "replace"))
                    break  # first declaration wins
        return pa.table({"url": pa.array(src, pa.string()),
                         "canonical": pa.array(dst, pa.string())})

    return ds.map_batches(extract, batch_format="pyarrow")
