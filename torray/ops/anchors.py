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
- totals, distinct count and the top anchor (ties to the
  lexicographically smallest) all fold in ONE hashed-partition
  run-scan over the globally-unique (dst, anchor, n) rows — a single
  lexsort pass per partition, no Python call per target.

:func:`canonical_pairs` and :func:`page_metadata` harvest the other
head-level webtext signals (publisher dedup hints; lang / charset /
description / og:title / robots-noindex) with the same
compiled-regex, bytes-stay-in-block budget.

The reference crawler stores raw link lists only; anchor harvesting
belongs to the training-data layer (SURVEY.md "beyond the
reference").
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

__all__ = ["anchor_pairs", "anchor_summary", "canonical_pairs",
           "page_metadata"]

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

    from torray.ops.window import _hash_col_np

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

    # ONE hashed-partition run-scan computes all four outputs per dst
    # from the globally-unique (dst, anchor, n) rows — totals, distinct
    # count and the argmax in a single lexsort pass (the prior shape's
    # second groupby + argmax sort + join were three more sub-DAGs for
    # the same answer).
    def tag(t: pa.Table) -> pa.Table:
        out = pa.table({
            "dst": t.column("dst") if t.num_rows else
            pa.array([], pa.string()),
            "anchor": t.column("anchor") if t.num_rows else
            pa.array([], pa.string()),
            "n": (t.column("sum(__n)").cast(pa.int64())
                  if t.num_rows else pa.array([], pa.int64()))})
        d = out.column("dst").to_numpy(zero_copy_only=False)
        part = (_hash_col_np(d)
                % np.uint64(num_partitions)).astype(np.int64)
        return out.append_column("__part", pa.array(part, pa.int64()))

    def scan_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "dst": pa.array([], pa.string()),
                "n_refs": pa.array([], pa.int64()),
                "n_anchors": pa.array([], pa.int64()),
                "top_anchor": pa.array([], pa.string()),
                "top_n": pa.array([], pa.int64())})
        d = group.column("dst").to_numpy(zero_copy_only=False)
        a = group.column("anchor").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        # per dst: rows sorted count-desc then anchor-asc -> the run
        # head IS the top anchor; sums/lengths fold with reduceat
        order = np.lexsort((a, -n, d))
        d, a, n = d[order], a[order], n[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], d[1:] != d[:-1])))
        lens = np.diff(np.append(starts, len(d)))
        refs = np.add.reduceat(n, starts)
        return pa.table({
            "dst": pa.array(d[starts], pa.string()),
            "n_refs": pa.array(refs, pa.int64()),
            "n_anchors": pa.array(lens, pa.int64()),
            "top_anchor": pa.array(a[starts], pa.string()),
            "top_n": pa.array(n[starts], pa.int64())})

    return (counts.map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(scan_partition, batch_format="pyarrow"))


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


_META_TAG_RE = re.compile(rb"<meta\b[^>]*>", re.IGNORECASE)
_HTML_LANG_RE = re.compile(
    rb"""<html\b[^>]*?\blang\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""",
    re.IGNORECASE)
_ATTR_RES = {
    "name": re.compile(
        rb"""\bname\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""", re.IGNORECASE),
    "property": re.compile(
        rb"""\bproperty\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""",
        re.IGNORECASE),
    "content": re.compile(
        rb"""\bcontent\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""",
        re.IGNORECASE),
    "charset": re.compile(
        rb"""\bcharset\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""",
        re.IGNORECASE),
}


def _unquote(v: bytes | None) -> str | None:
    if v is None:
        return None
    if v[:1] in (b'"', b"'"):
        v = v[1:-1]
    v = v.strip()
    return v.decode("utf-8", "replace") if v else None


def page_metadata(ds, *, url_col: str = "url",
                  html_col: str = "html"):
    """Harvest head metadata into typed columns — ``(url, lang,
    charset, description, og_title, noindex)``: the ``<html lang>``
    attribute, ``<meta charset>``, ``<meta name=description>``,
    ``<meta property=og:title>`` and whether a robots meta declares
    ``noindex`` (curation gate: publishers opting out of indexing).
    First occurrence wins per field; absent fields are null; matching
    is attribute-order-free across all three quote styles.  One
    compiled-regex scan collects every <meta> tag; page bytes never
    leave the block."""

    def extract(t: pa.Table) -> pa.Table:
        urls, langs, chars, descs, ogts, noidx = [], [], [], [], [], []
        for u, h in zip(t.column(url_col).to_pylist(),
                        t.column(html_col).to_pylist()
                        if t.num_rows else []):
            if h is None:
                continue
            if isinstance(h, str):
                h = h.encode("utf-8", "replace")
            lang = None
            lm = _HTML_LANG_RE.search(h)
            if lm:
                lang = _unquote(lm.group(1))
            charset = desc = ogt = None
            noindex = False
            for m in _META_TAG_RE.finditer(h):
                tag = m.group(0)
                cm = _ATTR_RES["charset"].search(tag)
                # only the HTML5 <meta charset=...> form — an
                # http-equiv Content-Type tag carries charset= inside
                # its content attribute and is skipped here
                if cm and charset is None and \
                        not _ATTR_RES["content"].search(tag):
                    charset = _unquote(cm.group(1))
                nm = _ATTR_RES["name"].search(tag)
                name = (_unquote(nm.group(1)) or "").lower() \
                    if nm else ""
                con = _ATTR_RES["content"].search(tag)
                content = _unquote(con.group(1)) if con else None
                if name == "description" and desc is None:
                    desc = content
                elif name == "robots" and content and \
                        "noindex" in content.lower():
                    noindex = True
                pm = _ATTR_RES["property"].search(tag)
                prop = (_unquote(pm.group(1)) or "").lower() \
                    if pm else ""
                if prop == "og:title" and ogt is None:
                    ogt = content
            urls.append(u)
            langs.append(lang)
            chars.append(charset)
            descs.append(desc)
            ogts.append(ogt)
            noidx.append(noindex)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "charset": pa.array(chars, pa.string()),
            "description": pa.array(descs, pa.string()),
            "og_title": pa.array(ogts, pa.string()),
            "noindex": pa.array(noidx, pa.bool_())})

    return ds.map_batches(extract, batch_format="pyarrow")
