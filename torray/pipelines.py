"""Composed pipelines over the operator library — the "what a user
actually runs" layer.

``curate_documents`` is the canonical LLM-corpus curation chain
(C4/Gopher/RefinedWeb-style, public recipes) expressed Ray-Data-first:

    annotate (lang-ID + quality, one fused map_batches)
      -> filter (language allowlist, quality floor)
      -> exact dedup        (hash groupby -> keeper join; text never
                             rides a shuffle)
      -> near-dup removal   (MinHash-LSH pairs -> anti-join the losers)
      -> hash_split         (deterministic train/test tag)

Every stage is a streaming Dataset transform; the only driver-side
values are tiny stage counters.  Shuffle discipline: the exact-dedup
and near-dup stages shuffle (hash, doc_id) / (band_key, doc_id) rows
only, and the anti-joins move ids — document text stays in its blocks
from read to write.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["curate_documents", "corpus_from_crawl", "canonical_docs",
           "harvest_corpus"]


class _CurateEncoderStage:
    """Actor-pool shell around
    :class:`torray.ops.similarity.HashedNgramEncoder` for the
    curation chain: encodes each batch's text and passes the curation
    columns through with the vector appended (text dropped)."""

    def __init__(self, dim: int):
        from torray.ops.similarity import HashedNgramEncoder

        self.enc = HashedNgramEncoder(dim=dim)

    def __call__(self, t: pa.Table) -> pa.Table:
        vecs = self.enc(t)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lang_pred": t.column("lang_pred"),
            "quality": t.column("quality"),
            "split": t.column("split"),
            "embedding": vecs.column("embedding")})


def _canonical_is_self(href: str, page_url: str) -> bool:
    """True when a ``<link rel=canonical>`` href denotes the page
    itself: the href is resolved against the page url (RFC 3986
    urljoin, so relative hrefs work) and compared component-wise with
    case-folded scheme/host and '' == '/' path equivalence.  An
    unparseable href counts as not-self (conservative: the publisher
    declared SOMETHING other than a clean self-reference)."""
    from urllib.parse import urljoin, urlsplit
    try:
        a = urlsplit(urljoin(page_url, href.strip()))
        b = urlsplit(page_url)
    except ValueError:
        return False
    return ((a.scheme.lower(), a.netloc.lower(), a.path or "/", a.query)
            == (b.scheme.lower(), b.netloc.lower(), b.path or "/",
                b.query))


def curate_documents(docs_ds, *, langs: tuple[str, ...] | None = ("en",),
                     min_quality: float = 0.25,
                     near_dup_threshold: float = 0.8,
                     test_frac: float = 0.1, salt: str = "v1",
                     num_partitions: int = 8,
                     embed_dim: int | None = None):
    """Returns a Dataset of surviving documents with columns
    (doc_id, lang_pred, quality, split) — plus ``embedding``
    (list<float32>) when ``embed_dim`` is set.

    ``langs=None`` disables the language filter.  Near-dup removal
    keeps the smaller doc_id of every verified pair (the canonical
    keeper rule, matching exact dedup).

    ``embed_dim`` switches on the ENCODER stage
    (:class:`torray.ops.similarity.HashedNgramEncoder` actor pool —
    the GPU-model-shaped slot): survivors are encoded from the text
    they still carry at that point in the chain, vectors ride out
    columnar, and the SemDeDup family consumes the output directly."""
    import hashlib

    import ray.data

    from torray.ops.dedup import minhash_lsh_dedup
    from torray.ops.sampling import hash_split
    from torray.ops.text import lang_id_batch, quality_batch

    def annotate(batch: pa.Table) -> pa.Table:
        lang = lang_id_batch(batch)
        qual = quality_batch(batch)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": batch.column("text"),
            "lang_pred": lang.column("lang_pred"),
            "quality": qual.column("quality"),
        })

    ann = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        annotate, batch_format="pyarrow")

    def keep_filter(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch.column("quality"), min_quality)
        if langs is not None:
            mask = pc.and_(mask, pc.is_in(
                batch.column("lang_pred"),
                value_set=pa.array(list(langs), pa.string())))
        return batch.filter(mask)

    kept = ann.map_batches(keep_filter, batch_format="pyarrow")

    # Exact dedup, scale shape: hash -> min-doc_id keepers -> inner join
    # back on doc_id (ids shuffle, text does not).
    def hash_ids(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.md5((t or "").encode()).hexdigest()
                  for t in batch.column("text").to_pylist()]
        return pa.table({"text_hash": pa.array(hashes, pa.string()),
                         "doc_id": batch.column("doc_id")})

    keepers = (kept.map_batches(hash_ids, batch_format="pyarrow")
               .groupby("text_hash")
               .aggregate(ray.data.aggregate.Min("doc_id"))
               .map_batches(
                   lambda t: pa.table({"doc_id": t.column("min(doc_id)")}),
                   batch_format="pyarrow"))
    # Materialized ONCE: four downstream consumers (minhash banding,
    # its two verify joins, the final loser tag join) would otherwise
    # each re-execute the annotate+filter+join lineage.  Blocks pin in
    # the object store and spill to disk at scale — recomputing the
    # per-document annotation 4x is the costlier side everywhere.
    from torray.ops.join import safe_join

    unique_docs = safe_join(kept, keepers, "inner", num_partitions,
                            on=("doc_id",)).materialize()

    # Near-dup removal: verified pairs -> drop every larger id.  The
    # loser-id set is ids only (bounded), so materializing it both
    # avoids re-executing the pair DAG and anchors the join schema.
    pairs = minhash_lsh_dedup(unique_docs, threshold=near_dup_threshold,
                              num_partitions=num_partitions)
    losers = (pairs.groupby("id_b").count().map_batches(
        lambda t: pa.table({"doc_id": t.column("id_b"),
                            "__loser": pa.array([True] * t.num_rows,
                                                pa.bool_())}),
        batch_format="pyarrow")).materialize()
    if losers.count() == 0:
        survivors = unique_docs
    else:
        losers = losers.repartition(num_partitions).materialize()
        tagged = safe_join(unique_docs, losers, "left_outer",
                           num_partitions, on=("doc_id",))
        survivors = tagged.map_batches(
            lambda t: t.filter(pc.is_null(t.column("__loser"))).drop_columns(
                ["__loser"]),
            batch_format="pyarrow")

    out = hash_split(survivors, "doc_id", test_frac=test_frac, salt=salt)
    if embed_dim is None:
        return out.map_batches(
            lambda t: t.select(["doc_id", "lang_pred", "quality",
                                "split"]),
            batch_format="pyarrow")

    # Encoder stage (actor pool, model state once per actor):
    # survivors still carry text here — encode, then drop the text so
    # only narrow rows + dim x 4 byte vectors leave the stage.
    return out.map_batches(
        lambda t: t.select(["doc_id", "text", "lang_pred", "quality",
                            "split"]),
        batch_format="pyarrow"
    ).map_batches(
        _CurateEncoderStage,
        fn_constructor_kwargs={"dim": embed_dim},
        concurrency=2, batch_size=256, batch_format="pyarrow")


def corpus_from_crawl(pages_ds, seen_ds, *, url_col: str = "url",
                      num_partitions: int = 8, **curate_kwargs):
    """Crawl output -> train-ready corpus, end to end: the pages the
    crawl actually discovered (semi-join of the Common-Crawl-style
    pages table against the crawl's URL-seen snapshot —
    ``Crawler.seen_snapshot_ds()``) flow straight into
    :func:`curate_documents`.  Returns curated rows
    ``(doc_id, url, lang_pred, quality, split)``.

    Scale shape: the seen set folds into a broadcast Bloom prefilter
    (``ops.bloom.bloom_semijoin``), so the wide pages table is cut
    BEFORE any shuffle; doc ids are stable 63-bit url hashes, so
    re-running over a grown crawl keeps earlier ids (incremental
    corpus builds); the curation chain then shuffles ids/hashes only,
    exactly as in :func:`curate_documents`.
    """
    import hashlib

    from torray.ops.bloom import bloom_semijoin

    crawled = bloom_semijoin(
        pages_ds.select_columns([url_col, "text"]),
        seen_ds.select_columns([url_col]),
        big_key=url_col, small_key=url_col,
        num_partitions=num_partitions)

    def to_docs(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        ids = [int.from_bytes(hashlib.md5(u.encode()).digest()[:8],
                              "big") >> 1 for u in urls]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "text": t.column("text"),
        })

    docs = crawled.map_batches(to_docs, batch_format="pyarrow")
    id_map = docs.map_batches(lambda t: t.select(["doc_id", "url"]),
                              batch_format="pyarrow")
    curated = curate_documents(docs, num_partitions=num_partitions,
                               **curate_kwargs)
    from torray.ops.join import safe_join

    joined = safe_join(curated, id_map, "inner", num_partitions,
                       on=("doc_id",))
    return joined.map_batches(
        lambda t: t.select(["doc_id", "url", "lang_pred", "quality",
                            "split"]),
        batch_format="pyarrow")


def canonical_docs(docs_ds, pairs_ds, *, id_col: str = "doc_id",
                   quality_col: str = "n_chars",
                   num_partitions: int = 4):
    """Canonical-representative selection for duplicate clusters: given
    near-dup PAIRS, label each clustered doc with the cluster's KEEPER
    — the member with the highest ``quality_col`` (ties -> lowest id).
    The curation upgrade over min-id dedup: when a page exists in five
    mutilated copies, keep the most complete one, not the one with the
    smallest id.

    Returns ``(node, keeper)`` covering exactly the docs that appear
    in >= 1 pair (singletons are trivially their own keepers and never
    enter a shuffle).

    Shape: :func:`torray.ops.graph.connected_components` (int64-only
    label propagation) -> one inner join against the docs table to
    attach quality (the components side is bounded by CLUSTERED docs,
    not the corpus) -> :func:`torray.ops.orderagg.group_argmax` picks
    each cluster's keeper (block-local partial, losers never leave
    their block) -> one narrow (component -> keeper) join back onto
    the labels."""
    import ray

    from torray.ops.graph import connected_components
    from torray.ops.orderagg import group_argmax

    cluster_cpus = int(ray.cluster_resources().get("CPU", 0)
                       or num_partitions)
    join_parts = max(2, min(num_partitions, cluster_cpus))

    comp = connected_components(
        pairs_ds, num_partitions=num_partitions).materialize()

    def qual_side(t: pa.Table) -> pa.Table:
        q = pc.cast(t.column(quality_col), pa.int64())
        return pa.table({"node": pc.cast(t.column(id_col), pa.int64()),
                         "__q": q,
                         # same-direction tiebreak: max(-id) == min(id)
                         "__negid": pc.negate_checked(
                             pc.cast(t.column(id_col), pa.int64()))})

    quality = docs_ds.select_columns([id_col, quality_col]).map_batches(
        qual_side, batch_format="pyarrow")
    from torray.ops.join import safe_join

    labeled = safe_join(comp, quality, "inner", join_parts,
                        on=("node",))

    keepers = group_argmax(labeled, group_col="component",
                           order_cols=["__q", "__negid"], mode="max",
                           num_partitions=num_partitions)

    def to_keeper(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"component": pa.array([], pa.int64()),
                             "keeper": pa.array([], pa.int64())})
        return pa.table({
            "component": t.column("component"),
            "keeper": pc.negate_checked(t.column("__negid")),
        })

    out = safe_join(comp, keepers.map_batches(to_keeper,
                                              batch_format="pyarrow"),
                    "inner", join_parts, on=("component",))
    return out.select_columns(["node", "keeper"])


def harvest_corpus(pages_ds, robots_rules=(), *,
                   url_col: str = "url", html_col: str = "html",
                   langs: tuple[str, ...] | None = None):
    """Raw HTML pages -> training-corpus rows: the session-7 webtext
    extraction layer composed end-to-end, every gate a streaming
    batch transform over the SAME pass so page bytes are read once
    and never shuffled:

        robots_filter (policy rules, broadcast once)
          -> page_metadata gates (drop robots-noindex pages; optional
             declared-language allowlist)
          -> canonical gate (drop pages whose <link rel=canonical>
             points at a DIFFERENT url — the publisher already told
             us which copy to keep)
          -> extract_page_text (script/style removal, entity decode)

    Returns ``(url, lang, text)``.  The metadata/canonical gates fuse
    into one map_batches each; only the narrow output rows leave the
    extraction blocks — at 100 TB the html column is read exactly
    once and dropped inside the task.
    """
    import re as _re

    from torray.ops.anchors import (_HREF_RE, _LINK_TAG_RE,
                                    _REL_CANON_RE, _unquote)
    from torray.ops.policy import robots_filter
    from torray.ops.text import html_to_text

    ds = pages_ds
    if robots_rules:
        ds = robots_filter(ds, robots_rules, url_col=url_col)

    lang_set = set(langs) if langs is not None else None
    lang_re = _re.compile(
        rb"""<html\b[^>]*?\blang\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""",
        _re.IGNORECASE)
    noidx_re = _re.compile(
        rb"""<meta\b[^>]*\bname\s*=\s*["']?robots["']?[^>]*>""",
        _re.IGNORECASE)
    content_re = _re.compile(
        rb"""\bcontent\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""",
        _re.IGNORECASE)

    def gate_and_extract(t: pa.Table) -> pa.Table:
        urls_out, langs_out, texts_out = [], [], []
        for u, h in zip(t.column(url_col).to_pylist(),
                        t.column(html_col).to_pylist()
                        if t.num_rows else []):
            if h is None:
                continue
            hb = h.encode("utf-8", "replace") if isinstance(h, str) \
                else bytes(h)
            # noindex gate
            skip = False
            for m in noidx_re.finditer(hb):
                cm = content_re.search(m.group(0))
                if cm and b"noindex" in (cm.group(1) or b"").lower():
                    skip = True
                    break
            if skip:
                continue
            # declared-language gate
            lm = lang_re.search(hb)
            lang = _unquote(lm.group(1)) if lm else None
            if lang_set is not None and lang not in lang_set:
                continue
            # canonical gate: first declaration, must be self or absent.
            # The href is RESOLVED against the page url before the
            # comparison — publishers routinely declare relative
            # self-canonicals (href="/p1") and scheme/case variants,
            # and a raw string-equality gate would silently drop
            # every such valid page.
            canon = None
            for m in _LINK_TAG_RE.finditer(hb):
                tag = m.group(0)
                if not _REL_CANON_RE.search(tag):
                    continue
                hm = _HREF_RE.search(tag)
                if hm:
                    canon = _unquote(hm.group(1))
                break
            if canon is not None and not _canonical_is_self(canon, u):
                continue
            urls_out.append(u)
            langs_out.append(lang)
            texts_out.append(html_to_text(hb))
        return pa.table({
            "url": pa.array(urls_out, pa.string()),
            "lang": pa.array(langs_out, pa.string()),
            "text": pa.array(texts_out, pa.string())})

    return ds.map_batches(gate_and_extract, batch_format="pyarrow")
