"""The batched scan stage: Arrow page batches in, scan-result batches out.

This is the engine's hot stage — the Ray-Data expression of the
reference's per-URL ``Spider.crawl`` body (M1-M12 in SURVEY.md §2.2),
run as ``map_batches(batch_format="pyarrow")`` over zero-copy blocks.
Per-row Python is confined to the HTML parsers themselves (inherently
per-document — the reference's own parsers are stdlib ``HTMLParser``
state machines, and byte-parity pins us to their tokenization);
everything around them stays columnar.

Output schema is FIXTURES.md F4 plus a ``host`` partition-key column
(carried so downstream shuffles never need to re-derive it) —
``new_urls`` stays a proper ``list<string>`` column so the link
explosion downstream is a zero-copy ``flatten``.
"""

from __future__ import annotations

import pyarrow as pa

from torray.fetch import scan_page
from torray.urlnorm import host_of

__all__ = ["SCAN_SCHEMA", "scan_batch", "scan_pages_dataset"]

SCAN_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("host", pa.string()),
    ("scan_date", pa.string()),
    ("last_node", pa.string()),
    ("online", pa.bool_()),
    ("fault", pa.string()),
    ("redirect", pa.string()),
    ("title", pa.string()),
    ("hash", pa.string()),
    ("new_urls", pa.list_(pa.string())),
    ("form_dicts", pa.string()),
])


def results_to_table(results) -> pa.Table:
    """Materialize an iterable of ScanResult into a SCAN_SCHEMA table."""
    import json

    cols = {name: [] for name in SCAN_SCHEMA.names}
    for r in results:
        cols["url"].append(r.url)
        cols["host"].append(host_of(r.url))
        cols["scan_date"].append(r.scan_date)
        cols["last_node"].append(r.last_node)
        cols["online"].append(r.online)
        cols["fault"].append(r.fault)
        cols["redirect"].append(r.redirect)
        cols["title"].append(r.title)
        cols["hash"].append(r.hash)
        cols["new_urls"].append(r.new_urls)
        cols["form_dicts"].append(json.dumps(r.form_dicts))
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in SCAN_SCHEMA],
        schema=SCAN_SCHEMA,
    )


def scan_batch(
    batch: pa.Table,
    *,
    scan_date: str,
    node: str = "torray",
    carry_cols: tuple[str, ...] = (),
    extractors: tuple = (),
    emit_retry: bool = False,
) -> pa.Table:
    """Scan a batch of page rows (columns ``url``, ``html``, optional
    ``present`` bool and ``last_hash``).

    Rows with ``present`` false take the offline path (``present``
    defaults to true when the column is absent — a plain table scan);
    ``last_hash`` drives the change-detection branch.  Rows the
    reference drops silently (chunked / not-implemented) emit nothing.
    """
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    if "present" in batch.column_names:
        presents = batch.column("present").to_pylist()
    else:
        presents = [True] * len(urls)
    if "last_hash" in batch.column_names:
        last_hashes = [h if h else "" for h in batch.column("last_hash").to_pylist()]
    else:
        last_hashes = [""] * len(urls)

    carried_in = {c: batch.column(c).to_pylist() for c in carry_cols}
    results = []
    carried_out: dict[str, list] = {c: [] for c in carry_cols}
    extra_out: dict[str, list] = {name: [] for name, _fn, _t in extractors}
    for i, (url, html, present, last_hash) in enumerate(
            zip(urls, htmls, presents, last_hashes)):
        r = scan_page(url, bool(present), html, last_hash, scan_date, node)
        if r is not None:
            results.append(r)
            for c in carry_cols:
                carried_out[c].append(carried_in[c][i])
            if extractors:
                # User extractors run only where the reference would
                # have parsed content (the parser-module extension
                # boundary, SURVEY.md §2.10): rows whose content was
                # fetched and changed, i.e. hash is set.
                if r.hash is not None:
                    text = (html or b"").decode("utf-8", "replace")
                    for name, fn, _t in extractors:
                        extra_out[name].append(fn(text, url))
                else:
                    for name, _fn, _t in extractors:
                        extra_out[name].append(None)
    out = results_to_table(results)
    for c in carry_cols:
        out = out.append_column(
            c, pa.array(carried_out[c], batch.schema.field(c).type))
    for name, _fn, typ in extractors:
        out = out.append_column(name, pa.array(extra_out[name], typ))
    if emit_retry:
        # Requeue marker (not part of the reported SCAN_SCHEMA — the
        # crawl engine peels it off after building the retry frontier).
        out = out.append_column(
            "retry", pa.array([r.retry for r in results], pa.bool_()))
    return out


def scan_pages_dataset(pages_ds, *, scan_date: str, node: str = "torray",
                       batch_size: int = 1024, extractors: tuple = ()):
    """Scan every row of a pages Dataset (the 'scan the whole web' mode
    — no frontier; also the flagship ``entry()`` slice).

    Column-prunes to (url, html) before the batched scan; html bytes
    never survive past this stage.

    ``extractors``: user extension point (SURVEY.md §2.10) — tuples of
    ``(column_name, fn(html_text, url) -> value, pyarrow_type)``
    evaluated per content page alongside the built-in title/link/form
    extractors; results appear as extra output columns (null for rows
    the reference would not have parsed).
    """
    return pages_ds.select_columns(["url", "html"]).map_batches(
        lambda b: scan_batch(b, scan_date=scan_date, node=node,
                             extractors=extractors),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def scan_frontier_join(frontier_ds, pages_ds, *, scan_date: str,
                       node: str = "torray", num_partitions: int = 16):
    """Fetch-as-join: the SURVEY.md J1 ``Dataset.join`` mapping — a
    hash-partitioned LEFT OUTER join of the frontier against the pages
    table on ``url``, feeding the same scan stage.

    The crawl engine uses the bucketed page store instead (it avoids
    re-shuffling the wide side every round); this variant exists for
    parity/standalone use and as the natural choice when the frontier
    covers most of an UN-bucketed table exactly once.  Rows with no
    page match take the offline path (``present`` null -> false).
    """

    def mark_present(t: pa.Table) -> pa.Table:
        return t.append_column("present", pa.array([True] * t.num_rows))

    pages = pages_ds.select_columns(["url", "html"]).map_batches(
        mark_present, batch_format="pyarrow")
    from torray.ops.join import safe_join

    joined = safe_join(frontier_ds, pages, "left_outer",
                       num_partitions, on=("url",))
    return joined.map_batches(
        lambda b: scan_batch(b, scan_date=scan_date, node=node),
        batch_format="pyarrow",
    )
