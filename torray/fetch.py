"""Simulated fetch: the reference crawler's scan ladder over page rows.

In this engine the "web" is a Parquet table (BASELINE.json input_hint:
``url, warc_ts, html, text, lang``), so a fetch is a lookup: a frontier
URL either matches a page row or it doesn't.  This module defines the
deterministic mapping from (url, row) to the scan outcome, reproducing
the branch ladder of ``/root/reference/TorSpider.py:176-413`` —
status classification, redirect handling, content-type gating,
change detection, link/form extraction, and the exception taxonomy.

Because the 5-column page schema has no status/header columns, pages
carry an optional *directive* — an HTML comment at byte offset 0:

    <!--web status=301 location=/target-->
    <!--web status=404-->
    <!--web content-type=application/pdf-->
    <!--web exc=timeout-->

- no directive, ``html`` present  -> 200, ``text/html``
- ``html`` NULL                   -> 200, content type from the URL's
  extension (always non-text -> the ``type: ...`` fault path,
  reference ``TorSpider.py:242-266``)
- URL absent from the table       -> ConnectionError path (offline,
  reported with no fault, ``TorSpider.py:362-379``)
- non-http(s) scheme              -> InvalidSchema path
  (``TorSpider.py:341-353``); empty host -> InvalidURL path
  (``TorSpider.py:334-339``)
- ``exc=`` directives map to the remaining exception taxonomy rows
  (``timeout``/``ssl``/``too_many_redirects``/``chunked``/``memory``/
  ``not_implemented``/``conn``; ``TorSpider.py:355-408``).

The sha1 page hash covers the FULL html bytes (directive included),
mirroring ``get_hash(request.content)`` at ``TorSpider.py:287``.

The single-threaded oracle simulator in tests re-implements this
protocol independently (on top of the imported reference libs), so the
engine's outputs are differentially checked, not self-certified.
"""

from __future__ import annotations

from urllib.parse import urlsplit

from torray.parse import (
    ScanResult,
    classify_status,
    normalize_hrefs,
    page_hash,
    parse_page,
)
from torray.urlnorm import expand_schemes, is_onion, merge_redirect

__all__ = ["parse_directive", "content_type_for", "scan_page", "EXT_CONTENT_TYPES"]

_DIRECTIVE_PREFIX = b"<!--web "
_DIRECTIVE_END = b"-->"

# URL-extension -> content type for html-NULL rows (all non-text).
EXT_CONTENT_TYPES = {
    ".png": "image/png",
    ".jpg": "image/jpeg",
    ".gif": "image/gif",
    ".pdf": "application/pdf",
    ".zip": "application/zip",
    ".mp3": "audio/mpeg",
    ".mp4": "video/mp4",
    ".exe": "application/octet-stream",
}
_DEFAULT_BINARY_TYPE = "application/octet-stream"


def parse_directive(html: bytes | None) -> dict:
    """Parse the leading ``<!--web ...-->`` directive, if any.

    Returns a dict with optional keys ``status`` (int), ``location``
    (str), ``content-type`` (str), ``exc`` (str).  Unparseable
    directives are ignored (treated as plain content).
    """
    if not html or not html.startswith(_DIRECTIVE_PREFIX):
        return {}
    end = html.find(_DIRECTIVE_END, len(_DIRECTIVE_PREFIX))
    if end < 0:
        return {}
    body = html[len(_DIRECTIVE_PREFIX):end].decode("utf-8", "replace")
    out: dict = {}
    for token in body.split():
        key, sep, value = token.partition("=")
        if not sep:
            continue
        if key == "status":
            try:
                out["status"] = int(value)
            except ValueError:
                pass
        elif key in ("location", "content-type", "exc"):
            out[key] = value
    return out


def content_type_for(url: str, html: bytes | None, directive: dict) -> str | None:
    """Main content type ('text', 'image', ...) the simulated server
    reports for a page row, or None when it sends no Content-Type
    (directive ``content-type=none``)."""
    declared = directive.get("content-type")
    if declared == "none":
        return None
    if declared is not None:
        return declared.split("/")[0]
    if html is None:
        path = urlsplit(url)[2]
        dot = path.rfind(".")
        ext = path[dot:].lower() if dot >= 0 else ""
        return EXT_CONTENT_TYPES.get(ext, _DEFAULT_BINARY_TYPE).split("/")[0]
    return "text"


def scan_page(
    url: str,
    present: bool,
    html: bytes | None,
    last_hash: str,
    scan_date: str,
    node: str,
) -> ScanResult | None:
    """Scan one frontier URL against its page row.

    Returns the ScanResult to record, or ``None`` when the reference
    drops the result silently (ChunkedEncodingError /
    NotImplementedError paths, ``TorSpider.py:393-397,406-408``).
    Branch order mirrors ``Spider.crawl`` exactly.
    """
    result = ScanResult(scan_date)
    result.url = url
    result.last_node = node

    scheme, netloc = urlsplit(url)[0], urlsplit(url)[1]
    if scheme not in ("http", "https"):
        # requests raises InvalidSchema before any I/O.
        for candidate in expand_schemes(url):
            result.new_urls.append(candidate)
        result.new_urls = sorted(set(result.new_urls))
        result.fault = "invalid schema"
        return result
    if netloc == "":
        result.fault = "invalid url"
        return result

    if not present:
        # ConnectionError path: offline, no fault, still reported.
        return result

    directive = parse_directive(html)

    exc = directive.get("exc")
    if exc is not None:
        if exc == "timeout":
            return result  # no fault, offline (HEAD timed out)
        if exc == "ssl":
            result.fault = "Bad SSL"
            return result
        if exc == "too_many_redirects":
            result.fault = "redirect"
            return result
        if exc == "conn":
            return result  # ConnectionError with Tor healthy
        if exc == "chunked":
            return None  # dropped silently
        if exc == "memory":
            # MemoryError fires while reading the body, after the
            # status gate marked the domain online (TorSpider.py:237,399).
            result.online = True
            result.fault = "memory error"
            return result
        if exc == "not_implemented":
            return None  # dropped silently
        # Unknown exc token: treat as plain content.

    status = directive.get("status", 200)
    route = classify_status(status)

    if route == "redirect":
        result.fault = str(status)
        location = directive.get("location")
        if location is not None:
            target = merge_redirect(location, url)
            if is_onion(target):
                result.new_urls.append(target)
            result.redirect = target
        return result
    if route == "fault" or route == "unknown":
        result.fault = str(status)
        return result
    if route == "no_fault":
        # Retryable: the reference backend re-serves these urls
        # (no_fault_codes, TorSpider.py:168) — flag for requeue.
        result.retry = True
        return result

    # Good status: the domain is online.
    result.online = True

    ctype = content_type_for(url, html, directive)
    if ctype != "text" and ctype is not None:
        result.fault = "type: {0}".format(ctype)
        return result

    body = html if html is not None else b""
    text = body.decode("utf-8", "replace")

    # One fused tokenizer pass (torray.parse.parse_page) standing in
    # for the reference's three separate get_title/get_links/get_forms
    # feeds; exception behavior is reproduced per extractor below.
    parsed = parse_page(text)
    result.title = "Unknown" if parsed.feed_exc is not None else parsed.title

    digest = page_hash(body)
    if last_hash == digest:
        # Unchanged since last scan: record title+online only.
        return result
    result.hash = digest

    if parsed.feed_exc is not None:
        # get_links would have crashed the reference here
        # (TorSpider.py:308 sits inside the generic raise-through
        # handler at :410-412).
        raise parsed.feed_exc
    for link in normalize_hrefs(parsed.hrefs, url):
        if is_onion(link):
            result.new_urls.append(link)
    result.new_urls = sorted(set(result.new_urls))

    if parsed.form_exc is not None:
        raise parsed.form_exc  # get_forms crash path (parsers.py:180)
    for form in parsed.forms:
        result.form_dicts.append(dict(form))
    return result
