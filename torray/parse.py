"""Page-content extraction: title, links, forms, hash, content type,
HTTP status taxonomy, and the canonical scan-result encoding.

Behavioral re-implementation of the reference's parser layer
(``/root/reference/libs/parsers.py``, ``libs/functions.py``,
``libs/classes.py`` and the status-code tables inlined in
``TorSpider.py:156-172``).  Every function here is differentially
tested byte-for-byte against the reference libs (imported as a test
oracle — see ``tests/conftest.py``).

All extractors are pure and per-document; they run inside the batched
extract stage (``torray.extract``).  The ``html.parser.HTMLParser``
base class is the same stdlib machinery the reference builds on, so
tokenization quirks (charref folding, data-chunk splitting, startend
tags) match by construction.
"""

from __future__ import annotations

import json
from hashlib import sha1
from html.parser import HTMLParser

__all__ = [
    "extract_title",
    "extract_links_raw",
    "extract_links",
    "extract_forms",
    "forms_to_json",
    "page_hash",
    "content_type_of",
    "classify_status",
    "REDIRECT_CODES",
    "FAULT_CODES",
    "NO_FAULT_CODES",
    "GOOD_CODES",
    "ScanResult",
    "unique_sorted",
]

from torray.urlnorm import is_onion, normalize_link

# ---------------------------------------------------------------------------
# Status taxonomy (literal tables from /root/reference/TorSpider.py:156-172).
# ---------------------------------------------------------------------------

REDIRECT_CODES = frozenset({301, 302, 303, 307, 308})
FAULT_CODES = frozenset(
    {400, 401, 403, 404, 405, 406, 410, 413, 414, 444, 451, 495, 496,
     500, 501, 502, 505, 508, 511}
)
NO_FAULT_CODES = frozenset({408, 421, 423, 429, 503, 504})
GOOD_CODES = frozenset({200, 201})


def classify_status(code: int) -> str:
    """Route an HTTP status code the way the reference's branch ladder
    does (``/root/reference/TorSpider.py:182-234``): ``redirect`` |
    ``fault`` | ``no_fault`` | ``good`` | ``unknown``.  Unknown codes
    are recorded as faults with the literal code string by the caller.
    """
    if code in REDIRECT_CODES:
        return "redirect"
    if code in FAULT_CODES:
        return "fault"
    if code in NO_FAULT_CODES:
        return "no_fault"
    if code in GOOD_CODES:
        return "good"
    return "unknown"


def content_type_of(headers) -> str | None:
    """Main content type ('text', 'image', ...) or None when absent.

    Reference: ``get_type``, ``/root/reference/libs/functions.py:87-92``
    (any exception — missing header, non-mapping — yields None).
    """
    try:
        return headers["Content-Type"].split("/")[0]
    except Exception:
        return None


def page_hash(data: bytes) -> str:
    """sha1 hexdigest of the raw page bytes
    (reference: ``/root/reference/libs/functions.py:71-73``)."""
    return sha1(data).hexdigest()


def unique_sorted(items) -> list:
    """Canonical form of the reference's ``unique`` (= ``list(set(x))``,
    ``/root/reference/libs/functions.py:131-133``): same elements, but
    sorted, because set iteration order is run-dependent and our
    per-row byte-equality oracle needs a canonical ordering.
    """
    return sorted(set(items))


# ---------------------------------------------------------------------------
# Title extraction.
# ---------------------------------------------------------------------------


class _TitleSniffer(HTMLParser):
    """Reproduces ``ParseTitle`` (``/root/reference/libs/parsers.py:22-34``):
    every start tag re-arms or disarms capture (``<title>`` arms, any
    other start tag disarms), and the first data chunk after an armed
    tag is captured then disarms.  Net effect: the LAST ``<title>``
    whose text immediately follows it wins; intervening tags cancel.
    """

    def __init__(self) -> None:
        super().__init__()
        self._armed = False
        self.title = ""

    def handle_starttag(self, tag, attrs):
        self._armed = tag == "title"

    def handle_data(self, data):
        if self._armed:
            self.title = data
            self._armed = False


def extract_title(html_text: str) -> str:
    """Page title per the reference semantics, stripped.

    Reference: ``get_title`` (``/root/reference/libs/parsers.py:260-264``).
    Raises on malformed-enough input exactly like the reference; the
    caller maps any exception to ``'Unknown'``
    (``/root/reference/TorSpider.py:272-275``).
    """
    sniffer = _TitleSniffer()
    sniffer.feed(html_text)
    return sniffer.title.strip()


# ---------------------------------------------------------------------------
# Link extraction.
# ---------------------------------------------------------------------------


class _HrefCollector(HTMLParser):
    """Collects the ``href`` attribute of every ``<a>`` start tag
    (missing href collected as None), as ``ParseLinks`` does
    (``/root/reference/libs/parsers.py:11-19``)."""

    def __init__(self) -> None:
        super().__init__()
        self.hrefs: list[str | None] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self.hrefs.append(dict(attrs).get("href"))


def normalize_hrefs(hrefs: list, page_url: str) -> list[str]:
    """The per-link normalization loop of ``get_links``, over already-
    collected hrefs (sorted-unique canonical order)."""
    links = []
    for href in hrefs:
        normalized = normalize_link(href, page_url)
        if normalized is not None:
            links.append(normalized)
    return unique_sorted(links)


def extract_links_raw(html_text: str, page_url: str) -> list[str]:
    """All normalized onion links on a page, duplicates removed but in
    set-equivalent canonical (sorted) order.

    Reference: ``get_links`` (``/root/reference/libs/parsers.py:214-257``)
    — the per-link normalization lives in
    :func:`torray.urlnorm.normalize_link`; the reference's final
    ``unique`` (set-based, order-destroying) is canonicalized to sorted.
    """
    collector = _HrefCollector()
    collector.feed(html_text)
    return normalize_hrefs(collector.hrefs, page_url)


def extract_links(html_text: str, page_url: str) -> list[str]:
    """Links as the crawler records them into ``new_urls``: the
    extractor's output re-filtered by the onion predicate (the
    reference applies the filter a second time at
    ``/root/reference/TorSpider.py:311-314``)."""
    return [u for u in extract_links_raw(html_text, page_url) if is_onion(u)]


# ---------------------------------------------------------------------------
# Form extraction.
# ---------------------------------------------------------------------------

_TEXTUAL_INPUTS = ("text", "password", "email", "search", "tel", "url")
# input type -> name-list field it accumulates into
_NAME_LIST_INPUTS = {
    "date": "dates",
    "datetime-local": "datetimes",
    "month": "months",
    "number": "numbers",
    "range": "ranges",
    "time": "times",
    "week": "weeks",
}


class _FormCollector(HTMLParser):
    """Reproduces ``FormParser`` (``/root/reference/libs/parsers.py:37-201``).

    Output: ``self.forms`` — a list, one entry per ``</form>``, each a
    list of ``(key, value)`` tuples in the reference's exact insertion
    order (action, method, target, text_fields, radio_buttons,
    checkboxes, dropdowns, text_areas, dates, datetimes, months,
    numbers, ranges, times, weeks).  Converting with ``dict(...)``
    yields the schema documented at
    ``/root/reference/libs/parsers.py:38-67``.

    Faithfully kept quirks:
    - the collector starts "armed" (``_in_form=True`` after init), so
      inputs appearing before any ``<form>`` accumulate and are emitted
      as a phantom form by a stray ``</form>`` (with no
      action/method/target entries, since those are only appended at a
      ``<form>`` start tag);
    - a real ``<form>`` start tag resets all accumulated fields;
    - after a ``</form>`` the collector is disarmed until the next
      ``<form>``, so between-form inputs are ignored;
    - ``type=submit`` inputs are ignored; unknown input types are
      silently dropped;
    - textarea capture keeps only the LAST data chunk, stripped;
    - ``<option>`` values accumulate regardless of an enclosing
      ``<select>``; ``</select>`` without ``<select>`` raises
      AttributeError out of the feed (propagated, as the reference
      does — ``select_name`` is only created by a ``<select>`` tag);
    - duplicate checkbox/radio names append values in document order.
    """

    def __init__(self) -> None:
        super().__init__()
        self.forms: list[list[tuple]] = []
        self._in_textarea = False
        self._reset()

    def _reset(self) -> None:
        self._in_form = True
        self._tuples: list[tuple] = []
        self._select_options: list = []
        self._text_fields: dict = {}
        self._textarea_value = ""
        self._radio_buttons: dict = {}
        self._checkboxes: dict = {}
        self._dropdowns: dict = {}
        self._text_areas: dict = {}
        self._name_lists: dict[str, list] = {
            field: [] for field in
            ("dates", "datetimes", "months", "numbers", "ranges", "times", "weeks")
        }

    def handle_starttag(self, tag, attrs):
        if tag == "form":
            self._reset()
            attr_map = dict(attrs)
            self._tuples.append(("action", attr_map.get("action")))
            self._tuples.append(("method", attr_map.get("method")))
            self._tuples.append(("target", attr_map.get("target")))
        elif tag == "textarea":
            self._textarea_name = dict(attrs).get("name")
            self._in_textarea = True
            self._textarea_value = ""
        elif tag == "select":
            self._select_name = dict(attrs).get("name")
            self._select_options = []
        elif tag == "option":
            self._select_options.append(dict(attrs).get("value"))
        elif tag == "input":
            attr_map = dict(attrs)
            input_type = attr_map.get("type")
            input_name = attr_map.get("name")
            input_value = attr_map.get("value")
            if not (self._in_form and input_type != "submit"):
                return
            if input_type in _TEXTUAL_INPUTS:
                self._text_fields[input_name] = input_value
            elif input_type in _NAME_LIST_INPUTS:
                self._name_lists[_NAME_LIST_INPUTS[input_type]].append(input_name)
            elif input_type == "checkbox":
                self._checkboxes.setdefault(input_name, []).append(input_value)
            elif input_type == "radio":
                self._radio_buttons.setdefault(input_name, []).append(input_value)

    def handle_data(self, data):
        if self._in_textarea:
            self._textarea_value = data.strip()

    def handle_endtag(self, tag):
        if tag == "form":
            self._in_form = False
            self._tuples.append(("text_fields", self._text_fields))
            self._tuples.append(("radio_buttons", self._radio_buttons))
            self._tuples.append(("checkboxes", self._checkboxes))
            self._tuples.append(("dropdowns", self._dropdowns))
            self._tuples.append(("text_areas", self._text_areas))
            for field in ("dates", "datetimes", "months", "numbers",
                          "ranges", "times", "weeks"):
                self._tuples.append((field, self._name_lists[field]))
            self.forms.append(self._tuples)
        elif tag == "textarea":
            self._in_textarea = False
            try:
                self._text_areas[self._textarea_name] = self._textarea_value
            except Exception:
                pass
            self._textarea_name = ""
        elif tag == "select":
            self._dropdowns[self._select_name] = self._select_options
            self._select_name = ""
            self._select_options = []


def extract_forms(html_text: str) -> list[list[tuple]]:
    """All forms on a page as lists of (key, value) tuples.

    Reference: ``get_forms`` (``/root/reference/libs/parsers.py:207-211``).
    """
    collector = _FormCollector()
    collector.feed(html_text)
    return collector.forms


def forms_to_json(forms: list[list[tuple]]) -> str:
    """Canonical JSON encoding of a page's forms: a JSON array of the
    per-form dicts exactly as the crawler builds them
    (``dict(form)`` per form, ``/root/reference/TorSpider.py:321-325``),
    serialized with stdlib defaults like the reference's result encoder
    (``json.dumps``, ``/root/reference/libs/classes.py:17-18``)."""
    return json.dumps([dict(form) for form in forms])


# ---------------------------------------------------------------------------
# Fused single-pass parsing (hot-path optimization).
# ---------------------------------------------------------------------------


class ParsedPage:
    """Output of one fused tokenizer pass."""

    __slots__ = ("title", "hrefs", "forms", "form_exc", "feed_exc")

    def __init__(self, title, hrefs, forms, form_exc, feed_exc):
        self.title = title
        self.hrefs = hrefs
        self.forms = forms
        self.form_exc = form_exc
        self.feed_exc = feed_exc


class _FusedSniffer(HTMLParser):
    """Single tokenizer pass feeding all three extraction machines.

    The reference tokenizes each page three times (ParseTitle /
    ParseLinks / FormParser are independent ``HTMLParser`` subclasses
    fed the same text); since the machines are independent, driving
    them from one stdlib tokenizer yields byte-identical state while
    paying tokenization once.  Form-machine exceptions (the stray
    ``</select>`` path the reference lets escape ``get_forms``) are
    DEFERRED — recorded here and re-raised only when forms are actually
    consumed, so title/links still complete exactly as the reference's
    separate passes would.
    """

    def __init__(self) -> None:
        super().__init__()
        self._title_armed = False
        self.title = ""
        self.hrefs: list = []
        self._forms = _FormCollector()
        self.form_exc: Exception | None = None

    def handle_starttag(self, tag, attrs):
        self._title_armed = tag == "title"
        if tag == "a":
            self.hrefs.append(dict(attrs).get("href"))
        if self.form_exc is None:
            try:
                self._forms.handle_starttag(tag, attrs)
            except Exception as e:
                self.form_exc = e

    def handle_data(self, data):
        if self._title_armed:
            self.title = data
            self._title_armed = False
        if self.form_exc is None:
            try:
                self._forms.handle_data(data)
            except Exception as e:
                self.form_exc = e

    def handle_endtag(self, tag):
        if self.form_exc is None:
            try:
                self._forms.handle_endtag(tag)
            except Exception as e:
                self.form_exc = e


def parse_page(html_text: str) -> ParsedPage:
    """One-pass title + hrefs + forms.  Tokenizer-level exceptions are
    captured in ``feed_exc`` (the caller reproduces the reference's
    per-extractor exception behavior: 'Unknown' title, crash on link /
    form extraction)."""
    sniffer = _FusedSniffer()
    try:
        sniffer.feed(html_text)
        feed_exc = None
    except Exception as e:
        feed_exc = e
    title = sniffer.title.strip() if feed_exc is None else None
    return ParsedPage(title, sniffer.hrefs, sniffer._forms.forms,
                      sniffer.form_exc, feed_exc)


# ---------------------------------------------------------------------------
# The scan-result record.
# ---------------------------------------------------------------------------


class ScanResult:
    """One URL-scan outcome — field set and insertion order mirror the
    reference's ``SpiderURL`` (``/root/reference/libs/classes.py:5-18``),
    with ``scan_date`` injected (operators never read the wall clock).
    """

    __slots__ = ("new_urls", "online", "url", "scan_date", "last_node",
                 "fault", "title", "form_dicts", "hash", "redirect",
                 "retry")

    def __init__(self, scan_date: str) -> None:
        self.new_urls: list[str] = []
        self.online: bool = False
        self.url: str | None = None
        self.scan_date: str = scan_date
        self.last_node: str | None = None
        self.fault: str | None = None
        self.title: str | None = None
        self.form_dicts: list[dict] = []
        self.hash: str | None = None
        self.redirect: str | None = None
        # Not a reported field: marks the retryable no-fault-status
        # outcome (reference TorSpider.py:168 codes, re-served by the
        # backend) so the engine can requeue the url.
        self.retry: bool = False

    def to_json(self) -> str:
        """Reference-shaped JSON (same key order as ``SpiderURL.__dict__``
        with ``redirect`` appended last, as the crawler sets it after
        construction — ``/root/reference/TorSpider.py:149``), except
        ``new_urls`` is in canonical sorted order (see
        :func:`unique_sorted`)."""
        return json.dumps({
            "new_urls": self.new_urls,
            "online": self.online,
            "url": self.url,
            "scan_date": self.scan_date,
            "last_node": self.last_node,
            "fault": self.fault,
            "title": self.title,
            "form_dicts": self.form_dicts,
            "hash": self.hash,
            "redirect": self.redirect,
        })

    def extracted_text(self) -> str:
        """The per-row byte-equality invariant (FIXTURES.md F4):
        ``title ∥ sorted new_urls ∥ canonical forms JSON ∥ hash``."""
        return "\n".join([
            self.title if self.title is not None else "",
            json.dumps(self.new_urls),
            json.dumps(self.form_dicts),
            self.hash if self.hash is not None else "",
        ])
