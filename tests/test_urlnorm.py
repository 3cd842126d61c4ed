"""Differential tests: torray.urlnorm vs the reference libs oracle."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from torray.urlnorm import (
    expand_schemes,
    host_of,
    is_onion,
    merge_redirect,
    normalize_link,
)

from corpus import HREFS, PAGE_URLS, REDIRECT_CASES


@pytest.mark.parametrize("location,base", REDIRECT_CASES)
def test_merge_redirect_matches_reference(ref, location, base):
    assert merge_redirect(location, base) == ref.merge_urls(location, base)


_path_seg = st.text(
    alphabet="abcXYZ012.-_~%", min_size=0, max_size=6
)


@settings(max_examples=300, deadline=None)
@given(
    scheme=st.sampled_from(["", "http", "https", "ftp"]),
    netloc=st.sampled_from(["", "fuzz234567.onion", "ex.com"]),
    segs=st.lists(st.sampled_from(["", ".", "..", "a", "b.html", ".h", "a.b"]), max_size=5),
    lead=st.sampled_from(["", "/", "./", "../", "../../"]),
    query=st.sampled_from(["", "q=1"]),
    frag=st.sampled_from(["", "f"]),
    base=st.sampled_from(PAGE_URLS + ["http://h.onion", "http://h.onion/"]),
)
def test_merge_redirect_fuzz(ref, scheme, netloc, segs, lead, query, frag, base):
    loc = lead + "/".join(segs)
    if scheme:
        loc = scheme + "://" + netloc + "/" + loc if netloc else scheme + ":" + loc
    elif netloc:
        loc = "//" + netloc + "/" + loc
    if query:
        loc += "?" + query
    if frag:
        loc += "#" + frag
    assert merge_redirect(loc, base) == ref.merge_urls(loc, base)


@pytest.mark.parametrize("href", HREFS)
@pytest.mark.parametrize("page_url", PAGE_URLS)
def test_normalize_link_matches_reference(ref, href, page_url):
    """Feed a one-link page through the reference's get_links and compare
    against normalize_link's verdict for the same href."""
    html = f'<a href="{href}">x</a>' if href is not None else "<a>x</a>"
    expected = ref.get_links(html, page_url)
    got = normalize_link(href, page_url)
    if got is None:
        assert expected == []
    else:
        assert expected == [got]


@settings(max_examples=300, deadline=None)
@given(
    href=st.text(
        alphabet="abz05./:#?=&%-_~@!()[]' ", min_size=0, max_size=24
    ),
    page_url=st.sampled_from(PAGE_URLS),
)
def test_normalize_link_fuzz(ref, href, page_url):
    # Feed the href through stdlib attribute parsing first, exactly as
    # the engine's collector does — HTMLParser charref-decodes attr
    # values (e.g. '&#0' -> U+FFFD), so comparing the raw string to the
    # reference's parsed path would diverge on charref-looking inputs.
    from html.parser import HTMLParser

    html = '<a href="{}">x</a>'.format(href.replace('"', ""))

    class _Grab(HTMLParser):
        href = None

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                self.href = dict(attrs).get("href")

    grabber = _Grab()
    grabber.feed(html)
    expected = ref.get_links(html, page_url)
    got = normalize_link(grabber.href, page_url)
    if got is None:
        assert expected == []
    else:
        assert expected == [got]


def test_is_onion():
    assert is_onion("http://abc.onion/x")
    assert not is_onion("http://example.com/")
    assert not is_onion("http://abc.onion.to/x")
    assert is_onion("abc.onion")
    assert not is_onion("abc.onion.")


def test_host_of():
    assert host_of("http://abc.onion:8080/x?q=1") == "abc.onion:8080"
    assert host_of("nopath") == ""


def test_expand_schemes_matches_reference_branch():
    """Mirror of /root/reference/TorSpider.py:344-350."""
    from urllib.parse import urlsplit, urlunsplit

    for url in ["wss://h.onion/x?a=1#f", "ftp://ex.com/y", "gopher://g.onion"]:
        s, n, p, q, f = urlsplit(url)
        expected = []
        for scheme in ["http", "https"]:
            candidate = urlunsplit((scheme, n, p, q, f))
            if ".onion" in candidate and ".onion." not in candidate:
                expected.append(candidate)
        assert expand_schemes(url) == expected


def test_hosts_paths_arrays_matches_urlsplit():
    """The vectorized splitter must equal urlsplit()[1]/[2] row-for-row,
    including shapes outside the canonical stored form (regex-miss
    fallback path)."""
    from urllib.parse import urlsplit

    import pyarrow as pa

    from torray.urlnorm import hosts_paths_arrays

    urls = [
        "http://abc.onion/x?q=1",
        "https://h.onion:8080/a/b.html",
        "http://h.onion",
        "http://h.onion/",
        "ftp://site.onion/p?x=2",
        "wss+x.y://weird.onion/z",
        "http://h.onion/a b/c,d;e",
        "http://h.onion/p?q=/slash?more",
        # regex-miss shapes -> urlsplit fallback:
        "no-scheme-at-all",
        "//authority.onion/only",
        "relative/path?q=1",
        "",
        "1http://bad-scheme.onion/x",
        "http:///empty-netloc",
        "http://h.onion/frag#ment",
        None,
    ]
    hosts, paths = hosts_paths_arrays(pa.array(urls, pa.string()))
    for url, host, path in zip(urls, hosts.to_pylist(), paths.to_pylist()):
        parts = urlsplit(url or "")
        assert host == parts[1], url
        assert path == parts[2], url


def test_hash_mod_dict_matches_per_row():
    import pyarrow as pa

    from torray.pagestore import stable_hash
    from torray.urlnorm import hash_mod_dict

    hosts = ["a.onion", "b.onion", "a.onion", "c.onion", "b.onion"] * 3
    got = hash_mod_dict(pa.array(hosts, pa.string()), 7,
                        stable_hash).to_pylist()
    assert got == [stable_hash(h) % 7 for h in hosts]
    assert hash_mod_dict(pa.array([], pa.string()), 7,
                         stable_hash).to_pylist() == []
