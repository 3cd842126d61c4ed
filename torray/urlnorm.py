"""Quirk-exact URL normalization semantics.

The reference crawler has TWO distinct, mutually inconsistent URL
resolvers, and both must be reproduced exactly (verified by the
differential tests in ``tests/test_urlnorm.py`` against the reference
libs imported as an oracle):

1. ``merge_redirect(location, base)`` — the redirect-Location resolver
   (reference: ``/root/reference/libs/functions.py:27-68``).  A non-RFC
   relative resolution: handles ``/``-rooted, ``./``, ``../`` chains and
   bare page names against the base path, keeps only the NEW url's
   query, drops fragments, and on *any* error falls back to the base
   path.

2. ``normalize_link(href, page_url)`` — the per-``<a href>`` normalizer
   used by link extraction (reference: ``/root/reference/libs/parsers.py:
   221-250``).  Notably it does NOT resolve relative paths against the
   page directory: ``page2.html`` on ``http://h.onion/a/b.html``
   becomes ``http://h.onion/page2.html``.  It also strips *every*
   occurrence of the two-character sequence ``./`` anywhere in the href
   (mangling e.g. ``a./b`` into ``ab``), recovers a netloc mistakenly
   parsed as the leading path segment when that segment contains
   ``.onion``, and keeps only ``.onion`` hosts that are not
   ``.onion.``-redirectors.

Both are pure functions over strings; Arrow has no URL kernels so they
run row-at-a-time inside the extract stage (the stage itself is
batched; these are not on the whole-table hot path — link counts per
page are small).
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

__all__ = [
    "is_onion",
    "host_of",
    "merge_redirect",
    "normalize_link",
    "expand_schemes",
]


def is_onion(url: str) -> bool:
    """The crawlability predicate: an ``.onion`` reference that is not an
    ``.onion.`` clearnet redirector.

    Reference: inline at ``/root/reference/TorSpider.py:194,312,348`` and
    ``/root/reference/libs/parsers.py:245``.
    """
    return ".onion" in url and ".onion." not in url


def host_of(url: str) -> str:
    """Netloc of a URL (the partitioning key for all crawl shuffles)."""
    return urlsplit(url)[1]


def merge_redirect(location: str | None, base_url: str) -> str:
    """Resolve a redirect ``Location`` against the URL that produced it.

    Byte-exact port of the reference's ``merge_urls``
    (``/root/reference/libs/functions.py:27-68``), including its
    non-RFC behaviors:

    - empty scheme/netloc inherit from the base URL;
    - a path starting ``/`` is taken verbatim;
    - ``./``-prefixed paths resolve against the base *directory*;
    - ``../`` chains walk up one extra level per segment relative to the
      base directory (traverse starts at -2 because the base path slice
      keeps its trailing slash, leaving an empty split segment);
    - a bare page name replaces the base's last path segment;
    - ANY exception while building the path (e.g. the base path has no
      ``/``, or the new path is empty) keeps the base path unchanged;
    - the query comes from the new URL only; fragments are dropped.
    """
    location = "" if location is None else location
    new_scheme, new_netloc, new_path, new_query, _ = urlsplit(location)
    base_scheme, base_netloc, base_path, _bq, _bf = urlsplit(base_url)
    scheme = new_scheme if new_scheme != "" else base_scheme
    netloc = new_netloc if new_netloc != "" else base_netloc
    try:
        if new_path[0] == "/":
            merged_path = new_path
        elif new_path[0] == ".":
            # Resolve against the base directory (slice keeps the '/').
            stem = base_path[: base_path.rindex("/") + 1]
            segments = new_path.split("/")
            remainder = "/".join(segments[1:])
            if segments[0] == ".":
                # Current directory: drop the trailing empty segment the
                # kept slash produces.
                stem = "/".join(stem.split("/")[:-1])
            elif segments[0] == "..":
                climb = -2
                while remainder[0:3] == "../":
                    remainder = "/".join(remainder.split("/")[1:])
                    climb -= 1
                try:
                    stem = "/".join(stem.split("/")[:climb])
                except Exception:
                    stem = "/"
            merged_path = "/".join([stem, remainder])
        else:
            # Bare page name: replace the base's final segment.
            stem = base_path[: base_path.rindex("/")]
            merged_path = "/".join([stem, new_path])
    except Exception:
        merged_path = base_path
    return urlunsplit((scheme, netloc, merged_path, new_query, ""))


def normalize_link(href: str | None, page_url: str) -> str | None:
    """Normalize one ``<a href>`` the way the reference's link extractor
    does, returning the canonical URL string, or ``None`` when the link
    is skipped (empty href, non-onion target, ``.onion.`` redirector, or
    an exception during normalization).

    Byte-exact port of the per-link body of ``get_links``
    (``/root/reference/libs/parsers.py:221-253``).  ``page_url`` supplies
    the default netloc only — relative paths are NOT resolved against
    the page's directory (see module docstring).
    """
    if href is None:
        return None
    page_host = urlsplit(page_url)[1]
    try:
        # Strip every './' occurrence anywhere in the string (this also
        # mangles 'a./b' -> 'ab'; preserved verbatim from the reference).
        while "./" in href:
            href = href.replace("./", "")
        scheme, netloc, path, query, _frag = urlsplit(href)
        if scheme == "":
            scheme = "http"
        if path == "":
            path = "/"
        if netloc == "" and ".onion" in path.split("/")[0]:
            # The parser mistook the host for the first path segment.
            netloc = path.split("/")[0]
            try:
                path = "/".join(path.split("/")[1:])
            except Exception:
                path = "/"
        if netloc == "":
            netloc = page_host
        if ".onion" not in netloc or ".onion." in netloc:
            return None
        return urlunsplit((scheme, netloc, path, query, ""))
    except Exception:
        return None


def expand_schemes(url: str) -> list[str]:
    """The invalid-schema recovery: re-emit the URL under both ``http``
    and ``https``, keeping only onion targets.

    Reference: ``/root/reference/TorSpider.py:344-350``.
    """
    _s, netloc, path, query, frag = urlsplit(url)
    out = []
    for scheme in ["http", "https"]:
        candidate = urlunsplit((scheme, netloc, path, query, frag))
        if is_onion(candidate):
            out.append(candidate)
    return out


# ---------------------------------------------------------------------------
# Vectorized (Arrow) host/path extraction for the hot paths.
#
# Every URL the engine *stores* (``new_urls``, frontier, redirects) is
# an ``urlunsplit`` product: ``scheme://netloc[path][?query]`` with a
# lowercase valid scheme, no fragment, and netloc/path free of the
# delimiters urlsplit would stop at earlier.  For that shape, one
# ``pc.extract_regex`` reproduces ``urlsplit``'s netloc/path exactly;
# any row the regex rejects (malformed input, null) falls back to the
# real ``urlsplit`` so parity holds unconditionally (diff-tested in
# ``tests/test_urlnorm.py``).
# ---------------------------------------------------------------------------

# urlsplit: netloc = after '://' up to '/', '?' or '#'; path = up to
# '?' or '#'.  The scheme class matches urlsplit's RFC-3986 rule.
_URL_SPLIT_RE = (r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.\-]*)://"
                 r"(?P<host>[^/?#]*)(?P<path>[^?#]*)")


def hosts_paths_arrays(url_arr):
    """``(hosts, paths)`` Arrow string arrays for a URL array —
    vectorized ``urlsplit(u)[1]``/``[2]`` with a per-row fallback for
    anything outside the canonical stored shape."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(url_arr, pa.ChunkedArray):
        url_arr = url_arr.combine_chunks()
    ex = pc.extract_regex(url_arr, _URL_SPLIT_RE)
    hosts = pc.struct_field(ex, "host")
    paths = pc.struct_field(ex, "path")
    if ex.null_count:
        miss = pc.is_null(ex)
        idx = pc.indices_nonzero(miss).to_pylist()
        hs, ps = hosts.to_pylist(), paths.to_pylist()
        urls = url_arr.to_pylist()
        for i in idx:
            parts = urlsplit(urls[i] or "")
            hs[i], ps[i] = parts[1], parts[2]
        hosts = pa.array(hs, pa.string())
        paths = pa.array(ps, pa.string())
    return hosts, paths


def hash_mod_dict(host_arr, mod: int, hash_fn):
    """``hash_fn(host) % mod`` per row, computed once per DISTINCT host
    via Arrow dictionary encoding (hosts repeat heavily: a crawl batch
    holds many URLs per host).  Returns an int32 Arrow array."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(host_arr, pa.ChunkedArray):
        host_arr = host_arr.combine_chunks()
    denc = host_arr.dictionary_encode()
    per_val = pa.array(
        [hash_fn(h) % mod if h is not None else 0
         for h in denc.dictionary.to_pylist()],
        pa.int32())
    if len(per_val) == 0:
        return pa.array([], pa.int32())
    return pc.take(per_val, denc.indices)
