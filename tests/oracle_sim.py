"""Single-threaded oracle crawler (SURVEY.md §5.3).

Independently re-implements the simulated-fetch protocol and the
deterministic crawl schedule ON TOP OF THE REFERENCE LIBS (title /
links / forms / hash / merge / type all call into
``/root/reference/libs`` via the ``ref`` fixture), following the branch
ladder of ``/root/reference/TorSpider.py:176-413`` literally.  The
engine's outputs are compared against this — never against the
engine's own helpers — so fetch semantics, parsing, ordering,
politeness, and the seen set are all checked differentially.

Deterministic schedule spec (shared with the engine; SURVEY.md §2.6):
- round-based BFS; frontier items carry (url, host, last_hash,
  round_entered, host_seq);
- per-round politeness: each host contributes at most ``budget`` items,
  chosen by (round_entered, host_seq, url); the rest defer to next
  round (url is the tiebreak: requeued items keep their original
  host_seq, which can collide with a fresh item's dense seq);
- scan order within a round: (host, round_entered, host_seq, url);
- requeue: a scan hitting a no-fault STATUS code (408/421/423/429/
  503/504 — re-served by the reference backend, TorSpider.py:168)
  re-enters the next round's frontier with retries+1, dropped once
  retries reaches ``max_retries``; the recrawl pass never requeues;
- candidates: per scanned parent in scan order, its sorted new_urls;
  first-wins per url by (parent_host, parent_round, parent_seq, url);
  dropped if already seen; robots-disallowed candidates are marked
  seen but never enter the frontier;
- surviving candidates get per-host dense host_seq in first-wins-key
  order and enter the frontier with round_entered = round+1;
- optional recrawl pass: after BFS drains, every seen url is rescanned
  once in (host, url) order carrying its last recorded content hash
  (the change-detection / M9 path).
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

# Spec constants duplicated from the protocol definition on purpose —
# this file must not import torray's implementations.
_EXT_TYPES = {
    ".png": "image/png", ".jpg": "image/jpeg", ".gif": "image/gif",
    ".pdf": "application/pdf", ".zip": "application/zip",
    ".mp3": "audio/mpeg", ".mp4": "video/mp4",
    ".exe": "application/octet-stream",
}
_REDIRECTS = [301, 302, 303, 307, 308]
_FAULTS = [400, 401, 403, 404, 405, 406, 410, 413, 414, 444, 451, 495, 496,
           500, 501, 502, 505, 508, 511]
_NO_FAULTS = [408, 421, 423, 429, 503, 504]
_GOOD = [200, 201]


def _sim_directive(html):
    if not html or not html.startswith(b"<!--web "):
        return {}
    end = html.find(b"-->", 8)
    if end < 0:
        return {}
    out = {}
    for token in html[8:end].decode("utf-8", "replace").split():
        if "=" not in token:
            continue
        k, v = token.split("=", 1)
        if k == "status":
            out["status"] = int(v)
        else:
            out[k] = v
    return out


def _sim_ctype(url, html, directive):
    declared = directive.get("content-type")
    if declared == "none":
        return None
    if declared is not None:
        return declared.split("/")[0]
    if html is None:
        path = urlsplit(url)[2]
        dot = path.rfind(".")
        ext = path[dot:].lower() if dot >= 0 else ""
        return _EXT_TYPES.get(ext, "application/octet-stream").split("/")[0]
    return "text"


def sim_scan(ref, url, present, html, last_hash, scan_date, node):
    """One URL scan following TorSpider.py's ladder; returns a result
    dict, or None for silently-dropped outcomes."""
    result = {
        "new_urls": [], "online": False, "url": url, "scan_date": scan_date,
        "last_node": node, "fault": None, "title": None, "form_dicts": [],
        "hash": None, "redirect": None,
    }
    s, n, p, q, f = urlsplit(url)
    if s not in ("http", "https"):
        # InvalidSchema branch (TorSpider.py:341-353).
        for scheme in ["http", "https"]:
            candidate = urlunsplit((scheme, n, p, q, f))
            if ".onion" in candidate and ".onion." not in candidate:
                result["new_urls"].append(candidate)
        result["new_urls"] = sorted(set(result["new_urls"]))
        result["fault"] = "invalid schema"
        return result
    if n == "":
        result["fault"] = "invalid url"  # TorSpider.py:334-339
        return result
    if not present:
        return result  # ConnectionError branch (TorSpider.py:362-379)

    directive = _sim_directive(html)
    exc = directive.get("exc")
    if exc == "timeout":
        return result
    if exc == "ssl":
        result["fault"] = "Bad SSL"
        return result
    if exc == "too_many_redirects":
        result["fault"] = "redirect"
        return result
    if exc == "conn":
        return result
    if exc in ("chunked", "not_implemented"):
        return None
    if exc == "memory":
        result["online"] = True
        result["fault"] = "memory error"
        return result

    status = directive.get("status", 200)
    if status in _REDIRECTS:
        result["fault"] = str(status)
        location = directive.get("location")
        if location is not None:
            new_url = ref.merge_urls(location, url)
            if ".onion" in new_url and ".onion." not in new_url:
                result["new_urls"].append(new_url)
            result["redirect"] = new_url
        return result
    if status in _FAULTS:
        result["fault"] = str(status)
        return result
    if status in _NO_FAULTS:
        result["retry"] = True  # re-served by the backend (requeue)
        return result
    if status not in _GOOD:
        result["fault"] = str(status)
        return result

    result["online"] = True
    ctype = _sim_ctype(url, html, directive)
    if ctype != "text" and ctype is not None:
        result["fault"] = "type: {0}".format(ctype)
        return result

    body = html if html is not None else b""
    text = body.decode("utf-8", "replace")
    try:
        result["title"] = ref.get_title(text)
    except Exception:
        result["title"] = "Unknown"
    digest = ref.get_hash(body)
    if last_hash == digest:
        return result
    result["hash"] = digest
    for link in ref.get_links(text, url):
        if ".onion" in link and ".onion." not in link:
            result["new_urls"].append(link)
    result["new_urls"] = sorted(set(result["new_urls"]))
    for form in ref.get_forms(text):
        result["form_dicts"].append(dict(form))
    return result


def parse_robots(body: bytes) -> list[str]:
    prefixes = []
    for line in body.decode("utf-8", "replace").splitlines():
        line = line.split("#", 1)[0].strip()
        if line.lower().startswith("disallow:"):
            prefix = line.split(":", 1)[1].strip()
            if prefix:
                prefixes.append(prefix)
    return prefixes


def sim_crawl(ref, pages: dict, seeds: list[str], budget: int,
              max_rounds: int, scan_date: str = "2026-01-01",
              node: str = "torray", respect_robots: bool = False,
              recrawl: bool = False, max_retries: int = 3):
    """Run the deterministic crawl over ``pages`` (url -> html bytes or
    None for binary rows; urls absent from the dict are offline).

    Returns (results, crawl_log, seen, leftover_frontier_urls) where
    results is a list of result dicts in scan order and crawl_log is
    [(round, url)] in scan order.
    """
    host = lambda u: urlsplit(u)[1]

    robots = {}
    if respect_robots:
        for url, html in pages.items():
            s, n, p, q, f = urlsplit(url)
            if p == "/robots.txt" and html:
                robots[n] = parse_robots(html)

    def disallowed(url):
        rules = robots.get(host(url))
        if not rules:
            return False
        path = urlsplit(url)[2]
        return any(path.startswith(r) for r in rules)

    frontier = []  # (url, host, last_hash, round_entered, host_seq, retries)
    seen = set()
    per_host_counts: dict[str, int] = {}
    for u in seeds:
        if u in seen:
            continue
        if respect_robots and disallowed(u):
            seen.add(u)
            continue
        seen.add(u)
        hs = per_host_counts.get(host(u), 0)
        per_host_counts[host(u)] = hs + 1
        frontier.append((u, host(u), "", 0, hs, 0))

    results, crawl_log = [], []
    hash_by_url: dict[str, str] = {}
    rnd = 0
    while frontier and rnd < max_rounds:
        by_host: dict[str, list] = {}
        for item in frontier:
            by_host.setdefault(item[1], []).append(item)
        selected, deferred = [], []
        for h in by_host:
            items = sorted(by_host[h], key=lambda it: (it[3], it[4], it[0]))
            selected.extend(items[:budget])
            deferred.extend(items[budget:])
        selected.sort(key=lambda it: (it[1], it[3], it[4], it[0]))

        candidates = []  # (url, parent_key)
        requeued = []
        for url, h, last_hash, r_ent, hseq, retries in selected:
            res = sim_scan(ref, url, url in pages, pages.get(url),
                           last_hash, scan_date, node)
            crawl_log.append((rnd, url))
            if res is None:
                continue
            results.append(res)
            if res.get("retry") and retries < max_retries:
                requeued.append((url, h, last_hash, rnd + 1, hseq,
                                 retries + 1))
            if res["hash"] is not None:
                hash_by_url[url] = res["hash"]
            for link in res["new_urls"]:
                candidates.append((link, (h, r_ent, hseq, link)))

        # First-wins per url.
        best: dict[str, tuple] = {}
        for url, key in candidates:
            if url not in best or key < best[url]:
                best[url] = key
        fresh = []
        for url in best:
            if url in seen:
                continue
            seen.add(url)
            if respect_robots and disallowed(url):
                continue  # suppressed (seen, never scheduled)
            fresh.append((url, best[url]))
        # Per-host dense sequencing in first-wins-key order.
        new_items = []
        fresh_by_host: dict[str, list] = {}
        for url, key in fresh:
            fresh_by_host.setdefault(host(url), []).append((url, key))
        for h in fresh_by_host:
            ordered = sorted(fresh_by_host[h], key=lambda t: t[1])
            for i, (url, _k) in enumerate(ordered):
                new_items.append((url, h, "", rnd + 1, i, 0))
        frontier = deferred + requeued + new_items
        rnd += 1

    leftover = [it[0] for it in frontier]

    if recrawl:
        order = sorted(seen, key=lambda u: (host(u), u))
        for url in order:
            if respect_robots and disallowed(url):
                continue
            res = sim_scan(ref, url, url in pages, pages.get(url),
                           hash_by_url.get(url, ""), scan_date, node)
            crawl_log.append((rnd, url))
            if res is not None:
                results.append(res)

    return results, crawl_log, seen, leftover
