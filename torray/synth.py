"""Deterministic synthetic web generator (FIXTURES.md F1).

Emits the BASELINE.json input_hint schema exactly:
``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string`` — a Common-Crawl-style page table standing in for the
fetchable URL space.  Everything is a pure function of
``(seed, host_index, page_index)`` — no wall clock, no ``random``
module state — so the engine, the oracle simulator, and any
re-generation at any scale agree byte-for-byte.

Coverage by construction (SURVEY.md §5.2 case classes):
hot-host skew (zipf page counts), cross-host links, dead links
(offline path), non-onion and ``.onion.``-redirector links (dropped),
``ftp://`` onion links (invalid-schema path), every relative-link
quirk class, multi-``<title>`` pages, forms over every input type,
duplicate-content pages (hash-unchanged path), non-text rows
(``html`` NULL -> ``type: ...`` fault), redirect pages with every
location variant, the whole fault / no-fault / unknown status range,
the exception-taxonomy directives, and per-host ``robots.txt`` rows.

Page-level fetch semantics are encoded with the ``<!--web ...-->``
directive protocol defined in ``torray.fetch``.
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pyarrow as pa

from torray.parse import FAULT_CODES, NO_FAULT_CODES

__all__ = [
    "SynthWeb",
    "write_synth_web",
    "PAGES_SCHEMA",
]

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_WARC_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z

_REDIRECT_STATUSES = (301, 302, 303, 307, 308)
_FAULT_STATUSES = tuple(sorted(FAULT_CODES))
_NO_FAULT_STATUSES = tuple(sorted(NO_FAULT_CODES))
_UNKNOWN_STATUSES = (299, 600, 101)
_EXC_TOKENS = ("timeout", "ssl", "too_many_redirects", "chunked",
               "memory", "not_implemented", "conn")
_BINARY_EXTS = (".png", ".jpg", ".pdf", ".zip", ".mp3")
_LANGS = ("en", "en", "en", "de", "fr", "es")

# Page-type bands out of 100 (selector in _page_type).
_T_NORMAL_END = 55
_T_REDIR_END = 63
_T_FAULT_END = 72
_T_NOFAULT_END = 77
_T_UNKNOWN_END = 79
_T_BINARY_END = 84
_T_DUP_END = 88
_T_EXC_END = 93
_T_FORM_END = 96
_T_TITLEQ_END = 98  # remaining 99 -> empty page


def _mix(*parts: int) -> int:
    """Deterministic 64-bit mixer (splitmix64-style) over integer parts."""
    h = 0x9E3779B97F4A7C15
    for p in parts:
        h = (h ^ (p & 0xFFFFFFFFFFFFFFFF)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        h = (h ^ (h >> 27)) * 0x94D049BB133111EB % (1 << 64)
        h = h ^ (h >> 31)
    return h


class SynthWeb:
    """A deterministic synthetic web of ``num_pages`` pages spread over
    ``num_hosts`` onion hosts with zipf skew (top host holds a
    disproportionate share — the hot-host case the partitioner must
    contain)."""

    def __init__(self, num_pages: int, num_hosts: int, seed: int = 42,
                 zipf_alpha: float = 0.9):
        self.num_pages = int(num_pages)
        self.num_hosts = int(num_hosts)
        self.seed = int(seed)
        weights = (np.arange(1, self.num_hosts + 1, dtype=np.float64)) ** -zipf_alpha
        raw = weights / weights.sum() * self.num_pages
        sizes = np.maximum(1, np.floor(raw)).astype(np.int64)
        # Distribute the rounding remainder to the largest hosts.
        deficit = self.num_pages - int(sizes.sum())
        if deficit > 0:
            sizes[:deficit] += 1
        elif deficit < 0:
            for i in range(-deficit):
                k = (self.num_hosts - 1 - i) % self.num_hosts
                if sizes[k] > 1:
                    sizes[k] -= 1
        self.host_sizes = sizes
        self.host_starts = np.concatenate(([0], np.cumsum(sizes)))[:-1]
        self._host_names = [self._host_name(h) for h in range(self.num_hosts)]

    # -- naming ---------------------------------------------------------

    def _host_name(self, h: int) -> str:
        digest = hashlib.sha1(f"torray:{self.seed}:host:{h}".encode()).digest()
        return base64.b32encode(digest).decode().lower()[:16]

    def host(self, h: int) -> str:
        return self._host_names[h % self.num_hosts]

    def scheme(self, h: int) -> str:
        return "https" if _mix(self.seed, h, 7) % 10 == 0 else "http"

    def _has_robots(self, h: int) -> bool:
        return h % 4 == 0

    def _page_type(self, h: int, j: int) -> str:
        if j == 0:
            return "normal"  # host roots are always crawlable content
        t = _mix(self.seed, h, j, 11) % 100
        if t < _T_NORMAL_END:
            return "normal"
        if t < _T_REDIR_END:
            return "redirect"
        if t < _T_FAULT_END:
            return "fault"
        if t < _T_NOFAULT_END:
            return "no_fault"
        if t < _T_UNKNOWN_END:
            return "unknown"
        if t < _T_BINARY_END:
            return "binary"
        if t < _T_DUP_END:
            return "dup"
        if t < _T_EXC_END:
            return "exc"
        if t < _T_FORM_END:
            return "form"
        if t < _T_TITLEQ_END:
            return "titleq"
        return "empty"

    def url_of(self, h: int, j: int) -> str:
        """Pure URL function — valid for any j (j >= host size yields a
        well-formed but absent URL: the dead-link / offline case)."""
        kind = self._page_type(h, j)
        if kind == "binary":
            ext = _BINARY_EXTS[_mix(self.seed, h, j, 13) % len(_BINARY_EXTS)]
            path = f"/p{j}{ext}"
        elif self._has_robots(h) and j % 11 == 5:
            path = f"/private/p{j}.html"
        else:
            path = f"/p{j}.html"
        return f"{self.scheme(h)}://{self.host(h)}.onion{path}"

    def robots_url(self, h: int) -> str:
        return f"{self.scheme(h)}://{self.host(h)}.onion/robots.txt"

    def seeds(self, k: int) -> list[str]:
        """First k host roots, in host order (F2 ordering = seed seq)."""
        return [self.url_of(h, 0) for h in range(min(k, self.num_hosts))]

    # -- content --------------------------------------------------------

    def _links_of(self, h: int, j: int, size: int) -> list[str]:
        """hrefs embedded in a normal page, mixing every quirk class."""
        hrefs = [
            f"/p{(j * 7 + 1) % size}.html",
            f"/p{(j + 1) % size}.html",  # ring: keeps each host connected
        ]
        sel = _mix(self.seed, h, j, 17)
        # Cross-host: every root links to the next host (keeps the host
        # graph connected); other pages fan out by a small stride.
        if j == 0 or sel % 3 == 0:
            # Long-range jumps (power-law-web property): keeps the host
            # graph diameter logarithmic so a BFS activates many hosts
            # per round instead of marching a ring one hop at a time.
            target = (h + 1 + (0 if j == 0 else sel % 97)) % self.num_hosts
            hrefs.append(self.url_of(target, 0))
        # Absolute-url local link to an arbitrary (possibly special) page.
        hrefs.append(self.url_of(h, (j * 13 + 3) % size))
        # Dead link (absent from the table -> offline path).
        if sel % 5 == 0:
            hrefs.append(f"/p{size + j}.html")
        # Relative quirk classes.
        quirk = sel % 11
        if quirk == 0:
            hrefs.append(f"./p{(j * 3 + 2) % size}.html")
        elif quirk == 1:
            hrefs.append(f"../p{(j * 3 + 2) % size}.html")
        elif quirk == 2:
            hrefs.append(f"p{(j * 3 + 2) % size}.html")
        elif quirk == 3:
            hrefs.append(f"{self.host((h + 2) % self.num_hosts)}.onion/p0.html")
        elif quirk == 4:
            hrefs.append(f"//{self.host((h + 3) % self.num_hosts)}.onion/p0.html")
        elif quirk == 5:
            hrefs.append("a./b")
        elif quirk == 6:
            hrefs.append("#frag")
        elif quirk == 7:
            hrefs.append("?q=1")
        # Non-crawlable link classes (dropped by the onion filter).
        junk = sel % 7
        if junk == 0:
            hrefs.append("http://clearnet.example.com/page")
        elif junk == 1:
            hrefs.append(f"http://{self.host(h)}.onion.to/mirror")
        elif junk == 2:
            hrefs.append("mailto:admin@example.com")
        # Invalid-schema chain: an ftp onion link enters the frontier,
        # then expands to http+https candidates.
        if sel % 13 == 0:
            hrefs.append(f"ftp://{self.host(h)}.onion/pub/file{j}")
        if self._has_robots(h) and j == 0:
            hrefs.append(f"/private/p{5 if size > 5 else 1}.html")
        return hrefs

    _FORM_HTML = (
        '<form action="/submit{j}" method="post" target="_top">'
        '<input type="text" name="user" value="u{j}">'
        '<input type="password" name="pw">'
        '<input type="email" name="em" value="e@x">'
        '<input type="search" name="q"><input type="tel" name="t">'
        '<input type="url" name="u"><input type="date" name="d">'
        '<input type="datetime-local" name="dt"><input type="month" name="mo">'
        '<input type="number" name="n"><input type="range" name="r">'
        '<input type="time" name="ti"><input type="week" name="w">'
        '<input type="checkbox" name="c" value="1">'
        '<input type="checkbox" name="c" value="2">'
        '<input type="radio" name="rb" value="a">'
        '<input type="radio" name="rb" value="b">'
        '<input type="submit" value="Go">'
        '<textarea name="ta">note {j}</textarea>'
        '<select name="sel"><option value="o1">One</option>'
        '<option value="o2">Two</option></select></form>'
    )

    def _html_of(self, h: int, j: int, kind: str, size: int) -> bytes | None:
        if kind == "binary":
            return None
        if kind == "empty":
            return b""
        if kind == "redirect":
            status = _REDIRECT_STATUSES[_mix(self.seed, h, j, 19) % 5]
            variant = _mix(self.seed, h, j, 23) % 6
            if variant == 0:
                loc = f"/p{(j + 2) % size}.html"
            elif variant == 1:
                loc = self.url_of((h + 2) % self.num_hosts, 0)
            elif variant == 2:
                loc = f"p{(j + 2) % size}.html"
            elif variant == 3:
                loc = f"../p{(j + 2) % size}.html"
            elif variant == 4:
                return f"<!--web status={status}--><html>moved</html>".encode()
            else:
                loc = "http://clearnet.example.com/away"
            return f"<!--web status={status} location={loc}--><html>moved</html>".encode()
        if kind == "fault":
            status = _FAULT_STATUSES[_mix(self.seed, h, j, 29) % len(_FAULT_STATUSES)]
            return f"<!--web status={status}--><html>err {j}</html>".encode()
        if kind == "no_fault":
            status = _NO_FAULT_STATUSES[_mix(self.seed, h, j, 31) % len(_NO_FAULT_STATUSES)]
            return f"<!--web status={status}--><html>busy {j}</html>".encode()
        if kind == "unknown":
            status = _UNKNOWN_STATUSES[_mix(self.seed, h, j, 37) % len(_UNKNOWN_STATUSES)]
            return f"<!--web status={status}--><html>odd {j}</html>".encode()
        if kind == "exc":
            token = _EXC_TOKENS[_mix(self.seed, h, j, 41) % len(_EXC_TOKENS)]
            return f"<!--web exc={token}--><html>x</html>".encode()
        if kind == "dup":
            # Identical bytes within a host group; hosts h%5==0 share one
            # global mirror body (same hash across hosts, different links
            # after per-page normalization).
            group = "global" if h % 5 == 0 else f"host{h}"
            return (
                f'<html><head><title>Mirror {group}</title></head>'
                f'<body><a href="/p0.html">root</a>'
                f'<a href="/p1.html">one</a></body></html>'
            ).encode()
        if kind == "form":
            body = self._FORM_HTML.replace("{j}", str(j))
            anchors = "".join(
                f'<a href="{u}">l</a>' for u in self._links_of(h, j, size)[:3]
            )
            return (f"<html><head><title>Form page {j}</title></head>"
                    f"<body>{anchors}{body}</body></html>").encode()
        if kind == "titleq":
            anchors = "".join(
                f'<a href="{u}">l</a>' for u in self._links_of(h, j, size)[:2]
            )
            return (f"<html><title>First {j}</title><p>mid</p>"
                    f"<title>Last &amp; Best {j}</title>"
                    f"<title><b>cancelled</b></title>"
                    f"<body>{anchors}</body></html>").encode()
        # normal page
        anchors = "".join(
            f'<a href="{u}">link</a> ' for u in self._links_of(h, j, size)
        )
        filler = f"Lorem onion {h}:{j} " * (1 + _mix(self.seed, h, j, 43) % 8)
        return (f"<html><head><title>Page {j} of host {h}</title></head>"
                f"<body><h1>p{j}</h1><p>{filler}</p>{anchors}</body></html>").encode()

    def _robots_body(self, h: int) -> bytes:
        return b"User-agent: *\nDisallow: /private/\n"

    def row(self, g: int) -> dict:
        """Page row for global index g (robots rows are appended after
        the regular index space — see :meth:`rows_iter`)."""
        h = int(np.searchsorted(self.host_starts, g, side="right")) - 1
        j = g - int(self.host_starts[h])
        size = int(self.host_sizes[h])
        kind = self._page_type(h, j)
        html = self._html_of(h, j, kind, size)
        text = f"page {h}:{j} kind {kind}" if html is not None else None
        return {
            "url": self.url_of(h, j),
            "warc_ts": _WARC_EPOCH_US + (_mix(self.seed, g, 47) % (10**9)),
            "html": html,
            "text": text,
            "lang": _LANGS[_mix(self.seed, h, j, 53) % len(_LANGS)],
        }

    def robots_rows(self) -> list[dict]:
        out = []
        for h in range(self.num_hosts):
            if self._has_robots(h):
                out.append({
                    "url": self.robots_url(h),
                    "warc_ts": _WARC_EPOCH_US + (_mix(self.seed, h, 59) % (10**9)),
                    "html": self._robots_body(h),
                    "text": "robots",
                    "lang": "en",
                })
        return out

    # -- materialization ------------------------------------------------

    def _rows_to_table(self, rows: list[dict]) -> pa.Table:
        cols = {name: [r[name] for r in rows] for name in
                ("url", "warc_ts", "html", "text", "lang")}
        arrays = [
            pa.array(cols["url"], pa.string()),
            pa.array(cols["warc_ts"], pa.timestamp("us")),
            pa.array(cols["html"], pa.binary()),
            pa.array(cols["text"], pa.string()),
            pa.array(cols["lang"], pa.string()),
        ]
        return pa.Table.from_arrays(arrays, schema=PAGES_SCHEMA)

    def table(self) -> pa.Table:
        """Whole web as one Arrow table, sorted by url (row-group pruning
        on the url predicate depends on this). Driver-side; use
        :func:`write_synth_web` for bench-scale generation."""
        rows = [self.row(g) for g in range(self.num_pages)]
        rows.extend(self.robots_rows())
        rows.sort(key=lambda r: r["url"])
        return self._rows_to_table(rows)

    def batch_for_indices(self, indices) -> pa.Table:
        """Rows for a batch of global indices (the Ray-parallel path)."""
        return self._rows_to_table([self.row(int(g)) for g in indices])


def write_synth_web(out_dir: str, num_pages: int, num_hosts: int,
                    seed: int = 42, use_ray: bool = True) -> "SynthWeb":
    """Materialize a synthetic web to Parquet under ``out_dir``.

    The Ray path streams generation through ``ray.data.range ->
    map_batches`` (each batch generated independently from pure
    functions — embarrassingly parallel, no driver materialization)
    and sorts by url so Parquet row-group stats prune url lookups.
    """
    web = SynthWeb(num_pages, num_hosts, seed)
    if not use_ray or num_pages <= 50_000:
        import pyarrow.parquet as pq
        import os

        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(web.table(), f"{out_dir}/pages.parquet",
                       row_group_size=4096)
        return web

    import ray

    ds = ray.data.range(num_pages)
    ds = ds.map_batches(
        lambda batch: web.batch_for_indices(
            batch.column("id").to_numpy(zero_copy_only=False).tolist()),
        batch_format="pyarrow",
        batch_size=4096,
    )
    robots = ray.data.from_arrow(web._rows_to_table(web.robots_rows()))
    ds = ds.union(robots)
    # Many files + small row groups: read parallelism for downstream
    # scans and row-group pruning for url-filtered lookups.
    (ds.sort("url")
       .repartition(max(64, num_pages // 8192))
       .write_parquet(out_dir, row_group_size=4096))
    return web
